"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
``mapInPandas`` operators.

The Spark-side plumbing — schemas, Arrow batch iteration, partition-size
control, deterministic fake features — is real and tested; the actual
codec calls are stubbed (image/audio libraries are not in this image) as
clearly-marked seams: pass ``decoder=`` to plug a real one in.

Design notes for 100 TB:
* binary payloads ride in their own column so Parquet column pruning
  skips them unless the operator touches them (metadata-only queries
  never read the bytes);
* ``mapInPandas`` streams Arrow batches — bounded memory per task even
  with multi-MB payloads; ``spark.sql.files.maxPartitionBytes`` plus
  ``repartition`` on ingest keep per-task byte volume even;
* feature outputs are fixed-width ``array<float>`` ready for the ANN
  operators in ``operators/similarity.py``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
])


def synthesize_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    df = spark.range(0, n, 1, partitions)
    payload = F.sha2(F.col("id").cast("string"), 256).cast("binary")
    return df.select(
        F.sha2(F.concat(F.lit("m"), F.col("id").cast("string")), 256).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 1920 + 1).cast("int").alias("width"),
        (F.col("id") % 1080 + 1).cast("int").alias("height"),
        (F.col("id") * 33 % 100000).alias("duration_ms"),
        payload.alias("payload"),
    )


def _default_decoder(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode seam. Deterministic fake 'decoded signal' derived from
    the payload hash — replace with PIL/librosa/pyav in a real deployment:

        raise NotImplementedError("install pillow/librosa and pass decoder=")

    The fake keeps the full dataflow testable end-to-end.
    """
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer((h * 4)[:128], dtype=np.uint8).astype(np.float32)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decoder: Callable[[bytes, str], np.ndarray] = _default_decoder,
) -> DataFrame:
    """binary payload -> fixed-width float feature vector via mapInPandas.

    One Arrow batch in, one out; decode runs per element inside the batch
    (vectorized transfer, the Python work is the codec itself).
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                sig = decoder(payload, kind)
                # mean-pool into `dim` buckets -> fixed width
                chunks = np.array_split(sig.astype(np.float32), dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, out_schema)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize operator: filters kind=image, rewrites payload + metadata.

    ``resizer`` is the codec seam (STUB: identity bytes + updated metadata;
    a real deployment passes a PIL-backed callable).
    """
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is not None:
                pdf = pdf.assign(
                    payload=[resizer(p, target_w, target_h) for p in pdf["payload"]]
                )
            yield pdf.assign(width=target_w, height=target_h)

    return media.filter(F.col("kind") == "image").mapInPandas(run, out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for videos: one output row per sampled frame
    timestamp. The timestamp grid is pure Column math (explode over a
    sequence); frame decode itself is the stubbed seam downstream."""
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return vids.select(
        "media_id",
        "duration_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )
