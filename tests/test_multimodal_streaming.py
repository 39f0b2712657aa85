"""Multimodal plumbing (schemas, mapInPandas batching, stub seams) and the
Structured Streaming window agg vs its batch twin."""

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from identity_matching_spark.streaming.windows import (
    windowed_event_counts,
    windowed_event_counts_batch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, 90).cache()


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 90
    again = synthesize_media(spark, 90, partitions=3)
    assert media.exceptAll(again).count() == 0
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_fixed_width(media):
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 90
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same payload -> same features
    f2 = {r["media_id"]: r["features"] for r in extract_features(media, dim=16).collect()}
    for r in rows:
        assert f2[r["media_id"]] == r["features"]


def test_resize_updates_metadata_only_images(media):
    out = resize_images(media, 64, 64)
    rows = out.collect()
    assert all(r["kind"] == "image" for r in rows)
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    assert len(rows) == media.filter(F.col("kind") == "image").count()


def test_frame_sampling_grid(media):
    frames = sample_frames(media, every_ms=1000)
    joined = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("duration_ms").alias("d")
    )
    for r in joined.collect():
        assert r["n"] == max(1, r["d"] // 1000)


def test_custom_decoder_seam(media):
    def decoder(payload, kind):
        import numpy as np

        return np.full(32, float(len(payload or b"")), dtype="float32")

    feats = extract_features(media.limit(5), dim=4, decoder=decoder)
    for r in feats.collect():
        assert all(abs(x - 64.0) < 1e-6 for x in r["features"])  # sha256 hex = 64 bytes


def test_streaming_window_agg_matches_batch(spark):
    stream_out = windowed_event_counts(spark, f"{SF}/events.parquet")
    batch_out = windowed_event_counts_batch(spark, f"{SF}/events.parquet")
    s = sorted(tuple(r) for r in stream_out.collect())
    b = sorted(tuple(r) for r in batch_out.collect())
    assert s == b
    assert len(s) > 0


def test_append_mode_watermark_drops_late_data(spark, tmp_path):
    """Two-batch drive of the production append-mode path: the second
    batch carries a late row older than the watermark — it must be
    dropped and already-emitted windows must not change."""
    import datetime as dt

    from identity_matching_spark.streaming.windows import run_windowed_counts_append

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [(1, 1, "click", T(1, 10), 1.0), (2, 1, "click", T(1, 20), 2.0),
              (3, 2, "view", T(3, 0), 3.0)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    run_windowed_counts_append(spark, src, out, ckpt, spark.read.parquet(src).schema)
    first = {(r["window_start"], r["event_type"]): r["n"]
             for r in spark.read.parquet(out).collect()}
    # watermark after batch1 = 03:00 - 30min = 02:30 -> window 01:00 closed
    assert first == {(T(1, 0), "click"): 2}

    # batch 2: one LATE row (01:40 < watermark 02:30) + one fresh row
    batch2 = [(4, 3, "click", T(1, 40), 9.0), (5, 2, "view", T(5, 0), 4.0)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    run_windowed_counts_append(spark, src, out, ckpt, spark.read.parquet(src).schema)
    final = {(r["window_start"], r["event_type"]): r["n"]
             for r in spark.read.parquet(out).collect()}
    # late click dropped: window 01:00 count still 2, no duplicate row;
    # window 03:00 closed by the new watermark (05:00 - 30min)
    assert final == {(T(1, 0), "click"): 2, (T(3, 0), "view"): 1}
