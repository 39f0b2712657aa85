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


def test_resize_really_resamples_images(media):
    from identity_matching_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm_frames,
    )

    out = resize_images(media, 6, 5)
    rows = out.collect()
    assert all(r["kind"] == "image" for r in rows)
    assert all(r["width"] == 6 and r["height"] == 5 for r in rows)
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    # the payload itself is resampled, not just the metadata
    for r in rows[:6]:
        data = bytes(r["payload"])
        px = decode_bmp(data) if data[:2] == b"BM" else decode_ppm_frames(data)[0]
        assert px.shape == (5, 6, 3)


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

        return np.full(32, 7.5, dtype="float32")

    feats = extract_features(media.limit(5), dim=4, decoder=decoder)
    for r in feats.collect():
        assert all(abs(x - 7.5) < 1e-6 for x in r["features"])


def test_codec_roundtrips():
    """BMP (bottom-up BGR + row padding), stacked PPM and PCM WAV survive
    encode -> decode byte-exactly — on an ASYMMETRIC image so row order
    and channel order bugs cannot cancel out."""
    import numpy as np

    from identity_matching_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm_frames,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)  # w*3 not %4
    assert (decode_bmp(encode_bmp(px)) == px).all()
    f0, f1 = px, px[::-1, ::-1]
    got = decode_ppm_frames(encode_ppm(f0) + encode_ppm(f1))
    assert len(got) == 2 and (got[0] == f0).all() and (got[1] == f1).all()
    samples = (rng.randint(-1024, 1024, size=100)).astype("<i2")
    assert (decode_wav(encode_wav(samples)) == samples.astype("float32")).all()


def test_default_decoder_known_statistics(spark, media):
    """The decoded signal is the real pixel/sample stream: features from
    Spark equal a local numpy decode of the same payload, and unknown
    payloads raise (codec seam, no silent hash fallback)."""
    import numpy as np
    import pytest as pt

    from identity_matching_spark.operators.multimodal import _default_decoder

    rows = {r["media_id"]: r for r in media.collect()}
    feats = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    checked = 0
    for mid, r in rows.items():
        sig = _default_decoder(bytes(r["payload"]), r["kind"])
        expect = [float(c.mean()) if len(c) else 0.0 for c in np.array_split(sig.astype(np.float32), 8)]
        got = feats[mid]
        assert all(abs(a - b) < 1e-4 for a, b in zip(got, expect)), mid
        checked += 1
    assert checked == 90
    with pt.raises(NotImplementedError):
        _default_decoder(b"\xff\xd8\xff\xe0 jpeg-ish", "image")


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
