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
