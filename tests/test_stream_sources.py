"""Streaming source/trigger surface (streaming/sources.py): the
rate-micro-batch transport must produce the deterministic events mapping,
the kafka binding must fail loudly without jars, and trigger policies
must map onto real DataStreamWriter triggers."""

import os
import sys
import time
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from identity_matching_spark.streaming.sources import stream_source, with_trigger

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_rate_micro_batch_deterministic_mapping(spark):
    name = f"rate_sink_{uuid.uuid4().hex[:8]}"
    events = stream_source(
        spark, "rate-micro-batch", rowsPerBatch="50", startTimestamp="0",
        advanceMillisPerBatch="1000",
    )
    q = (
        with_trigger(events.writeStream.format("memory").queryName(name), "processingTime=0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 2:
                break
            time.sleep(0.3)
        else:
            raise AssertionError("rate-micro-batch produced <3 batches in 60s")
    finally:
        q.stop()
    rows = {r["event_id"]: r for r in spark.table(name).collect()}
    # first two batches are complete and deterministic
    assert all(i in rows for i in range(100))
    r7 = rows[7]
    assert r7["user_id"] == 7
    assert r7["event_type"] == "click"          # 7 % 3 = 1 -> index 2
    assert abs(r7["value"] - (7 * 37 % 10_000) / 100.0) < 1e-9


def test_file_source_available_now_trigger(spark):
    name = f"file_sink_{uuid.uuid4().hex[:8]}"
    events = stream_source(spark, "file", path=f"{SF}/events.parquet")
    q = (
        with_trigger(events.writeStream.format("memory").queryName(name), "availableNow")
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.table(name).count()
    n_static = spark.read.parquet(f"{SF}/events.parquet").count()
    assert n_stream == n_static


def test_kafka_raises_without_jars(spark):
    with pytest.raises((RuntimeError, Exception)) as exc:
        df = stream_source(spark, "kafka", **{"kafka.bootstrap.servers": "none:9092",
                                              "subscribe": "t"})
        df.writeStream.format("noop").start().stop()
    assert "kafka" in str(exc.value).lower()


def test_unknown_kind_and_policy():
    with pytest.raises(ValueError):
        stream_source(None, "carrier-pigeon")
    with pytest.raises(ValueError):
        with_trigger(None, "hourly")
