"""Structured Streaming surface (SURVEY.md §2.9: the reference is batch +
subscription-driven; Spark offers a real streaming path, so the engine
exposes one for the event-ingest analog).

``windowed_event_counts`` drives a real streaming query (file source ->
watermark -> tumbling window agg -> memory sink) to completion
synchronously — the pattern production would run continuously against a
stream source; tests and the driver get a finite DataFrame back.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type via a real streaming query.

    Output: (window_start, event_type, n, total_value) — append mode with
    watermark, so only closed windows emit (late data beyond the watermark
    is dropped, the standard streaming contract).
    """
    import os

    static = spark.read.parquet(events_path)
    # The file stream source requires a DIRECTORY; point it at the parent
    # with a glob filter when given a single file.
    if events_path.endswith(".parquet"):
        base, fname = os.path.dirname(events_path), os.path.basename(events_path)
        reader = (
            spark.readStream.schema(static.schema)
            .format("parquet")
            .option("pathGlobFilter", fname)
        )
        stream = reader.load(base)
    else:
        stream = spark.readStream.schema(static.schema).format("parquet").load(events_path)
    # complete mode: a finite file source never advances the watermark past
    # the last window, so append mode would swallow the tail; complete
    # emits every window and stays deterministic for the oracle.
    agg = (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    name = f"evw_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_windowed_counts_append(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> None:
    """Production-shaped streaming path: file-source directory ->
    ``withWatermark`` -> tumbling window agg -> APPEND-mode parquet sink
    with a checkpoint.

    Unlike the complete-mode memory-sink oracle surface above, state here
    lives in the executors' state store bounded by the watermark (closed
    windows are emitted once and purged), and the checkpoint carries the
    watermark across restarts — the shape that survives an unbounded
    stream. Late rows older than the watermark are dropped (asserted by
    tests/test_multimodal_streaming.py on a two-batch directory).

    Runs one ``processAllAvailable`` drain and stops; production would
    leave the query running or use ``trigger(availableNow=True)`` on a
    schedule.
    """
    stream = spark.readStream.schema(schema).format("parquet").load(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def windowed_event_counts_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch twin of the streaming agg WITHOUT the append-mode watermark
    cutoff — the oracle-comparable complete result."""
    e = spark.read.parquet(events_path)
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
