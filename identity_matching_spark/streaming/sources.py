"""Streaming source + trigger surface.

The reference ingests via HTTP subscription channels
(MdmConfig.java:22-37 — message-delivery queues feeding the matcher);
Spark's equivalents are the Structured Streaming sources. This module is
the one place the engine binds to them, so a deployment swaps transports
without touching operators:

* ``file``             — directory/glob parquet stream (the shape every
                         test and the driver use; exactly-once via file
                         listing + checkpoint).
* ``rate-micro-batch`` — deterministic built-in generator (rowsPerBatch
                         fixed per micro-batch) mapped onto the events
                         schema; the integration-test transport.
* ``rate``             — wall-clock generator, same mapping (smoke/load).
* ``kafka``            — requires the spark-sql-kafka package on the
                         classpath; raises a clear error here when the
                         jars are absent (this sandbox ships none) rather
                         than an opaque ClassNotFound at start().

``with_trigger`` maps a policy string onto ``DataStreamWriter.trigger``:
``"once"``, ``"availableNow"``, ``"processingTime=30 seconds"``,
``"continuous=1 second"``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def _rate_to_events(stream: DataFrame) -> DataFrame:
    """Map the rate sources' (timestamp, value) onto the events schema —
    deterministic pure-Column derivations of user/type/value from the
    monotonic sequence number."""
    return stream.select(
        F.col("value").alias("event_id"),
        (F.pmod(F.col("value"), F.lit(1000))).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.col("value"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        (F.pmod(F.col("value") * 37, F.lit(10_000)) / 100.0).alias("value"),
    )


def stream_source(
    spark: SparkSession,
    kind: str,
    path: str | None = None,
    **options: str,
) -> DataFrame:
    """Open a streaming DataFrame of events from the named transport."""
    if kind == "file":
        if path is None:
            raise ValueError("file source requires path")
        static = spark.read.parquet(path)
        if path.endswith(".parquet"):
            base, fname = os.path.dirname(path), os.path.basename(path)
            return (
                spark.readStream.schema(static.schema)
                .format("parquet")
                .option("pathGlobFilter", fname)
                .load(base)
            )
        return spark.readStream.schema(static.schema).format("parquet").load(path)
    if kind in ("rate", "rate-micro-batch"):
        reader = spark.readStream.format(kind)
        defaults = (
            {"rowsPerBatch": "100"} if kind == "rate-micro-batch" else {"rowsPerSecond": "100"}
        )
        for k, v in {**defaults, **options}.items():
            reader = reader.option(k, v)
        return _rate_to_events(reader.load())
    if kind == "kafka":
        if spark.conf.get("spark.jars.packages", "").find("spark-sql-kafka") < 0 and not _kafka_on_classpath(spark):
            raise RuntimeError(
                "kafka source requires the spark-sql-kafka-0-10 package on the "
                "classpath (spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>); "
                "none is shipped in this environment"
            )
        reader = spark.readStream.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown stream source kind: {kind}")


def _kafka_on_classpath(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def with_trigger(writer: DataStreamWriter, policy: str) -> DataStreamWriter:
    """Apply a trigger policy string to a DataStreamWriter."""
    if policy == "once":
        return writer.trigger(once=True)
    if policy == "availableNow":
        return writer.trigger(availableNow=True)
    if policy.startswith("processingTime="):
        return writer.trigger(processingTime=policy.split("=", 1)[1])
    if policy.startswith("continuous="):
        return writer.trigger(continuous=policy.split("=", 1)[1])
    raise ValueError(f"unknown trigger policy: {policy}")
