"""Snapshot store: parquet-backed stage checkpoints + lineage table.

Stand-in for Iceberg table snapshots (reference analog: the Batch2 job
checkpointing surface, web/JobController.java:15-41, and HAPI's persistent
store). No Iceberg jars ship in this sandbox, so the store isolates the
persistence contract — ``write/read/has`` per named stage plus an
append-only lineage log — behind one class; an Iceberg deployment swaps
``df.write.parquet`` for ``df.writeTo(ns.stage).createOrReplace()`` and
``log_lineage`` for snapshot metadata, nothing else changes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # not underscore-prefixed: Spark's file index skips _metadata-style
        # names, and spark.read.json must be able to see this file
        self._lineage_path = os.path.join(root, "lineage-log.jsonl")

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def has(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, name: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def count(self, name: str) -> int:
        return self.read(name).count()

    def log_lineage(self, stage: str, **metrics) -> None:
        row = {"stage": stage, "ts": time.time(), **metrics}
        with open(self._lineage_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")

    def lineage(self) -> DataFrame | None:
        if not os.path.exists(self._lineage_path):
            return None
        return self.spark.read.json(self._lineage_path)
