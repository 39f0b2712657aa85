"""Contract test for the Iceberg snapshot seam.

No Iceberg jars ship in this image, so the catalog write/read path is
pinned by capturing the DataFrameWriterV2 chain: SnapshotStore in
``table_format="iceberg"`` mode must route a stage write through
``df.writeTo("<namespace>.<stage>").using("iceberg").createOrReplace()``
with the DataFrame (and hence schema) intact, and route reads/existence
checks through the catalog. On a real deployment only the spark-session
catalog config changes — no engine code."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.sources.snapshots import SnapshotStore


class _FakeV2Writer:
    def __init__(self, rec):
        self.rec = rec

    def using(self, fmt):
        self.rec["using"] = fmt
        return self

    def createOrReplace(self):
        self.rec["created"] = True


def test_iceberg_write_read_contract(spark, tmp_path, monkeypatch):
    calls = []

    def fake_write_to(self, table):
        rec = {"df": self, "table": table}
        calls.append(rec)
        return _FakeV2Writer(rec)

    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("y"))
    # patch the concrete class (pyspark.sql.classic.DataFrame in Spark 4
    # overrides the base-class method)
    monkeypatch.setattr(type(df), "writeTo", fake_write_to)
    store = SnapshotStore(
        spark, str(tmp_path / "s"), table_format="iceberg", namespace="lake.linkage"
    )
    store.write("records", df)
    assert len(calls) == 1
    assert calls[0]["table"] == "lake.linkage.records"
    assert calls[0]["using"] == "iceberg"
    assert calls[0]["created"] is True
    assert calls[0]["df"].schema == df.schema  # schema rides the seam untouched

    read_tables = []
    monkeypatch.setattr(
        type(spark.read), "table", lambda self, t: read_tables.append(t) or df
    )
    back = store.read("records")
    assert read_tables == ["lake.linkage.records"] and back is df

    exists_q = []
    monkeypatch.setattr(
        type(spark.catalog), "tableExists", lambda self, t: exists_q.append(t) or True
    )
    assert store.has("records") is True
    assert exists_q == ["lake.linkage.records"]


def test_parquet_mode_untouched_by_seam(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "p"))
    df = spark.range(3).select("id")
    store.write("t", df)
    assert store.has("t")
    assert store.read("t").count() == 3
