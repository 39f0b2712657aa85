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


def _iceberg_runtime_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_snapshot_incremental_executes_with_runtime_jar(spark, tmp_path):
    """REAL Iceberg execution — auto-activates when the runtime jar is on
    the classpath: writerV2 createOrReplace, an append snapshot, the
    ``.snapshots`` metadata relation, and an incremental
    ``start-snapshot-id`` read returning exactly the appended delta (the
    real replacement for the parquet doc_id-cutoff simulation).

    This sandbox: no iceberg-spark-runtime jar ships in /opt/spark/jars
    and ``spark.jars.packages`` cannot resolve one (repo1.maven.org is
    unresolvable — no network), so the test SKIPS here; the seam itself
    is still contract-pinned above. On any deployment that adds
    ``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`` this test runs
    end-to-end with no code change (catalog plugins resolve lazily, so
    runtime conf.set suffices)."""
    if not _iceberg_runtime_on_classpath(spark):
        import pytest

        pytest.skip(
            "no Iceberg runtime jar on classpath; offline sandbox cannot "
            "fetch org.apache.iceberg:iceberg-spark-runtime (documented "
            "attempt: maven central DNS-unresolvable)"
        )
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse", str(tmp_path / "wh"))
    store = SnapshotStore(
        spark, str(tmp_path / "s"), table_format="iceberg", namespace="lake.linkage"
    )
    base = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("y"))
    store.write("records", base)
    snaps = store.snapshots("records")
    assert len(snaps) == 1 and snaps[0]["operation"] in ("overwrite", "append")
    delta = spark.range(5, 8).select(F.col("id"), (F.col("id") * 2).alias("y"))
    store.append("records", delta)
    assert len(store.snapshots("records")) == 2
    inc = store.read_incremental("records", snaps[0]["snapshot_id"])
    assert sorted(r["id"] for r in inc.collect()) == [5, 6, 7]
    assert store.count("records") == 8


def test_parquet_mode_snapshot_surface_shape(spark, tmp_path):
    """The parquet fallback exposes the same snapshot-listing shape (one
    implicit snapshot per overwrite) and refuses incremental reads loudly
    — so pipeline code written against the surface ports to Iceberg by
    flipping table_format only."""
    import pytest

    store = SnapshotStore(spark, str(tmp_path / "q"))
    assert store.snapshots("records") == []
    store.write("records", spark.range(4))
    snaps = store.snapshots("records")
    assert len(snaps) == 1 and snaps[0]["operation"] == "overwrite"
    assert isinstance(snaps[0]["snapshot_id"], int)
    store.append("records", spark.range(4, 6))
    assert store.count("records") == 6
    with pytest.raises(NotImplementedError):
        store.read_incremental("records", snaps[0]["snapshot_id"])


def test_parquet_mode_untouched_by_seam(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "p"))
    df = spark.range(3).select("id")
    store.write("t", df)
    assert store.has("t")
    assert store.read("t").count() == 3
