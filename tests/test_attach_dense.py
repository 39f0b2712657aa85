"""Dense-id (didx) probe path: attach_sides keyed on interned dense longs
must produce exactly the rows the rid64/string-id paths produce."""

from pyspark.sql import functions as F

from identity_matching_spark.operators.compare import compare_pairs
from identity_matching_spark.operators.normalize import normalize_files, with_dense_ids


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dense_ids_are_dense_and_deterministic(spark):
    files = spark.createDataFrame(
        [(f"r{i}", f"src/mod{i % 3}/f{i}.py", "c" * 40, "python", f"line {i}\nx")
         for i in range(7)],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = with_dense_ids(normalize_files(files))
    got = recs.select("record_id", "didx").collect()
    ids = sorted(r["record_id"] for r in got)
    by_id = {r["record_id"]: r["didx"] for r in got}
    assert sorted(by_id.values()) == list(range(7))
    # rank order == record_id string order
    assert [by_id[i] for i in ids] == list(range(7))


def test_dense_attach_equals_string_attach(spark):
    files = spark.createDataFrame(
        [
            ("r1", "src/io/smith.py", "a" * 40, "python", "alpha beta"),
            ("r2", "src/io/smyth.py", "b" * 40, "python", "alpha beta delta"),
            ("r3", "lib/db/runner.py", "c" * 40, "go", "other content"),
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = with_dense_ids(normalize_files(files))
    ids = sorted(r["record_id"] for r in recs.select("record_id").collect())
    pairs = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[0], ids[2]), (ids[1], ids[2])],
        ["left_id", "right_id"],
    )
    m = recs.select("record_id", "didx")
    pairs_dense = (
        pairs
        .join(m.select(F.col("record_id").alias("left_id"),
                       F.col("didx").alias("left_didx")), "left_id")
        .join(m.select(F.col("record_id").alias("right_id"),
                       F.col("didx").alias("right_didx")), "right_id")
        .select("left_id", "right_id", "left_didx", "right_didx")
    )
    via_strings = compare_pairs(pairs, recs.drop("didx"))
    via_dense = compare_pairs(pairs_dense, recs)
    assert via_dense.columns == via_strings.columns
    assert _rows(via_dense) == _rows(via_strings)


def test_production_blocking_carries_didx(spark):
    """candidate_pairs must emit left_didx/right_didx when the records
    relation carries didx, so the production scoring attach takes the
    dense-id probe path (the same path the kernel bench measures)."""
    from identity_matching_spark.config import MatchConfig
    from identity_matching_spark.operators.blocking import candidate_pairs

    files = spark.createDataFrame(
        [(f"r{i}", f"src/m{i % 2}/same.py", "c" * 40, "python", "shared body")
         for i in range(6)],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = with_dense_ids(normalize_files(files))
    res = candidate_pairs(recs, MatchConfig())
    assert {"left_didx", "right_didx"} <= set(res.pairs.columns)
    by_id = {r["record_id"]: r["didx"] for r in recs.select("record_id", "didx").collect()}
    for row in res.pairs.collect():
        assert row["left_didx"] == by_id[row["left_id"]]
        assert row["right_didx"] == by_id[row["right_id"]]
    # didx-less records keep the slim rid64-only pair schema
    res2 = candidate_pairs(recs.drop("didx"), MatchConfig())
    assert "left_didx" not in res2.pairs.columns


def test_with_dense_ids_scales_without_global_window(spark):
    """The rank assignment must not plan a single-partition global window:
    order-preserving bucket ranks + offsets only."""
    files = spark.createDataFrame(
        [(f"r{i}", f"p{i}.py", "c" * 40, "python", f"body {i}") for i in range(50)],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = with_dense_ids(normalize_files(files))
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_dense_ids_identical_across_nibble_widths(spark):
    """didx must be bit-identical at every prefix_nibbles width (VERDICT r4
    #3): the bucket scheme re-partitions the rank computation but never
    reorders it, so a forced-4-nibble run (the 10^12-id shape) assigns the
    same ids as the 2-nibble default."""
    files = spark.createDataFrame(
        [(f"r{i}", f"src/m{i % 5}/f{i}.py", "c" * 40, "python", f"body {i}")
         for i in range(64)],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = normalize_files(files)
    by_width = {}
    for nib in (2, 4, 6):
        got = with_dense_ids(recs, prefix_nibbles=nib)
        by_width[nib] = sorted(
            (r["record_id"], r["didx"])
            for r in got.select("record_id", "didx").collect()
        )
    assert by_width[2] == by_width[4] == by_width[6]
    assert sorted(d for _, d in by_width[2]) == list(range(64))


def test_dense_ids_autoscale_width(spark):
    """prefix_nibbles=None derives the width from the input: tiny inputs
    stay at 2 nibbles; a small target_bucket_rows forces a wider prefix,
    with identical didx values either way."""
    files = spark.createDataFrame(
        [(f"r{i}", f"f{i}.py", "c" * 40, "python", f"body {i}") for i in range(32)],
        ["repo", "path", "commit", "lang", "content"],
    )
    recs = normalize_files(files)
    auto = with_dense_ids(recs, target_bucket_rows=4)  # forces ceil(log16(8))=2.. wider path
    default = with_dense_ids(recs, prefix_nibbles=2)
    rows = lambda df: sorted(
        (r["record_id"], r["didx"]) for r in df.select("record_id", "didx").collect()
    )
    assert rows(auto) == rows(default)


def test_pipeline_forced_4_nibbles_identical(spark, sf_dir):
    """run_pipeline with dense_id_nibbles=4 must yield bit-identical
    candidate pairs and clusters to the auto-width run (VERDICT r4 #3
    done-criterion)."""
    from identity_matching_spark.config import MatchConfig
    from identity_matching_spark.plans.pipeline import run_pipeline
    from identity_matching_spark.sources.tables import (
        files_from_documents,
        load_table,
    )

    corpus_files = files_from_documents(load_table(spark, sf_dir, "documents"))
    base = run_pipeline(corpus_files, MatchConfig(enable_fuzzy=False))
    forced = run_pipeline(
        corpus_files, MatchConfig(enable_fuzzy=False, dense_id_nibbles=4)
    )
    assert _rows(base.pairs.select("left_id", "right_id")) == _rows(
        forced.pairs.select("left_id", "right_id")
    )
    assert _rows(base.clusters) == _rows(forced.clusters)
    base.cleanup()
    forced.cleanup()
