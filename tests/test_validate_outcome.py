"""P5/P6 runtime validation gate + S7/F8 no-match outcome branch."""

import json
import os

from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.corpus import generate_files
from identity_matching_spark.plans.pipeline import run_pipeline

CFG = MatchConfig(enable_fuzzy=False)


def _with_invalid(spark, n_valid=30, n_bad=5):
    valid = generate_files(spark, n_valid).drop("entity_id")
    # null content + single-segment path + no dirs -> every completeness
    # source absent -> INVALID tier
    bad = spark.createDataFrame(
        [("orgX", "x", f"c{i}", "en", None) for i in range(n_bad)],
        "repo string, path string, commit string, lang string, content string",
    )
    return valid.unionByName(bad), n_bad


def test_invalid_records_gated_before_blocking(spark):
    files, n_bad = _with_invalid(spark)
    res = run_pipeline(files, CFG)  # validation_level="BASE" default
    # the INVALID rows never enter the pipeline: no null-sha records, and
    # none of their record_ids appear in any pair side
    assert res.records.filter(F.col("content_sha256").isNull()).count() == 0
    bad_ids = res.records.filter(F.col("content").isNull()).count()
    assert bad_ids == 0


def test_validation_override_lets_all_through(spark):
    files, n_bad = _with_invalid(spark)
    gated = run_pipeline(files, CFG).records.count()
    override = run_pipeline(files, CFG.with_(validation_override=True)).records.count()
    assert override == gated + n_bad
    none_level = run_pipeline(files, CFG.with_(validation_level="NONE")).records.count()
    assert none_level == override


def test_unknown_level_rejected(spark):
    files, _ = _with_invalid(spark, n_valid=5, n_bad=1)
    import pytest

    with pytest.raises(ValueError, match="validation_level"):
        run_pipeline(files, CFG.with_(validation_level="L9"))


def test_no_match_outcome_branch(spark, tmp_path):
    """All-singleton corpus -> zero match edges -> one-row outcome frame
    with a uuid identity (IdentityMatching.java:486-495)."""
    from identity_matching_spark import cli

    rows = [
        (f"org{i}", f"dir{i}/sub{i}/unique_file_{i}.ext{i}", f"commit{i}", f"l{i}",
         f"completely distinct content body number {i} " + " ".join(
             f"tok{i}_{j}" for j in range(12)))
        for i in range(8)
    ]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    rc = cli.main(["--input", src, "--output", out, "--no-fuzzy", "--cpus", "4"])
    assert rc == 0
    outcome = spark.read.parquet(f"{out}/outcome").collect()
    assert len(outcome) == 1
    row = outcome[0].asDict()
    # IdentityMatching.java:488-489: severity WARNING, IssueType NOTFOUND
    assert row["severity"] == "warning" and row["code"] == "not-found"
    assert row["diagnostics"] == "No matches found."
    assert len(row["outcome_id"]) == 36  # uuid fullUrl analog (F8)


def test_match_params_quirk_and_enforcement(spark, tmp_path):
    """P1: onlyCertainMatches/count are parsed but NOT applied by default
    (reference parity, IdentityMatching.java — no use after :248);
    --enforce-params deliberately applies them."""
    import json
    import subprocess
    import sys

    from identity_matching_spark.corpus import generate_files

    src = str(tmp_path / "src")
    generate_files(spark, 60).drop("entity_id").write.parquet(src)

    def run(*extra):
        out = str(tmp_path / ("out" + str(len(extra))))
        r = subprocess.run(
            [sys.executable, "-m", "identity_matching_spark.cli", "--input", src,
             "--output", out, "--no-fuzzy", "--cpus", "4", *extra],
            capture_output=True, text=True, timeout=300,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line), out

    quirk, _ = run("--count", "5", "--only-certain")
    assert quirk["params_ignored"] == {"onlyCertainMatches": True, "count": 5}
    assert quirk["pairs_scored"] > 5  # nothing was filtered or capped

    enforced, out = run("--count", "5", "--only-certain", "--enforce-params")
    assert "params_ignored" not in enforced
    assert enforced["pairs_scored"] == 5
    rows = spark.read.parquet(f"{out}/scored_pairs").collect()
    assert all(r["score"] >= 0.99 for r in rows)
