"""Fuzzy comparator path: phonetic enrichment, fuzzy pair flags, MDM
phonetic verdict (mdm-rules.json semantics)."""

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.operators.compare import (
    FUZZY_FLAG_NAMES,
    compare_pairs_fuzzy,
    enrich_phonetic,
)
from identity_matching_spark.operators.grade import grade_pairs
from identity_matching_spark.operators.normalize import normalize_files

CFG = MatchConfig()


def _recs(spark, rows):
    files = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    return normalize_files(files)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        # same entity, stem typo'd: smith vs smyth (phonetic match, exact miss)
        ("r1", "src/io/smith.py", "a" * 40, "python", "alpha beta gamma"),
        ("r2", "src/io/smyth.py", "b" * 40, "python", "alpha beta gamma delta"),
        # unrelated
        ("r3", "lib/db/runner.py", "c" * 40, "go", "totally different content here"),
    ]
    recs = _recs(spark, rows)
    ids = recs.select("record_id", "path").collect()
    by_path = {r["path"]: r["record_id"] for r in ids}
    pairs = spark.createDataFrame(
        [
            tuple(sorted([by_path["src/io/smith.py"], by_path["src/io/smyth.py"]])),
            tuple(sorted([by_path["src/io/smith.py"], by_path["lib/db/runner.py"]])),
        ],
        ["left_id", "right_id"],
    )
    out = grade_pairs(compare_pairs_fuzzy(pairs, recs, CFG))
    rows_out = {(r["left_id"], r["right_id"]): r for r in out.collect()}
    smith_smyth = tuple(sorted([by_path["src/io/smith.py"], by_path["src/io/smyth.py"]]))
    smith_runner = tuple(sorted([by_path["src/io/smith.py"], by_path["lib/db/runner.py"]]))
    return rows_out[smith_smyth], rows_out[smith_runner]


def test_fuzzy_flags_present(scored):
    near, far = scored
    for f in FUZZY_FLAG_NAMES:
        assert f in near.asDict()


def test_phonetic_catches_typo_exact_misses(scored):
    near, _ = scored
    assert not near["family_name_match"]        # exact: smith != smyth
    assert near["soundex_family_match"]         # soundex: S530 == S530
    assert near["metaphone_family_match"]
    # JW(smith,smyth) = 0.8933 — below the 0.92 flag threshold but high sim
    assert not near["jw_family_match"]
    assert near["jw_family_sim"] == pytest.approx(0.8933, abs=1e-3)
    assert near["cologne_given_match"]          # same dir1 'src'


def test_unrelated_pair_no_fuzzy_match(scored):
    _, far = scored
    assert not far["soundex_family_match"]
    assert not far["jw_family_match"]
    assert not far["lev_family_match"]


def test_phonetic_verdict_follows_mdm_rules(scored):
    near, far = scored
    # cologne given (dir1 'src'='src') + soundex family -> MATCH
    assert near["verdict_phonetic"] == "MATCH"
    # different dir1 and family -> NO_MATCH
    assert far["verdict_phonetic"] == "NO_MATCH"


def test_fuzzy_sims_in_range(scored):
    near, far = scored
    assert 0.85 <= near["jw_family_sim"] <= 1.0
    assert 0.0 <= far["jw_family_sim"] < 0.7
    assert 0.0 <= far["lev_family_sim"] <= 1.0


def test_enrich_phonetic_columns(spark):
    recs = _recs(spark, [("r", "a/b/parser.py", "0" * 40, "python", "x y z")])
    out = enrich_phonetic(recs).select("cologne_dir1", "soundex_stem", "metaphone_stem").collect()[0]
    assert out["soundex_stem"] == "P626"
    assert out["cologne_dir1"] is not None
    assert out["metaphone_stem"] is not None


def test_kernel_plan_is_shuffle_free_in_broadcast_regime(spark):
    """With the records side under records_broadcast_limit, the scoring
    kernel must be one broadcast-probe pipeline over the pair stream:
    no sort-merge or shuffled-hash join anywhere in the scored plan."""
    rows = [
        ("r1", "src/io/smith.py", "a" * 40, "python", "alpha beta"),
        ("r2", "src/io/smyth.py", "b" * 40, "python", "alpha beta delta"),
    ]
    recs = _recs(spark, rows)
    ids = sorted(r["record_id"] for r in recs.select("record_id").collect())
    pairs = spark.createDataFrame([tuple(ids)], ["left_id", "right_id"])
    scored = grade_pairs(compare_pairs_fuzzy(pairs, recs, CFG))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # stems x2, jw table, attrs x2
