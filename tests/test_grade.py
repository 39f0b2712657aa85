"""Grade decision table (G1), weight (G2), verdict (G3) vs the Python port
of the reference scorer — randomized + structured flag vectors.

Oracle: identity_matching_spark.oracle (direct port of
IdentityMatchingScorer.java:38-89; test-only).
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from identity_matching_spark.config import ALL_GRADES
from identity_matching_spark.operators.grade import grade_pairs
from identity_matching_spark.oracle import FLAG_FIELDS, Flags, match_weight, mdm_verdict, score_match


def _flag_df(spark, vectors):
    schema = T.StructType(
        [T.StructField("left_id", T.StringType()), T.StructField("right_id", T.StringType())]
        + [T.StructField(f, T.BooleanType()) for f in FLAG_FIELDS]
    )
    rows = [tuple([f"l{i}", f"r{i}"] + list(v)) for i, v in enumerate(vectors)]
    return spark.createDataFrame(rows, schema)


def _vectors():
    rng = random.Random(42)
    vecs = []
    # every single-flag vector
    for i in range(len(FLAG_FIELDS)):
        vecs.append(tuple(j == i for j in range(len(FLAG_FIELDS))))
    # all-off / all-on
    vecs.append(tuple([False] * len(FLAG_FIELDS)))
    vecs.append(tuple([True] * len(FLAG_FIELDS)))
    # randomized, varying densities
    for _ in range(3000):
        p = rng.choice([0.1, 0.25, 0.5, 0.75])
        vecs.append(tuple(rng.random() < p for _ in FLAG_FIELDS))
    return vecs


def test_grade_weight_verdict_match_reference_port(spark):
    vecs = _vectors()
    df = grade_pairs(_flag_df(spark, vecs))
    got = {r["left_id"]: r for r in df.collect()}
    for i, v in enumerate(vecs):
        f = Flags(**dict(zip(FLAG_FIELDS, v)))
        row = got[f"l{i}"]
        assert row["score"] == pytest.approx(score_match(f)), (i, v)
        assert row["weight"] == match_weight(f), (i, v)
        assert row["verdict"] == mdm_verdict(f), (i, v)


def test_grades_are_reference_tiers_only(spark):
    df = grade_pairs(_flag_df(spark, _vectors()))
    seen = {r["score"] for r in df.select("score").distinct().collect()}
    assert all(any(abs(s - g) < 1e-9 for g in ALL_GRADES) for s in seen)


def test_grade_monotone_in_flags(spark):
    """Adding a matching field never lowers the tier (SURVEY.md §5.2.5)."""
    rng = random.Random(7)
    base = []
    for _ in range(300):
        v = [rng.random() < 0.3 for _ in FLAG_FIELDS]
        base.append(tuple(v))
    for v in base:
        f = Flags(**dict(zip(FLAG_FIELDS, v)))
        s0 = score_match(f)
        for i in range(len(FLAG_FIELDS)):
            if not v[i]:
                v2 = list(v)
                v2[i] = True
                s1 = score_match(Flags(**dict(zip(FLAG_FIELDS, v2))))
                assert s1 >= s0
