"""Prefix-filter set-similarity join + pairwise cluster metrics.

* setjoin: output must be value-identical to the naive all-pairs Jaccard
  join (prefix-filter completeness) on a corpus engineered with near-dups.
* metrics: C(n,2) combinatorics vs hand-enumerated pair counts, plus the
  perfect-clustering and orthogonal-clustering identities.
"""

import math
from itertools import combinations

from pyspark.sql import functions as F

from identity_matching_spark.functions.normalize import tokens_of
from identity_matching_spark.operators.metrics import pairwise_cluster_metrics
from identity_matching_spark.operators.setjoin import set_similarity_join


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox leaps over the lazy dog"),   # near-dup of 1
        (3, "quick brown foxes jump over lazy dogs"),
        (4, "entirely different content about spark shuffles"),
        (5, "content about spark shuffles and skew handling"),
        (6, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (7, "singleton with unique vocabulary zyxwv"),
        (8, ""),                                              # empty -> dropped
        (9, "spark spark spark spark"),                       # collapses to 1 token
        (10, "skew handling about content spark shuffles and"),  # permuted 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_force(spark, docs, threshold):
    base = docs.select(
        "doc_id", F.array_distinct(tokens_of(F.col("text"))).alias("toks")
    ).filter(F.size("toks") > 0)
    rows = {r["doc_id"]: set(r["toks"]) for r in base.collect()}
    out = set()
    for a, b in combinations(sorted(rows), 2):
        j = round(len(rows[a] & rows[b]) / len(rows[a] | rows[b]), 4)
        if j >= threshold:
            out.add((a, b, j))
    return out


def test_setjoin_matches_bruteforce(spark):
    docs = _corpus(spark)
    for threshold in (0.3, 0.5, 0.8):
        got = {
            (r["a"], r["b"], r["jaccard"])
            for r in set_similarity_join(docs, threshold=threshold).collect()
        }
        assert got == _brute_force(spark, docs, threshold), threshold


def test_setjoin_exact_dup_is_one(spark):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in set_similarity_join(_corpus(spark), threshold=0.5).collect()
    }
    assert got[(1, 6)] == 1.0
    assert got[(5, 10)] == 1.0  # token sets ignore order


def _metrics_row(spark, pred, truth):
    p = spark.createDataFrame(pred, "record_id string, cluster_id string")
    t = spark.createDataFrame(truth, "record_id string, true_cluster_id string")
    return pairwise_cluster_metrics(p, t).collect()[0]


def test_metrics_hand_enumerated(spark):
    # pred: {a,b,c}, {d,e} ; truth: {a,b}, {c,d}, {e}
    pred = [("a", "1"), ("b", "1"), ("c", "1"), ("d", "2"), ("e", "2")]
    truth = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y"), ("e", "z")]
    r = _metrics_row(spark, pred, truth)
    # pred pairs: C(3,2)+C(2,2)=3+1=4; true pairs: C(2,2)+C(2,2)=2
    # TP cells: (1,x)->2 gives 1 pair; (1,y)->1, (2,y)->1, (2,z)->1 give 0
    assert (r["tp_pairs"], r["pred_pairs"], r["true_pairs"]) == (1, 4, 2)
    assert r["precision"] == 0.25 and r["recall"] == 0.5
    assert r["f1"] == round(2 * 0.25 * 0.5 / 0.75, 6)


def test_metrics_perfect_and_orthogonal(spark):
    pred = [(c, g) for c, g in zip("abcdef", "112233")]
    same = [(c, g) for c, g in zip("abcdef", "xxyyzz")]
    r = _metrics_row(spark, pred, same)
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0
    # all-singletons truth: no true pairs -> recall/f1 null, precision 0
    single = [(c, c) for c in "abcdef"]
    r2 = _metrics_row(spark, pred, single)
    assert r2["true_pairs"] == 0 and r2["recall"] is None and r2["f1"] is None
    assert r2["precision"] == 0.0


def test_metrics_no_pair_blowup(spark):
    # one 10k-record cluster: pair count must be exact C(10000,2) without
    # enumerating the 5*10^7 pairs.
    n = 10_000
    pred = spark.range(n).select(
        F.col("id").cast("string").alias("record_id"), F.lit("c").alias("cluster_id")
    )
    truth = pred.select(
        "record_id", F.col("cluster_id").alias("true_cluster_id")
    )
    r = pairwise_cluster_metrics(pred, truth).collect()[0]
    assert r["tp_pairs"] == math.comb(n, 2)
    assert r["f1"] == 1.0
