"""Blocking-quality / threshold-sweep metrics + incremental clustering.

* blocking_quality: per-family counts vs brute-force enumeration of the
  candidate and truth pair sets.
* threshold_sweep: cumulative precision/recall/F1 vs a hand computation
  over an enumerated pair list.
* update_clusters: incremental CC must equal from-scratch CC on the full
  edge set — merge, absorb, new-component, and no-delta cases, plus
  randomized graphs over several seeds.
"""

import random
from itertools import combinations

from identity_matching_spark.operators.cluster import (
    clusters_with_singletons,
    connected_components,
    update_clusters,
)
from identity_matching_spark.operators.metrics import (
    blocking_quality,
    threshold_sweep,
)


# --- blocking_quality --------------------------------------------------------


def _bq_fixture(spark):
    # family f1: blocks {a,b,c} and {d,e}; family f2: {a,d}, singleton {b}
    keyed = spark.createDataFrame(
        [
            ("a", "f1", "k1"), ("b", "f1", "k1"), ("c", "f1", "k1"),
            ("d", "f1", "k2"), ("e", "f1", "k2"),
            ("a", "f2", "k3"), ("d", "f2", "k3"), ("b", "f2", "k4"),
        ],
        "record_id string, family string, blocking_key string",
    )
    # truth: {a,b,d} one entity, {c,e} another
    truth = spark.createDataFrame(
        [("a", "T1"), ("b", "T1"), ("c", "T2"), ("d", "T1"), ("e", "T2")],
        "record_id string, true_cluster_id string",
    )
    return keyed, truth


def test_blocking_quality_counts(spark):
    keyed, truth = _bq_fixture(spark)
    got = {r["family"]: r.asDict() for r in blocking_quality(keyed, truth).collect()}
    # brute force: true pairs = C({a,b,d},2) + C({c,e},2) = 3 + 1 = 4
    # f1 candidates: C(3,2)+C(2,2->1 pair? C(2,2)=1) = 3 + 1 = 4
    #   covered true pairs in f1: k1 holds {a,b,c}: (a,b) true; k2 {d,e}: none
    #   -> wait: (d,e) has T1,T2 -> false; (c,e) not co-blocked. covered = 1...
    # recompute carefully below against literal enumeration:
    blocks = {
        "f1": [["a", "b", "c"], ["d", "e"]],
        "f2": [["a", "d"], ["b"]],
    }
    truth_map = {"a": "T1", "b": "T1", "c": "T2", "d": "T1", "e": "T2"}
    true_pairs = {
        frozenset(p)
        for p in combinations(truth_map, 2)
        if truth_map[p[0]] == truth_map[p[1]]
    }
    n = len(truth_map)
    for fam, blist in blocks.items():
        cand = sum(len(b) * (len(b) - 1) // 2 for b in blist)
        covered = {
            frozenset(p)
            for b in blist
            for p in combinations(b, 2)
            if frozenset(p) in true_pairs
        }
        row = got[fam]
        assert row["n_blocks"] == len(blist)
        assert row["max_block"] == max(len(b) for b in blist)
        assert row["cand_pairs"] == cand
        assert row["true_pairs_covered"] == len(covered)
        assert row["reduction_ratio"] == round(1.0 - cand / (n * (n - 1) // 2), 6)
        assert row["pairs_completeness"] == round(len(covered) / len(true_pairs), 6)


def test_blocking_quality_multi_key_pair_counted_once(spark):
    # the same true pair under TWO keys of one family counts once
    keyed = spark.createDataFrame(
        [("a", "f1", "k1"), ("b", "f1", "k1"), ("a", "f1", "k2"), ("b", "f1", "k2")],
        "record_id string, family string, blocking_key string",
    )
    truth = spark.createDataFrame(
        [("a", "T"), ("b", "T")], "record_id string, true_cluster_id string"
    )
    row = blocking_quality(keyed, truth).collect()[0]
    assert row["cand_pairs"] == 2          # multiset candidate volume
    assert row["true_pairs_covered"] == 1  # distinct coverage


# --- threshold_sweep ---------------------------------------------------------


def test_threshold_sweep_hand_computed(spark):
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.99), ("a", "c", 0.99), ("b", "c", 0.80),
            ("d", "e", 0.80), ("a", "d", 0.45),
        ],
        "left_id string, right_id string, score double",
    )
    # truth: {a,b,c} entity T1, {d,e} entity T2 -> 4 true pairs total;
    # scored true pairs: (a,b) (a,c) (b,c) (d,e); (a,d) false
    truth = spark.createDataFrame(
        [("a", "T1"), ("b", "T1"), ("c", "T1"), ("d", "T2"), ("e", "T2")],
        "record_id string, true_cluster_id string",
    )
    rows = {r["threshold"]: r.asDict() for r in threshold_sweep(scored, truth).collect()}
    assert set(rows) == {0.99, 0.80, 0.45}
    assert (rows[0.99]["pairs_at_threshold"], rows[0.99]["true_at_threshold"]) == (2, 2)
    assert (rows[0.80]["pairs_at_threshold"], rows[0.80]["true_at_threshold"]) == (4, 4)
    assert (rows[0.45]["pairs_at_threshold"], rows[0.45]["true_at_threshold"]) == (5, 4)
    assert rows[0.99]["precision"] == 1.0
    assert rows[0.99]["recall"] == 0.5
    assert rows[0.80]["recall"] == 1.0
    assert rows[0.45]["precision"] == 0.8
    f1_45 = 2 * 0.8 * 1.0 / (0.8 + 1.0)
    assert rows[0.45]["f1"] == round(f1_45, 6)


# --- update_clusters ---------------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        list(pairs), "left_id string, right_id string"
    )


def _cluster_map(df):
    return {r["record_id"]: r["cluster_id"] for r in df.collect()}


def _full(spark, nodes_df, edges):
    return _cluster_map(
        clusters_with_singletons(nodes_df, connected_components(_edges_df(spark, edges)))
    )


def _incremental(spark, nodes_df, old_edges, new_edges):
    base = clusters_with_singletons(
        nodes_df, connected_components(_edges_df(spark, old_edges))
    )
    upd = update_clusters(base, _edges_df(spark, new_edges))
    return _cluster_map(clusters_with_singletons(nodes_df, upd))


def test_update_clusters_merges_and_absorbs(spark):
    nodes = spark.createDataFrame(
        [(x,) for x in "abcdefgh"], "record_id string"
    )
    old = [("a", "b"), ("c", "d"), ("e", "f")]
    # merge ab+cd via (b,c); absorb new node g into ef; h stays singleton
    new = [("b", "c"), ("f", "g")]
    assert _incremental(spark, nodes, old, new) == _full(spark, nodes, old + new)


def test_update_clusters_no_delta_is_identity(spark):
    nodes = spark.createDataFrame([(x,) for x in "abcd"], "record_id string")
    old = [("a", "b"), ("c", "d")]
    assert _incremental(spark, nodes, old, []) == _full(spark, nodes, old)


def test_update_clusters_random_graphs(spark):
    ids = [f"n{i:02d}" for i in range(24)]
    nodes = spark.createDataFrame([(x,) for x in ids], "record_id string")
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        all_edges = list(
            {
                tuple(sorted(rng.sample(ids, 2)))
                for _ in range(30)
            }
        )
        rng.shuffle(all_edges)
        cut = len(all_edges) * 2 // 3
        old, new = all_edges[:cut], all_edges[cut:]
        assert _incremental(spark, nodes, old, new) == _full(
            spark, nodes, all_edges
        ), seed
