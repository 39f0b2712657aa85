"""Pairwise cluster-quality metrics WITHOUT materializing pairs.

The north rule grades this engine on pairwise F1 >= 0.99 against the
reference's match decisions (BASELINE.json; reference decision table
IdentityMatchingScorer.java). The parity gate itself is
tests/test_decision_parity_f1.py; THIS operator makes the F1 computation
a first-class distributed op, so the same evaluation runs at corpus
scale — where "enumerate all intra-cluster pairs" is impossible (a
10^8-record cluster alone holds ~5*10^15 pairs).

Trick: pairwise precision/recall are pure functions of cluster SIZES.
With predicted labels P and truth labels T over the same record set:

    TP    = sum over (p, t) cells of C(n_pt, 2)
    PRED  = sum over p of C(n_p, 2)
    TRUE  = sum over t of C(n_t, 2)
    precision = TP/PRED, recall = TP/TRUE, F1 = harmonic mean

Three slim aggregations — one (id->label) equi-join + three groupBys on
label columns, every one map-side combinable — instead of a quadratic
pair expansion. C(n,2) uses integer DIV so counts stay exact BIGINTs far
past 2^53.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pair_count(grouped: DataFrame, n_col: str = "n") -> DataFrame:
    """sum C(n,2) over the groups, as one exact BIGINT row."""
    return grouped.select(
        F.coalesce(
            F.sum(F.expr(f"{n_col} * ({n_col} - 1) DIV 2")), F.lit(0)
        ).cast("long").alias("pairs")
    )


def pairwise_cluster_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "record_id",
    pred_col: str = "cluster_id",
    truth_col: str = "true_cluster_id",
) -> DataFrame:
    """One-row DataFrame: (n_records, tp_pairs, pred_pairs, true_pairs,
    precision, recall, f1) for predicted vs truth cluster assignments.

    Records present in only one side are dropped (inner join) — a record
    without a truth label can contribute neither TP nor FN.
    """
    j = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")).join(
        truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")),
        "_id",
    )
    cells = j.groupBy("_p", "_t").agg(F.count("*").alias("n"))
    tp = _pair_count(cells).withColumnRenamed("pairs", "tp_pairs")
    pp = _pair_count(j.groupBy("_p").agg(F.count("*").alias("n"))).withColumnRenamed(
        "pairs", "pred_pairs"
    )
    tt = _pair_count(j.groupBy("_t").agg(F.count("*").alias("n"))).withColumnRenamed(
        "pairs", "true_pairs"
    )
    nrec = j.select(F.count("*").cast("long").alias("n_records"))
    m = nrec.crossJoin(tp).crossJoin(pp).crossJoin(tt)
    prec = F.when(F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs"))
    rec = F.when(F.col("true_pairs") > 0, F.col("tp_pairs") / F.col("true_pairs"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2 * prec * rec / (prec + rec),
    )
    return m.select(
        "n_records",
        "tp_pairs",
        "pred_pairs",
        "true_pairs",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def blocking_quality(
    keyed: DataFrame,
    truth: DataFrame,
    id_col: str = "record_id",
    truth_col: str = "true_cluster_id",
) -> DataFrame:
    """Per-family blocking quality report: block counts, candidate-pair
    volume, reduction ratio, and pairs-completeness vs a truth labeling.

    The standard blocking-evaluation pair (reduction ratio / pairs
    completeness) for tuning the key families the reference configures in
    mdm-rules.json:4-17 — which families earn their candidate volume, and
    which true matches they can even reach.

    Scale shape (what survives 10^12 rows):
    * candidate volume is SUM C(n,2) over per-block sizes — combinatorics
      over a groupBy, the pair set is never materialized;
    * pairs-completeness joins keyed rows on (family, key, truth-label) —
      the truth label is part of the equi-join key, so the join output is
      linear in true-pair volume per block, not block-size-quadratic;
    * the distinct-pair dedup is bounded by (covered true pairs) x
      (families), orders of magnitude below the candidate volume.

    Output: one row per family —
    (family, n_blocks, max_block, cand_pairs, reduction_ratio,
     true_pairs_covered, pairs_completeness).
    """
    sizes = keyed.groupBy("family", "blocking_key").agg(F.count("*").alias("n"))
    per_fam = sizes.groupBy("family").agg(
        F.count("*").alias("n_blocks"),
        F.max("n").alias("max_block"),
        F.sum(F.expr("n * (n - 1) DIV 2")).cast("long").alias("cand_pairs"),
    )
    slim_truth = truth.select(
        F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")
    )
    n_rec = slim_truth.select(F.count("*").cast("long").alias("_nrec"))
    true_total = (
        slim_truth.groupBy("_t")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce(F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0))
            .cast("long")
            .alias("_true_total")
        )
    )
    kt = keyed.select(
        F.col(id_col).alias("_id"), "family", "blocking_key"
    ).join(slim_truth, "_id")
    lhs = kt.select("family", "blocking_key", "_t", F.col("_id").alias("_l"))
    rhs = kt.select("family", "blocking_key", "_t", F.col("_id").alias("_r"))
    covered = (
        lhs.join(rhs, ["family", "blocking_key", "_t"])
        .filter(F.col("_l") < F.col("_r"))
        .select("family", "_l", "_r")
        .dropDuplicates(["family", "_l", "_r"])
        .groupBy("family")
        .agg(F.count("*").cast("long").alias("true_pairs_covered"))
    )
    out = (
        per_fam.join(covered, "family", "left")
        .crossJoin(n_rec)
        .crossJoin(true_total)
    )
    total_pairs = F.expr("_nrec * (_nrec - 1) DIV 2")
    return out.select(
        "family",
        "n_blocks",
        "max_block",
        "cand_pairs",
        F.round(
            F.lit(1.0) - F.col("cand_pairs") / total_pairs.cast("double"), 6
        ).alias("reduction_ratio"),
        F.coalesce("true_pairs_covered", F.lit(0)).cast("long").alias(
            "true_pairs_covered"
        ),
        F.round(
            F.when(
                F.col("_true_total") > 0,
                F.coalesce("true_pairs_covered", F.lit(0))
                / F.col("_true_total").cast("double"),
            ),
            6,
        ).alias("pairs_completeness"),
    )


def threshold_sweep(
    scored: DataFrame,
    truth: DataFrame,
    id_col: str = "record_id",
    truth_col: str = "true_cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Precision/recall/F1 at every distinct score threshold — the
    Fellegi-Sunter calibration curve for picking the match/possible
    cutoffs the reference hard-codes in its decision table
    (IdentityMatchingScorer.java grade tiers).

    Scale shape: pairs are labeled with two slim broadcast-able joins and
    immediately collapsed by groupBy(score) — the decision table emits a
    FIXED set of grades, so the grouped relation is O(#grades) rows no
    matter the corpus. The cumulative window then runs over that tiny
    aggregated set (single-partition by construction, and safe for the
    same reason). Recall's denominator is the GLOBAL true-pair count from
    cluster-size combinatorics, so pairs the blocking never surfaced
    still count against recall.
    """
    slim_truth = truth.select(
        F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")
    )
    lab = (
        scored.select("left_id", "right_id", score_col)
        .join(
            slim_truth.select(
                F.col("_id").alias("left_id"), F.col("_t").alias("_tl")
            ),
            "left_id",
        )
        .join(
            slim_truth.select(
                F.col("_id").alias("right_id"), F.col("_t").alias("_tr")
            ),
            "right_id",
        )
        .select(
            F.col(score_col).cast("double").alias("threshold"),
            (F.col("_tl") == F.col("_tr")).cast("long").alias("is_true"),
        )
    )
    g = lab.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("is_true").cast("long").alias("n_true"),
    )
    true_total = (
        slim_truth.groupBy("_t")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce(F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0))
            .cast("long")
            .alias("_true_total")
        )
    )
    w = (
        Window.orderBy(F.col("threshold").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "threshold",
        F.sum("n_pairs").over(w).cast("long").alias("pairs_at_threshold"),
        F.sum("n_true").over(w).cast("long").alias("true_at_threshold"),
    ).crossJoin(true_total)
    prec = F.col("true_at_threshold") / F.col("pairs_at_threshold").cast("double")
    rec = F.when(
        F.col("_true_total") > 0,
        F.col("true_at_threshold") / F.col("_true_total").cast("double"),
    )
    f1 = F.when(
        rec.isNotNull() & ((prec + rec) > 0), 2 * prec * rec / (prec + rec)
    )
    return cum.select(
        "threshold",
        "pairs_at_threshold",
        "true_at_threshold",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
