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

from pyspark.sql import DataFrame
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
