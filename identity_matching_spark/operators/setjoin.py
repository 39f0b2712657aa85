"""Prefix-filter set-similarity self-join (PPJoin-style candidate
generation; Chaudhuri et al. ICDE'06, Xiao et al. WWW'08).

The reference generates match candidates by deterministic blocking keys
(IdentityMatching.java search-parameter blocks); this operator is the
set-overlap analog a training-data pipeline needs when "same block" is
"shares a rare token": all document pairs with token-set Jaccard >=
threshold, WITHOUT the all-pairs join.

Why it scales (the whole point):

* Each document's distinct tokens are ordered by GLOBAL ascending
  document frequency (rarest first, token string as tie-break) — the
  canonical prefix-filter total order, so prefixes are built from the
  rarest tokens and candidate lists stay short.
* Only the first ``|t| - ceil(threshold*|t|) + 1`` tokens (the prefix)
  enter the join. Completeness: if ``J(A,B) >= t`` then
  ``|A∩B| >= ceil(t*max(|A|,|B|))``; the tokens of A outside its prefix
  number ``ceil(t*|A|) - 1 < |A∩B|``, so the globally-smallest shared
  token sits inside BOTH prefixes (pigeonhole) — no qualifying pair is
  missed.
* A length filter (``min(|A|,|B|) >= ceil(t*max(|A|,|B|))``) prunes
  candidates before the verification attach, and exact Jaccard is
  re-computed on collisions only — identical output to the naive
  all-pairs join, which is exactly what the DuckDB oracle runs at
  sf0.01 (``__spark_entry__.oracle_sql()['set_similarity_join']``).

Shuffle budget at 100 TB: one explode+groupBy for the df table, one
groupBy to re-sort tokens per doc, one slim (token, id, n) self-join on
prefix tokens, two slim attach joins for verification. Nothing is
quadratic in the corpus; candidate volume is bounded by rare-token
co-occurrence (hot tokens are in nobody's prefix unless the doc is
short). No UDFs — everything is codegen'd Columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.functions.normalize import tokens_of


def set_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """All (a, b, jaccard) pairs with distinct-token Jaccard >= threshold,
    a < b, via the prefix filter. Output is value-identical to the naive
    all-pairs join (the oracle); only the plan differs."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens_of(F.col(text_col))).alias("toks"),
    ).filter(F.size("toks") > 0)

    tok = base.select("id", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("df"))

    # Rarest-first canonical order: sort each doc's tokens by (global df,
    # token). array_sort on (df, tok) structs keeps this a pure Column op.
    ordered = (
        tok.join(freq, "tok")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("o"))
        .select("id", F.transform("o", lambda s: s["tok"]).alias("stoks"))
    )
    n = F.size("stoks")
    plen = (n - F.ceil(F.lit(threshold) * n) + F.lit(1)).cast("int")
    pref = ordered.select(
        "id", n.alias("n"), F.slice("stoks", F.lit(1), plen).alias("prefix")
    )

    ex = pref.select("id", "n", F.explode("prefix").alias("tok"))
    l = ex.select("tok", F.col("id").alias("a"), F.col("n").alias("na"))
    r = ex.select("tok", F.col("id").alias("b"), F.col("n").alias("nb"))
    cands = (
        l.join(r, "tok")
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.least("na", "nb")
            >= F.ceil(F.lit(threshold) * F.greatest("na", "nb"))
        )
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )

    # Verification re-attaches the full token sets by id (slim join, same
    # pattern as compare.attach_sides) and computes exact Jaccard on the
    # surviving candidates only.
    sa = base.select(F.col("id").alias("a"), F.col("toks").alias("ta"))
    sb = base.select(F.col("id").alias("b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")) / F.size(F.array_union("ta", "tb"))
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
