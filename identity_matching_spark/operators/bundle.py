"""Searchset-bundle entry assembly — the engine analog of the reference's
$idi-match output envelope (O3).

Reference behavior (IdentityMatching.java:192-227, 455-459, 1102-1114):
the match bundle is a FHIR ``searchset`` whose Patient entries carry
``search.mode = match`` and ``search.score = scoreMatch()``; ``total`` is
the number of Patient entries; an example Organization entry is prepended
at index 0 with ``search.mode = include``; every entry gets a
``fullUrl = <base>/<type>/<id>``.

The engine re-expresses this as a per-probe DataFrame op so a million
bundles assemble in one distributed pass instead of one servlet call
each. Documented divergence: the reference appends Patient entries in
JPA retrieval order, which is unspecified — we order deterministically
by (score desc, candidate id asc) so results are stable across runs and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORG_ID = "OrgExample"  # classpath:Organization-OrgExample.json (IdentityMatching.java:205)


def match_bundle_entries(
    scored: DataFrame,
    base_url: str = "http://example.org",
    probe_col: str = "left_id",
    candidate_col: str = "right_id",
    score_col: str = "score",
    org_id: str = ORG_ID,
) -> DataFrame:
    """scored(probe, candidate, score) -> one searchset entry per row.

    Output per probe: entry_index 0 = the Organization include entry,
    1..n = Patient match entries ordered (score desc, candidate asc);
    ``bundle_total`` counts Patient entries only, matching the
    reference's ``setTotal`` filter (IdentityMatching.java:202).
    """
    pats = scored.select(
        F.col(probe_col).alias("probe_id"),
        F.col(candidate_col).cast("string").alias("resource_id"),
        F.col(score_col).cast("double").alias("search_score"),
    ).withColumn(
        "entry_index",
        F.row_number().over(
            Window.partitionBy("probe_id").orderBy(
                F.desc("search_score"), F.asc("resource_id")
            )
        ),
    ).withColumn("bundle_total", F.count("*").over(Window.partitionBy("probe_id")))

    patients = pats.select(
        "probe_id",
        "entry_index",
        F.lit("Patient").alias("resource_type"),
        "resource_id",
        F.concat(F.lit(base_url + "/Patient/"), F.col("resource_id")).alias("full_url"),
        F.lit("match").alias("search_mode"),
        "search_score",
        "bundle_total",
    )
    orgs = (
        pats.groupBy("probe_id")
        .agg(F.max("bundle_total").alias("bundle_total"))
        .select(
            "probe_id",
            F.lit(0).alias("entry_index"),
            F.lit("Organization").alias("resource_type"),
            F.lit(org_id).alias("resource_id"),
            F.lit(f"{base_url}/Organization/{org_id}").alias("full_url"),
            F.lit("include").alias("search_mode"),
            F.lit(None).cast("double").alias("search_score"),
            "bundle_total",
        )
    )
    return patients.unionByName(orgs)
