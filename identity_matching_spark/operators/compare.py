"""Pairwise comparators: candidate pairs -> feature (flag) vector.

Port of the reference's scoring loops (IdentityMatching.java:285-481) to
vectorized Column expressions over a pair DataFrame. Each reference flag
is an EXISTS over element pairs (sticky boolean setters,
IdentityMatchingScorer.java:96-234) — here ``arrays_overlap`` / equality
on pre-derived attributes, evaluated in whole-stage codegen. NULL on
either side is "no match" (the reference's loops simply never fire),
hence every flag is wrapped in explicit NOT NULL guards so the same SQL
evaluates identically in the DuckDB oracle.

Deliberate divergences from the reference, documented per SURVEY.md §2.11:

* C2 (SSN4 vs full SSN) and C6 (middle initial) are query-side-asymmetric
  in the server (a query carries only last-4 / only an initial). Batch
  all-pairs linkage has no query side, so both are symmetrized:
  last-4-of-full == last-4-of-full; initial rule fires when EITHER side's
  middle is single-char.
* Scoring remains case-sensitive exact on raw attributes while blocking
  normalized — the reference's asymmetry, preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Columns each side of a pair needs for comparison. Identity attributes
# ride as 8-byte h64 twins (see operators/normalize.py H64_PAIRS) — the
# 64-byte hex strings never enter the pair shuffle.
ATTR_COLS = [
    "record_id", "content_h64", "file_h64", "norm_h64", "ssn4", "stem", "ext",
    "dir1", "dir2", "parent_dir", "lang_norm", "size_bucket",
    "first_line_h64", "last_line_h64", "line_hashes", "sorted_lines_h64",
    "shape_h64", "ins_member_h64", "ins_subscriber_h64",
]

# (flag name, attribute, comparison kind)
FLAG_NAMES = [
    "mrn_match", "digital_id_match", "ssn_match", "ssn_last4_match",
    "drivers_license_match", "passport_match", "insurance_member_match",
    "insurance_subscriber_match", "family_name_match", "first_name_match",
    "middle_name_match", "middle_initial_match", "birth_sex_match",
    "birth_date_match", "phone_match", "email_match", "address_line_match",
    "address_city_match", "address_state_match", "address_postal_match",
]


def _eq(l: Column, r: Column) -> Column:
    """Null-safe 'both present and equal' (reference loops skip nulls)."""
    return l.isNotNull() & r.isNotNull() & (l == r)


def attach_sides(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """Join attributes onto both sides of the pair list.

    Two shuffles on record_id (unavoidable for arbitrary pair lists);
    records is projected to ATTR_COLS first so the shuffled payload is
    minimal (no content strings cross the wire).
    """
    attrs = records.select(*ATTR_COLS)
    lhs = attrs.select([F.col(c).alias(f"l_{c}") for c in ATTR_COLS])
    rhs = attrs.select([F.col(c).alias(f"r_{c}") for c in ATTR_COLS])
    # shuffle_hash on the records side: a sort-merge id-join would SORT the
    # wide pair×attrs intermediate on the second attach (measured ~930
    # task-seconds at sf0.1 — external sort spill of ~330 MB/task); with
    # the records side as the hashed build relation the pair stream only
    # shuffles, never sorts. The build side is one records partition per
    # task — the relation a cluster co-partitions by record_id anyway.
    return (
        pairs.join(lhs.hint("shuffle_hash"), pairs.left_id == lhs.l_record_id, "inner")
        .join(rhs.hint("shuffle_hash"), pairs.right_id == rhs.r_record_id, "inner")
        .drop("l_record_id", "r_record_id")
    )


def comparator_flags() -> dict[str, Column]:
    """The C1-C13 flag expressions over an attached pair row.

    Citations: identifier matching IdentityMatching.java:304-354, names
    :357-397, birth sex/date :399-411, address :414-433, telecom :436-453.
    """
    L = lambda c: F.col(f"l_{c}")  # noqa: E731
    R = lambda c: F.col(f"r_{c}")  # noqa: E731

    middle_initial = (
        L("dir2").isNotNull() & R("dir2").isNotNull()
        & ((F.length(L("dir2")) == 1) | (F.length(R("dir2")) == 1))
        & (F.substring(L("dir2"), 1, 1) == F.substring(R("dir2"), 1, 1))
    )

    return {
        "mrn_match": _eq(L("content_h64"), R("content_h64")),
        "digital_id_match": _eq(L("file_h64"), R("file_h64")),
        "ssn_match": _eq(L("norm_h64"), R("norm_h64")),
        "ssn_last4_match": _eq(L("ssn4"), R("ssn4")),
        "drivers_license_match": _eq(L("sorted_lines_h64"), R("sorted_lines_h64")),
        "passport_match": _eq(L("shape_h64"), R("shape_h64")),
        "insurance_member_match": _eq(L("ins_member_h64"), R("ins_member_h64")),
        "insurance_subscriber_match": _eq(L("ins_subscriber_h64"), R("ins_subscriber_h64")),
        "family_name_match": _eq(L("stem"), R("stem")),
        "first_name_match": _eq(L("dir1"), R("dir1")),
        "middle_name_match": _eq(L("dir2"), R("dir2")),
        "middle_initial_match": middle_initial,
        "birth_sex_match": _eq(L("lang_norm"), R("lang_norm")),
        "birth_date_match": _eq(L("size_bucket"), R("size_bucket")),
        "phone_match": _eq(L("first_line_h64"), R("first_line_h64")),
        "email_match": _eq(L("last_line_h64"), R("last_line_h64")),
        "address_line_match": (
            L("line_hashes").isNotNull() & R("line_hashes").isNotNull()
            & F.arrays_overlap(L("line_hashes"), R("line_hashes"))
        ),
        "address_city_match": _eq(L("parent_dir"), R("parent_dir")),
        "address_state_match": _eq(L("ext"), R("ext")),
        "address_postal_match": _eq(
            F.substring(L("stem"), 1, 5), F.substring(R("stem"), 1, 5)
        ),
    }


def compare_pairs(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """pairs(left_id,right_id) -> scored-feature rows (one bool col per flag)."""
    attached = attach_sides(pairs, records)
    flags = comparator_flags()
    out = attached.select(
        "left_id",
        "right_id",
        *[F.coalesce(expr, F.lit(False)).alias(name) for name, expr in flags.items()],
    )
    return out


# --- match messages (A3) ----------------------------------------------------

# Per-flag human-readable messages, verbatim from
# IdentityMatchingScorer.java:98-231 (incl. the missing period on the
# state message). The reference emits the distinct messages in setter-
# invocation order; each flag fires at most once here, so a filtered
# array in FLAG_NAMES order is the same distinct set.
MATCH_MESSAGES: list[tuple[str, str]] = [
    ("mrn_match", "A matching medical record number was found."),
    ("digital_id_match", "A matching digital identifier was found."),
    ("ssn_match", "A matching social security number was found."),
    ("ssn_last4_match", "A matching social security number (last 4 digits) was found."),
    ("drivers_license_match", "A matching drivers license number was found."),
    ("passport_match", "A matching passport number was found."),
    ("insurance_member_match", "A matching insurance member was found."),
    ("insurance_subscriber_match", "A matching insurance subscriber was found."),
    ("family_name_match", "A matching last name was found."),
    ("first_name_match", "A matching first name was found."),
    ("middle_name_match", "A matching middle name was found."),
    ("middle_initial_match", "A matching middle initial was found."),
    ("birth_sex_match", "A matching birth sex was found."),
    ("birth_date_match", "A matching birthdate was found."),
    ("phone_match", "A matching phone number was found."),
    ("email_match", "A matching email address was found."),
    ("address_line_match", "A matching address line of residence was found."),
    ("address_city_match", "A matching city of residence was found."),
    ("address_state_match", "A matching state of residence was found"),
    ("address_postal_match", "A matching postal code (first 5 digits) was found."),
]


def match_messages_expr() -> Column:
    """array<string> of messages for the fired flags (A3,
    IdentityMatchingScorer.java:91-93 getMatchMessages distinct)."""
    return F.filter(
        F.array(
            *[
                F.when(F.col(flag), F.lit(msg)).otherwise(F.lit(None).cast("string"))
                for flag, msg in MATCH_MESSAGES
            ]
        ),
        lambda x: x.isNotNull(),
    )


# --- fuzzy extension (C14-C16) ----------------------------------------------

PHONETIC_COLS = ["cologne_dir1", "soundex_stem", "metaphone_stem"]


def enrich_phonetic(records: DataFrame, distinct_broadcast: bool = True) -> DataFrame:
    """Phonetic encodings per record: COLOGNE on the given-name analog,
    SOUNDEX/METAPHONE on the family-name analog (mdm-rules.json:25-42).

    Soundex is Spark's builtin (pure JVM). The python encoders (cologne,
    metaphone) run once per DISTINCT normalized value and broadcast-join
    back — the record stream never crosses the Arrow boundary, the same
    shape as ``jw_stem_table``. Name-analog vocabularies are Zipfian and
    tiny relative to the corpus; a deployment whose vocabulary outgrows
    the broadcast budget passes ``distinct_broadcast=False`` to fall back
    to per-record batched pandas UDFs (still linear, never per pair).
    """
    from identity_matching_spark.functions.normalize import hapi_norm
    from identity_matching_spark.functions.phonetic import cologne_udf, metaphone_udf

    if not distinct_broadcast:
        return records.select(
            "*",
            cologne_udf(hapi_norm(F.col("dir1"))).alias("cologne_dir1"),
            F.soundex(hapi_norm(F.col("stem"))).alias("soundex_stem"),
            metaphone_udf(hapi_norm(F.col("stem"))).alias("metaphone_stem"),
        )
    base = records.select(
        "*",
        hapi_norm(F.col("dir1")).alias("_nd1"),
        hapi_norm(F.col("stem")).alias("_nst"),
    )
    cologne_tab = (
        base.select(F.col("_nd1")).where(F.col("_nd1").isNotNull()).distinct()
        .select("_nd1", cologne_udf(F.col("_nd1")).alias("cologne_dir1"))
    )
    metaphone_tab = (
        base.select(F.col("_nst")).where(F.col("_nst").isNotNull()).distinct()
        .select("_nst", metaphone_udf(F.col("_nst")).alias("metaphone_stem"))
    )
    return (
        base.join(F.broadcast(cologne_tab), "_nd1", "left")
        .join(F.broadcast(metaphone_tab), "_nst", "left")
        .withColumn("soundex_stem", F.soundex(F.col("_nst")))
        .drop("_nd1", "_nst")
    )


FUZZY_FLAG_NAMES = [
    "cologne_given_match", "soundex_family_match", "metaphone_family_match",
    "jw_family_match", "lev_family_match",
]


def jw_stem_table(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """Jaro-Winkler per DISTINCT unequal stem pair — not per candidate pair.

    Blocked candidate pairs repeat the same (l_stem, r_stem) combination
    millions of times (hot stems), so evaluating the pandas UDF per pair
    makes Arrow serde + Python workers the non-scaling fraction of the
    scoring kernel. Instead: project a slim (id, stem) map, derive the
    distinct unequal stem pairs seen by the candidate list (map-side
    combine keeps that shuffle tiny), run the UDF once per distinct pair,
    and join the values back. The 100 TB pair stream never crosses the
    Arrow boundary; equal-stem pairs (the majority under stem-family
    blocking) are JW=1.0 by definition and never even reach this table.
    """
    from identity_matching_spark.functions.similarity import jaro_winkler_udf

    stems = records.select("record_id", "stem")
    l = stems.select(F.col("record_id").alias("left_id"), F.col("stem").alias("l_stem"))
    r = stems.select(F.col("record_id").alias("right_id"), F.col("stem").alias("r_stem"))
    return (
        pairs.select("left_id", "right_id")
        .join(l.hint("shuffle_hash"), "left_id")
        .join(r.hint("shuffle_hash"), "right_id")
        .select("l_stem", "r_stem")
        .where(
            F.col("l_stem").isNotNull()
            & F.col("r_stem").isNotNull()
            & (F.col("l_stem") != F.col("r_stem"))
        )
        .distinct()
        .withColumn("jw_stem_val", jaro_winkler_udf(F.col("l_stem"), F.col("r_stem")))
    )


def compare_pairs_fuzzy(pairs: DataFrame, records: DataFrame, config) -> DataFrame:
    """Exact flag vector + fuzzy comparator flags.

    Phonetic-equality flags compare precomputed record attributes (cheap);
    Jaro-Winkler values come from ``jw_stem_table`` (one UDF call per
    distinct unequal stem pair, broadcast-joined back when small), and
    Levenshtein-ratio stays a builtin Column (C16). Fuzzy columns append
    AFTER the exact flags so the exact schema/decision table is unchanged.
    """
    from pyspark import StorageLevel

    from identity_matching_spark.functions.similarity import levenshtein_ratio

    # Enrich only if the caller didn't already (pipelines enrich once at
    # normalize time — keeps this join side a plain relation, so Catalyst
    # can broadcast it when small instead of shuffling the huge pair list).
    enriched = records if "cologne_dir1" in records.columns else enrich_phonetic(records)
    cols = ATTR_COLS + PHONETIC_COLS
    # JW values join onto the SLIM (ids, stems) pair projection BEFORE the
    # wide attribute attach: the fallback stem-pair join is a sort-merge
    # shuffle, and shuffling the fully-attached stream (both sides' attrs
    # incl. line-hash arrays, ~0.5-1 KB/pair) by stem pair costs an order
    # more bytes than shuffling (left_id, right_id, stems). The wide
    # attached stream never shuffles — its joins end at the two id
    # attaches below.
    stems = enriched.select("record_id", "stem")
    sl = stems.select(F.col("record_id").alias("left_id"), F.col("stem").alias("_jl"))
    sr = stems.select(F.col("record_id").alias("right_id"), F.col("stem").alias("_jr"))
    pairs_stems = (
        pairs.select("left_id", "right_id")
        .join(sl.hint("shuffle_hash"), "left_id")
        .join(sr.hint("shuffle_hash"), "right_id")
    )
    # O(1)-scalar driver action (same pattern as the CC convergence check):
    # count the distinct-stem JW table once to pick broadcast vs shuffle
    # join deterministically — AQE would only downgrade the exchange after
    # the big side's map stage already ran.
    jwtab = jw_stem_table(pairs, enriched).persist(StorageLevel.MEMORY_AND_DISK)
    n_jw = jwtab.count()
    jw_side = (
        F.broadcast(jwtab)
        if n_jw <= config.jw_distinct_broadcast_limit
        else jwtab.hint("shuffle_hash")
    )
    pairs_jw = pairs_stems.join(
        jw_side,
        (F.col("_jl") == jw_side["l_stem"]) & (F.col("_jr") == jw_side["r_stem"]),
        "left",
    ).select("left_id", "right_id", "jw_stem_val")
    lhs = enriched.select([F.col(c).alias(f"l_{c}") for c in cols])
    rhs = enriched.select([F.col(c).alias(f"r_{c}") for c in cols])
    # rhs first: pairs_jw leaves the stem join partitioned by right_id
    # (broadcast-jw case), so the first attach reuses that exchange.
    # shuffle_hash build side = records: the wide pair×attrs intermediate
    # streams through both attaches without ever sorting (see attach_sides).
    attached = (
        pairs_jw.join(rhs.hint("shuffle_hash"), pairs_jw.right_id == rhs.r_record_id, "inner")
        .join(lhs.hint("shuffle_hash"), pairs_jw.left_id == lhs.l_record_id, "inner")
        .drop("l_record_id", "r_record_id")
    )
    flags = comparator_flags()
    jw = F.when(
        _eq(F.col("l_stem"), F.col("r_stem")), F.lit(1.0)
    ).otherwise(F.col("jw_stem_val"))
    lev = levenshtein_ratio(F.col("l_stem"), F.col("r_stem"))
    out = attached.select(
        "left_id",
        "right_id",
        *[F.coalesce(expr, F.lit(False)).alias(name) for name, expr in flags.items()],
        F.coalesce(_eq(F.col("l_cologne_dir1"), F.col("r_cologne_dir1")), F.lit(False)).alias(
            "cologne_given_match"
        ),
        F.coalesce(_eq(F.col("l_soundex_stem"), F.col("r_soundex_stem")), F.lit(False)).alias(
            "soundex_family_match"
        ),
        F.coalesce(
            _eq(F.col("l_metaphone_stem"), F.col("r_metaphone_stem")), F.lit(False)
        ).alias("metaphone_family_match"),
        F.coalesce(jw >= F.lit(config.jaro_winkler_threshold), F.lit(False)).alias(
            "jw_family_match"
        ),
        F.coalesce(lev >= F.lit(config.levenshtein_ratio_threshold), F.lit(False)).alias(
            "lev_family_match"
        ),
        F.round(F.coalesce(jw, F.lit(0.0)), 4).alias("jw_family_sim"),
        F.round(F.coalesce(lev, F.lit(0.0)), 4).alias("lev_family_sim"),
    )
    # Hand the persisted JW table back on the result so long-lived sessions
    # (bench sweeps, repeated calls) can unpersist it after materializing
    # the scored output — otherwise the cached blocks accumulate until
    # clearCache. Callers: PipelineResult.cleanup / bench kernel.
    out.jw_stem_cache = jwtab
    return out
