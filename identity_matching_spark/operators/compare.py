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

# Columns each side of a pair needs for comparison. Every scalar is an
# 8-byte long: identity attributes ride as h64 twins (see
# operators/normalize.py H64_PAIRS), path tokens (stem/dir1/dir2/
# parent_dir/ext) as xxhash64 twins, and the substring comparators hash
# AFTER the substring (postal5_h64 = hash of the stem's first-5, C11;
# dir2_init_h64 = hash of dir2's first char, C6) so prefix-equality
# semantics survive while no string rides the probe row. line_hashes
# (C9, arrays_overlap) is the one variable-width field left. Rationale:
# the scoring kernel's single-host scaling binder is the resident
# broadcast-probe working set (BENCH/BASELINE.md memory-ceiling note) —
# all-long rows are both smaller and fixed-offset to decode.
ATTR_COLS = [
    "record_id", "content_h64", "file_h64", "norm_h64", "ssn4_h64",
    "stem_h64", "postal5_h64", "ext_h64", "dir1_h64", "dir2_h64",
    "dir2_init_h64", "dir2_is1", "parent_dir_h64", "lang_h64",
    "size_bucket", "first_line_h64", "last_line_h64", "line_hashes",
    "sorted_lines_h64", "shape_h64", "ins_member_h64", "ins_subscriber_h64",
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


#: records-side row count under which the attach joins BROADCAST the
#: attribute relation instead of shuffling the pair stream. ~400 B/row of
#: comparator attributes puts the default at ~400 MB — comfortably inside
#: a single executor's memory while removing every pair-stream exchange
#: (the dominant kernel cost: serializing + compressing the wide
#: pair×attrs rows was ~40% of scoring task-time at sf0.1).
RECORDS_BROADCAST_LIMIT = 1_000_000


def _records_side(records_relation: DataFrame, n_records: int, limit: int):
    """Broadcast the records side when it fits, else shuffle-hash.

    The O(1) count-based choice is deterministic (same pattern as the JW
    table): AQE would only downgrade the exchange after the pair stream's
    map stage already ran. The shuffle-hash fallback matters at real
    scale — a sort-merge id-join would SORT the wide pair×attrs
    intermediate (measured ~930 task-seconds at sf0.1 — external sort
    spill of ~330 MB/task); with the records side as the hashed build
    relation the pair stream only shuffles, never sorts.
    """
    if n_records <= limit:
        return F.broadcast(records_relation)
    return records_relation.hint("shuffle_hash")


def _rid64(col) -> Column:
    """8-byte twin of a 64-char sha-hex id (first 15 nibbles) — the same
    2^-60-collision equality class as normalize.H64_PAIRS. Join keys in
    the broadcast attach are these longs: a dense long-keyed hash relation
    whose probe array stays cache-resident, instead of hashing + comparing
    64-byte strings per probe per pair."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def attach_sides(
    pairs: DataFrame,
    records: DataFrame,
    n_records: int | None = None,
    broadcast_limit: int = RECORDS_BROADCAST_LIMIT,
    cols: list[str] | None = None,
    keep_keys: bool = False,
) -> DataFrame:
    """Join attributes onto both sides of the pair list.

    records is projected to the comparator columns first so the joined
    payload is minimal (no content strings cross the wire). Small records
    relations broadcast with long rid64 keys (zero pair-stream shuffles,
    cache-resident probes); large ones shuffle-hash on record_id (two slim
    shuffles — unavoidable for arbitrary pair lists).

    ``keep_keys=True`` retains the pair list's ``left_didx``/``right_didx``
    twins in the output (when present) so downstream stages can stay in
    8-byte longs — run_pipeline threads them through grading into the CC
    edge set. Default False keeps the attached schema identical across all
    key regimes (ADVICE r4)."""
    cols = list(cols or ATTR_COLS)
    if n_records is None:
        n_records = records.count()
    if n_records <= broadcast_limit:
        # ONE shared broadcast relation probed from both sides (VERDICT r3
        # #3): the two join children are the SAME plan subtree (only the
        # SubqueryAlias differs, which canonicalization strips), so Spark
        # plans the second BroadcastExchange as a ReusedExchange — one
        # build, one in-memory copy per executor instead of two. Halving
        # the probe working set matters beyond memory: the broadcast hash
        # relation is what the kernel hammers per pair, and a smaller
        # resident set is the difference between L3 hits and DRAM misses
        # at high thread counts (the measured single-host scaling binder —
        # BENCH/BASELINE.md memory-ceiling note). Column aliasing happens
        # AFTER each join via qualified refs, so no per-side projection
        # breaks the subtree identity. Plan-asserted in test_fuzzy.py.
        side_cols = [c for c in cols if c != "record_id"]
        # Key choice, best first:
        # 1. DENSE ids (``didx`` on records + ``left_didx``/``right_didx``
        #    on pairs, assigned by ``with_dense_ids``): Spark's
        #    LongHashedRelation turns a dense long key space into a
        #    direct-address array (LongToUnsafeRowMap dense mode) — each
        #    probe is one indexed load instead of a hash-bucket walk, and
        #    a pair list sorted by left_didx walks the row page near-
        #    sequentially. This is the 100 TB shape: intern record ids to
        #    dense longs once at the records table, carry them through
        #    blocking.
        # 2. stored rid64 twins (blocking emits them): probe keys straight
        #    off the scan — no per-pair conv(substring(id)); sparse hash.
        # 3. derive rid64 per pair from the string ids (compat).
        if "left_didx" in pairs.columns and "didx" in records.columns:
            key_expr = F.col("didx").cast("long").alias("rid64")
            probed = pairs
            lkey, rkey = F.col("left_didx"), F.col("right_didx")
            out_cols = [
                c for c in pairs.columns
                if not c.endswith("_rid64")
                and (keep_keys or not c.endswith("_didx"))
            ]
        elif "left_rid64" in pairs.columns:
            key_expr = _rid64(F.col("record_id")).alias("rid64")
            probed = pairs
            lkey, rkey = F.col("left_rid64"), F.col("right_rid64")
            out_cols = [c for c in pairs.columns if not c.endswith("_rid64")]
        else:
            key_expr = _rid64(F.col("record_id")).alias("rid64")
            probed = pairs.withColumn("_lh64", _rid64(F.col("left_id"))).withColumn(
                "_rh64", _rid64(F.col("right_id"))
            )
            lkey, rkey = F.col("_lh64"), F.col("_rh64")
            out_cols = pairs.columns
        rel = F.broadcast(records.select(key_expr, *[F.col(c) for c in side_cols]))
        lhs, rhs = rel.alias("_atl"), rel.alias("_atr")
        return (
            probed
            .join(lhs, lkey == F.col("_atl.rid64"), "inner")
            .join(rhs, rkey == F.col("_atr.rid64"), "inner")
            .select(
                *[F.col(c) for c in out_cols],
                *[F.col(f"_atl.{c}").alias(f"l_{c}") for c in side_cols],
                *[F.col(f"_atr.{c}").alias(f"r_{c}") for c in side_cols],
            )
        )
    if "left_didx" in pairs.columns and "didx" in records.columns:
        # Arbitrary-scale arm with dense ids: the two slim exchanges key on
        # 8-byte longs instead of 64-char id strings — same plan shape,
        # ~8x less shuffle key bandwidth and long-vs-string hash probes.
        lhs = records.select(
            F.col("didx").alias("_ld"), *[F.col(c).alias(f"l_{c}") for c in cols]
        ).hint("shuffle_hash")
        rhs = records.select(
            F.col("didx").alias("_rd"), *[F.col(c).alias(f"r_{c}") for c in cols]
        ).hint("shuffle_hash")
        dropped = ["_ld", "_rd", "l_record_id", "r_record_id"]
        if not keep_keys:
            dropped += ["left_didx", "right_didx"]
        return (
            pairs.join(lhs, F.col("left_didx") == F.col("_ld"), "inner")
            .join(rhs, F.col("right_didx") == F.col("_rd"), "inner")
            .drop(*dropped)
        )
    attrs = records.select(*cols)
    lhs = attrs.select([F.col(c).alias(f"l_{c}") for c in cols]).hint("shuffle_hash")
    rhs = attrs.select([F.col(c).alias(f"r_{c}") for c in cols]).hint("shuffle_hash")
    return (
        pairs.join(lhs, pairs.left_id == lhs["l_record_id"], "inner")
        .join(rhs, pairs.right_id == rhs["r_record_id"], "inner")
        # drop the sparse rid64 twins too, so the attached schema is
        # identical across all four arms (broadcast/shuffle x dense/sparse)
        .drop("l_record_id", "r_record_id", "left_rid64", "right_rid64")
    )


def comparator_flags() -> dict[str, Column]:
    """The C1-C13 flag expressions over an attached pair row.

    Citations: identifier matching IdentityMatching.java:304-354, names
    :357-397, birth sex/date :399-411, address :414-433, telecom :436-453.
    """
    L = lambda c: F.col(f"l_{c}")  # noqa: E731
    R = lambda c: F.col(f"r_{c}")  # noqa: E731

    middle_initial = (
        L("dir2_init_h64").isNotNull() & R("dir2_init_h64").isNotNull()
        & (L("dir2_is1") | R("dir2_is1"))
        & (L("dir2_init_h64") == R("dir2_init_h64"))
    )

    return {
        "mrn_match": _eq(L("content_h64"), R("content_h64")),
        "digital_id_match": _eq(L("file_h64"), R("file_h64")),
        "ssn_match": _eq(L("norm_h64"), R("norm_h64")),
        "ssn_last4_match": _eq(L("ssn4_h64"), R("ssn4_h64")),
        "drivers_license_match": _eq(L("sorted_lines_h64"), R("sorted_lines_h64")),
        "passport_match": _eq(L("shape_h64"), R("shape_h64")),
        "insurance_member_match": _eq(L("ins_member_h64"), R("ins_member_h64")),
        "insurance_subscriber_match": _eq(L("ins_subscriber_h64"), R("ins_subscriber_h64")),
        "family_name_match": _eq(L("stem_h64"), R("stem_h64")),
        "first_name_match": _eq(L("dir1_h64"), R("dir1_h64")),
        "middle_name_match": _eq(L("dir2_h64"), R("dir2_h64")),
        "middle_initial_match": middle_initial,
        "birth_sex_match": _eq(L("lang_h64"), R("lang_h64")),
        "birth_date_match": _eq(L("size_bucket"), R("size_bucket")),
        "phone_match": _eq(L("first_line_h64"), R("first_line_h64")),
        "email_match": _eq(L("last_line_h64"), R("last_line_h64")),
        "address_line_match": (
            L("line_hashes").isNotNull() & R("line_hashes").isNotNull()
            & F.arrays_overlap(L("line_hashes"), R("line_hashes"))
        ),
        "address_city_match": _eq(L("parent_dir_h64"), R("parent_dir_h64")),
        "address_state_match": _eq(L("ext_h64"), R("ext_h64")),
        "address_postal_match": _eq(L("postal5_h64"), R("postal5_h64")),
    }


def compare_pairs(
    pairs: DataFrame, records: DataFrame, keep_keys: bool = False
) -> DataFrame:
    """pairs(left_id,right_id) -> scored-feature rows (one bool col per flag)."""
    attached = attach_sides(pairs, records, keep_keys=keep_keys)
    flags = comparator_flags()
    key_cols = (
        ["left_didx", "right_didx"]
        if keep_keys and "left_didx" in attached.columns
        else []
    )
    out = attached.select(
        "left_id",
        "right_id",
        *key_cols,
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
#: 8-byte twins of the phonetic codes — what the scoring kernel's probe
#: rows actually carry (the codes are equality-only comparators C14-C16;
#: the string codes stay on the record relation for oracle/inspection).
PHONETIC_H64_COLS = ["cologne_h64", "soundex_h64", "metaphone_h64"]


def _phonetic_twins(df: DataFrame) -> DataFrame:
    return df.select(
        "*",
        *[
            F.when(F.col(s).isNotNull(), F.xxhash64(F.col(s))).alias(h)
            for s, h in zip(PHONETIC_COLS, PHONETIC_H64_COLS)
        ],
    )


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
        return _phonetic_twins(records.select(
            "*",
            cologne_udf(hapi_norm(F.col("dir1"))).alias("cologne_dir1"),
            F.soundex(hapi_norm(F.col("stem"))).alias("soundex_stem"),
            metaphone_udf(hapi_norm(F.col("stem"))).alias("metaphone_stem"),
        ))
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
    return _phonetic_twins(
        base.join(F.broadcast(cologne_tab), "_nd1", "left")
        .join(F.broadcast(metaphone_tab), "_nst", "left")
        .withColumn("soundex_stem", F.soundex(F.col("_nst")))
        .drop("_nd1", "_nst")
    )


FUZZY_FLAG_NAMES = [
    "cologne_given_match", "soundex_family_match", "metaphone_family_match",
    "jw_family_match", "lev_family_match",
]


def jw_stem_table(
    pairs: DataFrame, records: DataFrame, n_records: int | None = None
) -> DataFrame:
    """Jaro-Winkler + Levenshtein-ratio per DISTINCT unequal stem pair —
    not per candidate pair.

    Blocked candidate pairs repeat the same (l_stem, r_stem) combination
    millions of times (hot stems), so evaluating the pandas UDF per pair
    makes Arrow serde + Python workers the non-scaling fraction of the
    scoring kernel. Instead: project a slim (id, stem) map, derive the
    distinct unequal stem pairs seen by the candidate list (map-side
    combine keeps that shuffle tiny), run the UDF once per distinct pair,
    and join the values back. The 100 TB pair stream never crosses the
    Arrow boundary; equal-stem pairs (the majority under stem-family
    blocking) are JW=1.0 (and lev-ratio 1.0) by definition and never even
    reach this table. Levenshtein rides here too: the builtin is JVM-side
    but still O(|s|²) DP per evaluation — evaluating it once per distinct
    unequal pair instead of once per candidate pair removes ~90M DP runs
    at sf0.1.

    Rows are CANONICALIZED to (least(stem), greatest(stem)): Jaro-Winkler
    and Levenshtein-ratio are both symmetric, so one orientation serves
    both — halving the distinct set, the partial-agg hash maps, the UDF
    calls, and the broadcast that ships the values back. Probe sides
    canonicalize the same way.
    """
    from identity_matching_spark.functions.similarity import (
        jaro_winkler_udf,
        levenshtein_ratio,
    )

    stems = records.select("record_id", "stem")
    if n_records is None:
        n_records = records.count()
    if "left_didx" in pairs.columns and "didx" in records.columns:
        # dense-id pair lists: stem maps keyed on didx — probes hit the
        # dense long hash relation, no id-string hashing on this scan
        l = _records_side(
            records.select(F.col("didx").alias("left_didx"),
                           F.col("stem").alias("_sl")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        r = _records_side(
            records.select(F.col("didx").alias("right_didx"),
                           F.col("stem").alias("_sr")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        joined = (
            pairs.select("left_didx", "right_didx")
            .join(l, "left_didx").join(r, "right_didx")
        )
    elif "left_rid64" in pairs.columns:
        # pair lists from blocking carry 8-byte rid64 twins — key the stem
        # maps on those so this scan never hashes 64-char id strings
        l = _records_side(
            stems.select(_rid64(F.col("record_id")).alias("left_rid64"),
                         F.col("stem").alias("_sl")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        r = _records_side(
            stems.select(_rid64(F.col("record_id")).alias("right_rid64"),
                         F.col("stem").alias("_sr")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        joined = (
            pairs.select("left_rid64", "right_rid64")
            .join(l, "left_rid64").join(r, "right_rid64")
        )
    else:
        l = _records_side(
            stems.select(F.col("record_id").alias("left_id"), F.col("stem").alias("_sl")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        r = _records_side(
            stems.select(F.col("record_id").alias("right_id"), F.col("stem").alias("_sr")),
            n_records, RECORDS_BROADCAST_LIMIT,
        )
        joined = pairs.select("left_id", "right_id").join(l, "left_id").join(r, "right_id")
    return (
        joined
        .where(
            F.col("_sl").isNotNull()
            & F.col("_sr").isNotNull()
            & (F.col("_sl") != F.col("_sr"))
        )
        .select(
            F.least("_sl", "_sr").alias("l_stem"),
            F.greatest("_sl", "_sr").alias("r_stem"),
        )
        .distinct()
        .withColumn("jw_stem_val", jaro_winkler_udf(F.col("l_stem"), F.col("r_stem")))
        .withColumn("lev_stem_val", levenshtein_ratio(F.col("l_stem"), F.col("r_stem")))
        # join keys for the kernel's probe side, which carries only the
        # stems' xxhash64 twins (normalize.stem_h64): the canonical
        # unordered pair re-keyed by hash order. JW/lev are symmetric, so
        # hash-order == string-order rows carry the same value.
        .withColumn(
            "jh_lo", F.least(F.xxhash64("l_stem"), F.xxhash64("r_stem"))
        )
        .withColumn(
            "jh_hi", F.greatest(F.xxhash64("l_stem"), F.xxhash64("r_stem"))
        )
    )


def compare_pairs_fuzzy(
    pairs: DataFrame,
    records: DataFrame,
    config,
    jw_pairs: DataFrame | None = None,
    keep_keys: bool = False,
) -> DataFrame:
    """Exact flag vector + fuzzy comparator flags.

    Phonetic-equality flags compare precomputed record attributes (cheap);
    Jaro-Winkler AND Levenshtein-ratio values come from ``jw_stem_table``
    (one evaluation per distinct unequal stem pair, broadcast-joined back
    when small; equal stems are 1.0 by definition). Fuzzy columns append
    AFTER the exact flags so the exact schema/decision table is unchanged.

    ``jw_pairs``: optional deduplicated source for the distinct-stem-pair
    table. The table is a DISTINCT over the pairs' stem combinations, so
    any relation with the same pair SET (e.g. the unreplicated scan when
    ``pairs`` is a replicated stream, or a pre-deduped union) yields an
    identical table while scanning fewer rows. Defaults to ``pairs``.
    """
    from pyspark import StorageLevel

    # Enrich only if the caller didn't already (pipelines enrich once at
    # normalize time — keeps this join side a plain relation, so Catalyst
    # can broadcast it when small instead of shuffling the huge pair list).
    if "cologne_h64" in records.columns:
        enriched = records
    elif "cologne_dir1" in records.columns:
        # phonetic codes present but not their twins (e.g. a relation
        # persisted before the all-long probe schema): derive twins only
        enriched = _phonetic_twins(records)
    else:
        enriched = enrich_phonetic(records)
    cols = ATTR_COLS + PHONETIC_H64_COLS
    # Two O(1) counts drive every join choice below (same pattern as the
    # CC convergence check) — AQE would only downgrade an exchange after
    # the pair stream's map stage already ran.
    n_records = enriched.count()
    jwtab = jw_stem_table(
        jw_pairs if jw_pairs is not None else pairs, enriched, n_records
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_jw = jwtab.count()

    if (
        n_records <= config.records_broadcast_limit
        and n_jw <= config.jw_distinct_broadcast_limit
    ):
        # Broadcast regime: the whole kernel is ONE codegen pass over the
        # pair stream — scan -> 3 broadcast probes -> flags -> partial
        # agg, zero pair-stream exchanges. Attach attrs FIRST (the stem
        # h64 twins arrive with them — no separate stem probes), then look
        # up JW/lev through a LONG-keyed hash relation: the probe key is
        # xxhash64 over the hash-ordered stem-twin pair, NULL for
        # equal-stem pairs so the majority of the stream skips the probe
        # entirely; the (jh_lo, jh_hi) equality on hash hits pins the
        # match to the same 2^-64 h64 equality class the C3 comparator
        # itself uses — no strings ride the probe rows at all.
        attached_aw = attach_sides(
            pairs, enriched, n_records, config.records_broadcast_limit, cols=cols,
            keep_keys=keep_keys,
        )
        jwb = F.broadcast(jwtab.select(
            F.xxhash64("jh_lo", "jh_hi").alias("_jk"),
            "jh_lo", "jh_hi",
            "jw_stem_val",
            "lev_stem_val",
        ))
        # canonical hash-ordered orientation — the table stores each
        # unordered stem pair once (JW/lev are symmetric)
        cl = F.least("l_stem_h64", "r_stem_h64")
        cg = F.greatest("l_stem_h64", "r_stem_h64")
        probe_jk = F.when(
            F.col("l_stem_h64").isNull()
            | F.col("r_stem_h64").isNull()
            | (F.col("l_stem_h64") == F.col("r_stem_h64")),
            F.lit(None).cast("long"),
        ).otherwise(F.xxhash64(cl, cg))
        attached = (
            attached_aw.withColumn("_jkp", probe_jk)
            .join(
                jwb,
                (F.col("_jkp") == jwb["_jk"])
                & (cl == jwb["jh_lo"])
                & (cg == jwb["jh_hi"]),
                "left",
            )
            .drop("_jkp", "_jk", "jh_lo", "jh_hi")
        )
    else:
        # Fallback regime (records side too big to broadcast): JW/lev
        # values join onto the SLIM (ids, stems) pair projection BEFORE
        # the wide attribute attach — the stem-pair join is a shuffle
        # there, and shuffling the fully-attached stream (both sides'
        # attrs incl. line-hash arrays, ~0.5-1 KB/pair) by stem pair
        # costs an order more bytes than shuffling (ids, stems).
        stems = enriched.select("record_id", "stem")
        sl = _records_side(
            stems.select(F.col("record_id").alias("left_id"), F.col("stem").alias("_jl")),
            n_records, config.records_broadcast_limit,
        )
        sr = _records_side(
            stems.select(F.col("record_id").alias("right_id"), F.col("stem").alias("_jr")),
            n_records, config.records_broadcast_limit,
        )
        fb_keys = (
            ["left_didx", "right_didx"]
            if keep_keys and "left_didx" in pairs.columns
            else []
        )
        pairs_stems = (
            pairs.select("left_id", "right_id", *fb_keys)
            .join(sl, "left_id")
            .join(sr, "right_id")
        )
        jw_side = (
            F.broadcast(jwtab)
            if n_jw <= config.jw_distinct_broadcast_limit
            else jwtab.hint("shuffle_hash")
        )
        pairs_jw = pairs_stems.join(
            jw_side,
            (F.least("_jl", "_jr") == jw_side["l_stem"])
            & (F.greatest("_jl", "_jr") == jw_side["r_stem"]),
            "left",
        ).select("left_id", "right_id", *fb_keys, "jw_stem_val", "lev_stem_val")
        lhs = (
            enriched.select([F.col(c).alias(f"l_{c}") for c in cols])
            .hint("shuffle_hash")
        )
        rhs = (
            enriched.select([F.col(c).alias(f"r_{c}") for c in cols])
            .hint("shuffle_hash")
        )
        attached = (
            pairs_jw.join(rhs, pairs_jw.right_id == rhs["r_record_id"], "inner")
            .join(lhs, pairs_jw.left_id == lhs["l_record_id"], "inner")
            .drop("l_record_id", "r_record_id")
        )
    flags = comparator_flags()
    # same equality class as the C3 family comparator (stem_h64 twins)
    stems_equal = _eq(F.col("l_stem_h64"), F.col("r_stem_h64"))
    jw = F.when(stems_equal, F.lit(1.0)).otherwise(F.col("jw_stem_val"))
    # Equal stems are lev-ratio 1.0 by definition; unequal pairs carry the
    # value from the distinct-pair table — bit-identical to evaluating the
    # builtin per pair (same function, same inputs), without 90M DP runs.
    lev = F.when(stems_equal, F.lit(1.0)).otherwise(F.col("lev_stem_val"))
    out = attached.select(
        "left_id",
        "right_id",
        *(
            ["left_didx", "right_didx"]
            if keep_keys and "left_didx" in attached.columns
            else []
        ),
        *[F.coalesce(expr, F.lit(False)).alias(name) for name, expr in flags.items()],
        F.coalesce(_eq(F.col("l_cologne_h64"), F.col("r_cologne_h64")), F.lit(False)).alias(
            "cologne_given_match"
        ),
        F.coalesce(_eq(F.col("l_soundex_h64"), F.col("r_soundex_h64")), F.lit(False)).alias(
            "soundex_family_match"
        ),
        F.coalesce(
            _eq(F.col("l_metaphone_h64"), F.col("r_metaphone_h64")), F.lit(False)
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
