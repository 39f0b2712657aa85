"""Blocking: records -> candidate pairs.

Reference semantics re-expressed at corpus scale (SURVEY.md J1/J4/A4/O5):
the server builds ONE conjunctive indexed search per query patient
(IdentityMatching.java:911-1053) and the MDM subsystem unions independent
per-key candidate fetches (mdm-rules.json:4-17). For batch all-pairs
linkage the equivalent is: explode each record into
``(blocking_key, record_id)`` rows across several key families, self-
equi-join on the key, and de-duplicate pairs found under multiple keys
(the reference dedups candidates by fullUrl, IdentityMatching.java:625-627).

Scale design (the part Catalyst cannot invent, SURVEY.md §4):

* **Per-block pair guard.** A block of n records yields n(n-1)/2 pairs;
  a hot key (empty files, ``__init__.py`` stems, dominant lang) is
  quadratic death at 10^12 rows. Blocks larger than
  ``config.max_block_size`` are excluded from pair expansion and
  REPORTED (returned in a metrics DataFrame — never a silent cap).
* **Identity-star shortcut.** For *identity* families (content_sha,
  file_id) every member of a block is pairwise-linked by a strong key
  whose single flag already grades 0.99 (decision table line 41:
  mrn || digitalId). Blocks above ``identity_star_threshold`` therefore
  emit O(n) star pairs (min record_id as hub) instead of O(n^2) —
  the transitive closure recovers the same cluster.
* **Skew.** The join itself is an equi-join on blocking_key; with the
  guard in place no single key exceeds max_block_size, bounding any
  post-shuffle partition. AQE skew-join splitting stays enabled as a
  backstop, and the key space is pre-spread with
  ``repartition(blocking_key)`` so the pair join and the dedup reuse
  one shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.functions.hashing import (
    lsh_band_keys,
    minhash_signature,
    word_shingles,
)
from identity_matching_spark.functions.normalize import hapi_norm

# Families whose key alone implies a 0.99-grade match (strong identifiers).
IDENTITY_FAMILIES = {"content_sha", "file_id"}


def blocking_keys(records: DataFrame, config: MatchConfig) -> DataFrame:
    """Explode records into (family, blocking_key, record_id) rows.

    Key derivations follow HAPI search-param semantics: string params are
    accent/case-folded prefixes (F4), token params exact (SURVEY.md §2.2).
    """
    fams = []
    f = config.blocking_families
    # Identity keys use the 8-byte h64 twins (operators/normalize.py) — the
    # keyed table is the biggest intermediate at corpus scale and shrinks ~4x.
    if "content_sha" in f:
        fams.append(F.struct(F.lit("content_sha").alias("family"),
                             F.concat(F.lit("sha:"), F.col("content_h64").cast("string")).alias("blocking_key")))
    if "file_id" in f:
        fams.append(F.struct(F.lit("file_id").alias("family"),
                             F.concat(F.lit("fid:"), F.col("file_h64").cast("string")).alias("blocking_key")))
    if "norm_sha" in f:
        fams.append(F.struct(F.lit("norm_sha").alias("family"),
                             F.concat(F.lit("nsha:"), F.col("norm_h64").cast("string")).alias("blocking_key")))
    # Name keys are CONJUNCTIVE with the birth-date analog (size bucket) —
    # the reference ANDs its search params (one SearchParameterMap,
    # IdentityMatching.java:911-1053), and every decision-table tier that a
    # name-blocked pair can win requires birth_date_match anyway, so the
    # composite key splits hot-name blocks without losing decision-relevant
    # recall.
    if "name_prefix" in f:
        fams.append(F.struct(
            F.lit("name_prefix").alias("family"),
            F.concat(F.lit("np:"), F.col("lang_norm"), F.lit("|"),
                     F.substring(hapi_norm(F.col("stem")), 1, config.name_prefix_len),
                     F.lit("|"), F.col("size_bucket").cast("string")
                     ).alias("blocking_key")))
    if "name_soundex" in f:
        fams.append(F.struct(
            F.lit("name_soundex").alias("family"),
            F.concat(F.lit("sdx:"), F.col("lang_norm"), F.lit("|"),
                     F.soundex(hapi_norm(F.col("stem"))),
                     F.lit("|"), F.col("size_bucket").cast("string")
                     ).alias("blocking_key")))

    # Dense ids ride WITH the keyed rows when the records relation carries
    # them (8 B/keyed row) so the pair join emits didx sides directly —
    # re-attaching didx to 10^12-scale pair lists afterwards would cost
    # two string-keyed shuffle joins.
    extra = ["didx"] if "didx" in records.columns else []
    keyed = records.select(
        "record_id", *extra, F.explode(F.array(*fams)).alias("k")
    ).select("record_id", *extra, "k.family", "k.blocking_key")

    if "minhash_lsh" in f:
        # Staged projections so the signature materializes once per row —
        # CollapseProject will not re-inline a non-cheap expression that the
        # next projection references multiple times (band slicing).
        sig_df = records.select(
            "record_id",
            *extra,
            minhash_signature(
                word_shingles(F.col("norm_content"), config.shingle_words),
                config.minhash_perms,
                fast=config.minhash_fast,
            ).alias("sig"),
        )
        mh = sig_df.select(
            "record_id",
            *extra,
            F.lit("minhash_lsh").alias("family"),
            F.explode(
                lsh_band_keys(
                    F.col("sig"), config.lsh_bands, config.lsh_rows_per_band,
                    fast=config.minhash_fast,
                )
            ).alias("blocking_key"),
        )
        keyed = keyed.unionByName(mh)
    return keyed


@dataclass
class BlockingResult:
    pairs: DataFrame        # (left_id, right_id) canonical left<right, deduped
    block_stats: DataFrame  # (family, blocking_key, n_records, action) for oversized blocks


def candidate_pairs(
    records: DataFrame, config: MatchConfig, n_records: int | None = None
) -> BlockingResult:
    """Union-of-families self-equi-join with guards; returns deduped pairs.

    ``n_records`` (when the caller already knows it) gates whether the
    dense-id regime's final string-id re-attach broadcasts the slim
    id map or shuffle-hash joins it.
    """
    from pyspark import StorageLevel

    # keyed feeds three consumers (size count + both join sides) — persist
    # so key derivation (incl. MinHash) runs once. At cluster scale this is
    # the derived blocking-key table an Iceberg deployment would write out.
    keyed = blocking_keys(records, config).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialization barrier: the pair query below references keyed from
    # ~8 leaf stages (sizes broadcast, quad l/r, sub, salted l/r, hubs,
    # star) which AQE submits concurrently — against a cold cache each
    # would recompute the explode+MinHash key derivation before any
    # partition registers. One eager pass = keys computed exactly once.
    keyed.count()

    # One shuffle on blocking_key serves the size count AND the self-join.
    sizes = keyed.groupBy("family", "blocking_key").agg(F.count("*").alias("n_records"))

    star_eligible = F.col("family").isin(*IDENTITY_FAMILIES)
    cap = F.lit(config.max_block_size)
    for fam, fam_cap in config.family_block_caps:
        cap = F.when(F.col("family") == fam, F.lit(min(fam_cap, config.max_block_size))).otherwise(cap)
    oversized = F.col("n_records") > cap
    starred = star_eligible & (F.col("n_records") > F.lit(config.identity_star_threshold))

    block_stats = sizes.filter(oversized | starred).withColumn(
        "action",
        F.when(starred, F.lit("star")).otherwise(F.lit("subsalted")),
    )

    hot = (~star_eligible) & (~oversized) & (F.col("n_records") > F.lit(config.salt_buckets * 8))

    # Sub-salt factor for oversized non-identity blocks: split a block of n
    # rows into k = ceil(n/cap) hash-sub-blocks of ~cap rows each. Pair
    # output becomes ~n*cap/2 instead of n^2/2 — LINEAR in block size, so a
    # hot key can never blow up a stage. The reduced intra-block recall is
    # deterministic and REPORTED (action='subsalted'), never silent.
    subsalt_k = F.ceil(F.col("n_records") / cap).cast("long")
    keyed_sized = keyed.join(
        F.broadcast(
            sizes.filter(oversized | starred | hot).select(
                "blocking_key",
                "family",
                starred.alias("is_star"),
                hot.alias("is_hot"),
                F.when(oversized & ~starred, subsalt_k).alias("sub_k"),
            )
        ),
        ["family", "blocking_key"],
        "left",
    )

    has_didx = "didx" in keyed.columns
    # In the dense-id regime the ENTIRE pair join runs in 8-byte longs:
    # didx is the rank of record_id, so didx ordering IS record_id
    # ordering (canonical left<right unchanged) and the string ids are
    # re-attached ONCE after the dedup from the slim id map. The
    # quadratic self-join and the dedup exchange — the two biggest
    # shuffles in the system at 10^12 files — then move 8 B per side
    # instead of a 64-char id. Salting/sub-salting keys stay derived
    # from record_id so the emitted pair SET is bit-identical to the
    # didx-less regime.
    rid = "didx" if has_didx else "record_id"
    lpair_cols = (
        [F.col("l.didx").alias("left_didx"), F.col("r.didx").alias("right_didx")]
        if has_didx
        else [F.col("l.record_id").alias("left_id"), F.col("r.record_id").alias("right_id")]
    )

    quad = keyed_sized.filter(
        F.col("is_star").isNull() & F.col("sub_k").isNull()
    ).select("blocking_key", rid)
    star = keyed_sized.filter(F.col("is_star") == True).select("blocking_key", rid)  # noqa: E712
    # hot rows keep record_id alongside: the salt assignment hashes it
    # (bit-identical pair set across both regimes), then projects it away
    hot_rows = keyed_sized.filter(F.col("is_hot") == True).select(  # noqa: E712
        "blocking_key", "record_id", *(["didx"] if has_didx else [])
    )
    sub_rows = keyed_sized.filter(F.col("sub_k").isNotNull()).select(
        F.concat(
            F.col("blocking_key"),
            F.lit("#"),
            F.pmod(F.xxhash64("record_id"), F.col("sub_k")).cast("string"),
        ).alias("blocking_key"),
        rid,
    )
    # sub-blocks are ~cap-sized quadratic blocks — reuse the plain pair join
    quad = quad.unionByName(sub_rows)

    l, r = quad.alias("l"), quad.alias("r")
    quad_pairs = (
        l.join(r, "blocking_key")
        .filter(F.col(f"l.{rid}") < F.col(f"r.{rid}"))
        .select(*lpair_cols)
    )

    # Hot-key salting (SURVEY.md §4.1): keys below the cap but big enough to
    # make one post-shuffle task a straggler get the classic replicate-probe
    # treatment — left side hashed into S salt buckets, right side replicated
    # to every bucket, join key widened to (blocking_key, salt). A hot key's
    # n^2/2 pair generation then spreads over S tasks instead of one.
    # (AQE skew-join stays on as backstop for everything else.)
    S = config.salt_buckets
    lname, rname = ("left_didx", "right_didx") if has_didx else ("left_id", "right_id")
    salted_l = hot_rows.select(
        "blocking_key",
        F.col(rid).alias("_l"),
        F.pmod(F.xxhash64("record_id"), F.lit(S)).cast("int").alias("salt"),
    )
    salted_r = hot_rows.select(
        "blocking_key",
        F.col(rid).alias("_r"),
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(S - 1).cast("int"))).alias("salt"),
    )
    hot_pairs = (
        salted_l.join(salted_r, ["blocking_key", "salt"])
        .filter(F.col("_l") < F.col("_r"))
        .select(F.col("_l").alias(lname), F.col("_r").alias(rname))
    )
    quad_pairs = quad_pairs.unionByName(hot_pairs)

    # Star expansion: hub = min(id) per oversized identity block (in the
    # dense regime min didx IS min record_id — didx is its rank).
    hubs = star.groupBy("blocking_key").agg(F.min(rid).alias("hub"))
    star_pairs = (
        star.join(hubs, "blocking_key")
        .filter(F.col(rid) != F.col("hub"))
        .select(F.col("hub").alias(lname), F.col(rid).alias(rname))
    )

    # 8-byte key twins ride WITH the pair list (projected after the dedup
    # shuffle, so they cost nothing to produce): the scoring kernel's
    # broadcast probes join on these longs, and when a consumer prunes
    # the string ids (the kernel's hash-agg does) the pair scan reads
    # 16 B/pair instead of two 64-char ids — at 10^12-file scale the pair
    # list is the biggest relation in the system, so its scan width is
    # first-order DRAM traffic. When the records relation carries DENSE
    # ids the twins are left_didx/right_didx (LongHashedRelation dense
    # mode downstream — attach_sides key tier 1); otherwise the sparse
    # rid64 sha-prefix twins (tier 2).
    if has_didx:
        deduped = quad_pairs.unionByName(star_pairs).dropDuplicates(
            ["left_didx", "right_didx"]
        )
        # ONE string-id re-attach after the dedup, from the slim
        # (didx, record_id) map — broadcast (a single ReusedExchange
        # probed from both sides) when the map fits the budget, slim
        # shuffle-hash joins otherwise.
        rel = records.select(F.col("didx").alias("_didx"), "record_id")
        # Unknown records size -> slim shuffle-hash re-attach, never a
        # hidden records.count() job inside plan construction (ADVICE r4):
        # callers that hold the count (run_pipeline's persist barrier)
        # pass it and get the broadcast fast path.
        rel = (
            F.broadcast(rel)
            if n_records is not None and n_records <= config.records_broadcast_limit
            else rel.hint("shuffle_hash")
        )
        lhs, rhs = rel.alias("_il"), rel.alias("_ir")
        pairs = (
            deduped
            .join(lhs, F.col("left_didx") == F.col("_il._didx"), "inner")
            .join(rhs, F.col("right_didx") == F.col("_ir._didx"), "inner")
            .select(
                F.col("_il.record_id").alias("left_id"),
                F.col("_ir.record_id").alias("right_id"),
                "left_didx",
                "right_didx",
            )
        )
    else:
        from identity_matching_spark.operators.compare import _rid64

        pairs = (
            quad_pairs.unionByName(star_pairs)
            .dropDuplicates(["left_id", "right_id"])
            .select(
                "left_id",
                "right_id",
                _rid64(F.col("left_id")).alias("left_rid64"),
                _rid64(F.col("right_id")).alias("right_rid64"),
            )
        )
    return BlockingResult(pairs=pairs, block_stats=block_stats)
