"""Engine configuration.

Analog of the reference's declarative rule config ``mdm-rules.json``
(/root/reference/src/main/resources/mdm-rules.json:1-48) plus its
application properties (validation level, remote caps): a plain dataclass
the pipeline compiles into Column expressions — no runtime rule
interpreter, everything lands in Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


# Blocking-key families (reference: candidateSearchParams in mdm-rules.json:4-17
# and the conjunctive $match search, IdentityMatching.java:911-1053).
# Each family derives (blocking_key, record_id) rows; candidates are the
# union of per-family self-equi-joins, deduped (SURVEY.md J1/J4/A4/O5).
DEFAULT_BLOCKING = (
    "content_sha",   # exact content identity (MRN-analog strong key)
    "file_id",       # repo+path identity across commits (digital-id analog)
    "norm_sha",      # whitespace/case-normalized content identity (SSN analog)
    "name_prefix",   # lang + 4-char stem prefix (HAPI normalized starts-with, F4)
    "name_soundex",  # lang + soundex(stem) (mdm-rules.json:34-41 SOUNDEX matcher as key)
    "minhash_lsh",   # MinHash band signatures over content shingles (near-dup family)
)


@dataclass(frozen=True)
class MatchConfig:
    # --- blocking ---
    blocking_families: tuple[str, ...] = DEFAULT_BLOCKING
    name_prefix_len: int = 4          # HAPI string-param prefix semantics (F4)
    # MinHash-LSH: num_perm signatures, grouped into bands of (num_perm/bands)
    # rows. 6 bands x 5 rows: P(candidate) = 1-(1-j^5)^6 — ~0.09 at j=0.5,
    # ~0.93 at j=0.9: selective for near-dups, cheap on unrelated docs.
    minhash_perms: int = 30
    lsh_bands: int = 6
    shingle_words: int = 3            # word-shingle width over normalized content
    # Hash tier for the minhash_lsh blocking family: True = xxhash64 (JVM,
    # production); False = portable sha-derived hash, bit-identical in
    # DuckDB, making the WHOLE pipeline (keys -> pairs -> clusters)
    # oracle-checkable end-to-end (pipeline_full_portable).
    minhash_fast: bool = True
    # Per-block pair-explosion guard: blocks larger than this are not
    # pair-expanded (logged, never silent — SURVEY.md §4.2). Exact-identity
    # families instead fall back to star edges above identity_star_threshold.
    max_block_size: int = 1000
    # Per-family overrides: name-family blocks are the classic hot keys
    # (main.py / index.js); blocks beyond this are SUB-SALTED (split into
    # sqrt-sized salt cells, action='subsalted' in block_stats) — reduced
    # intra-block recall, never a silent drop.
    # Tuple of (family, cap) pairs (kept hashable for frozen dataclass).
    family_block_caps: tuple[tuple[str, int], ...] = (
        ("name_prefix", 128),
        ("name_soundex", 128),
    )
    identity_star_threshold: int = 64
    # --- scoring / clustering ---
    cluster_threshold: float = 0.80   # min grade for a match edge (MDM MATCH analog)
    # --- skew / shuffle ---
    salt_buckets: int = 16            # salt fan-out for hot blocking keys
    cc_max_iterations: int = 25       # large-star/small-star bound (log n in practice)
    # Once the star iterations have shrunk the edge set at or below this
    # row count, ephemeral (non-checkpointed) runs finish the component
    # labeling with a single collect + driver union-find instead of more
    # distributed rounds: each late iteration is a fixed ~5 s of
    # scheduler/AQE latency over a few MB of edges — pure driver-phase
    # overhead that does not scale with cores (the e2e-scaling cap,
    # VERDICT r3 #2). 2M canonical edges ≈ 300 MB of 64-char id pairs —
    # bounded driver memory; a larger graph keeps iterating distributed.
    cc_driver_finish_edges: int = 2_000_000
    # --- fuzzy comparators (mdm-rules.json matchFields; SURVEY.md C14-C16) ---
    jaro_winkler_threshold: float = 0.92
    levenshtein_ratio_threshold: float = 0.85
    enable_fuzzy: bool = True
    # Jaro-Winkler/Levenshtein are evaluated once per DISTINCT unequal stem
    # pair (not per candidate pair) and joined back; below this row count
    # the table is broadcast so the pair stream never shuffles for it.
    # 8M rows ≈ 500 MB of (stem, stem, double, double) entries — inside a
    # scoring executor's memory, and far cheaper than the alternative (a
    # full slim exchange of the pair stream against a shuffled table).
    jw_distinct_broadcast_limit: int = 8_000_000
    # Records-side row count under which the scoring attaches BROADCAST
    # the attribute relation (~400 B/row -> ~400 MB ceiling): the pair
    # stream then never shuffles — scan -> broadcast probes -> flags ->
    # partial agg in one codegen pass. Above it, slim shuffle-hash id
    # joins (the plan an arbitrary-scale pair list needs).
    records_broadcast_limit: int = 1_000_000
    # Intern record ids to dense longs (normalize.with_dense_ids) right
    # after normalize: blocking then emits left_didx/right_didx pair twins
    # and every scoring attach keys on dense longs (LongHashedRelation
    # direct-address probes — the kernel-bench fast path, now the
    # production path). Off = legacy sparse rid64 twins.
    dense_ids: bool = True
    # Prefix-bucket width for the dense-id rank passes. None = auto-scale
    # to the input (ceil(log16(n / 4M-row target)) — see
    # normalize.with_dense_ids); an explicit width is honored verbatim
    # (didx values are identical at every width — pytested).
    dense_id_nibbles: int | None = None
    # --- input validation (P3-P6; IdentityMatching.java:519-560) ---
    # Records whose completeness tier ranks below this are dropped before
    # blocking: "NONE" | "BASE" | "L0" | "L1". The synthetic corpus is
    # fully base-valid, so "BASE" mirrors the reference's always-on
    # base-profile validation without changing healthy-corpus results.
    validation_level: str = "BASE"
    # Header-override analog (X-Bypass-Validation): gate skipped entirely.
    validation_override: bool = False
    # --- checkpoint / lineage ---
    checkpoint_dir: str | None = None  # parquet snapshot store; None = localCheckpoint only

    @property
    def lsh_rows_per_band(self) -> int:
        return max(1, self.minhash_perms // self.lsh_bands)

    def with_(self, **kw) -> "MatchConfig":
        return replace(self, **kw)


# Grade tiers exactly as the reference decision table emits them
# (IdentityMatchingScorer.java:38-69).
GRADE_CERTAIN = 0.99
GRADE_PROBABLE = 0.80
GRADE_POSSIBLE = 0.70
GRADE_WEAK = 0.60
GRADE_NONE = 0.10
ALL_GRADES = (GRADE_CERTAIN, GRADE_PROBABLE, GRADE_POSSIBLE, GRADE_WEAK, GRADE_NONE)
