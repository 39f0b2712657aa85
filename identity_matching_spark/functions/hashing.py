"""Hashing primitives: content identity, portable 64-bit hashes, MinHash,
LSH band keys, SimHash.

Two hash tiers, chosen deliberately:

* ``hash64_fast`` — ``xxhash64`` (JVM, codegen'd). The production path for
  MinHash/SimHash at 100 TB: no Python, no crypto cost.
* ``hash64_sha`` — first 15 hex chars of sha256 as a bigint. Bit-identical
  in DuckDB (``CAST(CONCAT('0x', SUBSTR(sha256(x),1,15)) AS BIGINT)``),
  so any operator built on it is oracle-checkable cross-engine. Used by
  the ``queries()``/``oracle_sql()`` correctness surface.

Content identity is always ``sha2(content, 256)`` — the per-row invariant
mandated by BASELINE.json ``input_hint`` (reference analog: strong
identifiers, IdentityMatching.java:304-338).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex(col: Column) -> Column:
    """Lowercase 64-char sha256 hex; identical to DuckDB ``sha256(x)``."""
    return F.sha2(col.cast("string"), 256)


def hash64_sha(col: Column) -> Column:
    """Portable (Spark==DuckDB) unsigned-60-bit hash as bigint."""
    return F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 15), 16, 10).cast("long")


def hash64_fast(col: Column, seed: int = 0) -> Column:
    """xxhash64 — JVM-fast, used on the hot path (not oracle-portable)."""
    if seed:
        return F.xxhash64(F.lit(seed), col)
    return F.xxhash64(col)


def word_shingles(norm_text: Column, k: int) -> Column:
    """Distinct k-word shingles of a whitespace-normalized string.

    Pure Column composition (no UDF): split -> sliding windows via
    transform over an index sequence -> array_distinct. Documents shorter
    than k words yield a single whole-text shingle so every row blocks.
    """
    words = F.split(norm_text, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = lambda i: F.array_join(F.slice(words, i + 1, k), " ")  # noqa: E731
    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle_at))).otherwise(
        F.array(norm_text)
    )


#: Mersenne prime 2^61-1 for the universal-hash family (a*h+b mod p).
MINHASH_P = (1 << 61) - 1


def minhash_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a_i odd, both < 2^31).

    a*h31 + b stays < 2^62 so the arithmetic never overflows a signed
    64-bit integer — identical semantics in Spark (ANSI mode) and DuckDB.
    """
    return [
        ((((2 * i + 1) * 2654435761) % 2147483647) | 1, (i * 40503 + 12345) % 2147483647)
        for i in range(num_perm)
    ]


def minhash_signature(shingles: Column, num_perm: int, fast: bool = True) -> Column:
    """MinHash signature: array of num_perm bigints.

    Standard universal-hash formulation: each shingle is string-hashed
    ONCE (the expensive part), then the i-th permutation is the affine
    map (a_i * h31 + b_i) mod (2^61-1) — 1 string hash + num_perm
    multiply-adds per shingle, all in whole-stage codegen. (The naive
    per-permutation string hash re-evaluates the shingle-construction
    subtree num_perm times because codegen cannot CSE across lambda
    scopes — measured 30x slower.)
    """
    h = hash64_fast if fast else hash64_sha
    base = F.transform(shingles, lambda s: h(s).bitwiseAND(F.lit(0x7FFFFFFF)))
    coeffs = minhash_coeffs(num_perm)

    def perms(x: Column) -> Column:
        return F.array(*[(x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P) for a, b in coeffs])

    # Single fold over the (expensive) base-hash array: the accumulator is
    # the running component-wise minimum — base/shingles evaluate ONCE.
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), num_perm)
    return F.aggregate(
        base, init, lambda acc, x: F.zip_with(acc, perms(x), lambda a, b: F.least(a, b))
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int, fast: bool = True) -> Column:
    """LSH band keys: array of ``bands`` strings ``mh<i>:<hash(band slice)>``.

    Two rows sharing ANY band key become blocking candidates (standard
    banding; see MinHash-LSH in Mining of Massive Datasets ch.3).
    """
    h = hash64_fast if fast else hash64_sha

    def band_key(b: Column) -> Column:
        sl = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), ",")
        return F.concat(F.lit("mh"), b.cast("string"), F.lit(":"), h(joined).cast("string"))

    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)


def simhash64(tokens: Column, fast: bool = True) -> Column:
    """64-bit SimHash over a token array, as bigint.

    Classic bit-voting (Charikar 2002): for each bit b, sum +-1 votes of
    token-hash bit b; simhash bit b = 1 iff the sum > 0. Composed from
    transform/aggregate/shiftright — stays in whole-stage codegen.
    """
    h = hash64_fast if fast else hash64_sha
    hashes = F.transform(tokens, lambda t: h(t))
    # Bit masks for b=0..63 as signed-long literals (1<<63 is the sign bit).
    masks = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )
    # ONE fold over the token-hash array with an array<long> of 64 vote
    # counters (zip_with inside the accumulator) — not 64 separate
    # aggregates re-walking the array per bit (O(64*n_tokens) expression
    # evals). Bit-identical to the per-bit formulation.
    init = F.array_repeat(F.lit(0).cast("long"), 64)
    votes = F.aggregate(
        hashes,
        init,
        lambda acc, x: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(x.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # Pack: OR the mask of every bit whose vote is positive.
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
