"""Pure-SQL XXH64 (seed=42, Spark ``xxhash64`` semantics) for DuckDB.

The production dedup paths hash with Spark's JVM ``xxhash64``; their
oracle twins were rows-only because DuckDB has no XXH64 (VERDICT r3 #4).
The driver's correctness gate executes ONE SQL string per oracle — no
Python UDF registration is possible — so this module generates the hash
as plain SQL: HUGEINT (128-bit) arithmetic emulates the mod-2^64
multiply/rotate pipeline and two recursive CTEs walk the byte stripes of
each distinct input string. Validated byte-for-byte against
``F.xxhash64`` in tests/test_functions.py::test_xxh64_sql_parity.

Layout per machine instance (``xxh64_machine_cte(prefix, src)``):

  {p}_in      row_number-keyed distinct strings + uppercase hex of their
              UTF-8 bytes (DuckDB ``hex(varchar)``) + byte length
  {p}_stripe  recursive: the 4-accumulator 32-byte stripe loop (len>=32)
  {p}_mg*     merge of v1..v4 (rotl sums + 4 merge rounds)
  {p}_t0      small-path seed+P5 for len<32, + length fold
  {p}_tail    recursive: 8-byte / 4-byte / 1-byte tail chunks
  {p}_out     avalanche + signed-BIGINT view: (s, h64u HUGEINT, h64 BIGINT)

All arithmetic stays in HUGEINT in [0, 2^64): a*b mod 2^64 is computed
via 32-bit half products (the full 64x64 product would overflow signed
128-bit), rotations via multiply+floor-divide, xor via UBIGINT casts.
"""

from __future__ import annotations

M64 = 18446744073709551616  # 2^64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SEED = 42


def _mulc(x: str, c: int) -> str:
    """(x * c) mod 2^64 for HUGEINT x in [0,2^64) and constant c."""
    cl, ch = c % 4294967296, c // 4294967296
    return (
        f"(((({x}) % 4294967296) * {cl} + (((({x}) % 4294967296) * {ch} "
        f"+ (({x}) // 4294967296) * {cl}) % 4294967296) * 4294967296) % {M64})"
    )


def _rotl(x: str, r: int) -> str:
    return f"((({x}) * {1 << r} + ({x}) // {1 << (64 - r)}) % {M64})"


def _addm(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {M64})"


def _xor(a: str, b: str) -> str:
    return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"


def _shr(x: str, n: int) -> str:
    return f"(({x}) // {1 << n})"


def _lane8(hx: str, pos: str) -> str:
    """Little-endian u64 of bytes [pos, pos+8) of hex string hx (1-based
    substr; byte k lives at hex chars 2k+1..2k+2)."""
    parts = ", ".join(
        f"substr({hx}, 2*({pos})+{2 * k + 1}, 2)" for k in (7, 6, 5, 4, 3, 2, 1, 0)
    )
    return f"CAST(CAST(concat('0x', {parts}) AS UBIGINT) AS HUGEINT)"


def _lane4(hx: str, pos: str) -> str:
    parts = ", ".join(
        f"substr({hx}, 2*({pos})+{2 * k + 1}, 2)" for k in (3, 2, 1, 0)
    )
    return f"CAST(CAST(concat('0x', {parts}) AS UBIGINT) AS HUGEINT)"


def _byte(hx: str, pos: str) -> str:
    return f"CAST(CAST(concat('0x', substr({hx}, 2*({pos})+1, 2)) AS UBIGINT) AS HUGEINT)"


def xxh64_machine_cte(p: str, src: str) -> str:
    """CTE chain computing xxh64(s, seed=42) for every row of ``{src}(s)``.

    Emits ``{p}_out(s, h64u, h64)``. Must live inside a WITH RECURSIVE.
    """
    v1_0 = (SEED + P1 + P2) % M64
    v2_0 = (SEED + P2) % M64
    v3_0 = SEED
    v4_0 = (SEED - P1) % M64
    small_h0 = (SEED + P5) % M64

    # stripe round: v' = rotl31(v + lane*P2) * P1  (layered: w = v + lane*P2)
    stripe_w = ", ".join(
        _addm(f"v{i}", _mulc(f"l{i - 1}", P2)) + f" AS w{i}" for i in (1, 2, 3, 4)
    )
    stripe_v = ", ".join(
        _mulc(_rotl(f"w{i}", 31), P1) + f" AS v{i}" for i in (1, 2, 3, 4)
    )
    lanes = ", ".join(
        _lane8("i.hx", f"t.pos + {8 * (i - 1)}") + f" AS l{i - 1}" for i in (1, 2, 3, 4)
    )

    # merge: h = rotl1(v1)+rotl7(v2)+rotl12(v3)+rotl18(v4); 4 merge rounds
    rsum = _addm(
        _addm(_addm(_rotl("v1", 1), _rotl("v2", 7)), _rotl("v3", 12)),
        _rotl("v4", 18),
    )
    mg_a = ", ".join(_mulc(f"v{i}", P2) + f" AS a{i}" for i in (1, 2, 3, 4))
    mg_k = ", ".join(_mulc(_rotl(f"a{i}", 31), P1) + f" AS k{i}" for i in (1, 2, 3, 4))

    def merge_round(h: str, k: str) -> str:
        return _addm(_mulc(_xor(h, k), P1), str(P4))

    # tail updates (chunk picked by remaining bytes; x8/x4/x1 arrive
    # already rotated from the layer below)
    h8 = _addm(_mulc("x8", P1), str(P4))
    h4 = _addm(_mulc("x4", P2), str(P3))
    h1 = _mulc("x1", P1)

    return f"""
{p}_in AS (
  SELECT row_number() OVER (ORDER BY s) AS sid, s,
         hex(s) AS hx, length(hex(s)) // 2 AS n
  FROM {src}
),
{p}_stripe(sid, pos, v1, v2, v3, v4) AS (
  SELECT sid, 0, CAST({v1_0} AS HUGEINT), CAST({v2_0} AS HUGEINT),
         CAST({v3_0} AS HUGEINT), CAST({v4_0} AS HUGEINT)
  FROM {p}_in WHERE n >= 32
  UNION ALL
  SELECT sid, pos + 32, {stripe_v}
  FROM (
    SELECT sid, pos, {stripe_w}
    FROM (
      SELECT t.sid, t.pos, t.v1, t.v2, t.v3, t.v4, {lanes}
      FROM {p}_stripe t JOIN {p}_in i USING (sid)
      WHERE t.pos + 32 <= i.n
    )
  )
),
{p}_sfin AS (
  SELECT sid, pos, v1, v2, v3, v4 FROM {p}_stripe
  QUALIFY row_number() OVER (PARTITION BY sid ORDER BY pos DESC) = 1
),
{p}_mg1 AS (
  SELECT sid, pos, {rsum} AS h, {mg_a} FROM {p}_sfin
),
{p}_mg2 AS (SELECT sid, pos, h, {mg_k} FROM {p}_mg1),
{p}_mg3 AS (SELECT sid, pos, {merge_round('h', 'k1')} AS h, k2, k3, k4 FROM {p}_mg2),
{p}_mg4 AS (SELECT sid, pos, {merge_round('h', 'k2')} AS h, k3, k4 FROM {p}_mg3),
{p}_mg5 AS (SELECT sid, pos, {merge_round('h', 'k3')} AS h, k4 FROM {p}_mg4),
{p}_mg6 AS (SELECT sid, pos, {merge_round('h', 'k4')} AS h FROM {p}_mg5),
{p}_t0 AS (
  SELECT i.sid, COALESCE(m.pos, 0) AS pos,
         (COALESCE(m.h, CAST({small_h0} AS HUGEINT)) + i.n) % {M64} AS h
  FROM {p}_in i LEFT JOIN {p}_mg6 m USING (sid)
),
{p}_tail(sid, pos, h) AS (
  SELECT sid, pos, h FROM {p}_t0
  UNION ALL
  SELECT sid,
         pos + CASE WHEN rem >= 8 THEN 8 WHEN rem >= 4 THEN 4 ELSE 1 END,
         CASE WHEN rem >= 8 THEN {h8} WHEN rem >= 4 THEN {h4} ELSE {h1} END
  FROM (
    SELECT sid, pos, rem, {_rotl('x8e', 27)} AS x8, {_rotl('x4e', 23)} AS x4,
           {_rotl('x1e', 11)} AS x1
    FROM (
      SELECT sid, pos, rem, {_xor('h', 'k8')} AS x8e, {_xor('h', 'a4')} AS x4e,
             {_xor('h', 'a1')} AS x1e
      FROM (
        SELECT sid, pos, rem, h, {_mulc(_rotl('a8', 31), P1)} AS k8, a4, a1
        FROM (
          SELECT sid, pos, rem, h, {_mulc('l8', P2)} AS a8,
                 {_mulc('l4', P1)} AS a4, {_mulc('b1', P5)} AS a1
          FROM (
            SELECT t.sid, t.pos, t.h, i.n - t.pos AS rem,
                   CASE WHEN i.n - t.pos >= 8
                        THEN {_lane8('i.hx', 't.pos')} ELSE CAST(0 AS HUGEINT) END AS l8,
                   CASE WHEN i.n - t.pos >= 4 AND i.n - t.pos < 8
                        THEN {_lane4('i.hx', 't.pos')} ELSE CAST(0 AS HUGEINT) END AS l4,
                   CASE WHEN i.n - t.pos >= 1 AND i.n - t.pos < 4
                        THEN {_byte('i.hx', 't.pos')} ELSE CAST(0 AS HUGEINT) END AS b1
            FROM {p}_tail t JOIN {p}_in i USING (sid)
            WHERE t.pos < i.n
          )
        )
      )
    )
  )
),
{p}_av0 AS (
  SELECT t.sid, t.h FROM {p}_tail t JOIN {p}_in i USING (sid) WHERE t.pos = i.n
),
{p}_av1 AS (SELECT sid, {_mulc(_xor('h', _shr('h', 33)), P2)} AS h FROM {p}_av0),
{p}_av2 AS (SELECT sid, {_mulc(_xor('h', _shr('h', 29)), P3)} AS h FROM {p}_av1),
{p}_av3 AS (SELECT sid, {_xor('h', _shr('h', 32))} AS h FROM {p}_av2),
{p}_out AS (
  SELECT i.s, a.h AS h64u,
         CAST(CASE WHEN a.h >= 9223372036854775808 THEN a.h - {M64} ELSE a.h END
              AS BIGINT) AS h64
  FROM {p}_av3 a JOIN {p}_in i USING (sid)
)"""

# ---------------------------------------------------------------------------
# Fast-path dedup twins: the same LSH/band logic as the portable twins in
# __spark_entry__, but hashing with the SQL XXH64 machine above — so the
# PRODUCTION hash path (operators/dedup with fast=True) is value-exact
# against DuckDB, not just the sha-derived portable variant.
# ---------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),"
    " x -> x != '')"
)


def dedup_minhash_fast_sql(num_perm: int = 32, bands: int = 8,
                           shingle_words: int = 3, threshold: float = 0.5) -> str:
    """Twin of operators/dedup.near_dup_pairs_minhash(fast=True): xxhash64
    shingle hashes (masked to 31 bits), affine permutations mod 2^61-1,
    per-band slice xxhash64 (signed, as Spark casts it to string), bucket
    join, exact shingle-Jaccard verify."""
    from identity_matching_spark.functions.hashing import MINHASH_P, minhash_coeffs

    rpb = max(1, num_perm // bands)
    coeffs = minhash_coeffs(num_perm)
    sig_items = ",\n      ".join(
        f"list_min([(h * {a} + {b}) % {MINHASH_P} for h in hs])" for a, b in coeffs
    )
    band_structs = ",\n      ".join(
        f"struct_pack(b := {b}, t := array_to_string(sig[{b * rpb + 1}:{b * rpb + rpb}], ','))"
        for b in range(bands)
    )
    k = shingle_words
    return f"""WITH RECURSIVE t AS (
      SELECT doc_id, {_NORM} AS norm FROM documents),
    w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words FROM t),
    s AS MATERIALIZED (
      SELECT doc_id,
        CASE WHEN len(words) >= {k}
          THEN list_distinct([array_to_string(words[i:i+{k - 1}], ' ') for i in range(1, len(words)-{k - 2})])
          ELSE [norm] END AS sh
      FROM w),
    sh_strs AS (SELECT DISTINCT unnest(sh) AS s FROM s),
    {xxh64_machine_cte('xa', 'sh_strs').lstrip(', ').lstrip()},
    bh AS (
      SELECT e.doc_id, list(CAST(x.h64u % 2147483648 AS BIGINT)) AS hs
      FROM (SELECT doc_id, unnest(sh) AS s FROM s) e JOIN xa_out x USING (s)
      GROUP BY e.doc_id),
    sig_t AS (SELECT doc_id, [{sig_items}] AS sig FROM bh),
    bs AS (SELECT doc_id, unnest([{band_structs}]) AS bb FROM sig_t),
    bf AS (SELECT doc_id, bb.b AS b, bb.t AS s FROM bs),
    b_strs AS (SELECT DISTINCT s FROM bf),
    {xxh64_machine_cte('xb', 'b_strs').lstrip(', ').lstrip()},
    ks AS MATERIALIZED (
      SELECT f.doc_id, concat('mh', f.b, ':', CAST(x.h64 AS VARCHAR)) AS bucket
      FROM bf f JOIN xb_out x USING (s)),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM ks l JOIN ks r ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
    j AS (
      SELECT c.a, c.b,
        round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) AS jaccard
      FROM cand c JOIN s sa ON c.a = sa.doc_id JOIN s sb ON c.b = sb.doc_id)
    SELECT a, b, jaccard FROM j WHERE jaccard >= {threshold}"""


def dedup_simhash_fast_sql(max_hamming: int = 7, prefix_bits: int = 8) -> str:
    """Twin of operators/dedup.near_dup_pairs_simhash(fast=True): xxhash64
    token hashes (with multiplicity), per-bit +-1 votes, u64 packing,
    bit-segment band buckets, exact hamming verify."""
    bands = 64 // prefix_bits
    mask = (1 << prefix_bits) - 1
    votes = []
    for b in range(64):
        vote = f"list_sum([CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END for h in hs])"
        votes.append(
            f"(CASE WHEN COALESCE({vote}, 0) > 0 THEN CAST({1 << b} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
        )
    packed = " + ".join(votes)
    bucket_items = ",\n      ".join(
        f"'b{b}:' || CAST((simhash // {1 << (b * prefix_bits)}) % {mask + 1} AS VARCHAR)"
        for b in range(bands)
    )
    return f"""WITH RECURSIVE t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents),
    tk_strs AS (SELECT DISTINCT unnest(toks) AS s FROM t),
    {xxh64_machine_cte('xa', 'tk_strs').lstrip(', ').lstrip()},
    hh AS (
      SELECT e.doc_id, list(x.h64u) AS hs
      FROM (SELECT doc_id, unnest(toks) AS s FROM t) e JOIN xa_out x USING (s)
      GROUP BY e.doc_id),
    fp0 AS (SELECT doc_id, {packed} AS simhash FROM hh),
    fp AS (
      SELECT t.doc_id, COALESCE(f.simhash, CAST(0 AS HUGEINT)) AS simhash
      FROM t LEFT JOIN fp0 f USING (doc_id)),
    ks AS MATERIALIZED (SELECT doc_id, simhash, unnest([{bucket_items}]) AS bucket FROM fp),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
             bit_count(xor(CAST(l.simhash AS UBIGINT), CAST(r.simhash AS UBIGINT))) AS hamming
      FROM ks l JOIN ks r ON l.bucket = r.bucket AND l.doc_id < r.doc_id)
    SELECT a, b, hamming FROM cand WHERE hamming <= {max_hamming}"""
