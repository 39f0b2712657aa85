"""DuckDB oracle SQL for the driver's correctness gate.

Every SQL-expressible operator in ``queries.py`` has a twin here built
over the SAME deterministic documents->files mapping and the SAME
derived-attribute expressions (see operators/normalize.py). The grade
CASE cascade is generated from one flag list shared with the Spark side
so the two decision tables cannot drift.

DuckDB dialect notes (vs Spark SQL): regexp_replace needs the 'g' flag
for replace-all; sha256(x) == Spark sha2(x, 256); string_split is the
split; list comprehensions replace transform().
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# documents -> files -> records (keep in sync with sources/tables.py
# files_from_documents and operators/normalize.py normalize_files)
# ---------------------------------------------------------------------------

FILES_CTE = r"""
files AS (
  SELECT
    doc_id,
    'org' || CAST(doc_id % 13 AS VARCHAR) AS repo,
    source || '/' || lang || '/' ||
      regexp_replace(
        array_to_string(string_split_regex(trim(text), '\s+')[1:2], '_'),
        '[^a-zA-Z0-9_]', '_', 'g')
      || '_' || CAST(doc_id % 7 AS VARCHAR) || '.txt' AS path,
    substr(sha256(CAST(doc_id AS VARCHAR)), 1, 40) AS commit,
    lang,
    text AS content
  FROM documents
)
"""

RECORDS_CTE = r"""
base AS (
  SELECT *,
    trim(regexp_replace(lower(content), '\s+', ' ', 'g')) AS norm_content,
    string_split(path, '/') AS parts,
    string_split(path, '/')[-1] AS filename,
    list_filter([trim(y) for y in string_split(content, chr(10))], x -> x != '') AS tlines
  FROM files
),
records_base AS (
  SELECT
    doc_id,
    sha256(concat_ws(chr(31), repo, path, commit)) AS record_id,
    repo, path, commit, lang, content, norm_content,
    lower(trim(lang)) AS lang_norm,
    sha256(content) AS content_sha256,
    sha256(concat_ws(chr(31), repo, path)) AS file_id,
    sha256(norm_content) AS norm_sha,
    regexp_replace(filename, '\.[^.]*$', '') AS stem,
    lower(regexp_extract(filename, '\.([^.]*)$', 1)) AS ext,
    CASE WHEN len(parts) >= 2 THEN parts[1] END AS dir1,
    CASE WHEN len(parts) >= 3 THEN parts[2] END AS dir2,
    CASE WHEN len(parts) >= 2 THEN parts[len(parts) - 1] END AS parent_dir,
    CAST(floor(length(norm_content) / 32) AS BIGINT) AS size_bucket,
    sha256(trim(string_split(content, chr(10))[1])) AS first_line_sha,
    sha256(trim(string_split(content, chr(10))[-1])) AS last_line_sha,
    list_distinct([CAST(concat('0x', substr(sha256(x), 1, 15)) AS BIGINT) for x in tlines]) AS line_hashes,
    sha256(array_to_string(list_sort(list_distinct(tlines)), chr(10))) AS sorted_lines_sha,
    sha256(regexp_replace(content, '[A-Za-z_][A-Za-z0-9_]*', 'ID', 'g')) AS shape_sha,
    sha256(concat_ws(chr(31), repo,
        lower(regexp_replace(filename, '\.[^.]*$', '')))) AS ins_member_sha,
    sha256(concat_ws(chr(31), lower(trim(lang)),
        regexp_replace(path, '/[^/]*$', ''))) AS ins_subscriber_sha
  FROM base
),
records AS (
  SELECT *,
    substr(norm_sha, 61, 4) AS ssn4,
    CAST(concat('0x', substr(content_sha256, 1, 15)) AS BIGINT) AS content_h64,
    CAST(concat('0x', substr(file_id, 1, 15)) AS BIGINT) AS file_h64,
    CAST(concat('0x', substr(norm_sha, 1, 15)) AS BIGINT) AS norm_h64,
    CAST(concat('0x', substr(sorted_lines_sha, 1, 15)) AS BIGINT) AS sorted_lines_h64,
    CAST(concat('0x', substr(shape_sha, 1, 15)) AS BIGINT) AS shape_h64,
    CAST(concat('0x', substr(ins_member_sha, 1, 15)) AS BIGINT) AS ins_member_h64,
    CAST(concat('0x', substr(ins_subscriber_sha, 1, 15)) AS BIGINT) AS ins_subscriber_h64,
    CAST(concat('0x', substr(first_line_sha, 1, 15)) AS BIGINT) AS first_line_h64,
    CAST(concat('0x', substr(last_line_sha, 1, 15)) AS BIGINT) AS last_line_h64
  FROM records_base
)
"""

# SQL-expressible blocking families (fast-minhash has no DuckDB twin; the
# portable-minhash query carries its own SQL). name_prefix folds accents
# with the SAME translate table as the Spark side's hapi_norm
# (functions/normalize.py:32-34) — lower/trim alone would silently diverge
# on a non-ASCII corpus.


def _keys_cte() -> str:
    from identity_matching_spark.functions.normalize import _ACCENTS, _PLAIN

    norm_stem = f"lower(trim(translate(stem, '{_ACCENTS}', '{_PLAIN}')))"
    return f"""
keys AS (
  SELECT record_id, 'content_sha' AS family,
         'sha:' || CAST(content_h64 AS VARCHAR) AS blocking_key FROM records
  UNION ALL
  SELECT record_id, 'file_id', 'fid:' || CAST(file_h64 AS VARCHAR) FROM records
  UNION ALL
  SELECT record_id, 'norm_sha', 'nsha:' || CAST(norm_h64 AS VARCHAR) FROM records
  UNION ALL
  SELECT record_id, 'name_prefix',
         'np:' || lang_norm || '|' || substr({norm_stem}, 1, 4)
         || '|' || CAST(size_bucket AS VARCHAR) FROM records
)
"""


KEYS_CTE = _keys_cte()

PAIRS_CTE = r"""
pairs AS (
  SELECT DISTINCT l.record_id AS left_id, r.record_id AS right_id
  FROM keys l JOIN keys r
    ON l.blocking_key = r.blocking_key AND l.record_id < r.record_id
)
"""

PRELUDE = "WITH " + ",".join([FILES_CTE, RECORDS_CTE])
PRELUDE_PAIRS = "WITH " + ",".join([FILES_CTE, RECORDS_CTE, KEYS_CTE, PAIRS_CTE])


# ---------------------------------------------------------------------------
# Phonetic encodings (C14/C15) as pure DuckDB SQL — exact twins of
# F.soundex (Spark's UTF8String.soundex semantics incl. the non-letter
# code-reset) and functions/phonetic.cologne_encode, both validated
# byte-for-byte on the full stem/dir1 vocabulary plus the German test
# vectors (tests/test_oracle_parity.py). Metaphone (commons-codec
# semantics) is a variable-advance state machine, expressed as the
# recursive CTE in _metaphone_cte below.
# ---------------------------------------------------------------------------

def _phonetic_cte() -> str:
    from identity_matching_spark.functions.normalize import _ACCENTS, _PLAIN

    tr = "'abcdefghijklmnopqrstuvwxyz', '01230127022455012623017202'"
    norm = "lower(trim(translate({x}, '" + _ACCENTS + "', '" + _PLAIN + "')))"
    cologne_case = """CASE
        WHEN ch IN ('a','e','i','j','o','u','y','ä','ö','ü') THEN '0'
        WHEN ch = 'b' THEN '1'
        WHEN ch = 'p' THEN CASE WHEN coalesce(cw[i+1],'') = 'h' THEN '3' ELSE '1' END
        WHEN ch IN ('d','t') THEN CASE WHEN coalesce(cw[i+1],'') IN ('c','s','z') THEN '8' ELSE '2' END
        WHEN ch IN ('f','v','w') THEN '3'
        WHEN ch IN ('g','k','q') THEN '4'
        WHEN ch = 'c' THEN CASE
          WHEN i = 1 THEN CASE WHEN coalesce(cw[i+1],'') IN ('a','h','k','l','o','q','r','u','x') THEN '4' ELSE '8' END
          WHEN coalesce(cw[i-1],'') IN ('s','z') THEN '8'
          ELSE CASE WHEN coalesce(cw[i+1],'') IN ('a','h','k','o','q','u','x') THEN '4' ELSE '8' END END
        WHEN ch = 'x' THEN CASE WHEN i > 1 AND coalesce(cw[i-1],'') IN ('c','k','q') THEN '8' ELSE '48' END
        WHEN ch = 'l' THEN '5'
        WHEN ch IN ('m','n') THEN '6'
        WHEN ch = 'r' THEN '7'
        WHEN ch IN ('s','z','ß') THEN '8'
        ELSE '' END"""
    return f"""
px1 AS (
  SELECT record_id,
    {norm.format(x='stem')} AS sx,
    {norm.format(x='dir1')} AS cx
  FROM records),
px2 AS (
  SELECT *,
    translate(substr(sx,1,1), {tr}) AS first_code,
    list_transform([c for c in string_split(substr(sx,2),'') if c NOT IN ('h','w')],
      c -> CASE WHEN c BETWEEN 'a' AND 'z' THEN translate(c, {tr}) ELSE '0' END) AS s_codes,
    [c for c in string_split(cx,'') if c ~ '[a-zäöüß]'] AS cw
  FROM px1),
px3 AS (
  SELECT *,
    list_filter(s_codes, (c,i) -> c != '0' AND c != CASE WHEN i = 1 THEN first_code ELSE s_codes[i-1] END) AS s_emitted,
    list_transform(cw, (ch,i) -> {cologne_case}) AS c_codes
  FROM px2),
px4 AS (
  SELECT *, [c for c in string_split(coalesce(array_to_string(c_codes,''),''),'')] AS cf FROM px3),
px5 AS (
  SELECT *, coalesce(array_to_string(list_filter(cf, (c,i) -> i = 1 OR c != cf[i-1]), ''), '') AS c_collapsed FROM px4),
phon AS (
  SELECT record_id,
    CASE WHEN sx IS NULL THEN NULL
         WHEN sx = '' THEN sx
         WHEN NOT (substr(sx,1,1) BETWEEN 'a' AND 'z') THEN sx
         ELSE upper(substr(sx,1,1)) || rpad(substr(coalesce(array_to_string(s_emitted,''),''),1,3),3,'0') END AS soundex_stem,
    CASE WHEN cx IS NULL THEN NULL
         WHEN c_collapsed = '' THEN ''
         ELSE substr(c_collapsed,1,1) || replace(substr(c_collapsed,2),'0','') END AS cologne_dir1
  FROM px5)
"""


def _metaphone_cte(max_len: int = 4) -> str:
    """Exact DuckDB twin of functions/phonetic.metaphone_encode —
    commons-codec Metaphone semantics since r4 (the matcher HAPI's
    METAPHONE slot wraps; default maxCodeLen=4): the variable-advance
    state machine as a RECURSIVE CTE — one row per (word, position) with
    (j, emitted) state; the terminal row (max j) carries the code.
    Requires the query to open with WITH RECURSIVE. Mirrored literally:
    duplicate-letter skip (except C), the initial two-letter exceptions
    (KN/GN/PN/AE/WR/WH/X), silent -MB/GH/GN/TCH/H-after-CSPTG, the
    CIA/SIO/SIA/TIO/TIA -> X classes, SCH->K, initial-CH-with-vowel->K,
    the char-cap counting 'KS' as two, the 1-char-input uppercase
    passthrough, and non-letters occupying positions without emitting.
    Operates on px1.sx (the hapi-normalized stem from the phonetic CTE);
    validated against commons-codec 1.19 in
    tests/test_oracle_parity.py::test_metaphone_sql_vs_python."""
    V = "('a','e','i','o','u')"
    FV = "('e','i','y')"
    emit = f"""CASE
      WHEN ch != 'c' AND j > 1 AND prv = ch THEN ''
      WHEN ch IN {V} THEN CASE WHEN j = 1 THEN upper(ch) ELSE '' END
      WHEN ch = 'b' THEN CASE WHEN prv = 'm' AND j = wdsz THEN '' ELSE 'B' END
      WHEN ch = 'c' THEN CASE
        WHEN prv = 's' AND nxt IN {FV} THEN ''
        WHEN nxt = 'i' AND nx2 = 'a' THEN 'X'
        WHEN nxt IN {FV} THEN 'S'
        WHEN prv = 's' AND nxt = 'h' THEN 'K'
        WHEN nxt = 'h' THEN CASE WHEN j = 1 AND wdsz >= 3 AND substr(w, 3, 1) IN {V}
                                 THEN 'K' ELSE 'X' END
        ELSE 'K' END
      WHEN ch = 'd' THEN CASE WHEN nxt = 'g' AND nx2 IN {FV} THEN 'J' ELSE 'T' END
      WHEN ch = 'g' THEN CASE
        WHEN nxt = 'h' AND j = wdsz - 1 THEN ''
        WHEN nxt = 'h' AND nx2 != '' AND nx2 NOT IN {V} THEN ''
        WHEN j > 1 AND nxt = 'n' THEN ''
        WHEN nxt IN {FV} THEN 'J'
        ELSE 'K' END
      WHEN ch = 'h' THEN CASE
        WHEN j = wdsz THEN ''
        WHEN j > 1 AND prv IN ('c','s','p','t','g') THEN ''
        WHEN nxt IN {V} THEN 'H'
        ELSE '' END
      WHEN ch IN ('f','j','l','m','n','r') THEN upper(ch)
      WHEN ch = 'k' THEN CASE WHEN j > 1 AND prv = 'c' THEN '' ELSE 'K' END
      WHEN ch = 'p' THEN CASE WHEN nxt = 'h' THEN 'F' ELSE 'P' END
      WHEN ch = 'q' THEN 'K'
      WHEN ch = 's' THEN CASE WHEN nxt = 'h' OR (nxt = 'i' AND nx2 IN ('o','a'))
                              THEN 'X' ELSE 'S' END
      WHEN ch = 't' THEN CASE
        WHEN nxt = 'i' AND nx2 IN ('o','a') THEN 'X'
        WHEN nxt = 'c' AND nx2 = 'h' THEN ''
        WHEN nxt = 'h' THEN '0'
        ELSE 'T' END
      WHEN ch = 'v' THEN 'F'
      WHEN ch IN ('w','y') THEN CASE WHEN j < wdsz AND nxt IN {V}
                                     THEN upper(ch) ELSE '' END
      WHEN ch = 'x' THEN 'KS'
      WHEN ch = 'z' THEN 'S'
      ELSE '' END"""
    # only DGE/DGI/DGY advances the cursor past consumed letters (CH/PH/
    # SH/TH are handled by the H-silence-after-CSPTG rule instead)
    adv = (f"CASE WHEN ch = 'd' AND NOT (j > 1 AND prv = 'd') "
           f"AND nxt = 'g' AND nx2 IN {FV} THEN 3 ELSE 1 END")
    return f"""
mp1 AS (
  SELECT record_id, sx IS NULL AS mp_null, coalesce(sx, '') AS wq FROM px1),
mp2 AS (
  SELECT record_id,
    CASE WHEN substr(wq, 1, 1) IN ('k','g','p') AND substr(wq, 2, 1) = 'n' THEN substr(wq, 2)
         WHEN wq LIKE 'ae%' THEN substr(wq, 2)
         WHEN wq LIKE 'wr%' THEN substr(wq, 2)
         WHEN wq LIKE 'wh%' THEN 'w' || substr(wq, 3)
         WHEN wq LIKE 'x%' THEN 's' || substr(wq, 2)
         ELSE wq END AS w
  FROM mp1 WHERE NOT mp_null AND length(wq) >= 2),
mstep(record_id, w, j, out) AS (
  SELECT record_id, w, 1, '' FROM mp2
  UNION ALL
  SELECT record_id, w, j + {adv}, out || {emit}
  FROM (
    SELECT record_id, w, j, out,
      length(w) AS wdsz,
      substr(w, j, 1) AS ch,
      CASE WHEN j = 1 THEN '' ELSE substr(w, j - 1, 1) END AS prv,
      substr(w, j + 1, 1) AS nxt,
      substr(w, j + 2, 1) AS nx2
    FROM mstep WHERE j <= length(w) AND length(out) < {max_len}) s
),
mfin AS (
  SELECT record_id, substr(out, 1, {max_len}) AS code,
         row_number() OVER (PARTITION BY record_id ORDER BY j DESC) AS r
  FROM mstep),
met AS (
  SELECT mp1.record_id,
    CASE WHEN mp1.mp_null THEN NULL
         WHEN length(mp1.wq) <= 1 THEN upper(mp1.wq)
         ELSE m.code END AS metaphone_stem
  FROM mp1 LEFT JOIN (SELECT record_id, code FROM mfin WHERE r = 1) m
    USING (record_id))
"""


def fuzzy_scored_sql(jw_threshold: float, lev_threshold: float) -> str:
    """C14-C16 + verdict_phonetic over the SQL-expressible pair set.

    Jaro-Winkler uses DuckDB's builtin ``jaro_winkler_similarity`` (the
    standard Winkler 1990 boost-threshold form — functions/similarity.py
    implements the same and is validated equal on the full stem-pair
    cross product). Null semantics mirror the Spark side: a null on
    either side yields NULL sim -> FALSE flag / 0.0 rounded sim.
    """
    jw = ("(CASE WHEN l.stem IS NOT NULL AND r.stem IS NOT NULL "
          "THEN jaro_winkler_similarity(l.stem, r.stem) END)")
    lev = ("(CASE WHEN l.stem IS NULL OR r.stem IS NULL THEN NULL "
           "WHEN greatest(length(l.stem), length(r.stem)) = 0 THEN 1.0 "
           "ELSE 1.0 - CAST(levenshtein(l.stem, r.stem) AS DOUBLE)"
           " / greatest(length(l.stem), length(r.stem)) END)")
    return (
        "WITH RECURSIVE "
        + ",".join(
            [FILES_CTE, RECORDS_CTE, KEYS_CTE, PAIRS_CTE, _phonetic_cte(),
             _metaphone_cte()]
        )
        + f""",
fuzzy AS (
  SELECT p.left_id, p.right_id,
    COALESCE(pl.cologne_dir1 IS NOT NULL AND pr.cologne_dir1 IS NOT NULL
             AND pl.cologne_dir1 = pr.cologne_dir1, FALSE) AS cologne_given_match,
    COALESCE(pl.soundex_stem IS NOT NULL AND pr.soundex_stem IS NOT NULL
             AND pl.soundex_stem = pr.soundex_stem, FALSE) AS soundex_family_match,
    COALESCE(ml.metaphone_stem IS NOT NULL AND mr.metaphone_stem IS NOT NULL
             AND ml.metaphone_stem = mr.metaphone_stem, FALSE) AS metaphone_family_match,
    COALESCE({jw} >= {jw_threshold}, FALSE) AS jw_family_match,
    COALESCE({lev} >= {lev_threshold}, FALSE) AS lev_family_match,
    round(COALESCE({jw}, 0.0), 4) AS jw_family_sim,
    round(COALESCE({lev}, 0.0), 4) AS lev_family_sim
  FROM pairs p
  JOIN records l ON p.left_id = l.record_id
  JOIN records r ON p.right_id = r.record_id
  JOIN phon pl ON p.left_id = pl.record_id
  JOIN phon pr ON p.right_id = pr.record_id
  JOIN met ml ON p.left_id = ml.record_id
  JOIN met mr ON p.right_id = mr.record_id)
SELECT *,
  CASE WHEN cologne_given_match AND soundex_family_match THEN 'MATCH'
       WHEN cologne_given_match THEN 'POSSIBLE_MATCH'
       ELSE 'NO_MATCH' END AS verdict_phonetic
FROM fuzzy"""
    )


# ---------------------------------------------------------------------------
# Comparator flags + decision table, generated from one shared spec.
# (name, sql_expr_template) — templates use l.<col>/r.<col>.
# ---------------------------------------------------------------------------

def _eq(c: str) -> str:
    return f"(l.{c} IS NOT NULL AND r.{c} IS NOT NULL AND l.{c} = r.{c})"


FLAG_SQL: dict[str, str] = {
    "mrn_match": _eq("content_h64"),
    "digital_id_match": _eq("file_h64"),
    "ssn_match": _eq("norm_h64"),
    "ssn_last4_match": _eq("ssn4"),
    "drivers_license_match": _eq("sorted_lines_h64"),
    "passport_match": _eq("shape_h64"),
    "insurance_member_match": _eq("ins_member_h64"),
    "insurance_subscriber_match": _eq("ins_subscriber_h64"),
    "family_name_match": _eq("stem"),
    "first_name_match": _eq("dir1"),
    "middle_name_match": _eq("dir2"),
    "middle_initial_match": (
        "(l.dir2 IS NOT NULL AND r.dir2 IS NOT NULL"
        " AND (length(l.dir2) = 1 OR length(r.dir2) = 1)"
        " AND substr(l.dir2, 1, 1) = substr(r.dir2, 1, 1))"
    ),
    "birth_sex_match": _eq("lang_norm"),
    "birth_date_match": _eq("size_bucket"),
    "phone_match": _eq("first_line_h64"),
    "email_match": _eq("last_line_h64"),
    "address_line_match": (
        "(l.line_hashes IS NOT NULL AND r.line_hashes IS NOT NULL"
        " AND list_has_any(l.line_hashes, r.line_hashes))"
    ),
    "address_city_match": _eq("parent_dir"),
    "address_state_match": _eq("ext"),
    "address_postal_match": (
        "(l.stem IS NOT NULL AND r.stem IS NOT NULL"
        " AND substr(l.stem, 1, 5) = substr(r.stem, 1, 5))"
    ),
}


def flags_select_sql() -> str:
    return ",\n    ".join(
        f"COALESCE({expr}, FALSE) AS {name}" for name, expr in FLAG_SQL.items()
    )


def score_case_sql(prefix: str = "") -> str:
    """The reference decision table (IdentityMatchingScorer.java:38-69) as a
    CASE cascade over already-computed flag columns."""
    p = prefix
    ff = f"({p}first_name_match AND {p}family_name_match)"
    ffd = f"({ff} AND {p}birth_date_match)"
    return f"""CASE
      WHEN ({p}mrn_match OR {p}digital_id_match)
        OR ({ff} AND {p}drivers_license_match)
        OR ({ff} AND {p}passport_match)
        OR ({ff} AND {p}insurance_member_match)
        OR ({ffd} AND {p}insurance_subscriber_match)
        OR ({ff} AND {p}ssn_match) THEN 0.99
      WHEN ({ff} AND {p}insurance_subscriber_match)
        OR ({ffd} AND {p}address_line_match AND {p}address_postal_match)
        OR ({ffd} AND {p}address_line_match AND {p}address_city_match AND {p}address_state_match)
        OR ({ffd} AND {p}email_match) THEN 0.80
      WHEN ({ffd} AND {p}birth_sex_match AND {p}ssn_last4_match)
        OR ({ffd} AND {p}birth_sex_match AND {p}phone_match)
        OR ({ffd} AND {p}birth_sex_match AND {p}address_postal_match)
        OR ({ffd} AND {p}birth_sex_match AND {p}middle_name_match)
        OR ({ffd} AND {p}phone_match) THEN 0.70
      WHEN ({ffd} AND {p}birth_sex_match AND {p}middle_initial_match)
        OR ({ffd} AND {p}birth_sex_match)
        OR {ffd} THEN 0.60
      ELSE 0.10 END"""


def weight_case_sql(p: str = "") -> str:
    """IdentityMatchingScorer.java:71-89."""
    return f"""(
      CASE WHEN {p}passport_match THEN 10 ELSE 0 END
      + CASE WHEN {p}drivers_license_match THEN 10 ELSE 0 END
      + CASE WHEN ({p}address_line_match AND {p}address_postal_match)
          OR ({p}address_city_match AND {p}address_state_match)
          OR {p}phone_match OR {p}email_match OR {p}ssn_match
          OR {p}insurance_subscriber_match OR {p}mrn_match THEN 5 ELSE 0 END
      + CASE WHEN {p}first_name_match AND {p}family_name_match THEN 3 ELSE 0 END
      + CASE WHEN {p}birth_date_match THEN 2 ELSE 0 END
    )"""


def verdict_case_sql(p: str = "") -> str:
    """mdm-rules.json:43-46."""
    return (
        f"CASE WHEN {p}first_name_match AND {p}family_name_match THEN 'MATCH' "
        f"WHEN {p}first_name_match THEN 'POSSIBLE_MATCH' ELSE 'NO_MATCH' END"
    )


SCORED_PAIRS_CTE = f"""
flagged AS (
  SELECT p.left_id, p.right_id,
    {flags_select_sql()}
  FROM pairs p
  JOIN records l ON p.left_id = l.record_id
  JOIN records r ON p.right_id = r.record_id
),
scored AS (
  SELECT *,
    {score_case_sql()} AS score,
    CAST({weight_case_sql()} AS INTEGER) AS weight,
    {verdict_case_sql()} AS verdict
  FROM flagged
)
"""

PRELUDE_SCORED = "WITH " + ",".join(
    [FILES_CTE, RECORDS_CTE, KEYS_CTE, PAIRS_CTE, SCORED_PAIRS_CTE]
)


# ---------------------------------------------------------------------------
# ANN oracle twins. The LSH hyperplanes are deterministic sha-derived ±1
# literals and the IVF centroid sample is ordered by the portable sha
# hash, so both approximate indexes are exactly reproducible in SQL. All
# dot products / norms are written as explicit left-associated chains —
# the same evaluation order as Spark's F.aggregate fold — so the doubles
# (and hence every sign bit and rounded cosine) agree bit-for-bit.
# ---------------------------------------------------------------------------


def _dot_chain(a_fmt: str, b, dim: int) -> str:
    """0.0 + a[1]*b[1] + ... left-assoc; ``b`` is a column format or a
    list of float literals."""
    terms = []
    for i in range(1, dim + 1):
        bi = f"{b[i - 1]:.1f}" if isinstance(b, list) else b.format(i=i)
        terms.append(f"{a_fmt.format(i=i)} * {bi}")
    return "(0.0 + " + " + ".join(terms) + ")"


def _unit_cte(dim: int) -> str:
    sq = " + ".join(f"v[{i}]*v[{i}]" for i in range(1, dim + 1))
    return f"""
u0 AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
u1 AS (SELECT vec_id, v, sqrt(0.0 + {sq}) AS n FROM u0),
unitv AS (SELECT vec_id, CASE WHEN n > 0 THEN [x / n FOR x IN v] ELSE v END AS unit FROM u1)
"""


def _rhp_sig_sql(table: int, col: str, dim: int, n_bits: int) -> str:
    """SQL twin of similarity._rhp_signature: one CASE per bit over the
    same sha-derived ±1 hyperplane literals, same fold order."""
    from identity_matching_spark.operators.similarity import _hyperplane

    bits = []
    for j in range(n_bits):
        hp = _hyperplane(dim, table, j)
        proj = _dot_chain(col + "[{i}]", hp, dim)
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return f"'t{table}:' || " + " || ".join(bits)


def ann_lsh_sql(k: int = 5, dim: int = 64, n_bits: int = 8, n_tables: int = 4,
                probe_below: int = 20) -> str:
    sigs = ", ".join(_rhp_sig_sql(t, "unit", dim, n_bits) for t in range(n_tables))
    cos = _dot_chain("pu.unit[{i}]", "cu.unit[{i}]", dim)
    return f"""WITH {_unit_cte(dim)},
ck AS (SELECT vec_id, unnest([{sigs}]) AS bucket FROM unitv),
pk AS (SELECT vec_id AS probe_id, bucket FROM ck WHERE vec_id < {probe_below}),
cand AS (
  SELECT DISTINCT pk.probe_id, ck.vec_id
  FROM pk JOIN ck USING (bucket)
  WHERE pk.probe_id != ck.vec_id),
sims AS (
  SELECT c.probe_id, c.vec_id, round({cos}, 6) AS cosine
  FROM cand c
  JOIN unitv pu ON c.probe_id = pu.vec_id
  JOIN unitv cu ON c.vec_id = cu.vec_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC) AS rank FROM sims)
SELECT probe_id, vec_id, cosine, rank FROM rk WHERE rank <= {k}"""


def dedup_embedding_sql(threshold: float = 0.4, dim: int = 64, n_bits: int = 4,
                        n_tables: int = 8) -> str:
    """Twin of operators/dedup.near_dup_pairs_embedding: identical RHP
    buckets (sha hyperplanes), a < b self-join on bucket collisions, exact
    cosine on candidates, threshold filter on the rounded value."""
    sigs = ", ".join(_rhp_sig_sql(t, "unit", dim, n_bits) for t in range(n_tables))
    cos = _dot_chain("ua.unit[{i}]", "ub.unit[{i}]", dim)
    return f"""WITH {_unit_cte(dim)},
ck AS (SELECT vec_id, unnest([{sigs}]) AS bucket FROM unitv),
cand AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM ck l JOIN ck r USING (bucket)
  WHERE l.vec_id < r.vec_id),
sims AS (
  SELECT c.a, c.b, round({cos}, 6) AS cosine
  FROM cand c
  JOIN unitv ua ON c.a = ua.vec_id
  JOIN unitv ub ON c.b = ub.vec_id)
SELECT a, b, cosine FROM sims WHERE cosine >= {threshold}"""


def ann_ivf_sql(k: int = 5, dim: int = 64, n_cells: int = 16, n_probe: int = 4,
                probe_below: int = 20) -> str:
    cd = _dot_chain("a.unit[{i}]", "c.centroid[{i}]", dim)
    cos = _dot_chain("pu.unit[{i}]", "cu.unit[{i}]", dim)
    return f"""WITH {_unit_cte(dim)},
cents AS (
  SELECT vec_id AS cell_id, unit AS centroid FROM unitv
  ORDER BY CAST(concat('0x', substr(sha256(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
  LIMIT {n_cells}),
ca0 AS (
  SELECT a.vec_id, c.cell_id, {cd} AS cd,
         row_number() OVER (PARTITION BY a.vec_id ORDER BY {cd} DESC, c.cell_id ASC) AS r
  FROM unitv a CROSS JOIN cents c),
ca AS (SELECT vec_id, cell_id FROM ca0 WHERE r = 1),
pa AS (SELECT vec_id AS probe_id, cell_id FROM ca0 WHERE r <= {n_probe} AND vec_id < {probe_below}),
cand AS (
  SELECT DISTINCT pa.probe_id, ca.vec_id
  FROM pa JOIN ca USING (cell_id)
  WHERE pa.probe_id != ca.vec_id),
sims AS (
  SELECT c.probe_id, c.vec_id, round({cos}, 6) AS cosine
  FROM cand c
  JOIN unitv pu ON c.probe_id = pu.vec_id
  JOIN unitv cu ON c.vec_id = cu.vec_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC) AS rank FROM sims)
SELECT probe_id, vec_id, cosine, rank FROM rk WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# Portable MinHash-LSH band keys as a reusable CTE chain (twin of
# functions/hashing.minhash_signature(fast=False) + lsh_band_keys): one
# sha-derived base hash per shingle, affine permutations mod 2^61-1,
# per-band slice hash. Used by the minhash_lsh_portable query AND the
# end-to-end pipeline oracle below.
# ---------------------------------------------------------------------------

_H64_SQL = "CAST(concat('0x', substr(sha256({x}), 1, 15)) AS BIGINT)"


def minhash_keys_cte(cfg) -> str:
    from identity_matching_spark.functions.hashing import MINHASH_P, minhash_coeffs

    rpb = cfg.lsh_rows_per_band
    coeffs = minhash_coeffs(cfg.minhash_perms)
    sig_items = ",\n      ".join(
        f"list_min([(h * {a} + {b}) % {MINHASH_P} for h in hs])" for a, b in coeffs
    )
    band_items = ",\n      ".join(
        "concat('mh', {b}, ':', CAST({h} AS VARCHAR))".format(
            b=b,
            h=_H64_SQL.format(x=f"array_to_string(sig[{b*rpb+1}:{b*rpb+rpb}], ',')"),
        )
        for b in range(cfg.lsh_bands)
    )
    k = cfg.shingle_words
    return f"""
mh AS (
  SELECT record_id, norm_content, string_split(norm_content, ' ') AS words FROM records
),
mh_sh AS (
  SELECT record_id,
    CASE WHEN len(words) >= {k}
      THEN list_distinct([array_to_string(words[i:i+{k - 1}], ' ') for i in range(1, len(words)-{k - 2})])
      ELSE [norm_content] END AS shingles
  FROM mh
),
mh_bh AS (
  SELECT record_id, [{_H64_SQL.format(x='s')} & 2147483647 for s in shingles] AS hs FROM mh_sh
),
sig_t AS (
  SELECT record_id, [{sig_items}] AS sig FROM mh_bh
),
mh_keys AS (
  SELECT record_id, unnest([{band_items}]) AS blocking_key FROM sig_t
)"""


def minhash_keys_fast_cte(cfg) -> str:
    """Twin of the PRODUCTION minhash_lsh blocking family
    (functions/hashing with fast=True, i.e. Spark xxhash64): identical
    band structure to ``minhash_keys_cte`` but both hash tiers run
    through the pure-SQL XXH64 machine (oracle_xxh.py). Emits
    ``mh_keys(record_id, blocking_key)``. Needs WITH RECURSIVE."""
    from identity_matching_spark.functions.hashing import MINHASH_P, minhash_coeffs
    from identity_matching_spark.oracle_xxh import xxh64_machine_cte

    rpb = cfg.lsh_rows_per_band
    coeffs = minhash_coeffs(cfg.minhash_perms)
    sig_items = ",\n      ".join(
        f"list_min([(h * {a} + {b}) % {MINHASH_P} for h in hs])" for a, b in coeffs
    )
    band_structs = ",\n      ".join(
        f"struct_pack(b := {b}, t := array_to_string(sig[{b * rpb + 1}:{b * rpb + rpb}], ','))"
        for b in range(cfg.lsh_bands)
    )
    k = cfg.shingle_words
    return f"""
mh AS (
  SELECT record_id, norm_content, string_split(norm_content, ' ') AS words FROM records
),
mh_sh AS (
  SELECT record_id,
    CASE WHEN len(words) >= {k}
      THEN list_distinct([array_to_string(words[i:i+{k - 1}], ' ') for i in range(1, len(words)-{k - 2})])
      ELSE [norm_content] END AS shingles
  FROM mh
),
mh_strs AS (SELECT DISTINCT unnest(shingles) AS s FROM mh_sh),
{xxh64_machine_cte('mx', 'mh_strs').lstrip(', ').lstrip()},
mh_bh AS (
  SELECT e.record_id, list(CAST(x.h64u % 2147483648 AS BIGINT)) AS hs
  FROM (SELECT record_id, unnest(shingles) AS s FROM mh_sh) e
  JOIN mx_out x USING (s)
  GROUP BY e.record_id
),
sig_t AS (SELECT record_id, [{sig_items}] AS sig FROM mh_bh),
mh_bs AS (SELECT record_id, unnest([{band_structs}]) AS bb FROM sig_t),
mh_bf AS (SELECT record_id, bb.b AS b, bb.t AS s FROM mh_bs),
mh_bstrs AS (SELECT DISTINCT s FROM mh_bf),
{xxh64_machine_cte('mb', 'mh_bstrs').lstrip(', ').lstrip()},
mh_keys AS (
  SELECT f.record_id, concat('mh', f.b, ':', CAST(x.h64 AS VARCHAR)) AS blocking_key
  FROM mh_bf f JOIN mb_out x USING (s))"""


def production_pipeline_clusters_sql(cfg) -> str:
    """End-to-end oracle for the DEFAULT-config lifecycle — the
    ``pipeline_full`` query (previously rows-only): all six blocking
    families with the PRODUCTION hash tier (xxhash64 MinHash bands via
    the SQL XXH64 machine), full comparator/decision table, match edges,
    recursive-CTE connected components with singletons.

    Validity note: the production config carries pair-explosion guards
    (max_block_size / identity-star / name-family sub-salt caps) this
    uncapped twin does not model. Identity-family star fallbacks preserve
    connectivity (every star edge carries the strong-identity flag, so it
    scores over the cluster threshold) and therefore the CLUSTER output
    compared here; the non-identity caps simply never trigger at the
    driver gate's sf0.01 block sizes (block_stats is empty of capped
    actions there — guard behavior itself is pytest-covered). Fuzzy
    comparators are on in the production config but never feed
    score/edges, so clusters are unaffected."""
    # MATERIALIZED: keys_all is joined against itself and scored feeds two
    # sym branches — without the hint DuckDB inlines the whole upstream
    # chain (incl. the XXH64 machines) once per reference (~4x; measured
    # 147 s -> ~40 s on the sf0.01 gate).
    keys_all = f"""
keys_all AS MATERIALIZED (
  SELECT record_id, blocking_key FROM keys
  UNION ALL
  SELECT r.record_id,
         'sdx:' || r.lang_norm || '|' || p.soundex_stem || '|' || CAST(r.size_bucket AS VARCHAR)
  FROM records r JOIN phon p USING (record_id)
  UNION ALL
  SELECT record_id, blocking_key FROM mh_keys
),
pairs AS (
  SELECT DISTINCT l.record_id AS left_id, r.record_id AS right_id
  FROM keys_all l JOIN keys_all r
    ON l.blocking_key = r.blocking_key AND l.record_id < r.record_id
)"""
    return (
        "WITH RECURSIVE "
        + ",".join(
            [
                FILES_CTE,
                RECORDS_CTE,
                KEYS_CTE,
                _phonetic_cte(),
                minhash_keys_fast_cte(cfg),
                keys_all,
                SCORED_PAIRS_CTE,
            ]
        )
        + f""",
edges AS MATERIALIZED (SELECT left_id, right_id FROM scored WHERE score >= {cfg.cluster_threshold}),
sym AS (
  SELECT left_id AS s, right_id AS d FROM edges
  UNION ALL SELECT right_id, left_id FROM edges
),
walk(node, front) AS (
  SELECT record_id, record_id FROM records
  UNION
  SELECT w.node, e.d FROM walk w JOIN sym e ON w.front = e.s
)
SELECT node AS record_id, min(front) AS cluster_id FROM walk GROUP BY node"""
    )


def portable_pipeline_clusters_sql(cfg) -> str:
    """End-to-end oracle for the flagship lifecycle (VERDICT r2 #1):
    every blocking family in its portable-hash form — 4 SQL families +
    soundex (phonetic CTE twin) + portable MinHash bands — then the full
    comparator/decision table, match edges at cluster_threshold, and
    recursive-CTE connected components with singletons. Value-exact twin
    of run_pipeline(files, PORTABLE_PIPELINE_CONFIG).clusters
    (ref lifecycle: IdentityMatching.java:80-137 + MDM clustering)."""
    keys_all = f"""
keys_all AS (
  SELECT record_id, blocking_key FROM keys
  UNION ALL
  SELECT r.record_id,
         'sdx:' || r.lang_norm || '|' || p.soundex_stem || '|' || CAST(r.size_bucket AS VARCHAR)
  FROM records r JOIN phon p USING (record_id)
  UNION ALL
  SELECT record_id, blocking_key FROM mh_keys
),
pairs AS (
  SELECT DISTINCT l.record_id AS left_id, r.record_id AS right_id
  FROM keys_all l JOIN keys_all r
    ON l.blocking_key = r.blocking_key AND l.record_id < r.record_id
)"""
    return (
        "WITH RECURSIVE "
        + ",".join(
            [
                FILES_CTE,
                RECORDS_CTE,
                KEYS_CTE,
                _phonetic_cte(),
                minhash_keys_cte(cfg),
                keys_all,
                SCORED_PAIRS_CTE,
            ]
        )
        + f""",
edges AS (SELECT left_id, right_id FROM scored WHERE score >= {cfg.cluster_threshold}),
sym AS (
  SELECT left_id AS s, right_id AS d FROM edges
  UNION ALL SELECT right_id, left_id FROM edges
),
walk(node, front) AS (
  SELECT record_id, record_id FROM records
  UNION
  SELECT w.node, e.d FROM walk w JOIN sym e ON w.front = e.s
)
SELECT node AS record_id, min(front) AS cluster_id FROM walk GROUP BY node"""
    )


def match_messages_sql() -> str:
    """A3 twin: per-pair fired-flag messages, exploded to scalar rows.
    Generated from the same flag->message spec as the Spark side
    (operators/compare.MATCH_MESSAGES) so the two cannot drift."""
    from identity_matching_spark.operators.compare import MATCH_MESSAGES

    items = ",\n      ".join(
        f"CASE WHEN {name} THEN '{msg}' END" for name, msg in MATCH_MESSAGES
    )
    return (
        PRELUDE_SCORED
        + f""" SELECT left_id, right_id,
      unnest(list_filter([{items}], x -> x IS NOT NULL)) AS message
    FROM flagged"""
    )


def sessionize_sql(gap_seconds: int, closed_only: bool = False) -> str:
    """Gaps-and-islands twin of streaming/sessions.py (integer-µs gap
    compare, DECIMAL value sum — see that module's determinism notes).
    ``closed_only`` drops each user's final open session: the exact set
    the append-mode stateful streaming operator emits."""
    gap_us = int(gap_seconds) * 1_000_000
    qualify = (
        "QUALIFY session_idx < max(session_idx) OVER (PARTITION BY user_id)"
        if closed_only
        else ""
    )
    idx = "" if closed_only else "session_idx,"
    return f"""WITH e AS (
  SELECT user_id, ts, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
s AS (
  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us} THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM e)
SELECT user_id, {idx} min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_idx
{qualify}"""
