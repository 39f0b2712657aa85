"""Deterministic synthetic source-code corpus (the ``files`` table).

Generates the BASELINE.json ``input_hint`` shape —
``files(repo, path, commit, lang, content)`` — plus a hidden
``entity_id`` used only to derive labeled evaluation pairs (FIXTURES.md
§1-2). Mirrors the reference's fixture strategy (sample-data patients
with controlled attribute completeness, DataInitializer.java:42-84) as
planted duplicate clusters with controlled perturbations:

  copy   — identical content, different repo       (exact dup; MRN analog)
  ws     — whitespace-only edit                    (norm-identical; SSN analog)
  note   — appended comment line                   (near dup)
  rename — identifier renamed throughout           (fuzzy dup; shape/passport analog)
  move   — same content, different path            (move/rename)

Everything is Column-expression generated from ``spark.range`` with
hash-derived pseudo-randomness (seed folded into every hash), so output
is bit-identical at any partitioning/parallelism and generation scales
linearly on a cluster — no driver-side loops, no Python RNG per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

_VOCAB = [
    "spark", "join", "filter", "merge", "table", "scan", "query", "index",
    "batch", "stream", "window", "sort", "group", "agg", "row", "column",
    "key", "value", "data", "part", "order", "line", "hash", "cast",
    "read", "write", "cache", "plan", "stage", "task", "shuffle", "limit",
]
_LANGS = [("python", "py"), ("python", "py"), ("java", "java"), ("go", "go"),
          ("rust", "rs"), ("javascript", "js"), ("python", "py"), ("cpp", "cc")]
_DIR1 = ["src", "lib", "core", "pkg", "app", "internal", "common", "util"]
_DIR2 = ["io", "net", "db", "api", "ops", "m", "x", "engine"]
_STEMS = ["parser", "loader", "runner", "worker", "client", "server",
          "config", "utils", "models", "index", "main", "codec"]


def _h(*cols: Column | str | int) -> Column:
    """Deterministic non-negative 60-bit hash of the given parts + seed."""
    parts = [F.lit(SEED).cast("string")]
    for c in cols:
        parts.append(F.lit(c).cast("string") if isinstance(c, (str, int)) else c.cast("string"))
    return F.conv(F.substring(F.sha2(F.concat_ws("|", *parts), 256), 1, 15), 16, 10).cast("long")


def _pick(arr: list[str], h: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (h % len(arr) + 1).cast("int"))


def generate_files(spark: SparkSession, n_entities: int, partitions: int | None = None) -> DataFrame:
    """Return files + entity_id. ~2.2 rows per entity on average."""
    ents = spark.range(0, n_entities, 1, partitions or spark.sparkContext.defaultParallelism)
    e = F.col("id")

    # Cluster size: 55% singleton, 30% size 2-3, 10% 4-7, 5% 8-24 (long tail).
    hs = _h(e, "size")
    size = (
        F.when(hs % 100 < 55, 1)
        .when(hs % 100 < 85, 2 + hs % 2)
        .when(hs % 100 < 95, 4 + hs % 4)
        .otherwise(8 + hs % 17)
    ).cast("int")

    n_words = (20 + _h(e, "nw") % 80).cast("int")
    lang_ix = (_h(e, "lang") % len(_LANGS)).cast("int")

    # Stems: zipf-ish head (a few hot names like real repos' main/index) +
    # a diverse tail — hot stems exercise the block guards/salting, the
    # tail keeps name-blocking selective.
    hs2 = _h(e, "sthot")
    stem = F.when(
        hs2 % 10 < 3, F.concat(_pick(_STEMS, hs2), F.lit("_"), (hs2 % 7).cast("string"))
    ).otherwise(
        F.concat(_pick(_STEMS, hs2), F.lit("_"), (_h(e, "st2") % 99991).cast("string"))
    )

    base = ents.select(
        e.alias("entity_id"),
        size.alias("csize"),
        n_words.alias("n_words"),
        _pick([l for l, _ in _LANGS], _h(e, "lang")).alias("lang"),
        _pick([x for _, x in _LANGS], _h(e, "lang")).alias("ext"),
        _pick(_DIR1, _h(e, "d1")).alias("dir1"),
        _pick(_DIR2, _h(e, "d2")).alias("dir2"),
        stem.alias("stem"),
    )

    # Base content: common keywords mixed with entity-specific identifier
    # tokens (the way real code shares keywords but has unique symbols) —
    # shingles are entity-distinctive, so LSH collides for true near-dups,
    # not the whole corpus. 8 words per line.
    def word_at(i):
        hw = _h(F.col("entity_id"), i)
        ident = F.concat(F.lit("id"), (_h(F.col("entity_id"), i, "t") % 50000).cast("string"))
        return F.when(hw % 10 < 6, _pick(_VOCAB, hw)).otherwise(ident)

    words = F.transform(F.sequence(F.lit(0), F.col("n_words") - 1), word_at)
    n_lines = F.ceil(F.col("n_words") / 8).cast("int")
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda li: F.array_join(F.slice(words, li * 8 + 1, 8), " "),
        ),
        "\n",
    )
    base = base.withColumn("base_content", content)

    # Explode members; member 0 is the original, others get a perturbation
    # class from a deterministic hash.
    mem = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("csize") - 1)).alias("m")
    )
    hm = _h(F.col("entity_id"), F.col("m"), "pert")
    pert = (
        F.when(F.col("m") == 0, "orig")
        .when(hm % 5 == 0, "copy")
        .when(hm % 5 == 1, "ws")
        .when(hm % 5 == 2, "note")
        .when(hm % 5 == 3, "rename")
        .otherwise("move")
    )
    mem = mem.withColumn("pert", pert)

    # Repo: Zipf-ish skew — 30% of rows land in 4 hot repos, rest spread.
    hr = _h(F.col("entity_id"), F.col("m"), "repo")
    repo_id = F.when(hr % 10 < 3, hr % 4).otherwise(4 + hr % 96)
    repo = F.concat(F.lit("org"), (repo_id % 12).cast("string"), F.lit("/proj"), repo_id.cast("string"))

    # Perturbed content (all Column ops; norm_ws collapses the 'ws' edit).
    first_word = F.element_at(F.split(F.col("base_content"), " "), 1)
    c = F.col("base_content")
    content_m = (
        F.when(F.col("pert") == "ws", F.regexp_replace(c, " ", "  "))
        .when(
            F.col("pert") == "note",
            F.concat(c, F.lit("\n# note "), (_h(F.col("entity_id"), F.col("m"), "n") % 1000).cast("string")),
        )
        .when(
            F.col("pert") == "rename",
            F.regexp_replace(
                c,
                F.concat(F.lit(r"\b"), first_word, F.lit(r"\b")),
                F.concat(first_word, F.lit("_v"), (F.col("m") % 7).cast("string")),
            ),
        )
        .otherwise(c)
    )

    # Path: movers get a different directory and may get a renamed stem.
    hp = _h(F.col("entity_id"), F.col("m"), "path")
    stem_m = F.when(
        (F.col("pert") == "move") & (hp % 2 == 0),
        F.concat(F.col("stem"), F.lit("_old")),
    ).otherwise(F.col("stem"))
    dir1_m = F.when(F.col("pert") == "move", _pick(_DIR1, hp)).otherwise(F.col("dir1"))
    path = F.concat_ws("/", dir1_m, F.col("dir2"), F.concat(stem_m, F.lit("."), F.col("ext")))

    commit = F.substring(F.sha2(F.concat_ws("|", F.lit(SEED).cast("string"),
                                             F.col("entity_id").cast("string"),
                                             F.col("m").cast("string"), F.lit("commit")), 256), 1, 40)

    return mem.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.col("lang"),
        content_m.alias("content"),
        F.col("entity_id"),
    ).dropDuplicates(["repo", "path", "commit"])


def labeled_pairs(records_with_entity: DataFrame, keyed: DataFrame) -> DataFrame:
    """Ground-truth pairs: same-blocking-key pairs labeled by entity equality
    (FIXTURES.md §2 — the only pairs the F1 metric is defined over)."""
    ids = records_with_entity.select("record_id", "entity_id")
    l = keyed.select(F.col("blocking_key"), F.col("record_id").alias("left_id"))
    r = keyed.select(F.col("blocking_key"), F.col("record_id").alias("right_id"))
    pairs = (
        l.join(r, "blocking_key")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", "blocking_key")
        .dropDuplicates(["left_id", "right_id"])
    )
    return (
        pairs.join(ids.withColumnRenamed("record_id", "left_id").withColumnRenamed("entity_id", "le"), "left_id")
        .join(ids.withColumnRenamed("record_id", "right_id").withColumnRenamed("entity_id", "re"), "right_id")
        .select("left_id", "right_id", "blocking_key", (F.col("le") == F.col("re")).alias("is_match"))
    )
