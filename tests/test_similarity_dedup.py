"""ANN operators (brute force vs LSH/IVF recall) and dedup family."""

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.operators.dedup import (
    dedup_exact,
    near_dup_pairs_minhash,
    near_dup_pairs_simhash,
)
from identity_matching_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _topk_sets(df, k_col="vec_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r["probe_id"], set()).add(r[k_col])
    return out


def test_ann_lsh_recall_vs_bruteforce(emb):
    probes = emb.filter(F.col("vec_id") < 15)
    exact = _topk_sets(cosine_topk_bruteforce(emb, probes, k=5))
    # testdata neighbors sit at cosine ~0.4 (theta ~66deg): expected recall
    # 1-(1-p^4)^8 with p = 1-theta/pi ~ 0.75 — assert comfortably above chance
    approx = _topk_sets(cosine_topk_lsh(emb, probes, k=5, n_bits=4, n_tables=8))
    recalls = [len(exact[p] & approx.get(p, set())) / len(exact[p]) for p in exact]
    assert sum(recalls) / len(recalls) >= 0.5


def test_ann_ivf_recall_vs_bruteforce(emb):
    probes = emb.filter(F.col("vec_id") < 15)
    exact = _topk_sets(cosine_topk_bruteforce(emb, probes, k=5))
    approx = _topk_sets(cosine_topk_ivf(emb, probes, k=5, n_cells=8, n_probe=4))
    recalls = [len(exact[p] & approx.get(p, set())) / len(exact[p]) for p in exact]
    assert sum(recalls) / len(recalls) >= 0.4


def test_bruteforce_topk_shape(emb):
    probes = emb.filter(F.col("vec_id") < 5)
    df = cosine_topk_bruteforce(emb, probes, k=3)
    rows = df.collect()
    assert len(rows) == 5 * 3
    for r in rows:
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_dedup_exact_with_planted_dups(spark, docs):
    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100000)
    d = docs.unionByName(dup)
    res = dedup_exact(d, "doc_id", "text")
    assert res.count() == docs.count()  # each planted dup collapses
    assert res.filter(F.col("n_dups") == 2).count() == 10
    # keeper is always the original (min id)
    assert res.filter(F.col("keep_id") >= 100000).count() == 0


def test_minhash_near_dup_finds_planted(spark, docs):
    # plant near-dups: replace one word occurrence
    dup = docs.limit(10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", r"\bthe\b", "thee").alias("text"),
    )
    d = docs.select("doc_id", "text").unionByName(dup)
    pairs = near_dup_pairs_minhash(d, "doc_id", "text", jaccard_threshold=0.35)
    planted = pairs.filter(
        (F.col("b") - F.col("a") == 100000) | (F.col("a") + 100000 == F.col("b"))
    )
    assert planted.count() >= 7  # high recall on near-identical texts


def test_simhash_near_dup_finds_planted(spark, docs):
    dup = docs.limit(10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", r"\bthe\b", "thee").alias("text"),
    )
    d = docs.select("doc_id", "text").unionByName(dup)
    pairs = near_dup_pairs_simhash(
        d, "doc_id", "text", max_hamming=10, prefix_bits=4
    )  # 16 bands: complete recall up to hamming 15 >= requested 10
    planted = pairs.filter(F.col("b") - F.col("a") == 100000)
    assert planted.count() >= 7


def test_near_dup_keeplist_collapses_planted(spark, docs):
    """Planted near-dups must collapse onto ONE keeper (the original,
    min-id) via pairs -> CC -> keeplist; untouched docs keep themselves."""
    from identity_matching_spark.operators.dedup import near_dup_keeplist

    base = docs.select("doc_id", "text")
    dup1 = base.limit(8).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", r"\bthe\b", "thee").alias("text"),
    )
    # second-degree copies: transitively reachable only through dup1
    dup2 = dup1.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    d = base.unionByName(dup1).unionByName(dup2)
    pairs = near_dup_pairs_minhash(d, "doc_id", "text", jaccard_threshold=0.35)
    keep = near_dup_keeplist(d, "doc_id", pairs)
    assert keep.count() == d.count()  # every row assigned
    rows = {r["doc_id"]: r["keep_id"] for r in keep.collect()}
    originals = [r["doc_id"] for r in base.limit(8).collect()]
    collapsed = sum(
        1 for o in originals
        if rows[o + 100000] == o and rows[o + 200000] == o
    )
    assert collapsed >= 6  # transitive collapse onto the min-id original
    # originals always keep themselves (min-id representative)
    assert all(rows[o] == o for o in originals)
    # a keep_id is always <= its member's id (min-of-component invariant)
    assert all(k <= i for i, k in rows.items())


def test_embedding_near_dup_finds_planted(spark, emb):
    """Planted exact-duplicate vectors collide in every RHP table and come
    back at cosine 1.0; ids are passed as dim (no driver .first() job)."""
    from identity_matching_spark.operators.dedup import near_dup_pairs_embedding

    base = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 50)
    dups = base.limit(6).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    d = base.unionByName(dups)
    pairs = near_dup_pairs_embedding(
        d, cosine_threshold=0.99, n_bits=4, n_tables=8, dim=64
    )
    got = {(r["a"], r["b"]): r["cosine"] for r in pairs.collect()}
    for r in dups.select("vec_id").collect():
        o = r["vec_id"] - 100000
        assert (o, r["vec_id"]) in got
        assert got[(o, r["vec_id"])] == pytest.approx(1.0, abs=1e-6)
    # nothing else in this corpus sits above 0.99
    assert len(got) == 6


def test_simhash_rejects_silent_recall_cap(spark, docs):
    import pytest

    with pytest.raises(ValueError, match="recall"):
        near_dup_pairs_simhash(docs, "doc_id", "text", max_hamming=10, prefix_bits=16)
    # explicit opt-in to probabilistic recall beyond bands-1 is allowed
    near_dup_pairs_simhash(
        docs.limit(5), "doc_id", "text", max_hamming=10, prefix_bits=16,
        allow_partial_recall=True,
    ).count()
