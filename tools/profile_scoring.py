"""Sub-phase profile of the pipeline's scoring stage (the 138s/16-core
dominant phase per profile_pipeline). Usage:

    taskset -c 0-15 python tools/profile_scoring.py 16 [n_entities]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.corpus import generate_files
from identity_matching_spark.session import build_session


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = build_session("profile_scoring", cpus=cpus)

    corpus_path = f"/tmp/ims_bench_corpus_{n_entities}.parquet"
    files = spark.read.parquet(corpus_path)
    import bench

    bench.warmup(spark)

    from identity_matching_spark.operators.blocking import candidate_pairs
    from identity_matching_spark.operators.compare import (
        ATTR_COLS,
        PHONETIC_H64_COLS,
        comparator_flags,
        enrich_phonetic,
        jw_stem_table,
    )
    from identity_matching_spark.operators.grade import grade_pairs
    from identity_matching_spark.operators.normalize import normalize_files
    from identity_matching_spark.operators.validate import validation_gate

    config = MatchConfig()

    t = time.time()
    records = enrich_phonetic(validation_gate(normalize_files(files), config))
    records = records.persist(StorageLevel.MEMORY_AND_DISK)
    records.count()
    pairs = candidate_pairs(records, config).pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    print(f"setup(records+pairs): {time.time()-t:.1f}s pairs={n_pairs}", flush=True)

    # --- sub-phase 1: jw stem table (persist + count, as compare_pairs_fuzzy does)
    t = time.time()
    jwtab = jw_stem_table(pairs, records).persist(StorageLevel.MEMORY_AND_DISK)
    n_jw = jwtab.count()
    print(f"jwtab: {time.time()-t:.1f}s distinct_unequal_stem_pairs={n_jw}", flush=True)

    # --- sub-phase 2: attach both sides + flags, NO persist, count only
    cols = ATTR_COLS + PHONETIC_H64_COLS
    lhs = records.select([F.col(c).alias(f"l_{c}") for c in cols])
    rhs = records.select([F.col(c).alias(f"r_{c}") for c in cols])
    attached = (
        pairs.join(lhs, pairs.left_id == lhs.l_record_id, "inner")
        .join(rhs, pairs.right_id == rhs.r_record_id, "inner")
        .drop("l_record_id", "r_record_id")
    )
    t = time.time()
    attached.count()
    print(f"attach_count_nopersist: {time.time()-t:.1f}s", flush=True)

    # --- sub-phase 3: full fuzzy compare + grade WITHOUT messages, no persist, hash-agg
    from identity_matching_spark.operators.compare import compare_pairs_fuzzy

    flagged = compare_pairs_fuzzy(pairs, records, config)
    t = time.time()
    scored_nm = grade_pairs(flagged)
    scored_nm.agg(F.count("*")).collect()
    print(f"score_nomsg_nopersist: {time.time()-t:.1f}s", flush=True)

    # --- sub-phase 4: with messages, persist + count (the pipeline shape)
    t = time.time()
    scored = grade_pairs(flagged, with_messages=True).persist(StorageLevel.MEMORY_AND_DISK)
    scored.count()
    print(f"score_msg_persist_count: {time.time()-t:.1f}s", flush=True)

    # --- sub-phase 5: edges + CC input scan off the persisted scored
    t = time.time()
    edges = scored.filter(F.col("score") >= F.lit(config.cluster_threshold)).select(
        "left_id", "right_id"
    )
    ne = edges.count()
    print(f"edges_scan: {time.time()-t:.1f}s edges={ne}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
