"""Time the synchronous sub-steps of run_pipeline's CHAINED construction
(jwtab count job vs CC loop) to find where the chained flow loses time
vs the step-by-step phase sum. Usage:

    taskset -c 0-15 python tools/profile_chained.py 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.session import build_session


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    import shutil
    shutil.rmtree("/tmp/ims_eventlog", ignore_errors=True)
    os.makedirs("/tmp/ims_eventlog", exist_ok=True)
    spark = build_session(
        "profile_chained",
        cpus=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:///tmp/ims_eventlog",
        },
    )
    files = spark.read.parquet(f"/tmp/ims_bench_corpus_{n_entities}.parquet")
    import bench

    bench.warmup(spark)

    from identity_matching_spark.operators.blocking import candidate_pairs
    from identity_matching_spark.operators.cluster import (
        clusters_with_singletons,
        connected_components,
    )
    from identity_matching_spark.operators.compare import compare_pairs_fuzzy, enrich_phonetic
    from identity_matching_spark.operators.grade import grade_pairs
    from identity_matching_spark.operators.normalize import normalize_files
    from identity_matching_spark.operators.validate import validation_gate
    from identity_matching_spark.plans.pipeline import with_match_messages

    config = MatchConfig()
    t_all = time.time()

    t = time.time()
    records = enrich_phonetic(validation_gate(normalize_files(files), config))
    records = records.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = candidate_pairs(records, config).pairs.persist(StorageLevel.MEMORY_AND_DISK)
    # compare_pairs_fuzzy's internal jwtab.count() is the FIRST action: it
    # materializes records+keyed+pairs+jwtab in one chained job tree.
    flagged = compare_pairs_fuzzy(pairs, records, config)
    print(f"A construction->jwtab_count: {time.time()-t:.1f}s", flush=True)

    t = time.time()
    scored_slim = grade_pairs(flagged, with_messages=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges = scored_slim.filter(F.col("score") >= F.lit(config.cluster_threshold)).select(
        "left_id", "right_id"
    )
    iters = []
    assignments = connected_components(
        edges, config, on_iteration=lambda i, df: iters.append(i)
    )
    print(f"B cc_loop(sync, materializes slim): {time.time()-t:.1f}s iters={iters}", flush=True)

    t = time.time()
    scored = with_match_messages(scored_slim)
    n = scored.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(F.concat_ws("\x1f", F.col("match_messages"))).cast("decimal(38,0)")
        ).alias("mh"),
    ).collect()[0]["n"]
    print(f"C scored_agg: {time.time()-t:.1f}s n={n}", flush=True)

    t = time.time()
    clusters = clusters_with_singletons(records, assignments)
    nc = clusters.select("cluster_id").distinct().count()
    print(f"D clusters_distinct: {time.time()-t:.1f}s clusters={nc}", flush=True)

    print(f"TOTAL: {time.time()-t_all:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
