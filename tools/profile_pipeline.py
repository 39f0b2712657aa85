"""Phase-level profile of the headline pipeline (bench.py's timed window)
at one parallelism level, driving the REAL run_pipeline code path. Usage:

    taskset -c 0-15 python tools/profile_pipeline.py 16 [n_entities]

Prints per-phase wall: records persist, blocking pairs count, scoring
materialize (slim persist + lazy message hash), CC, singleton-union
count — so driver-phase overhead (VERDICT r2 "what's wrong #1") is
attacked with numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig
from identity_matching_spark.corpus import generate_files
from identity_matching_spark.session import build_session


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    import shutil
    shutil.rmtree("/tmp/ims_eventlog", ignore_errors=True)
    os.makedirs("/tmp/ims_eventlog", exist_ok=True)
    spark = build_session(
        "profile",
        cpus=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:///tmp/ims_eventlog",
        },
    )

    corpus_path = f"/tmp/ims_bench_corpus_{n_entities}.parquet"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_files(spark, n_entities).drop("entity_id").write.mode(
            "overwrite"
        ).parquet(corpus_path)
    files = spark.read.parquet(corpus_path)
    import bench

    bench.warmup(spark)

    from identity_matching_spark.plans.pipeline import run_pipeline

    t_all = time.time()
    res = run_pipeline(files, MatchConfig())

    t = time.time()
    n_rec = res.records.count()
    print(f"phase records_persist: {time.time()-t:.1f}s rows={n_rec}", flush=True)

    t = time.time()
    n_pairs = res.pairs.count()
    print(f"phase blocking_pairs: {time.time()-t:.1f}s pairs={n_pairs}", flush=True)

    t = time.time()
    n_scored = res.scored_pairs.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(F.concat_ws("\x1f", F.col("match_messages"))).cast("decimal(38,0)")
        ).alias("mh"),
    ).collect()[0]["n"]
    print(f"phase scoring: {time.time()-t:.1f}s scored={n_scored}", flush=True)

    t = time.time()
    n_assign = res.clusters.count()  # materializes CC + singleton union
    print(f"phase cc_clusters: {time.time()-t:.1f}s rows={n_assign}", flush=True)

    t = time.time()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    print(f"phase clusters_distinct: {time.time()-t:.1f}s clusters={n_clusters}", flush=True)

    print(f"TOTAL: {time.time()-t_all:.1f}s", flush=True)
    res.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
