"""Run ONLY the scoring kernel (bench.run_scoring_kernel) once and print
its JSON — the fast inner loop for kernel-scaling iteration. Inputs are
the same cached parquet relations bench.py uses (built on first call).

    taskset -c 0-7 python tools/kernel_once.py 8 [n_entities]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/ims_bench_local")
    import bench
    from identity_matching_spark.session import build_session

    spark = build_session("kernel_once", cpus=cpus)
    bench.prepare_scoring_inputs(spark, n_entities)
    bench.warmup(spark)
    t0 = time.time()
    kwall, kpairs = bench.run_scoring_kernel(spark, n_entities)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "kernel_sec": round(kwall, 3),
                "kernel_pairs": kpairs,
                "kernel_pairs_per_sec": round(kpairs / kwall, 1),
                "total_sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
