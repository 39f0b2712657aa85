"""Transitive clustering: match edges -> entity clusters.

The reference's MDM subsystem links source records under golden resources
transitively (MdmConfig.java:22-37; verdict map mdm-rules.json:43-46). At
corpus scale the equivalent is connected components over the match-edge
DataFrame. We implement the **alternating large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — each operation is a groupBy/min + join, i.e. pure shuffles
Catalyst can plan; converges in O(log n) rounds on real graphs.

* Deterministic cluster ids: the component representative is the MIN
  record_id (string order), so reruns and resumes produce identical ids.
* Per-iteration materialization truncates lineage (a must for any
  iterative DataFrame loop): ``localCheckpoint`` when no
  ``config.checkpoint_dir`` is set, else durable parquet snapshots
  ``cc_iter_NNN`` — the resume path (north_rule: resumable from
  snapshot) restarts from the last complete iteration
  (tests/test_cluster_props.py::test_cc_durable_checkpoint_resume).
* Convergence check piggybacks on the same job that materializes the
  iteration (count of changed labels).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.config import MatchConfig


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edges as (src>dst) ordered pairs, self-loops dropped."""
    e = edges.select(
        F.greatest("left_id", "right_id").alias("src"),
        F.least("left_id", "right_id").alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(neighborhood ∪ {u})."""
    nbrs = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least("src", "mn").alias("mn"))
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node, link all smaller-or-equal neighbors to the minimum."""
    pts = e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
    m = pts.groupBy("src").agg(F.min("dst").alias("mn"))
    out = (
        pts.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .unionByName(m.select(F.col("src"), F.col("mn").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return out


def _finish_in_driver(e: DataFrame) -> DataFrame:
    """Label the remaining (small) edge set with one collect + union-find.

    The alternating-star loop shrinks the edge graph geometrically; once
    it is a few hundred thousand rows, each further distributed iteration
    is ~fixed scheduler/AQE latency over a few MB — driver-phase overhead
    that a real cluster pays too and that does not scale with executors.
    Gated by ``config.cc_driver_finish_edges`` and used only on the
    ephemeral (localCheckpoint) path; durable checkpointed runs keep the
    pure distributed loop so crash-resume snapshots stay iteration-exact.

    Union-find with min-id-as-root + path compression: the component
    representative is the MIN record_id in string order — identical ids
    to the distributed extraction, verified by
    tests/test_cluster_props.py::test_driver_finish_equivalence.
    """
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    is_long = e.schema["src"].dataType.typeName() in ("long", "integer")
    # Arrow collect: the edge relation leaves the JVM as two columnar
    # batches, not row objects — at the 2M-edge gate this is the
    # difference between a ~1 s and a ~20 s driver hop.
    pdf = e.select("src", "dst").toPandas()
    # Intern ids to dense ranks in sort order: min-rank union-find root ==
    # min-id root (didx = rank of record_id, so the long and string
    # regimes agree), and the hot loop runs on a flat int list instead of
    # an id->id dict — this collect+label is driver-fixed cost at every
    # cluster width.
    ids = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
    src = np.searchsorted(ids, pdf["src"].to_numpy()).tolist()
    dst = np.searchsorted(ids, pdf["dst"].to_numpy()).tolist()
    parent = list(range(len(ids)))

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != i:
            parent[i], i = root, parent[i]
        return root

    for a0, b0 in zip(src, dst):
        a, b = find(a0), find(b0)
        if a == b:
            continue
        if a < b:
            parent[b] = a
        else:
            parent[a] = b
    roots = np.fromiter((find(i) for i in range(len(ids))), dtype=np.int64)
    out = pd.DataFrame({"record_id": ids, "cluster_id": ids[roots]})
    schema = (
        "record_id long, cluster_id long"
        if is_long
        else "record_id string, cluster_id string"
    )
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame,
    config: MatchConfig | None = None,
    on_iteration=None,
) -> DataFrame:
    """edges(left_id,right_id) -> assignments(record_id, cluster_id).

    cluster_id = min record_id of the component. Nodes appearing only in
    no-edge isolation are the caller's concern (pipeline unions singletons).
    """
    config = config or MatchConfig()
    ckpt = config.checkpoint_dir

    def _sig(df: DataFrame) -> tuple:
        # One cheap aggregation instead of an exceptAll shuffle: the edge
        # set is stable iff (count, order-free hash-sum) are stable.
        row = df.agg(
            F.count("*").alias("n"),
            # decimal(38,0) accumulator: summing 64-bit hashes overflows
            # long under ANSI mode on any non-trivial edge set
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # With a checkpoint dir each iteration's edge set persists DURABLY
    # (parquet + _SUCCESS manifest per iteration) and lineage truncates by
    # reading it back — a crash resumes from the last complete iteration
    # instead of re-deriving from raw edges. Without one, localCheckpoint
    # gives the same lineage truncation ephemeral-only.
    spark = edges.sparkSession

    def _materialize(df: DataFrame, it: int) -> DataFrame:
        if ckpt is None:
            # LAZY local checkpoint: the _sig aggregation that follows is
            # the materializing action, so each iteration costs ONE
            # driver-synchronous job (checkpoint write + convergence
            # signature together) instead of two.
            return df.localCheckpoint(eager=False)
        path = os.path.join(ckpt, f"cc_iter_{it:03d}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    done: list[int] = []
    manifest = os.path.join(ckpt, "cc_manifest.json") if ckpt is not None else None
    if ckpt is not None:
        os.makedirs(ckpt, exist_ok=True)
        done = sorted(
            int(d.rsplit("_", 1)[-1])
            for d in os.listdir(ckpt)
            if d.startswith("cc_iter_")
            and os.path.exists(os.path.join(ckpt, d, "_SUCCESS"))
        )
    if done:
        # Resume safety (ADVICE r2): snapshots under this dir may belong to
        # a DIFFERENT edge set (same checkpoint_dir, new input). Validate
        # the manifest's edge-set fingerprint — the (count, order-free
        # hash-sum) signature of the canonical input edges — and discard
        # stale iterations instead of resuming the wrong graph.
        import json as _json
        import shutil as _shutil

        cur = _sig(_canonical_edges(edges))
        recorded = None
        if os.path.exists(manifest):
            with open(manifest) as fh:
                m = _json.load(fh)
            recorded = (m.get("n"), m.get("h"))
        if recorded != (cur[0], str(cur[1])):
            for d in os.listdir(ckpt):
                if d.startswith("cc_iter_"):
                    _shutil.rmtree(os.path.join(ckpt, d), ignore_errors=True)
            done = []
    if done:
        e = spark.read.parquet(os.path.join(ckpt, f"cc_iter_{done[-1]:03d}"))
        start_it = done[-1] + 1
    else:
        e = _materialize(_canonical_edges(edges), 0)
        start_it = 1
    sig = _sig(e)
    if ckpt is None and sig[0] <= config.cc_driver_finish_edges:
        return _finish_in_driver(e)
    if ckpt is not None and not done:
        # fresh run: record the iteration-0 (canonical input) fingerprint
        import json as _json

        with open(manifest, "w") as fh:
            _json.dump({"n": sig[0], "h": str(sig[1])}, fh)
    for it in range(start_it, start_it + config.cc_max_iterations):
        e2 = _materialize(_small_star(_large_star(e)), it)
        sig2 = _sig(e2)
        if on_iteration is not None:
            on_iteration(it, e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
        if ckpt is None and sig[0] <= config.cc_driver_finish_edges:
            # small enough: one collect replaces the remaining rounds
            return _finish_in_driver(e)
    # After convergence every edge points node -> component min.
    members = e.select(F.col("src").alias("record_id"), F.col("dst").alias("cluster_id"))
    reps = e.select(F.col("dst").alias("record_id"), F.col("dst").alias("cluster_id"))
    return members.unionByName(reps).groupBy("record_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def clusters_with_singletons(records: DataFrame, assignments: DataFrame) -> DataFrame:
    """All records; matched ones get their component id, rest self-clusters."""
    return (
        records.select("record_id")
        .join(assignments, "record_id", "left")
        .select(
            "record_id",
            F.coalesce("cluster_id", "record_id").alias("cluster_id"),
        )
    )


def update_clusters(
    old_clusters: DataFrame,
    new_edges: DataFrame,
    config: MatchConfig | None = None,
) -> DataFrame:
    """Incremental cluster maintenance: fold NEW match edges into an
    existing (record_id, cluster_id) assignment, re-running connected
    components ONLY on the components the new edges touch.

    The reference re-links incrementally as resources arrive (MDM
    subscription channels, MdmConfig.java:22-37) instead of re-running
    MDM over the store; this is the batch-scale analog. At 100 TB a
    daily delta touches a vanishing fraction of components — recomputing
    CC over 10^12 records to absorb 10^7 new edges is the wrong plan.

    Exactness: an old component is represented by its membership STAR
    (cluster_id is the min member's record_id, so the star edges are
    real record-record edges preserving exactly the old connectivity).
    CC over {new edges} ∪ {stars of touched components} therefore equals
    full-recompute CC restricted to touched nodes; untouched assignments
    pass through verbatim (every endpoint of a new edge is by definition
    in a touched component or brand-new). Equality with the from-scratch
    run is pytest-property-tested and oracle-checked end-to-end
    (clusters_incremental ≡ the full recursive-CTE CC twin).

    Scale shape: two slim semi/anti joins on cluster_id + one CC over the
    touched subgraph (star edges are O(touched members), not quadratic).
    New records without any edge are absent from the output — compose
    with clusters_with_singletons(all_records, ...) as usual.
    """
    # new_edges feeds BOTH the touched-node scan and the subgraph union; a
    # non-deterministic upstream would otherwise let the two passes disagree
    # (same two-pass hazard as with_dense_ids, ADVICE r4).
    new_edges = new_edges.select("left_id", "right_id").persist()
    touched_nodes = (
        new_edges.select(F.col("left_id").alias("record_id"))
        .unionByName(new_edges.select(F.col("right_id").alias("record_id")))
        .distinct()
    )
    touched = (
        old_clusters.join(touched_nodes, "record_id")
        .select("cluster_id")
        .distinct()
    )
    members = old_clusters.join(touched, "cluster_id")
    star = members.filter(F.col("record_id") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("left_id"),
        F.col("record_id").alias("right_id"),
    )
    sub = new_edges.unionByName(star)
    recomputed = connected_components(sub, config)
    untouched = old_clusters.join(touched, "cluster_id", "left_anti")
    return untouched.select("record_id", "cluster_id").unionByName(recomputed)
