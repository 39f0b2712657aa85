"""Session-window operator: batch gaps-and-islands semantics, the
single-exchange plan property, and the stateful-streaming twin's
cross-micro-batch state carryover."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from identity_matching_spark.streaming.sessions import (
    closed_sessions_stream,
    sessionize_events,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

# user 1: two sessions (10-min gap rule below uses 600s);
# user 2: one single-event session.
ROWS = [
    (1, T(1, 0), 1, "click", 1.25),
    (2, T(1, 5), 1, "view", 2.50),
    (3, T(1, 30), 1, "click", 4.00),  # 25 min > 10 min -> new session
    (4, T(1, 31), 1, "buy", 0.75),
    (5, T(2, 0), 2, "click", 9.99),
]


def test_sessionize_gaps_and_islands(spark):
    out = sessionize_events(spark.createDataFrame(ROWS, SCHEMA), gap_seconds=600)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    assert got == {
        (1, 1): (T(1, 0), T(1, 5), 2, 3.75),
        (1, 2): (T(1, 30), T(1, 31), 2, 4.75),
        (2, 1): (T(2, 0), T(2, 0), 1, 9.99),
    }


def test_sessionize_boundary_gap_stays_in_session(spark):
    rows = [(1, T(1, 0), 1, "a", 1.0), (2, T(1, 10), 1, "b", 1.0)]
    out = sessionize_events(spark.createDataFrame(rows, SCHEMA), gap_seconds=600)
    assert out.count() == 1  # exactly-600s gap is NOT a new session (strict >)


def test_sessionize_single_exchange(spark):
    """Window partitioning on user_id must also satisfy the
    (user_id, session_idx) rollup — one shuffle total."""
    out = sessionize_events(spark.createDataFrame(ROWS, SCHEMA), gap_seconds=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_stream_emits_closed_sessions_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the open session from
    batch 1 must close when batch 2's later event arrives, and each
    user's final session must stay in state (not emitted)."""
    import shutil

    src = str(tmp_path / "ev")
    os.makedirs(src)
    batch1 = [r for r in ROWS if r[0] <= 2]  # user 1 session 1 only
    batch2 = [r for r in ROWS if r[0] > 2]
    # Copy each batch's part file under a CONTROLLED name + mtime: the file
    # source drains oldest-mtime-first, and part-file UUID names say
    # nothing about logical order.
    for i, batch in enumerate((batch1, batch2)):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dst = os.path.join(src, f"batch{i}.parquet")
        shutil.copyfile(os.path.join(stage, part), dst)
        os.utime(dst, (1000 + i * 100, 1000 + i * 100))

    got = closed_sessions_stream(
        spark, src, gap_seconds=600, max_files_per_trigger=1
    )
    rows = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["total_value"])
        for r in got.collect()
    }
    # only user 1's FIRST session closed (its second session and user 2's
    # single session are still open at end-of-stream)
    assert rows == {(1, T(1, 0)): (T(1, 5), 2, 3.75)}


def test_stream_matches_batch_closed_set(spark, sf_dir):
    """On the driver corpus, streaming output == batch sessions minus each
    user's final (open) one — the property the DuckDB oracle encodes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    streamed = closed_sessions_stream(spark, f"{sf_dir}/events.parquet")
    batch = sessionize_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    closed = (
        batch.withColumn(
            "last_idx", F.max("session_idx").over(Window.partitionBy("user_id"))
        )
        .where(F.col("session_idx") < F.col("last_idx"))
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    a = sorted(streamed.collect(), key=key)
    b = sorted(closed.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
