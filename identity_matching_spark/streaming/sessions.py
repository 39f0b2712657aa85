"""Session windows over the event stream (gaps-and-islands + stateful
streaming).

The reference has no session concept (SURVEY.md §2.9 — batch +
subscription-driven); this is part of the training-data-pipeline surface:
user activity sessionization is the canonical custom stateful operator,
and Spark expresses it two ways, both implemented here:

* ``sessionize_events`` — batch gaps-and-islands: one window pass marks
  session starts (gap to the previous event > threshold), a running sum
  numbers sessions, then a groupBy rolls each session up. At scale this
  is ONE exchange total: the window hash-partitions on ``user_id`` and
  the (user_id, session_idx) aggregation is satisfied by that same
  partitioning (HashPartitioning on a subset of the grouping keys), so
  Catalyst inserts no second shuffle.
* ``closed_sessions_stream`` — the streaming twin via
  ``applyInPandasWithState``: per-user state carries the open session
  across micro-batches; a session is EMITTED (append mode) only when a
  later event from the same user arrives beyond the gap, i.e. exactly
  the sessions the batch version closes before each user's last one.
  That makes the streaming operator oracle-checkable: closed sessions ==
  all gaps-and-islands sessions except each user's final (still-open)
  one.

Determinism notes: the batch gap test is native timestamp-minus-
timestamp day-time-interval arithmetic (integer-µs under the hood, no
floats, no session-timezone dependence — works identically on TIMESTAMP
and TIMESTAMP_NTZ, and the driver's parquet reads as NTZ); the stateful
handler and the DuckDB twin compare raw parquet microseconds, the same
integers. ``total_value`` accumulates in integer cents inside the
stateful handler and as DECIMAL(18,6) in batch/SQL, so the emitted
doubles are bit-identical across all three engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 43200  # 12 h; the synthetic corpus has ~7.7 h median per-user gaps

_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp_ntz, session_end timestamp_ntz, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, cents bigint"


def sessionize_events(
    events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """(event_id, ts, user_id, value, ...) -> one row per session.

    Output: (user_id, session_idx, session_start, session_end, n_events,
    total_value), session_idx 1-based per user in time order.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    is_start = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > gap), 1
    ).otherwise(0)
    sessions = events.withColumn(
        "session_idx",
        F.sum(is_start)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )


def _session_handler(gap_seconds: int):
    gap_us = int(gap_seconds) * 1_000_000

    def handle(key, pdf_iter, state):
        import pandas as pd

        user_id = int(key[0])
        parts = [pdf[["ts", "event_id", "value"]] for pdf in pdf_iter]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(["ts", "event_id"])
        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us = last_us = None
            n = cents = 0
        closed = []
        for ts, _eid, val in batch.itertuples(index=False):
            us = ts.value // 1000  # pandas ns -> µs, exact (parquet is µs)
            c = int(round(float(val) * 100))
            if start_us is None:
                start_us, last_us, n, cents = us, us, 1, c
            elif us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, cents))
                start_us, last_us, n, cents = us, us, 1, c
            else:
                last_us, n, cents = us, n + 1, cents + c
        state.update((int(start_us), int(last_us), int(n), int(cents)))
        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "start_us", "last_us", "n_events", "cents"]
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"].astype("int64"),
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n_events"].astype("int64"),
                    "total_value": out["cents"] / 100.0,
                }
            )

    return handle


def closed_sessions(
    events_stream: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """Apply the stateful sessionizer to ANY streaming events relation
    (columns ts/event_id/user_id/value) — the transport-agnostic core.
    Returns the unstarted streaming DataFrame of CLOSED sessions (append
    mode); callers pick sink + trigger. Works over the file transport
    (``closed_sessions_stream``) and the unbounded ``rate-micro-batch``
    generator (``tests/test_stream_sources.py``) identically."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_handler(gap_seconds),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def closed_sessions_stream(
    spark: SparkSession,
    events_path: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful-streaming sessionization, driven to completion.

    File source -> groupBy(user_id).applyInPandasWithState (append mode,
    per-user open-session state) -> memory sink. Emits every session that
    CLOSED (a later event arrived past the gap); each user's final session
    stays in state, exactly as it would on an unbounded stream. With
    ``max_files_per_trigger=1`` a multi-file directory exercises real
    cross-micro-batch state carryover (tests do this).
    """
    import os
    import uuid

    static = spark.read.parquet(events_path)
    reader = spark.readStream.schema(static.schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if events_path.endswith(".parquet"):
        base, fname = os.path.dirname(events_path), os.path.basename(events_path)
        stream = reader.option("pathGlobFilter", fname).load(base)
    else:
        stream = reader.load(events_path)

    sessions = closed_sessions(stream, gap_seconds)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = sessions.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
