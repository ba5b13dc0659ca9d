"""Sessionization — gap-based event sessions, batch and streaming forms.

North-star streaming extra (the reference has no streaming operators —
its host handles ingestion, SURVEY §1.1): assign events to sessions that
close after `gap` of user inactivity.

- `sessionize_batch`: pure window expressions (lag -> new-session flag ->
  running sum), SQL-expressible, oracle-checkable, one shuffle on user.
- `sessionize_stream`: the same semantics as a custom stateful streaming
  operator via `applyInPandasWithState` — per-user state carries the open
  session; sessions are emitted when the gap passes or the state times
  out. State size is O(active users), bounded by the timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    id_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """(user, session_id, session_start_us, session_end_us, n_events)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_us_col).asc(), F.col(id_col).asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_us_col)).over(w)
    new_s = F.when(
        prev.isNull() | (F.col(ts_us_col) - prev > gap_us), 1
    ).otherwise(0)
    with_sess = events.select(
        F.col(user_col),
        F.col(ts_us_col),
        F.col(id_col),
        F.sum(new_s).over(run).alias("session_id"),
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.min(ts_us_col).alias("session_start_us"),
        F.max(ts_us_col).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_us: int):
    import pandas as pd

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_us": [start],
                 "session_end_us": [last], "n_events": [n]}
            )
            return
        ts = sorted(
            int(t) for pdf in pdfs for t in pdf["ts_us"].tolist()
        )
        if not ts:
            return
        start, last, n = state.get if state.exists else (ts[0], ts[0], 0)
        out = {"user_id": [], "session_start_us": [], "session_end_us": [], "n_events": []}
        for t in ts:
            if t - last > gap_us and n > 0:
                out["user_id"].append(user_id)
                out["session_start_us"].append(start)
                out["session_end_us"].append(last)
                out["n_events"].append(n)
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_us // 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Streaming sessionization over a stream with (user_id, ts_us).
    Emits a row per CLOSED session (gap elapsed or state timeout)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )
