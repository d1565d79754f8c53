"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the brief's prescribed mechanism for
operators Structured Streaming has no built-in for.

Semantics match the batch ``sessionize`` driver query: events of one
user belong to one session while consecutive gaps are <= 30 minutes
(strictly greater starts a new session). Within a micro-batch the
operator closes every session it can prove finished and emits it; the
trailing open session lives in the state store and is flushed by an
EVENT-TIME TIMEOUT once the watermark passes its gap horizon — so state
per user is O(1) and bounded by the watermark, never by stream length.

Scale: one shuffle on user_id (the state key); state-store entries are
(3 longs) per ACTIVE user in the horizon; skewed users cost one group's
pandas call per batch, not a growing buffer (events inside a batch are
reduced immediately)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
    T.StructField("n_events", T.IntegerType()),
])
_STATE = T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("last", T.LongType()),
    T.StructField("n", T.IntegerType()),
])


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """events stream (user_id, ts, ...) -> closed sessions
    (user_id, start_us, end_us, n_events)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        user = int(key[0])
        out = {"user_id": [], "start_us": [], "end_us": [], "n_events": []}

        def emit(s, e, n):
            out["user_id"].append(user)
            out["start_us"].append(int(s))
            out["end_us"].append(int(e))
            out["n_events"].append(int(n))

        if state.hasTimedOut:
            s0, l0, n0 = state.get
            emit(s0, l0, n0)
            state.remove()
        else:
            ts_parts = [
                (pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
                .to_numpy()
                for pdf in pdfs]
            ts = np.sort(np.concatenate(ts_parts)) if ts_parts else \
                np.empty(0, dtype=np.int64)
            if state.exists:
                s0, l0, n0 = state.get
            else:
                s0 = l0 = None
                n0 = 0
            if ts.size:
                # vectorized session split: a session boundary sits
                # wherever the gap to the previous event (including the
                # carried-over state's last event) exceeds the horizon
                prev = np.r_[l0 if l0 is not None else ts[0] - gap_us - 1,
                             ts[:-1]]
                starts = np.flatnonzero(ts - prev > gap_us)
                if s0 is not None:
                    # prefix before the first boundary continues the
                    # carried session; a boundary then closes it
                    k = int(starts[0]) if starts.size else ts.size
                    if k > 0:
                        l0 = int(ts[k - 1])
                        n0 = int(n0 + k)
                    if starts.size:
                        emit(s0, l0, n0)
                        s0 = None
                bounds = np.append(starts, ts.size)
                for i in range(max(starts.size - 1, 0)):
                    a, b = int(bounds[i]), int(bounds[i + 1])
                    emit(ts[a], ts[b - 1], b - a)
                if starts.size:  # last run becomes the open session
                    a = int(starts[-1])
                    s0, l0, n0 = int(ts[a]), int(ts[-1]), int(ts.size - a)
            if s0 is not None:
                state.update((int(s0), int(l0), int(n0)))
                # flush the open session when event time passes its gap
                state.setTimeoutTimestamp(l0 // 1000 + gap_minutes * 60_000)
        yield pd.DataFrame(out)

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_OUT, _STATE, "append",
                GroupStateTimeout.EventTimeTimeout))


def run_sessionize(spark, source_dir: str, out_dir: str,
                   checkpoint_dir: str, gap_minutes: int = 30,
                   watermark: str = "2 hours") -> None:
    """Drain available event files through the stateful sessionizer into
    a parquet sink of CLOSED sessions."""
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string, value double, session_hint int")
              .parquet(source_dir))
    q = (sessionize_stream(stream, gap_minutes, watermark)
         .writeStream.outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
