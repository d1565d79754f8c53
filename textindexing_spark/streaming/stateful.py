"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the brief's prescribed mechanism for
operators Structured Streaming has no built-in for.

Semantics match the batch ``sessionize`` driver query: events of one
user belong to one session while consecutive gaps are <= 30 minutes
(strictly greater starts a new session). A session is emitted as CLOSED
only once the event-time watermark has passed its gap horizon
(session_end + gap < watermark) — the same finalization rule Spark's
built-in ``session_window`` uses in append mode. Intra-batch gap
evidence alone is NOT enough to close a session: an out-of-order event
may still arrive in a later micro-batch (allowed while it is above the
watermark) and must merge into the run it belongs to, extending or
bridging sessions, never moving a session's end backwards. The state
store therefore carries ALL still-finalizable runs of a user (a small
sorted set of (start, last, n) triples), and an event-time timeout
flushes runs once the watermark passes them.

Scale: one shuffle on user_id (the state key); state-store entries are
O(watermark_horizon / gap) triples per ACTIVE user (runs are > gap
apart, so a 2 h horizon over a 30 min gap keeps <= ~5 runs), never
proportional to stream length; skewed users cost one vectorized pandas
call per batch (events are reduced to runs immediately, nothing
buffers)."""

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
    T.StructField("starts", T.ArrayType(T.LongType())),
    T.StructField("lasts", T.ArrayType(T.LongType())),
    T.StructField("ns", T.ArrayType(T.LongType())),
])


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """events stream (user_id, ts, ...) -> closed sessions
    (user_id, start_us, end_us, n_events)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60_000

    def fn(key, pdfs, state):
        import pandas as pd

        user = int(key[0])
        out = {"user_id": [], "start_us": [], "end_us": [], "n_events": []}
        wm_ms = int(state.getCurrentWatermarkMs())
        wm_us = wm_ms * 1000

        if state.exists:
            st = state.get
            starts = np.asarray(st[0], dtype=np.int64)
            lasts = np.asarray(st[1], dtype=np.int64)
            ns = np.asarray(st[2], dtype=np.int64)
        else:
            starts = lasts = ns = np.empty(0, dtype=np.int64)

        if not state.hasTimedOut:
            ts_parts = [
                (pd.to_datetime(pdf["ts"]).astype("int64") // 1000)
                .to_numpy()
                for pdf in pdfs]
            ts = np.concatenate(ts_parts) if ts_parts else \
                np.empty(0, dtype=np.int64)
            if ts.size:
                # merge carried runs and new events as one sorted item
                # list (an event is a width-0 run); a session boundary
                # sits wherever an item's start exceeds the running max
                # of previous items' ends by more than the gap — late
                # events bridge/extend runs instead of splitting them,
                # and an event nested inside a carried run can never
                # move its end backwards (reduceat max below)
                s_all = np.concatenate([starts, ts])
                l_all = np.concatenate([lasts, ts])
                n_all = np.concatenate([ns, np.ones(ts.size, np.int64)])
                order = np.argsort(s_all, kind="mergesort")
                s_all, l_all, n_all = s_all[order], l_all[order], \
                    n_all[order]
                cummax_last = np.maximum.accumulate(l_all)
                bounds = np.r_[0, np.flatnonzero(
                    s_all[1:] - cummax_last[:-1] > gap_us) + 1]
                starts = s_all[bounds]
                lasts = np.maximum.reduceat(l_all, bounds)
                ns = np.add.reduceat(n_all, bounds)

        # a run is provably finished only when the watermark passed its
        # gap horizon: no event that could still arrive may extend it
        closed = lasts + gap_us < wm_us
        for s, e, n in zip(starts[closed], lasts[closed], ns[closed]):
            out["user_id"].append(user)
            out["start_us"].append(int(s))
            out["end_us"].append(int(e))
            out["n_events"].append(int(n))
        keep = ~closed
        if keep.any():
            state.update((starts[keep].tolist(), lasts[keep].tolist(),
                          ns[keep].tolist()))
            # flush the earliest kept run when event time passes its gap
            # (timeout timestamps must sit strictly above the watermark)
            state.setTimeoutTimestamp(
                max(int(lasts[keep].min()) // 1000 + gap_ms, wm_ms + 1))
        elif state.exists:
            state.remove()
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
