"""Watermarked streaming window aggregation over the events stream.

The batch twins of these (driver queries ``hourly_agg`` / ``sessionize``)
are checked against DuckDB; this module is the STREAMING execution of
the same logic — `readStream` -> event-time tumbling window with a
watermark for late data -> sink — per the Structured Streaming model
the brief prescribes (watermark bounds state; rows later than the
watermark are dropped instead of growing state forever).

Scale notes: windowed aggregation shuffles once on (window, event_type);
state lives in the state store keyed by the same tuple, sized by
(#windows inside the watermark horizon x #event types), independent of
stream length. `foreachBatch` sinks let the output land in any batch
writer (parquet/bucketed store) with exactly-once via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, session_hint int")


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling counts + value sums per event_type —
    streaming twin of the ``hourly_agg`` driver query. ``watermark``
    bounds how late an event may arrive and still update its window."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.unix_timestamp("w.start").alias("hour_ts"),
                    "event_type", "n", "sum_value"))


def run_windowed_counts(spark, source_dir: str, out_dir: str,
                        checkpoint_dir: str, window: str = "1 hour",
                        watermark: str = "2 hours") -> None:
    """Drain the currently-available event files through the watermarked
    window aggregation into a parquet sink (availableNow: the bulk pass
    of the same query that then keeps running on the live stream).

    Output mode is UPDATE with a keyed foreachBatch upsert — NOT complete
    mode, which would retain every window's state forever and ignore the
    watermark. In update mode the state store only holds windows inside
    the watermark horizon (late rows past it are dropped), and each
    micro-batch emits just the windows it changed; the sink merges those
    by (hour_ts, event_type), last write wins, so the sink converges to
    the batch answer while state stays bounded."""
    import os
    import shutil

    stream = (spark.readStream.schema(EVENTS_DDL).parquet(source_dir))
    agg = windowed_counts(stream, window, watermark)

    def merge_batch(df, _epoch) -> None:
        updates = df
        if os.path.isdir(out_dir):
            existing = df.sparkSession.read.parquet(out_dir)
            kept = existing.join(
                updates.select("hour_ts", "event_type"),
                ["hour_ts", "event_type"], "left_anti")
            merged = kept.unionByName(updates)
        else:
            merged = updates
        # write-then-swap: the tmp write materializes the lazy read of the
        # old sink before we delete it
        tmp = out_dir.rstrip("/") + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(merge_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
