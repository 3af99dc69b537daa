"""Watermarked event-time windowed aggregation (Structured Streaming).

The streaming twin of :func:`..operators.relational.windowed_event_counts`:
``readStream → withWatermark → groupBy(window, event_type) → append sink``.
In append mode a window emits exactly once — when the watermark
(``max(event time) − delay``) passes its end — so late events inside the
delay are still counted and events later than the delay are dropped; the
state store holds only windows newer than the watermark, which is what
bounds state at unbounded-stream scale (the brief's "watermarks + windowed
aggs for late data").

Batch parity contract (tested): after an AvailableNow run over a static
input, the emitted rows equal the batch aggregation restricted to windows
whose end ≤ final watermark — append mode withholds still-open windows by
design (they emit on the next trigger once later data advances the
watermark).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..schemas import EVENTS_SCHEMA


def run_windowed_counts_streaming(spark: SparkSession, input_path: str,
                                  output_path: str, checkpoint_path: str,
                                  delay: str = "2 hours",
                                  window: str = "1 hour") -> None:
    """Consume available event files, aggregate per (1h window, type) with
    a late-data watermark, append closed windows to parquet, stop. Same
    checkpoint ⇒ re-runs only process new files and never re-emit a
    closed window."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 16)
              .parquet(input_path))
    agg = (stream
           .withWatermark("ts", delay)
           .groupBy(F.window("ts", window), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                         .cast("double"), 6).alias("sum_value"))
           .select(F.col("window.start").alias("win_start"),
                   "event_type", "n_events", "sum_value"))
    q = (agg.writeStream
         .outputMode("append")   # emit each window exactly once, on close
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
