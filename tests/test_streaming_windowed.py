"""Watermarked streaming windowed aggregation: append-mode emission equals
the batch aggregation restricted to windows closed by the final watermark,
and a checkpointed re-run emits newly closed windows without re-emitting."""

import datetime

from pyspark.sql import functions as F

from docling_api_spark.streaming.windowed import run_windowed_counts_streaming

SF = "/root/testdata/sf0.001"
DELAY = datetime.timedelta(hours=2)


def _batch_expected(spark, src):
    ev = spark.read.parquet(src)
    agg = (ev.groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                         .cast("double"), 6).alias("sum_value"))
           .select(F.col("window.start").alias("win_start"),
                   F.col("window.end").alias("win_end"),
                   "event_type", "n_events", "sum_value"))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - DELAY
    closed = agg.where(F.col("win_end") <= F.lit(wm)).drop("win_end")
    return sorted((str(r.win_start), r.event_type, r.n_events, r.sum_value)
                  for r in closed.collect())


def test_watermarked_stream_matches_batch_closed_windows(spark, tmp_path):
    inp = str(tmp_path / "events_in")
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    # first drop: everything except the last day of events
    cut = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(days=1)
    ev.where(F.col("ts") <= F.lit(cut)).repartition(4) \
        .write.mode("overwrite").parquet(inp)
    run_windowed_counts_streaming(spark, inp, out, ckpt, delay="2 hours")

    got1 = sorted((str(r.win_start), r.event_type, r.n_events, r.sum_value)
                  for r in spark.read.parquet(out).collect())
    assert got1 == _batch_expected(spark, inp)
    assert len(got1) > 0

    # late-arriving second drop advances the watermark: previously open
    # windows close and emit; nothing already emitted is re-emitted
    ev.where(F.col("ts") > F.lit(cut)).repartition(2) \
        .write.mode("append").parquet(inp)
    run_windowed_counts_streaming(spark, inp, out, ckpt, delay="2 hours")

    got2 = sorted((str(r.win_start), r.event_type, r.n_events, r.sum_value)
                  for r in spark.read.parquet(out).collect())
    assert len(got2) == len(set(got2)) and len(got2) > len(got1)
    # run-1 emissions closed >=2h before the cut and drop-2 events are all
    # after the cut, so no window is split across emissions: windows that
    # straddled the cut sat in state and combined with drop-2 events —
    # every run-2 emission must therefore equal the full batch aggregation
    full = {(str(r.win_start), r.event_type, r.n_events, r.sum_value)
            for r in spark.read.parquet(inp)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 6).alias("sum_value"))
            .select(F.col("window.start").alias("win_start"),
                    "event_type", "n_events", "sum_value").collect()}
    for row in got2:
        if row not in got1:
            assert row in full, row
