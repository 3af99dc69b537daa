"""Stateful-streaming sessionization (applyInPandasWithState) must agree
with the batch gap-and-islands SQL on the same events — including state
carry-over across separately-launched streaming runs (checkpoint resume)."""

import pandas as pd

from docling_api_spark.operators.relational import sessionize_events
from docling_api_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"


def _final_sessions(rows: pd.DataFrame) -> set:
    """Collapse provisional re-emissions: per (user, session_idx) keep
    the largest session (idx is stable; start/end can extend)."""
    best = {}
    for r in rows.itertuples():
        key = (int(r.user_id), int(r.session_idx))
        prev = best.get(key)
        if prev is None or r.n_events > prev.n_events:
            best[key] = r
    return {(k[0], v.session_start, v.session_end, int(v.n_events))
            for k, v in best.items()}


def _run_stream(spark, schema, inp, out, ckpt):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1000).parquet(inp))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (sessionize_stream(stream).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_stateful_matches_batch_across_two_runs(spark, tmp_path):
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("user_id", "ts", "event_id")
          .where("user_id < 12"))
    # two chronological halves -> the open-session state must carry over
    split = ev.approxQuantile("event_id", [0.5], 0)[0]
    inp = str(tmp_path / "ev_in")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "ckpt")

    ev.where(f"event_id <= {split}").write.mode("overwrite").parquet(inp)
    _run_stream(spark, ev.schema, inp, out, ckpt)
    ev.where(f"event_id > {split}").write.mode("append").parquet(inp)
    _run_stream(spark, ev.schema, inp, out, ckpt)

    streamed = _final_sessions(spark.read.parquet(out).toPandas())

    batch = sessionize_events(spark, SF).where("user_id < 12").toPandas()
    expected = {(int(r.user_id), r.session_start, r.session_end,
                 int(r.n_events)) for r in batch.itertuples()}
    assert streamed == expected
