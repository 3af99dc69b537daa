"""Streaming exact dedup (applyInPandasWithState) must agree with the
batch dedup_exact canonical set when the feed arrives in doc_id order —
including state carry-over across separately-launched runs (a duplicate
whose canonical arrived in run 1 must stay silent in run 2)."""

from pyspark.sql import functions as F

from docling_api_spark.operators.dedup import dedup_exact
from docling_api_spark.streaming.dedup_stream import dedup_stream

SF = "/root/testdata/sf0.001"


def _run_stream(spark, schema, inp, out, ckpt):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1000).parquet(inp))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (dedup_stream(stream).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_streaming_dedup_matches_batch_across_two_runs(spark, tmp_path):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    split = docs.approxQuantile("doc_id", [0.5], 0)[0]
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "keep_out")
    ckpt = str(tmp_path / "ckpt")

    docs.where(f"doc_id <= {split}").write.mode("overwrite").parquet(inp)
    _run_stream(spark, docs.schema, inp, out, ckpt)
    docs.where(f"doc_id > {split}").write.mode("append").parquet(inp)
    _run_stream(spark, docs.schema, inp, out, ckpt)

    streamed = {(r.content_key, r.doc_id)
                for r in spark.read.parquet(out).collect()}

    batch = (dedup_exact(spark, SF)
             .where(F.col("doc_id") == F.col("canonical_id")))
    keys = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.md5("text").alias("content_key")))
    expected = {(r.content_key, r.doc_id)
                for r in batch.join(keys, "doc_id")
                .select("content_key", "doc_id").collect()}
    assert streamed == expected
    assert len(streamed) > 0
    # every duplicate was emitted exactly once (no re-emission in run 2)
    assert spark.read.parquet(out).count() == len(streamed)
