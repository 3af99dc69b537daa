"""Streaming curation (extract + stateless quality gate) must produce
the SAME per-url verdicts as the batch pipeline on the same input,
regardless of how the feed is sliced into micro-batch runs."""

from docling_api_spark.config import ExtractConfig
from docling_api_spark.plans.pipeline import extract_df
from docling_api_spark.sources.pages import pages_from_documents
from docling_api_spark.streaming.curation import (quality_gate,
                                                  run_curation_streaming)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch_across_two_runs(spark, tmp_path):
    pages = pages_from_documents(spark, SF)
    inp = str(tmp_path / "pages_in")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    cfg = ExtractConfig(num_partitions=4)

    # run 1: half the corpus; run 2: the rest (state carried by ckpt)
    pages.where("length(url) % 2 = 0").write.mode("overwrite").parquet(inp)
    run_curation_streaming(spark, inp, out, ckpt, cfg)
    pages.where("length(url) % 2 = 1").write.mode("append").parquet(inp)
    run_curation_streaming(spark, inp, out, ckpt, cfg)

    streamed = {r["url"]: (r["keep"], r["drop_reason"])
                for r in spark.read.parquet(out).collect()}

    batch = quality_gate(extract_df(pages, cfg)).select(
        "url", "keep", "drop_reason")
    expected = {r["url"]: (r["keep"], r["drop_reason"])
                for r in batch.collect()}
    assert streamed == expected
    assert len(streamed) == 500
    # the gate actually discriminates on this corpus
    verdicts = {v for v, _ in streamed.values()}
    assert verdicts == {True, False}


def test_gate_reason_codes(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([
        Row(url="a", markdown=None),
        Row(url="b", markdown="tiny doc"),
        Row(url="c", markdown="the fast key order sort table scan merge "
                              "part window small hash scan join order of"),
    ])
    got = {r["url"]: (r["keep"], r["drop_reason"])
           for r in quality_gate(df).collect()}
    assert got["a"] == (False, "extract_error")
    assert got["b"] == (False, "too_short")
    assert got["c"] == (True, "")


def test_streaming_curation_query_idempotent_rerun(spark):
    """The driver-registered streaming query (r4): a second invocation
    in the same session reuses the checkpoint — no new files, no new
    batches — and returns the identical result set."""
    from docling_api_spark import queries as Q
    sf = "/root/testdata/sf0.001"
    first = Q.streaming_curation(spark, sf)
    n1 = first.count()
    kept1 = first.where("keep").count()
    second = Q.streaming_curation(spark, sf)
    assert second.count() == n1 == 500
    assert second.where("keep").count() == kept1
    assert second.schema == first.schema
