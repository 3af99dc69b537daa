"""Multimodal plumbing (resize / frame-sample stubs) and the Structured
Streaming AvailableNow extraction variant."""

import hashlib

import pandas as pd
import pytest

from pyspark.sql import functions as F

from docling_api_spark.config import ExtractConfig
from docling_api_spark.operators.multimodal import (
    _AUDIO_CHUNK_SAMPLES, _FAKE_FRAME_BYTES, audio_chunks_df,
    resize_images_df, sample_frames_df)
from docling_api_spark.plans.pipeline import extract_df
from docling_api_spark.sources.pages import pages_from_documents
from docling_api_spark.streaming.availablenow import run_extraction_streaming

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))


def test_resize_fake_plumbing(spark, blobs):
    out = resize_images_df(blobs, out_w=128, out_h=96, fake=True).toPandas()
    ok = out[out.resize_error.isna()]
    assert len(ok) > 0
    assert (ok.out_w == 128).all() and (ok.out_h == 96).all()
    assert (ok.n_bytes_out > 0).all()


def test_resize_real_decoder_is_error_row_not_exception(spark, blobs):
    """The stub raises NotImplementedError inside, but the operator's
    contract is errors-are-rows (reference service.py:80 semantics)."""
    out = resize_images_df(blobs, fake=False).toPandas()
    assert (out.resize_error.str.startswith("decode_not_supported")).all()
    assert out.out_w.isna().all()


def test_frame_sample_fanout_deterministic(spark, blobs):
    out = sample_frames_df(blobs, every_k=2, fake=True).toPandas()
    # every blob here is < 4 KiB -> exactly one frame, idx 0
    src = blobs.toPandas()
    src = src[src.blob.map(lambda b: b is not None and len(b) > 0)]
    assert len(out) == len(src)
    assert (out.frame_idx == 0).all()
    expected = {int(r.doc_id): hashlib.md5(
        bytes(r.blob)[:_FAKE_FRAME_BYTES]).hexdigest()
        for r in src.itertuples()}
    got = dict(zip(out.doc_id.astype(int), out.frame_md5))
    assert got == expected


def test_audio_chunks_fanout_and_stats(spark):
    """Audio chunking plumbing: fan-out rows per fixed-size chunk with
    exact integer energy stats, computed identically driver-side."""
    import struct
    samples = [((i * 37) % 2001) - 1000 for i in range(2500)]
    blob = b"".join(struct.pack("<h", s) for s in samples)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [3], "blob": [blob]}))
    out = audio_chunks_df(df, fake=True).toPandas().sort_values("chunk_idx")
    assert list(out.chunk_idx) == [0, 1, 2]
    assert list(out.n_samples) == [_AUDIO_CHUNK_SAMPLES,
                                   _AUDIO_CHUNK_SAMPLES,
                                   2500 - 2 * _AUDIO_CHUNK_SAMPLES]
    for idx, row in enumerate(out.itertuples()):
        seg = samples[idx * _AUDIO_CHUNK_SAMPLES:
                      (idx + 1) * _AUDIO_CHUNK_SAMPLES]
        assert row.rms == sum(x * x for x in seg)
        assert row.peak == max(abs(x) for x in seg)


def test_audio_real_decoder_is_explicit_stub(spark):
    """The non-fake path fails loudly (NotImplementedError surfaces as a
    task failure) — no silent fake capability."""
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1],
                                             "blob": [b"\x01\x02" * 8]}))
    with pytest.raises(Exception):
        audio_chunks_df(df, fake=False).collect()


def test_frame_sample_every_k(spark):
    # one 10-frame blob, every_k=3 -> frames 0,3,6,9
    blob = bytes(range(256)) * (10 * _FAKE_FRAME_BYTES // 256)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "blob": [blob]}))
    out = sample_frames_df(df, every_k=3, fake=True).toPandas()
    assert sorted(out.frame_idx) == [0, 3, 6, 9]


def test_streaming_availablenow_matches_batch_and_resumes(spark, tmp_path):
    cfg = ExtractConfig(num_partitions=8)
    pages = pages_from_documents(spark, SF).limit(200).cache()
    inp = str(tmp_path / "pages_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    pages.write.mode("overwrite").parquet(inp)
    run_extraction_streaming(spark, inp, out, ckpt, cfg)
    got1 = spark.read.parquet(out)
    batch = extract_df(spark.read.parquet(inp), cfg)
    assert got1.count() == 200
    # row-identical to the batch plan on the same input
    assert (got1.select("url", "markdown", "error").exceptAll(
        batch.select("url", "markdown", "error")).count() == 0)

    # resume: re-trigger with no new files -> nothing reprocessed
    run_extraction_streaming(spark, inp, out, ckpt, cfg)
    assert spark.read.parquet(out).count() == 200

    # incremental: drop new files in, only they are processed
    more = pages_from_documents(spark, SF) \
        .where(F.col("url").endswith(".md")).limit(30)
    more.write.mode("append").parquet(inp)
    run_extraction_streaming(spark, inp, out, ckpt, cfg)
    assert spark.read.parquet(out).count() == 200 + more.count()
