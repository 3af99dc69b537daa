"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata — the Spark-side
plumbing (schema, Arrow batch shape, ``mapInPandas`` signature,
partition-friendly layout) is real and tested; the actual decoders are
STUBBED because the image/audio libraries are not in this container
(FIXTURES/SURVEY scoping — same posture as OCR: ``ocr_not_supported``).

- :func:`media_metadata` — a real, oracle-checked ``mapInPandas`` operator:
  byte length + magic prefix + deterministic content hash per blob.
- :func:`decode_image` — the scale-path decode/resize/feature UDF with its
  full Spark plumbing; raises :class:`NotImplementedError` at the decode
  step (clearly marked stub) unless ``fake=True``, which produces a
  deterministic fake feature vector so the distributed plumbing is testable.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

MEDIA_META_DDL = ("doc_id bigint, n_bytes bigint, magic string, "
                  "content_md5 string")


def _meta_batches(batches):
    for pdf in batches:
        blobs = pdf["blob"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": blobs.map(lambda b: 0 if b is None else len(b))
                            .astype("int64"),
            "magic": blobs.map(
                lambda b: "" if not b else bytes(b[:4]).hex().upper()),
            "content_md5": blobs.map(
                lambda b: "" if b is None
                else hashlib.md5(bytes(b)).hexdigest()),
        })


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction. The blob here is the utf-8 bytes
    of ``documents.text`` (this corpus has no real media), which makes the
    operator oracle-checkable: DuckDB computes the same length/magic/md5
    from ``encode(text)``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return blobs.mapInPandas(_meta_batches, MEDIA_META_DDL)


MEDIA_METADATA_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       upper(substr(hex(encode(text)), 1, 8)) AS magic,
       md5(text) AS content_md5
FROM documents
"""

IMAGE_FEATURES_DDL = ("doc_id bigint, width int, height int, "
                      "feature array<double>")

_FEATURE_DIM = 8


def _decode_image_bytes(blob: bytes):
    """THE STUB: a real deployment decodes with PIL/libvips here.
    Neither library exists in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libvips — not available in this "
        "environment; use fake=True for plumbing tests")


def _fake_decode(blob: bytes):
    """Deterministic fake: 'dimensions' and an 8-dim 'feature' derived from
    the content hash — exercises the exact batch shapes the real decoder
    would produce."""
    d = hashlib.md5(blob).digest()
    width = 64 + d[0]
    height = 64 + d[1]
    feature = [round(b / 255.0, 6) for b in d[2:2 + _FEATURE_DIM]]
    return width, height, feature


def make_image_feature_fn(fake: bool = False):
    decode = _fake_decode if fake else _decode_image_bytes

    def image_features(batches):
        for pdf in batches:
            ws, hs, fs = [], [], []
            for b in pdf["blob"]:
                if b is None or len(b) == 0:
                    ws.append(None); hs.append(None); fs.append(None)
                    continue
                w, h, f = decode(bytes(b))
                ws.append(w); hs.append(h); fs.append(f)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series(ws, dtype="Int32", index=pdf.index),
                "height": pd.Series(hs, dtype="Int32", index=pdf.index),
                "feature": pd.Series(fs, dtype="object", index=pdf.index),
            })

    return image_features


def image_features_df(blobs: DataFrame, fake: bool = False) -> DataFrame:
    """blobs(doc_id bigint, blob binary) → decoded features. Partition- and
    Arrow-batch-shaped exactly as the real decoder path would be."""
    return blobs.mapInPandas(make_image_feature_fn(fake), IMAGE_FEATURES_DDL)
