"""Streaming curation: AvailableNow extraction composed with the
STATELESS quality gates — the incremental form of the batch
extract → quality_filter pipeline for "new WARC dumps landed" feeds.

Only the batch-safe subset of the retention decision runs here (token
count / chars-per-token / stopword density — pure per-row expressions,
identical verdict regardless of micro-batch slicing). The corpus-wide
parts are deliberately NOT duplicated per batch: exact dedup in streams
is `dedup_stream`'s keep-set (applyInPandasWithState), and near-dup
canonicalization stays a batch job. Thresholds are imported from
text_stats so stream and batch gates cannot drift.

Replay safety: same contract as availablenow.py — each micro-batch owns
a ``batch_id=N`` output directory overwritten wholesale on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ExtractConfig
from ..functions import textsql as X
from ..operators.text_stats import (MAX_CHARS_PER_TOKEN, MIN_TOKENS,
                                    STOPWORD_MIN_PER)
from ..plans.pipeline import extract_df
from ..schemas import PAGES_SCHEMA


def quality_gate(df: DataFrame, text_col: str = "markdown") -> DataFrame:
    """Stateless keep/drop over ``text_col`` with reason codes — one
    map-side projection (WSCG), applicable to a batch OR a streaming
    micro-batch with identical results. Error rows (NULL text) are
    dropped with reason ``extract_error``."""
    toks = X.tokens("spark", col=text_col)
    sw = X.array_lit("spark", X.EN_STOPWORDS)
    df = df.withColumn("_tk", F.expr(toks))
    n_tok = F.size("_tk")
    n_stop = F.size(F.expr(f"filter(_tk, t -> array_contains({sw}, t))"))
    reason = (
        F.when(F.col(text_col).isNull(), F.lit("extract_error"))
        .when(n_tok < MIN_TOKENS, F.lit("too_short"))
        .when(F.length(text_col) > MAX_CHARS_PER_TOKEN * n_tok,
              F.lit("long_tokens"))
        .when(n_stop * STOPWORD_MIN_PER < n_tok, F.lit("low_stopword"))
        .otherwise(F.lit("")))
    return (df.withColumn("drop_reason", reason)
            .withColumn("keep", reason == "")
            .drop("_tk"))


def run_curation_streaming(spark: SparkSession, input_path: str,
                           output_path: str, checkpoint_path: str,
                           cfg: ExtractConfig) -> None:
    """Consume available page files, extract, gate, append; re-runs with
    the same checkpoint process only new files, replayed batches
    overwrite their own batch_id directory (idempotent)."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_path))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = quality_gate(extract_df(batch_df, cfg)).select(
            "url", "fmt", "markdown", "error", "drop_reason", "keep")
        out.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}")

    q = (stream.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
