"""Driver-contract query registry (SURVEY.md §5.2 item 3).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with a DuckDB oracle SQL string computing the same result on the same
parquet tables. Column names/aliases match exactly (the driver's compare
sorts columns by name and hashes values).

The two ``extract_*`` queries are the flagship: the oracle *constructs the
expected markdown byte-for-byte in SQL* from the deterministic corpus
generation rule (sources/pages.py), so the driver's value-hash directly
checks byte-identical extraction per url — the north_rule invariant.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import ExtractConfig
from .operators import dedup, multimodal, relational, similarity, text_stats
from .plans.pipeline import extract_df
from .sources.pages import pages_from_documents

_CFG = ExtractConfig(num_partitions=32)


def extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    out = extract_df(pages, _CFG)
    return out.select("url", "fmt", "markdown", "error")


# expected markdown reconstructed in pure SQL from the generation rule —
# any extractor deviation (boilerplate kept, whitespace, table shape)
# breaks the value hash
EXTRACT_MARKDOWN_ORACLE = """
SELECT
  'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/doc/'
    || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 10 = 7 THEN '.md' ELSE '.html' END AS url,
  CASE WHEN doc_id % 10 = 7 THEN 'md' ELSE 'html' END AS fmt,
  '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text
    || CASE WHEN doc_id % 10 <> 7 AND doc_id % 3 = 0
            THEN chr(10) || chr(10) || '- item one of doc '
                 || CAST(doc_id AS VARCHAR) || chr(10) || '- item two'
            ELSE '' END
    || CASE WHEN doc_id % 10 <> 7 AND doc_id % 5 = 0
            THEN chr(10) || chr(10) || '| k | v |' || chr(10)
                 || '| --- | --- |' || chr(10)
                 || '| id | ' || CAST(doc_id AS VARCHAR) || ' |' || chr(10)
                 || '| lang | ' || lang || ' |'
            ELSE '' END AS markdown,
  CAST(NULL AS VARCHAR) AS error
FROM documents
"""


def format_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    out = extract_df(pages, _CFG)
    return out.groupBy("fmt").agg(F.count(F.lit(1)).alias("n_docs"))


FORMAT_DISTRIBUTION_ORACLE = """
SELECT CASE WHEN doc_id % 10 = 7 THEN 'md' ELSE 'html' END AS fmt,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


def extract_pdf_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PDF path, value-checked: fixture-grammar PDFs synthesized from
    the same documents (pdf_write), extracted by the content-stream reader
    (pdf_extract); the oracle reconstructs the expected markdown from the
    generation rule. Covers Flate and plain streams (compress = i%2==0)."""
    from .sources.pages import with_fixture_pdfs
    pages = with_fixture_pdfs(pages_from_documents(spark, sf_dir))
    out = extract_df(pages.where(F.col("url").endswith(".pdf")), _CFG)
    return out.select("url", "fmt", "markdown", "error")


EXTRACT_PDF_ORACLE = """
SELECT
  'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/doc/'
    || CAST(doc_id AS VARCHAR) || '.pdf' AS url,
  'pdf' AS fmt,
  '## Doc ' || CAST(doc_id AS VARCHAR)
    || CASE WHEN length(trim(text)) > 0
            THEN chr(10) || chr(10) || text ELSE '' END AS markdown,
  CAST(NULL AS VARCHAR) AS error
FROM documents
WHERE doc_id % 10 = 4
"""


def span_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-offset plumbing check: per url, the span count and the total
    covered length must equal what the generation rule implies (covered =
    len(markdown) - 2*(n_spans-1), blocks joined by blank lines)."""
    pages = pages_from_documents(spark, sf_dir)
    out = extract_df(pages, _CFG)
    return out.select(
        "url",
        F.size("spans").alias("n_spans"),
        F.aggregate("spans", F.lit(0).cast("long"),
                    lambda acc, s: acc + s.end - s.start).alias("covered"),
        F.length("markdown").alias("md_len"),
    )


SPAN_SUMMARY_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, text,
    CASE WHEN doc_id % 10 = 7 THEN 1
         ELSE 2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
    END AS n_spans,
    length('# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text
      || CASE WHEN doc_id % 10 <> 7 AND doc_id % 3 = 0
              THEN chr(10) || chr(10) || '- item one of doc '
                   || CAST(doc_id AS VARCHAR) || chr(10) || '- item two'
              ELSE '' END
      || CASE WHEN doc_id % 10 <> 7 AND doc_id % 5 = 0
              THEN chr(10) || chr(10) || '| k | v |' || chr(10)
                   || '| --- | --- |' || chr(10)
                   || '| id | ' || CAST(doc_id AS VARCHAR) || ' |' || chr(10)
                   || '| lang | ' || lang || ' |'
              ELSE '' END) AS md_len
  FROM documents
)
SELECT
  'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/doc/'
    || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 10 = 7 THEN '.md' ELSE '.html' END AS url,
  n_spans,
  CAST(md_len - 2 * (n_spans - 1) AS BIGINT) AS covered,
  CAST(md_len AS BIGINT) AS md_len
FROM base
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # flagship extraction (SQL-reconstructed golden oracle)
        "extract_markdown": extract_markdown,
        "extract_pdf_markdown": extract_pdf_markdown,
        "span_summary": span_summary,
        "format_distribution": format_distribution,
        # engine mechanics as relational ops (SURVEY.md Table B)
        "dedup_window_latest": relational.latest_event_per_user,
        "resume_anti_join": relational.resume_anti_join,
        "metrics_rollup": relational.metrics_rollup,
        "windowed_event_counts": relational.windowed_event_counts,
        "sessionize_events": relational.sessionize_events,
        # training-data pipeline: dedup family
        "dedup_exact": dedup.dedup_exact,
        "minhash_signatures": dedup.minhash_signatures,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "simhash": dedup.simhash,
        "ngram_jaccard": dedup.ngram_jaccard,
        # text analysis
        "token_counts": text_stats.token_counts,
        "quality_scores": text_stats.quality_scores,
        "lang_id": text_stats.lang_id,
        "fingerprints": text_stats.fingerprints,
        # similarity search
        "cosine_topk": similarity.cosine_topk,
        "ann_lsh": similarity.ann_lsh,
        "ann_ivf": similarity.ann_ivf,
        "dedup_embedding_cosine": similarity.dedup_embedding_cosine,
        # multimodal binary plumbing
        "media_metadata": multimodal.media_metadata,
        "image_features": multimodal.image_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_markdown": EXTRACT_MARKDOWN_ORACLE,
        "extract_pdf_markdown": EXTRACT_PDF_ORACLE,
        "span_summary": SPAN_SUMMARY_ORACLE,
        "format_distribution": FORMAT_DISTRIBUTION_ORACLE,
        "dedup_window_latest": relational.LATEST_EVENT_ORACLE,
        "resume_anti_join": relational.RESUME_ANTI_JOIN_ORACLE,
        "metrics_rollup": relational.METRICS_ROLLUP_ORACLE,
        "windowed_event_counts": relational.WINDOWED_EVENT_COUNTS_ORACLE,
        "sessionize_events": relational.SESSIONIZE_ORACLE,
        "dedup_exact": dedup.DEDUP_EXACT_ORACLE,
        "minhash_signatures": dedup.MINHASH_SIG_ORACLE,
        "dedup_minhash_lsh": dedup.DEDUP_MINHASH_LSH_ORACLE,
        "simhash": dedup.SIMHASH_ORACLE,
        "ngram_jaccard": dedup.NGRAM_JACCARD_ORACLE,
        "token_counts": text_stats.TOKEN_COUNTS_ORACLE,
        "quality_scores": text_stats.QUALITY_ORACLE,
        "lang_id": text_stats.LANG_ID_ORACLE,
        "fingerprints": text_stats.FINGERPRINT_ORACLE,
        "cosine_topk": similarity.COSINE_TOPK_ORACLE,
        "ann_lsh": similarity.ANN_LSH_ORACLE,
        "ann_ivf": similarity.ANN_IVF_ORACLE,
        "dedup_embedding_cosine": similarity.DEDUP_EMBEDDING_ORACLE,
        "media_metadata": multimodal.MEDIA_METADATA_ORACLE,
        "image_features": multimodal.IMAGE_FEATURES_ORACLE,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over pages synthesized from sf0.001."""
    return extract_markdown(spark, "/root/testdata/sf0.001")
