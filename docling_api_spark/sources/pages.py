"""Pages-table sources.

The reference's only source is HTTP multipart upload (``route.py:30,54``);
our engine's source is a table scan (SURVEY.md Table A rows A1/A2): Parquet
always, Iceberg when its runtime is on the classpath (not in this sandbox —
gated behind a flag with identical DataFrame code downstream, SURVEY.md
§7.0).

Also provides ``pages_from_documents``: a deterministic, fully JVM-side
(no UDF) synthesis of a Common-Crawl-style pages table from the
driver-provided ``documents.parquet``, used by the benchmark and the driver
smoke entry — every document's text is wrapped in an HTML shell with real
boilerplate (nav/header/footer/link-farm) so extraction work is
representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import PAGES_SCHEMA


def read_pages(spark: SparkSession, path: str, storage: str = "parquet",
               table: str | None = None) -> DataFrame:
    """Scan the input table. ``storage='iceberg'`` loads the named table via
    the Iceberg catalog (requires the runtime jar); ``'parquet'`` reads the
    path with the declared schema (no inference)."""
    if storage == "iceberg":
        return spark.read.format("iceberg").load(table or path)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


#: epoch for deterministic warc_ts (FIXTURES.md §1) — 2025-01-01T00:00:00Z
_EPOCH_S = 1735689600

def pages_from_documents(spark: SparkSession, sf_dir: str,
                         repeat: int = 1,
                         parallelism: int | None = None) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    Pure column expressions (whole-stage codegen; zero Python in this
    step). ``repeat`` tiles the corpus deterministically for larger bench
    inputs. Every 3rd doc gets a list, every 5th a table, so the extractor
    exercises more than paragraphs; boilerplate chrome is always present.

    ``parallelism`` repartitions the *raw docs* (tiny rows) before the HTML
    synthesis: documents.parquet is a single small file → a single input
    split, so without this the synthesis and any downstream shuffle map side
    run in ONE task — a serial Amdahl bottleneck that caps scaling. The
    repartition moves only the pre-synthesis text, so it is far cheaper
    than shuffling the synthesized html.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if parallelism:
        # BEFORE the repeat crossJoin: the repartition then moves only the
        # original 5k small rows, and the row multiplication + synthesis
        # fan out across all partitions instead of one scan task.
        docs = docs.repartition(parallelism, "doc_id")
    if repeat > 1:
        reps = spark.range(repeat).withColumnRenamed("id", "rep")
        docs = docs.crossJoin(F.broadcast(reps)) \
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000) \
            .drop("rep")
    i = F.col("doc_id")
    para = F.coalesce(F.col("text"), F.lit(""))
    title = F.concat(F.lit("Doc "), i.cast("string"))
    is_md = (i % 10) == 7  # every 10th doc ships as raw Markdown, rest as HTML
    lst = F.when(
        i % 3 == 0,
        F.concat(F.lit("<ul><li>item one of doc "), i.cast("string"),
                 F.lit("</li><li>item two</li></ul>"))).otherwise(F.lit(""))
    tbl = F.when(
        i % 5 == 0,
        F.concat(
            F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>id</td><td>"),
            i.cast("string"),
            F.lit("</td></tr><tr><td>lang</td><td>"), F.col("lang"),
            F.lit("</td></tr></table>"))).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>t</title>"
              "<style>.x{color:#000}</style><script>var q=1;</script></head>"
              "<body><nav><a href=\"/a\">Home</a> <a href=\"/b\">About</a> "
              "<a href=\"/c\">Contact</a></nav><header><h1>Site</h1></header>"
              "<div><a href=\"/s1\">sponsored story one</a> "
              "<a href=\"/s2\">sponsored story two</a> "
              "<a href=\"/s3\">sponsored story three</a></div>"
              "<main><h1>"),
        title,
        F.lit("</h1><p>"), para, F.lit("</p>"),
        lst, tbl,
        F.lit("</main><footer>Copyright 2025</footer></body></html>"),
    )
    md_str = F.concat(F.lit("# "), title, F.lit("\n\n"), para, F.lit("\n"))
    body = F.when(is_md, md_str).otherwise(html_str)
    ext = F.when(is_md, F.lit(".md")).otherwise(F.lit(".html"))
    return docs.select(
        F.concat(F.lit("https://site"), (i % 97).cast("string"),
                 F.lit(".example/doc/"), i.cast("string"), ext).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + (i % 86400)).alias("warc_ts"),
        F.encode(body, "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )
