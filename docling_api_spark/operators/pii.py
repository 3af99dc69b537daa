"""PII detection + redaction — the scrubbing stage (C4-style) a public
web corpus runs before training: emails, dial-format phone numbers and
IPv4 addresses are counted and replaced with typed placeholders.

The query stages a DETERMINISTIC PII injection over the documents text
(same SQL text in both engines — the corpus itself carries no PII), then
runs the real redaction regexes over it; the oracle runs the identical
generator+scrubber in DuckDB, so the driver value-hashes that the two
regex engines (Java regex / RE2) agree on every boundary the corpus
produces. The redaction expression is the shippable artifact — point it
at any text column.

Dialect discipline: the patterns use NO backslash escapes (character
classes like ``[.]``/``[+]`` instead), because the two engines' string
literals treat backslashes differently — the pattern text is shared
verbatim. DuckDB's regexp_replace needs an explicit 'g' flag where
Spark's always replaces all matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: backslash-free, RE2-and-Java-compatible patterns. Case handled by
#: explicit [a-zA-Z] classes — '(?i)' is not shared-verbatim-safe here.
#: Phone covers international dial forms with 2-3 dash groups of 2-4
#: digits (+1-555-0042 and NANP +1-555-867-5309 alike). Known limit,
#: documented rather than half-fixed: RE2 has no lookbehind, so IPV4_RX
#: consumes greedily inside longer dotted-digit runs ('1.2.3.4.5' →
#: '<IP>.5') — acceptable for redaction (the PII is still gone), wrong
#: for strict extraction.
EMAIL_RX = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PHONE_RX = "[+][0-9]{1,3}(-[0-9]{2,4}){2,3}"
IPV4_RX = "([0-9]{1,3}[.]){3}[0-9]{1,3}"


def _view(spark: SparkSession, sf_dir: str) -> None:
    from ..functions import read_wide
    read_wide(spark, f"{sf_dir}/documents.parquet", "doc_id") \
        .createOrReplaceTempView("documents")


def _inject_sql() -> str:
    """Deterministic PII augmentation (identical text both engines):
    every 3rd doc gains an email, every 4th a phone, every 5th an IPv4 —
    the classes overlap so some docs carry all three."""
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact bob'"
        "      || CAST(doc_id % 7 AS STRING) || '@mail'"
        "      || CAST(doc_id % 5 AS STRING) || '.example.com now'"
        "      ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1 THEN ' call +1-555-'"
        "      || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        "      || ' today' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 2 THEN ' from 10.0.'"
        "      || CAST(doc_id % 256 AS STRING) || '.'"
        "      || CAST(doc_id % 250 AS STRING) || ' logged'"
        "      ELSE '' END"
    )


def scrub_expr(dialect: str, col: str) -> str:
    """The redaction chain over ``col`` — email → phone → IPv4, in that
    order (emails first so their digit runs cannot be half-eaten by the
    phone pass). Map-side, whole-stage codegen; at 100 TB this costs a
    scan."""
    g = ", 'g'" if dialect == "duck" else ""
    e = f"regexp_replace({col}, '{EMAIL_RX}', '<EMAIL>'{g})"
    p = f"regexp_replace({e}, '{PHONE_RX}', '<PHONE>'{g})"
    return f"regexp_replace({p}, '{IPV4_RX}', '<IP>'{g})"


def _pii_sql(dialect: str) -> str:
    if dialect == "spark":
        def count(rx: str) -> str:
            return f"size(regexp_extract_all(t, '{rx}', 0))"
    else:
        def count(rx: str) -> str:
            return f"len(regexp_extract_all(t, '{rx}'))"
    return f"""
SELECT doc_id,
  CAST({count(EMAIL_RX)} AS BIGINT) AS n_emails,
  CAST({count(PHONE_RX)} AS BIGINT) AS n_phones,
  CAST({count(IPV4_RX)} AS BIGINT) AS n_ips,
  CAST(length(clean) AS BIGINT) AS clean_len,
  md5(clean) AS clean_md5
FROM (
  SELECT doc_id, t, {scrub_expr(dialect, 't')} AS clean
  FROM (SELECT doc_id, {_inject_sql()} AS t FROM documents) s0
) s1
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_pii_sql("spark"))


PII_ORACLE = _pii_sql("duck")
