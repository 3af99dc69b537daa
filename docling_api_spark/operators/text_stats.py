"""Text-analysis operators: token counting, quality scoring, language-ID,
document fingerprinting — all pure column expressions (JVM-side, whole-stage
codegen; zero Python in the hot path), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import textsql as X


def _view(spark: SparkSession, sf_dir: str) -> None:
    from ..functions import read_wide
    read_wide(spark, f"{sf_dir}/documents.parquet", "doc_id") \
        .createOrReplaceTempView("documents")


# ------------------------------------------------------------ token counts

def _token_count_sql(dialect: str) -> str:
    toks = X.tokens(dialect)
    if dialect == "spark":
        n_ws = f"size({toks})"
        n_bpe = "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))"
    else:
        n_ws = f"len({toks})"
        n_bpe = "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))"
    return (f"SELECT doc_id, CAST({n_ws} AS BIGINT) AS n_ws_tokens, "
            f"CAST({n_bpe} AS BIGINT) AS n_bpe_tokens, "
            f"CAST(length(text) AS BIGINT) AS n_chars_measured "
            f"FROM documents")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_token_count_sql("spark"))


TOKEN_COUNTS_ORACLE = _token_count_sql("duck")


# ----------------------------------------------------------- quality score

def _quality_sql(dialect: str) -> str:
    toks = X.tokens(dialect)
    sw = X.array_lit(dialect, X.EN_STOPWORDS)
    if dialect == "spark":
        n_tok = f"size({toks})"
        n_stop = f"size(filter({toks}, t -> array_contains({sw}, t)))"
        n_punct = "length(text) - length(regexp_replace(text, '[.,!?;:]', ''))"
    else:
        n_tok = f"len({toks})"
        n_stop = f"len(list_filter({toks}, t -> list_contains({sw}, t)))"
        n_punct = "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))"
    return f"""
SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  ROUND(n_stop / CAST(nullif(n_tok, 0) AS DOUBLE), 4) AS stopword_ratio,
  ROUND(n_punct / CAST(nullif(length(text), 0) AS DOUBLE), 4) AS punct_ratio,
  ROUND(length(text) / CAST(nullif(n_tok, 0) AS DOUBLE), 4) AS chars_per_token,
  CASE WHEN n_tok >= 40 AND n_stop * 100 >= n_tok * 2 THEN 'high'
       WHEN n_tok >= 10 THEN 'medium'
       ELSE 'low' END AS quality_bucket
FROM (
  SELECT doc_id, text, {n_tok} AS n_tok, {n_stop} AS n_stop,
         {n_punct} AS n_punct
  FROM documents
) q
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_quality_sql("spark"))


QUALITY_ORACLE = _quality_sql("duck")


# ------------------------------------------------------------ quality filter

#: retention-gate thresholds — shared with the streaming quality gate
#: (streaming/curation.py) so batch and stream cannot drift apart
MIN_TOKENS = 10
MAX_CHARS_PER_TOKEN = 12
STOPWORD_MIN_PER = 50     # keep iff n_stop * 50 >= n_tok

def _quality_filter_sql(dialect: str, nd_rel: str | None = None,
                        with_n_tok: bool = False) -> str:
    """The retention decision a training-data pipeline actually ships
    (C4/Gopher-style): exact-dup canonicalization + length + token-shape
    + stopword-density gates composed into keep/drop with a reason code.
    All-integer comparisons (no float thresholds), so both engines decide
    identically. One shuffle total: the md5 dedup window; every other
    gate is a map-side column expression.

    ``nd_rel`` (the near-dup variant): a relation ``(doc_id,
    nd_canonical)`` of LSH-verified component canonicals left-joined in —
    reason code ``near_duplicate`` slots between the exact-dup and shape
    gates. ONE generator produces both variants so the thresholds and
    reason ordering cannot drift apart (r3 review find)."""
    toks = X.tokens(dialect)
    sw = X.array_lit(dialect, X.EN_STOPWORDS)
    if dialect == "spark":
        n_tok = f"size({toks})"
        n_stop = f"size(filter(tk, t -> array_contains({sw}, t)))"
    else:
        n_tok = f"len({toks})"
        n_stop = f"len(list_filter(tk, t -> list_contains({sw}, t)))"
    if nd_rel is None:
        nd_col = near_case = near_keep = join = ""
    else:
        canon = "coalesce(nd.nd_canonical, t2.doc_id)"
        nd_col = f"{canon} AS nd_canonical,\n  "
        near_case = (f"WHEN t2.doc_id <> {canon}\n"
                     f"            THEN 'near_duplicate'\n       ")
        near_keep = f"\n   AND t2.doc_id = {canon}"
        join = f"\nLEFT JOIN {nd_rel} nd ON nd.doc_id = t2.doc_id"
    # the report variant projects the already-computed token count so
    # downstream rollups never re-tokenize the corpus (r3 review find)
    tok_col = "n_tok,\n  " if with_n_tok else ""
    return f"""
SELECT t2.doc_id,
  {tok_col}{nd_col}CASE WHEN t2.doc_id <> canonical_id THEN 'duplicate'
       {near_case}WHEN n_tok < {MIN_TOKENS} THEN 'too_short'
       WHEN length(text) > {MAX_CHARS_PER_TOKEN} * n_tok THEN 'long_tokens'
       WHEN n_stop * {STOPWORD_MIN_PER} < n_tok THEN 'low_stopword'
       ELSE '' END AS drop_reason,
  (t2.doc_id = canonical_id{near_keep}
   AND n_tok >= {MIN_TOKENS}
   AND length(text) <= {MAX_CHARS_PER_TOKEN} * n_tok AND n_stop * {STOPWORD_MIN_PER} >= n_tok) AS keep
FROM (
  SELECT doc_id, text, n_tok, n_stop,
         min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
  FROM (
    SELECT doc_id, text, {n_tok} AS n_tok, {n_stop} AS n_stop
    FROM (SELECT doc_id, text, {toks} AS tk FROM documents) t0
  ) t1
) t2{join}
"""


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_quality_filter_sql("spark"))


QUALITY_FILTER_ORACLE = _quality_filter_sql("duck")


# ------------------------------------------- quality filter incl. near-dups

def quality_filter_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention decision with near-duplicate removal composed in —
    the full shape a production pipeline ships (exact dedup + LSH-verified
    near-dup components + length/shape/stopword gates, one reason code).

    Plan at scale: the gates stay map-side column expressions; the exact
    canonical is one md5-keyed window; the near-dup leg joins the (tiny —
    only docs in verified pairs) component table, which Catalyst
    broadcast-joins; component labels come from the keyed min-propagation
    loop in ``dedup.neardup_canonical``."""
    from . import dedup as DD

    _view(spark, sf_dir)
    DD.neardup_canonical(spark, sf_dir) \
        .createOrReplaceTempView("neardup_canon")
    return spark.sql(_quality_filter_sql("spark", nd_rel="neardup_canon"))


def quality_filter_neardup_oracle() -> str:
    from . import dedup as DD

    return _quality_filter_sql(
        "duck", nd_rel=f"({DD.neardup_canonical_oracle()})")


QUALITY_FILTER_NEARDUP_ORACLE = quality_filter_neardup_oracle()


# ------------------------------------------------- retention report

def _retention_report_sql(dialect: str, nd_rel: str | None = None) -> str:
    """The curation dashboard rollup: documents and tokens per retention
    verdict (reason code '' = kept) over the FULL near-dup-aware filter.
    One extra keyed aggregation on top of the filter plan (the filter
    projects its own n_tok — no second tokenization pass, no join) —
    the kind of per-run report a 10^12-doc pipeline publishes with
    every batch."""
    inner = _quality_filter_sql(dialect, nd_rel=nd_rel, with_n_tok=True)
    return f"""
SELECT f.drop_reason,
  count(*) AS n_docs,
  CAST(sum(f.n_tok) AS BIGINT) AS n_tokens
FROM ({inner}) f
GROUP BY f.drop_reason
"""


def retention_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import dedup as DD

    _view(spark, sf_dir)
    DD.neardup_canonical(spark, sf_dir) \
        .createOrReplaceTempView("neardup_canon")
    return spark.sql(_retention_report_sql("spark",
                                           nd_rel="neardup_canon"))


def retention_report_oracle() -> str:
    from . import dedup as DD

    return _retention_report_sql(
        "duck", nd_rel=f"({DD.neardup_canonical_oracle()})")


RETENTION_REPORT_ORACLE = retention_report_oracle()


# ------------------------------------------------- token-length histogram

_HIST_BUCKET = 16


def _token_hist_sql(dialect: str) -> str:
    """Corpus token-length histogram (bucket = n_tokens div 16, capped
    at 31): the length-distribution report used for truncation-budget
    planning. Map-side bucket assignment + ONE keyed aggregation."""
    toks = X.tokens(dialect)
    n_tok = ("size(tk)" if dialect == "spark" else "len(tk)")
    div = "DIV" if dialect == "spark" else "//"
    return f"""
SELECT CAST(least(n_tok {div} {_HIST_BUCKET}, 31) AS INT) AS bucket,
  count(*) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
  CAST(min(n_tok) AS BIGINT) AS min_tokens,
  CAST(max(n_tok) AS BIGINT) AS max_tokens
FROM (SELECT {n_tok} AS n_tok
      FROM (SELECT {toks} AS tk FROM documents) t0) t1
GROUP BY 1
"""


def token_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_token_hist_sql("spark"))


TOKEN_HIST_ORACLE = _token_hist_sql("duck")


# ------------------------------------------------------- model-score gate

#: fixed "quality model" weights (a trained classifier would learn these;
#: the plumbing — feature build, linear score, sigmoid gate — is the real
#: shape a FineWeb-style model-filtering stage runs)
_QM_BIAS = -1.0
_QM_W_STOP = 3.0      # stopword density: natural prose ↑
_QM_W_SAT = 2.0       # length saturation n/(n+100): longer docs ↑
_QM_W_PUNCT = -4.0    # punctuation density: boilerplate/spam ↓


def _quality_model_sql(dialect: str) -> str:
    """Model-scoring retention gate: a fixed-weight linear model over the
    quality features squashed through the RATIONAL sigmoid
    ``0.5*(1+z/(1+|z|))`` — deliberately no exp/ln (JVM and libm
    transcendentals differ at ulp level; +,*,/,abs are IEEE-exact in both
    engines, so the score is bit-stable). The linear term is rounded to
    6 dp before squashing; keep = z >= 0. Everything is one map-side
    projection — at 100 TB this gate costs a scan."""
    toks = X.tokens(dialect)
    sw = X.array_lit(dialect, X.EN_STOPWORDS)
    if dialect == "spark":
        n_tok = f"size({toks})"
        n_stop = f"size(filter(tk, t -> array_contains({sw}, t)))"
        n_punct = "length(text) - length(regexp_replace(text, '[.,!?;:]', ''))"
    else:
        n_tok = f"len({toks})"
        n_stop = f"len(list_filter(tk, t -> list_contains({sw}, t)))"
        n_punct = ("length(text) - "
                   "length(regexp_replace(text, '[.,!?;:]', '', 'g'))")
    z = (f"ROUND({_QM_BIAS} "
         f"+ {_QM_W_STOP} * (n_stop / CAST(greatest(n_tok, 1) AS DOUBLE)) "
         f"+ {_QM_W_SAT} * (n_tok / (n_tok + CAST(100.0 AS DOUBLE))) "
         f"+ {_QM_W_PUNCT} * (n_punct / "
         f"CAST(greatest(length(text), 1) AS DOUBLE)), 6)")
    return f"""
SELECT doc_id,
  ROUND(0.5 * (1 + z / (1 + abs(z))), 6) AS model_score,
  z >= 0 AS keep
FROM (
  SELECT doc_id, text, {z} AS z
  FROM (
    SELECT doc_id, text, {n_tok} AS n_tok, {n_stop} AS n_stop,
           {n_punct} AS n_punct
    FROM (SELECT doc_id, text, {toks} AS tk FROM documents) t0
  ) t1
) t2
"""


def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_quality_model_sql("spark"))


QUALITY_MODEL_ORACLE = _quality_model_sql("duck")


# ---------------------------------------------------------------- lang id

def _lang_id_sql(dialect: str) -> str:
    toks = X.tokens(dialect)
    scores = []
    for lang, markers in X.LANG_MARKERS:
        lit = X.array_lit(dialect, markers)
        if dialect == "spark":
            scores.append(
                f"size(filter(tk, t -> array_contains({lit}, t))) AS s_{lang}")
        else:
            scores.append(
                f"len(list_filter(tk, t -> list_contains({lit}, t))) AS s_{lang}")
    langs = [lang for lang, _ in X.LANG_MARKERS]
    # deterministic priority: first language reaching the max wins
    case = "CASE "
    for lang in langs:
        conds = " AND ".join(f"s_{lang} >= s_{o}" for o in langs if o != lang)
        case += f"WHEN s_{lang} > 0 AND {conds} THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return (f"SELECT doc_id, {case} AS lang_pred, "
            f"CAST(s_en + s_fr + s_de + s_es + s_it + s_pt AS BIGINT)"
            f" AS marker_hits "
            f"FROM (SELECT doc_id, {', '.join(scores)} FROM "
            f"(SELECT doc_id, {toks} AS tk FROM documents) tt) ss")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic (n-gram-class heuristic;
    deterministic tie-break by fixed language priority)."""
    _view(spark, sf_dir)
    return spark.sql(_lang_id_sql("spark"))


LANG_ID_ORACLE = _lang_id_sql("duck")


# ------------------------------------------------- tf-idf keyword extraction

TFIDF_TOP_K = 3


def _tfidf_sql(dialect: str) -> str:
    """Per-document top-k terms by tf-idf — the keyword-extraction shape a
    training-data pipeline runs for topic tagging / quality signals.

    Plan at scale: explode(tokens) → two keyed aggregations (term
    frequency per (doc, term); document frequency per term) → broadcast-
    size idf join keyed on term → per-doc top-k window. Every stage
    hash-partitions on its key; nothing is all-pairs. The ranking key is
    the ROUNDED weight (6 dp) with a term tie-break, so ulp-level ln()
    differences between engines cannot flip the order."""
    toks = X.tokens(dialect)
    explode = ("explode" if dialect == "spark" else "unnest")
    return f"""
WITH tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM (SELECT doc_id, {explode}({toks}) AS tok FROM documents) e
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS weight
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, CAST(rnk AS INT) AS rnk, term, weight FROM (
  SELECT doc_id, term, weight,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY weight DESC, term) AS rnk
  FROM w
) r WHERE rnk <= {TFIDF_TOP_K}
"""


def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_tfidf_sql("spark"))


TFIDF_ORACLE = _tfidf_sql("duck")


# ------------------------------------------------------------ fingerprints

def _fingerprint_sql(dialect: str) -> str:
    # staged tk -> sh -> hs (see textsql.shingles_from): hs computed once,
    # min/max read the named column
    mn, mx = ("array_min", "array_max") if dialect == "spark" else \
             ("list_min", "list_max")
    # 15 hex digits = 60 bits — the full 16 would overflow signed BIGINT
    return (f"SELECT doc_id, {mn}(hs) AS fp_min, {mx}(hs) AS fp_max, "
            f"{X.md5_int(dialect, 'text', 15)} AS fp_head "
            f"FROM (SELECT doc_id, text, {X.shingle_hashes(dialect)} AS hs "
            f"FROM (SELECT doc_id, text, {X.shingles_from(dialect)} AS sh "
            f"FROM (SELECT doc_id, text, {X.tokens(dialect)} AS tk "
            f"FROM documents) a) b) c")


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-shingle min/max hash fingerprint + whole-text hash — the
    winnowing-style per-document signature."""
    _view(spark, sf_dir)
    return spark.sql(_fingerprint_sql("spark"))


FINGERPRINT_ORACLE = _fingerprint_sql("duck")
