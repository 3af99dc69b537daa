"""Similarity search over the ``embeddings`` table (``array<float>``).

Two paths, mirroring what a 100 TB pipeline needs:

- **brute-force cosine top-k** — the correctness baseline: broadcast the
  (small) query set, JVM-side ``zip_with``/``aggregate`` dot products, one
  window for top-k. O(Q·N) but embarrassingly parallel and shuffle-free up
  to the final per-query top-k.
- **sign-LSH bucketed ANN** — the scale path: 4 deterministic ±1
  hyperplanes (literal weights inlined into both engines' SQL) hash every
  vector to a 4-bit bucket; candidates are same-bucket only, so the join is
  an equi-join on bucket — at 1000 executors this is a hash-partitioned
  join, never a cross join.

Cosine math is done in double with identical fold order in both engines;
outputs round to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import textsql as X

N_QUERIES = 10
TOP_K = 5
N_PLANES = 4
DIM = 64


def _view(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")


def _cos(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        dot = (f"aggregate(zip_with({a}, {b}, (x, y) -> "
               f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, "
               f"(acc, v) -> acc + v)")
        nrm = ("sqrt(aggregate({v}, 0D, (acc, x) -> "
               "acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    else:
        dot = (f"list_sum(list_transform(list_zip({a}, {b}), p -> "
               f"CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")
        nrm = ("sqrt(list_sum(list_transform({v}, x -> "
               "CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    return f"({dot} / ({nrm.format(v=a)} * {nrm.format(v=b)}))"


def _topk_sql(dialect: str) -> str:
    cos = _cos(dialect, "q.embedding", "c.embedding")
    if dialect == "spark":
        hint = "/*+ BROADCAST(q) */ "
    else:
        hint = ""
    return f"""
SELECT qid, nid, cos_sim FROM (
  SELECT {hint}q.vec_id AS qid, c.vec_id AS nid,
         ROUND({cos}, 4) AS cos_sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {cos} DESC, c.vec_id) AS rn
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
) r WHERE rn <= {TOP_K}
"""


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir)
    return spark.sql(_topk_sql("spark"))


COSINE_TOPK_ORACLE = _topk_sql("duck")


# ------------------------------------------------------------- sign-LSH ANN

def _bucket_expr(dialect: str, vec: str) -> str:
    planes = X.hyperplanes(N_PLANES, DIM)
    bits = []
    for p, w in enumerate(planes):
        wlit = X.array_lit(dialect, [float(x) for x in w])
        if dialect == "spark":
            dot = (f"aggregate(zip_with({vec}, {wlit}, (x, y) -> "
                   f"CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
        else:
            dot = (f"list_sum(list_transform(list_zip({vec}, {wlit}), p -> "
                   f"CAST(p[1] AS DOUBLE) * p[2]))")
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _ann_sql(dialect: str) -> str:
    cos = _cos(dialect, "q.embedding", "c.embedding")
    bucket = _bucket_expr(dialect, "embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT qid, nid, cos_sim FROM (
  SELECT q.vec_id AS qid, c.vec_id AS nid,
         ROUND({cos}, 4) AS cos_sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {cos} DESC, c.vec_id) AS rn
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
) r WHERE rn <= {TOP_K}
"""


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the same sign-LSH
    bucket (equi-join on the 4-bit bucket key)."""
    _view(spark, sf_dir)
    return spark.sql(_ann_sql("spark"))


ANN_LSH_ORACLE = _ann_sql("duck")
