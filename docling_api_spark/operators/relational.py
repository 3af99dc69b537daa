"""Relational operators the engine uses for its own mechanics
(SURVEY.md Table B), expressed over the driver testdata so each has a
DuckDB oracle:

- dedup window (keep-latest-capture; our url dedup) → latest event per user;
- resume anti-join (manifest protocol) → orders with no lineitems;
- metrics rollup (per-partition lineage aggregation shape) → per-event-type
  rollup with exact DECIMAL sums (float sums are partition-order-dependent;
  decimal sums are not — the same discipline the metrics table uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                         F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "event_type"))


LATEST_EVENT_ORACLE = """
SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


def resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest resume primitive: rows whose key is absent from the
    done-set (broadcast left-anti join — no shuffle of the big side)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    return (orders.join(li, "o_orderkey", "left_anti")
            .select("o_orderkey", "o_custkey", "o_orderstatus"))


RESUME_ANTI_JOIN_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)
"""


def metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group lineage rollup — the exact aggregation shape of the
    engine's metrics table. The sum runs in DECIMAL internally
    (bit-identical regardless of partitioning; float sums are not
    associative) and only the *output* is cast to a rounded DOUBLE: the
    driver's hasher compares pandas frames, where Spark DECIMAL arrives
    as ``decimal.Decimal`` objects but DuckDB DECIMAL arrives as
    ``float64`` — identical values, different hash (CORRECTNESS_r01)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 6).alias("sum_value"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts")))


METRICS_ROLLUP_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
"""


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation via ``F.window`` —
    the exact operator a Structured Streaming job puts behind a watermark;
    in batch mode it is a plain hash aggregation on the window bucket, so
    DuckDB's date_trunc reproduces it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 6).alias("sum_value"))
            .select(F.col("window.start").alias("win_start"),
                    "event_type", "n_events", "sum_value"))


WINDOWED_EVENT_COUNTS_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       count(*) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value
FROM events
GROUP BY 1, 2
"""


def _json_props_sql(dialect: str) -> str:
    """Semi-structured metadata extraction — the JSON-sidecar pattern every
    crawl/event table carries. The extraction is a map-side projection
    (JSON path into a typed column) followed by one keyed aggregation;
    at scale the JSON never reaches the shuffle, only the extracted
    scalar does."""
    if dialect == "spark":
        k = "CAST(get_json_object(props, '$.k') AS BIGINT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    return f"""
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM (SELECT event_type, {k} AS k FROM events) e
GROUP BY event_type
"""


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7: the per-row JSON parse is the one events query with real
    # scan-stage work — widen the single-file scan so it parallelizes
    # (guide §2.5; the BIGINT count/min/max/sum rollup is partition-
    # invariant, so results are unchanged)
    from ..functions import read_wide
    read_wide(spark, f"{sf_dir}/events.parquet", "event_id") \
        .createOrReplaceTempView("events")
    return spark.sql(_json_props_sql("spark"))


JSON_PROPS_ORACLE = _json_props_sql("duck")


#: session gap — events within 30 minutes of the previous one (same user)
#: belong to one session
SESSION_GAP_MINUTES = 30


def _sessionize_sql(dialect: str) -> str:
    unit = "MINUTES" if dialect == "spark" else "MINUTE"
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} {unit}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- CAST: DuckDB's windowed sum is HUGEINT, which pandas renders as
  -- float64; Spark's is BIGINT/int64 — same values, different driver
  -- hash (CORRECTNESS_r01). BIGINT on both sides.
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM g
)
SELECT user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_idx
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-islands sessionization (30-min inactivity gap) — the batch
    ground truth the stateful-streaming sessionizer
    (:mod:`..streaming.stateful`) is tested against. One window + one
    aggregation: at scale both hash-partition on user_id, so the whole
    query is a single shuffle."""
    spark.read.parquet(f"{sf_dir}/events.parquet") \
        .createOrReplaceTempView("events")
    return spark.sql(_sessionize_sql("spark"))


SESSIONIZE_ORACLE = _sessionize_sql("duck")
