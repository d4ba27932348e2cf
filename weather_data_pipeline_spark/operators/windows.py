"""Window-function surface (SURVEY.md §2.3).

The reference's only window is O15's ROW_NUMBER latest-per-key
(weather_etl.py:145, in flagship.py); this module generalizes to the full
[ext] window family: ranking, offsets, running/frame aggregates. Every
ORDER BY carries a unique tiebreak (event_id / orderkey) so results are
total-ordered and the oracle hash deterministic (SURVEY.md §7.4.4).

Scale note: all windows partition on a high-cardinality key (user_id /
l_suppkey) so state per partition stays bounded; AQE handles residual
skew. A window with no PARTITION BY would serialize 100 TB through one
task — none are exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table


@query(
    "o14_rank_filter_topk",
    oracle="""
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def o14_rank_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate on a window rank (O14, `WHERE rn = 1` generalized to top-k)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "ts", "value")
    )


@query(
    "ext_window_ranks",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def ext_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "ext_window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(ts)  OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER w), -1) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset windows — the inter-event gap that drives sessionization (X6)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.coalesce(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp")),
            F.lit(-1),
        ).alias("gap_us"),
    )


@query(
    "ext_window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 2) AS running_value,
           COUNT(*) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM events
    """,
)
def ext_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame (the reference never writes one — SURVEY.md §2.3)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@query(
    "ext_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice
              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000
    FROM orders
    """,
)
def ext_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key — value-based neighborhoods."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1000"),
    )


@query(
    "ext_window_first_last",
    oracle="""
    SELECT user_id, event_id, value,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ext_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
    )
