"""Advanced relational operators the reference never needed but a general
engine must ship (SURVEY.md §2.9 [ext] tier): as-of join, exact
percentiles, skew-safe salted aggregation, GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table, register_views

# ----------------------------------------------------------------------
# X7 — as-of join (time-series point-in-time lookup)
# ----------------------------------------------------------------------
_ASOF_ORACLE = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'view' THEN ts END AS view_ts,
             CASE WHEN event_type = 'view' THEN event_id END AS view_event_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *,
             last_value(view_ts IGNORE NULLS) OVER pit AS asof_view_ts,
             last_value(view_event_id IGNORE NULLS) OVER pit AS asof_view_event_id
      FROM tagged
      WINDOW pit AS (
        PARTITION BY user_id
        ORDER BY ts, CASE event_type WHEN 'view' THEN 0 ELSE 1 END, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value, asof_view_ts, asof_view_event_id
    FROM w WHERE event_type = 'purchase'
"""


def asof_join_latest(
    df: DataFrame,
    key: str,
    order: str,
    left_pred,  # Column: rows being enriched
    right_pred,  # Column: rows supplying the as-of value
    carry: list[tuple[str, str]],  # (source col, output col) from the right side
    tiebreak: str,
) -> DataFrame:
    """As-of join as a single-shuffle union+window — Spark has no ASOF JOIN
    operator, but the classic restatement needs none: tag both streams,
    sort within key by (order, side, tiebreak), and carry the right side's
    values forward with last(ignorenulls). One hash shuffle on ``key``, no
    join, no range explosion — at 100 TB this beats any join-based plan
    because each partition is one linear sweep.

    Right-side rows at the same ``order`` value sort BEFORE left rows, so
    the match predicate is right.order <= left.order (inclusive).
    """
    both = df.filter(left_pred | right_pred)
    side = F.when(right_pred, 0).otherwise(1)
    tagged = both.select(
        "*",
        side.alias("_side"),
        *[
            F.when(right_pred, F.col(src)).alias(f"_r_{out}")
            for src, out in carry
        ],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(order, "_side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "*",
        *[
            F.last(f"_r_{out}", ignorenulls=True).over(w).alias(out)
            for _, out in carry
        ],
    )
    return carried.filter(left_pred).drop(
        "_side", *[f"_r_{out}" for _, out in carry]
    )


@query("x7_asof_join", oracle=_ASOF_ORACLE)
def x7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each purchase gets the user's latest view
    at-or-before it (ts tie → view first, then event_id order)."""
    ev = load_table(spark, sf_dir, "events")
    out = asof_join_latest(
        ev,
        key="user_id",
        order="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        carry=[("ts", "asof_view_ts"), ("event_id", "asof_view_event_id")],
        tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_view_ts", "asof_view_event_id"
    )


# ----------------------------------------------------------------------
# Exact percentiles (order statistics as aggregation)
# ----------------------------------------------------------------------
@query(
    "ext_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). At 100 TB swap in ``approx_percentile`` (t-digest
    sketch, bounded memory, mergeable across partitions) — same call shape,
    sketch result is engine-specific so the exact form carries the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", F.lit(q)), 6).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.99)
        ]
    )


# ----------------------------------------------------------------------
# Skew-safe salted aggregation
# ----------------------------------------------------------------------
@query(
    "ext_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS total_value
    FROM events GROUP BY event_type
    """,
)
def ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups on (key, salt) — a hot
    key's rows spread over 16 reducers — stage 2 merges the partials. The
    oracle is the plain single-stage groupBy: salting must be semantically
    invisible. (For built-in aggs Spark's partial aggregation + AQE skew
    handling already do this; the explicit form is the template for
    non-partial-izable aggregations and extreme key skew.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", (F.col("event_id") % 16).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.sum("pv").alias("total_value")
    )


# ----------------------------------------------------------------------
# GROUPING SETS (multi-granularity rollup in one pass)
# ----------------------------------------------------------------------
_GSETS_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
"""


@query("ext_grouping_sets", oracle=_GSETS_SQL)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — all four granularities in one shuffle (Spark expands
    to a single Expand + aggregate, not four scans)."""
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_SQL)
