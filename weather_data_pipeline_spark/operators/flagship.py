"""Flagship query — latest snapshot per key (reference O15).

The reference's only SQL query (reference ``weather_etl.py:145``):

    WITH latest AS (SELECT *, ROW_NUMBER() OVER
        (PARTITION BY city ORDER BY localtime DESC) rn FROM weather_{date})
    SELECT * FROM latest WHERE rn = 1

Re-expressed Spark-first over the ``events`` table (user_id ≙ city,
ts ≙ localtime; FIXTURES.md §B role mapping), with an ``event_id``
tiebreak so the ranking is total and the oracle hash deterministic.

Scale: the window shuffles once on the partition key. At 100 TB the same
semantics are better served by ``max_by`` aggregation (single shuffle with
map-side partial aggregation, no per-partition sort buffer) — provided as
``latest_per_key_agg`` and benchmarked against the window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table

#: Output column order (driver compares by sorted names; order is cosmetic).
_OUT = ["user_id", "event_id", "ts", "event_type", "value"]


def latest_per_key(
    df: DataFrame, key: str, order: str, tiebreak: str | None = None
) -> DataFrame:
    """ROW_NUMBER window → keep rn=1 (most recent row per key)."""
    cols = [F.col(order).desc()]
    if tiebreak:
        cols.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def latest_per_key_agg(
    df: DataFrame, key: str, order: str, tiebreak: str, payload: list[str]
) -> DataFrame:
    """Same semantics via max_by on a composite (order, tiebreak) struct.

    One hash shuffle with partial aggregation — at scale this avoids the
    window's full per-partition sort and is robust to hot keys under AQE.
    """
    ord_struct = F.struct(F.col(order), F.col(tiebreak))
    aggs = [F.max_by(F.col(c), ord_struct).alias(c) for c in payload] + [
        F.max(F.col(order)).alias(order),
        F.max_by(F.col(tiebreak), ord_struct).alias(tiebreak),
    ]
    return df.groupBy(key).agg(*aggs)


@query(
    "o15_latest_per_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT e.*, ROW_NUMBER() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events e
    ) WHERE rn = 1
    """,
)
def o15_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the reference flagship (weather_etl.py:145)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(ev, "user_id", "ts", "event_id").select(*_OUT)


@query(
    "o15_latest_per_key_agg",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT e.*, ROW_NUMBER() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events e
    ) WHERE rn = 1
    """,
)
def o15_latest_per_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path variant: max_by aggregation, identical result set."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key_agg(
        ev, "user_id", "ts", "event_id", ["event_type", "value"]
    ).select(*_OUT)
