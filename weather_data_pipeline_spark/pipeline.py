"""End-to-end batch pipeline (SURVEY.md §2.7, O31-O33; lifecycle §3).

The reference's three Airflow tasks (extract >> load_to_cloudStorage >>
load_to_athena, weather_data_dag.py:46) and its Flask serving path
(app/app.py:17-28) restate as plain function composition over one lazy
plan — stage boundaries become shuffle stages, not process hops:

    extract_to_raw   O1/O2  fetch (or synthesize) → data/{date}/{City}.txt
    stage            O3/O9-O11/O19  schema-full scan → 31-col staged frame
    curate           O5/O6  parquet saveAsTable, partitioned by ingest_date
    latest_snapshot  O15    flagship latest-per-key query
    serve            O13/O8 equality filter + JSON-records serialization

Unlike the reference's Flask route (which re-runs the whole pipeline per
HTTP request, app/app.py:19-21), ``serve`` reads whatever cached/curated
DataFrame it is given — recompute-per-request is the anti-pattern §4 calls
out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.flagship import latest_per_key
from .sources import weather as wsrc
from .transforms import flatten_raw

DB = "weather"
TABLE = f"{DB}.weather"


def extract_to_raw(root: str, dates: list[str] | None = None) -> None:
    """O1+O2: land one JSON doc per (city, date). Offline synthesis here;
    swap in ``wsrc.fetch_current`` when a network + key exist."""
    wsrc.write_raw_docs(wsrc.synthesize_raw_docs(dates), root)


def stage(spark: SparkSession, root: str, date: str | None = None) -> DataFrame:
    """O3 scan + O9-O11/O19 flatten → staged frame (with ingest_date)."""
    return flatten_raw(wsrc.read_raw(spark, root, date), with_ingest_date=True)


def curate(
    spark: SparkSession, staged: DataFrame, table: str = TABLE, path: str | None = None
) -> None:
    """O5+O6: database get-or-create + partitioned parquet table append.

    ``partitionBy(ingest_date)`` is the engine form of the reference's
    table-per-day naming (weather_{date}, weather_etl.py:105): one logical
    table, partition-pruned automatically by any date predicate. ``path``
    makes it an external table (tests; lakehouse layouts where data
    location is managed outside the metastore).
    """
    db = table.split(".")[0]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    writer = (
        staged.write.mode("append").partitionBy("ingest_date").format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def latest_snapshot(spark: SparkSession, table: str = TABLE) -> DataFrame:
    """O7+O15: read the curated table back, latest row per city — the
    reference's flagship Athena query (weather_etl.py:145)."""
    return latest_per_key(
        spark.table(table), key="city", order="localtime", tiebreak="localtime_epoch"
    )


def serve(df: DataFrame, city: str = "All") -> list[str]:
    """O13+O8: the Flask route body (app/app.py:25-28) — equality filter
    ('All' bypass) + JSON-records rows. Driver-side collect is correct
    here: serving output is small by construction (≤ one row per city)."""
    if city != "All":
        df = df.filter(F.col("city") == city)
    return df.toJSON().collect()


def run_batch(
    spark: SparkSession, root: str, dates: list[str] | None = None, table: str = TABLE
) -> DataFrame:
    """The full O31 DAG as one composition; returns the flagship result."""
    extract_to_raw(root, dates)
    curate(spark, stage(spark, root), table=table)
    return latest_snapshot(spark, table)
