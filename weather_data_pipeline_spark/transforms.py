"""Staging transforms: raw nested record → flat staged table.

Re-expresses the reference's ``processData`` (weather_etl.py:62-90) as one
declarative projection: struct flatten (O9), doubly-nested condition
extraction (O10), name→city rename (O11), H:mm timestamp parse (O19) — a
single narrow map stage, no shuffle, fully whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import CURRENT

#: Scalar fields of ``current`` (everything but the nested condition).
CURRENT_SCALARS = [f.name for f in CURRENT.fields if f.name != "condition"]


def flatten_raw(df: DataFrame, with_ingest_date: bool = False) -> DataFrame:
    """Nested (location, current) → the 31-column staged table
    (FIXTURES.md §A "flattened staged schema").

    One ``select`` does the work of the reference's per-file pandas loop
    (json.loads → two frames → axis=1 concat → rename → to_datetime,
    weather_etl.py:67-89): O9 flatten + O17 horizontal concat are the same
    projection in Spark because both structs live in one record.

    ``with_ingest_date`` recovers the raw layer's date-directory partition
    from the file path (lakehouse pattern: partition value lives in the
    path, not the payload).
    """
    cols = [
        F.col("location.name").alias("city"),  # O11 rename
        F.col("location.region").alias("region"),
        F.col("location.country").alias("country"),
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
        F.col("location.tz_id").alias("tz_id"),
        F.col("location.localtime_epoch").alias("localtime_epoch"),
        # O19: 'yyyy-MM-dd H:mm' — single-digit hour must parse.
        F.to_timestamp(F.col("location.localtime"), "yyyy-MM-dd H:mm")
        .cast("timestamp_ntz")
        .alias("localtime"),
    ] + [F.col(f"current.{name}").alias(name) for name in CURRENT_SCALARS]
    # O10: keep only condition.text, drop icon/code (weather_etl.py:79).
    cols.append(F.col("current.condition.text").alias("condition"))
    if with_ingest_date:
        # File-backed scans recover the date from the partition directory;
        # the weather_api DataSource carries it in the payload instead.
        if "ingest_date" in df.columns:
            cols.append(F.col("ingest_date"))
        else:
            cols.append(
                F.regexp_extract(
                    F.input_file_name(), r"(\d{4}-\d{2}-\d{2})", 1
                ).alias("ingest_date")
            )
    return df.select(*cols)
