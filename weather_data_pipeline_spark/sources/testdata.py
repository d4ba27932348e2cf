"""Readers for the driver's synthetic parquet tables (TESTDATA.md).

Explicit schemas (schemas.TESTDATA) so the scan never pays footer-based
inference across many files — at 100 TB a table is tens of thousands of
files and schema inference is a full metadata pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE_NAMES, TESTDATA

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame (columnar scan, pushdown-ready)."""
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # parquet TIMESTAMP(NANOS) is unreadable by Spark's timestamp types;
        # scan as int64 nanos, truncate to µs with exact integer division
        # (matches DuckDB's ns→µs behavior), expose as TIMESTAMP_NTZ.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return spark.read.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface); returns them."""
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
