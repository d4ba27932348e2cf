"""Explicit schemas — never infer at scale (SURVEY.md §1.2).

Two families:
- ``WEATHER_RAW``: the reference's raw JSON record shape
  (reference ``airflow/data/2023-08-11/London.txt``; FIXTURES.md §A).
- ``TESTDATA``: the driver's synthetic tables (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Weather raw record (reference weather_etl.py:62-90 consumes this shape).
# --------------------------------------------------------------------------

CONDITION = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("icon", T.StringType()),
        T.StructField("code", T.IntegerType()),
    ]
)

LOCATION = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("tz_id", T.StringType()),
        T.StructField("localtime_epoch", T.LongType()),
        # 'yyyy-MM-dd H:mm' — hour NOT zero-padded ("2023-08-11 2:46").
        T.StructField("localtime", T.StringType()),
    ]
)

CURRENT = T.StructType(
    [
        T.StructField("last_updated_epoch", T.LongType()),
        T.StructField("last_updated", T.StringType()),
        T.StructField("temp_c", T.DoubleType()),
        T.StructField("temp_f", T.DoubleType()),
        T.StructField("is_day", T.IntegerType()),
        T.StructField("condition", CONDITION),
        T.StructField("wind_mph", T.DoubleType()),
        T.StructField("wind_kph", T.DoubleType()),
        T.StructField("wind_degree", T.IntegerType()),
        T.StructField("wind_dir", T.StringType()),
        T.StructField("pressure_mb", T.DoubleType()),
        T.StructField("pressure_in", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
        T.StructField("precip_in", T.DoubleType()),
        T.StructField("humidity", T.IntegerType()),
        T.StructField("cloud", T.IntegerType()),
        T.StructField("feelslike_c", T.DoubleType()),
        T.StructField("feelslike_f", T.DoubleType()),
        T.StructField("vis_km", T.DoubleType()),
        T.StructField("vis_miles", T.DoubleType()),
        T.StructField("uv", T.DoubleType()),
        T.StructField("gust_mph", T.DoubleType()),
        T.StructField("gust_kph", T.DoubleType()),
    ]
)

WEATHER_RAW = T.StructType(
    [T.StructField("location", LOCATION), T.StructField("current", CURRENT)]
)

#: Numeric feature columns used by the ML stage (reference weather_etl.py:111,124:
#: all staged numerics except the label temp_c; wind_dir/condition are strings
#: and dropped there).
ML_FEATURES = [
    "lat",
    "lon",
    "localtime_epoch",
    "temp_f",
    "is_day",
    "wind_mph",
    "wind_kph",
    "wind_degree",
    "pressure_mb",
    "pressure_in",
    "precip_mm",
    "precip_in",
    "humidity",
    "cloud",
    "feelslike_c",
    "feelslike_f",
    "vis_km",
    "vis_miles",
    "uv",
    "gust_mph",
    "gust_kph",
]
ML_LABEL = "temp_c"

# --------------------------------------------------------------------------
# Driver synthetic tables (FIXTURES.md §B) — explicit so scans never infer.
# --------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    # Timestamps are TIMESTAMP_NTZ: the driver parquet stores naive
    # (tz-less) ms/ns instants, and NTZ keeps values identical regardless
    # of any session timezone — the safest choice for oracle comparison.
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # events.ts unit varies by testdata generation (ns in rounds 1-4, µs
    # since round 5) — sources.testdata sniffs ONE parquet footer and
    # picks the read path: ns → raw int64 scan with this schema
    # (spark.sql.legacy.parquet.nanosAsLong) + exact integer div to µs
    # (matching DuckDB's ns→µs truncation); µs/ms → native TIMESTAMP_NTZ
    # scan (EVENTS_TS_NTZ).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA)
