"""Reference projection/filter/scalar surface (SURVEY.md §2.2, §2.4, §2.5).

Each query re-expresses one reference operator over the driver's testdata
tables (FIXTURES.md §B role mapping), always via declarative DataFrame ops
so Catalyst gets pushdown/pruning for free. Reference citations are to
``/root/reference/weather_etl.py`` unless noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table


# ----------------------------------------------------------------------
# O9/O10/O17 — nested-struct flatten, doubly-nested extraction
# ----------------------------------------------------------------------
@query(
    "o9_nested_flatten",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag AS flag, l_quantity
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def o9_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the reference's nested record shape (location/current/condition,
    weather_etl.py:72-83) then flatten with ``select(struct.*)`` — the Spark
    form of pandas' per-struct frame + horizontal concat (O9/O17), plus
    doubly-nested field extraction (O10, weather_etl.py:79)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    nested = li.select(
        F.struct("l_orderkey", "l_linenumber").alias("location"),
        F.struct(
            F.struct(F.col("l_returnflag").alias("text")).alias("condition"),
            F.col("l_quantity"),
        ).alias("current"),
    )
    return nested.select(
        F.col("location.l_orderkey").alias("l_orderkey"),
        F.col("location.l_linenumber").alias("l_linenumber"),
        F.col("current.condition.text").alias("flag"),
        F.col("current.l_quantity").alias("l_quantity"),
    )


# ----------------------------------------------------------------------
# O11 — column rename (name → city, weather_etl.py:88)
# ----------------------------------------------------------------------
@query(
    "o11_rename",
    oracle="SELECT c_custkey AS id, c_name AS city, c_acctbal AS balance FROM customer",
)
def o11_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "id")
        .withColumnRenamed("c_name", "city")
        .withColumnRenamed("c_acctbal", "balance")
        .select("id", "city", "balance")
    )


# ----------------------------------------------------------------------
# O12 — column drop / projection (weather_etl.py:111,147)
# ----------------------------------------------------------------------
@query(
    "o12_projection",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def o12_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop() projection — Catalyst prunes the parquet scan to 3 columns."""
    return load_table(spark, sf_dir, "part").drop("p_brand", "p_type", "p_size")


# ----------------------------------------------------------------------
# O13 — equality filter (app/app.py:25-28 serving predicate)
# ----------------------------------------------------------------------
@query(
    "o13_filter_eq",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
)
def o13_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


# ----------------------------------------------------------------------
# O18/O23 — aligned computed columns + abs error (weather_etl.py:135-137)
# ----------------------------------------------------------------------
@query(
    "o18_column_zip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS actual,
           ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(0.9 AS DECIMAL(2,1)) AS DOUBLE), 3) AS predicted,
           ROUND(CAST(ABS(CAST(l_extendedprice AS DECIMAL(18,2))
               - CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(0.9 AS DECIMAL(2,1))) AS DOUBLE), 3) AS abs_err
    FROM lineitem
    """,
)
def o18_column_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference zips (city, actual, predicted, error) lists positionally
    (weather_etl.py:135); keyed selects are the distributed restatement.

    Arithmetic is done in exact decimals (cast once from the stored double,
    then decimal × decimal) — a double multiply followed by a decimal cast
    is not portable across engines near the .xx5 rounding boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    pred = p * F.expr("CAST(0.9 AS DECIMAL(2,1))")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("actual"),
        F.round(pred.cast("double"), 3).alias("predicted"),
        F.round(F.abs(p - pred).cast("double"), 3).alias("abs_err"),
    )


# ----------------------------------------------------------------------
# O19 — string→timestamp parse with non-zero-padded hour (weather_etl.py:89)
# ----------------------------------------------------------------------
@query(
    "o19_parse_nonpadded_hour",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %-H:%M') AS raw,
           strptime(strftime(ts, '%Y-%m-%d %-H:%M'), '%Y-%m-%d %H:%M') AS parsed
    FROM events
    """,
)
def o19_parse_nonpadded_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the reference's 'yyyy-MM-dd H:mm' localtime format
    (single-digit hour, SURVEY.md §7.4.1)."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.date_format("ts", "yyyy-MM-dd H:mm")
    return ev.select(
        "event_id",
        raw.alias("raw"),
        F.to_timestamp(raw, "yyyy-MM-dd H:mm").cast("timestamp_ntz").alias("parsed"),
    )


# ----------------------------------------------------------------------
# O20 — epoch ↔ timestamp (weather_etl.py:169)
# ----------------------------------------------------------------------
@query(
    "o20_epoch_roundtrip",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, make_timestamp(epoch_us(ts)) AS ts2
    FROM events
    """,
)
def o20_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        us.alias("ts_us"),
        F.timestamp_micros(us).cast("timestamp_ntz").alias("ts2"),
    )


# ----------------------------------------------------------------------
# O21 — timestamp→string cast for serialization (app/app.py:22)
# ----------------------------------------------------------------------
@query(
    "o21_ts_to_string",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate_str
    FROM orders
    """,
)
def o21_ts_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate_str"),
    )


# ----------------------------------------------------------------------
# O22 — epoch arithmetic: shift one day forward (weather_etl.py:159)
# ----------------------------------------------------------------------
@query(
    "o22_epoch_shift_day",
    oracle="""
    SELECT event_id, ts,
           make_timestamp(epoch_us(ts) + 86400000000) AS ts_next_day
    FROM events
    """,
)
def o22_epoch_shift_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    shifted = F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(86400 * 1_000_000)
    return ev.select(
        "event_id",
        "ts",
        F.timestamp_micros(shifted).cast("timestamp_ntz").alias("ts_next_day"),
    )


# ----------------------------------------------------------------------
# O24/O25 — dict-map categorical encode / decode (weather_etl.py:112-122)
# ----------------------------------------------------------------------
_EVENT_CODES = {"click": 0, "view": 1, "purchase": 2, "signup": 3, "error": 4}


@query(
    "o24_map_encode",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                WHEN 'error' THEN 4 END AS type_code
    FROM events
    """,
)
def o24_map_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-map getitem: null on miss, exactly like pandas ``.map``
    (weather_etl.py:112-122). A MapType literal stays whole-stage-codegen'd;
    for large dims the same op is a broadcast join (ext_lookup_join)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(*[F.lit(x) for kv in _EVENT_CODES.items() for x in kv])
    return ev.select(
        "event_id", "event_type", m[F.col("event_type")].alias("type_code")
    )


@query(
    "o25_map_decode",
    oracle="""
    SELECT event_id, code,
           CASE code WHEN 0 THEN 'click' WHEN 1 THEN 'view' WHEN 2 THEN 'purchase'
                WHEN 3 THEN 'signup' WHEN 4 THEN 'error' END AS decoded
    FROM (SELECT event_id,
                 CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                      WHEN 'error' THEN 4 END AS code
          FROM events)
    """,
)
def o25_map_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse mapping (weather_etl.py:130-134) — same primitive, inverted."""
    ev = load_table(spark, sf_dir, "events")
    enc = F.create_map(*[F.lit(x) for kv in _EVENT_CODES.items() for x in kv])
    dec = F.create_map(
        *[F.lit(x) for k, v in _EVENT_CODES.items() for x in (v, k)]
    )
    coded = ev.select("event_id", enc[F.col("event_type")].alias("code"))
    return coded.select("event_id", "code", dec[F.col("code")].alias("decoded"))


# ----------------------------------------------------------------------
# O26 — date formatting / date math / string templating (weather_etl.py:142-144)
# ----------------------------------------------------------------------
@query(
    "o26_date_math",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           o_orderdate + INTERVAL 1 DAY AS next_day,
           replace(strftime(o_orderdate, '%Y-%m-%d'), '-', '_') AS table_suffix
    FROM orders
    """,
)
def o26_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """now()+1day → strftime → '-'→'_' templating, distributed per row."""
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        F.expr("replace(date_format(o_orderdate, 'yyyy-MM-dd'), '-', '_')").alias(
            "table_suffix"
        ),
    )


# ----------------------------------------------------------------------
# O16 — vertical union (pd.concat, weather_etl.py:82-83)
# ----------------------------------------------------------------------
@query(
    "o16_union_all",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    """,
)
def o16_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return views.unionByName(clicks)
