"""X5 — JSON property extraction (SURVEY.md §2.10).

The reference's raw layer is JSON documents (weather_etl.py:63-69); the
testdata analog is the ``events.props`` JSON string column. Two paths:

- ``get_json_object`` — per-field path extraction, no schema needed;
- ``from_json`` — schema-full parse to a struct (the scale path: parse
  once, read many fields, columnar after the parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.testdata import load_table


@query(
    "x5_json_get_path",
    oracle="""
    SELECT event_id, props,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def x5_json_get_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "props",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "x5_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def x5_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full parse — one JSON decode per row, then columnar access."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id", F.from_json("props", schema).getField("k").alias("k_val")
    )


@query(
    "x5_json_extract_agg",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
    """,
)
def x5_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract → aggregate: the JSON parse happens before the shuffle, so
    only the small (k_bucket, partial-agg) rows move."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
    )


@query(
    "x5_json_keys_profile",
    oracle="""
    WITH kv AS (
      SELECT e.event_id,
             unnest(json_keys(e.props)) AS key
      FROM events e
    )
    SELECT key,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT json_extract_string(e2.props, '$.' || key))
             AS n_distinct_values,
           MIN(CAST(json_extract_string(e2.props, '$.' || key) AS DOUBLE))
             AS min_num,
           MAX(CAST(json_extract_string(e2.props, '$.' || key) AS DOUBLE))
             AS max_num
    FROM kv JOIN events e2 USING (event_id)
    GROUP BY key
    """,
)
def x5_json_keys_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profiling for semi-structured data: discover the key set
    of a JSON column and per-key stats (row coverage, value
    cardinality, numeric range) WITHOUT declaring a schema first — the
    step before ``from_json`` in any pipeline onboarding an unknown
    feed. ``json_object_keys`` + explode keeps the parse JVM-side; the
    aggregation shuffles only (key, value) pairs, and at 100 TB the
    output is bounded by the key vocabulary, not the row count."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        "props",
        F.explode(F.json_object_keys("props")).alias("key"),
    ).select(
        "key",
        F.expr("get_json_object(props, concat('$.', key))").alias("val"),
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("val").alias("n_distinct_values"),
        F.min(F.col("val").cast("double")).alias("min_num"),
        F.max(F.col("val").cast("double")).alias("max_num"),
    )


# ----------------------------------------------------------------------
# Schema-evolution-tolerant JSON read (round 8)
# ----------------------------------------------------------------------
@query(
    "x5_schema_evolution_read",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
                    THEN 0 ELSE 1 END) AS BIGINT) AS k_present,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.schema_v2_field')
                    IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS v2_present,
           CAST(SUM(CAST(TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT) AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events GROUP BY event_type
    """,
)
def x5_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-tolerant JSON ingestion: parse ``props``
    against a WIDER target schema than today's payloads carry (the
    current field ``k`` plus a future ``schema_v2_field``) and report
    per event type how much of each field is actually populated — the
    read pattern that lets producers add fields before consumers
    deploy, and consumers deploy before producers emit (both
    directions of JSON schema evolution). ``from_json`` with an
    explicit wider StructType fills missing fields with NULL instead
    of failing, exactly like parquet mergeSchema for columnar data;
    the coverage counts are the dashboard that tracks a field's
    rollout. One partial-aggregated exchange; the parse is scan-side."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    wider = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("schema_v2_field", T.StringType()),
        ]
    )
    p = ev.select(
        "event_type", F.from_json("props", wider).alias("p")
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("p.k").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("k_present"),
        F.sum(
            F.when(F.col("p.schema_v2_field").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("v2_present"),
        F.sum("p.k").cast("long").alias("k_sum"),
    )


# ----------------------------------------------------------------------
# VariantType semi-structured handling (round 8): Spark 4 native JSON
# ----------------------------------------------------------------------
@query(
    "x5_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           COUNT(DISTINCT list_sort(json_keys(props))) AS n_shapes
    FROM events GROUP BY event_type
    """,
)
def x5_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's native
    ``VariantType`` — ``parse_json`` once into the binary variant
    encoding, then typed ``variant_get`` path extraction and
    ``schema_of_variant`` shape profiling. Versus string-based
    ``get_json_object`` (the O8/X5 baseline), the variant parses each
    document ONCE into a binary form that all downstream path reads
    share — the engine-native answer to repeated JSON probing, and the
    same storage layout Delta/Iceberg variant columns use at rest. The
    oracle recomputes identical aggregates with DuckDB's JSON
    functions. Shape profiling is normalized to the sorted TOP-LEVEL
    KEY SET per document (ADVICE r8: Spark's ``schema_of_variant``
    and DuckDB's ``json_structure`` sit on different type lattices —
    e.g. UBIGINT/BIGINT splits — so a typed-structure distinct count
    can diverge on data the fixture merely happens not to contain;
    key sets are lattice-free and engine-exact). One
    partial-aggregated exchange; the parse is scan-side."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.parse_json("props").alias("v"),
        F.array_sort(F.json_object_keys("props")).alias("keyset"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.variant_get(F.col("v"), "$.k", "long"))
        .cast("long")
        .alias("k_sum"),
        F.min(F.variant_get(F.col("v"), "$.k", "long"))
        .cast("long")
        .alias("k_min"),
        F.max(F.variant_get(F.col("v"), "$.k", "long"))
        .cast("long")
        .alias("k_max"),
        F.countDistinct(F.col("keyset")).alias("n_shapes"),
    )
