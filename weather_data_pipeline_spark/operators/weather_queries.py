"""Weather-path queries — the reference's own dataflow, oracle-checked.

These run the real weather shape end-to-end (raw JSON tree → flatten →
flagship), not a testdata stand-in: the fixture is the deterministic
synthetic raw layer from ``sources.weather`` (FIXTURES.md §A), committed
under ``fixtures/weather`` so the DuckDB oracle can scan the very same
files with ``read_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import weather as wsrc
from ..sources import csv_source as csvsrc
from ..transforms import CURRENT_SCALARS, flatten_raw
from .flagship import latest_per_key

FIXTURE_GLOB = f"{wsrc.FIXTURE_ROOT}/data/*/*.txt"

# No module-level fixture writes (importing the registry must be
# side-effect-free; ADVICE r2): the Spark fns materialize their own
# fixtures, and registry.oracle_sql() materializes both trees before any
# DuckDB glob can run.

_STAGED_COLS_SQL = ",\n       ".join(
    [
        "location.name AS city",
        "location.region AS region",
        "location.country AS country",
        "location.lat AS lat",
        "location.lon AS lon",
        "location.tz_id AS tz_id",
        "location.localtime_epoch AS localtime_epoch",
        "strptime(location.\"localtime\", '%Y-%m-%d %H:%M') AS localtime",
    ]
    + [f"current.{c} AS {c}" for c in CURRENT_SCALARS]
    + [
        "current.condition.text AS condition",
        "regexp_extract(filename, '(\\d{4}-\\d{2}-\\d{2})', 1) AS ingest_date",
    ]
)

_STAGED_SQL = f"""
    SELECT {_STAGED_COLS_SQL}
    FROM read_json('{FIXTURE_GLOB}', filename=true)
"""


def _staged(spark: SparkSession) -> DataFrame:
    root = wsrc.ensure_fixture()
    return flatten_raw(wsrc.read_raw(spark, root), with_ingest_date=True)


@query("w_flatten_stage", oracle=_STAGED_SQL)
def w_flatten_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+O9+O10+O11+O19 on the true weather shape: schema-full JSON scan →
    31-col staged table + path-derived ingest_date (one narrow projection,
    reference weather_etl.py:62-90)."""
    return _staged(spark)


@query("w_api_source", oracle=_STAGED_SQL)
def w_api_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 as a custom Spark 4 Python DataSource (``format("weather_api")``,
    ``sources/api_source.py``): one InputPartition per (city, day), fetch
    parallelism = cluster width instead of the reference's serial driver
    loop (weather_etl.py:35-37). Synthetic mode generates documents
    byte-identical to the committed fixture, so the oracle is the same
    ``read_json`` staged SQL as ``w_flatten_stage``."""
    from ..sources import api_source

    api_source.register(spark)
    return flatten_raw(
        spark.read.format("weather_api").load(), with_ingest_date=True
    )


@query(
    "w_flagship_latest",
    oracle=f"""
    WITH staged AS ({_STAGED_SQL})
    SELECT city, localtime, localtime_epoch, temp_c, condition FROM (
      SELECT s.*, ROW_NUMBER() OVER (
        PARTITION BY city ORDER BY localtime DESC, localtime_epoch DESC) AS rn
      FROM staged s
    ) WHERE rn = 1
    """,
)
def w_flagship_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15 on the weather shape — the reference's flagship SQL
    (weather_etl.py:145) verbatim semantics: most recent snapshot per city
    across all raw-layer days."""
    return latest_per_key(
        _staged(spark), key="city", order="localtime", tiebreak="localtime_epoch"
    ).select("city", "localtime", "localtime_epoch", "temp_c", "condition")


@query(
    "w_corrupt_quarantine",
    oracle=f"""
    SELECT regexp_extract(filename, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1)
             AS ingest_date,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN NOT json_valid(content) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN json_valid(content)
                     AND json_extract_string(content, '$.location.name')
                         IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           -- rtrim strips FRAMING only (the line terminator Spark's
           -- line-split never hands to _corrupt); trailing spaces are
           -- content and stay in the digested bytes on both engines.
           MIN(CASE WHEN NOT json_valid(content)
                    THEN md5(rtrim(content, chr(10) || chr(13))) END)
             AS quarantine_digest
    FROM read_text('{wsrc.CORRUPT_FIXTURE_ROOT}/data/*/*.txt')
    GROUP BY 1
    """,
)
def w_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3's permissive fallback, driver-visible: a raw tree with injected
    malformed documents scans without failing; unparseable docs land
    intact in ``_corrupt`` (digest-checked against the oracle's bytes),
    while a syntactically-valid doc missing every field is sparse data,
    NOT corruption — the quarantine rule is JSON syntax, exactly
    DuckDB's ``json_valid``. At 100 TB this is the difference between
    quarantining one upstream file and losing a day's batch."""
    root = wsrc.ensure_corrupt_fixture()
    df = wsrc.read_raw(spark, root, permissive=True).withColumn(
        "file", F.input_file_name()
    )
    corrupt = F.col("_corrupt").isNotNull()
    return df.groupBy(
        F.regexp_extract("file", r"(\d{4}-\d{2}-\d{2})", 1).alias("ingest_date")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(corrupt.cast("long")).alias("n_quarantined"),
        # a real data column in the plan also satisfies Spark's rule that a
        # raw-JSON query may not reference the corrupt column alone
        F.sum(F.col("location.name").isNotNull().cast("long")).alias("n_parsed"),
        F.min(F.when(corrupt, F.md5("_corrupt"))).alias("quarantine_digest"),
    )


_CITY_CASE = " ".join(
    f"WHEN '{c}' THEN {i}" for i, c in enumerate(wsrc.CITIES)
)


@query(
    "w_city_encode",
    oracle=f"""
    WITH staged AS ({_STAGED_SQL})
    SELECT city, ingest_date, CASE city {_CITY_CASE} END AS city_code
    FROM staged
    """,
)
def w_city_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24 on the weather shape: the reference's literal city→code dict
    (weather_etl.py:112-122) as a MapType literal — null on unseen city,
    exactly like pandas .map."""
    m = F.create_map(
        *[F.lit(x) for i, c in enumerate(wsrc.CITIES) for x in (c, i)]
    )
    return _staged(spark).select(
        "city", "ingest_date", m[F.col("city")].alias("city_code")
    )


@query(
    "w_csv_quarantine",
    oracle=f"""
    SELECT regexp_extract(filename, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1)
             AS ingest_date,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           ROUND(CAST(SUM(CASE WHEN ok THEN
                 CAST(string_split(line, ',')[2] AS DECIMAL(18,2)) END)
               AS DOUBLE), 2) AS temp_sum,
           MIN(CASE WHEN NOT ok THEN md5(line) END) AS quarantine_digest
    FROM (
      SELECT filename, content AS line,
             len(string_split(content, ',')) >= 3
               AND TRY_CAST(string_split(content, ',')[2] AS DOUBLE)
                   IS NOT NULL AS ok
      FROM read_csv('{csvsrc.CSV_FIXTURE_ROOT}/data/*/*.csv',
                    delim=chr(1), header=false, filename=true,
                    columns={{'content': 'VARCHAR'}})
    )
    GROUP BY 1
    """,
)
def w_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3's permissive fallback for CSV feeds: malformed rows (wrong
    arity, unparseable measurement) land intact in ``_corrupt`` —
    digest-checked against the oracle's raw line bytes — while valid
    rows aggregate normally. The quarantine rule both engines enforce:
    at least 3 fields and a numeric measurement (extra trailing fields
    are dropped by the parser, not corruption); Spark's univocity
    parser and the oracle's split-and-TRY_CAST verdicts are pinned
    row-by-row by the fixture (sources/csv_source.py CSV_ROWS)."""
    root = csvsrc.ensure_csv_fixture()
    df = csvsrc.read_csv_permissive(spark, root).withColumn(
        "file", F.input_file_name()
    )
    corrupt = F.col("_corrupt").isNotNull()
    return df.groupBy(
        F.regexp_extract("file", r"(\d{4}-\d{2}-\d{2})", 1).alias("ingest_date")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(corrupt.cast("long")).alias("n_quarantined"),
        F.round(
            F.sum(
                F.when(~corrupt, F.col("temp_c").cast("decimal(18,2)"))
            ).cast("double"),
            2,
        ).alias("temp_sum"),
        F.min(F.when(corrupt, F.md5("_corrupt"))).alias("quarantine_digest"),
    )


@query(
    "w_orc_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def w_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format coverage for ORC, Spark's second native columnar
    format (built-in reader/writer, predicate pushdown, vectorized
    scan — the format a Hive-era lake hands us): the events table is
    written to ORC and read back, and the round-tripped copy must
    aggregate IDENTICALLY to the parquet original the oracle reads —
    types (including TIMESTAMP_NTZ), values, and decimal sums all
    survive the format boundary. At 100 TB the same two-liner is the
    parquet↔ORC migration path; nothing in the engine is
    parquet-specific."""
    import os

    from ..streaming.jobs import SCRATCH

    from ..sources.testdata import load_table

    # Deterministic per-sf_dir path (overwrite mode handles reruns) so
    # repeated bench/verify sweeps reuse one directory instead of
    # accumulating unbounded uuid-named scratch copies.
    slug = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(SCRATCH, f"orc_roundtrip_{slug}")
    load_table(spark, sf_dir, "events").write.mode("overwrite").orc(path)
    ev = spark.read.orc(path)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )
