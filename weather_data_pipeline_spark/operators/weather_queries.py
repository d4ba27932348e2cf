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
from ..transforms import CURRENT_SCALARS, flatten_raw
from .flagship import latest_per_key

FIXTURE_GLOB = f"{wsrc.FIXTURE_ROOT}/data/*/*.txt"

# The registry imports this module before any oracle SQL can run, so the
# fixture provably exists by the time DuckDB scans it.
wsrc.ensure_fixture()

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
