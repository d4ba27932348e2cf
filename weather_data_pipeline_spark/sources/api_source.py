"""O1 at scale — a Spark 4 Python DataSource for weather-API ingest.

The reference fetches one city at a time in a driver loop
(reference weather_etl.py:35-37): fine for 9 cities, serial and
driver-bound at ingest scale. This module re-expresses O1 as a custom
``pyspark.sql.datasource.DataSource`` (``format("weather_api")``) whose
unit of parallelism is one (city, date) snapshot: Spark schedules each
``InputPartition`` on an executor, so fetch concurrency is cluster
width, not a driver loop, and retries/speculation are task-level for
free (the reference leans on Airflow retries instead,
weather_data_dag.py:16-17).

Two modes, selected by ``option("mode", ...)``:

- ``synthetic`` (default): each partition *generates* its document with
  the deterministic generator in ``sources.weather`` — byte-identical
  to the committed fixture, so the whole path is oracle-checkable
  offline (this container has no network).
- ``http``: each partition performs the live GET the reference does
  (import-gated on ``requests``; needs ``option("api_key", ...)`` or
  ``$WEATHER_API_KEY``).

Rows surface as the raw nested shape (location, current) plus
``ingest_date``, so the standard ``transforms.flatten_raw`` staging
projection applies unchanged downstream.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import WEATHER_RAW
from . import weather as wsrc

#: Source schema: the raw record plus the partition-carried ingest date.
WEATHER_API_SCHEMA = T.StructType(
    list(WEATHER_RAW.fields) + [T.StructField("ingest_date", T.StringType())]
)


def _to_tuple(value: object, dtype: T.DataType) -> object:
    """Recursively shape a parsed-JSON dict into the tuple layout the
    DataSource row serializer expects for ``dtype``."""
    if isinstance(dtype, T.StructType):
        return tuple(_to_tuple(value.get(f.name), f.dataType) for f in dtype.fields)
    return value


class _SnapshotPartition(InputPartition):
    """One (city, date) snapshot — the unit of fetch parallelism."""

    def __init__(self, city: str, date: str):
        self.city = city
        self.date = date


class WeatherApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.mode = options.get("mode", "synthetic")
        self.cities = [
            c for c in options.get("cities", ",".join(wsrc.CITIES)).split(",") if c
        ]
        self.dates = [
            d
            for d in options.get("dates", ",".join(wsrc.FIXTURE_DATES)).split(",")
            if d
        ]
        self.api_key = options.get("api_key", "")

    def partitions(self) -> list[InputPartition]:
        return [
            _SnapshotPartition(city, date)
            for date in self.dates
            for city in self.cities
        ]

    def read(self, partition: _SnapshotPartition) -> Iterator[tuple]:
        if self.mode == "http":
            doc = wsrc.fetch_current([partition.city], api_key=self.api_key)[0]
        else:
            doc = wsrc.synthesize_raw_doc(partition.city, partition.date)
        yield (
            _to_tuple(doc["location"], WEATHER_RAW["location"].dataType),
            _to_tuple(doc["current"], WEATHER_RAW["current"].dataType),
            partition.date,
        )


class WeatherApiDataSource(DataSource):
    """``spark.read.format("weather_api")`` — register first with
    ``spark.dataSource.register(WeatherApiDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> T.StructType:
        return WEATHER_API_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return WeatherApiReader(self.options)

    def simpleStreamReader(self, schema: T.StructType):
        return WeatherApiStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(WeatherApiDataSource)


# ----------------------------------------------------------------------
# Streaming variant (round 8): the API as an unbounded snapshot stream
# ----------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class WeatherApiStreamReader(SimpleDataSourceStreamReader):
    """Offset = index into the date axis: each micro-batch delivers ONE
    ingest day's snapshots for every city (the shape a scheduled
    ingest produces — the O32 daily pickup as a true streaming
    source). ``read`` advances one day per batch; ``readBetweenOffsets``
    regenerates any replayed range deterministically (synthetic mode is
    a pure function of (city, date)), which is exactly the replay
    contract Structured Streaming recovery needs."""

    def __init__(self, options: dict):
        self.cities = [
            c for c in options.get("cities", ",".join(wsrc.CITIES)).split(",") if c
        ]
        self.dates = [
            d
            for d in options.get("dates", ",".join(wsrc.FIXTURE_DATES)).split(",")
            if d
        ]

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, date: str) -> list:
        # a LIST, not a generator: the runner pickles the prefetched
        # rows between the driver-side plan and the executors, and
        # generators don't pickle
        return [
            (
                _to_tuple(doc["location"], WEATHER_RAW["location"].dataType),
                _to_tuple(doc["current"], WEATHER_RAW["current"].dataType),
                date,
            )
            for city in self.cities
            for doc in [wsrc.synthesize_raw_doc(city, date)]
        ]

    def read(self, start: dict):
        i = start["i"]
        if i >= len(self.dates):
            return iter([]), start
        # iter() over a materialized list: the prefetch cache calls
        # next() on it (so a bare list fails) but also pickles it for
        # the executors (so a generator fails) — a list_iterator
        # satisfies both
        return iter(self._rows(self.dates[i])), {"i": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list:
        out: list = []
        for i in range(start["i"], min(end["i"], len(self.dates))):
            out.extend(self._rows(self.dates[i]))
        return out
