"""Readers for the driver's synthetic parquet tables (TESTDATA.md).

Explicit schemas (schemas.TESTDATA) so the scan never pays footer-based
inference across many files — at 100 TB a table is tens of thousands of
files and schema inference is a full metadata pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TESTDATA

#: events schema for µs/ms-unit parquet (ts read natively as NTZ).
EVENTS_TS_NTZ = T.StructType(
    [
        T.StructField(f.name, T.TimestampNTZType() if f.name == "ts" else f.dataType)
        for f in TESTDATA["events"].fields
    ]
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: cache of the events.ts parquet unit ('ns'|'us'|'ms'), keyed on the
#: sniffed file's (path, mtime_ns, size) so an in-place regeneration —
#: the driver rewrites testdata between rounds — invalidates the entry
#: instead of reproducing the exact 1000× shift this sniffing prevents
#: (ADVICE r5 #3). One footer read per distinct file version.
_EVENTS_TS_UNIT: dict[tuple[str, int, int], str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Sniff the physical timestamp unit of events.ts from ONE parquet
    footer. The driver has regenerated testdata with different units
    across rounds (nanos → micros in round 5); assuming a unit silently
    shifts every timestamp by 1000× (round-5 regression: seven events-
    table oracle parities went red). One footer read per file version,
    cached — NOT schema inference over the whole file set."""
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):  # directory-of-parts layout
        path = next(
            e.path for e in os.scandir(path) if e.name.endswith(".parquet")
        )
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if key not in _EVENTS_TS_UNIT:
        import pyarrow.parquet as pq

        t = pq.read_schema(path).field("ts").type
        _EVENTS_TS_UNIT[key] = getattr(t, "unit", "ns")
    return _EVENTS_TS_UNIT[key]


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tolerate_corrupt: bool = False,
) -> DataFrame:
    """Load one synthetic table as a DataFrame (columnar scan, pushdown-ready).

    ``tolerate_corrupt=True`` sets ``ignoreCorruptFiles`` on the scan so a
    truncated/garbage parquet part is SKIPPED instead of failing the job —
    the batch-read twin of the weather path's permissive-JSON quarantine
    and the posture a 100 TB lake needs (one bad object out of tens of
    thousands of files must cost its own rows, not the day's run). Off by
    default: silently dropping files is only acceptable when the caller
    opted in (test-pinned in tests/test_io.py)."""
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    reader = (
        spark.read.option("ignoreCorruptFiles", "true")
        if tolerate_corrupt
        else spark.read
    )
    if name == "events":
        if events_ts_unit(sf_dir) == "ns":
            # parquet TIMESTAMP(NANOS) is unreadable by Spark's timestamp
            # types; scan as int64 nanos, truncate to µs with exact integer
            # division (matches DuckDB's ns→µs behavior), expose as
            # TIMESTAMP_NTZ.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = reader.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")
            return df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        # µs/ms: Spark reads these natively; declare ts TIMESTAMP_NTZ in
        # the explicit scan schema (still no footer-inference data pass).
        return reader.schema(EVENTS_TS_NTZ).parquet(f"{sf_dir}/{name}.parquet")
    return reader.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface); returns them."""
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load_partsupp(
    spark: SparkSession,
    sf_dir: str,
    partkeys: DataFrame | None = None,
    suppkeys: DataFrame | None = None,
) -> DataFrame:
    """DERIVED partsupp — the testdata ships none (SURVEY.md §8), so the
    TPC-H Q2/Q9/Q11/Q16/Q20 shapes synthesize it deterministically: the
    distinct (l_partkey, l_suppkey) pairs actually traded, with
    availqty and supplycost from pure integer modular arithmetic over
    the keys (no hash functions, no RNG, no floats — bit-identical on
    any engine; operators/tpch_partsupp.py::_PARTSUPP_CTE is the DuckDB
    twin and tests/test_io.py value-checks the two against each other).
    Supplycost is kept in integer CENTS so downstream money math stays
    exact until the output boundary.

    Scale shape: one partial-aggregated distinct shuffle over two
    BIGINT columns — at 100 TB this is the |pairs| keyspace, not the
    fact table, and queries joining it back to lineitem reuse the same
    (partkey, suppkey) partitioning.

    ``partkeys`` / ``suppkeys`` (optional single-column DataFrames)
    prune the pair stream BELOW the distinct with broadcast LEFT SEMI
    joins — valid because filtering on the distinct keys commutes with
    distinct — so a query that only needs one part/supplier slice never
    pays the full-keyspace shuffle (Catalyst cannot push a post-distinct
    join below the aggregation itself; callers pass their dim filter
    here instead)."""
    pairs = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    if partkeys is not None:
        pairs = pairs.join(
            F.broadcast(partkeys),
            F.col("ps_partkey") == F.col(partkeys.columns[0]),
            "left_semi",
        )
    if suppkeys is not None:
        pairs = pairs.join(
            F.broadcast(suppkeys),
            F.col("ps_suppkey") == F.col(suppkeys.columns[0]),
            "left_semi",
        )
    pairs = pairs.distinct()
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 100000 + 1
        ).alias("ps_supplycost_cents"),
    )
