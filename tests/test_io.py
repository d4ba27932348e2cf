"""Format IO round-trips: csv/jsonl/parquet with explicit schemas, and the
partitioned-write file-sizing contract."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from weather_data_pipeline_spark.sources import io as eio
from weather_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_csv_roundtrip(spark, tmp_path):
    ev = _events(spark)
    path = f"{tmp_path}/csv"
    ev.write.option("header", True).csv(path)
    back = eio.read_csv(spark, path, ev.schema)
    assert back.count() == ev.count()
    assert back.schema == ev.schema
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_jsonl_roundtrip(spark, tmp_path):
    ev = _events(spark)
    path = f"{tmp_path}/jsonl"
    ev.write.json(path)
    back = eio.read_jsonl(spark, path, ev.schema)
    assert back.count() == ev.count()
    assert back.schema == ev.schema


def test_partitioned_write_prunes_and_sizes(spark, tmp_path):
    ev = _events(spark)
    path = f"{tmp_path}/part"
    eio.partitioned_write(
        ev, path, partition_by=["event_type"], files_per_partition=2
    )
    # layout: one dir per event_type, bounded file count inside
    dirs = glob.glob(f"{path}/event_type=*")
    assert len(dirs) == 5
    for d in dirs:
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert 1 <= len(files) <= 2, d
    back = spark.read.parquet(path)  # partition col folded into schema
    assert back.count() == ev.count()
    # a partition predicate must prune at the source
    plan = (
        back.filter(F.col("event_type") == "view")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_live_http_fetch_is_import_gated():
    """O1's live path (fetch_current) must not be required for any offline
    path: the requests import is function-local (module imports clean with
    no network stack), and the synthetic generator is the contract surface
    — its documents are byte-identical to the committed fixture."""
    import inspect
    import json
    import os

    from weather_data_pipeline_spark.sources import weather as wsrc

    src = inspect.getsource(wsrc.fetch_current)
    assert "import requests" in src  # gated inside the function...
    mod_src = inspect.getsource(wsrc)
    head = mod_src.split("def fetch_current")[0]
    assert "import requests" not in head  # ...never at module top level

    # synthetic generator ≡ committed fixture, byte for byte
    root = wsrc.ensure_fixture()
    date, city = wsrc.FIXTURE_DATES[0], wsrc.CITIES[0]
    with open(os.path.join(root, "data", date, f"{city}.txt")) as f:
        on_disk = json.load(f)
    assert on_disk == wsrc.synthesize_raw_doc(city, date)


def test_events_ts_unit_sniffing_all_units(spark, tmp_path):
    """The driver has regenerated events.parquet with different timestamp
    units across rounds (ns in r1-r4, µs in r5) — the round-5 regression
    shifted every event time 1000x and silently broke seven queries.
    Pin the footer-sniffing read path: identical wall-clock values must
    come back for ns, µs, and ms encodings of the same data."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weather_data_pipeline_spark.sources import testdata

    base = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    ts_vals = [base, base + dt.timedelta(hours=1, microseconds=789)]
    want = {(1, ts_vals[0]), (2, ts_vals[1])}
    for unit in ("ns", "us", "ms"):
        d = tmp_path / f"events_{unit}"
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts_vals, pa.timestamp(unit)),
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.5, 2.5], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        assert testdata.events_ts_unit(str(d)) == unit
        got = {
            (r.event_id, r.ts)
            for r in testdata.load_table(spark, str(d), "events").collect()
        }
        if unit == "ms":  # ms encoding already truncated sub-ms digits
            want_u = {(i, t.replace(microsecond=t.microsecond // 1000 * 1000))
                      for i, t in want}
        else:
            want_u = want
        assert got == want_u, unit


def test_events_ts_unit_cache_invalidates_on_regeneration(tmp_path):
    """The unit cache is keyed on the sniffed file's (path, mtime, size):
    regenerating events.parquet IN PLACE with a different unit — the
    driver does this between rounds — must re-sniff, not serve the stale
    unit (ADVICE r5 #3: a stale 'ns' entry reproduces the exact 1000x
    shift the sniffing exists to prevent)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from weather_data_pipeline_spark.sources import testdata

    d = tmp_path / "events_regen"
    d.mkdir()
    path = str(d / "events.parquet")

    def write(unit):
        pq.write_table(
            pa.table({"ts": pa.array([0], pa.timestamp(unit))}), path
        )

    write("ns")
    assert testdata.events_ts_unit(str(d)) == "ns"
    write("us")
    # same path, new content: force a distinct mtime even on coarse clocks
    os.utime(path, ns=(os.stat(path).st_atime_ns, os.stat(path).st_mtime_ns + 1))
    assert testdata.events_ts_unit(str(d)) == "us"


def test_corrupt_parquet_part_skipped_when_tolerated(spark, tmp_path):
    """A garbage part file in a table directory fails the strict scan but
    is SKIPPED (its rows lost, the job alive) with tolerate_corrupt=True —
    the 100 TB posture for one bad object among tens of thousands."""
    import shutil

    import pytest
    from py4j.protocol import Py4JJavaError

    from weather_data_pipeline_spark.sources import testdata

    d = tmp_path / "table"
    d.mkdir()
    tdir = d / "region.parquet"
    tdir.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet", tdir / "part-0.parquet")
    (tdir / "part-1.parquet").write_bytes(b"PAR1 this is not a real parquet file")

    with pytest.raises(Py4JJavaError):
        testdata.load_table(spark, str(d), "region").count()

    ok = testdata.load_table(spark, str(d), "region", tolerate_corrupt=True)
    assert ok.count() == 5  # the good part's 5 regions survive


def test_compact_small_files(spark, tmp_path):
    """200 tiny files → the byte-sized file count; rows and values
    survive the rewrite; the swap leaves no stray directories."""
    import glob
    import os

    from weather_data_pipeline_spark.sources.io import compact_small_files

    path = str(tmp_path / "frag")
    df = spark.range(20_000).selectExpr("id", "id * 2 AS v")
    df.repartition(200).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 200
    before = spark.read.parquet(path).selectExpr("sum(v)").collect()[0][0]

    n = compact_small_files(spark, path, target_file_bytes=512 * 1024)
    files = glob.glob(path + "/*.parquet")
    assert len(files) == n < 200
    assert spark.read.parquet(path).selectExpr("sum(v)").collect()[0][0] == before
    assert not glob.glob(str(tmp_path / "frag.old.*"))
    assert not glob.glob(str(tmp_path / "frag.compact.*"))


def test_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across ingest days: a later file adds a column;
    mergeSchema unions the schemas and back-fills nulls — and WITHOUT
    an explicit schema or mergeSchema, the scan silently picks ONE
    footer (the 100 TB trap this test documents: always pass the
    explicit evolved schema in production, sources/testdata.py
    convention)."""
    import os

    p1 = str(tmp_path / "day=1")
    p2 = str(tmp_path / "day=2")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p2)

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path)
    )
    assert set(merged.columns) == {"id", "v", "score", "day"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink/source parity with parquet — the engine's second
    columnar format; schema and values must survive the roundtrip."""
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_partsupp_derivation_matches_oracle_cte(spark):
    """The derived partsupp (sources/testdata.py::load_partsupp) and its
    DuckDB CTE twin (operators/tpch_partsupp.py::_PARTSUPP_CTE) must
    produce IDENTICAL rows — the five Q2/Q9/Q11/Q16/Q20 oracles all
    stand on this equivalence, so it gets its own direct value check
    (row-for-row, not through any downstream query)."""
    from tests.oracle_harness import compare
    from weather_data_pipeline_spark.operators.tpch_partsupp import (
        _PARTSUPP_CTE,
    )
    from weather_data_pipeline_spark.sources.testdata import load_partsupp

    compare(
        spark,
        "partsupp_derivation",
        lambda s, sf: load_partsupp(s, sf),
        f"WITH {_PARTSUPP_CTE} SELECT * FROM partsupp",
        "/root/testdata/sf0.01",
    )
