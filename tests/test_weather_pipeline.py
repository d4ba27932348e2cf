"""End-to-end weather pipeline: raw JSON tree → staged → curated table →
flagship → serving (reference lifecycle §3.1-3.3, restated Spark-first)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark import pipeline
from weather_data_pipeline_spark.sources import weather as wsrc
from weather_data_pipeline_spark.transforms import flatten_raw


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wx"))
    table = "weather.weather_test"
    spark.sql("DROP TABLE IF EXISTS weather.weather_test")
    pipeline.extract_to_raw(root)
    staged = pipeline.stage(spark, root)
    pipeline.curate(spark, staged, table=table, path=f"{root}/curated")
    return table


def test_fixture_deterministic(tmp_path):
    """Two generations are byte-identical (the committed fixture is stable)."""
    a, b = tmp_path / "a", tmp_path / "b"
    wsrc.write_raw_docs(wsrc.synthesize_raw_docs(), str(a))
    wsrc.write_raw_docs(wsrc.synthesize_raw_docs(), str(b))
    fa = sorted(p.relative_to(a) for p in a.rglob("*.txt"))
    assert len(fa) == 27
    for rel in fa:
        assert (a / rel).read_bytes() == (b / rel).read_bytes()


def test_staged_schema(spark):
    staged = flatten_raw(wsrc.read_raw(spark, wsrc.ensure_fixture()))
    assert len(staged.columns) == 31  # FIXTURES.md §A flattened schema
    assert staged.columns[0] == "city"
    assert dict(staged.dtypes)["localtime"] == "timestamp_ntz"
    assert staged.count() == 27
    # H:mm single-digit hours parsed, none lost
    assert staged.filter(F.col("localtime").isNull()).count() == 0


def test_partition_pruning_one_day(spark, tmp_path):
    """Reading one date dir (the reference's manual pruning) sees 9 rows."""
    root = str(tmp_path)
    pipeline.extract_to_raw(root)
    one = pipeline.stage(spark, root, date=wsrc.FIXTURE_DATES[0])
    assert one.count() == 9


def test_curated_partitioned_table(spark, curated):
    df = spark.table(curated)
    assert df.count() == 27
    assert "ingest_date" in df.columns
    # date predicate prunes to one partition's files
    pruned = df.filter(F.col("ingest_date") == wsrc.FIXTURE_DATES[1])
    assert pruned.count() == 9
    # partition filter must reach the scan, not run as a post-filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ingest_date" in plan


def test_flagship_latest_snapshot(spark, curated):
    latest = pipeline.latest_snapshot(spark, curated)
    rows = latest.collect()
    assert len(rows) == 9  # one per city
    by_city = {r.city: r for r in rows}
    assert set(by_city) == set(wsrc.CITIES)
    # each flagship row carries the max localtime for its city
    staged = spark.table(curated)
    maxes = {
        r.city: r.mx
        for r in staged.groupBy("city").agg(F.max("localtime").alias("mx")).collect()
    }
    for city, r in by_city.items():
        assert r.localtime == maxes[city]


def test_serve_filter_and_json(spark, curated):
    latest = pipeline.latest_snapshot(spark, curated)
    all_rows = pipeline.serve(latest, "All")
    assert len(all_rows) == 9
    london = pipeline.serve(latest, "London")
    assert len(london) == 1
    doc = json.loads(london[0])
    assert doc["city"] == "London"
    assert "temp_c" in doc


def test_weather_api_datasource(spark):
    """O1 custom DataSource: one InputPartition per (city, day); synthetic
    rows equal the fixture raw layer exactly; options narrow the fetch."""
    from weather_data_pipeline_spark.sources import api_source
    from weather_data_pipeline_spark.transforms import flatten_raw

    api_source.register(spark)
    df = spark.read.format("weather_api").load()
    assert df.rdd.getNumPartitions() == len(wsrc.CITIES) * len(wsrc.FIXTURE_DATES)

    root = wsrc.ensure_fixture()
    from_files = flatten_raw(wsrc.read_raw(spark, root), with_ingest_date=True)
    from_api = flatten_raw(df, with_ingest_date=True)
    assert sorted(map(tuple, from_api.collect())) == sorted(
        map(tuple, from_files.collect())
    )

    narrow = (
        spark.read.format("weather_api")
        .option("cities", "London,Cairo")
        .option("dates", wsrc.FIXTURE_DATES[0])
        .load()
    )
    rows = narrow.select("location.name", "ingest_date").collect()
    assert sorted((r[0], r[1]) for r in rows) == [
        ("Cairo", wsrc.FIXTURE_DATES[0]),
        ("London", wsrc.FIXTURE_DATES[0]),
    ]


def test_permissive_scan_quarantines_corrupt(spark, tmp_path):
    """A malformed raw document lands in _corrupt; good rows parse; the
    strict scan stays the default."""
    root = str(tmp_path)
    wsrc.write_raw_docs(wsrc.synthesize_raw_docs([wsrc.FIXTURE_DATES[0]]), root)
    day_dir = tmp_path / "data" / wsrc.FIXTURE_DATES[0]
    (day_dir / "Broken.txt").write_text('{"location": {"name": "Broke', "utf-8")

    df = wsrc.read_raw(spark, root, permissive=True)
    rows = df.collect()
    assert len(rows) == len(wsrc.CITIES) + 1
    corrupt = [r for r in rows if r["_corrupt"] is not None]
    assert len(corrupt) == 1
    assert corrupt[0]["_corrupt"].startswith('{"location"')
    good = [r for r in rows if r["_corrupt"] is None]
    assert all(r["location"]["name"] in wsrc.CITIES for r in good)


def test_corrupt_digest_byte_robust(spark):
    """The quarantine digest must be byte-robust, not coincidence-robust
    (VERDICT r2 #5): trailing SPACES are content and survive into
    md5(_corrupt); a trailing LINE TERMINATOR is framing that Spark's
    line-split strips — so the expected digest is md5(payload minus
    trailing \\r\\n only), exactly the oracle's rtrim(content, \\n\\r)."""
    import hashlib
    import os.path

    root = wsrc.ensure_corrupt_fixture()
    rows = (
        wsrc.read_raw(spark, root, permissive=True)
        .withColumn("file", F.input_file_name())
        # Spark refuses plans referencing only _corrupt — keep one real
        # data column in the projection (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        .filter(F.col("_corrupt").isNotNull() | F.col("location.name").isNull())
        .select("file", F.md5("_corrupt").alias("digest"), "location.name")
        .filter(F.col("digest").isNotNull())
        .collect()
    )
    got = {os.path.basename(r["file"]): r["digest"] for r in rows}
    expected = {
        fname: hashlib.md5(payload.rstrip("\r\n").encode()).hexdigest()
        for _, fname, payload, is_corrupt in wsrc.CORRUPT_INJECTIONS
        if is_corrupt
    }
    assert got == expected
    # the variants genuinely differ: spaces kept, newline stripped
    assert expected["TrailingWS.txt"] != hashlib.md5(
        b"not json, trailing spaces"
    ).hexdigest()


def test_df_cap_defuses_viral_shingle(spark, tmp_path):
    """The skew scenario x2_ngram_jaccard_capped exists for: 60 documents
    share a viral boilerplate sentence but are otherwise unrelated. The
    uncapped join must surface ~C(60,2) boilerplate-driven candidate
    pairs; the capped form drops the viral grams (df=60 > DF_CAP) and
    finds NO pairs — while a genuine near-dup pair (unique shared
    content, df=2 grams) survives the cap."""
    import pandas as pd

    from weather_data_pipeline_spark.operators import dedup

    boiler = "subscribe to our newsletter for updates and offers today"
    rows = []
    for i in range(60):
        uniq = " ".join(f"tok{i}x{j}" for j in range(10))
        rows.append((i, f"{boiler} {uniq}", "en", "web", 0))
    # one true near-dup pair with UNIQUE shared content (no boilerplate)
    shared = " ".join(f"dup{j}" for j in range(12))
    rows.append((100, f"{shared} alpha", "en", "web", 0))
    rows.append((101, f"{shared} beta", "en", "web", 0))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    uncapped = dedup.x2_ngram_jaccard(spark, str(tmp_path)).collect()
    capped = dedup.x2_ngram_jaccard_capped(spark, str(tmp_path)).collect()

    boiler_pairs = [r for r in uncapped if r.doc_a < 60 and r.doc_b < 60]
    assert len(boiler_pairs) > 1000  # quadratic blowup on the viral grams
    capped_pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert capped_pairs == {(100, 101)}  # real near-dups survive the cap
