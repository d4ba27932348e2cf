"""Local replica of the driver's DuckDB-oracle check (SURVEY.md §5).

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, sorted column names, and an
order-insensitive value multiset with exact float repr equality (our
determinism policy should make engine floats bitwise identical; see
registry docstring).

Round-1 driver lesson: DECIMAL results with trailing-zero cents render
float-style on one side of the driver's hash (``1234.0`` vs ``1234.00``)
and fail hash_match even when values are equal. Policy here is therefore
stricter than value equality: a registered query may not emit DECIMAL at
the output boundary at all — accumulate decimal internally, emit
``ROUND(CAST(.. AS DOUBLE), s)`` (``functions.scalars.dsum_out``).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import pyarrow as pa

from weather_data_pipeline_spark.schemas import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        v = float(v)
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Declared-scale rendering (NO .normalize()): 12.30 != 12.3, exactly
        # as strict as the driver's hash. Reaching here at all means a query
        # leaked a DECIMAL past the output boundary (compare() rejects that
        # for Spark results; oracle-side decimals surface as mismatches).
        return format(v, "f")
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy array/scalar from the Arrow collect path
        return _norm(v.tolist())
    return str(v)


def _multiset(rows, col_names):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def _portable_arrow_type(t: pa.DataType) -> bool:
    """The only Arrow types both engines render identically at the driver's
    hash layer. Notably EXCLUDES decimal128: DuckDB SUM(<int>) yields
    HUGEINT → decimal128(38,0) while Spark emits int64 — value-equal rows
    that still hash-mismatch (round-2 driver fails w_corrupt_quarantine /
    x6_session_windows). Oracles must CAST integer SUMs to BIGINT and
    decimal aggregates to ROUND(CAST(.. AS DOUBLE), s).

    Also EXCLUDES list/struct/map: the driver's pandas canonicalizer
    sorts/hashes raw column values and numpy arrays are unhashable —
    x3_label_centroids' array<double> column crashed the round-4 driver
    while this filter admitted it locally (VERDICT r4 §What's-wrong-3).
    Nested output must be exploded to scalar long form or serialized to a
    string on BOTH engines."""
    if (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
    ):
        return True
    if pa.types.is_dictionary(t):
        return _portable_arrow_type(t.value_type)
    return False


def oracle_arrow(con: duckdb.DuckDBPyConnection, name: str, sql: str):
    """Run oracle SQL and fetch via Arrow — the same layer the driver hashes
    at — rejecting non-portable output types on the DUCKDB side. fetchall()
    would mask HUGEINT/DECIMAL as plain Python ints/Decimals and compare
    equal even when the driver's type-sensitive hash fails (the round-1 AND
    round-2 blind spot; VERDICT r2 §What's-wrong-2)."""
    res = con.execute(sql)
    tbl = res.arrow()
    bad = [
        f"{f.name}:{f.type}" for f in tbl.schema if not _portable_arrow_type(f.type)
    ]
    assert not bad, (
        f"{name}: non-portable Arrow type(s) in ORACLE output {bad} — "
        "DuckDB HUGEINT/DECIMAL render differently from Spark at the "
        "driver's hash layer; CAST integer SUMs to BIGINT and decimal "
        "aggregates to ROUND(CAST(.. AS DOUBLE), s) in the oracle SQL"
    )
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def _spark_rows(sdf):
    """Arrow-path collect (~10× faster than py4j row conversion).

    Straight to Arrow, never through pandas: pandas upcasts a nullable
    int64 column to float64 (ints print as '100.0' and hash-mismatch the
    oracle); pyarrow's to_pylist keeps ints as ints with None for null."""
    tbl = sdf.toArrow()
    cols = tbl.column_names
    return [tuple(d[c] for c in cols) for d in tbl.to_pylist()]


def compare(spark, name: str, fn, sql: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    dec_cols = [
        f.name for f in sdf.schema.fields if f.dataType.typeName().startswith("decimal")
    ]
    assert not dec_cols, (
        f"{name}: DECIMAL at the output boundary {dec_cols} — trailing-zero "
        "values hash differently across engines; emit ROUND(CAST(.. AS "
        "DOUBLE), s) instead (functions.scalars.dsum_out)"
    )
    nested_cols = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not nested_cols, (
        f"{name}: nested type at the SPARK output boundary {nested_cols} — "
        "the driver's canonicalizer cannot sort/hash numpy arrays (round-4 "
        "x3_label_centroids crash); explode to scalar long form or "
        "serialize to a string on both engines"
    )
    spark_cols = list(sdf.columns)
    spark_rows = _spark_rows(sdf)

    con = duck_connection(sf_dir)
    duck_cols, duck_rows = oracle_arrow(con, name, sql)
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ms, md = _multiset(spark_rows, spark_cols), _multiset(duck_rows, duck_cols)
    if ms != md:
        diff_s = [r for r in ms if r not in set(md)][:5]
        diff_d = [r for r in md if r not in set(ms)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only={diff_s}\n duck-only={diff_d}"
        )
