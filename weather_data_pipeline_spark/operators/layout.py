"""X8 — physical data layout: z-order (Morton) clustering keys.

At 100 TB the dominant cost of a multi-dimensional selective query is
how many files its predicates can SKIP. A single-column sort clusters
one dimension and scatters the other; the z-order curve interleaves the
bits of two keys so that rows close in BOTH dimensions land in the same
file, and parquet min/max stats prune on either predicate. The same
layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies — here as a
plain column expression plus ``repartitionByRange``, nothing
engine-private.

Both dimensions are min-max scaled to the full 16-bit width BEFORE
interleaving — without it, a key whose natural range uses fewer bits
than the other's contributes no high interleave bits and the curve
degenerates to a single-column sort (the bug
tests/test_scale_design.py::test_zorder_clusters_both_dimensions
exists to catch; production z-order implementations range-rank for
the same reason).

The scale + interleave is generated ONCE as SQL text and shared
verbatim by the Spark plan and the DuckDB oracle — there is no way for
the two engines to disagree on the curve.

Reference parity: the reference has no layout op (its corpus is a
single pandas frame, weather_etl.py:62-90); this is part of the §2.10
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table

#: bits interleaved per dimension → a 32-bit Morton code
ZORDER_BITS = 16


def scale16_expr(col: str, lo: str, hi: str, bits: int = ZORDER_BITS) -> str:
    """Min-max scale an integral column onto [0, 2^bits): exact integer
    numerator (≤ range·2^16 ≪ 2^53, so the double division is the same
    correctly-rounded value on every IEEE engine), explicit FLOOR —
    never a bare double→int CAST, which truncates in Spark but rounds
    in DuckDB — and the degenerate range guarded to 1."""
    top = (1 << bits) - 1
    return (
        f"CAST(FLOOR((({col} - {lo}) * {top}) / GREATEST({hi} - {lo}, 1))"
        " AS BIGINT)"
    )


def zorder_expr(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """Unrolled Morton interleave of the low ``bits`` bits of two
    integral expressions: bit i of x lands at 2i, of y at 2i+1. Shifts
    are expressed as multiplies by precomputed constants and every term
    is parenthesized, so operator precedence cannot differ between
    engines. Constant-folds into one projection — no UDF, no shuffle."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_scaled_expr(
    x: str, y: str, xlo: str, xhi: str, ylo: str, yhi: str
) -> str:
    return zorder_expr(
        scale16_expr(x, xlo, xhi), scale16_expr(y, ylo, yhi)
    )


_Z = zorder_scaled_expr(
    "l_partkey", "l_suppkey", "__xlo", "__xhi", "__ylo", "__yhi"
)

_BOUNDS_SQL = """
    SELECT MIN(l_partkey) AS __xlo, MAX(l_partkey) AS __xhi,
           MIN(l_suppkey) AS __ylo, MAX(l_suppkey) AS __yhi
    FROM lineitem
"""


@query(
    "x8_zorder_layout",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_Z} AS BIGINT) AS zvalue,
           CAST(({_Z} >> 26) AS BIGINT) AS zbucket
    FROM lineitem CROSS JOIN ({_BOUNDS_SQL}) b
    """,
)
def x8_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton clustering key over min-max-scaled (l_partkey, l_suppkey)
    plus the 64-way file bucket its top bits induce. The bounds are one
    broadcast 1-row aggregate; the key itself is a pure projection
    (scan-local, zero data shuffles). The write path that uses it is
    ``cluster_by_zorder`` below, whose file-skipping effect on both
    dimensions is asserted by
    tests/test_scale_design.py::test_zorder_clusters_both_dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = F.broadcast(
        li.agg(
            F.min("l_partkey").alias("__xlo"),
            F.max("l_partkey").alias("__xhi"),
            F.min("l_suppkey").alias("__ylo"),
            F.max("l_suppkey").alias("__yhi"),
        )
    )
    z = F.expr(_Z)
    return li.crossJoin(bounds).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        z.cast("long").alias("zvalue"),
        F.shiftright(z, 26).cast("long").alias("zbucket"),
    )


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, num_files: int
) -> DataFrame:
    """The layout op proper: range-partition on the scaled Morton key
    and sort within partitions, so a parquet write emits ``num_files``
    files whose (x, y) min/max footers are tight in BOTH dimensions.
    One broadcast bounds row + one range shuffle (sampled boundaries —
    skew-proof, unlike modulo bucketing on a hot key); at 100 TB this
    runs once per compaction window and every later scan with a
    predicate on x OR y prunes ~sqrt-fashion instead of reading
    everything."""
    bounds = F.broadcast(
        df.agg(
            F.min(x).alias("__xlo"),
            F.max(x).alias("__xhi"),
            F.min(y).alias("__ylo"),
            F.max(y).alias("__yhi"),
        )
    )
    zcol = F.expr(
        zorder_scaled_expr(x, y, "__xlo", "__xhi", "__ylo", "__yhi")
    )
    return (
        df.crossJoin(bounds)
        .withColumn("__z", zcol)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
    )
