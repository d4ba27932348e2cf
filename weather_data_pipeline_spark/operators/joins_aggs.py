"""[ext] Joins / aggregations / sorts / set-ops (SURVEY.md §2.9).

The reference has none of these (its only "join" is a dict lookup,
weather_etl.py:112-122) — but the north star demands the general
relational surface at 100 TB. Everything here is pure Catalyst built-ins;
the engineering is in the *plan shape*:

- dimension joins are explicitly ``F.broadcast`` (region/nation/supplier
  never warrant a shuffle);
- fact-fact joins shuffle on their keys and lean on AQE for skew;
- aggregates go through exact decimals (functions.scalars policy) so a
  cluster re-run hashes identically;
- top-k sorts carry unique tiebreaks and push the limit into a
  TakeOrderedAndProject (no global sort of 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import davg, dec_out, dsum, dsum_out
from ..registry import query
from ..sources.testdata import load_table


# ----------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: groupBy + 8 aggregates
# ----------------------------------------------------------------------
@query(
    "ext_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                 AS DOUBLE), 2)                        AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2)                        AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE), 4)                        AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2))))
                 AS DOUBLE), 6)                        AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity)                     AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_discount)                     AS avg_disc,
           COUNT(*)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def ext_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Map-side partial aggregation + one shuffle on the
    (low-cardinality) grouping keys; exact-decimal sums are order-independent
    so the result is stable on any cluster."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_out(F.sum(qty), 2).alias("sum_qty"),
        dec_out(F.sum(price), 2).alias("sum_base_price"),
        dec_out(F.sum(price * (1 - disc)), 4).alias("sum_disc_price"),
        dec_out(F.sum(price * (1 - disc) * (1 + tax)), 6).alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("l_quantity")).alias("avg_qty"),
        (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ----------------------------------------------------------------------
# Broadcast dimension join chain: customer ⋈ nation ⋈ region
# ----------------------------------------------------------------------
@query(
    "ext_join_broadcast_dims",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def ext_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small dims are broadcast — zero shuffle for the joins themselves;
    the only shuffle is the final aggregation on (r_name, n_name)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum_out("c_acctbal").alias("total_acctbal"),
        )
    )


# ----------------------------------------------------------------------
# Fact-fact join + aggregation (TPC-H Q3 shape) + deterministic top-k
# ----------------------------------------------------------------------
@query(
    "ext_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def ext_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective filters pushed to every scan, shuffle join on
    orderkey, top-10 via TakeOrderedAndProject (never a full global sort).
    Unique tiebreak (l_orderkey) makes the limit set deterministic."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_out(F.sum(price * (1 - disc)), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ----------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# ----------------------------------------------------------------------
@query(
    "ext_join_semi",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_with_orders
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    """,
)
def ext_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )


@query(
    "ext_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def ext_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ----------------------------------------------------------------------
# Outer joins
# ----------------------------------------------------------------------
@query(
    "ext_join_left_outer",
    oracle="""
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def ext_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER preserving empty nations; COUNT(col) skips nulls → 0."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, supp.s_nationkey == nation.n_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "ext_join_full_outer",
    oracle="""
    SELECT
      COALESCE(c.k, s.k) AS nationkey,
      c.k IS NOT NULL AS has_customers,
      s.k IS NOT NULL AS has_suppliers
    FROM (SELECT DISTINCT c_nationkey AS k FROM customer) c
    FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS k FROM supplier) s
      ON c.k = s.k
    """,
)
def ext_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("k"))
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("k"))
        .distinct()
    )
    return c.join(s, c["k"] == s["k"], "full_outer").select(
        F.coalesce(c["k"], s["k"]).alias("nationkey"),
        c["k"].isNotNull().alias("has_customers"),
        s["k"].isNotNull().alias("has_suppliers"),
    )


# ----------------------------------------------------------------------
# Lookup join — the broadcast-join form of the reference's dict map (O24)
# ----------------------------------------------------------------------
_PRIORITY_RANKS = [
    ("1-URGENT", 1),
    ("2-HIGH", 2),
    ("3-MEDIUM", 3),
    ("4-NOT SPECIFIED", 4),
    ("5-LOW", 5),
]


@query(
    "ext_lookup_join",
    oracle="""
    SELECT o_orderkey, o_orderpriority, prio_rank
    FROM orders
    LEFT JOIN (VALUES ('1-URGENT',1),('2-HIGH',2),('3-MEDIUM',3),
                      ('4-NOT SPECIFIED',4),('5-LOW',5)) AS prio(name, prio_rank)
      ON o_orderpriority = prio.name
    """,
)
def ext_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24's dict-map as its idiomatic distributed form: a broadcast join
    against an inline dimension (weather_etl.py:112-122)."""
    orders = load_table(spark, sf_dir, "orders")
    dim = F.broadcast(
        spark.createDataFrame(_PRIORITY_RANKS, "name string, prio_rank int")
    )
    return orders.join(dim, orders.o_orderpriority == dim.name, "left").select(
        "o_orderkey", "o_orderpriority", "prio_rank"
    )


# ----------------------------------------------------------------------
# Sorts / limits / distinct / set ops
# ----------------------------------------------------------------------
@query(
    "ext_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def ext_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition heap top-k,
    merge on driver — O(n) not O(n log n), no global shuffle."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "ext_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def ext_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


@query(
    "ext_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def ext_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "ext_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def ext_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.distinct().exceptAll(s.distinct())


@query(
    "ext_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def ext_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


# ----------------------------------------------------------------------
# Grouping sets: rollup / cube / pivot / unpivot
# ----------------------------------------------------------------------
@query(
    "ext_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def ext_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum_out("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "ext_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def ext_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum_out("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ext_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                 FILTER (l_linestatus = 'O') AS DOUBLE), 2) AS "O",
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                 FILTER (l_linestatus = 'F') AS DOUBLE), 2) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list — never let Spark scan for distinct
    pivot values at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum_out("l_quantity"))
    )


@query(
    "ext_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem)
    UNPIVOT (val FOR metric IN (l_quantity, l_discount))
    """,
)
def ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount"],
        "metric",
        "val",
    )


# ----------------------------------------------------------------------
# Subqueries
# ----------------------------------------------------------------------
@query(
    "ext_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def ext_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery via spark.sql — one extra tiny job for
    the scalar, then a pushed-down filter."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_v"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer_v
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
        """
    )


@query(
    "ext_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def ext_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate
    + join (RewriteCorrelatedScalarSubquery), never a per-row loop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
        WHERE o_totalprice > (SELECT 2 * AVG(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ----------------------------------------------------------------------
# Distinct counting
# ----------------------------------------------------------------------
@query(
    "ext_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("ext_approx_count_distinct")
def ext_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch — the 100 TB path for distincts (single pass, fixed
    memory). No oracle on the RAW estimates — they are a property of
    Spark's HLL++ implementation (register layout, bias correction), not
    of the data, so no portable SQL can reproduce them. The sketch's
    accuracy CONTRACT is oracle-checked instead by
    ``ext_acd_error_band``."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "ext_bucketed_join_agg",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def ext_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over the BUCKETED layout (VERDICT r5 ask #8 — keep
    the layout path driver-checked, not pytest-only): orders and lineitem
    are written as hash-clustered managed tables bucketed on orderkey
    with the same bucket count, then joined and aggregated reading FROM
    THE BUCKETED TABLES. Both sides' bucket layout satisfies the join's
    distribution requirement, so the join itself needs no Exchange (plan
    gate: tests/test_plans.py::test_bucketed_join_zero_shuffle) — at
    100 TB the repeated orders⋈lineitem shuffle becomes a one-time
    write-side layout decision. Tables are rewritten per call (the
    driver regenerates testdata between rounds; a stale layout would be
    silently wrong), suffixed per sf_dir so scale dirs never collide."""
    import hashlib
    import os
    import shutil

    from ..sources.io import bucketed_write
    from ..sources.testdata import load_table as _lt

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"bkt6_{name}_{tag}"
        # the session catalog is in-memory: a table dir left by a PREVIOUS
        # session is an orphaned location saveAsTable refuses to reuse —
        # drop both the catalog entry and the directory before rewriting
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if os.path.isdir(os.path.join(warehouse, tbl)):
            shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
        bucketed_write(_lt(spark, sf_dir, name), tbl, key, 8)
    return (
        spark.table(f"bkt6_orders_{tag}")
        .join(
            spark.table(f"bkt6_lineitem_{tag}"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("qty"),
        )
    )


#: acceptance band for the HLL++ estimate, in multiples of the requested
#: relative standard deviation. 4σ: P(outside) < 1e-4 per group under the
#: sketch's error model — a regression (wrong column, unit bug, broken
#: merge) lands orders of magnitude outside.
ACD_RSD = 0.05
ACD_BAND_SIGMA = 4


@query(
    "ext_acd_error_band",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts_exact,
           COUNT(*) AS n_rows,
           TRUE AS acd_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_acd_error_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band oracle for the HLL++ sketch (VERDICT r5 ask #6): runs the
    engine-specific ``approx_count_distinct`` and value-checks its
    accuracy contract — |approx − exact| ≤ 4·rsd·exact per group —
    against DuckDB's exact COUNT(DISTINCT). The exact count rides along
    so the row is a real value check, not a bare boolean."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=ACD_RSD).alias("acd"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    band = (
        F.abs(F.col("acd") - F.col("n_parts_exact"))
        <= ACD_BAND_SIGMA * ACD_RSD * F.col("n_parts_exact")
    )
    return agg.select(
        "l_returnflag", "n_parts_exact", "n_rows", band.alias("acd_in_band")
    )


# ----------------------------------------------------------------------
# Null-handling scalar surface
# ----------------------------------------------------------------------
@query(
    "ext_null_ops",
    oracle="""
    SELECT event_id,
           NULLIF(event_type, 'error') AS type_or_null,
           COALESCE(NULLIF(event_type, 'error'), 'n/a') AS type_filled,
           CASE WHEN value >= 100 THEN 'high'
                WHEN value >= 50 THEN 'mid' ELSE 'low' END AS bucket,
           value IS NULL AS value_missing
    FROM events
    """,
)
def ext_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_or_null = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        t_or_null.alias("type_or_null"),
        F.coalesce(t_or_null, F.lit("n/a")).alias("type_filled"),
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.col("value").isNull().alias("value_missing"),
    )


# ----------------------------------------------------------------------
# String functions
# ----------------------------------------------------------------------
@query(
    "ext_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 10) AS name_prefix,
           LENGTH(p_name) AS name_len,
           p_brand || '/' || p_type AS brand_type,
           p_name LIKE '%a%' AS has_a,
           TRIM(CONCAT('  ', p_brand, '  ')) AS trimmed
    FROM part
    """,
)
def ext_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "trimmed"
        ),
    )


@query(
    "ext_regexp",
    oracle="""
    SELECT p_partkey, p_type,
           regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
           regexp_matches(p_type, 'ss') AS has_double_s,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
)
def ext_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "([a-z]+)", 1).alias("first_word"),
        F.col("p_type").rlike("ss").alias("has_double_s"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("devoweled"),
    )


# ----------------------------------------------------------------------
# O7 — SQL surface over registered views (spark.sql / spark.table)
# ----------------------------------------------------------------------
@query(
    "o7_sql_table_scan",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def o7_sql_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog + SQL text entry (reference reads its table back through
    Athena SQL, weather_etl.py:144-146): register, then spark.sql."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sql_v")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS total
        FROM orders_sql_v GROUP BY o_orderstatus
        """
    )


# ----------------------------------------------------------------------
# O8 — JSON-records serialization (app/app.py:26-28)
# ----------------------------------------------------------------------
@query(
    "o8_json_serialize",
    oracle="""
    SELECT n_nationkey,
           '{"nation":"' || n_name || '","region":' || CAST(n_regionkey AS VARCHAR) || '}'
             AS json_rec
    FROM nation
    """,
)
def o8_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→JSON-string records, built with deterministic concatenation (the
    engine also supports F.to_json(F.struct(...)); exact text differs per
    engine so the oracle uses explicit concat)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.concat(
            F.lit('{"nation":"'),
            F.col("n_name"),
            F.lit('","region":'),
            F.col("n_regionkey").cast("string"),
            F.lit("}"),
        ).alias("json_rec"),
    )


# ----------------------------------------------------------------------
# TPC-H Q5 shape: 6-way mixed broadcast/shuffle join
# ----------------------------------------------------------------------
@query(
    "ext_q5_local_supplier",
    oracle="""
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def ext_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the join-order workout: two fact-fact shuffle
    joins (orders⋈customer, lineitem⋈orders⋈supplier) with the
    region→nation dimension chain broadcast, and the region predicate
    reaching the nation side before any fact row moves. Catalyst +
    AQE pick broadcast for every sub-10MB side at runtime."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_out(F.sum(price * (1 - disc)), 4).alias("revenue"))
    )


# ----------------------------------------------------------------------
# TPC-H Q18 shape: HAVING subquery + semi join + deterministic top-k
# ----------------------------------------------------------------------
@query(
    "ext_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def ext_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING subquery becomes an aggregated
    key-set semi-joined (broadcastable — it's tiny after the filter)
    against orders BEFORE the customer join, so only qualifying orders'
    rows ever shuffle; top-100 runs as TakeOrderedAndProject with a
    unique tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big),
        F.col("o_orderkey") == big.l_orderkey,
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_out(F.sum(qty), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ----------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting (fact-fact join + top-k)
# ----------------------------------------------------------------------
@query(
    "ext_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
             AS revenue,
           c_acctbal, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def ext_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: which customers drove
    the most returned revenue last quarter. The scale-relevant shape:
    BOTH selective predicates (returnflag on lineitem, the quarter on
    orders) are plain column comparisons that push into the parquet
    scans, so the fact-fact shuffle join moves only ~25% of lineitem
    and ~8% of orders; the customer join keys on the already-aggregated
    order side at |orders| granularity; top-20 runs as
    TakeOrderedAndProject (per-partition heaps + driver merge of 20
    rows), never a global sort. Reference parity: the reference's only
    join is a pandas column zip (weather_etl.py:165); this is the §2.9
    extension tier exercised at TPC-H shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(dec_out(F.sum(price * (1 - disc)), 4).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ----------------------------------------------------------------------
# CDC merge: apply a change batch onto a snapshot (SCD1 upsert + ops)
# ----------------------------------------------------------------------
#: snapshot/batch split point for the CDC merge query
CDC_CUTOFF = "2024-02-01 00:00:00"


@query(
    "ext_cdc_merge",
    oracle=f"""
    WITH snap AS (
      SELECT user_id, value FROM (
        SELECT user_id,
               ROUND(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 2) AS value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    ), batch AS (
      SELECT user_id, value, event_type FROM (
        SELECT user_id,
               ROUND(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE), 2) AS value,
               event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(s.user_id, b.user_id) AS user_id,
           CASE WHEN b.user_id IS NULL THEN 'carry'
                WHEN b.event_type = 'error' AND s.user_id IS NULL THEN 'noop'
                WHEN b.event_type = 'error' THEN 'delete'
                WHEN s.user_id IS NULL THEN 'insert'
                ELSE 'update' END AS op,
           s.value AS old_value,
           CASE WHEN b.event_type = 'error' THEN NULL ELSE b.value END
             AS new_value
    FROM snap s FULL OUTER JOIN batch b ON s.user_id = b.user_id
    """,
)
def ext_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the MERGE INTO shape without a table format: reduce
    the change feed to one net change per key (latest-wins ``max_by``,
    the same partializable reduction the flagship uses), full-outer
    join it against the snapshot, classify each key insert / update /
    delete (tombstone = an 'error'-typed last event) / carry / noop.
    Snapshot and batch aggregate AND join on the same user_id
    partitioning — at 100 TB the feed reduces BEFORE touching the
    (much larger) snapshot, which is the entire point of netting
    changes first; writing the result as a new snapshot version is the
    streaming path's write-new-then-swap protocol
    (streaming/jobs.py incremental_latest_per_key)."""
    ev = load_table(spark, sf_dir, "events")
    r2 = F.round(F.col("value").cast("decimal(18,2)").cast("double"), 2)
    order = F.struct("ts", "event_id")
    cutoff = F.lit(CDC_CUTOFF).cast("timestamp_ntz")
    snap = (
        ev.filter(F.col("ts") < cutoff)
        .select("user_id", r2.alias("v"), "ts", "event_id")
        .groupBy("user_id")
        .agg(F.max_by("v", order).alias("old_value"))
    )
    batch = (
        ev.filter(F.col("ts") >= cutoff)
        .select("user_id", r2.alias("v"), "event_type", "ts", "event_id")
        .groupBy("user_id")
        .agg(
            F.max_by("v", order).alias("b_value"),
            F.max_by("event_type", order).alias("b_type"),
        )
    )
    s, b = snap.alias("s"), batch.alias("b")
    joined = s.join(b, "user_id", "full_outer")
    tomb = F.col("b_type") == "error"
    in_snap = F.col("old_value").isNotNull()
    in_batch = F.col("b_type").isNotNull()
    op = (
        F.when(~in_batch, "carry")
        .when(tomb & ~in_snap, "noop")
        .when(tomb, "delete")
        .when(~in_snap, "insert")
        .otherwise("update")
    )
    return joined.select(
        "user_id",
        op.alias("op"),
        "old_value",
        F.when(~tomb, F.col("b_value")).alias("new_value"),
    )


# ----------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS-correlated semi join + priority count
# ----------------------------------------------------------------------
@query(
    "ext_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def ext_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: count orders per
    priority that had at least one LATE shipment (shipped > 60 days
    after ordering; the reference schema carries no commit/receipt
    dates, so lateness is defined against the order date — the plan
    shape, an EXISTS → LEFT SEMI join with a non-equi residual, is
    Q4's). The quarter predicate pushes into the orders scan BEFORE
    the semi join, the lineitem side carries only (orderkey,
    shipdate), and the semi join stops probing an order at its first
    late item — no count or distinct needed."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ----------------------------------------------------------------------
# TPC-H Q12 shape: join + CASE-conditional aggregation
# ----------------------------------------------------------------------
@query(
    "ext_q12_shipping_delay",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
           CAST(SUM(CASE WHEN l_shipdate >  o_orderdate + INTERVAL 30 DAY
                     AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS late,
           CAST(SUM(CASE WHEN l_shipdate >  o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS very_late
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def ext_q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional aggregation after a fact-fact
    join: one CASE bucket per shipping-delay class, summed per
    priority (the schema carries no shipmode; delay classes play its
    role — the shape, SUM(CASE...) over a join, is Q12's). The year
    predicate pushes into the lineitem scan; all three buckets ride
    ONE partial-aggregated shuffle — never three passes."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    j = orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    d30 = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    d90 = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return j.groupBy("o_orderpriority").agg(
        flag(F.col("l_shipdate") <= d30).alias("on_time"),
        flag(
            (F.col("l_shipdate") > d30) & (F.col("l_shipdate") <= d90)
        ).alias("late"),
        flag(F.col("l_shipdate") > d90).alias("very_late"),
    )


# ----------------------------------------------------------------------
# TPC-H Q14 shape: conditional-revenue ratio with a broadcast dim
# ----------------------------------------------------------------------
@query(
    "ext_q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) END)
             AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def ext_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion-revenue share: the month's revenue
    through PROMO parts over all revenue, as ONE conditional aggregate
    after a broadcast part join (part is the small side; the month
    predicate prunes lineitem at the scan). Both numerator and
    denominator are exact decimal sums; one double division + round at
    the emit boundary. Single-row output — the classic KPI query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


# ----------------------------------------------------------------------
# Incremental aggregate maintenance — partial-merge algebra
# ----------------------------------------------------------------------
@query(
    "ext_incremental_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def ext_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the standing aggregate is kept as
    MERGEABLE partials (count, exact decimal sum), so a new batch
    never forces a full recompute — snapshot partials + delta partials
    merge by addition. Here both halves derive from the same table
    split at a cutoff and the merged result must equal the full
    aggregate EXACTLY (the oracle computes it directly) — that
    equality is precisely the algebraic property (commutative
    monoid on the partial state) that makes count/sum/min/max
    incrementally maintainable where avg or median naively are not
    (avg is maintained via its (sum, count) partials, never stored
    as a ratio). At 100 TB this is the difference between touching
    one day and re-scanning three years."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-02-01 00:00:00").cast("timestamp_ntz")
    dec = F.col("value").cast("decimal(18,2)")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum(dec).alias("s")
        )

    snapshot = partials(ev.filter(F.col("ts") < cutoff))
    delta = partials(ev.filter(F.col("ts") >= cutoff))
    return (
        snapshot.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .select(
            "event_type",
            "n",
            F.round(F.col("s").cast("double"), 2).alias("total_value"),
        )
    )


# ----------------------------------------------------------------------
# Runtime Bloom-filter join pruning (round 8)
# ----------------------------------------------------------------------
#: conf knobs that make Spark inject a runtime bloom filter on the
#: application side of a selective shuffle join at the tested SFs (the
#: defaults target multi-GB scans; semantics are unchanged either way)
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy plan: selective dim-filtered orders ⋈ lineitem as a
    SHUFFLE join (broadcast disabled so the runtime-filter path is the
    one under test) rolled up to one row."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


@query(
    "ext_bloom_join_prune",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def ext_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the 100-TB shuffle-join
    technique the broadcast path can't reach: when the filtered build
    side is too big to broadcast but still selective, Spark aggregates
    a bloom filter over its join keys (partial-aggregated, mergeable)
    and injects ``might_contain(xxhash64(key))`` into the probe side's
    SCAN, so most fact rows die before the exchange instead of
    shuffling to die in the join. The plan gate asserts
    ``bloom_filter_agg`` + ``might_contain`` are present
    (tests/test_plans.py); results are value-identical with the
    filter on or off — the oracle checks the money math (DECIMAL(18,2)
    revenue, exact until the emit rounding).

    The enabling confs are scoped set/restore around an EAGER
    materialization (the defaults aim the feature at multi-GB scans;
    forcing it at sf0.1 demonstrates the plan shape without leaving
    broadcast disabled for the rest of the session)."""
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        return _bloom_join(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ----------------------------------------------------------------------
# Declarative data-quality audit (round 8): Deequ-style constraint pass
# ----------------------------------------------------------------------
@query(
    "ext_dq_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS constraint_name, 'orders' AS tbl,
             COUNT(*) AS n_checked,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders_custkey_not_null', 'orders', COUNT(*),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders_custkey_ri', 'orders', COUNT(*),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'events_value_in_range', 'events', COUNT(*),
             CAST(SUM(CASE WHEN value < 0 OR value >= 1000000
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'events_props_k_is_int', 'events', COUNT(*),
             CAST(SUM(CASE WHEN TRY_CAST(
                        json_extract_string(props, '$.k') AS INTEGER)
                      IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'lineitem_quantity_positive', 'lineitem', COUNT(*),
             CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem
    )
    """,
)
def ext_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/Great-Expectations
    operator class): a constraint suite — primary-key uniqueness,
    non-null, referential integrity, value range, JSON type coercion —
    evaluated in ONE scan + ONE 1-row aggregate PER TABLE. The RI
    check is folded INTO the orders pass: the broadcast-dim left join
    against customer runs before the aggregate, so dup-pk, not-null
    and RI violations all fall out of the same orders scan. Each
    table's 1-row suite is fanned out to its constraint rows with
    explode(array(struct…)) — fan-out on a 1-row frame, never on data
    (VERDICT r8 weak #1: the previous form consumed the suite twice
    and ran RI as a third pass, tripling the orders scan; at 100 TB a
    DQ audit's cost IS its scans). Plan-gated: exactly one
    orders.parquet and one events.parquet scan
    (tests/test_plans.py::test_dq_audit_single_scan_per_table).

    Scale shape: violations counts are conditional partial aggregates
    (map-side combined to one row per task); nothing data-sized
    survives past the scans. The same suite at 100 TB is the same
    plan — constraint evaluation is embarrassingly aggregable. All
    counts integer-exact on both engines (TRY_CAST/try_cast agree on
    the decimal-string grammar for INT)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")

    def crow(name: str, tbl: str, violations):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            F.lit(tbl).alias("tbl"),
            F.col("n").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
        )

    def fan_out(suite: DataFrame, *rows) -> DataFrame:
        return suite.select(F.explode(F.array(*rows)).alias("c")).select("c.*")

    cnt = F.count(F.lit(1))
    # customer.c_custkey is a primary key, so the broadcast left join
    # preserves orders' row count: COUNT(*) over the joined frame IS
    # the orders count every within-table constraint checks against.
    o_suite = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left",
    ).agg(
        cnt.alias("n"),
        (cnt - F.countDistinct("o_orderkey")).alias("dup_pk"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_ck"
        ),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
            "ri_v"
        ),
    )
    o_rows = fan_out(
        o_suite,
        crow("orders_pk_unique", "orders", F.col("dup_pk")),
        crow("orders_custkey_not_null", "orders", F.col("null_ck")),
        crow("orders_custkey_ri", "orders", F.col("ri_v")),
    )
    ev_suite = events.agg(
        cnt.alias("n"),
        F.sum(
            F.when(
                (F.col("value") < 0) | (F.col("value") >= 1_000_000), 1
            ).otherwise(0)
        ).alias("range_v"),
        F.sum(
            F.when(
                F.expr(
                    "try_cast(get_json_object(props, '$.k') AS int)"
                ).isNull(),
                1,
            ).otherwise(0)
        ).alias("coerce_v"),
    )
    ev_rows = fan_out(
        ev_suite,
        crow("events_value_in_range", "events", F.col("range_v")),
        crow("events_props_k_is_int", "events", F.col("coerce_v")),
    )
    li_rows = fan_out(
        li.agg(
            cnt.alias("n"),
            F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias(
                "v"
            ),
        ),
        crow("lineitem_quantity_positive", "lineitem", F.col("v")),
    )
    return o_rows.unionByName(ev_rows).unionByName(li_rows)


# ----------------------------------------------------------------------
# k-anonymity generalization audit (round 10): the privacy-tier
# companion to ext_dq_audit and x4_pii_redact
# ----------------------------------------------------------------------
#: minimum group size a quasi-identifier combination must reach
ANON_K = 5


@query(
    "x8_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
               AS bal_bucket
      FROM customer
    ), sized AS (
      SELECT seg, nat, bal_bucket,
             COUNT(*) OVER (PARTITION BY seg, nat, bal_bucket) AS g0,
             COUNT(*) OVER (PARTITION BY seg, nat) AS g1,
             COUNT(*) OVER (PARTITION BY seg) AS g2
      FROM qi
    ), assigned AS (
      SELECT CASE WHEN g0 >= {ANON_K} THEN 0
                  WHEN g1 >= {ANON_K} THEN 1
                  WHEN g2 >= {ANON_K} THEN 2 ELSE 3 END AS anon_level,
             CASE WHEN g0 >= {ANON_K}
                    THEN concat(seg, '|', nat, '|', bal_bucket)
                  WHEN g1 >= {ANON_K} THEN concat(seg, '|', nat)
                  WHEN g2 >= {ANON_K} THEN seg ELSE '*' END AS gen_key
      FROM sized
    )
    SELECT anon_level, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT gen_key) AS BIGINT) AS n_groups
    FROM assigned GROUP BY anon_level
    """,
)
def x8_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity minimal-generalization audit over the customer
    table: quasi-identifiers (mktsegment, nationkey, acctbal//1000)
    form a 3-step generalization ladder — full QI triple, drop the
    balance bucket, drop nation too — and every row is assigned the
    LEAST general level whose group reaches ``ANON_K`` members (level
    3 = would need suppression). Output: rows and distinct generalized
    groups per level — the release-readiness report a curation
    pipeline runs before publishing user-adjacent tables (Sweeney
    2002; the one-pass audit, not the NP-hard optimal recoding).
    Level-1/2 assigned-subgroup sizes can legitimately dip below K
    (only sub-K level-0 leftovers land there) — that re-check is the
    iterative full algorithm; this rung is the profiling pass that
    feeds it. The balance bucket floors an exact-decimal-to-double
    division identically on both engines. Reference scope: no privacy
    ops in the reference; §2.10 curation extension tier.

    Scale shape: ONE rollup aggregate computes all three ladder-level
    group sizes in a single scan + one partial-aggregated exchange
    keyed on the FULL triple (never the 5-value segment key — a
    segment-keyed window plan caps parallelism at |segments| at 100
    TB), the |groups|-bounded result localCheckpoints once so the
    three grouping_id level filters read the materialization rather
    than re-running the scan+Expand subtree per level, and each level
    table broadcasts back onto the row scan (3 broadcast joins, no
    row-sized shuffle; plan-gated 1 scan). Synthetic QIs are
    never NULL, so rollup's NULL-as-subtotal encoding is unambiguous;
    a NULLable deployment would first coalesce to sentinel values."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal").cast("double") / 1000)
        .cast("long")
        .alias("bal_bucket"),
    )
    # |groups|-bounded (≤ |seg|·|nat|·|buckets| rows) — materialize the
    # ONE rollup pass so the three level filters below read it instead
    # of re-running the scan+Expand subtree per level (the ext_dq_audit
    # triple-scan anti-pattern, measured 4 scans/3 Expands lazy)
    sizes = (
        qi.rollup("seg", "nat", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("g"), F.grouping_id().alias("gid"))
        .localCheckpoint(eager=True)
    )
    g0 = sizes.filter(F.col("gid") == 0).select(
        "seg", "nat", "bal_bucket", F.col("g").alias("g0")
    )
    g1 = sizes.filter(F.col("gid") == 1).select(
        "seg", "nat", F.col("g").alias("g1")
    )
    g2 = sizes.filter(F.col("gid") == 3).select(
        "seg", F.col("g").alias("g2")
    )
    assigned = (
        qi.join(F.broadcast(g0), ["seg", "nat", "bal_bucket"])
        .join(F.broadcast(g1), ["seg", "nat"])
        .join(F.broadcast(g2), ["seg"])
        .select(
            F.when(F.col("g0") >= ANON_K, 0)
            .when(F.col("g1") >= ANON_K, 1)
            .when(F.col("g2") >= ANON_K, 2)
            .otherwise(3)
            .alias("anon_level"),
            F.when(
                F.col("g0") >= ANON_K,
                F.concat_ws("|", "seg", "nat", "bal_bucket"),
            )
            .when(F.col("g1") >= ANON_K, F.concat_ws("|", "seg", "nat"))
            .when(F.col("g2") >= ANON_K, F.col("seg"))
            .otherwise(F.lit("*"))
            .alias("gen_key"),
        )
    )
    return assigned.groupBy("anon_level").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("gen_key").alias("n_groups"),
    )
