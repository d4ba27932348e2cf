"""[ext] Second TPC-H batch — Q6, Q7, Q8, Q13, Q17, Q22 shapes.

The reference has no relational tier (its only join is a dict lookup,
weather_etl.py:112-122); these six complete the TPC-H plan-shape
coverage the north star asks for, each chosen for a DISTINCT physical
pattern the first batch (Q1/3/4/5/10/12/14/18) doesn't exercise:

- Q6  — pure scan aggregate: every predicate pushes into the parquet
        scan, zero shuffles (single-group partial agg).
- Q7  — one dimension used in TWO roles (nation self-alias), with the
        pair-of-nations disjunction evaluated AFTER both broadcast
        joins.
- Q8  — market share: two-level conditional aggregate over a 6-table
        join with a region-pruned customer side.
- Q13 — left outer join with a NON-JOIN residual in the ON clause
        (the classic outer-join trap: the residual must not become a
        WHERE filter or absent customers vanish), then a second
        aggregation over the first's output.
- Q17 — correlated scalar aggregate per part, decorrelated into a
        broadcast-joined per-key aggregate (never a per-row subquery).
- Q22 — global scalar subquery (one row, broadcast) + NOT EXISTS
        anti join.

The schema here carries no partsupp/phone/commitdate, so predicates are
adapted (docstrings say how) — the plan shapes are the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dec_out
from ..registry import query
from ..sources.testdata import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


def _rev() -> F.Column:
    """Exact-decimal extended revenue (price * (1 - discount))."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )


# ----------------------------------------------------------------------
# TPC-H Q6 shape: scan-only aggregate, total predicate pushdown
# ----------------------------------------------------------------------
@query(
    "ext_q6_revenue_delta",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def ext_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — forecasting revenue change: what would have
    been earned without small discounts on low-quantity items. The
    whole query is predicates + one global aggregate: every filter
    (shipdate range, discount band, quantity cap) pushes into the
    parquet scan as a PushedFilters entry and the plan has ZERO
    exchanges beyond the final single-partition partial-agg merge.
    The canonical 'is pushdown working' probe: at 100 TB this reads
    row-group statistics, not rows, for most of the table."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return li.agg(
        dec_out(F.sum(disc_rev), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ----------------------------------------------------------------------
# TPC-H Q7 shape: nation dimension in two roles (self-alias)
# ----------------------------------------------------------------------
@query(
    "ext_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DOUBLE), 2) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def ext_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two nations: revenue
    per (supplier nation, customer nation, ship year) for either
    direction of the pair. The SAME nation dimension joins twice under
    different aliases (supplier's vs customer's role); both copies are
    broadcast, and the pair DISJUNCTION — which couples the two roles
    and so cannot be pushed into either dimension alone — is applied
    after both joins. On real TPC-H data the per-nation filter
    (n_name IN (A,B)) also pushes into each broadcast side, shrinking
    the build; Catalyst derives exactly that IN from the disjunction
    (an OR of conjunctions over the two columns factors per side).
    Supplier is itself dimension-sized → broadcast; orders⋈lineitem is
    the one real shuffle, pruned by the ship-date scan filter."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ))
    j = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(dec_out(F.sum(_rev()), 2).alias("revenue"))


# ----------------------------------------------------------------------
# TPC-H Q8 shape: national market share (two-level conditional agg)
# ----------------------------------------------------------------------
@query(
    "ext_q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN n1.n_name = 'NATION_1' THEN
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region    ON n2.n_regionkey = r_regionkey
    WHERE p_type = 'ECONOMY'
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
)
def ext_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: NATION_1 suppliers'
    fraction of ECONOMY-part revenue sold into ASIA, per order year.
    Numerator and denominator are the SAME aggregate pass (conditional
    sum rides the unconditional one — never two scans); the five
    dimension sides (part filtered to one type, supplier, both nation
    roles, region) all broadcast, so the only exchanges are the
    lineitem⋈orders shuffle and the final tiny per-year merge. The
    region predicate prunes the customer side through the n2⋈region
    chain before the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ))
    region = F.broadcast(
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    n2 = F.broadcast(
        nat.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(n2, F.col("c_nationkey") == F.col("cn_key"), "left_semi")
    )
    j = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
    )
    rev = _rev()
    return j.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            6,
        ).alias("mkt_share")
    )


# ----------------------------------------------------------------------
# TPC-H Q13 shape: outer join with ON-clause residual, agg-of-agg
# ----------------------------------------------------------------------
@query(
    "ext_q13_cust_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def ext_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed 0, 1, 2, … non-urgent orders. The residual
    predicate (priority <> URGENT) lives in the JOIN condition, NOT a
    post-join filter — moving it to WHERE would silently drop the
    zero-order customers the query exists to count (COUNT(o_orderkey)
    counts non-null keys, so unmatched customers contribute 0). Two
    aggregation levels: per-customer counts (shuffle on custkey — at
    TPC-H scale orders⋈customer is fact-fact, AQE handles the skew of
    no-order vs heavy customers), then the tiny distribution rollup."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left_outer",
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ----------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar aggregate, decorrelated
# ----------------------------------------------------------------------
@query(
    "ext_q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 10
      -- l_quantity < 0.2*AVG(..) via decimal cross-multiplication
      -- (5*q*cnt < sum): order-independent, no double summation
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * (
        SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l2
         WHERE l2.l_partkey = p_partkey)
    """,
)
def ext_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — small-quantity-order revenue: items ordered
    below 20% of their part's average quantity, for one brand's small
    parts (container column doesn't exist here; p_size<10 plays its
    role). The correlated per-part AVG subquery is DECORRELATED: one
    groupBy(l_partkey).avg over the filtered parts' lineitems, then a
    broadcast join back — per-part thresholds are |parts-of-brand|
    rows, never a re-scan per outer row. The brand filter semi-joins
    lineitem FIRST so both the threshold build and the outer probe
    scan only the brand's items."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    # q < 0.2*AVG(q) rewritten as 5*q*cnt < sum over DECIMAL(18,2) —
    # order-independent on both engines (double AVG summation is
    # partition-order-dependent and can flip a boundary row at scale).
    thresholds = F.broadcast(
        li.groupBy("l_partkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
            F.count(F.lit(1)).alias("qty_cnt"),
        ).select(F.col("l_partkey").alias("t_partkey"), "qty_sum", "qty_cnt")
    )
    small = li.join(
        thresholds,
        (F.col("l_partkey") == F.col("t_partkey"))
        & (
            F.col("l_quantity").cast("decimal(18,2)")
            * F.lit(5)
            * F.col("qty_cnt")
            < F.col("qty_sum")
        ),
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# ----------------------------------------------------------------------
# TPC-H Q22 shape: global scalar subquery + NOT EXISTS anti join
# ----------------------------------------------------------------------
@query(
    "ext_q22_dormant_customers",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c
    -- c_acctbal > AVG(..) via decimal cross-multiplication (bal*cnt >
    -- sum): order-independent, no double summation (ADVICE r6)
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (
        SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
         WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def ext_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — global sales opportunity: above-average-balance
    customers with no RECENT orders (the stock query's 7-year phone
    prefix is a no-orders-at-all anti join; this schema's customers all
    have old orders, so recency keeps the anti join non-trivially
    selective — same shape, a date-filtered NOT EXISTS). Three pieces:
    (1) the average balance is ONE scalar — computed once and folded
    into the filter as a literal-like broadcast (a cross-join of one
    row), never re-evaluated per customer; (2) the anti join probes
    only date-pruned orders; (3) nationkey stands in for the phone
    country code. Output: per-country dormant count + locked-up
    balance."""
    cust = load_table(spark, sf_dir, "customer")
    # balance > AVG rewritten as bal*cnt > sum over DECIMAL(18,2):
    # double AVG is partition-order-dependent and a balance landing
    # between Spark's and DuckDB's low bits would flip parity at scale
    # (ADVICE r6). The one-row stats aggregate still broadcasts.
    bal_stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    ).select("o_custkey")
    rich = cust.join(F.broadcast(bal_stats)).filter(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("bal_cnt")
        > F.col("bal_sum")
    )
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy(
        F.col("c_nationkey").cast("long").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_out(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).alias(
            "totacctbal"
        ),
    )


# ----------------------------------------------------------------------
# TPC-H Q15 shape: aggregate view + scalar max + equality join-back
# ----------------------------------------------------------------------
@query(
    "ext_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def ext_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier: the quarter's revenue-per-supplier
    aggregate plays the stock query's CREATE VIEW role, its scalar MAX
    is folded in as an empty-frame window over the AGGREGATED view, and
    the view filters on revenue EQUALITY. The tie comparison happens on
    the EXACT decimal sum — rounding to double first could crown two
    suppliers whose true revenues differ beyond the 2-dp boundary, and
    which one wins would then be engine-dependent; ties on the exact
    value legitimately return multiple rows on both engines.

    Plan choice: a separate ``rev.agg(max)`` branch joined back reads
    lineitem TWICE (the two view subtrees prune differently, so neither
    static planning nor AQE deduplicates them into a ReusedExchange —
    verified). The window form scans lineitem once; its cost is one
    single-partition pass over the aggregated per-supplier rows
    (|suppliers| narrow rows — bounded and small relative to the fact
    table at every TPC-H scale; at 100 TB that's ~GBs against two 100 TB
    scans saved)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    top = rev.withColumn(
        "max_rev",
        F.max("total_revenue").over(
            Window.partitionBy()
        ),
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return top.join(
        supp, F.col("supplier_no") == F.col("s_suppkey")
    ).select(
        "s_suppkey",
        "s_name",
        F.round(F.col("total_revenue").cast("double"), 2).alias(
            "total_revenue"
        ),
    )


# ----------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive predicates (OR-of-ANDs)
# ----------------------------------------------------------------------
@query(
    "ext_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def ext_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — discounted revenue under an OR of three
    conjunctive (brand, size, quantity) clauses. The optimizer test:
    the disjunction mixes part-side and lineitem-side columns, and
    Catalyst must FACTOR per-side implications out of the OR — the
    part scan gets the brand/size OR-tree, the lineitem scan gets
    l_quantity BETWEEN 1 AND 30 (the union of the three ranges) —
    instead of evaluating the whole residual post-join. Written as one
    declarative filter; the plan gate asserts the factored pushdown
    actually happened (a hand-scheduled version of this query is
    exactly what the 'let Catalyst optimize' rule exists to avoid)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_size"
        )
    )
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (q >= 20) & (q <= 30)
        )
    )
    return j.filter(clause).agg(
        dec_out(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ----------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept orders waiting (decorrelated)
# ----------------------------------------------------------------------
@query(
    "ext_q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(late) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS sole_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT sole_late AS s_suppkey, COUNT(*) AS numwait
    FROM per_order
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY sole_late
    """,
)
def ext_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept orders waiting: for each
    supplier, the number of multi-supplier orders where THEY were the
    only late shipper (lateness adapted to ship > order + 60 days; the
    stock schema's receipt/commit dates don't exist here). The stock
    query is a triple-correlated EXISTS / NOT EXISTS; the scalable
    formulation DECORRELATES it into two stacked aggregations — per
    (order, supplier) lateness flags, then per-order counts — so the
    whole query is two partial-agg shuffles on order-prefixed keys and
    ZERO repeated probes of lineitem (the correlated form re-scans
    lineitem per outer row; Catalyst can decorrelate simple EXISTS but
    not this double-correlated pattern, so the rewrite is the
    operator). ``sole_late`` rides the same per-order aggregate as the
    counts — a third join back would be wasted."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.max(
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            1,
        ).otherwise(0)
    )
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late.alias("late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "sole_late"
        ),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy(F.col("sole_late").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
