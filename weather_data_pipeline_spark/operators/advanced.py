"""Advanced relational operators the reference never needed but a general
engine must ship (SURVEY.md §2.9 [ext] tier): as-of join, exact
percentiles, skew-safe salted aggregation, GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table, register_views

# ----------------------------------------------------------------------
# X7 — as-of join (time-series point-in-time lookup)
# ----------------------------------------------------------------------
_ASOF_ORACLE = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'view' THEN ts END AS view_ts,
             CASE WHEN event_type = 'view' THEN event_id END AS view_event_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *,
             last_value(view_ts IGNORE NULLS) OVER pit AS asof_view_ts,
             last_value(view_event_id IGNORE NULLS) OVER pit AS asof_view_event_id
      FROM tagged
      WINDOW pit AS (
        PARTITION BY user_id
        ORDER BY ts, CASE event_type WHEN 'view' THEN 0 ELSE 1 END, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value, asof_view_ts, asof_view_event_id
    FROM w WHERE event_type = 'purchase'
"""


def asof_join_latest(
    df: DataFrame,
    key: str,
    order: str,
    left_pred,  # Column: rows being enriched
    right_pred,  # Column: rows supplying the as-of value
    carry: list[tuple[str, str]],  # (source col, output col) from the right side
    tiebreak: str,
) -> DataFrame:
    """As-of join as a single-shuffle union+window — Spark has no ASOF JOIN
    operator, but the classic restatement needs none: tag both streams,
    sort within key by (order, side, tiebreak), and carry the right side's
    values forward with last(ignorenulls). One hash shuffle on ``key``, no
    join, no range explosion — at 100 TB this beats any join-based plan
    because each partition is one linear sweep.

    Right-side rows at the same ``order`` value sort BEFORE left rows, so
    the match predicate is right.order <= left.order (inclusive).
    """
    both = df.filter(left_pred | right_pred)
    side = F.when(right_pred, 0).otherwise(1)
    tagged = both.select(
        "*",
        side.alias("_side"),
        *[
            F.when(right_pred, F.col(src)).alias(f"_r_{out}")
            for src, out in carry
        ],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(order, "_side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "*",
        *[
            F.last(f"_r_{out}", ignorenulls=True).over(w).alias(out)
            for _, out in carry
        ],
    )
    return carried.filter(left_pred).drop(
        "_side", *[f"_r_{out}" for _, out in carry]
    )


@query("x7_asof_join", oracle=_ASOF_ORACLE)
def x7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each purchase gets the user's latest view
    at-or-before it (ts tie → view first, then event_id order)."""
    ev = load_table(spark, sf_dir, "events")
    out = asof_join_latest(
        ev,
        key="user_id",
        order="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        carry=[("ts", "asof_view_ts"), ("event_id", "asof_view_event_id")],
        tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_view_ts", "asof_view_event_id"
    )


# ----------------------------------------------------------------------
# Exact percentiles (order statistics as aggregation)
# ----------------------------------------------------------------------
@query(
    "ext_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). At 100 TB swap in ``approx_percentile`` (t-digest
    sketch, bounded memory, mergeable across partitions) — same call shape,
    sketch result is engine-specific so the exact form carries the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", F.lit(q)), 6).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.99)
        ]
    )


#: rank-tolerance for the approx-percentile band twin: the sketch at
#: accuracy 10⁴ guarantees rank error ≤ 10⁻⁴·N; the band accepts the
#: estimate anywhere between the exact quantiles at q ± 0.02 — two
#: orders of magnitude of headroom, so a miss means a broken sketch
#: (wrong column, merge bug), never sketch noise.
APPROX_PCT_ACCURACY = 10_000
APPROX_PCT_TOL = 0.02


@query(
    "ext_approx_percentile_band",
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows,
           TRUE AS p50_in_band, TRUE AS p90_in_band
    FROM events GROUP BY event_type
    """,
)
def ext_approx_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band oracle for the t-digest-style percentile sketch (the same
    contract pattern as ``ext_acd_error_band``): runs the
    engine-specific ``percentile_approx`` — the op a 100 TB pipeline
    actually uses for order statistics (bounded memory, mergeable
    partials) — and value-checks its rank-error contract against exact
    quantiles computed in the same plan, per group, with the group's
    exact row count riding along for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    q = APPROX_PCT_TOL
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx(
            "value", F.lit(0.5), F.lit(APPROX_PCT_ACCURACY)
        ).alias("ap50"),
        F.percentile_approx(
            "value", F.lit(0.9), F.lit(APPROX_PCT_ACCURACY)
        ).alias("ap90"),
        F.percentile("value", F.lit(0.5 - q)).alias("lo50"),
        F.percentile("value", F.lit(0.5 + q)).alias("hi50"),
        F.percentile("value", F.lit(0.9 - q)).alias("lo90"),
        F.percentile("value", F.lit(0.9 + q)).alias("hi90"),
    )
    return agg.select(
        "event_type",
        "n_rows",
        ((F.col("ap50") >= F.col("lo50")) & (F.col("ap50") <= F.col("hi50"))).alias(
            "p50_in_band"
        ),
        ((F.col("ap90") >= F.col("lo90")) & (F.col("ap90") <= F.col("hi90"))).alias(
            "p90_in_band"
        ),
    )


# ----------------------------------------------------------------------
# Skew-safe salted aggregation
# ----------------------------------------------------------------------
@query(
    "ext_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def ext_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups on (key, salt) — a hot
    key's rows spread over 16 reducers — stage 2 merges the partials. The
    oracle is the plain single-stage groupBy: salting must be semantically
    invisible. (For built-in aggs Spark's partial aggregation + AQE skew
    handling already do this; the explicit form is the template for
    non-partial-izable aggregations and extreme key skew.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", (F.col("event_id") % 16).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv").cast("double"), 2).alias("total_value"),
    )


# ----------------------------------------------------------------------
# GROUPING SETS (multi-granularity rollup in one pass)
# ----------------------------------------------------------------------
_GSETS_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
"""


@query("ext_grouping_sets", oracle=_GSETS_SQL)
def ext_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — all four granularities in one shuffle (Spark expands
    to a single Expand + aggregate, not four scans)."""
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_SQL)


# ----------------------------------------------------------------------
# Skew-safe salted join
# ----------------------------------------------------------------------
def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where a hot key on the ``large`` side would overwhelm one
    reducer: the large side is salted deterministically from one of its
    own unique columns (``salt_from``), the small side is replicated
    ``n_salts`` ways, and the join runs on (key, salt) — the hot key's
    rows spread over ``n_salts`` reducers. Semantically invisible:
    identical rows to the plain join, ``n_salts``× the small side's
    shuffle volume as the price. (AQE's skew-join split handles moderate
    skew on its own; the explicit form is the template for extreme skew
    and for stateful/streaming joins AQE can't re-plan.)"""
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    lg = large.withColumn("_salt", salt.cast("int"))
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lg.join(
        sm, (F.col(large_key) == F.col(small_key)) & (lg._salt == sm._salt)
    ).drop("_salt")


@query(
    "ext_salted_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def ext_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders through the salted-join template; the oracle is
    the plain join — salting must not change a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li, orders, "l_orderkey", "o_orderkey", salt_from="l_linenumber"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_price"),
    )


# ----------------------------------------------------------------------
# Binned range (interval) join
# ----------------------------------------------------------------------
def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Point-in-interval join without a nested-loop: both sides are mapped
    to ``bin_width``-sized buckets of the (numeric) range dimension — a
    point lands in one bin, an interval explodes to the bins it spans —
    then an equi-join on the bin plus the residual range predicate.
    Candidate pairs are bounded by bin co-residency, so cost tracks true
    overlap; a plain ``points.join(intervals, between)`` would plan as a
    broadcast-nested-loop, quadratic at scale. Pick ``bin_width`` near the
    typical interval length: much smaller multiplies interval replication,
    much larger multiplies false candidates."""
    p_bin = (F.col(point_col) / bin_width).cast("long")
    i_bins = F.sequence(
        (F.col(start_col) / bin_width).cast("long"),
        (F.col(end_col) / bin_width).cast("long"),
    )
    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn("_bin", F.explode(i_bins))
    return (
        p.join(i, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )


@query(
    "ext_range_join",
    oracle="""
    WITH iv AS (
      SELECT event_id AS iv_id, user_id AS iv_user,
             epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
             epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS end_us
      FROM events WHERE event_type = 'signup'
    )
    SELECT iv_id, iv_user, event_id, event_type
    FROM events JOIN iv
      ON epoch_us(CAST(ts AS TIMESTAMP)) >= start_us
     AND epoch_us(CAST(ts AS TIMESTAMP)) <= end_us
    WHERE event_id <> iv_id
    """,
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which events fall inside the hour after each signup — binned
    interval join (1h bins = interval length); the oracle is the naive
    inequality join DuckDB can afford at sf0.01."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    iv = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("iv_id"),
        F.col("user_id").alias("iv_user"),
        F.col("us").alias("start_us"),
        (F.col("us") + 3_600_000_000).alias("end_us"),
    )
    hits = range_join_binned(
        ev.select("event_id", "event_type", "us"),
        iv,
        "us",
        "start_us",
        "end_us",
        bin_width=3_600_000_000,
    )
    return hits.filter(F.col("event_id") != F.col("iv_id")).select(
        "iv_id", "iv_user", "event_id", "event_type"
    )


#: staleness tolerance for the bounded as-of variant
ASOF_TOLERANCE_US = 2 * 60 * 60 * 1_000_000  # 2 hours


@query(
    "x7_asof_join_tolerance",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'view' THEN ts END AS view_ts,
             CASE WHEN event_type = 'view' THEN event_id END AS view_event_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *,
             last_value(view_ts IGNORE NULLS) OVER pit AS raw_ts,
             last_value(view_event_id IGNORE NULLS) OVER pit AS raw_id
      FROM tagged
      WINDOW pit AS (
        PARTITION BY user_id
        ORDER BY ts, CASE event_type WHEN 'view' THEN 0 ELSE 1 END, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN epoch_us(ts) - epoch_us(raw_ts) <= {ASOF_TOLERANCE_US}
                THEN raw_ts END AS asof_view_ts,
           CASE WHEN epoch_us(ts) - epoch_us(raw_ts) <= {ASOF_TOLERANCE_US}
                THEN raw_id END AS asof_view_event_id,
           raw_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(raw_ts) > {ASOF_TOLERANCE_US}
             AS stale_dropped
    FROM w WHERE event_type = 'purchase'
    """,
)
def x7_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound — pandas' ``merge_asof(...,
    tolerance=...)`` semantics: a match older than the tolerance is
    DISCARDED (NULL enrichment + a stale flag) rather than silently
    used, the difference between 'latest quote' and 'latest quote
    that's still meaningful'. Same single-shuffle union+window sweep
    as x7_asof_join; the tolerance is a post-sweep projection, so the
    knob costs nothing at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    out = asof_join_latest(
        ev,
        key="user_id",
        order="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        carry=[("ts", "raw_ts"), ("event_id", "raw_id")],
        tiebreak="event_id",
    )
    age = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("raw_ts").cast("timestamp")
    )
    fresh = age <= ASOF_TOLERANCE_US
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(fresh, F.col("raw_ts")).alias("asof_view_ts"),
        F.when(fresh, F.col("raw_id")).alias("asof_view_event_id"),
        (F.col("raw_ts").isNotNull() & ~fresh).alias("stale_dropped"),
    )


# ----------------------------------------------------------------------
# As-of join, direction='nearest' (round 8)
# ----------------------------------------------------------------------
_ASOF_NEAREST_ORACLE = """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'view' THEN ts END AS view_ts,
             CASE WHEN event_type = 'view' THEN event_id END AS view_event_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *,
             last_value(view_ts IGNORE NULLS) OVER back AS b_ts,
             last_value(view_event_id IGNORE NULLS) OVER back AS b_id,
             last_value(view_ts IGNORE NULLS) OVER fwd AS f_ts,
             last_value(view_event_id IGNORE NULLS) OVER fwd AS f_id
      FROM tagged
      WINDOW back AS (
        PARTITION BY user_id
        ORDER BY ts, CASE event_type WHEN 'view' THEN 0 ELSE 1 END, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      fwd AS (
        PARTITION BY user_id
        ORDER BY ts DESC,
                 CASE event_type WHEN 'purchase' THEN 0 ELSE 1 END,
                 event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                  OR epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts))
                THEN b_id ELSE f_id END AS nearest_view_event_id,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                  OR epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts))
                THEN epoch_us(ts) - epoch_us(b_ts)
                ELSE epoch_us(f_ts) - epoch_us(ts) END AS delta_us,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN 'none'
                WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                  OR epoch_us(ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(ts))
                THEN 'backward' ELSE 'forward' END AS direction
    FROM w WHERE event_type = 'purchase'
"""


@query("x7_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def x7_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with ``direction='nearest'`` (the third merge_asof
    mode, completing backward / backward+tolerance): each purchase is
    matched to the view closest in time on EITHER side — backward
    inclusive, forward strictly-after, ties (equal |Δt|) to backward —
    with the signed-to-absolute delta in integer MICROSECONDS (BIGINT
    on both engines; timestamp-interval arithmetic never crosses the
    engine boundary).

    Execution: the same no-join restatement as ``x7_asof_join`` run in
    BOTH directions over one hash shuffle on user_id — two window
    sorts share the single exchange (Spark plans Window(asc) then
    Window(desc) over the same partitioning), each partition is two
    linear sweeps. No range join, no |purchases|×|views| blowup at any
    scale. Equal-ts views sort before the purchase in the backward
    sweep (inclusive) and after it in the forward sweep (exclusive),
    so a Δ=0 match is always a backward match."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(is_view, F.col("ts")).alias("view_ts"),
        F.when(is_view, F.col("event_id")).alias("view_event_id"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            F.when(is_view, 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").desc(),
            F.when(F.col("event_type") == "purchase", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = tagged.select(
        "*",
        F.last("view_ts", ignorenulls=True).over(back).alias("b_ts"),
        F.last("view_event_id", ignorenulls=True).over(back).alias("b_id"),
        F.last("view_ts", ignorenulls=True).over(fwd).alias("f_ts"),
        F.last("view_event_id", ignorenulls=True).over(fwd).alias("f_id"),
    ).filter(F.col("event_type") == "purchase")
    db = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("b_ts").cast("timestamp")
    )
    df_ = F.unix_micros(F.col("f_ts").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    use_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (db <= df_)
    )
    return w.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(use_back, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("nearest_view_event_id"),
        F.when(use_back, db).otherwise(df_).alias("delta_us"),
        F.when(
            F.col("b_ts").isNull() & F.col("f_ts").isNull(), "none"
        )
        .when(use_back, "backward")
        .otherwise("forward")
        .alias("direction"),
    )
