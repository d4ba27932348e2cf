"""Python execution surface: scalar pandas UDF, Python UDTF, and custom
stateful streaming (applyInPandasWithState).

The reference has no UDF/UDAF/UDTF of any kind (SURVEY.md §2.9); the
engine ships the full Python-execution API anyway because that's the
escape hatch every real pipeline eventually needs. Rules of the house:

- Arrow-batched pandas UDFs only — never row-at-a-time ``F.udf`` (10-100×
  slower; SURVEY.md guidance);
- deterministic arithmetic (plain IEEE ops) so even Python-side operators
  stay oracle-checkable;
- stateful streaming via ``applyInPandasWithState`` with an explicit
  state schema — the engine-native form of a custom streaming operator.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from ..registry import query
from ..sources.testdata import load_table
from ..streaming import jobs


# ----------------------------------------------------------------------
# Scalar pandas UDF (Arrow-vectorized, one numpy op per batch)
# ----------------------------------------------------------------------
@pandas_udf(DoubleType())
def _gross_up(value: pd.Series) -> pd.Series:
    # deterministic IEEE double arithmetic — identical in any engine
    return (value * 1.08 + 1.0).round(6)


@query(
    "ext_pandas_udf_scalar",
    oracle="""
    SELECT event_id, value, ROUND(value * 1.08 + 1.0, 6) AS grossed
    FROM events
    """,
)
def ext_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: whole Arrow batches cross the
    JVM↔Python boundary once, the kernel is one numpy expression. (The
    built-in-function form of this exact expression is preferred in real
    plans — this query exists to keep the UDF path itself under the
    oracle.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value", _gross_up("value").alias("grossed"))


# ----------------------------------------------------------------------
# Python UDTF (table function: one input row → N output rows)
# ----------------------------------------------------------------------
@udtf(returnType="word: string, pos: int")
class _WordSplit:
    def eval(self, text: str):
        if text:
            for pos, word in enumerate(text.split(" ")):
                yield word, pos


@query(
    "ext_python_udtf",
    oracle="""
    SELECT doc_id, words[i] AS word, i - 1 AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 50),
         UNNEST(generate_series(1, len(words))) AS t(i)
    """,
)
def ext_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) under LATERAL
    join — the row-expanding escape hatch (a real pipeline would put a
    sentence segmenter or parser here; the built-in explode form is
    `x4_term_frequency`)."""
    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("word_split", _WordSplit)
    doc.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word, s.pos "
        "FROM udtf_docs d, LATERAL word_split(d.text) s"
    )


# ----------------------------------------------------------------------
# Custom stateful streaming operator (applyInPandasWithState)
# ----------------------------------------------------------------------
def _running_totals(key, pdf_iter, state):
    """Per-user running (count, value-sum) maintained in explicit state."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


@query(
    "s_stateful_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def s_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: ``applyInPandasWithState`` keeps
    (count, sum) per user in the state store and emits the running totals
    each trigger. After an availableNow drain the state equals the batch
    aggregation — the oracle. (Python state op; sums accumulate in decimal
    -exact per-batch chunks, rounded at the emit boundary.)"""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sink = f"s_stateful_{uuid.uuid4().hex[:8]}"
    src = jobs.stream_events(spark, sf_dir)
    out = src.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    jobs.run_to_completion(
        out.writeStream.format("memory").queryName(sink).outputMode("update"),
        "stateful-totals",
    )
    # final state per user = last emitted row per user (single batch here,
    # but dedupe defensively by taking the max running count)
    latest = spark.table(sink).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )
    return latest


# ----------------------------------------------------------------------
# Grouped-aggregate pandas UDAF (Arrow batch per group → one scalar)
# ----------------------------------------------------------------------
@pandas_udf(DoubleType())
def _median_udaf(value: pd.Series) -> float:
    # interpolated median: order-independent, same (a+b)/2 IEEE op in any
    # engine — keeps a Python UDAF oracle-checkable
    return float(value.median())


@query(
    "ext_pandas_udaf_grouped",
    oracle="""
    SELECT event_type, ROUND(median(value), 6) AS median_value
    FROM events GROUP BY event_type
    """,
)
def ext_pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: each group's column arrives as one Arrow
    batch, the kernel returns one scalar. Median is deliberately a
    holistic (non-partializable) aggregate — exactly the case where a
    custom UDAF is warranted over built-ins; Spark plans a full shuffle
    of group rows (no map-side combine), which is the true cost of any
    holistic aggregate at scale (cf. salted_agg for the skew antidote)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(_median_udaf("value"), 6).alias("median_value")
    )


# ----------------------------------------------------------------------
# transformWithState — the Spark 4 arbitrary-state API (successor to
# applyInPandasWithState: typed state handles, timers, TTL, and state
# schema evolution; this is the API new stateful operators should target)
# ----------------------------------------------------------------------
def tws_available() -> bool:
    """transformWithState's Python worker speaks a protobuf state
    protocol; without the protobuf package the worker crashes mid-query
    (far worse than failing fast here). Probe once at call time."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _user_stats_processor():
    """Factory so the StatefulProcessor class only exists where the
    import succeeds (the API is Spark 4+)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        """Per-user (count, sum, max) in a typed ValueState — the same
        semantics as the batch groupBy twin, held exactly-once in the
        state store across triggers."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n LONG, total DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total, mx = self._agg.get()
            else:
                n, total, mx = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
            self._agg.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return UserStats()


#: batch-parity oracle for s_user_stats_tws (checked by
#: tests/test_streaming.py when the runtime supports the API)
S_USER_STATS_TWS_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
"""


def s_user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator on ``transformWithStateInPandas``
    — the Spark 4 arbitrary-state API (typed ValueState handles; the
    successor to ``s_stateful_running_totals``'s applyInPandasWithState,
    adding timers/TTL/state-evolution for long-running 100 TB streams).
    After an availableNow drain the per-user state equals the batch
    aggregation — the oracle. Emits in update mode; the memory-sink
    result dedupes to the final emission per user (max running count).

    NOT in the query registry: the API's Python worker requires the
    protobuf package, absent from this container — the capability probe
    fails fast naming the applyInPandasWithState twin instead of letting
    the state worker crash mid-query. The parity test runs wherever the
    runtime supports it (tests/test_streaming.py)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf) for its state-protocol worker; use "
            "s_stateful_running_totals (applyInPandasWithState) on this "
            "runtime"
        )
    sink = f"s_tws_{uuid.uuid4().hex[:8]}"
    src = jobs.stream_events(spark, sf_dir)
    out = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_stats_processor(),
        outputStructType=(
            "user_id long, n_events long, total_value double, max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )
    jobs.run_to_completion(
        out.writeStream.format("memory").queryName(sink).outputMode("update"),
        "tws-user-stats",
    )
    latest = spark.table(sink).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
        F.max_by("max_value", "n_events").alias("max_value"),
    )
    return latest


# ----------------------------------------------------------------------
# Cogrouped applyInPandas (two tables, one aligned kernel call per shard)
# ----------------------------------------------------------------------
#: shard count floor for the cogroup kernel — one kernel call per SHARD,
#: not per key: grouped-map pays ~2 ms of Arrow frame overhead per group,
#: so per-key cogrouping benched 40 s at sf0.1 (15k keys) vs ~1 s
#: sharded. Same pattern (and same per-shard memory bound rationale) as
#: the EMA kernel (sessionize.py EMA_SHARDS).
COGROUP_SHARDS = 32

#: fail-fast per-shard frame bound (either side), the EMA convention
COGROUP_MAX_SHARD_ROWS = 5_000_000


def _reconcile_shard(events_pdf: pd.DataFrame, cust_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-shard reconciliation kernel: both frames hold MANY keys; the
    per-key loop runs here, kernel-side, where it costs microseconds.
    Sums use math.fsum (exactly rounded → independent of the arbitrary
    row order a cogroup hands the kernel — the centroid-kernel
    convention)."""
    import math

    for side, pdf in (("events", events_pdf), ("customer", cust_pdf)):
        if len(pdf) > COGROUP_MAX_SHARD_ROWS:
            raise ValueError(
                f"cogroup {side} shard frame has {len(pdf)} rows > bound "
                f"{COGROUP_MAX_SHARD_ROWS}: raise the shard count so each "
                f"frame fits executor memory"
            )
    ev_g = {int(k): g for k, g in events_pdf.groupby("user_id", sort=False)}
    cu_g = {int(k): g for k, g in cust_pdf.groupby("c_custkey", sort=False)}
    rows = []
    for k in sorted(set(ev_g) | set(cu_g)):
        e, c = ev_g.get(k), cu_g.get(k)
        total = math.fsum(float(v) for v in e["value_d"]) if e is not None else 0.0
        acct = math.fsum(float(v) for v in c["acct_d"]) if c is not None else None
        rows.append(
            (
                k,
                0 if e is None else len(e),
                round(total, 2),
                0 if c is None else len(c),
                None if acct is None else round(acct, 2),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["key_id", "n_events", "total_value", "n_customers", "acctbal"],
    )


@query(
    "ext_cogroup_pandas",
    oracle="""
    WITH ev AS (
      SELECT user_id AS key_id, COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY user_id
    ), cu AS (
      SELECT c_custkey AS key_id, COUNT(*) AS n_customers,
             ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS acctbal
      FROM customer GROUP BY c_custkey
    )
    SELECT COALESCE(ev.key_id, cu.key_id) AS key_id,
           COALESCE(ev.n_events, 0) AS n_events,
           COALESCE(ev.total_value, 0.0) AS total_value,
           COALESCE(cu.n_customers, 0) AS n_customers,
           cu.acctbal AS acctbal
    FROM ev FULL OUTER JOIN cu ON ev.key_id = cu.key_id
    """,
)
def ext_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInPandas`` — the two-table grouped-map
    operator (FlatMapCoGroupsInPandas): both inputs hash-shuffle ONCE
    on a deterministic shard key (``key % COGROUP_SHARDS`` — one Arrow
    frame per SHARD, with the per-key loop inside the kernel; per-KEY
    cogrouping paid frame overhead × 15k keys, benched 40x slower),
    then the kernel sees each shard's rows from BOTH tables as two
    aligned pandas frames — the escape hatch for per-key reconciliation
    logic a SQL full-outer join can't express (here it CAN, which is
    what makes it oracle-checkable: the kernel must reproduce the
    full-outer aggregate exactly, fsum keeping Python's double sums
    order-independent). Frames fail fast past the per-shard row bound
    instead of OOMing (the EMA kernel convention); output values are
    shard-invariant, so correctness never depends on the count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % COGROUP_SHARDS).alias("shard"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("value_d"),
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % COGROUP_SHARDS).alias("shard"),
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("acct_d"),
    )
    out = ev.groupBy("shard").cogroup(cu.groupBy("shard")).applyInPandas(
        _reconcile_shard,
        schema=(
            "key_id long, n_events long, total_value double, "
            "n_customers long, acctbal double"
        ),
    )
    return out


# ----------------------------------------------------------------------
# Stateful streaming funnel — a per-key state MACHINE, not a running sum
# ----------------------------------------------------------------------
#: unset-timestamp sentinel in the funnel state tuple (state structs
#: can't carry NULLs portably; -1 is below any event-time)
_UNSET = -1


def _funnel_state(key, pdf_iter, state):
    """Per-user funnel state machine over event-time-ordered input:
    signup arms the funnel, the first later view advances it, the first
    still-later purchase completes it. State survives across triggers;
    within a trigger the batch is sorted by (ts, event_id) — the
    availableNow replay therefore equals the batch funnel exactly.
    (Out-of-order ARRIVAL across triggers would need watermark-bounded
    buffering before this operator — the standard caveat for any
    order-sensitive stateful op.)"""
    t1, t2, t3 = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, et in zip(pdf["ts"], pdf["event_type"]):
            ns = int(ts.value)
            if et == "signup" and t1 == _UNSET:
                t1 = ns
            elif et == "view" and t1 != _UNSET and ns > t1 and t2 == _UNSET:
                t2 = ns
            elif et == "purchase" and t2 != _UNSET and ns > t2 and t3 == _UNSET:
                t3 = ns
    state.update((t1, t2, t3))
    if t1 == _UNSET:
        yield pd.DataFrame(
            columns=["user_id", "signup_ts", "first_view_ts",
                     "first_purchase_ts", "stage_reached"]
        )
        return
    def ts_of(v):
        return pd.NaT if v == _UNSET else pd.Timestamp(v)

    stage = 3 if t3 != _UNSET else (2 if t2 != _UNSET else 1)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "signup_ts": [ts_of(t1)],
            "first_view_ts": [ts_of(t2)],
            "first_purchase_ts": [ts_of(t3)],
            "stage_reached": [stage],
        }
    )


@query(
    "s_funnel_stream",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS first_view_ts
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.signup_ts
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.first_view_ts
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.signup_ts, s2.first_view_ts, s3.first_purchase_ts,
           CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS stage_reached
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def s_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel as a CUSTOM stateful streaming operator — a per-key
    state MACHINE (armed → viewed → purchased), not a running
    aggregate: ``applyInPandasWithState`` holds each user's three stage
    timestamps in the state store and advances them as events replay.
    After the availableNow drain the emitted stages equal the batch
    funnel (x6_funnel_stages' oracle verbatim) — stream/batch parity
    for an order-sensitive operator, the strongest form of the §2.8
    contract."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    sink = f"s_funnel_{uuid.uuid4().hex[:8]}"
    src = jobs.stream_events(spark, sf_dir)
    out = src.groupBy("user_id").applyInPandasWithState(
        _funnel_state,
        outputStructType=(
            "user_id long, signup_ts timestamp_ntz, "
            "first_view_ts timestamp_ntz, first_purchase_ts timestamp_ntz, "
            "stage_reached int"
        ),
        stateStructType="t1 long, t2 long, t3 long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    jobs.run_to_completion(
        out.writeStream.format("memory").queryName(sink).outputMode("update"),
        "stateful-funnel",
    )
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(
                    "signup_ts", "first_view_ts", "first_purchase_ts",
                    "stage_reached",
                ),
                "stage_reached",
            ).alias("s")
        )
        .select(
            "user_id",
            "s.signup_ts",
            "s.first_view_ts",
            "s.first_purchase_ts",
            "s.stage_reached",
        )
    )
