"""Query registry — the single source for the driver contract.

Every implemented operator from SURVEY.md §2 registers here a named
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables. ``__spark_entry__``
re-exports these.

Determinism rules enforced by convention here (SURVEY.md §7.4):
- aggregate doubles through DECIMAL casts (exact, order-independent) or
  explicit rounding applied identically on both sides;
- every window ``ORDER BY`` carries a unique tiebreak key;
- timestamps compared as UTC; session tz pinned via session.tune().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` is DuckDB ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# The driver verifies correctness for the first 50 registered queries only,
# in registration order. This explicit priority list pins the first 50 slots
# to one representative per SURVEY.md §2 operator (O7–O28, X1–X8, TPC-H
# headliners, streaming, python-exec) plus every query that failed hash_match
# in round 1, so each operator family carries a driver correctness row.
# Remaining queries keep their module registration order after the cap.
_PRIORITY: tuple[str, ...] = (
    # flagship + weather reference pipeline (O1, O3, O9/O10, O15, O31)
    "o15_latest_per_key",
    "w_flagship_latest",  # runs the full O3-scan → flatten chain inline
    "w_corrupt_quarantine",
    "w_api_source",
    # reference relational / scalar surface (O7–O26)
    "o7_sql_table_scan",
    "o8_json_serialize",
    "o9_nested_flatten",
    "o11_rename",
    "o12_projection",
    "o13_filter_eq",
    "o14_rank_filter_topk",
    "o16_union_all",
    "o18_column_zip",
    "o19_parse_nonpadded_hour",
    "o20_epoch_roundtrip",
    "o21_ts_to_string",
    "o22_epoch_shift_day",
    "o24_map_encode",
    "o25_map_decode",
    "o26_date_math",
    # ML tier (O27–O30)
    "o27_hash_split",
    "o28_linreg_baseline",
    # LLM-data ops (X1–X8). r3 swaps: the round's new operators take the
    # slots of proven-stable r1+r2-green variants whose families stay
    # represented (x3_embedding_near_dup → x2_dup_components;
    # x5_json_get_path → s_dedup_stream below;
    # x6_session_window_native → x3_ivf_kmeans_topk — boundary semantics
    # stay pinned locally by tests/test_properties.py)
    "x1_exact_dedup",
    "x2_ngram_jaccard",
    "x2_dup_components",
    "x3_cosine_topk",
    "x3_lsh_candidate_pairs",
    "x3_ivf_topk",
    "x3_ivf_kmeans_topk",
    "x4_quality_score",
    "x4_term_frequency",
    "x5_json_extract_agg",
    "x6_session_windows",
    "x6_gap_fill_locf",
    "x7_asof_join",
    "x8_stratified_sample",
    # multimodal representatives (rotated in r3 so no family is driver-dark;
    # ext_pivot / ext_grouping_sets / ext_join_broadcast_dims rotate out —
    # each passed r1+r2 and stays covered by the local parity sweep, with
    # their families still in-window via ext_rollup / ext_salted_agg)
    "mm_metadata_extract",
    "mm_type_rollup",
    # TPC-H headliners + round-1 hash-fail set
    "ext_q1_pricing_summary",
    "ext_q3_shipping_priority",
    "ext_q5_local_supplier",
    "ext_q18_large_orders",
    "ext_rollup",
    "ext_salted_agg",
    # window, python-exec, streaming representatives
    "ext_window_ranks",
    "ext_pandas_udf_scalar",
    "s_latest_per_key_stream",
    "s_stateful_running_totals",
    "s_stream_stream_join",
    "s_dedup_stream",
)


def _prioritized(d: dict[str, object]) -> dict[str, object]:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _prioritized(_QUERIES)  # type: ignore[return-value]


def oracle_sql() -> dict[str, str]:
    _load_all()
    _materialize_fixtures()
    return _prioritized(_ORACLE)  # type: ignore[return-value]


def _materialize_fixtures() -> None:
    """The weather oracles scan fixture trees with read_json/read_text
    globs; materialize them (atomic, idempotent) before handing out oracle
    SQL so DuckDB never races a missing file. Lives here — not at operator
    import time — so importing the registry stays side-effect-free."""
    from .sources import weather as wsrc

    wsrc.ensure_fixture()
    wsrc.ensure_corrupt_fixture()


_LOADED = False


def _load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        advanced,
        dedup,
        flagship,
        joins_aggs,
        json_ops,
        ml_queries,
        multimodal,
        python_exec,
        relational,
        sessionize,
        similarity,
        streaming_queries,
        text_analysis,
        weather_queries,
        windows,
    )

    _LOADED = True
