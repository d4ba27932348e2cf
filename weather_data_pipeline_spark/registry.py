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
# in registration order. Round-4 rotation (VERDICT r3 ask #1): pin the
# flagship plus one driver-green representative per operator family
# (24 slots, including both round-2 hash-fail regressions), then rotate
# the remaining 26 slots so the r1–rN union covers every registered query.
#
# Rows-only queries (VERDICT r5 ask #6 resolution): exactly six queries
# carry no oracle, each for a stated reason AND each now paired with an
# oracle-bearing BAND TWIN that runs the same engine-specific op and
# value-checks its contract (tests/test_oracle_parity.py::
# test_rows_only_queries_each_have_a_band_twin pins the pairing):
#   x2_minhash_lsh        — candidate pairs/distances depend on Spark's
#                           minhash family + HashingTF murmur3 buckets;
#                           twin x2_minhash_lsh_recall (recall vs exact
#                           strong pairs, count oracle-exact)
#   x2_simhash            — xxhash64 signature values; twin
#                           x2_simhash_invariants (counts + determinism),
#                           plus portable twin x2_simhash_portable
#   ext_approx_count_distinct — HLL++ register estimates; twin
#                           ext_acd_error_band (|approx−exact| ≤ 4·rsd)
#   o27_random_split      — XORShift sampler row assignment; twin
#                           o27_random_split_invariants (partition +
#                           fraction band), plus o27_hash_split
#   o28_gbt_train_predict — GBT values engine-specific (SURVEY §7.4.3);
#                           twin o28_gbt_holdout_band (per-row abs err),
#                           plus o28_linreg_baseline
#   o29_next_day_forecast — GBT values; twin o29_forecast_band (exact
#                           at_date stamp + plausibility band)
# All 50 driver slots are oracle-bearing (enforced by tests/test_entry.py).
_PRIORITY: tuple[str, ...] = (
    # pinned family representatives (all driver-green in r1–r3)
    "o15_latest_per_key",  # flagship
    "w_flagship_latest",  # weather O3-scan → flatten chain
    "w_corrupt_quarantine",  # r2 hash-fail regression pin
    "w_api_source",  # O1 Python DataSource
    "o7_sql_table_scan",  # relational tier rep
    "o27_hash_split",  # ML split
    "o28_linreg_baseline",  # ML fit/score (O28/O30/O23)
    "x1_exact_dedup",
    "x2_ngram_jaccard",
    "x2_dup_components",
    "x3_cosine_topk",
    "x3_ivf_kmeans_topk",  # perf-weak family keeps a driver row
    "x4_quality_score",
    "x5_json_extract_agg",
    "x6_session_windows",  # r2 hash-fail regression pin
    "x7_asof_join",
    "x8_stratified_sample",
    "mm_metadata_extract",
    "ext_q1_pricing_summary",
    "ext_q3_shipping_priority",
    "ext_salted_agg",  # skew handling rep
    "ext_pandas_udf_scalar",  # python-exec rep
    "s_latest_per_key_stream",
    "s_stateful_running_totals",
    # rotating set (26). Round-6 rotation: swaps seven r5-green entries
    # (x3_lsh_buckets, x3_ivf_topk_nprobe2, x2_simhash_portable,
    # x2_minhash_portable, x2_minhash_lsh_portable, x3_quantize_int8,
    # x4_repetition_score — their rows stand in the r1–r5 union) for the
    # six new band twins (so every engine-specific op gets a driver-
    # checked contract row immediately) plus the bucketed-layout join
    # (VERDICT r5 ask #8 — the zero-exchange co-located join path gets a
    # driver row again). x6_ema_daily stays in-window to drive the
    # round-6 parameterized shard kernel under the real driver;
    # x3_label_centroids stays to drive the floor-trunc centroid change.
    # Second round-6 rotation (this session): seven newer operators
    # (TPC-H Q10, hopping windows batch+stream, SCD2 intervals, z-score
    # anomaly, PII scrub, z-order layout key) take the slots of seven
    # r5-green queries whose code is untouched this round
    # (x8_sequence_packing, x6_tumbling_hourly, x6_session_stats_per_user,
    # mm_decode_features, s_tumbling_hourly_stream, s_session_window_stream,
    # s_weather_latest_stream — their rows stand in the r1–r6 union).
    # x2_ngram_jaccard_capped also rotates out (its round-6 delta was
    # only the gate-verdict cache — output-identical below the ceiling;
    # r5 row + local sweep stand) for x2_tfidf_cosine, the new
    # decimal-sum weighted dedup rung. Registered OUTSIDE the window,
    # queueing for the r7 rotation (all local-parity green at sf0.01
    # and sf0.1): x6_mad_outliers, x4_token_normalize,
    # x6_funnel_stages, x5_json_keys_profile, w_csv_quarantine,
    # ext_cogroup_pandas, x3_knn_classify, ext_cdc_merge, x9_pagerank,
    # s_funnel_stream (stateful streaming funnel — order-sensitive state
    # machine with stream/batch parity), x2_dedup_keep_best,
    # x4_corpus_profile, x4_bigram_logprob, ext_q4_order_priority,
    # ext_q12_shipping_delay, ext_q14_promo_revenue, x4_heavy_hitters,
    # ext_incremental_agg, x3_ivf_pq_topk, x6_holt_smoothing,
    # x7_asof_join_tolerance, x3_ivf_recall_eval, x6_retention_cohorts,
    # x6_rfm_scores, x2_semantic_dedup, the second TPC-H batch
    # (ext_q6_revenue_delta, ext_q7_volume_shipping, ext_q8_market_share,
    # ext_q13_cust_distribution, ext_q17_small_qty_revenue,
    # ext_q22_dormant_customers), x1_line_dedup, x4_gopher_filter,
    # x8_length_buckets, x9_triangle_count, ext_q15_top_supplier,
    # ext_q19_disjunctive_revenue, x8_epoch_shuffle,
    # x1_intradoc_line_dedup, x4_perplexity_buckets, mm_audio_energy,
    # ext_q21_waiting_supplier, x6_interval_merge, x8_oversample_minority,
    # x3_mips_topk, s_topk_stream, x4_vocab_coverage, x8_budget_select,
    # x7_temporal_join.
    "ext_window_lag_lead",  # window-frame family rep stays
    "x3_label_centroids",  # stays: drives the round-6 floor-trunc change
    "x2_tfidf_cosine",
    "x6_ema_daily",  # stays: drives the round-6 parameterized shard kernel
    "ext_q10_returned_items",
    "x6_sliding_windows",
    "x6_validity_intervals",
    "x6_zscore_anomaly",
    "x4_pii_redact",
    "x8_zorder_layout",
    "s_sliding_hourly_stream",
    # round-6 additions: the six band twins + bucketed-layout join
    # (VERDICT asks #6/#8) and the eight brand-new round-6 operators
    # (BM25, chunking, approx-percentile band, OHLC, weighted sample,
    # unigram LM, PQ codes, PQ-ADC search). Swapped out for them:
    # w_flatten_stage, mm_resize_thumbnail, mm_frame_sample,
    # ext_python_udtf, ext_pandas_udaf_grouped, x2_dup_components_star,
    # x2_decontaminate, x8_mixture_sample (all r5-green with no round-6
    # code changes; their rows stand in the r1–r5 union).
    "ext_bucketed_join_agg",
    "ext_acd_error_band",
    "o27_random_split_invariants",
    "o28_gbt_holdout_band",
    "o29_forecast_band",
    "x2_minhash_lsh_recall",
    "x2_simhash_invariants",
    "x4_bm25_score",
    "x8_doc_chunking",
    "ext_approx_percentile_band",
    "x6_ohlc_daily",
    "x8_weighted_sample",
    "x4_unigram_logprob",
    "x3_pq_codes",
    "x3_pq_adc_topk",
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
    from .sources import csv_source as csvsrc
    from .sources import weather as wsrc

    wsrc.ensure_fixture()
    wsrc.ensure_corrupt_fixture()
    csvsrc.ensure_csv_fixture()


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
        graph,
        joins_aggs,
        json_ops,
        layout,
        ml_queries,
        multimodal,
        python_exec,
        relational,
        sessionize,
        similarity,
        streaming_queries,
        text_analysis,
        tpch_extra,
        weather_queries,
        windows,
    )

    _LOADED = True
