"""Scale-design guarantees: the bounds that keep kernels alive at 100 TB.

Grouped-map (``applyInPandas``) materializes one whole pandas frame per
group in a single executor — so every sharded kernel's memory story is
"per-shard rows ≤ |input| / shards (× modulo imbalance)". These tests pin
that bound for the EMA kernel (VERDICT r5 ask #1) the same way
test_properties.py pins the near-dup pair blowup.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators.sessionize import (
    EMA_MAX_SHARD_ROWS,
    EMA_SHARDS,
    _ema_kernel,
    ema_daily,
    ema_shards_for,
)
from weather_data_pipeline_spark.sources.testdata import load_table

from .conftest import SF_ORACLE


def _daily(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.round(
            F.max_by("value", F.struct("ts", "event_id"))
            .cast("decimal(18,2)")
            .cast("double"),
            2,
        ).alias("close_value")
    )


def test_ema_shard_frames_bounded(spark):
    """The stated memory bound: with S shards, no shard frame exceeds
    2 × ceil(|daily| / S) rows (user_id % S is near-uniform for integer
    ids). This is the per-executor memory contract the kernel's
    fail-fast guard enforces at runtime."""
    daily = _daily(spark, SF_ORACLE)
    total = daily.count()
    for shards in (8, 32):
        sizes = (
            daily.withColumn("shard", F.col("user_id") % shards)
            .groupBy("shard")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert sizes <= 2 * math.ceil(total / shards), (shards, sizes, total)


def test_ema_shards_for_scales_with_data():
    """ema_shards_for grows linearly with daily-row volume so the
    per-shard frame stays under EMA_MAX_SHARD_ROWS/2 regardless of
    corpus size — the 100 TB sizing rule, asserted not prosed."""
    assert ema_shards_for() >= EMA_SHARDS
    for n in (10**6, 10**9, 10**12):
        s = ema_shards_for(n)
        assert math.ceil(n / s) <= EMA_MAX_SHARD_ROWS // 2, (n, s)


def test_ema_kernel_fail_fast_on_oversized_shard():
    """An oversized shard frame raises with the remedy instead of
    OOM-killing the executor (fail-fast posture of the gated all-pairs
    similarity rung)."""
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 10,
            "day": pd.date_range("2024-01-01", periods=10),
            "close_value": [float(i) for i in range(10)],
        }
    )
    with pytest.raises(ValueError, match="raise `shards`"):
        _ema_kernel(0.3, max_shard_rows=5)(pdf)
    out = _ema_kernel(0.3, max_shard_rows=10)(pdf)
    assert len(out) == 10


def test_uncapped_jaccard_gate(spark, monkeypatch):
    """The uncapped near-dup rung fail-fasts past its corpus ceiling,
    naming the capped and LSH rungs — it cannot be pointed at 100 TB by
    accident (mirror of the gated all-pairs similarity rung)."""
    from weather_data_pipeline_spark.operators import dedup

    monkeypatch.setattr(dedup, "MAX_UNCAPPED_DOCS", 10)
    with pytest.raises(ValueError, match="x2_ngram_jaccard_capped"):
        dedup.x2_ngram_jaccard(spark, SF_ORACLE).count()
    # the verdict is cached per (file version, ceiling) — the ceiling in
    # the key means this failing probe can never mask the passing one
    assert dedup._GATE_CACHE[dedup._gate_key(SF_ORACLE)] is True
    with pytest.raises(ValueError, match="x2_ngram_jaccard_capped"):
        dedup.x2_ngram_jaccard(spark, SF_ORACLE).count()  # served from cache
    monkeypatch.setattr(dedup, "MAX_UNCAPPED_DOCS", 1_000_000)
    assert dedup.x2_ngram_jaccard(spark, SF_ORACLE).count() > 0
    assert dedup._GATE_CACHE[dedup._gate_key(SF_ORACLE)] is False


def test_ema_output_shard_invariant(spark):
    """Shard count is a pure parallelism knob: every user's series lives
    wholly inside one shard, so results are identical for any count."""
    daily = _daily(spark, SF_ORACLE).cache()
    try:
        a = sorted(
            map(tuple, ema_daily(daily, shards=3).collect())
        )
        b = sorted(
            map(tuple, ema_daily(daily, shards=17).collect())
        )
        assert a == b
    finally:
        daily.unpersist()
