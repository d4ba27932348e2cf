"""Streaming jobs (§2.8): incremental file arrival must converge to the
batch answer — stream-batch parity is the correctness bar."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_spark import pipeline
from weather_data_pipeline_spark.operators.flagship import latest_per_key
from weather_data_pipeline_spark.sources import weather as wsrc
from weather_data_pipeline_spark.streaming import jobs
from weather_data_pipeline_spark.transforms import flatten_raw


def test_incremental_latest_matches_batch(spark, tmp_path):
    """Files arrive day by day; after each drain the latest-per-key state
    equals the batch flagship over everything seen so far."""
    root = str(tmp_path)
    state = f"{root}/_state"
    ckpt = f"{root}/_checkpoint"  # stable → each run reads only new files

    for n_days in (1, 2, 3):
        date = wsrc.FIXTURE_DATES[n_days - 1]
        wsrc.write_raw_docs(wsrc.synthesize_raw_docs([date]), root)
        src = flatten_raw(jobs.stream_raw_weather(spark, root))
        jobs.incremental_latest_per_key(
            spark, src, key="city", order="localtime",
            tiebreak="localtime_epoch", state_path=state, checkpoint=ckpt,
        )
        got = {
            (r.city, r.localtime)
            for r in jobs.read_state(spark, state).select("city", "localtime").collect()
        }
        batch = flatten_raw(wsrc.read_raw(spark, root))
        want = {
            (r.city, r.localtime)
            for r in latest_per_key(batch, "city", "localtime", "localtime_epoch")
            .select("city", "localtime")
            .collect()
        }
        assert got == want, f"divergence after {n_days} day(s)"
        assert len(got) == 9


def test_stream_source_schema_full(spark):
    """The file-stream source exposes the explicit raw schema, no inference."""
    src = jobs.stream_raw_weather(spark, wsrc.ensure_fixture())
    assert src.isStreaming
    assert src.schema.fieldNames() == ["location", "current"]


def test_tws_capability_gate(spark):
    """transformWithStateInPandas needs protobuf for its state-protocol
    worker; without it the op must fail fast naming the
    applyInPandasWithState twin — never crash the state worker mid-query.
    Where the runtime has protobuf, the op must match its batch twin."""
    import pytest as _pytest

    from weather_data_pipeline_spark.operators import python_exec as px

    from .conftest import SF_ORACLE

    if not px.tws_available():
        with _pytest.raises(NotImplementedError, match="s_stateful_running_totals"):
            px.s_user_stats_tws(spark, SF_ORACLE)
        return
    from .oracle_harness import compare

    compare(
        spark,
        "s_user_stats_tws",
        px.s_user_stats_tws,
        px.S_USER_STATS_TWS_ORACLE,
        SF_ORACLE,
    )
