"""ML stage (O27-O30): pipeline-level correctness — schema, counts, and an
R² sanity band (value equality with the reference's XGBoost is impossible
by construction, SURVEY.md §7.4.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.ml.regression import (
    fit_gbt,
    predict_next_day,
    prepare_features,
    score_r2,
    split,
)
from weather_data_pipeline_spark.operators.flagship import latest_per_key
from weather_data_pipeline_spark.sources import weather as wsrc
from weather_data_pipeline_spark.transforms import flatten_raw


@pytest.fixture(scope="module")
def staged(spark):
    return flatten_raw(
        wsrc.read_raw(spark, wsrc.ensure_fixture()), with_ingest_date=True
    ).cache()


def test_prepare_features_schema(staged):
    feats = prepare_features(staged)
    assert "city_code" in feats.columns and "temp_c" in feats.columns
    assert feats.filter(F.col("city_code").isNull()).count() == 0
    # all feature columns numeric doubles
    assert all(t == "double" for c, t in feats.dtypes if c != "city")


def test_split_partitions_everything(staged):
    feats = prepare_features(staged)
    train, test = split(feats)
    assert train.count() + test.count() == 27


def test_fit_predict_score(staged):
    feats = prepare_features(staged)
    model = fit_gbt(feats, max_iter=10)
    # R² on the training set itself must be high — GBT memorizes 27 rows.
    r2 = score_r2(model, feats)
    assert 0.8 <= r2 <= 1.0


def test_next_day_forecast_keyed(staged):
    model = fit_gbt(prepare_features(staged), max_iter=5)
    latest = latest_per_key(staged, "city", "localtime", "localtime_epoch")
    out = predict_next_day(model, latest)
    rows = out.collect()
    assert len(rows) == 9
    assert {r.city for r in rows} == set(wsrc.CITIES)
    # at_date is exactly one day after each city's latest snapshot epoch
    latest_epochs = {r.city: r.localtime_epoch for r in latest.collect()}
    for r in rows:
        assert int(r.at_date.timestamp()) - latest_epochs[r.city] in (86400,)


def test_gbt_holdout_abs_err_band(spark):
    """The rows-only GBT query still carries a correctness claim: the
    time-based holdout (last fixture day) yields one prediction per city
    with a bounded error — temp features correlate strongly day-to-day,
    so a fit that regressed to garbage would blow this band."""
    from weather_data_pipeline_spark.operators.ml_queries import (
        o28_gbt_train_predict,
    )

    rows = o28_gbt_train_predict(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 9
    assert {r.city for r in rows} == set(wsrc.CITIES)
    errs = [r.abs_err for r in rows]
    assert all(e >= 0 and e == e for e in errs)  # finite, non-negative
    assert sum(errs) / len(errs) < 8.0  # mean abs err sanity band (deg C)


def test_forecast_temp_plausibility_band(spark):
    """o29's next-day predictions stay inside the fixture's physical
    range — a units or feature-wiring regression would leave it."""
    from weather_data_pipeline_spark.operators.ml_queries import (
        o29_next_day_forecast,
    )

    rows = o29_next_day_forecast(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 9
    assert all(-20.0 < r.predicted_temp < 50.0 for r in rows)
