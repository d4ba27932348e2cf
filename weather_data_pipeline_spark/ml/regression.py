"""ML stage (SURVEY.md §2.6, O27-O30) — the reference's train/predict path.

Reference (weather_etl.py:110-172): drop non-numeric cols, dict-encode
city, 90/10 split (seed 365), XGBRegressor fit on 22 numeric features with
label temp_c, R² score, then predict "tomorrow" by shifting
localtime_epoch +86400 on the latest snapshot per city.

Spark-native restatement: VectorAssembler → GBTRegressor inside a
pyspark.ml Pipeline (distributed fit/score, no driver-side matrices);
split via randomSplit(seed). Values differ from XGBoost by construction —
correctness here is pipeline-level (schema, row counts, R² sanity), per
SURVEY.md §7.4.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ML_FEATURES, ML_LABEL
from ..sources.weather import CITIES

def _city_code_map():
    """city → code literal map (reference weather_etl.py:112-122). Built
    lazily: column literals need an active SparkContext."""
    return F.create_map(*[F.lit(x) for i, c in enumerate(CITIES) for x in (c, i)])


def prepare_features(staged: DataFrame) -> DataFrame:
    """O12 projection + O24 encode: numeric features + encoded city + label."""
    return staged.select(
        "city",
        _city_code_map()[F.col("city")].cast("double").alias("city_code"),
        *[F.col(c).cast("double").alias(c) for c in ML_FEATURES],
        F.col(ML_LABEL).cast("double").alias(ML_LABEL),
    )


def split(df: DataFrame, train_frac: float = 0.9, seed: int = 365):
    """O27 — randomSplit is Spark's distributed train_test_split
    (weather_etl.py:125); deterministic for a fixed seed + partitioning."""
    return df.randomSplit([train_frac, 1.0 - train_frac], seed=seed)


def fit_gbt(train: DataFrame, seed: int = 365, max_iter: int = 20):
    """O28 — gradient-boosted trees on (city_code + numeric features).
    Returns a fitted pyspark.ml PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    assembler = VectorAssembler(
        inputCols=["city_code", *ML_FEATURES], outputCol="features"
    )
    gbt = GBTRegressor(
        featuresCol="features", labelCol=ML_LABEL, seed=seed, maxIter=max_iter
    )
    return Pipeline(stages=[assembler, gbt]).fit(train)


def score_r2(model, test: DataFrame) -> float:
    """O30 — R² on the holdout (weather_etl.py:129)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    preds = model.transform(test)
    return RegressionEvaluator(
        labelCol=ML_LABEL, predictionCol="prediction", metricName="r2"
    ).evaluate(preds)


def predict_next_day(model, latest_staged: DataFrame) -> DataFrame:
    """O22+O29+O20 — shift latest snapshots one day forward, batch-predict,
    return (city, predicted_temp, at_date) keyed per city (the reference's
    positional zip at weather_etl.py:165 re-derived as a keyed select,
    SURVEY.md §7.4.2)."""
    shifted = prepare_features(latest_staged).withColumn(
        "localtime_epoch", F.col("localtime_epoch") + F.lit(86400.0)
    )
    preds = model.transform(shifted)
    return preds.select(
        "city",
        F.col("prediction").alias("predicted_temp"),
        F.timestamp_seconds(F.col("localtime_epoch").cast("long"))
        .cast("timestamp_ntz")
        .alias("at_date"),
    )
