"""Join/agg skew diagnosis: measure a key column's distribution and
recommend a mitigation BEFORE a 100 TB shuffle discovers it the hard way.

One partial-aggregated count per key (the same exchange the real
join/agg would pay, minus the payload), then a bounded summary: only
the top-k heavy keys and a handful of scalar moments ever reach the
driver. The recommendation mirrors the repo's own ladder:

- skew ratio ≈ 1 → plain hash join/agg is fine;
- moderate (max key ≲ a few tasks' worth) → AQE skew-join splitting
  (spark.sql.adaptive.skewJoin, on via session.tune());
- extreme (one key ≫ a task) → salting (ext_salted_agg /
  ext_salted_join show the pattern), salt factor sized so the hottest
  key's slices fit a task.

Run: python tools/skew_report.py [table] [key] [sf_dir]
Prints one JSON object; importable as ``skew_report(df, key)`` for
tests and notebooks.
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_spark.session import tune  # noqa: E402
from weather_data_pipeline_spark.sources.testdata import load_table  # noqa: E402

#: rows a single shuffle task should comfortably hold; the salt factor
#: recommendation targets this (tune per cluster: ~task memory / row size)
TARGET_ROWS_PER_TASK = 5_000_000


def skew_report(
    df: DataFrame,
    key: str,
    top_k: int = 10,
    target_rows_per_task: int = TARGET_ROWS_PER_TASK,
) -> dict:
    """Distribution stats + mitigation advice for shuffling ``df`` on
    ``key``. Cost: ONE count-per-key aggregation (map-side combined);
    driver receives top_k rows + one stats row, never the key set."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("p50_n"),
        F.expr("percentile(n, 0.99)").alias("p99_n"),
    ).collect()[0]
    top = [
        {"key": str(r[key]), "n": r["n"]}
        for r in counts.orderBy(F.col("n").desc(), F.col(key)).limit(top_k).collect()
    ]
    n_keys = stats["n_keys"] or 0
    mean_n = (stats["n_rows"] / n_keys) if n_keys else 0.0
    ratio = (stats["max_n"] / mean_n) if mean_n else 0.0
    if stats["max_n"] and stats["max_n"] > target_rows_per_task:
        salt = math.ceil(stats["max_n"] / target_rows_per_task)
        advice = (
            f"salt the key (factor {salt}): the hottest key alone exceeds a "
            f"task's row budget — see ext_salted_agg/ext_salted_join"
        )
    elif ratio > 5.0:
        salt = 1
        advice = (
            "rely on AQE skew-join splitting (enabled via session.tune()); "
            "hot keys are several times the mean but each fits a task"
        )
    else:
        salt = 1
        advice = "no mitigation needed: distribution is near-uniform"
    return {
        "key": key,
        "n_keys": int(n_keys),
        "n_rows": int(stats["n_rows"] or 0),
        "max_key_rows": int(stats["max_n"] or 0),
        "p50_key_rows": float(stats["p50_n"] or 0.0),
        "p99_key_rows": float(stats["p99_n"] or 0.0),
        "skew_ratio_max_over_mean": round(ratio, 3),
        "recommended_salt": salt,
        "advice": advice,
        "top_keys": top,
    }


def main() -> None:
    table = sys.argv[1] if len(sys.argv) > 1 else "events"
    key = sys.argv[2] if len(sys.argv) > 2 else "event_type"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("skew-report")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    print(json.dumps(skew_report(load_table(spark, sf_dir, table), key)))
    spark.stop()


if __name__ == "__main__":
    main()
