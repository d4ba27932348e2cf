"""Diagnose the two worst capped-dedup 100x ratios (VERDICT r12 ask #2):
is x2_ngram_jaccard_capped's 20.28x / x2_containment_capped's 13.1x a
join-volume LEAK (pair work growing faster than data) or the designed
LINEAR pair-volume growth paying less fixed-cost amortization than a
scan-bound rung?

Both rungs share one capped shingle pipeline (dedup.DF_CAP drops
shingles with df > cap before the pair join), so ONE set of volume
counters answers for both. The 100x replica tags every token with its
copy index (tools/scale_bench._replicate), keeping copies disjoint in
shingle space — by construction each surviving posting list replicates
with its df UNCHANGED, so the expected pair-work ratio is exactly
|copies|, never copies^2 (cross-copy pairs) and never cap-saturation
(dfs don't add across copies).

Measures at 1x (sf0.1) and the 100x replica:
  posting_rows  |sh|   — exploded (doc, shingle-hash) rows pre-cap
  survivor_rows |sh2|  — rows after the df-cap anti-join
  pair_work     sum_h C(df_h, 2) over survivors — the exact pair-join
                output volume the capped rungs pay (the quantity the
                DF_CAP bound |docs|*cap/2 * avg caps)
  cand_pairs    distinct (doc_a, doc_b) candidates after the group-by

Writes PAIR_VOLUME_100X.json at the repo root and prints the ratios.
Run on an idle box:  python tools/capped_pair_diag.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_COPIES", "100")
os.environ.setdefault("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale100")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def volumes(spark, sf_dir: str) -> dict[str, int]:
    from weather_data_pipeline_spark.operators.dedup import (
        DF_CAP,
        shingle_arrays,
    )
    from weather_data_pipeline_spark.session import fan_out
    from weather_data_pipeline_spark.sources.testdata import load_table

    doc = fan_out(load_table(spark, sf_dir, "documents"))
    sh = (
        shingle_arrays(doc, 3)
        .select("doc_id", F.explode("grams").alias("shingle"))
        .select("doc_id", F.xxhash64("shingle").alias("h"))
    )
    df = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # one pass over the df histogram yields everything except cand_pairs
    agg = df.agg(
        F.sum("df").alias("posting_rows"),
        F.sum(F.when(F.col("df") <= DF_CAP, F.col("df"))).alias(
            "survivor_rows"
        ),
        F.sum(
            F.when(
                F.col("df") <= DF_CAP,
                F.col("df") * (F.col("df") - 1) / 2,
            )
        )
        .cast("long")
        .alias("pair_work"),
    ).collect()[0]
    hot = df.filter(F.col("df") > DF_CAP).select("h")
    sh2 = sh.join(F.broadcast(hot), "h", "left_anti")
    a = sh2.select(F.col("doc_id").alias("doc_a"), "h")
    b = sh2.select(F.col("doc_id").alias("doc_b"), "h")
    cand = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    return {
        "n_docs": doc.count(),
        "posting_rows": agg["posting_rows"],
        "survivor_rows": agg["survivor_rows"],
        "pair_work": agg["pair_work"],
        "cand_pairs": cand,
    }


def main() -> None:
    from tools import scale_bench as sb
    from weather_data_pipeline_spark.session import tune

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("capped-pair-diag")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SPOT_MEM", "48g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    sb.build(spark)
    v1 = volumes(spark, sb.BASE)
    v100 = volumes(spark, sb.SCALE_DIR)
    ratios = {k: round(v100[k] / max(v1[k], 1), 2) for k in v1}
    payload = {
        "copies": int(os.environ["SPARK_GRAFT_SCALE_COPIES"]),
        "base": sb.BASE,
        "v_1x": v1,
        "v_100x": v100,
        "ratios": ratios,
        "verdict": (
            "linear pair volume (ratios ~= copies): the 100x wall ratios "
            "are linear work on 32 fixed cores, not cap-saturation or a "
            "join-volume leak"
            if all(
                ratios[k] <= 1.15 * payload_copies
                for k in ("survivor_rows", "pair_work")
                for payload_copies in [
                    float(os.environ["SPARK_GRAFT_SCALE_COPIES"])
                ]
            )
            else "SUPERLINEAR pair volume — investigate (leak?)"
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PAIR_VOLUME_100X.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
