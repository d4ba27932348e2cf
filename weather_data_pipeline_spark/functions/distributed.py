"""Distributed exact-order primitives shared by the ``*_scalable``
rungs (round 7): global ranks and NTILE arithmetic with NO
single-partition exchange anywhere.

The construction is the classic distributed prefix sum:
range-partition on the (total) order, count rows per partition —
O(config) rows, never data-proportional — turn the counts into
exclusive prefix offsets on the driver, and add each partition's
offset to its local ``row_number``. The range partitioner guarantees
every key in partition *i* sorts before every key in partition *i+1*,
so local rank + offset IS the exact global rank. The partitioned
input is materialized once with ``localCheckpoint`` (self-freeing —
ContextCleaner releases it with the result; see x9_pagerank) so the
offsets job and the final job see the same partition assignment.

Consumers: ``x4_perplexity_buckets_scalable`` (exact distributed
NTILE), ``x6_rfm_scores_scalable`` (three-dimension quintiles);
``x8_budget_select_scalable`` / ``x8_length_buckets_scalable`` use
the same construction with cumulative-sum / grouped variants inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_ranks(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "k",
) -> tuple[DataFrame, int]:
    """Add exact 1-based global ranks by ``order_cols`` (which must be
    a TOTAL order — include a unique tiebreak) without any task seeing
    more than one range-partition. Returns ``(ranked_df, n_rows)``;
    the input is materialized (eager localCheckpoint), so the caller
    pays one pass over ``df`` plus one narrow window pass."""
    parts = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = {
        r["_pid"]: r["n"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(psums):
        offsets.append((pid, acc))
        acc += psums[pid]
    off = F.broadcast(
        spark.createDataFrame(offsets, schema="_pid int, _offset long")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        parts.withColumn("_lrn", F.row_number().over(w))
        .join(off, "_pid")
        .withColumn(rank_col, F.col("_lrn") + F.col("_offset"))
        .drop("_pid", "_lrn", "_offset")
    )
    return ranked, acc


def ntile_of_rank(k: Column, n: int, tiles: int) -> Column:
    """SQL NTILE(tiles) as pure arithmetic on an exact global rank
    ``k`` out of ``n`` rows: with ``q, r = divmod(n, tiles)`` the
    first ``r`` tiles take ``q+1`` rows, the rest ``q`` — identical
    boundary semantics to the window function, no window needed."""
    q, r = divmod(n, tiles)
    if r == 0:
        return F.ceil(k / F.lit(max(q, 1)))
    return F.when(k <= r * (q + 1), F.ceil(k / (q + 1))).otherwise(
        r + F.ceil((k - r * (q + 1)) / F.lit(q))
    )
