"""Generic format IO (SURVEY.md §2.1 generalized).

The reference touches JSON (raw layer) and Parquet (curated layer); a
general engine also speaks CSV and JSONL and writes partitioned/compacted
datasets. Conventions baked in:

- reads take an explicit schema (inference never runs at scale — a schema
  pass over 10⁵ files is a full metadata scan);
- writes go through ``partitioned_write``: layout (partition columns) and
  target file count are decided by the caller, because file sizing is the
  #1 lever for scan parallelism at 100 TB (too many small files → driver
  listing pain; too few → no parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def partitioned_write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    files_per_partition: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition-aware sink with explicit file sizing.

    ``files_per_partition`` repartitions by the partition columns before
    the write so each output directory gets a bounded file count (the
    compaction knob); without it, every input task writes a file into
    every partition dir it touches — the classic small-files explosion.
    """
    if partition_by and files_per_partition:
        df = df.repartition(files_per_partition, *partition_by)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table — the co-located-join layout.

    Two fact tables bucketed on their join key with the SAME bucket count
    join with ZERO exchanges: each task reads bucket i of both sides, and
    with ``sort`` the sort-merge join skips its sort too. At 100 TB this
    converts the repeated orders⋈lineitem shuffle (the single largest
    network cost in a TPC-H-shaped workload) into a one-time write-side
    layout decision. Bucket count is a physical-layout constant — pick it
    for target file sizes at full scale (e.g. 4096 × ~25 GB at 100 TB),
    never per-query.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_by)
    if sort:
        writer = writer.sortBy(bucket_by)
    writer.saveAsTable(table)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction — the 100 TB hygiene op: a table written
    by many tasks (or many incremental batches) accumulates files far
    smaller than a scan-efficient unit, and every downstream job then
    pays per-file open/footer costs. Sizes the output file count from
    the CURRENT on-disk bytes (no data scan), rewrites via coalesce —
    a narrow, shuffle-free repartitioning that only merges — and swaps
    atomically (write-new-then-rename, the snapshot protocol from
    streaming/jobs.py). Returns the new file count. Run per partition
    directory in production so compaction parallelism is partition-
    level and a failed rewrite never touches other partitions."""
    import math
    import os
    import shutil
    import uuid

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = f"{path}.compact.{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_files).write.parquet(tmp)
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
