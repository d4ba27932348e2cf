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
