"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The pattern a 100 TB training-data pipeline needs: media travels as a
``binary`` column with a typed metadata struct beside it; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
functions over ``mapInPandas`` (one Python process per partition, columnar
interchange, no per-row pickling). The testdata has no true media, so the
*payload* here is deterministic synthetic bytes derived from ``documents``
— byte-level ops (hash, length, magic, sampling) are real and
oracle-checked; the codec-dependent decode step is a clearly-marked stub
(``decode_image``) since no image/audio library ships in this container.

Plan shape at scale: a media table partitions by content-hash range; all
ops below are narrow (no shuffle) except the groupBy rollups, which
partial-aggregate map-side.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.testdata import load_table

#: media-type assignment: deterministic round-robin by doc_id.
_MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]

#: Magic prefixes per media type (real file signatures).
_MAGIC = {"image/png": "89504e47", "audio/wav": "52494646", "video/mp4": "66747970"}


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` → (doc_id, media_type, payload BINARY, meta STRUCT).

    Payload = magic bytes + the document text's bytes (deterministic, so
    oracles can rebuild it); meta carries the typed per-media fields every
    real pipeline tracks (byte size, fake width/height derived from the
    payload hash — stand-ins for decoded dimensions).
    """
    doc = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    magic = F.element_at(
        F.create_map(*[F.lit(x) for kv in _MAGIC.items() for x in kv]), mt
    )
    payload = F.concat(F.unhex(magic), F.encode("text", "UTF-8"))
    return doc.select(
        "doc_id",
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            (F.abs(F.xxhash64(payload)) % 1920 + 1).cast("int").alias("width"),
            (F.abs(F.xxhash64(payload, F.lit(1))) % 1080 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


@query(
    "mm_metadata_extract",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           4 + octet_length(encode(text)) AS n_bytes,
           CASE doc_id % 3 WHEN 0 THEN '89504e47' WHEN 1 THEN '52494646'
                ELSE '66747970' END AS magic_hex
    FROM documents
    """,
)
def mm_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: byte length + magic-prefix sniffing —
    pure JVM built-ins over the binary payload, no Python, no shuffle."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic_hex"),
    )


@query(
    "mm_type_rollup",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n,
           CAST(SUM(4 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(4 + octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY 1
    """,
)
def mm_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting per media type (the partition-planning query for
    a media lake: sizes drive file-compaction and partition layout)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


# ----------------------------------------------------------------------
# Arrow-batched decode / feature extraction over mapInPandas
# ----------------------------------------------------------------------

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB — real decode needs an image codec library (PIL/cv2), which
    this container does not ship. The Spark-side plumbing (binary column →
    Arrow batch → per-payload Python call → typed result schema) is real
    and tested via the deterministic byte-level features below."""
    raise NotImplementedError("image codec not available in this environment")


def _feature_batches(it: Iterator) -> Iterator:
    """mapInPandas worker: one pandas frame per Arrow batch. Byte-level
    features are computed vectorized with numpy; a real decoder would call
    ``decode_image(payload)`` here instead of the mean-byte stand-in."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("int32")
        mean_byte = payloads.map(
            lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
        )
        # frame sampling stand-in: one "frame" per 64 payload bytes
        n_frames = (n_bytes // 64 + 1).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "mean_byte": mean_byte.round(6),
                "n_frames": n_frames,
            }
        )


@query("mm_decode_features")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over media payloads via Arrow-batched
    ``mapInPandas`` — the decode/resize/frame-sample execution pattern.
    Rows-only: the features are deterministic, but byte-mean arithmetic
    is a Python-side stand-in with no DuckDB twin."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(_feature_batches, schema=_FEATURE_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id, 4 + octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT doc_id, i AS frame_idx, (i - 1) * 64 AS byte_offset
    FROM media, UNNEST(generate_series(1, n_bytes // 64 + 1)) AS t(i)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a lateral expansion: one output row per sampled
    frame offset (every 64 bytes) — the explode-shaped half of video
    frame extraction, JVM-side; the per-frame pixel decode is the stubbed
    step (``decode_image``)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.expr("meta.n_bytes div 64") + 1)
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        "frame_idx",
        ((F.col("frame_idx") - 1) * 64).alias("byte_offset"),
    )
