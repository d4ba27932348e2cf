"""Multimodal binary-column plumbing: payload construction, Arrow-batched
feature extraction, and the explicitly-stubbed codec boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF)
    types = dict(m.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<n_bytes:")
    assert m.filter(F.col("media_type").isNull()).count() == 0


def test_magic_prefix_consistent(spark):
    m = mm.media_table(spark, SF)
    bad = m.filter(
        F.lower(F.hex(F.substring("payload", 1, 4)))
        != F.element_at(
            F.create_map(*[F.lit(x) for kv in mm._MAGIC.items() for x in kv]),
            F.col("media_type"),
        )
    )
    assert bad.count() == 0


def test_decode_features_deterministic(spark):
    a = mm.mm_decode_features(spark, SF).collect()
    b = mm.mm_decode_features(spark, SF).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    by_id = {r.doc_id: r for r in a}
    assert all(0.0 <= r.mean_byte <= 255.0 for r in a)
    # frame count tracks payload size: one frame per 64 bytes + 1
    assert all(r.n_frames == r.n_bytes // 64 + 1 for r in a)


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
