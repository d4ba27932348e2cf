"""Multimodal binary-column plumbing: payload construction, Arrow-batched
feature extraction, and the real pure-numpy decode kernel (PPM/BMP) with
its capability-probe degradation for codec-less formats."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def _ref_ppm(doc_id: int) -> bytes:
    """Pure-Python reference of media_table's image payload."""
    w, h = doc_id % 8 + 2, doc_id % 5 + 2
    hexpix = (hashlib.sha256(str(doc_id).encode()).hexdigest() * 6)[: 6 * w * h]
    return f"P6\n{w} {h}\n255\n".encode() + bytes.fromhex(hexpix)


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF)
    types = dict(m.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<n_bytes:")
    assert m.filter(F.col("media_type").isNull()).count() == 0


def test_magic_prefix_consistent(spark):
    m = mm.media_table(spark, SF)
    for mt, magic in mm._MAGIC.items():
        nb = len(magic) // 2
        bad = m.filter(F.col("media_type") == mt).filter(
            F.lower(F.hex(F.substring("payload", 1, nb))) != magic
        )
        assert bad.count() == 0, mt


def test_image_payload_matches_reference(spark):
    """The JVM-built PPM payload is byte-identical to the pure-Python
    reference construction — decodability is not an accident of one row."""
    m = mm.media_table(spark, SF)
    rows = (
        m.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "payload")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        assert bytes(r.payload) == _ref_ppm(r.doc_id), r.doc_id


def test_decode_ppm_round_trip():
    img = mm.decode_image(_ref_ppm(12))
    w, h = 12 % 8 + 2, 12 % 5 + 2
    assert img.shape == (h, w, 3)
    hexpix = (hashlib.sha256(b"12").hexdigest() * 6)[: 6 * w * h]
    assert img.tobytes() == bytes.fromhex(hexpix)


def test_decode_ppm_comments_and_whitespace():
    raw = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n 2  2 \n255\n" + raw
    img = mm.decode_image(payload)
    assert img.shape == (2, 2, 3)
    assert img.tobytes() == raw


def test_decode_bmp_24bpp():
    """Hand-built 2x2 bottom-up 24bpp BMP: rows pad to 4 bytes, pixels
    are BGR on disk, row order is bottom-up → decoder must undo both."""
    # RGB image: [[red, green], [blue, white]]
    top = [(255, 0, 0), (0, 255, 0)]
    bot = [(0, 0, 255), (255, 255, 255)]
    stride = (2 * 3 + 3) & ~3  # 8
    raster = b""
    for row in (bot, top):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        raster += line + b"\x00" * (stride - len(line))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    img = mm.decode_image(header + raster)
    assert img.shape == (2, 2, 3)
    assert [tuple(px) for px in img[0]] == top
    assert [tuple(px) for px in img[1]] == bot


def test_decode_features_real_for_images(spark):
    feats = mm.mm_decode_features(spark, SF).collect()
    by_id = {r.doc_id: r for r in feats}
    assert all(0.0 <= r.mean_byte <= 255.0 for r in feats)
    assert all(r.n_frames == r.n_bytes // 64 + 1 for r in feats)
    img_rows = [r for r in feats if r.media_type == "image/ppm"]
    other = [r for r in feats if r.media_type != "image/ppm"]
    assert img_rows and other
    # every image row decoded for real, with dimensions matching doc_id
    for r in img_rows:
        assert r.decoded
        assert (r.width, r.height) == (r.doc_id % 8 + 2, r.doc_id % 5 + 2)
        ref = mm.decode_image(_ref_ppm(r.doc_id))
        assert r.mean_pixel == pytest.approx(float(ref.mean()), abs=1e-6)
    # codec-less formats degrade, not crash
    assert all(not r.decoded and r.width is None for r in other)
    # determinism
    again = {r.doc_id: r for r in mm.mm_decode_features(spark, SF).collect()}
    assert {k: str(v) for k, v in by_id.items()} == {
        k: str(v) for k, v in again.items()
    }


def test_resize_thumbnail_round_trip(spark):
    rows = mm.mm_resize_thumbnail(spark, SF).collect()
    assert rows
    for r in rows[:20]:
        assert (r.thumb_w, r.thumb_h) == (mm._THUMB_W, mm._THUMB_H)
        # thumb_hex is a REAL re-encoded PPM (as hex — the driver's
        # canonicalizer can't hash raw binary): decodes back to the exact
        # nearest-neighbor selection of the source image
        thumb = mm.decode_image(bytes.fromhex(r.thumb_hex))
        assert thumb.shape == (mm._THUMB_H, mm._THUMB_W, 3)
        src = mm.decode_image(_ref_ppm(r.doc_id))
        ref = mm.resize_image(src, mm._THUMB_W, mm._THUMB_H)
        assert thumb.tobytes() == ref.tobytes()
        assert r.mean_pixel == pytest.approx(float(ref.mean()), abs=1e-6)
    # only decodable (image) rows appear
    assert all(r.doc_id % 3 == 0 for r in rows)


def test_resize_is_nearest_neighbor():
    import numpy as np

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = mm.resize_image(img, 2, 3)
    assert out.shape == (3, 2, 3)
    # rows 0,2,4 and cols 0,2 selected: floor(i*src/out)
    assert (out == img[[0, 2, 4]][:, [0, 2]]).all()


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_corrupt_payloads_quarantine_not_crash(spark):
    """A truncated PPM / garbage BMP must degrade like a codec-less
    format (decoded=False, byte features intact), never kill the job —
    the 100 TB posture for a single corrupt object (ADVICE r4 #2)."""
    trunc_ppm = _ref_ppm(12)[:20]  # header promises 6x4, raster cut short
    short_bmp = b"BM\x01\x02"  # header runs off the end
    header_only = b"P6\n"  # dies while parsing dimensions
    df = spark.createDataFrame(
        [
            (1, "image/ppm", bytearray(trunc_ppm)),
            (2, "image/ppm", bytearray(short_bmp)),
            (3, "image/ppm", bytearray(header_only)),
        ],
        schema="doc_id long, media_type string, payload binary",
    )
    feats = df.mapInPandas(mm._feature_batches, schema=mm._FEATURE_SCHEMA).collect()
    assert len(feats) == 3
    assert all(not r.decoded and r.width is None for r in feats)
    assert all(r.mean_byte is not None and r.n_bytes > 0 for r in feats)
    thumbs = df.mapInPandas(mm._resize_batches, schema=mm._RESIZE_SCHEMA).collect()
    assert thumbs == []  # quarantined rows simply drop out of the resize
    # the good payload still decodes alongside corrupt neighbors
    mixed = df.unionAll(
        spark.createDataFrame(
            [(12, "image/ppm", bytearray(_ref_ppm(12)))], schema=df.schema
        )
    )
    ok = mixed.mapInPandas(mm._feature_batches, schema=mm._FEATURE_SCHEMA).collect()
    assert [r.doc_id for r in ok if r.decoded] == [12]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_ppm_encode_decode_round_trip(w, h, seed):
        """decode(encode(img)) == img for arbitrary small RGB arrays —
        the PPM codec pair is lossless by construction."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = mm.decode_image(mm.encode_ppm(img))
        assert out.shape == img.shape
        assert (out == img).all()

except ImportError:  # pragma: no cover - hypothesis ships in this env
    pass
