"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The pattern a 100 TB training-data pipeline needs: media travels as a
``binary`` column with a typed metadata struct beside it; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
functions over ``mapInPandas`` (one Python process per partition, columnar
interchange, no per-row pickling). The testdata has no true media, so the
payloads are deterministic synthetic bytes derived from ``documents`` —
and the image slot carries a REAL decodable image: a P6 PPM built
JVM-side (header + sha256-derived pixel bytes), so ``decode_image`` is a
real pure-numpy decoder (PPM + 24bpp BMP), capability-probed per payload;
formats with no in-container codec (wav/mp4) keep the explicit
``NotImplementedError`` stub path and degrade to byte-level features.

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
_MEDIA_TYPES = ["image/ppm", "audio/wav", "video/mp4"]

#: Magic prefixes per media type (real file signatures; PPM's is the
#: 2-byte ASCII "P6").
_MAGIC = {"image/ppm": "5036", "audio/wav": "52494646", "video/mp4": "66747970"}

#: PPM dimensions derived from doc_id — single-digit by construction so
#: the header length is a fixed 11 bytes and oracles stay simple.
_PPM_W = "doc_id % 8 + 2"  # 2..9
_PPM_H = "doc_id % 5 + 2"  # 2..6


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` → (doc_id, media_type, payload BINARY, meta STRUCT).

    Image rows (doc_id % 3 == 0) carry a REAL P6 PPM: ``P6\\n{w} {h}\\n255\\n``
    header + 3·w·h pixel bytes cut from repeated ``sha256(doc_id)`` — built
    entirely with JVM expressions (format_string / repeat / sha2 / unhex),
    deterministic, so oracles and tests can rebuild it byte-for-byte.
    Audio/video rows stay magic + text bytes (no in-container codec to
    decode them anyway); meta carries the typed per-media fields every
    real pipeline tracks.
    """
    return media_frame(load_table(spark, sf_dir, "documents"))


def media_frame(doc: DataFrame) -> DataFrame:
    """The media synth as a frame-level transform (pure per-row
    expressions), so the streaming ingest twin applies the identical
    payload construction to a documents STREAM per micro-batch."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    magic = F.element_at(
        F.create_map(*[F.lit(x) for kv in _MAGIC.items() for x in kv]), mt
    )
    w = F.expr(_PPM_W)
    h = F.expr(_PPM_H)
    header = F.format_string("P6\n%d %d\n255\n", w, h)
    # 3·w·h pixel bytes = 6·w·h hex chars; sha256 hex is 64 chars, w·h ≤ 54
    # → repeat 6× (384 chars) always suffices
    pixels = F.unhex(
        F.substring(
            F.repeat(F.sha2(F.col("doc_id").cast("string"), 256), 6),
            1,
            (F.lit(6) * w * h).cast("int"),
        )
    )
    payload = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.encode(header, "UTF-8"), pixels)
    ).otherwise(F.concat(F.unhex(magic), F.encode("text", "UTF-8")))
    return doc.select(
        "doc_id",
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.when(F.col("doc_id") % 3 == 0, w.cast("int")).alias("width"),
            F.when(F.col("doc_id") % 3 == 0, h.cast("int")).alias("height"),
        ).alias("meta"),
    )


#: DuckDB twin of the payload byte length: PPM rows are an 11-byte header
#: (single-digit w/h by construction) + 3·w·h pixels; others are 4 magic
#: bytes + the utf-8 text.
_ORACLE_N_BYTES = """
    CASE WHEN doc_id % 3 = 0
         THEN octet_length(encode('P6' || chr(10)
              || CAST(doc_id % 8 + 2 AS VARCHAR) || ' '
              || CAST(doc_id % 5 + 2 AS VARCHAR) || chr(10) || '255'
              || chr(10))) + 3 * (doc_id % 8 + 2) * (doc_id % 5 + 2)
         ELSE 4 + octet_length(encode(text)) END
"""


@query(
    "mm_metadata_extract",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/ppm' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           {_ORACLE_N_BYTES} AS n_bytes,
           CASE doc_id % 3
                WHEN 0 THEN lower(hex('P6' || chr(10)
                                      || CAST(doc_id % 8 + 2 AS VARCHAR)))
                WHEN 1 THEN '52494646'
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
    oracle=f"""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image/ppm' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n,
           CAST(SUM({_ORACLE_N_BYTES}) AS BIGINT) AS total_bytes,
           MAX({_ORACLE_N_BYTES}) AS max_bytes
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
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_image(payload: bytes):
    """Pure-numpy image decode — no external codec needed.

    Supports the two formats a codec-less container can still honestly
    decode: binary PPM (``P6``, maxval ≤ 255, comments allowed) and
    uncompressed 24-bit BMP (``BM``, BI_RGB, top-down or bottom-up).
    Returns an (h, w, 3) uint8 RGB array. Any other signature raises
    ``NotImplementedError`` — the capability-probe boundary the feature
    extractor degrades across (wav/mp4 payloads take this path)."""
    import numpy as np

    if payload[:2] == b"P6":
        pos, vals = 2, []
        while len(vals) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end-of-line
                while payload[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while payload[pos : pos + 1] and not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte separates maxval from raster
        w, h, maxval = vals
        if maxval > 255:
            raise NotImplementedError("16-bit-per-channel PPM not supported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return arr.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        import struct

        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only 24bpp uncompressed BMP supported")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        if bottom_up:
            img = img[::-1]
        return img.copy()
    raise NotImplementedError(
        f"no pure-numpy decoder for signature {payload[:4]!r}"
    )


def _try_decode(payload: bytes):
    """``decode_image`` with malformed payloads QUARANTINED, not fatal: a
    truncated ``P6``/``BM`` raises ValueError (short frombuffer/reshape),
    IndexError (header runs off the end) or struct.error (short BMP
    header) — at 100 TB a single corrupt object must degrade exactly like
    a codec-less format, never kill the job. Returns None when the
    payload can't be decoded for any reason."""
    import struct

    try:
        return decode_image(payload)
    except (NotImplementedError, ValueError, IndexError, struct.error):
        return None


def _trunc6(total: int, n: int) -> float:
    """Integer-exact mean truncated to 6 decimals: ``(total·10⁶) // n / 1e6``.
    Floor division on exact ints on BOTH engines (DuckDB twin:
    ``(sum * 1000000) // n``), then one double division — bit-identical
    results with no round-half ties for the engines to disagree on (the
    harness determinism policy; ROUND() is half-away in DuckDB but
    half-even in numpy/pandas)."""
    return (total * 1_000_000) // n / 1e6


def _feature_batches(it: Iterator) -> Iterator:
    """mapInPandas worker: one pandas frame per Arrow batch. Byte-level
    features are vectorized numpy for every row; decodable payloads
    (PPM/BMP — probed per payload via ``decode_image``) additionally get
    real decoded width/height/mean-pixel; codec-less formats degrade to
    the byte-level columns with ``decoded = False``."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("int32")
        mean_byte = payloads.map(
            lambda b: _trunc6(int(np.frombuffer(b, dtype=np.uint8).sum()), len(b))
        )
        # frame sampling stand-in: one "frame" per 64 payload bytes
        n_frames = (n_bytes // 64 + 1).astype("int32")
        decoded, width, height, mean_pixel = [], [], [], []
        for b in payloads:
            img = _try_decode(bytes(b))
            if img is not None:
                decoded.append(True)
                height.append(img.shape[0])
                width.append(img.shape[1])
                mean_pixel.append(_trunc6(int(img.sum()), img.size))
            else:
                decoded.append(False)
                width.append(None)
                height.append(None)
                mean_pixel.append(None)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "mean_byte": mean_byte,
                "n_frames": n_frames,
                "decoded": decoded,
                "width": pd.array(width, dtype="Int32"),
                "height": pd.array(height, dtype="Int32"),
                "mean_pixel": pd.array(mean_pixel, dtype="float64"),
            }
        )


#: DuckDB reconstruction of the payload as an UPPERCASE hex string —
#: byte-for-byte the Spark payload (test-pinned by the parity sweep): PPM
#: header+sha256 pixels for image rows, magic+utf8(text) otherwise. Byte
#: sums are computed from hex pairs (odd position weighs 16): that is the
#: only pure-SQL way DuckDB can do byte arithmetic over a blob, and it
#: makes the decode kernels fully hash-verifiable with no golden files.
_MM_PAYLOAD_CTES = """
    base AS (
      SELECT doc_id, text,
             doc_id % 8 + 2 AS w, doc_id % 5 + 2 AS h,
             doc_id % 3 AS m
      FROM documents
    ), payload AS (
      SELECT doc_id, m, w, h,
             CASE
               WHEN m = 0 THEN
                 upper(hex(encode('P6' || chr(10) || CAST(w AS VARCHAR) || ' '
                       || CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))))
                 || upper(substr(repeat(sha256(CAST(doc_id AS VARCHAR)), 6),
                                 1, CAST(6 * w * h AS INTEGER)))
               WHEN m = 1 THEN '52494646' || upper(hex(encode(text)))
               ELSE '66747970' || upper(hex(encode(text)))
             END AS phex
      FROM base
    ), bytesum AS (
      SELECT p.doc_id,
             CAST(length(p.phex) // 2 AS INTEGER) AS n_bytes,
             CAST(SUM((CASE WHEN g.i % 2 = 1 THEN 16 ELSE 1 END)
                  * (strpos('0123456789ABCDEF',
                            substr(p.phex, CAST(g.i AS INTEGER), 1)) - 1))
                  AS BIGINT) AS bsum
      FROM payload p, UNNEST(generate_series(1, length(p.phex))) AS g(i)
      GROUP BY p.doc_id, p.phex
    )
"""

#: header "P6\n{w} {h}\n255\n" byte sum for single-digit w,h:
#: P(80)+6(54)+\n(10)+digit(48+w)+sp(32)+digit(48+h)+\n(10)+2(50)+5(53)
#: +5(53)+\n(10) = 448+w+h.
_MM_HEADER_SUM = "448 + b.w + b.h"


@query(
    "mm_decode_features",
    oracle=f"""
    WITH {_MM_PAYLOAD_CTES}
    SELECT b.doc_id,
           CASE b.m WHEN 0 THEN 'image/ppm' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           s.n_bytes,
           CAST((s.bsum * 1000000) // s.n_bytes AS DOUBLE) / 1000000.0
             AS mean_byte,
           CAST(s.n_bytes // 64 + 1 AS INTEGER) AS n_frames,
           b.m = 0 AS decoded,
           CASE WHEN b.m = 0 THEN CAST(b.w AS INTEGER) END AS width,
           CASE WHEN b.m = 0 THEN CAST(b.h AS INTEGER) END AS height,
           CASE WHEN b.m = 0 THEN
             CAST(((s.bsum - ({_MM_HEADER_SUM})) * 1000000)
                  // (3 * b.w * b.h) AS DOUBLE) / 1000000.0
           END AS mean_pixel
    FROM base b JOIN bytesum s USING (doc_id)
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over media payloads via Arrow-batched
    ``mapInPandas`` — the decode/resize/frame-sample execution pattern.
    Image rows are REALLY decoded (pure-numpy P6 PPM); wav/mp4 degrade to
    byte-level features across the ``decode_image`` capability probe.
    Hash-verified: the DuckDB oracle rebuilds the payload bytes as hex and
    recomputes every byte/pixel statistic with integer-exact arithmetic
    (``_MM_PAYLOAD_CTES``), so the decode kernel's output is value-checked
    end-to-end, not rows-only."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(_feature_batches, schema=_FEATURE_SCHEMA)


#: thumbnail size for mm_resize_thumbnail
_THUMB_W, _THUMB_H = 4, 4

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        # hex STRING, not binary: the driver's pandas canonicalizer must
        # sort/hash output values, and Spark's Arrow collect can surface
        # binary as bytearray (unhashable) — same portability class as the
        # round-4 array<double> crash. bytes.fromhex() recovers the PPM.
        T.StructField("thumb_hex", T.StringType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def resize_image(img, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (h, w, 3) uint8 array — pure numpy
    index selection (``idx = floor(i · src / out)``), no codec."""
    import numpy as np

    h, w = img.shape[:2]
    rows = np.floor(np.arange(out_h) * h / out_h).astype(int)
    cols = np.floor(np.arange(out_w) * w / out_w).astype(int)
    return img[rows][:, cols]


def encode_ppm(img) -> bytes:
    """Re-encode an (h, w, 3) uint8 array as binary P6 PPM bytes — the
    inverse of ``decode_image``'s PPM path (round-trip test-pinned)."""
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _resize_batches(it: Iterator) -> Iterator:
    import pandas as pd

    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = _try_decode(bytes(payload))
            if img is None:
                continue  # codec-less or corrupt: no pixels to resize
            thumb = resize_image(img, _THUMB_W, _THUMB_H)
            out.append(
                (
                    int(doc_id),
                    img.shape[1],
                    img.shape[0],
                    _THUMB_W,
                    _THUMB_H,
                    encode_ppm(thumb).hex(),
                    _trunc6(int(thumb.sum()), thumb.size),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "width",
                "height",
                "thumb_w",
                "thumb_h",
                "thumb_hex",
                "mean_pixel",
            ],
        )


@query(
    "mm_resize_thumbnail",
    oracle=f"""
    WITH {_MM_PAYLOAD_CTES},
    img AS (
      SELECT p.doc_id, p.w, p.h, substr(p.phex, 23) AS pixhex
      FROM payload p WHERE p.m = 0
    ),
    -- nearest-neighbor grid: thumb pixel (r,c) selects source pixel
    -- (r·h//4, c·w//4); one source pixel = 6 hex chars at 6·idx+1
    thumb AS (
      SELECT i.doc_id, i.w, i.h,
             string_agg(
               substr(i.pixhex,
                      CAST(6 * ((r.r * i.h // 4) * i.w + (c.c * i.w // 4)) + 1
                           AS INTEGER), 6),
               '' ORDER BY r.r, c.c) AS thex
      FROM img i,
           UNNEST(generate_series(0, 3)) AS r(r),
           UNNEST(generate_series(0, 3)) AS c(c)
      GROUP BY i.doc_id, i.w, i.h
    ),
    tsum AS (
      SELECT t.doc_id,
             CAST(SUM((CASE WHEN g.i % 2 = 1 THEN 16 ELSE 1 END)
                  * (strpos('0123456789ABCDEF',
                            substr(t.thex, CAST(g.i AS INTEGER), 1)) - 1))
                  AS BIGINT) AS psum
      FROM thumb t, UNNEST(generate_series(1, 96)) AS g(i)
      GROUP BY t.doc_id
    )
    SELECT t.doc_id,
           CAST(t.w AS INTEGER) AS width, CAST(t.h AS INTEGER) AS height,
           4 AS thumb_w, 4 AS thumb_h,
           lower(hex(encode('P6' || chr(10) || '4 4' || chr(10) || '255'
                            || chr(10))) || t.thex) AS thumb_hex,
           CAST((s.psum * 1000000) // 48 AS DOUBLE) / 1000000.0 AS mean_pixel
    FROM thumb t JOIN tsum s USING (doc_id)
    """,
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, per Arrow batch over
    ``mapInPandas`` — the thumbnailing stage of a media pipeline, running
    the REAL pure-numpy PPM decoder and emitting the re-encoded PPM
    thumbnail as lowercase hex. Narrow plan: scan-side filter to the
    decodable media type, then one Python stage, no shuffle.
    Hash-verified: the oracle replays the nearest-neighbor index math
    (``r·h//4``, ``c·w//4``) over the hex payload and re-derives the
    thumbnail bytes and pixel mean with integer-exact arithmetic."""
    m = media_table(spark, sf_dir)
    return m.filter(F.col("media_type") == "image/ppm").mapInPandas(
        _resize_batches, schema=_RESIZE_SCHEMA
    )


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, {_ORACLE_N_BYTES} AS n_bytes
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


# ----------------------------------------------------------------------
# Audio energy profiling — frame-windowed feature extraction
# ----------------------------------------------------------------------
#: samples (bytes) per audio analysis frame
AUDIO_FRAME = 16

_AUDIO_SCHEMA = (
    "doc_id long, n_frames long, peak_frame long, peak_energy long"
)


def _audio_energy_batches(batches):
    """mapInPandas worker: payload bytes after the 4-byte RIFF magic are
    the sample stream; per-frame energy = Σ byte² over AUDIO_FRAME-wide
    windows (integer-exact — the oracle recomputes the identical sums
    from the source text, so no float tolerance is needed), peak frame
    = argmax with first-wins tie-break."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8)[4:].astype(
                np.int64
            )
            if samples.size == 0:
                # no samples -> no frames -> no row: matches the
                # oracle's generate_series(1, 0) producing zero rows
                # (the empty-doc convention line dedup also uses)
                continue
            starts = np.arange(0, samples.size, AUDIO_FRAME)
            energy = np.add.reduceat(samples * samples, starts)
            peak = int(np.argmax(energy))
            out.append(
                (doc_id, len(starts), peak, int(energy[peak]))
            )
        yield pd.DataFrame(
            out, columns=["doc_id", "n_frames", "peak_frame", "peak_energy"]
        )


@query(
    "mm_audio_energy",
    oracle=f"""
    WITH a AS (
      -- hex(encode(..)) = the raw UTF-8 byte stream, 2 hex digits per
      -- byte: indexing BYTES (like the Spark kernel), not codepoints.
      -- The previous ascii(substr(text,i,1)) form was character-indexed
      -- under a byte-count bound and only coincided on ASCII (ADVICE r6).
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 3 = 1
    ), b AS (
      SELECT doc_id,
             CAST((i - 1) // {AUDIO_FRAME} AS BIGINT) AS frame,
             (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS byte
      FROM a, UNNEST(generate_series(1, length(hx) // 2)) t(i)
    ), fe AS (
      SELECT doc_id, frame, SUM(byte * byte) AS energy
      FROM b GROUP BY doc_id, frame
    ), ranked AS (
      SELECT doc_id, frame, energy,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY energy DESC, frame) AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_frames
      FROM fe
    )
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           frame AS peak_frame, CAST(energy AS BIGINT) AS peak_energy
    FROM ranked WHERE rn = 1
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over the opaque payload: window the
    sample stream into fixed ``AUDIO_FRAME``-byte frames, compute
    per-frame energy (Σ sample² — the RMS numerator, kept integer so
    both engines agree exactly), and report each clip's frame count and
    loudest frame — the silence-trim / highlight-detection primitive.
    The corpus has no true PCM, so the byte stream after the RIFF magic
    plays the sample role (the documents' ASCII text, which is what
    lets the oracle recompute the identical bytes with ``ascii``);
    a real pipeline swaps ONLY the kernel's ``frombuffer`` line for a
    wav decode — schema, batching, and plan shape are the production
    ones. Zero shuffles: one Arrow-batched ``mapInPandas`` pass,
    one row out per clip (the per-frame explode the oracle needs is
    avoided entirely by ``np.add.reduceat`` inside the kernel)."""
    m = media_table(spark, sf_dir)
    return m.filter(F.col("media_type") == "audio/wav").mapInPandas(
        _audio_energy_batches, schema=_AUDIO_SCHEMA
    )


# ----------------------------------------------------------------------
# Audio silence trim (round 11): the segmentation-per-modality set —
# video gets keyframes, audio gets lead/tail silence removal
# ----------------------------------------------------------------------
#: per-frame energy below which a frame is silence. Full ASCII-text
#: frames run ~100k+ (16 bytes × ~90² each); a frame of spaces is
#: 16·32² ≈ 16k and PARTIAL tail frames scale with their byte count —
#: the band places full speech above and pads/partials below, so both
#: trim and keep decisions occur on the synthetic corpus
AUDIO_SILENCE_ENERGY = 60_000

_TRIM_SCHEMA = (
    "doc_id long, n_frames long, first_loud long, last_loud long, "
    "n_kept long"
)


def _audio_trim_batches(batches):
    """mapInPandas worker: same framing + integer energies as
    ``_audio_energy_batches``; the trim keeps [first, last] frames with
    energy ≥ AUDIO_SILENCE_ENERGY (-1/-1/0 when the whole clip is
    silent)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8)[4:].astype(
                np.int64
            )
            if samples.size == 0:
                continue
            starts = np.arange(0, samples.size, AUDIO_FRAME)
            energy = np.add.reduceat(samples * samples, starts)
            loud = np.nonzero(energy >= AUDIO_SILENCE_ENERGY)[0]
            if loud.size:
                first, last = int(loud[0]), int(loud[-1])
                kept = last - first + 1
            else:
                first, last, kept = -1, -1, 0
            out.append((doc_id, len(starts), first, last, kept))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "n_frames", "first_loud", "last_loud", "n_kept",
            ],
        )


@query(
    "mm_audio_silence_trim",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 3 = 1
    ), b AS (
      SELECT doc_id,
             CAST((i - 1) // {AUDIO_FRAME} AS BIGINT) AS frame,
             (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS byte
      FROM a, UNNEST(generate_series(1, length(hx) // 2)) t(i)
    ), fe AS (
      SELECT doc_id, frame, SUM(byte * byte) AS energy
      FROM b GROUP BY doc_id, frame
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COALESCE(MIN(CASE WHEN energy >= {AUDIO_SILENCE_ENERGY}
                                  THEN frame END), -1) AS BIGINT)
             AS first_loud,
           CAST(COALESCE(MAX(CASE WHEN energy >= {AUDIO_SILENCE_ENERGY}
                                  THEN frame END), -1) AS BIGINT)
             AS last_loud,
           CAST(CASE WHEN MIN(CASE WHEN energy >= {AUDIO_SILENCE_ENERGY}
                                   THEN frame END) IS NULL THEN 0
                ELSE MAX(CASE WHEN energy >= {AUDIO_SILENCE_ENERGY}
                              THEN frame END)
                     - MIN(CASE WHEN energy >= {AUDIO_SILENCE_ENERGY}
                                THEN frame END) + 1 END AS BIGINT)
             AS n_kept
    FROM fe GROUP BY doc_id
    """,
)
def mm_audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading/trailing silence trim — the audio counterpart of
    keyframe extraction in the per-modality segmentation set (every
    audio-curation pipeline trims dead air before feature extraction
    or ASR; dead air wastes tokens and skews duration-normalized
    stats): frames below ``AUDIO_SILENCE_ENERGY`` at the clip's edges
    are dropped, and the row reports the kept [first_loud, last_loud]
    frame interval (-1/-1 and n_kept=0 for an all-silent clip —
    the drop decision). Interior silence is KEPT by design (pauses are
    content; edge pads are not) — that asymmetry is what makes this a
    trim, not a filter. Same integer-exact energy arithmetic as
    mm_audio_energy; the oracle recomputes it byte-for-byte from the
    source text. Reference scope: no media ops in the reference;
    multimodal extension tier.

    Scale shape: ZERO shuffles — one Arrow-batched ``mapInPandas``
    pass (np.add.reduceat per clip, never a frame explode), one row
    out per clip. Embarrassingly parallel at any corpus size."""
    m = media_table(spark, sf_dir)
    return m.filter(F.col("media_type") == "audio/wav").mapInPandas(
        _audio_trim_batches, schema=_TRIM_SCHEMA
    )


# ----------------------------------------------------------------------
# Perceptual-hash image dedup (round 8): the multimodal dedup bridge
# ----------------------------------------------------------------------
def _phash_batches(it: Iterator) -> Iterator:
    import numpy as np
    import pandas as pd

    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = _try_decode(bytes(payload))
            if img is None:
                continue
            thumb = resize_image(img, 4, 4).astype(np.int64)
            gray = (thumb[:, :, 0] + thumb[:, :, 1] + thumb[:, :, 2]) // 3
            flat = gray.reshape(-1)  # row-major = (row, col) scan order
            mu = int(flat.sum()) // 16
            bits = 0
            for k in range(16):
                if int(flat[k]) >= mu:
                    bits |= 1 << k
            out.append((int(doc_id), bits))
        yield pd.DataFrame(out, columns=["doc_id", "phash"])


@query(
    "mm_image_phash_dedup",
    oracle=f"""
    WITH {_MM_PAYLOAD_CTES},
    img AS (
      SELECT p.doc_id, p.w, p.h, substr(p.phex, 23) AS pixhex
      FROM payload p WHERE p.m = 0
    ),
    thumb AS (
      SELECT i.doc_id,
             string_agg(
               substr(i.pixhex,
                      CAST(6 * ((r.r * i.h // 4) * i.w + (c.c * i.w // 4)) + 1
                           AS INTEGER), 6),
               '' ORDER BY r.r, c.c) AS thex
      FROM img i,
           UNNEST(generate_series(0, 3)) AS r(r),
           UNNEST(generate_series(0, 3)) AS c(c)
      GROUP BY i.doc_id
    ),
    bytes AS (
      SELECT t.doc_id, k.k,
             16 * (strpos('0123456789ABCDEF',
                          substr(t.thex, CAST(6 * k.k + 2 * b.b + 1
                                              AS INTEGER), 1)) - 1)
             + (strpos('0123456789ABCDEF',
                       substr(t.thex, CAST(6 * k.k + 2 * b.b + 2
                                           AS INTEGER), 1)) - 1) AS byte
      FROM thumb t,
           UNNEST(generate_series(0, 15)) AS k(k),
           UNNEST(generate_series(0, 2)) AS b(b)
    ),
    cells AS (
      SELECT doc_id, k, CAST(SUM(byte) // 3 AS BIGINT) AS gray
      FROM bytes GROUP BY doc_id, k
    ),
    mu AS (
      SELECT doc_id, CAST(SUM(gray) // 16 AS BIGINT) AS mu
      FROM cells GROUP BY doc_id
    ),
    hashes AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN c.gray >= m.mu
                           THEN CAST(1 AS BIGINT) << c.k
                           ELSE 0 END) AS BIGINT) AS phash
      FROM cells c JOIN mu m USING (doc_id)
      GROUP BY c.doc_id
    )
    SELECT phash, COUNT(*) AS n_images, MIN(doc_id) AS keeper_doc_id
    FROM hashes GROUP BY phash
    """,
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — the multimodal rung of the dedup
    ladder: each image is decoded (real pure-numpy PPM), average-pooled
    to a 4×4 grayscale thumbnail via the shared nearest-neighbor
    resize, and hashed by the aHash rule (bit k set iff cell k's
    integer gray ≥ the thumbnail's integer mean gray) into a 16-bit
    perceptual fingerprint; images grouped by fingerprint are
    near-duplicate candidates (re-encodes/resizes of one image land in
    one bucket — byte-hash dedup can't see them). Keeper = lowest
    doc_id per bucket, same policy as x1_exact_dedup.

    Scale shape identical to x1_exact_dedup_hash with the digest
    computed by an Arrow kernel instead of md5: one corpus scan
    through mapInPandas (no shuffle touches pixels), then a 2-byte-key
    hash-groupBy. All arithmetic is INTEGER (floor-div gray, floor-div
    mean, ≥ threshold) so the 16 bits are engine-exact; the oracle
    replays decode → NN-resize → pool → threshold in SQL over the hex
    payload (same replay machinery as mm_resize_thumbnail)."""
    m = media_table(spark, sf_dir)
    hashed = m.filter(F.col("media_type") == "image/ppm").mapInPandas(
        _phash_batches, schema="doc_id long, phash long"
    )
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


#: near-dup threshold on the 16-bit fingerprint: hamming ≤ 1 — with the
#: code split into TWO 8-bit bands, any pair within the threshold must
#: agree exactly on at least one band (pigeonhole), so the band join is
#: a LOSSLESS candidate generator at this radius
_PHASH_HAMMING_MAX = 1

_PHASH_HASHES_CTE = f"""
    img AS (
      SELECT p.doc_id, p.w, p.h, substr(p.phex, 23) AS pixhex
      FROM payload p WHERE p.m = 0
    ),
    thumb AS (
      SELECT i.doc_id,
             string_agg(
               substr(i.pixhex,
                      CAST(6 * ((r.r * i.h // 4) * i.w + (c.c * i.w // 4)) + 1
                           AS INTEGER), 6),
               '' ORDER BY r.r, c.c) AS thex
      FROM img i,
           UNNEST(generate_series(0, 3)) AS r(r),
           UNNEST(generate_series(0, 3)) AS c(c)
      GROUP BY i.doc_id
    ),
    bytes AS (
      SELECT t.doc_id, k.k,
             16 * (strpos('0123456789ABCDEF',
                          substr(t.thex, CAST(6 * k.k + 2 * b.b + 1
                                              AS INTEGER), 1)) - 1)
             + (strpos('0123456789ABCDEF',
                       substr(t.thex, CAST(6 * k.k + 2 * b.b + 2
                                           AS INTEGER), 1)) - 1) AS byte
      FROM thumb t,
           UNNEST(generate_series(0, 15)) AS k(k),
           UNNEST(generate_series(0, 2)) AS b(b)
    ),
    cells AS (
      SELECT doc_id, k, CAST(SUM(byte) // 3 AS BIGINT) AS gray
      FROM bytes GROUP BY doc_id, k
    ),
    mu AS (
      SELECT doc_id, CAST(SUM(gray) // 16 AS BIGINT) AS mu
      FROM cells GROUP BY doc_id
    ),
    hashes AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN c.gray >= m.mu
                           THEN CAST(1 AS BIGINT) << c.k
                           ELSE 0 END) AS BIGINT) AS phash
      FROM cells c JOIN mu m USING (doc_id)
      GROUP BY c.doc_id
    )
"""


@query(
    "mm_image_phash_neardup",
    oracle=f"""
    WITH {{payload_ctes}},
    {_PHASH_HASHES_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_HAMMING_MAX}
    """.format(payload_ctes=_MM_PAYLOAD_CTES),
)
def mm_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs by fingerprint Hamming distance —
    multi-index hashing over the aHash codes: the 16-bit fingerprint
    splits into two 8-bit bands, and by pigeonhole any pair within
    Hamming ≤ 1 agrees EXACTLY on at least one band, so candidates
    come from two band-keyed equi-joins (the LSH-for-Hamming trick —
    lossless at this radius, never a pairwise scan) and are verified
    with one xor+bit_count. Catches small re-encode/brightness
    perturbations that flip a single fingerprint bit, which the exact
    phash groupBy splits apart.

    Scale shape: fingerprints from the same one-scan Arrow kernel as
    ``mm_image_phash_dedup``; each band join is an equi-join on a
    1-byte key (bounded fan-out per bucket at 2⁸ buckets — at larger
    code widths use 64-bit codes with 4×16-bit bands, same plan);
    dedup of pairs caught by both bands is a distinct on the pair key.
    The oracle verifies the full pipeline with an all-pairs join —
    affordable only Duck-side at oracle scale, which is the point of
    the banding."""
    import pandas as pd  # noqa: F401

    m = media_table(spark, sf_dir)
    hashed = (
        m.filter(F.col("media_type") == "image/ppm")
        .mapInPandas(_phash_batches, schema="doc_id long, phash long")
        .localCheckpoint(eager=True)
    )
    # kernel output consumed by BOTH band joins (2 sides × 2 bands):
    # materialized once so the decode never re-runs
    return band_neardup_pairs(hashed)


def _with_bands(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "band_lo", (F.col("phash") % 256).cast("int")
    ).withColumn("band_hi", F.expr("CAST(phash DIV 256 AS INT)"))


def band_neardup_pairs(hashed: DataFrame) -> DataFrame:
    """Per-doc banded Hamming join over (doc_id, phash) rows — the
    mm_image_phash_neardup candidate generator, exposed for the skew
    A/B (tools/phash_skew_ab.py). Posting-list caveat: a bucket of
    identical fingerprints (one viral thumbnail on 5% of pages)
    produces |bucket|² candidate rows — under duplicate-heavy media
    use ``band_neardup_codes`` instead, which collapses to distinct
    codes first."""
    hashed = _with_bands(hashed)
    pairs = None
    for band in ("band_lo", "band_hi"):
        a = hashed.select(
            F.col("doc_id").alias("doc_a"),
            F.col("phash").alias("ph_a"),
            F.col(band).alias("_b"),
        )
        b = hashed.select(
            F.col("doc_id").alias("doc_b"),
            F.col("phash").alias("ph_b"),
            F.col(band).alias("_b"),
        )
        cand = a.join(b, "_b").filter(F.col("doc_a") < F.col("doc_b"))
        pairs = cand if pairs is None else pairs.unionByName(cand)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    return (
        pairs.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_HAMMING_MAX)
        .distinct()
    )


def band_neardup_codes(codes: DataFrame) -> DataFrame:
    """Distinct-CODE banded Hamming join over (phash, n_images) rows —
    the duplicate-heavy mitigation: band-bucket size is bounded by the
    number of DISTINCT codes per band (≤ 2^band_bits), independent of
    how many images share a code, so a viral thumbnail that puts 5% of
    the corpus on ONE fingerprint adds one row to the join instead of
    squaring a posting list. Cross-cluster pair volume is carried as
    the COUNT ``n_pairs = n_a·n_b`` (within-cluster as C(n,2)) — the
    answer a pipeline actually consumes; materializing cluster² doc
    pairs is the part that can't scale, in the output itself."""
    banded = _with_bands(codes)
    pairs = None
    for band in ("band_lo", "band_hi"):
        a = banded.select(
            F.col("phash").alias("ph_a"),
            F.col("n_images").alias("n_a"),
            F.col(band).alias("_b"),
        )
        b = banded.select(
            F.col("phash").alias("ph_b"),
            F.col("n_images").alias("n_b"),
            F.col(band).alias("_b"),
        )
        cand = a.join(b, "_b").filter(F.col("ph_a") < F.col("ph_b"))
        pairs = cand if pairs is None else pairs.unionByName(cand)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    cross = (
        pairs.select(
            "ph_a",
            "ph_b",
            ham.alias("hamming"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"),
        )
        .filter(F.col("hamming") <= _PHASH_HAMMING_MAX)
        .distinct()
    )
    within = codes.filter(F.col("n_images") >= 2).select(
        F.col("phash").alias("ph_a"),
        F.col("phash").alias("ph_b"),
        F.lit(0).cast("long").alias("hamming"),
        # integral DIV, not double /: exact at any multiplicity (the
        # rung's motivating case is 1e8-1e9 copies of one viral code,
        # past double's 2^53 mantissa)
        F.expr("n_images * (n_images - 1) div 2").cast("long").alias("n_pairs"),
    )
    return cross.unionByName(within)


@query(
    "mm_phash_neardup_codes",
    oracle=f"""
    WITH {{payload_ctes}},
    {_PHASH_HASHES_CTE},
    codes AS (
      SELECT phash, COUNT(*) AS n FROM hashes GROUP BY phash
    )
    SELECT ph_a, ph_b, hamming, n_pairs FROM (
      SELECT a.phash AS ph_a, b.phash AS ph_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
             CAST(a.n * b.n AS BIGINT) AS n_pairs
      FROM codes a JOIN codes b ON a.phash < b.phash
      WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_HAMMING_MAX}
      UNION ALL
      SELECT phash, phash, CAST(0 AS BIGINT),
             CAST(n * (n - 1) // 2 AS BIGINT)
      FROM codes WHERE n >= 2
    )
    """.format(payload_ctes=_MM_PAYLOAD_CTES),
)
def mm_phash_neardup_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-heavy-safe twin of ``mm_image_phash_neardup``: exact
    dedup FIRST (fingerprint groupBy — the mm_image_phash_dedup step),
    THEN the banded Hamming join over DISTINCT codes, emitting
    (code_a, code_b, hamming, n_pairs) cluster-level near-dup volume
    instead of materialized doc pairs. This is the ladder's scale path
    for media: the per-doc band join squares the posting list of any
    viral image (one shared thumbnail on 5% of a 10⁹-image corpus is a
    2.5×10¹⁵-pair bucket — unrunnable AND unstoreable), while the
    distinct-code join is bounded by the code space per band and the
    pair VOLUME survives as counts. Measured under a duplicate-heavy
    replica in tools/phash_skew_ab.py (BENCH_SCALE.json skew section).

    Scale shape: one Arrow decode pass (shared kernel), one 2-byte-key
    groupBy (the dedup), two band equi-joins over ≤|distinct codes|
    rows, a distinct on code pairs, a count-only union. Nothing in the
    plan is proportional to duplicate multiplicity except the one
    groupBy that collapses it."""
    import pandas as pd  # noqa: F401

    m = media_table(spark, sf_dir)
    codes = (
        m.filter(F.col("media_type") == "image/ppm")
        .mapInPandas(_phash_batches, schema="doc_id long, phash long")
        .groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .localCheckpoint(eager=True)
    )
    return band_neardup_codes(codes)


# ----------------------------------------------------------------------
# Image-text pair filtering (round 10, VERDICT r9 ask #6): CLIP-score-
# shaped curation — cosine between the two embeddings of a pair plus a
# keep-band, completing the multimodal curation story next to phash
# dedup
# ----------------------------------------------------------------------
#: keep-band: pairs below are mismatched captions (CLIP-score floor a
#: LAION-style pipeline applies), pairs above are exact/near-exact
#: duplicates of the image embedding (alt-text == OCR of the image)
MM_PAIR_COS_MIN = 0.28
MM_PAIR_COS_MAX = 0.995

#: deterministic synthetic text-side embedding (embeddings carries one
#: vector per id, so — mm payload discipline — both engines derive the
#: SAME paired vector: a vec_id-keyed blend of the image embedding
#: with its reversal, alpha = (vec_id % 10)/10, giving the full
#: spectrum from unrelated (alpha 0 → reversed) to identical (alpha
#: .9 → nearly the image vector). Element-wise a*x + b*y only — one
#: IEEE-exact evaluation shape shared by both engines, no folds.)


from .similarity import _DUCK_COS as _PAIR_DUCK_COS

_PAIR_COS_SQL = _PAIR_DUCK_COS.format(a="e", b="te")


@query(
    "mm_pair_cosine_filter",
    oracle=f"""
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(vec_id % 10 AS DOUBLE) / 10 AS alpha
      FROM embeddings
    ), p AS (
      SELECT vec_id,
             {_PAIR_COS_SQL} AS cos
      FROM (
        SELECT vec_id, e,
               list_transform(range(1, len(e) + 1),
                 i -> alpha * e[CAST(i AS INTEGER)]
                      + (1 - alpha)
                        * e[CAST(len(e) - i + 1 AS INTEGER)]) AS te
        FROM t)
    )
    SELECT vec_id, ROUND(cos, 6) AS pair_cos
    FROM p
    WHERE ROUND(cos, 6) BETWEEN {MM_PAIR_COS_MIN} AND {MM_PAIR_COS_MAX}
    """,
)
def mm_pair_cosine_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-shaped image-text pair filtering: cosine similarity
    between the paired (image, text) embeddings of each sample, kept
    iff inside [{MM_PAIR_COS_MIN}, {MM_PAIR_COS_MAX}] — the
    LAION/DataComp curation gate (floor drops mismatched captions,
    ceiling drops text-equals-image degenerates). Reference scope: no
    analog; multimodal extension tier.

    Scale shape: ZERO exchanges (plan-gated) — per-row zip_with/
    aggregate dot products and an elementwise blend, all JVM
    higher-order functions inside whole-stage codegen; the filter
    prunes at the scan boundary. At 100 TB this is one
    embarrassingly-parallel pass over the pair table; the oracle
    replays the identical sequential-fold cosine in SQL (same
    discipline as the phash oracles)."""
    from .similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        (F.expr("CAST(vec_id % 10 AS DOUBLE)") / 10).alias("alpha"),
    ).withColumn(
        "te",
        F.expr(
            "transform(sequence(1, size(e)),"
            " i -> alpha * e[i - 1] + (1 - alpha) * e[size(e) - i])"
        ),
    )
    pair_cos = F.round(cosine(F.col("e"), F.col("te")), 6)
    return (
        d.select("vec_id", pair_cos.alias("pair_cos"))
        .filter(
            F.col("pair_cos").between(MM_PAIR_COS_MIN, MM_PAIR_COS_MAX)
        )
    )


# ----------------------------------------------------------------------
# Scene-cut detection (round 10): the video-curation segmentation
# primitive — frame-diff energy over the opaque payload
# ----------------------------------------------------------------------
#: bytes per analysis frame (the "pixels" of one synthetic frame)
SCENE_FRAME = 16
#: L1 inter-frame difference above which a frame starts a new scene
#: (payload bytes are ASCII text here, per-position |Δ| ~30 → frame
#: diffs center a few hundred; 600 splits the distribution so both
#: cut and non-cut transitions occur)
SCENE_THRESH = 600

_SCENE_SCHEMA = (
    "doc_id long, n_frames long, n_cuts long, max_diff long, "
    "first_cut_frame long"
)


def _scene_cut_batches(it: Iterator) -> Iterator:
    """mapInPandas worker: payload bytes after the 4-byte ftyp magic,
    windowed into complete ``SCENE_FRAME``-byte frames; inter-frame L1
    difference (Σ|b_j − b_{j−1}| over aligned positions, integer-exact)
    marks a cut where it exceeds ``SCENE_THRESH``. Docs with zero
    complete frames emit no row (the oracle's generate_series(1,0)
    convention shared with mm_audio_energy)."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)[4:]
            nf = arr.size // SCENE_FRAME
            if nf == 0:
                continue
            fr = (
                arr[: nf * SCENE_FRAME]
                .reshape(nf, SCENE_FRAME)
                .astype(np.int64)
            )
            if nf > 1:
                d = np.abs(np.diff(fr, axis=0)).sum(axis=1)
                cuts = d > SCENE_THRESH
                n_cuts = int(cuts.sum())
                max_diff = int(d.max())
                first = int(np.argmax(cuts)) + 1 if n_cuts else -1
            else:
                n_cuts, max_diff, first = 0, 0, -1
            out.append((int(doc_id), nf, n_cuts, max_diff, first))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "n_frames",
                "n_cuts",
                "max_diff",
                "first_cut_frame",
            ],
        )


_SCENE_ORACLE = f"""
    WITH v AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 3 = 2
    ), b AS (
      SELECT doc_id,
             CAST((i - 1) // {SCENE_FRAME} AS BIGINT) AS frame,
             CAST((i - 1) % {SCENE_FRAME} AS BIGINT) AS pos,
             (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS byte
      FROM v, UNNEST(generate_series(
        1, (length(hx) // 2 // {SCENE_FRAME}) * {SCENE_FRAME})) t(i)
    ), nf AS (
      SELECT doc_id, CAST(COUNT(DISTINCT frame) AS BIGINT) AS n_frames
      FROM b GROUP BY doc_id
    ), d AS (
      SELECT b2.doc_id, b2.frame, SUM(ABS(b2.byte - b1.byte)) AS diff
      FROM b b2 JOIN b b1
        ON b1.doc_id = b2.doc_id AND b1.frame = b2.frame - 1
       AND b1.pos = b2.pos
      GROUP BY b2.doc_id, b2.frame
    ), agg AS (
      SELECT doc_id,
             SUM(CASE WHEN diff > {SCENE_THRESH} THEN 1 ELSE 0 END)
               AS n_cuts,
             MAX(diff) AS max_diff,
             MIN(CASE WHEN diff > {SCENE_THRESH} THEN frame END)
               AS first_cut
      FROM d GROUP BY doc_id
    )
    SELECT nf.doc_id, nf.n_frames,
           CAST(COALESCE(agg.n_cuts, 0) AS BIGINT) AS n_cuts,
           CAST(COALESCE(agg.max_diff, 0) AS BIGINT) AS max_diff,
           CAST(COALESCE(agg.first_cut, -1) AS BIGINT) AS first_cut_frame
    FROM nf LEFT JOIN agg ON nf.doc_id = agg.doc_id
    """


@query("mm_scene_cuts", oracle=_SCENE_ORACLE)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the opaque video payload — the
    segmentation primitive of every video-curation pipeline (shot
    boundaries gate frame sampling, caption alignment, and clip-level
    dedup): window the byte stream after the ftyp magic into complete
    ``SCENE_FRAME``-byte frames, compute consecutive-frame L1
    difference (integer-exact), and report per clip the frame count,
    cuts above ``SCENE_THRESH``, the sharpest transition, and the first
    cut's frame index (−1 when none). The corpus has no true video, so
    payload bytes play the frame role — a real pipeline swaps ONLY the
    kernel's ``frombuffer`` line for a codec's luma planes (schema,
    batching, Arrow transfer, and plan shape are the production ones;
    same stub discipline as mm_audio_energy). The oracle recomputes
    the identical byte arithmetic from the source text via
    hex(encode(...)). Reference scope: no media ops in the reference;
    multimodal extension tier.

    Scale shape: ZERO shuffles — one Arrow-batched mapInPandas pass,
    the frame explode the oracle needs never materializes (np.diff
    over the reshaped window matrix inside the kernel), one row out
    per clip. Embarrassingly parallel at any corpus size."""
    m = media_table(spark, sf_dir)
    return m.filter(F.col("media_type") == "video/mp4").mapInPandas(
        _scene_cut_batches, schema=_SCENE_SCHEMA
    )


# ----------------------------------------------------------------------
# Keyframe extraction (round 11): scenes → representative frames, the
# step between shot segmentation and caption/embedding models
# ----------------------------------------------------------------------
_KEYFRAME_SCHEMA = (
    "doc_id long, scene_idx long, start_frame long, scene_len long, "
    "keyframe_hex string"
)


def _keyframe_batches(it: Iterator) -> Iterator:
    """mapInPandas worker: same framing as ``_scene_cut_batches``; a
    scene starts at frame 0 and after every cut, the keyframe is the
    scene's FIRST frame, emitted as its byte-exact hex (16 bytes → 32
    uppercase hex chars, matching DuckDB's hex())."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)[4:]
            nf = arr.size // SCENE_FRAME
            if nf == 0:
                continue
            fr = (
                arr[: nf * SCENE_FRAME]
                .reshape(nf, SCENE_FRAME)
                .astype(np.int64)
            )
            starts = [0]
            if nf > 1:
                d = np.abs(np.diff(fr, axis=0)).sum(axis=1)
                starts += [int(i) + 1 for i in np.nonzero(d > SCENE_THRESH)[0]]
            for si, st in enumerate(starts):
                end = starts[si + 1] if si + 1 < len(starts) else nf
                kb = arr[st * SCENE_FRAME : (st + 1) * SCENE_FRAME]
                rows.append(
                    (
                        int(doc_id),
                        si,
                        st,
                        end - st,
                        kb.tobytes().hex().upper(),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "scene_idx",
                "start_frame",
                "scene_len",
                "keyframe_hex",
            ],
        )


_KEYFRAME_ORACLE = f"""
    WITH v AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents WHERE doc_id % 3 = 2
    ), nf AS (
      SELECT doc_id,
             CAST(length(hx) // 2 // {SCENE_FRAME} AS BIGINT) AS n_frames
      FROM v
    ), b AS (
      SELECT doc_id,
             CAST((i - 1) // {SCENE_FRAME} AS BIGINT) AS frame,
             CAST((i - 1) % {SCENE_FRAME} AS BIGINT) AS pos,
             (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS byte
      FROM v, UNNEST(generate_series(
        1, (length(hx) // 2 // {SCENE_FRAME}) * {SCENE_FRAME})) t(i)
    ), d AS (
      SELECT b2.doc_id, b2.frame, SUM(ABS(b2.byte - b1.byte)) AS diff
      FROM b b2 JOIN b b1
        ON b1.doc_id = b2.doc_id AND b1.frame = b2.frame - 1
       AND b1.pos = b2.pos
      GROUP BY b2.doc_id, b2.frame
    ), starts AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS start_frame
      FROM nf WHERE n_frames >= 1
      UNION ALL
      SELECT doc_id, frame FROM d WHERE diff > {SCENE_THRESH}
    ), ordered AS (
      SELECT doc_id, start_frame,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY start_frame) - 1 AS scene_idx,
             LEAD(start_frame) OVER (
               PARTITION BY doc_id ORDER BY start_frame) AS nxt
      FROM starts
    )
    SELECT o.doc_id,
           CAST(o.scene_idx AS BIGINT) AS scene_idx,
           o.start_frame,
           CAST(COALESCE(o.nxt, nf.n_frames) - o.start_frame AS BIGINT)
             AS scene_len,
           substr(v.hx, CAST(o.start_frame * {2 * SCENE_FRAME} + 1
                             AS BIGINT), {2 * SCENE_FRAME}) AS keyframe_hex
    FROM ordered o
    JOIN nf ON nf.doc_id = o.doc_id
    JOIN v ON v.doc_id = o.doc_id
    """


@query("mm_keyframe_extract", oracle=_KEYFRAME_ORACLE)
def mm_keyframe_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe extraction — the step between shot segmentation and
    every per-scene model (captioning, CLIP embedding, clip-level
    dedup all consume ONE representative frame per scene, not the
    stream): scenes are the segments ``mm_scene_cuts`` bounds (a new
    scene at frame 0 and after every cut), the keyframe is each
    scene's first frame, and the row carries (scene_idx, start_frame,
    scene_len, keyframe bytes as hex) — the byte-exact fingerprint
    makes the row a value check of exactly WHICH frame was selected,
    not just how many (the mm_scene_cuts hex-oracle discipline; the
    oracle re-derives frame bytes from the source text and slices the
    same 32 hex chars). A real pipeline swaps the ``frombuffer`` line
    for codec luma planes and emits the frame tensor next to the hex.
    Reference scope: no media ops in the reference; multimodal
    extension tier.

    Scale shape: ZERO shuffles — the same single Arrow-batched
    ``mapInPandas`` pass as the cut detector (scene segmentation and
    keyframe slicing share one reshape), a few rows out per clip.
    Embarrassingly parallel at any corpus size; the oracle's window
    over start frames never exists in the Spark plan."""
    m = media_table(spark, sf_dir)
    return m.filter(F.col("media_type") == "video/mp4").mapInPandas(
        _keyframe_batches, schema=_KEYFRAME_SCHEMA
    )
