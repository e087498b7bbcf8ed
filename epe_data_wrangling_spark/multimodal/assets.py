"""Multimodal asset framing (north-star extension; the reference is
tabular-only).

Media are carried as opaque ``binary`` payload columns with typed
metadata beside them — the columnar-storage posture for images/audio/
video at 100 TB: parquet stores the bytes (or at larger blob sizes, a
URI into object storage), Spark plans never interpret them except
inside explicitly-chosen Arrow-batched decode operators
(``multimodal.decode``).

The driver's corpus has no real media, so ``as_assets`` frames the
``documents`` table as a synthetic asset table: payload = UTF-8 bytes
of the text, media_type round-robined by doc_id. Everything
downstream (schemas, mapInPandas plumbing, partitioning) is exactly
what real media would use; only the payload provenance is synthetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


def as_assets(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, …) → assets(asset_id, media_type,
    payload binary, n_bytes)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


# ---- real uncompressed-container fixtures (BMP / WAV) ----------------
#
# Deterministic pixel/sample formulas, so a DuckDB oracle can compute
# the decoded statistics in closed form over generate_series — the
# decode operators in multimodal.decode parse these REAL containers
# (struct / stdlib wave), no codec library involved.

import struct as _struct

BMP_W, BMP_H = 16, 12
WAV_RATE, WAV_N = 8000, 256


def bmp_pixel(x: int, y: int, asset_id: int) -> tuple[int, int, int]:
    """(r, g, b) of pixel (x, y) — the generation formula the oracle
    mirrors."""
    return (
        (x * 11 + y * 2 + 3 * asset_id) % 256,
        (x * 3 + y * 5 + 2 * asset_id) % 256,
        (x * 7 + y * 13 + asset_id) % 256,
    )


def make_bmp(asset_id: int, w: int = BMP_W, h: int = BMP_H) -> bytes:
    """A real 24-bit uncompressed BITMAPINFOHEADER BMP (bottom-up rows,
    4-byte row padding) with formula pixels."""
    row_stride = (w * 3 + 3) // 4 * 4
    img_size = row_stride * h
    header = b"BM" + _struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y_file in range(h):  # bottom-up: file row 0 = image row h-1
        y = h - 1 - y_file
        row = bytearray()
        for x in range(w):
            r, g, b = bmp_pixel(x, y, asset_id)
            row += bytes((b, g, r))  # BMP stores BGR
        row += b"\x00" * (row_stride - len(row))
        rows += row
    return header + info + bytes(rows)


def wav_sample(i: int, asset_id: int) -> int:
    """Sample i of the deterministic PCM signal (16-bit range)."""
    return ((i * 37 + asset_id * 101) % 2048) - 1024


def make_wav(asset_id: int, rate: int = WAV_RATE, n: int = WAV_N) -> bytes:
    """A real 16-bit mono PCM WAV (RIFF/fmt/data) with formula
    samples."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(
            b"".join(_struct.pack("<h", wav_sample(i, asset_id)) for i in range(n))
        )
    return buf.getvalue()


Y4M_W, Y4M_H, Y4M_FRAMES = 16, 12, 4


def y4m_luma(x: int, y: int, frame: int, asset_id: int) -> int:
    """Y-plane value of pixel (x, y) in frame ``frame`` — the oracle's
    closed form."""
    return (x * 5 + y * 9 + frame * 17 + asset_id) % 256


def make_y4m(asset_id: int, w: int = Y4M_W, h: int = Y4M_H,
             frames: int = Y4M_FRAMES) -> bytes:
    """A real YUV4MPEG2 (y4m) clip: text stream header, per-frame
    FRAME marker, raw C444 planes (Y with formula values, U/V flat
    128)."""
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
    for f in range(frames):
        out += b"FRAME\n"
        out += bytes(y4m_luma(x, y, f, asset_id) for y in range(h) for x in range(w))
        out += bytes([128]) * (w * h) * 2  # U and V planes
    return bytes(out)
