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


PNG_W, PNG_H = 16, 12


def png_pixel(x: int, y: int, asset_id: int) -> tuple[int, int, int]:
    """(r, g, b) of pixel (x, y) — the closed form the oracle mirrors."""
    return (
        (x * 13 + y * 7 + 5 * asset_id) % 256,
        (x * 17 + y * 3 + 7 * asset_id) % 256,
        (x * 5 + y * 11 + 3 * asset_id) % 256,
    )


def make_png(asset_id: int, w: int = PNG_W, h: int = PNG_H) -> bytes:
    """A real 8-bit RGB PNG (zlib-compressed IDAT) with formula pixels.
    Scanline filters CYCLE through all five types (y % 5: None, Sub,
    Up, Average, Paeth), so a decoder must implement real unfiltering
    — a filter-0-only fixture would never catch a broken Paeth."""
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            _struct.pack(">I", len(body))
            + tag
            + body
            + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bpp = 3
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(png_pixel(x, y, asset_id))
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) % 256
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) % 256 for i in range(len(row)))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2) % 256
                for i in range(len(row))
            )
        else:  # Paeth
            out = bytearray()
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pred) % 256)
            raw += out
        prev = bytes(row)
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


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


GIF_W, GIF_H = 24, 18


def gif_palette(i: int) -> tuple[int, int, int]:
    """(r, g, b) of global-color-table entry i — the closed form the
    oracle composes with ``gif_index``."""
    return ((i * 3) % 256, (i * 7) % 256, (i * 11) % 256)


def gif_index(x: int, y: int, asset_id: int) -> int:
    """Palette index of pixel (x, y)."""
    return (x * 13 + y * 7 + 5 * asset_id) % 256


def _gif_lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF-flavor LZW (variable code width 9→12 bits, LSB-first
    bit packing, CLEAR/EOI codes) — the inverse of
    ``decode.gif_lzw_decompress``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for byte in indices:
        k = bytes([byte])
        if w + k in table:
            w += k
        else:
            emit(table[w])
            table[w + k] = next_code
            next_code += 1
            # GIF widens AFTER the code that made the table reach
            # 2^code_size entries; at 4096 an encoder must CLEAR
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
            w = k
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(asset_id: int, w: int = GIF_W, h: int = GIF_H) -> bytes:
    """A real GIF89a with a 256-entry global color table and a REAL
    LZW-compressed image stream (min code size 8; at 24×18 the string
    table passes 512 entries, so the variable-width 9→10-bit growth
    path is exercised, not just fixed-width codes). A Graphic Control
    Extension precedes the image so decoders must walk/skip extension
    blocks. Pixels are palette indices from ``gif_index`` mapped
    through ``gif_palette``."""
    out = bytearray()
    out += b"GIF89a"
    out += _struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # global table, 8 bpp, 256 entries
    for i in range(256):
        out += bytes(gif_palette(i))
    out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # GCE (no transparency)
    out += bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
    indices = bytes(gif_index(x, y, asset_id) for y in range(h) for x in range(w))
    lzw = _gif_lzw_compress(indices, 8)
    out += bytes([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += bytes([0, 0x3B])  # block terminator + trailer
    return bytes(out)
