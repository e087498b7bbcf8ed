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


# ---- baseline JPEG fixture encoder -----------------------------------
#
# A real ITU T.81 baseline sequential JPEG writer: YCbCr 4:4:4, float
# FDCT, Annex-K quantization tables scaled to quality 90, Annex-K
# Huffman tables, interleaved MCU scan with byte stuffing. The decoder
# (decode.decode_jpeg_pixels) shares NONE of these constants — it
# reads quantization and Huffman tables from the bitstream, so the
# pair is two independent implementations meeting at the spec.

JPG_W, JPG_H = 20, 14  # non-multiple-of-8: exercises MCU padding/crop

_ZZ = [  # zigzag order (T.81 Figure A.6)
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QL = [  # Annex K.1 luminance
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QC = [  # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 Huffman specs: (BITS counts per length 1..16, HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_JPEG_QUALITY = 90


def _scaled_qtable(base: list[int]) -> list[int]:
    """IJG quality scaling (quality > 50 branch)."""
    scale = 200 - 2 * _JPEG_QUALITY
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def jpeg_pixel(x: int, y: int, asset_id: int) -> tuple[int, int, int]:
    """Smooth gradient formula — low-frequency content, so quality-90
    quantization reconstructs within a small bounded error (asserted
    in tests and by the catalog oracle's tolerance design)."""
    return (
        (x * 3 + y * 2 + asset_id * 7) % 200 + 28,
        (x * 2 + y * 4 + asset_id * 5) % 200 + 28,
        (x * 4 + y * 3 + asset_id * 3) % 200 + 28,
    )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 C.2): symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _fdct8(block: list[float]) -> list[float]:
    """Direct 2-D type-II DCT with orthonormal scaling (T.81 A.3.3)."""
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for yy in range(8):
                for xx in range(8):
                    s += (
                        block[yy * 8 + xx]
                        * _COS[xx][u]
                        * _COS[yy][v]
                    )
            cu = _INV_SQRT2 if u == 0 else 1.0
            cv = _INV_SQRT2 if v == 0 else 1.0
            out[v * 8 + u] = 0.25 * cu * cv * s
    return out


import math as _math

_COS = [[_math.cos((2 * i + 1) * j * _math.pi / 16) for j in range(8)] for i in range(8)]
_INV_SQRT2 = 1.0 / _math.sqrt(2.0)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def restart_marker(self, idx: int) -> None:
        """Byte-align with 1-fill bits, then emit RST(idx mod 8) RAW
        (markers are never byte-stuffed)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        self.buf += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _amp_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def make_jpeg(
    asset_id: int,
    w: int = JPG_W,
    h: int = JPG_H,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """A real baseline JPEG (SOI/APP0/DQT/SOF0/DHT/SOS/EOI): YCbCr,
    quality-90 Annex-K quant tables, Annex-K Huffman tables,
    interleaved MCU scan, 0xFF byte stuffing, edge-replicated MCU
    padding for the non-multiple-of-8 dimensions. ``subsample=False``
    writes 4:4:4 (one block per component per MCU);
    ``subsample=True`` writes 4:2:0 — the layout virtually every
    real-world JPEG uses: Y at 2×2 sampling (four blocks per 16×16
    MCU), chroma box-averaged 2×2 to quarter resolution.
    ``restart_interval=N`` emits a DRI segment and RSTn markers every
    N MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature most camera JPEGs carry."""
    ql, qc = _scaled_qtable(_QL), _scaled_qtable(_QC)

    # formula RGB → 3 full-resolution YCbCr planes (JFIF, rounded)
    full = [[0] * (w * h) for _ in range(3)]
    for y in range(h):
        for x in range(w):
            r, g, b = jpeg_pixel(x, y, asset_id)
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            for ci, v in enumerate((yy, cb, cr)):
                full[ci][y * w + x] = min(255, max(0, round(v)))

    factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component sample planes at their own resolution; subsampled
    # chroma is the rounded 2×2 box mean (edge pixels replicate)
    planes: list[list[int]] = []
    dims: list[tuple[int, int]] = []
    for ci, (hc, vc) in enumerate(factors):
        cw = (w * hc + hmax - 1) // hmax
        ch = (h * vc + vmax - 1) // vmax
        if (hc, vc) == (hmax, vmax):
            planes.append(full[ci])
            dims.append((w, h))
            continue
        sx, sy = hmax // hc, vmax // vc
        plane = [0] * (cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                acc = n = 0
                for dy in range(sy):
                    for dx in range(sx):
                        px = min(cx * sx + dx, w - 1)
                        py = min(cy * sy + dy, h - 1)
                        acc += full[ci][py * w + px]
                        n += 1
                plane[cy * cw + cx] = (acc + n // 2) // n
        planes.append(plane)
        dims.append((cw, ch))

    def block_of(ci: int, bx: int, by: int) -> list[float]:
        cw, ch = dims[ci]
        plane = planes[ci]
        out = []
        for yy in range(8):
            sy = min(by * 8 + yy, ch - 1)
            for xx in range(8):
                sx = min(bx * 8 + xx, cw - 1)
                out.append(float(plane[sy * cw + sx]) - 128.0)
        return out

    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)

    out = _BitWriter()
    pred = [0, 0, 0]
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                out.restart_marker(mcu_idx // restart_interval - 1)
                pred = [0, 0, 0]
            mcu_idx += 1
            for ci in range(3):
                hc, vc = factors[ci]
                q = ql if ci == 0 else qc
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for byy in range(vc):
                    for bxx in range(hc):
                        coef = _fdct8(block_of(ci, mx * hc + bxx, my * vc + byy))
                        zz = [round(coef[_ZZ[k]] / q[k]) for k in range(64)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        size = _category(diff)
                        code, ln = dc_t[size]
                        out.put(code, ln)
                        if size:
                            out.put(_amp_bits(diff, size), size)
                        run = 0
                        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, 64):
                            if k > last_nz:
                                code, ln = ac_t[0x00]  # EOB
                                out.put(code, ln)
                                break
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_t[0xF0]  # ZRL
                                out.put(code, ln)
                                run -= 16
                            size = _category(zz[k])
                            code, ln = ac_t[(run << 4) | size]
                            out.put(code, ln)
                            out.put(_amp_bits(zz[k], size), size)
                            run = 0
    scan = out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits + vals)

    hv = [(hc << 4) | vc for hc, vc in factors]
    dri = (
        seg(0xDD, _struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes([0]) + bytes(ql[k] for k in range(64))) + seg(
        0xDB, bytes([1]) + bytes(qc[k] for k in range(64))
    )
    sof = seg(
        0xC0,
        bytes([8])
        + _struct.pack(">HH", h, w)
        + bytes([3, 1, hv[0], 0, 2, hv[1], 1, 3, hv[2], 1]),
    )
    dhts = seg(0xC4, dht(0, 0, _DC_L) + dht(1, 0, _AC_L) + dht(0, 1, _DC_C) + dht(1, 1, _AC_C))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + jfif + dqt + sof + dhts + dri + sos + scan + b"\xff\xd9"


# ---- IMA ADPCM audio fixtures ----------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

ADPCM_RATE, ADPCM_N = 8000, 256


def adpcm_sample(i: int, asset_id: int) -> int:
    """Smooth deterministic source signal — a phase-shifted triangle
    wave with bounded slope (ADPCM is a differential codec: smooth
    signals reconstruct near-losslessly once the step size adapts,
    which keeps the roundtrip-error bound meaningful; a wrapping
    sawtooth would slope-overload every period)."""
    ph = (i + asset_id * 11) % 128
    tri = ph if ph < 64 else 128 - ph  # 0..64..0, slope ±1
    return (tri - 32) * 8 + (asset_id % 5)


def _ima_encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One IMA ADPCM quantization step (IMA ADPCM reference algorithm,
    as specified in the IMA Digital Audio Focus Group recommendation):
    returns (nibble, new_pred, new_index)."""
    step = _IMA_STEP_TABLE[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        delta += step
    step >>= 1
    if diff >= step:
        nibble |= 2
        diff -= step
        delta += step
    step >>= 1
    if diff >= step:
        nibble |= 1
        delta += step
    pred = pred - delta if nibble & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    return nibble, pred, index


def make_adpcm_wav(
    asset_id: int,
    rate: int = ADPCM_RATE,
    n: int = ADPCM_N,
    samples_per_block: int | None = None,
) -> bytes:
    """A real RIFF/WAVE file with format tag 0x0011 (IMA ADPCM), mono:
    the data chunk is a sequence of independent nBlockAlign-sized
    blocks, each a 4-byte header (that block's initial predictor +
    step index, reserved byte) followed by packed 4-bit nibbles (low
    nibble first). Default is ONE block holding all ``n`` samples;
    pass ``samples_per_block`` to emit a standard multi-block stream
    (the adapted step index carries forward into each block header,
    the predictor restarts from the block's first raw sample — the
    layout every multi-block IMA encoder emits). The COMPRESSED
    audio twin of make_wav's PCM fixtures."""
    samples = [adpcm_sample(i, asset_id) for i in range(n)]
    spb = n if samples_per_block is None else samples_per_block
    nibble_slots = spb - 1 + ((spb - 1) & 1)  # pad odd counts
    block_align = 4 + nibble_slots // 2
    data = bytearray()
    index = 0
    for start in range(0, n, spb):
        blk = samples[start : start + spb]
        pred = blk[0]
        data += _struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in blk[1:]:
            nib, pred, index = _ima_encode_nibble(s, pred, index)
            nibbles.append(nib)
        while len(nibbles) < nibble_slots:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            data.append(lo | (hi << 4))
    fmt = _struct.pack(
        "<HHIIHHH H",
        0x0011, 1, rate, rate * block_align // spb,
        block_align, 4, 2, spb,
    )  # wSamplesPerBlock in the cbSize extension
    # multi-block streams carry the spec's fact chunk (dwSampleLength)
    # so decoders can trim the final block's pad samples; omitted in
    # the single-block default to keep those fixture bytes frozen
    fact = b"" if samples_per_block is None else b"fact" + _struct.pack("<II", 4, n)
    out = bytearray()
    out += b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + len(fact) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    out += fact
    out += b"data" + _struct.pack("<I", len(data)) + bytes(data)
    return bytes(out)


# ---- MJPEG-in-AVI video fixtures -------------------------------------

MJPEG_FRAMES = 4


def make_mjpeg_avi(asset_id: int, frames: int = MJPEG_FRAMES) -> bytes:
    """A real RIFF/AVI container whose video stream is Motion-JPEG:
    avih + strl (strh 'vids'/'MJPG', strf BITMAPINFOHEADER with
    biCompression 'MJPG') headers, a movi LIST of '00dc' chunks each
    holding a COMPLETE baseline JPEG (frame f uses the pixel formula
    seeded with asset_id·101+f, 4:2:0 + a restart interval so the
    video path exercises the full codec envelope), and an idx1
    index. The compressed VIDEO twin of make_y4m."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + _struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    jpegs = [
        make_jpeg(asset_id * 101 + f, subsample=True, restart_interval=1)
        for f in range(frames)
    ]
    w, h = JPG_W, JPG_H
    avih = _struct.pack(
        "<14I",
        33333, 0, 0, 0x10, frames, 0, 1, max(len(j) for j in jpegs), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        # dwFlags, wPriority, wLanguage, dwInitialFrames, dwScale,
        # dwRate, dwStart, dwLength, dwSuggestedBufferSize,
        # dwQuality, dwSampleSize
        + _struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 30, 0, frames, 0, 0xFFFFFFFF, 0
        )
        + _struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = _struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                        w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + _struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", bytes(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _struct.pack("<I", len(riff_body)) + riff_body


class _RefBitWriter(_BitWriter):
    """_BitWriter plus the refinement-scan discipline of T.81
    G.1.2.3: correction bits for already-nonzero coefficients are
    BUFFERED and flushed immediately after the next emitted Huffman
    symbol (+ its sign bit)."""

    def __init__(self) -> None:
        super().__init__()
        self.pending: list[int] = []

    def buffer_bit(self, bit: int) -> None:
        self.pending.append(bit)

    def flush_pending(self) -> None:
        for bit in self.pending:
            self.put(bit, 1)
        self.pending = []


def make_progressive_jpeg(
    asset_id: int, w: int = JPG_W, h: int = JPG_H, *, ac_refine: bool = False
) -> bytes:
    """A real PROGRESSIVE JPEG (SOF2) — the multi-scan form most web
    images ship, over the same quantized coefficients as the baseline
    encoder would produce:

      1. interleaved DC scan at successive-approximation Al=1
         (coarse DC for the instant low-res preview),
      2..4. one spectral-selection AC band scan per component
         (Ss=1..Se=63) — at Al=0 by default, or Al=1 when
         ``ac_refine`` is set,
      5. DC refinement scan (Ah=1, Al=0) delivering the final DC bit,
      6..8. (``ac_refine`` only) AC successive-approximation
         refinement scans per component (Ah=1, Al=0): newly
         significant ±1 coefficients coded by zero-history run
         lengths, correction bits for already-nonzero coefficients
         buffered and flushed after the next symbol (T.81 G.1.2.3 —
         the full scheme libjpeg emits).

    A decoder must handle multi-scan coefficient accumulation,
    non-interleaved block geometry, EOBn codes and successive
    approximation to reconstruct — and must land on EXACTLY the
    baseline decode of ``make_jpeg`` (same coefficients, different
    transmission order), which is what the pytest pins."""
    ql, qc = _scaled_qtable(_QL), _scaled_qtable(_QC)

    full = [[0] * (w * h) for _ in range(3)]
    for y in range(h):
        for x in range(w):
            r, g, b = jpeg_pixel(x, y, asset_id)
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            for ci, v in enumerate((yy, cb, cr)):
                full[ci][y * w + x] = min(255, max(0, round(v)))

    bw, bh = (w + 7) // 8, (h + 7) // 8

    def block_of(ci: int, bx: int, by: int) -> list[float]:
        out = []
        for yy in range(8):
            sy = min(by * 8 + yy, h - 1)
            for xx in range(8):
                sx = min(bx * 8 + xx, w - 1)
                out.append(float(full[ci][sy * w + sx]) - 128.0)
        return out

    # quantized zigzag coefficients per component/block (once)
    qzz: list[list[list[int]]] = [[], [], []]
    for ci in range(3):
        q = ql if ci == 0 else qc
        for by in range(bh):
            for bx in range(bw):
                coef = _fdct8(block_of(ci, bx, by))
                qzz[ci].append([round(coef[_ZZ[k]] / q[k]) for k in range(64)])

    dc_l, dc_c = _huff_codes(*_DC_L), _huff_codes(*_DC_C)
    ac_l, ac_c = _huff_codes(*_AC_L), _huff_codes(*_AC_C)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, dct, act in comp_specs:
            body += bytes([cid, (dct << 4) | act])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: interleaved DC, Al=1
    out = _BitWriter()
    pred = [0, 0, 0]
    for bi in range(bw * bh):
        for ci in range(3):
            dc_t = dc_l if ci == 0 else dc_c
            v = qzz[ci][bi][0] >> 1  # point transform
            diff = v - pred[ci]
            pred[ci] = v
            size = _category(diff)
            code, ln = dc_t[size]
            out.put(code, ln)
            if size:
                out.put(_amp_bits(diff, size), size)
    scan_dc = sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1) + out.flush()

    # scans 2-4: per-component AC 1..63 (point transform ac_al)
    ac_al = 1 if ac_refine else 0
    ac_scans = b""
    for ci in range(3):
        ac_t = ac_l if ci == 0 else ac_c
        out = _BitWriter()
        for bi in range(bw * bh):
            zz = qzz[ci][bi]
            vals = [
                (abs(v) >> ac_al) * (1 if v > 0 else -1) for v in zz
            ]  # AC point transform truncates magnitude
            run = 0
            last_nz = max((k for k in range(1, 64) if vals[k]), default=0)
            emitted = False
            for k in range(1, 64):
                if k > last_nz:
                    break
                if vals[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_t[0xF0]
                    out.put(code, ln)
                    run -= 16
                size = _category(vals[k])
                code, ln = ac_t[(run << 4) | size]
                out.put(code, ln)
                out.put(_amp_bits(vals[k], size), size)
                run = 0
                emitted = k == 63
            if not emitted:
                code, ln = ac_t[0x00]  # EOB0
                out.put(code, ln)
        cid = ci + 1
        tab = 0 if ci == 0 else 1
        ac_scans += sos([(cid, 0, tab)], 1, 63, 0, ac_al) + out.flush()

    # scan 5: DC refinement (Ah=1 → one bit per block, interleaved)
    out = _BitWriter()
    for bi in range(bw * bh):
        for ci in range(3):
            out.put(qzz[ci][bi][0] & 1, 1)
    scan_dc2 = sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0) + out.flush()

    # scans 6-8 (ac_refine): AC refinement per component (Ah=1, Al=0)
    ac_ref_scans = b""
    if ac_refine:
        for ci in range(3):
            ac_t = ac_l if ci == 0 else ac_c
            out = _RefBitWriter()
            for bi in range(bw * bh):
                zz = qzz[ci][bi]
                run = 0
                last_new = max(
                    (k for k in range(1, 64) if abs(zz[k]) == 1), default=0
                )
                for k in range(1, 64):
                    if k > last_new:
                        break
                    t = abs(zz[k])
                    if t == 0:
                        run += 1
                        continue
                    # pending ZRLs are emitted at ANY nonzero
                    # coefficient (jcphuff's encode_mcu_AC_refine) —
                    # deferring them past an already-significant
                    # coefficient would flush that coefficient's
                    # correction bit into the ZRL position and desync
                    # the decoder; the k > last_new break above is the
                    # fold-into-EOB condition
                    while run > 15:
                        code, ln = ac_t[0xF0]
                        out.put(code, ln)
                        out.flush_pending()
                        run -= 16
                    if t >> 1:  # already significant: buffered correction
                        out.buffer_bit(t & 1)
                        continue
                    # newly significant (±1)
                    code, ln = ac_t[(run << 4) | 1]
                    out.put(code, ln)
                    out.put(1 if zz[k] > 0 else 0, 1)
                    out.flush_pending()
                    run = 0
                if last_new < 63 or out.pending:
                    for k in range(max(last_new + 1, 1), 64):
                        if abs(zz[k]) >> 1:
                            out.buffer_bit(abs(zz[k]) & 1)
                    code, ln = ac_t[0x00]  # EOB0
                    out.put(code, ln)
                    out.flush_pending()
            cid = ci + 1
            tab = 0 if ci == 0 else 1
            ac_ref_scans += sos([(cid, 0, tab)], 1, 63, 1, 0) + out.flush()

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits + vals)

    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes([0]) + bytes(ql)) + seg(0xDB, bytes([1]) + bytes(qc))
    sof = seg(
        0xC2,
        bytes([8]) + _struct.pack(">HH", h, w)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dhts = seg(0xC4, dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
               + dht(0, 1, _DC_C) + dht(1, 1, _AC_C))
    return (b"\xff\xd8" + jfif + dqt + sof + dhts
            + scan_dc + ac_scans + scan_dc2 + ac_ref_scans + b"\xff\xd9")
