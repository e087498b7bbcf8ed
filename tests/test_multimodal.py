"""Multimodal plumbing: asset framing, mapInPandas batch shapes,
1→N frame fan-out, and the real-decoder stub gate."""

from __future__ import annotations

import pytest

from epe_data_wrangling_spark.multimodal import decode
from epe_data_wrangling_spark.multimodal.assets import as_assets
from epe_data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_asset_framing_schema(spark):
    a = as_assets(load_table(spark, SF_DIR, "documents"))
    assert dict(a.dtypes) == {
        "asset_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "n_bytes": "int",
    }
    types = {r.media_type for r in a.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_image_meta_bounds(spark):
    meta = decode.image_meta(as_assets(load_table(spark, SF_DIR, "documents")))
    rows = meta.collect()
    assert rows
    for r in rows:
        assert 256 <= r.width < 2048 and 256 <= r.height < 2048
        assert 1 <= r.channels <= 4


def test_frame_sample_fanout(spark):
    assets = as_assets(load_table(spark, SF_DIR, "documents"))
    frames = decode.frame_samples(assets, every_n=4)
    # every sampled index is a multiple of the stride, and every video
    # asset contributes at least one frame row (1→N fan-out)
    idxs = frames.select("frame_idx").distinct().collect()
    assert all(r.frame_idx % 4 == 0 for r in idxs)
    n_videos = assets.filter("media_type = 'video'").count()
    assert frames.select("asset_id").distinct().count() == n_videos


def test_real_decode_is_stubbed(spark):
    assets = as_assets(load_table(spark, SF_DIR, "documents"))
    if decode.HAVE_REAL_DECODERS:
        pytest.skip("real decoders present in this environment")
    with pytest.raises(NotImplementedError):
        decode.image_meta(assets, mode="real")


def _tiny_png(width: int, height: int, color_type: int = 6) -> bytes:
    """Minimal real PNG prefix: signature + IHDR (the spec-mandated
    first chunk) — all image_meta needs; no IDAT required."""
    import struct as _s
    import zlib

    ihdr = _s.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    chunk = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += _s.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _tiny_jpeg(width: int, height: int, n_comp: int = 3) -> bytes:
    """Minimal real JPEG prefix: SOI, APP0 (JFIF), then SOF0 with the
    frame dimensions — enough for any header parser."""
    import struct as _s

    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(n_comp))
    sof0 = b"\xff\xc0" + _s.pack(">HBHHB", 8 + 3 * n_comp, 8, height, width, n_comp) + comps
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_png_jpeg():
    assert decode.parse_image_header(_tiny_png(640, 480)) == (640, 480, 4)
    assert decode.parse_image_header(_tiny_png(1, 99999, color_type=2)) == (1, 99999, 3)
    assert decode.parse_image_header(_tiny_jpeg(1920, 1080)) == (1920, 1080, 3)
    assert decode.parse_image_header(_tiny_jpeg(8, 8, n_comp=1)) == (8, 8, 1)
    # not real images -> None (md5-fake fallback territory)
    assert decode.parse_image_header(b"plain text payload") is None
    assert decode.parse_image_header(b"\x89PNGbut-not-really") is None
    assert decode.parse_image_header(b"\xff\xd8\x00broken") is None


def test_image_meta_real_headers_via_spark(spark):
    """End-to-end through the mapInPandas operator: real PNG/JPEG
    payloads yield their true header dimensions; a text payload falls
    back to the deterministic md5 fake."""
    rows = [
        (1, "image", bytearray(_tiny_png(320, 200))),
        (2, "image", bytearray(_tiny_jpeg(1024, 768))),
        (3, "image", bytearray(b"not an image at all")),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id BIGINT, media_type STRING, payload BINARY"
    )
    got = {r.asset_id: r for r in decode.image_meta(assets).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (320, 200, 4)
    assert (got[2].width, got[2].height, got[2].channels) == (1024, 768, 3)
    # fake fallback stays in its documented range
    assert 256 <= got[3].width < 2048 and 256 <= got[3].height < 2048
    assert 1 <= got[3].channels <= 4
    assert got[1].n_bytes == len(_tiny_png(320, 200))


def test_bmp_fixture_pixel_at_raw_offset():
    """Independent byte-level check: pixel (5, 3) of asset 9, located
    by hand from the BMP layout (54-byte header, bottom-up rows,
    4-byte stride padding, BGR order), matches the generation formula
    — so the builder and the decoder cannot share a compensating
    bug."""
    from epe_data_wrangling_spark.multimodal.assets import (
        BMP_H,
        BMP_W,
        bmp_pixel,
        make_bmp,
    )

    b = make_bmp(9)
    x, y = 5, 3
    stride = (BMP_W * 3 + 3) // 4 * 4
    off = 54 + (BMP_H - 1 - y) * stride + x * 3  # bottom-up row order
    assert (b[off + 2], b[off + 1], b[off]) == bmp_pixel(x, y, 9)


def test_wav_fixture_sample_at_raw_offset():
    import struct

    from epe_data_wrangling_spark.multimodal.assets import make_wav, wav_sample

    b = make_wav(4)
    # data chunk: RIFF(12) + fmt(24) + data header(8) = byte 44 for
    # the minimal stdlib-written PCM layout
    (v10,) = struct.unpack_from("<h", b, 44 + 10 * 2)
    assert v10 == wav_sample(10, 4)


def test_real_decoders_reject_foreign_payloads(spark):
    """Non-BMP / non-WAV payloads are skipped, not misparsed."""
    from epe_data_wrangling_spark.multimodal.decode import (
        bmp_pixel_stats,
        wav_meta_energy,
    )

    junk = spark.createDataFrame(
        [(1, bytearray(b"not an image at all"))], "asset_id long, payload binary"
    )
    assert bmp_pixel_stats(junk).count() == 0
    assert wav_meta_energy(junk).count() == 0


def test_y4m_fixture_luma_at_raw_offset():
    """Frame 2, pixel (7, 5) located by hand in the y4m byte stream
    (header line, FRAME markers, C444 plane sizes) matches the
    formula."""
    from epe_data_wrangling_spark.multimodal.assets import (
        Y4M_H,
        Y4M_W,
        make_y4m,
        y4m_luma,
    )

    b = make_y4m(3)
    hdr_end = b.find(b"\n") + 1
    frame_size = len(b"FRAME\n") + Y4M_W * Y4M_H * 3
    f, x, y = 2, 7, 5
    off = hdr_end + f * frame_size + len(b"FRAME\n") + y * Y4M_W + x
    assert b[off] == y4m_luma(x, y, f, 3)


def test_binaryfile_source_feeds_bmp_decode(spark, tmp_path):
    """File-based multimodal ingest: write real BMP files, read them
    back through Spark's binaryFile datasource (path/length/content),
    and run the same real decoder — byte-identical stats to the
    in-memory payload path. This is the ingest shape a 100 TB image
    corpus actually uses (directory of blobs → binary column)."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.multimodal import decode
    from epe_data_wrangling_spark.multimodal.assets import make_bmp

    ids = list(range(4))
    for i in ids:
        (tmp_path / f"asset_{i:03d}.bmp").write_bytes(make_bmp(i))

    files = spark.read.format("binaryFile").load(str(tmp_path))
    assert {"path", "length", "content"} <= set(files.columns)
    assets = files.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.bmp$", 1)
        .cast("long")
        .alias("asset_id"),
        F.col("content").alias("payload"),
    )
    via_files = {
        r.asset_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in decode.bmp_pixel_stats(assets).collect()
    }
    mem = spark.createDataFrame(
        [(i, bytearray(make_bmp(i))) for i in ids], "asset_id long, payload binary"
    )
    via_mem = {
        r.asset_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in decode.bmp_pixel_stats(mem).collect()
    }
    assert via_files == via_mem and set(via_files) == set(ids)


def test_png_decode_all_filter_types():
    """decode_png_pixels must reverse every PNG scanline filter: the
    fixture cycles filters 0-4 by row, and every decoded pixel must
    equal the generation formula — a broken Sub/Up/Average/Paeth
    implementation corrupts specific rows."""
    from epe_data_wrangling_spark.multimodal.assets import (
        PNG_H,
        PNG_W,
        make_png,
        png_pixel,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_png_pixels

    b = make_png(7)
    w, h, ch, px = decode_png_pixels(b)
    assert (w, h, ch) == (PNG_W, PNG_H, 3)
    for y in range(PNG_H):  # covers all five filter types via y % 5
        for x in range(PNG_W):
            off = (y * PNG_W + x) * 3
            assert tuple(px[off : off + 3]) == png_pixel(x, y, 7), (x, y)


def test_png_fixture_is_real_compressed_png():
    """The fixture is an actual PNG: signature, IHDR-first, zlib
    stream in IDAT (not stored bytes), valid chunk CRCs."""
    import struct
    import zlib

    from epe_data_wrangling_spark.multimodal.assets import make_png

    b = make_png(0)
    assert b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR"
    i = 8
    seen = []
    while i + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack_from(">I", b, i + 8 + ln)
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF, tag
        seen.append(tag)
        if tag == b"IDAT":
            assert body[0] & 0x0F == 0x08  # zlib CMF: deflate
            zlib.decompress(body)  # inflates cleanly
        i += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_png_pixel_stats_rejects_foreign_and_unsupported(spark):
    from epe_data_wrangling_spark.multimodal.decode import png_pixel_stats

    junk = spark.createDataFrame(
        [(1, bytearray(b"not a png")), (2, bytearray(b"\x89PNG\r\n\x1a\ntrunc"))],
        "asset_id long, payload binary",
    )
    assert png_pixel_stats(junk).count() == 0


def test_gif_decode_roundtrip_exact_pixels():
    """decode_gif_pixels must reverse the REAL LZW stream (variable
    code width incl. the 9→10-bit growth at 24×18, KwKwK case) and
    map the palette exactly."""
    from epe_data_wrangling_spark.multimodal.assets import (
        GIF_H,
        GIF_W,
        gif_index,
        gif_palette,
        make_gif,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_gif_pixels

    b = make_gif(7)
    w, h, px = decode_gif_pixels(b)
    assert (w, h) == (GIF_W, GIF_H)
    for y in range(h):
        for x in range(w):
            off = (y * w + x) * 3
            assert tuple(px[off : off + 3]) == gif_palette(gif_index(x, y, 7)), (x, y)


def test_gif_fixture_is_real_gif89a():
    from epe_data_wrangling_spark.multimodal.assets import make_gif

    b = make_gif(0)
    assert b[:6] == b"GIF89a"
    assert b[-1] == 0x3B
    # extension block present before the image descriptor
    assert 0x21 in b[13 + 768 : 13 + 768 + 1]


def test_gif_lzw_handles_kwkwk_and_clear():
    from epe_data_wrangling_spark.multimodal.assets import _gif_lzw_compress
    from epe_data_wrangling_spark.multimodal.decode import gif_lzw_decompress

    # aaaa... is the canonical KwKwK trigger
    for data in (b"\x00" * 50, bytes(range(100)) * 3, b"abcabcabcabc" * 10):
        assert gif_lzw_decompress(_gif_lzw_compress(data, 8), 8) == data


def test_gif_pixel_stats_rejects_foreign_payloads(spark):
    from epe_data_wrangling_spark.multimodal.decode import gif_pixel_stats

    assets = spark.createDataFrame(
        [(1, bytearray(b"not a gif")), (2, bytearray(b"GIF89a\x01"))],
        "asset_id long, payload binary",
    )
    assert gif_pixel_stats(assets).count() == 0


def test_jpeg_roundtrip_bounded_error_smooth():
    """The encoder/decoder pair shares no tables (decoder reads
    DQT/DHT from the bitstream); a broken FDCT, IDCT, Huffman builder
    or unstuffing step cannot reconstruct smooth content within a few
    code values. Wrap-free gradient → error ≤ 4 per channel."""
    from epe_data_wrangling_spark.multimodal import assets as A
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    orig = A.jpeg_pixel
    A.jpeg_pixel = lambda x, y, aid: (30 + x * 2 + y, 60 + x + y * 2, 90 + x + y)
    try:
        b = A.make_jpeg(0)
    finally:
        A.jpeg_pixel = orig
    w, h, rgb = decode_jpeg_pixels(b)
    assert (w, h) == (A.JPG_W, A.JPG_H)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            exp = (30 + x * 2 + y, 60 + x + y * 2, 90 + x + y)
            for c in range(3):
                assert abs(rgb[o + c] - exp[c]) <= 4, (x, y, c)


def test_jpeg_fixture_formula_images_decode_with_small_mean_error():
    """The formula fixtures contain %-wrap edges (legit high-frequency
    content, locally larger error) — the MEAN error must still be
    ~1 code value; garbage decoding is orders of magnitude off."""
    from epe_data_wrangling_spark.multimodal.assets import jpeg_pixel, make_jpeg
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    total = n = 0
    for aid in (0, 3, 11):
        w, h, rgb = decode_jpeg_pixels(make_jpeg(aid))
        for y in range(h):
            for x in range(w):
                exp = jpeg_pixel(x, y, aid)
                o = (y * w + x) * 3
                total += sum(abs(rgb[o + c] - exp[c]) for c in range(3))
                n += 3
    assert total / n < 2.5


def test_jpeg_rejects_out_of_envelope_and_foreign():
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    b = bytearray(make_jpeg(0))
    i = b.find(bytes([0xFF, 0xC0]))
    b[i + 1] = 0xC3  # lossless-sequential SOF: out of envelope
    assert decode_jpeg_pixels(bytes(b)) is None
    b[i + 1] = 0xC9  # arithmetic-coded SOF: out of envelope
    assert decode_jpeg_pixels(bytes(b)) is None


def test_jpeg_byte_stuffing_present_and_unstuffed():
    """Quality-90 scans of 40 assets reliably contain 0xFF bytes that
    the encoder must stuff; corrupting a stuffed pair must not crash."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg

    stuffed = 0
    for aid in range(40):
        b = make_jpeg(aid)
        sos = b.find(bytes([0xFF, 0xDA]))
        scan = b[sos:-2]
        stuffed += scan.count(bytes([0xFF, 0x00]))
    assert stuffed > 0


def test_jpeg420_roundtrip_bounded_error_smooth():
    """4:2:0: four Y blocks per MCU + quarter-res chroma must still
    reconstruct smooth content tightly (chroma of a smooth gradient
    survives box down/up-sampling to within a few code values)."""
    from epe_data_wrangling_spark.multimodal import assets as A
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    orig = A.jpeg_pixel
    A.jpeg_pixel = lambda x, y, aid: (30 + x * 2 + y, 60 + x + y * 2, 90 + x + y)
    try:
        b = A.make_jpeg(0, subsample=True)
    finally:
        A.jpeg_pixel = orig
    w, h, rgb = decode_jpeg_pixels(b)
    assert (w, h) == (A.JPG_W, A.JPG_H)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            exp = (30 + x * 2 + y, 60 + x + y * 2, 90 + x + y)
            for c in range(3):
                assert abs(rgb[o + c] - exp[c]) <= 6, (x, y, c)


def test_jpeg420_sof_declares_subsampling():
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg

    b = make_jpeg(0, subsample=True)
    i = b.find(bytes([0xFF, 0xC0]))
    # SOF0 component spec: id=1 gets h=2,v=2; chroma 1,1
    assert b[i + 11] == 0x22 and b[i + 14] == 0x11 and b[i + 17] == 0x11
    b444 = make_jpeg(0)
    i = b444.find(bytes([0xFF, 0xC0]))
    assert b444[i + 11] == 0x11


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn (error-resilience intervals most camera JPEGs carry):
    byte-aligned restart markers with DC-prediction resets must decode
    to EXACTLY the pixels of the marker-free stream — the quantized
    coefficients are identical, only the entropy framing differs."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    for sub in (False, True):
        base = decode_jpeg_pixels(make_jpeg(5, subsample=sub))
        n_mcus = 6 if not sub else 2  # 20×14: 3×2 (8px) vs 2×1 (16px)
        for ri in (1, 2, 3):
            b = make_jpeg(5, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in b
            has_rst = any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
            assert has_rst == (n_mcus > ri)
            assert decode_jpeg_pixels(b) == base, (sub, ri)


def test_adpcm_roundtrip_near_lossless():
    """IMA ADPCM on the bounded-slope triangle fixtures must
    reconstruct within ±1 code value once the step adapts (the
    quantizer's floor); encoder and decoder share only the public
    IMA step/index tables."""
    from epe_data_wrangling_spark.multimodal.assets import (
        ADPCM_N,
        adpcm_sample,
        make_adpcm_wav,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_adpcm_wav

    for aid in (0, 7, 23):
        rate, samples = decode_adpcm_wav(make_adpcm_wav(aid))
        assert rate == 8000 and len(samples) == ADPCM_N
        for i in range(ADPCM_N):
            assert abs(samples[i] - adpcm_sample(i, aid)) <= 1, (aid, i)


def test_adpcm_multiblock_decodes_all_blocks():
    """A standard multi-block IMA stream (len(data) > nBlockAlign, each
    block with its own predictor/index header, fact chunk trimming the
    tail pad) must decode EVERY block — the r4-advice failure mode was
    treating the whole data chunk as one block, so mid-stream headers
    decoded as audio and/or later blocks were dropped."""
    from epe_data_wrangling_spark.multimodal.assets import (
        adpcm_sample,
        make_adpcm_wav,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_adpcm_wav

    for aid in (0, 7, 23):
        for spb in (64, 100, 33):  # exact-fit, padded tail, odd spb
            rate, samples = decode_adpcm_wav(
                make_adpcm_wav(aid, n=256, samples_per_block=spb)
            )
            assert rate == 8000
            assert len(samples) == 256, (aid, spb, len(samples))  # fact-trimmed
            for i in range(256):
                assert abs(samples[i] - adpcm_sample(i, aid)) <= 1, (aid, spb, i)


def test_adpcm_rejects_foreign_and_pcm():
    from epe_data_wrangling_spark.multimodal.assets import make_wav
    from epe_data_wrangling_spark.multimodal.decode import decode_adpcm_wav

    assert decode_adpcm_wav(b"not riff") is None
    assert decode_adpcm_wav(make_wav(0)) is None  # PCM tag 0x0001


def test_mjpeg_avi_frames_equal_direct_jpeg_decode():
    """The container must be transparent: each movi '00dc' frame
    decodes to exactly the same pixels as decoding its JPEG
    directly."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg, make_mjpeg_avi
    from epe_data_wrangling_spark.multimodal.decode import (
        decode_jpeg_pixels,
        decode_mjpeg_avi,
    )

    frames = decode_mjpeg_avi(make_mjpeg_avi(3))
    assert len(frames) == 4
    for f, w, h, rgb in frames:
        exp = decode_jpeg_pixels(
            make_jpeg(3 * 101 + f, subsample=True, restart_interval=1)
        )
        assert (w, h, rgb) == exp


def test_mjpeg_avi_rejects_foreign():
    from epe_data_wrangling_spark.multimodal.decode import decode_mjpeg_avi

    assert decode_mjpeg_avi(b"RIFFxxxxWAVE") is None
    assert decode_mjpeg_avi(b"nope") is None


def test_progressive_jpeg_equals_baseline_decode():
    """Five-scan progressive transmission (DC at Al=1, per-component
    AC bands, DC refinement) must reconstruct the exact pixels of the
    single-scan baseline — same coefficients, different order."""
    from epe_data_wrangling_spark.multimodal.assets import (
        make_jpeg,
        make_progressive_jpeg,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    for aid in (0, 7, 23):
        assert decode_jpeg_pixels(make_progressive_jpeg(aid)) == decode_jpeg_pixels(
            make_jpeg(aid)
        )


def test_progressive_jpeg_is_multiscan_sof2():
    from epe_data_wrangling_spark.multimodal.assets import make_progressive_jpeg

    b = make_progressive_jpeg(0)
    assert b.count(bytes([0xFF, 0xC2])) == 1  # SOF2
    assert b.count(bytes([0xFF, 0xDA])) == 5  # five scans
    assert bytes([0xFF, 0xC0]) not in b


def test_progressive_ac_refinement_equals_baseline():
    """FULL successive approximation (eight scans: AC bands at Al=1
    plus AC refinement with buffered correction bits and EOBn) must
    still land on the baseline pixels exactly."""
    from epe_data_wrangling_spark.multimodal.assets import (
        make_jpeg,
        make_progressive_jpeg,
    )
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    for aid in (0, 7, 23):
        b = make_progressive_jpeg(aid, ac_refine=True)
        assert b.count(bytes([0xFF, 0xDA])) == 8  # eight scans
        assert decode_jpeg_pixels(b) == decode_jpeg_pixels(make_jpeg(aid))


def test_progressive_ac_refine_sparse_detail_content():
    """Regression for the ZRL/correction-bit ordering defect: sparse
    high-frequency content (flat field + isolated dots) produces
    blocks with ≥16 zero-history zeros, then an already-significant
    coefficient, then a later newly-significant one — the pattern
    where a deferred ZRL desynced the decoder. Must still equal the
    baseline decode exactly."""
    import random

    from epe_data_wrangling_spark.multimodal import assets as A
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    rng = random.Random(7)
    orig = A.jpeg_pixel
    for _ in range(8):
        dots = {
            (rng.randrange(A.JPG_W), rng.randrange(A.JPG_H)): rng.randrange(256)
            for _ in range(6)
        }
        A.jpeg_pixel = lambda x, y, aid, d=dots: (d.get((x, y), 90),) * 3
        try:
            base = decode_jpeg_pixels(A.make_jpeg(0))
            prog = decode_jpeg_pixels(A.make_progressive_jpeg(0, ac_refine=True))
        finally:
            A.jpeg_pixel = orig
        assert prog == base
