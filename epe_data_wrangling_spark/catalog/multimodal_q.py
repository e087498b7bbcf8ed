"""Multimodal suite: binary payload columns + Arrow-batched decode
operators (north star; the reference has no media handling).

The decode step is a deterministic md5-derived fake (real codecs are
absent here — see ``multimodal.decode.require_real_decoders``), which
is precisely what makes these Python mapInPandas operators fully
oracle-checkable: DuckDB reproduces the fake decode hex-digit-for-
hex-digit from md5/hex/octet_length.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog.ducksql import hex_int
from epe_data_wrangling_spark.multimodal import decode
from epe_data_wrangling_spark.multimodal.assets import as_assets
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

#: doc_id → media_type routing used by assets.as_assets.
_MEDIA = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
#: lowercase hex of the UTF-8 payload bytes.
_HX = "lower(hex(encode(text)))"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_assets(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_image_meta",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(256 + {hex_int('md5(text)', 1, 3)} % 1792 AS INTEGER) AS width,
           CAST(256 + {hex_int('md5(text)', 4, 3)} % 1792 AS INTEGER) AS height,
           CAST(1 + {hex_int('md5(text)', 7, 1)} % 4 AS INTEGER) AS channels
    FROM documents WHERE {_MEDIA} = 'image'
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → image header metadata via mapInPandas
    (multimodal.decode.image_meta; decode body stubbed/fake)."""
    return decode.image_meta(_assets(spark, sf_dir))


@query(
    "multimodal_resize_fingerprint",
    oracle=f"""
    SELECT doc_id AS asset_id, CAST(64 AS INTEGER) AS width,
           CAST(64 AS INTEGER) AS height,
           md5('64x64|' || md5(text)) AS resized_md5
    FROM documents WHERE {_MEDIA} = 'image'
    """,
)
def multimodal_resize_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64×64 resize pass over image payloads (fingerprint stand-in
    for pixels; multimodal.decode.resize_images)."""
    return decode.resize_images(_assets(spark, sf_dir), 64, 64)


@query(
    "multimodal_frame_sample",
    headline=True,
    oracle=f"""
    WITH p AS (SELECT doc_id, {_HX} AS hx FROM documents WHERE {_MEDIA} = 'video'),
    f AS (SELECT doc_id, hx,
                 unnest(generate_series(0, CAST(ceil(len(hx) / 64.0) AS INTEGER) - 1, 4)) AS i
          FROM p)
    SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_idx,
           md5(substring(hx, i * 64 + 1, 64)) AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling over video payloads — the 1→N
    mapInPandas fan-out shape (multimodal.decode.frame_samples)."""
    return decode.frame_samples(_assets(spark, sf_dir), every_n=4)


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH p AS (SELECT doc_id, {_HX} AS hx FROM documents WHERE {_MEDIA} = 'audio'),
    w AS (SELECT doc_id, hx,
                 unnest(generate_series(0, CAST(ceil(len(hx) / 16.0) AS INTEGER) - 1)) AS i
          FROM p)
    SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS window_idx,
           CAST({hex_int("md5(substring(hx, i * 16 + 1, 16))", 1, 8)} AS DOUBLE) / 4294967296.0
             AS energy
    FROM w
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed pseudo-energy over audio payloads
    (multimodal.decode.audio_energy)."""
    return decode.audio_energy(_assets(spark, sf_dir))


N_REAL_ASSETS = 40


@query(
    "multimodal_bmp_pixel_stats",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    px AS (SELECT ids.asset_id, xx.x, yy.y
           FROM ids,
                LATERAL unnest(generate_series(0, 15)) xx(x),
                LATERAL unnest(generate_series(0, 11)) yy(y)),
    s AS (SELECT asset_id,
                 SUM((x * 11 + y * 2 + 3 * asset_id) % 256) AS sum_r,
                 SUM((x * 3 + y * 5 + 2 * asset_id) % 256) AS sum_g,
                 SUM((x * 7 + y * 13 + asset_id) % 256) AS sum_b
          FROM px GROUP BY asset_id)
    SELECT asset_id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           round(CAST(sum_r AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_r,
           round(CAST(sum_g AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_g,
           round(CAST(sum_b AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_b
    FROM s
    """,
)
def multimodal_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, hash-checked: {N_REAL_ASSETS} actual 24-bit
    BMP files (built by multimodal.assets.make_bmp with a
    deterministic pixel formula) are struct-parsed — header AND
    padded bottom-up pixel rows — by decode.bmp_pixel_stats, and the
    exact integer channel sums must equal the oracle's closed-form
    evaluation of the same formula over generate_series. This is a
    full container-to-pixels decode path with zero codec
    dependencies; at scale the payloads would live in parquet binary
    columns exactly like this and never shuffle."""
    from epe_data_wrangling_spark.multimodal.assets import make_bmp

    rows = [(i, bytearray(make_bmp(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.bmp_pixel_stats(assets)


@query(
    "multimodal_png_pixel_stats",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    px AS (SELECT ids.asset_id, xx.x, yy.y
           FROM ids,
                LATERAL unnest(generate_series(0, 15)) xx(x),
                LATERAL unnest(generate_series(0, 11)) yy(y)),
    s AS (SELECT asset_id,
                 SUM((x * 13 + y * 7 + 5 * asset_id) % 256) AS sum_r,
                 SUM((x * 17 + y * 3 + 7 * asset_id) % 256) AS sum_g,
                 SUM((x * 5 + y * 11 + 3 * asset_id) % 256) AS sum_b
          FROM px GROUP BY asset_id)
    SELECT asset_id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           round(CAST(sum_r AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_r,
           round(CAST(sum_g AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_g,
           round(CAST(sum_b AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_b
    FROM s
    """,
)
def multimodal_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode, hash-checked: {N_REAL_ASSETS}
    actual zlib-compressed 8-bit RGB PNGs (multimodal.assets.make_png,
    scanline filters cycling through all five PNG filter types incl.
    Paeth) are decoded by decode.png_pixel_stats — chunk walk, IDAT
    inflate, per-scanline unfilter — and the exact integer channel
    sums must equal the oracle's closed-form evaluation of the pixel
    formula. Retires the require_real_decoders stub for the most
    common image format with zero codec dependencies; at scale the
    payloads live in parquet binary columns and never shuffle."""
    from epe_data_wrangling_spark.multimodal.assets import make_png

    rows = [(i, bytearray(make_png(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.png_pixel_stats(assets)


@query(
    "multimodal_wav_energy",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    sm AS (SELECT ids.asset_id,
                  ((ii.i * 37 + ids.asset_id * 101) % 2048) - 1024 AS v
           FROM ids, LATERAL unnest(generate_series(0, 255)) ii(i))
    SELECT asset_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(256 AS INTEGER) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(MAX(abs(v)) AS INTEGER) AS peak_abs
    FROM sm GROUP BY asset_id
    """,
)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, hash-checked: {N_REAL_ASSETS} actual RIFF/
    WAVE 16-bit PCM files (multimodal.assets.make_wav, deterministic
    samples) decoded with stdlib ``wave`` by decode.wav_meta_energy;
    exact integer signal energy and peak must equal the oracle's
    closed-form sum of the generation formula. Complements the
    md5-fake ``multimodal_audio_energy`` (which pins the mapInPandas
    plumbing for formats whose codecs aren't installable here)."""
    from epe_data_wrangling_spark.multimodal.assets import make_wav

    rows = [(i, bytearray(make_wav(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.wav_meta_energy(assets)


@query(
    "multimodal_y4m_frame_stats",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    px AS (SELECT ids.asset_id, ff.f, xx.x, yy.y
           FROM ids,
                LATERAL unnest(generate_series(0, 3)) ff(f),
                LATERAL unnest(generate_series(0, 15)) xx(x),
                LATERAL unnest(generate_series(0, 11)) yy(y))
    SELECT asset_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
           CAST(SUM((x * 5 + y * 9 + f * 17 + asset_id) % 256) AS BIGINT)
             AS sum_y,
           round(CAST(SUM((x * 5 + y * 9 + f * 17 + asset_id) % 256)
                      AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_y
    FROM px GROUP BY asset_id, f
    """,
)
def multimodal_y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, hash-checked per frame: {N_REAL_ASSETS}
    actual YUV4MPEG2 clips (4 formula frames each, C444) parsed by
    decode.y4m_frame_stats — stream header, FRAME markers, raw Y
    planes — with exact per-frame luma sums equal to the oracle's
    closed form. Completes the real-decode triple (BMP image, WAV
    audio, Y4M video), all stdlib-only."""
    from epe_data_wrangling_spark.multimodal.assets import make_y4m

    rows = [(i, bytearray(make_y4m(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.y4m_frame_stats(assets)


KEYFRAME_DELTA = 16.0


@query(
    "multimodal_keyframes",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    px AS (SELECT ids.asset_id, ff.f, xx.x, yy.y
           FROM ids,
                LATERAL unnest(generate_series(0, 3)) ff(f),
                LATERAL unnest(generate_series(0, 15)) xx(x),
                LATERAL unnest(generate_series(0, 11)) yy(y)),
    fr AS (SELECT asset_id, CAST(f AS INTEGER) AS frame_idx,
                  round(CAST(SUM((x * 5 + y * 9 + f * 17 + asset_id) % 256)
                             AS BIGINT) / CAST(16 * 12 AS DOUBLE), 6) AS mean_y
           FROM px GROUP BY asset_id, f),
    d AS (SELECT asset_id, frame_idx, mean_y,
                 LAG(mean_y) OVER (PARTITION BY asset_id
                                   ORDER BY frame_idx) AS prev_y
          FROM fr)
    SELECT asset_id, frame_idx, mean_y,
           round(abs(mean_y - prev_y), 6) AS luma_delta
    FROM d
    WHERE prev_y IS NULL OR abs(mean_y - prev_y) > {KEYFRAME_DELTA}
    """,
)
def multimodal_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection on top of the REAL video decode: keep frame
    0 plus any frame whose mean-luma delta vs the previous frame
    exceeds {KEYFRAME_DELTA} — the decode → feature → select
    composition of a video-curation pipeline (scene-change detection
    in its simplest form), hash-checked through both stages. Per-asset
    lag windows over the tiny frame-stats table; payload bytes stay in
    the narrow decode pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.multimodal.assets import make_y4m

    rows = [(i, bytearray(make_y4m(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    fr = decode.y4m_frame_stats(assets).select("asset_id", "frame_idx", "mean_y")
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    d = fr.withColumn("prev_y", F.lag("mean_y").over(w))
    return d.filter(
        F.col("prev_y").isNull()
        | (F.abs(F.col("mean_y") - F.col("prev_y")) > KEYFRAME_DELTA)
    ).select(
        "asset_id",
        "frame_idx",
        "mean_y",
        F.round(F.abs(F.col("mean_y") - F.col("prev_y")), 6).alias("luma_delta"),
    )


@query(
    "multimodal_gif_pixel_stats",
    oracle=f"""
    WITH ids AS (SELECT unnest(generate_series(0, {N_REAL_ASSETS - 1}))
                   AS asset_id),
    px AS (SELECT ids.asset_id,
                  (xx.x * 13 + yy.y * 7 + 5 * ids.asset_id) % 256 AS idx
           FROM ids,
                LATERAL unnest(generate_series(0, 23)) xx(x),
                LATERAL unnest(generate_series(0, 17)) yy(y)),
    s AS (SELECT asset_id,
                 SUM((idx * 3) % 256) AS sum_r,
                 SUM((idx * 7) % 256) AS sum_g,
                 SUM((idx * 11) % 256) AS sum_b
          FROM px GROUP BY asset_id)
    SELECT asset_id, CAST(24 AS INTEGER) AS width, CAST(18 AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           round(CAST(sum_r AS BIGINT) / CAST(24 * 18 AS DOUBLE), 6) AS mean_r,
           round(CAST(sum_g AS BIGINT) / CAST(24 * 18 AS DOUBLE), 6) AS mean_g,
           round(CAST(sum_b AS BIGINT) / CAST(24 * 18 AS DOUBLE), 6) AS mean_b
    FROM s
    """,
)
def multimodal_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL palette-image decode, hash-checked: {N_REAL_ASSETS} actual
    GIF89a files (multimodal.assets.make_gif — REAL variable-width
    LZW, 256-entry global color table, extension block in the stream)
    are decoded by decode.gif_pixel_stats — extension walk, sub-block
    reassembly, LZW decompress incl. the 9→10-bit width growth and
    KwKwK case, palette mapping — and the exact integer channel sums
    must equal the oracle's closed-form composition of the index and
    palette formulas. Second compressed format decoded for real with
    zero codec dependencies (after PNG)."""
    from epe_data_wrangling_spark.multimodal.assets import make_gif

    rows = [(i, bytearray(make_gif(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.gif_pixel_stats(assets)


@lru_cache(maxsize=1)
def _jpeg_expected_sql() -> str:
    """LAZY golden oracle (resolved only when the comparison runs, not
    at import): decode the 40 JPEG fixtures with decode_jpeg_pixels in
    plain driver-side Python and freeze the channel sums as VALUES.

    Provenance: this certifies the Spark mapInPandas path lands on the
    single-process decode of the same payloads (JPEG is lossy, so no
    closed-form pixel oracle can exist). Codec CORRECTNESS is anchored
    separately in tests/test_multimodal.py: the encoder and decoder
    share no tables (the decoder reads DQT/DHT from the bitstream),
    and decode(encode(x)) must reconstruct smooth content within a
    tight error bound — a broken FDCT/IDCT/Huffman/unstuffing step
    fails that property, not just determinism."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    rows = []
    for aid in range(N_REAL_ASSETS):
        w, h, px = decode_jpeg_pixels(make_jpeg(aid))
        rows.append(
            f"({aid}, {w}, {h}, {sum(px[0::3])}, {sum(px[1::3])}, {sum(px[2::3])})"
        )
    values = ",\n      ".join(rows)
    return f"""
    SELECT asset_id, CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           round(sum_r / CAST(width * height AS DOUBLE), 6) AS mean_r,
           round(sum_g / CAST(width * height AS DOUBLE), 6) AS mean_g,
           round(sum_b / CAST(width * height AS DOUBLE), 6) AS mean_b
    FROM (VALUES
      {values}
    ) t(asset_id, width, height, sum_r, sum_g, sum_b)
    """


@query("multimodal_jpeg_pixel_stats", oracle=_jpeg_expected_sql)
def multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode, hash-checked: {N_REAL_ASSETS} actual
    baseline JPEGs (multimodal.assets.make_jpeg — float FDCT,
    quality-90 Annex-K quantization, Annex-K Huffman, interleaved
    4:4:4 MCU scan, byte stuffing, non-multiple-of-8 dims) decoded by
    decode.jpeg_pixel_stats: marker walk, DQT/DHT parsed FROM the
    bitstream, entropy decode, dequantize, IDCT, YCbCr→RGB. With PNG
    (zlib) and GIF (LZW) this completes the big-three image formats
    decoded for real with zero codec dependencies; the
    require_real_decoders stub now covers only codec video/audio."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg

    rows = [(i, bytearray(make_jpeg(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.jpeg_pixel_stats(assets)


@lru_cache(maxsize=1)
def _jpeg420_expected_sql() -> str:
    """Lazy golden for the 4:2:0 fixtures (same provenance contract as
    ``_jpeg_expected_sql`` — codec correctness is anchored by the
    encoder/decoder-independence roundtrip tests)."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg
    from epe_data_wrangling_spark.multimodal.decode import decode_jpeg_pixels

    rows = []
    for aid in range(N_REAL_ASSETS):
        w, h, px = decode_jpeg_pixels(make_jpeg(aid, subsample=True))
        rows.append(
            f"({aid}, {w}, {h}, {sum(px[0::3])}, {sum(px[1::3])}, {sum(px[2::3])})"
        )
    values = ",\n      ".join(rows)
    return f"""
    SELECT asset_id, CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           round(sum_r / CAST(width * height AS DOUBLE), 6) AS mean_r,
           round(sum_g / CAST(width * height AS DOUBLE), 6) AS mean_g,
           round(sum_b / CAST(width * height AS DOUBLE), 6) AS mean_b
    FROM (VALUES
      {values}
    ) t(asset_id, width, height, sum_r, sum_g, sum_b)
    """


@query("multimodal_jpeg420_pixel_stats", oracle=_jpeg420_expected_sql)
def multimodal_jpeg420_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHROMA-SUBSAMPLED JPEG decode (4:2:0 — the layout virtually
    every camera/web JPEG uses): {N_REAL_ASSETS} fixtures where Y
    carries 2×2 sampling (four blocks per 16×16 MCU) and Cb/Cr are
    box-averaged to quarter resolution; the decoder's generalized MCU
    walk places each component's blocks under its own sampling
    factors and box-upsamples chroma at reconstruction. Same lazy-
    golden contract and mapInPandas shape as the 4:4:4 twin."""
    from epe_data_wrangling_spark.multimodal.assets import make_jpeg

    rows = [(i, bytearray(make_jpeg(i, subsample=True))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.jpeg_pixel_stats(assets)


@lru_cache(maxsize=1)
def _adpcm_expected_sql() -> str:
    """Lazy golden (ADPCM is stateful — no closed-form oracle exists;
    codec correctness is anchored by the near-lossless roundtrip
    bound in tests/test_multimodal.py: worst abs error 1 over the
    triangle fixtures, encoder and decoder sharing only the public
    IMA tables)."""
    from epe_data_wrangling_spark.multimodal.assets import make_adpcm_wav
    from epe_data_wrangling_spark.multimodal.decode import decode_adpcm_wav

    rows = []
    for aid in range(N_REAL_ASSETS):
        rate, samples = decode_adpcm_wav(make_adpcm_wav(aid))
        rows.append(
            f"({aid}, {rate}, {len(samples)}, "
            f"{sum(s * s for s in samples)}, {max(abs(s) for s in samples)})"
        )
    values = ",\n      ".join(rows)
    return f"""
    SELECT asset_id, CAST(sample_rate AS INTEGER) AS sample_rate,
           CAST(n_samples AS INTEGER) AS n_samples,
           CAST(sum_sq AS BIGINT) AS sum_sq,
           CAST(peak_abs AS INTEGER) AS peak_abs
    FROM (VALUES
      {values}
    ) t(asset_id, sample_rate, n_samples, sum_sq, peak_abs)
    """


@query("multimodal_adpcm_energy", oracle=_adpcm_expected_sql)
def multimodal_adpcm_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-audio decode, hash-checked: {N_REAL_ASSETS}
    actual IMA-ADPCM RIFF/WAVE files (4-bit differential nibbles,
    format tag 0x0011 — the compressed twin of the PCM
    multimodal_wav_energy) decoded by decode.adpcm_energy: chunk
    walk, block header, per-nibble IMA expansion with adaptive step
    index. With PNG/GIF/JPEG this extends 'compressed formats decoded
    for real with zero codec dependencies' to audio."""
    from epe_data_wrangling_spark.multimodal.assets import make_adpcm_wav

    rows = [(i, bytearray(make_adpcm_wav(i))) for i in range(N_REAL_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.adpcm_energy(assets)


from epe_data_wrangling_spark.multimodal.assets import MJPEG_FRAMES  # noqa: E402

MJPEG_ASSETS = 12  #: 12 clips × 4 frames — keeps the lazy golden quick


@lru_cache(maxsize=1)
def _mjpeg_expected_sql() -> str:
    """Lazy golden (per-frame JPEG stats; the container walk and the
    frame == direct-JPEG-decode identity are pinned in pytest)."""
    from epe_data_wrangling_spark.multimodal.assets import make_mjpeg_avi
    from epe_data_wrangling_spark.multimodal.decode import decode_mjpeg_avi

    rows = []
    for aid in range(MJPEG_ASSETS):
        for fidx, w, h, rgb in decode_mjpeg_avi(make_mjpeg_avi(aid)):
            rows.append(
                f"({aid}, {fidx}, {w}, {h}, "
                f"{sum(rgb[0::3])}, {sum(rgb[1::3])}, {sum(rgb[2::3])})"
            )
    values = ",\n      ".join(rows)
    return f"""
    SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b
    FROM (VALUES
      {values}
    ) t(asset_id, frame_idx, width, height, sum_r, sum_g, sum_b)
    """


@query("multimodal_mjpeg_frame_stats", oracle=_mjpeg_expected_sql)
def multimodal_mjpeg_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-video decode, hash-checked: {MJPEG_ASSETS}
    actual RIFF/AVI Motion-JPEG clips ({MJPEG_FRAMES}-frame movi
    lists whose '00dc' chunks are complete 4:2:0 restart-marker
    JPEGs) decoded by decode.mjpeg_frame_stats — recursive LIST walk
    to movi, per-frame JPEG decode. Compressed formats now decode
    for real across ALL THREE media classes with zero codec
    dependencies: images (PNG/GIF/JPEG), audio (IMA ADPCM), video
    (MJPEG-AVI)."""
    from epe_data_wrangling_spark.multimodal.assets import make_mjpeg_avi

    rows = [(i, bytearray(make_mjpeg_avi(i))) for i in range(MJPEG_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.mjpeg_frame_stats(assets)


@query("multimodal_jpeg_progressive_stats", oracle=_jpeg_expected_sql)
def multimodal_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG decode (SOF2 — the multi-scan form most web
    images ship), FULL successive-approximation scheme:
    {N_REAL_ASSETS} eight-scan fixtures (coarse DC at Al=1, three
    spectral-selection AC band scans at Al=1, the DC refinement scan,
    then three AC refinement scans with zero-history run lengths,
    buffered correction bits and EOBn block coverage — T.81 G.1.2.3,
    what libjpeg emits) carry the SAME quantized coefficients as the
    baseline fixtures in a different transmission order — so this
    query's oracle IS the baseline query's golden: the multi-scan
    accumulation must land bit-for-bit on the sequential decode.
    Only arithmetic-coded JPEG remains out of the decoder's
    envelope."""
    from epe_data_wrangling_spark.multimodal.assets import make_progressive_jpeg

    rows = [
        (i, bytearray(make_progressive_jpeg(i, ac_refine=True)))
        for i in range(N_REAL_ASSETS)
    ]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    return decode.jpeg_pixel_stats(assets)


MJPEG_KEY_DELTA = 2.0  #: mean-RGB-luma delta threshold for a keyframe


@lru_cache(maxsize=1)
def _mjpeg_keyframes_sql() -> str:
    """Lazy golden: frame mean-luma (0.299R+0.587G+0.114B over the
    DECODED pixels) and the lag-delta selection computed driver-side
    from the same decode the pytest identity suite anchors."""
    from epe_data_wrangling_spark.multimodal.assets import make_mjpeg_avi
    from epe_data_wrangling_spark.multimodal.decode import decode_mjpeg_avi

    rows = []
    for aid in range(MJPEG_ASSETS):
        prev = None
        for fidx, w, h, rgb in decode_mjpeg_avi(make_mjpeg_avi(aid)):
            n = w * h
            # exact mirror of the Spark expression's association:
            # weighted CHANNEL SUMS (integer-exact), one division
            luma = round(
                (0.299 * sum(rgb[0::3]) + 0.587 * sum(rgb[1::3])
                 + 0.114 * sum(rgb[2::3])) / n,
                6,
            )
            delta = None if prev is None else round(abs(luma - prev), 6)
            if prev is None or delta > MJPEG_KEY_DELTA:
                d = "NULL" if delta is None else repr(delta)
                rows.append(f"({aid}, {fidx}, {luma!r}, {d})")
            prev = luma
    values = ",\n      ".join(rows)
    return f"""
    SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(mean_luma AS DOUBLE) AS mean_luma,
           CAST(luma_delta AS DOUBLE) AS luma_delta
    FROM (VALUES
      {values}
    ) t(asset_id, frame_idx, mean_luma, luma_delta)
    """


@query("multimodal_mjpeg_keyframes", oracle=_mjpeg_keyframes_sql)
def multimodal_mjpeg_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change keyframe selection over the REAL compressed video
    path: MJPEG-AVI clips are decoded frame-by-frame (container walk
    + per-frame JPEG), each frame reduced to a mean luma, and frame 0
    plus any frame whose luma delta vs the previous frame exceeds
    {MJPEG_KEY_DELTA} survives — the decode → feature → select
    composition running on an actual codec rather than raw Y4M
    planes. The lag window partitions per asset over the tiny
    frame-stats table; payload bytes never leave the narrow decode
    pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.multimodal.assets import make_mjpeg_avi

    rows = [(i, bytearray(make_mjpeg_avi(i))) for i in range(MJPEG_ASSETS)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    stats = decode.mjpeg_frame_stats(assets)
    npx = (F.col("width") * F.col("height")).cast("double")
    luma = F.round(
        (
            F.lit(0.299) * F.col("sum_r")
            + F.lit(0.587) * F.col("sum_g")
            + F.lit(0.114) * F.col("sum_b")
        )
        / npx,
        6,
    )
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    d = (
        stats.select("asset_id", "frame_idx", luma.alias("mean_luma"))
        .withColumn("prev_y", F.lag("mean_luma").over(w))
        .withColumn("luma_delta", F.round(F.abs(F.col("mean_luma") - F.col("prev_y")), 6))
    )
    return d.filter(
        F.col("prev_y").isNull() | (F.col("luma_delta") > MJPEG_KEY_DELTA)
    ).select("asset_id", "frame_idx", "mean_luma", "luma_delta")
