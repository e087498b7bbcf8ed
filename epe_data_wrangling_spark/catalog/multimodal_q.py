"""Multimodal suite: binary payload columns + Arrow-batched decode
operators (north star; the reference has no media handling).

The decode step is a deterministic md5-derived fake (real codecs are
absent here — see ``multimodal.decode.require_real_decoders``), which
is precisely what makes these Python mapInPandas operators fully
oracle-checkable: DuckDB reproduces the fake decode hex-digit-for-
hex-digit from md5/hex/octet_length.
"""

from __future__ import annotations

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
