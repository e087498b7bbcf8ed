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
