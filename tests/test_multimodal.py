"""Multimodal plumbing: binary payload synthesis, Arrow-batched decode/
feature extraction (stubbed decoder), resize geometry."""

from __future__ import annotations

from biosample_enricher_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_stub,
    synth_media_assets,
)
from biosample_enricher_spark.synth import GenParams, gen_asset_catalog


def test_feature_extraction_shapes_and_determinism(spark):
    cat = gen_asset_catalog(spark, GenParams(seed=9, n_assets=50))
    assets = synth_media_assets(cat)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.decode_ok
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # deterministic across recomputation
    again = {r.media_ref: r.feature for r in extract_features(assets).collect()}
    for r in rows:
        assert again[r.media_ref] == r.feature


def test_decode_failure_path(spark):
    bad = spark.createDataFrame(
        [("asset-x", "image", b"", 10, 10, None)],
        "media_ref string, media_kind string, payload binary, "
        "width int, height int, duration_ms int",
    )
    row = extract_features(bad).first()
    assert row.decode_ok is False and row.feature is None


def test_resize_geometry(spark):
    cat = gen_asset_catalog(spark, GenParams(seed=9, n_assets=200))
    assets = resize_stub(synth_media_assets(cat), max_side=256)
    for r in assets.where("media_kind = 'image'").collect():
        assert max(r.resized_width, r.resized_height) <= 256
        # aspect ratio preserved within rounding
        if r.width >= r.height:
            assert r.resized_width >= r.resized_height
        else:
            assert r.resized_height >= r.resized_width
        # never upscale
        assert r.resized_width <= r.width and r.resized_height <= r.height


def test_frame_windows_fanout_and_clamp(spark):
    """frame_windows: ceil(duration/step) rows per asset, tail window
    clamped, zero/null durations emit nothing."""
    from pyspark.sql import functions as F

    from biosample_enricher_spark.operators.multimodal import frame_windows

    rows = [("a", 12000), ("b", 5000), ("c", 4999), ("d", 0), ("e", None), ("f", 1)]
    df = spark.createDataFrame(rows, "media_ref string, duration_ms long")
    got = {}
    for r in frame_windows(df, every_ms=5000).collect():
        got.setdefault(r.media_ref, []).append(
            (r.frame_idx, r.t_start_ms, r.t_end_ms)
        )
    assert got == {
        "a": [(0, 0, 5000), (1, 5000, 10000), (2, 10000, 12000)],
        "b": [(0, 0, 5000)],
        "c": [(0, 0, 4999)],
        "f": [(0, 0, 1)],
    }
