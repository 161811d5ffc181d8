"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, stubbed real decode, frame-sampling plan."""

import pytest
from pyspark.sql import functions as F

from rdf_i2b2_converter_spark.operators.multimodal import (
    decode_asset,
    extract_features,
    frame_sample_plan,
    gen_assets,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_asset(b"bytes", "image")


def test_fake_features_deterministic():
    a = decode_asset(b"same bytes", "image", fake=True)
    b = decode_asset(b"same bytes", "audio", fake=True)
    assert a == b and len(a) == 8
    assert decode_asset(b"other", "image", fake=True) != a


def test_extract_features_distributed(spark):
    assets = gen_assets(spark, 60)
    feats = extract_features(assets, n_features=8)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic across partitionings
    f2 = {r["asset_id"]: r["features"] for r in extract_features(assets.repartition(7)).collect()}
    f1 = {r["asset_id"]: r["features"] for r in rows}
    assert f1 == f2


def test_frame_sample_plan(spark):
    assets = gen_assets(spark, 30)
    plan = frame_sample_plan(assets, every_ms=1000)
    rows = plan.collect()
    assert rows and all(r["frame_ts_ms"][0] == 0 for r in rows)
    one = rows[0]
    dur = assets.filter(F.col("asset_id") == one["asset_id"]).collect()[0]["meta"]["duration_ms"]
    assert one["frame_ts_ms"][-1] <= dur
