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


def test_wav_decode_real(spark):
    """Native stdlib WAV PCM decode: known constant + square-wave signals."""
    from rdf_i2b2_converter_spark.operators.multimodal import decode_wav, encode_wav

    # constant half-scale signal: mean == rms == peak == 0.5
    wav = encode_wav([16384] * 800, sample_rate=8000)
    sr, ch, bits, dur_ms, n_frames, mean, rms, peak = decode_wav(wav)
    assert (sr, ch, bits, n_frames) == (8000.0, 1.0, 16.0, 800.0)
    assert dur_ms == 100.0
    assert abs(mean - 0.5) < 1e-9 and abs(rms - 0.5) < 1e-9 and abs(peak - 0.5) < 1e-9

    # square wave: mean 0, rms == peak
    sq = encode_wav([16384, -16384] * 400, sample_rate=16000, n_channels=2)
    _, ch2, _, dur2, frames2, mean2, rms2, peak2 = decode_wav(sq)
    assert ch2 == 2.0 and frames2 == 400.0
    assert abs(mean2) < 1e-9 and abs(rms2 - peak2) < 1e-9


def test_bmp_decode_real(spark):
    from rdf_i2b2_converter_spark.operators.multimodal import decode_bmp, encode_bmp

    # solid color 5x3 (odd width exercises row padding)
    px = [[(255, 0, 102)] * 5 for _ in range(3)]
    w, h, bpp, r, g, b, luma, n = decode_bmp(encode_bmp(px))
    assert (w, h, bpp, n) == (5.0, 3.0, 24.0, 15.0)
    assert abs(r - 1.0) < 1e-9 and abs(g) < 1e-9 and abs(b - 0.4) < 1e-9
    assert abs(luma - (0.299 + 0.114 * 0.4)) < 1e-9


def test_decode_asset_dispatch_and_stub(spark):
    from rdf_i2b2_converter_spark.operators.multimodal import (
        decode_asset, encode_bmp, encode_wav,
    )

    assert decode_asset(encode_wav([0] * 10), "audio")[0] == 16000.0
    assert decode_asset(encode_bmp([[(1, 2, 3)]]), "image")[0] == 1.0
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_asset(b"\x89PNG....", "image")  # real codec still stubbed
    assert len(decode_asset(b"\x89PNG....", "image", fake=True)) == 8


def test_extract_features_mixed_real_and_fake(spark):
    """End-to-end mapInPandas over assets where some payloads hit the REAL
    decoders (magic-sniffed) and the rest the deterministic double."""
    from rdf_i2b2_converter_spark.operators.multimodal import (
        decode_asset, extract_features, gen_assets,
    )

    assets = gen_assets(spark, 36)
    feats = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    raw = {r["asset_id"]: bytes(r["content"]) for r in assets.collect()}
    assert len(feats) == 36
    for i, content in raw.items():
        assert feats[i] == decode_asset(content, "any", fake=True)[:8]
    # at least one real wav (sample_rate slot) and one real bmp (bpp slot)
    assert any(f[0] == 16000.0 for f in feats.values())
    assert any(f[2] == 24.0 for f in feats.values())


def test_decode_asset_fake_is_total(spark):
    """Review r2: fake=True must NEVER raise — a magic-colliding or
    unsupported-variant payload falls back to the deterministic double;
    fake=False still surfaces the ValueError."""
    import pytest as _pytest

    from rdf_i2b2_converter_spark.operators.multimodal import decode_asset

    corrupt_bmp = b"BM" + b"\x00" * 10          # too short / malformed
    float_wav = (b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE"
                 + b"fmt " + b"\x10\x00\x00\x00"
                 + b"\x03\x00\x01\x00" + b"\x80\x3e\x00\x00" + b"\x00\x7d\x00\x00"
                 + b"\x04\x00\x20\x00"
                 + b"data" + b"\x00\x00\x00\x00")  # IEEE float, unsupported
    for payload in (corrupt_bmp, float_wav):
        assert len(decode_asset(payload, "x", fake=True)) == 8
        with _pytest.raises(ValueError):
            decode_asset(payload, "x")
