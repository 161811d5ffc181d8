"""Multimodal asset plumbing: binary columns + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct (schemas.ASSETS). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual media
decode is STUBBED (this container ships no image/audio libs): decode_asset
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake feature vector derived from the bytes is produced so the
distributed plumbing can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fake_features(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: n floats from sha256."""
    h = hashlib.sha256(content).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def decode_asset(content: bytes, modality: str, fake: bool = False) -> list[float]:
    """STUB: real decode needs PIL/librosa/ffmpeg — not in this image."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "container; pass fake=True for the deterministic test double"
        )
    return _fake_features(content or b"")


def extract_features(assets: DataFrame, n_features: int = 8, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary content: batched, Arrow-
    transferred, one output row per asset with array<double> features.
    The batch shape (iterator of pandas DataFrames) is exactly what a real
    GPU-decode stage would consume."""
    out_schema = "asset_id long, modality string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_asset(c, m, fake=fake)[:n_features]
                for c, m in zip(pdf["content"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "modality": pdf["modality"], "features": feats}
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(run, out_schema)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    from metadata only (no decode) — pure column expressions, so planning a
    10^9-video sample costs one narrow map."""
    return assets.filter(F.col("modality") == "video").select(
        "asset_id",
        F.expr(f"sequence(0, coalesce(meta.duration_ms, 0), {every_ms})").alias("frame_ts_ms"),
    )


def gen_assets(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic assets for tests."""
    rows = []
    mods = ("image", "audio", "video")
    for i in range(n):
        m = mods[i % 3]
        content = (f"asset-{i}-" + "x" * (i % 17)).encode()
        meta = {
            "width": 640 if m == "image" else None,
            "height": 480 if m == "image" else None,
            "duration_ms": 3000 + i * 10 if m != "image" else None,
            "sample_rate": 16000 if m == "audio" else None,
        }
        rows.append((i, f"https://example.org/a/{i}", m, content, f"{m}/x-test", meta))
    from .. import schemas

    return spark.createDataFrame(rows, schema=schemas.ASSETS)
