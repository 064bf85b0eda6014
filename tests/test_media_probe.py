"""Goldens for multimodal.probe_media / probe_media_batch +
dedup.plan_minhash_bands."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.dedup import plan_minhash_bands
from feature_extraction_ray.stages.multimodal import (encode_bmp,
                                                      encode_png,
                                                      encode_wav,
                                                      probe_media,
                                                      probe_media_batch)


def test_probe_bmp_png_wav_and_junk():
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    b = probe_media(encode_bmp(img))
    assert (b["format"], b["width"], b["height"]) == ("bmp", 5, 4)
    p = probe_media(encode_png(img))
    assert (p["format"], p["width"], p["height"]) == ("png", 5, 4)
    w = probe_media(encode_wav(np.zeros(100, np.int16), 8000))
    assert (w["format"], w["rate"], w["n_frames"]) == ("wav", 8000,
                                                       100)
    assert probe_media(b"garbage")["format"] == "unknown"
    assert probe_media(b"")["format"] == "unknown"


def test_probe_jpeg():
    from feature_extraction_ray.stages.jpeg import encode_jpeg
    img = (np.arange(16 * 8 * 3) % 255).astype(np.uint8) \
        .reshape(16, 8, 3)
    j = probe_media(encode_jpeg(img))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 8, 16)


def test_probe_batch(ray_session):
    img = np.zeros((2, 3, 3), np.uint8)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([encode_bmp(img), b"xx"],
                                      pa.binary())})
    out = probe_media_batch(rd.from_arrow(t)).to_pandas() \
        .sort_values("media_id")
    assert list(out["format"]) == ["bmp", "unknown"]
    assert out.iloc[0]["width"] == 3


def test_band_planner_midpoints_and_rejects():
    for t in (0.3, 0.5, 0.7, 0.9):
        plan = plan_minhash_bands(t, 128)
        assert plan["bands"] * plan["rows_per_band"] == 128
        # S-curve midpoint lands near the requested threshold
        assert abs(plan["threshold_50"] - t) < 0.17
    # monotone: higher threshold -> fewer bands
    b = [plan_minhash_bands(t, 128)["bands"]
         for t in (0.3, 0.5, 0.7, 0.9)]
    assert b == sorted(b, reverse=True)
    with pytest.raises(ValueError):
        plan_minhash_bands(1.5)
    with pytest.raises(ValueError):
        plan_minhash_bands(0.5, 1)
