"""Goldens for text.compression_ratio (zlib redundancy signal)."""
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.text import compression_ratio


def test_exact_values_and_ordering(ray_session):
    rep = "spam ham " * 300
    prose = ("the quick brown fox jumps over the lazy dog while "
             "seventeen zebras argue about parquet compression "
             "levels in a surprisingly eloquent committee meeting")
    rng = np.random.default_rng(7)
    rnd = "".join(chr(c) for c in rng.integers(33, 123, 800))
    t = pa.table({"doc_id": [1, 2, 3], "text": [rep, prose, rnd]})
    out = compression_ratio(rd.from_arrow(t), "text", "doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate([rep, prose, rnd]):
        assert out["raw_bytes"][i] == len(s.encode())
        assert out["comp_bytes"][i] == len(
            zlib.compress(s.encode(), 6))
        assert out["ratio"][i] == out["comp_bytes"][i] / \
            out["raw_bytes"][i]
    # redundancy ordering: repetitive << prose < near-random
    assert out["ratio"][0] < 0.1 < out["ratio"][1] < out["ratio"][2]


def test_empty_null_and_keep_cols(ray_session):
    t = pa.table({"doc_id": [1, 2], "src": ["a", "b"],
                  "text": ["", None]})
    out = compression_ratio(rd.from_arrow(t), "text", "doc_id",
                            keep_cols=["src"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["src"]) == ["a", "b"]
    assert out["raw_bytes"][0] == 0 and np.isnan(out["ratio"][0])
    assert np.isnan(out["raw_bytes"][1])


def test_unicode_bytes_not_chars(ray_session):
    s = "héllo wörld ünïcode"
    t = pa.table({"doc_id": [1], "text": [s]})
    out = compression_ratio(rd.from_arrow(t), "text",
                            "doc_id").to_pandas()
    assert out["raw_bytes"][0] == len(s.encode("utf-8")) > len(s)
