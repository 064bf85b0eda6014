"""Hashed feature crosses (stages/features.hashed_cross_features)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.features import hashed_cross_features


def _bucket(a, b, d, seed=1):
    return ((a % (1 << 20)) * 2654435761
            + (b % (1 << 20)) * 2246822519
            + seed * 1315423911) % (1 << 32) % d


def test_cross_naive_parity_and_nulls():
    rng = np.random.default_rng(31)
    a = rng.integers(0, 10**9, size=300).tolist()
    b = rng.integers(0, 10**9, size=300).tolist()
    ds = rd.from_arrow(pa.table({
        "a": pa.array(a + [None, 5], type=pa.int64()),
        "b": pa.array(b + [7, None], type=pa.int64())}))
    out = hashed_cross_features(ds, "a", "b", n_features=97,
                                seed=3).to_pandas()
    for i in range(300):
        assert out["a_x_b"].iloc[i] == _bucket(a[i], b[i], 97, seed=3)
    assert out["a_x_b"].iloc[300] is None or \
        np.isnan(out["a_x_b"].iloc[300])
    assert out["a_x_b"].iloc[301] is None or \
        np.isnan(out["a_x_b"].iloc[301])


def test_cross_asymmetry_and_reject():
    # (a,b) and (b,a) land in different buckets (two multipliers)
    ds = rd.from_arrow(pa.table({"a": pa.array([3], type=pa.int64()),
                                 "b": pa.array([9], type=pa.int64())}))
    x = hashed_cross_features(ds, "a", "b", n_features=1 << 16) \
        .take_all()[0]["a_x_b"]
    y = hashed_cross_features(ds, "b", "a", n_features=1 << 16,
                              out_col="a_x_b").take_all()[0]["a_x_b"]
    assert x != y
    with pytest.raises(ValueError, match="n_features"):
        hashed_cross_features(ds, "a", "b", n_features=0)
