"""Goldens for groupstats.ks_test_by_group."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import ks_test_by_group


def _mk(g, v, a):
    return pa.table({"g": pa.array(g),
                     "v": pa.array(np.asarray(v, np.int64)),
                     "arm": pa.array(np.asarray(a, np.int64))})


def _naive(v0, v1):
    uv = np.unique(np.r_[v0, v1])
    f0 = np.searchsorted(np.sort(v0), uv, side="right")
    f1 = np.searchsorted(np.sort(v1), uv, side="right")
    n0, n1 = len(v0), len(v1)
    d_num = int(np.abs(f0 * n1 - f1 * n0).max())
    return n0, n1, d_num


def test_naive_parity_fuzz_layout_invariant(ray_session):
    rng = np.random.default_rng(37)
    n = 3000
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    a = rng.integers(0, 2, n)
    # arm-1 of group b is shifted -> big D there
    v = rng.integers(0, 60, n) + np.where((g == "b") & (a == 1),
                                          25, 0)
    exp = {}
    for grp in "abc":
        m = g == grp
        exp[grp] = _naive(v[m & (a == 0)], v[m & (a == 1)])
    for nb in (1, 5):
        ds = rd.from_arrow(_mk(g, v, a))
        if nb > 1:
            ds = ds.repartition(nb)
        out = ks_test_by_group(ds, "g", "v", "arm").to_pandas() \
            .sort_values("g").reset_index(drop=True)
        for _, r in out.iterrows():
            n0, n1, dn = exp[r["g"]]
            assert (r["n0"], r["n1"], r["d_num"]) == (n0, n1, dn)
            assert r["d"] == dn / (float(n0) * float(n1))
    # the shifted group's D dominates
    d = out.set_index("g")["d"]
    assert d["b"] > 2 * max(d["a"], d["c"])
    # p-values: shifted group ~0, same-dist groups not significant
    p = out.set_index("g")["p"]
    assert p["b"] < 1e-6 and p["a"] > 0.01 and p["c"] > 0.01


def test_identical_arms_d_zero(ray_session):
    v = np.arange(50)
    t = _mk(["x"] * 100, np.r_[v, v], np.r_[np.zeros(50, int),
                                            np.ones(50, int)])
    out = ks_test_by_group(rd.from_arrow(t), "g", "v",
                           "arm").to_pandas()
    assert out.iloc[0]["d_num"] == 0 and out.iloc[0]["d"] == 0.0
    assert out.iloc[0]["p"] == 2.0  # degenerate Smirnov approx cap


def test_empty_arm_nulls(ray_session):
    t = _mk(["x"] * 4, [1, 2, 3, 4], [0, 0, 0, 0])
    out = ks_test_by_group(rd.from_arrow(t), "g", "v",
                           "arm").to_pandas()
    r = out.iloc[0]
    assert r["n0"] == 4 and r["n1"] == 0
    assert pd.isna(r["d_num"]) and pd.isna(r["d"]) and pd.isna(r["p"])


def test_rejects(ray_session):
    t = pa.table({"g": ["x"], "v": pa.array([0.5]),
                  "arm": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        ks_test_by_group(rd.from_arrow(t), "g", "v",
                         "arm").materialize()
    t2 = _mk(["x"], [1], [2])
    with pytest.raises(Exception, match="0/1"):
        ks_test_by_group(rd.from_arrow(t2), "g", "v",
                         "arm").materialize()
