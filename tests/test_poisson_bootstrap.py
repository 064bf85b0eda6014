"""Goldens for groupstats.poisson_bootstrap."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import (_POISSON1_T32,
                                                      poisson_bootstrap)


def _w(ids, b, seed):
    ids = np.asarray(ids, np.uint64) % np.uint64(1 << 20)
    mult = np.uint64(2654435761) + np.uint64(2630847822) * np.uint64(b)
    h = (ids * mult + np.uint64(seed) * np.uint64(1315423911)) \
        % np.uint64(1 << 32)
    return np.searchsorted(_POISSON1_T32, h, side="right")


def _mk(g, i, v):
    return pa.table({"g": pa.array(g),
                     "id": pa.array(np.asarray(i, np.int64)),
                     "v": pa.array(np.asarray(v, np.int64))})


def test_naive_parity_layout_invariant(ray_session):
    rng = np.random.default_rng(41)
    n = 600
    g = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    ids = rng.permutation(10 ** 6)[:n]
    v = rng.integers(-500, 500, n)
    exp = {}
    for b in range(8):
        w = _w(ids, b, 7)
        for grp in "xyz":
            m = g == grp
            exp[(grp, b)] = (int(w[m].sum()),
                             int((w[m] * v[m]).sum()))
    for nb in (1, 6):
        ds = rd.from_arrow(_mk(g, ids, v))
        if nb > 1:
            ds = ds.repartition(nb)
        out = poisson_bootstrap(ds, "g", "v", id_col="id",
                                n_boot=8, seed=7).to_pandas()
        assert len(out) == 24
        for _, r in out.iterrows():
            n_eff, s = exp[(r["g"], r["b"])]
            assert (r["n_eff"], r["s"]) == (n_eff, s)
            if n_eff > 0:
                assert r["mean"] == s / n_eff
            else:
                assert pd.isna(r["mean"])


def test_weights_distribution_poisson1():
    # mean weight ~ 1, Var ~ 1, weights within 0..8
    ids = np.arange(200000)
    w = _w(ids, 3, 11)
    assert 0 <= w.min() and w.max() <= 8
    assert abs(w.mean() - 1.0) < 0.01
    assert abs(w.var() - 1.0) < 0.02
    # resamples are decorrelated across b (multiplicative family)
    w2 = _w(ids, 4, 11)
    c = np.corrcoef(w, w2)[0, 1]
    assert abs(c) < 0.02


def test_bootstrap_ci_covers_truth(ray_session):
    rng = np.random.default_rng(9)
    v = rng.integers(0, 1000, 5000)
    ds = rd.from_arrow(_mk(["a"] * 5000, np.arange(5000), v))
    out = poisson_bootstrap(ds, "g", "v", id_col="id",
                            n_boot=32, seed=2).to_pandas()
    means = out["mean"].to_numpy()
    assert len(means) == 32
    lo, hi = np.percentile(means, [2.5, 97.5])
    assert lo <= v.mean() <= hi
    # spread consistent with sqrt(n) scaling (loose sanity band)
    se = v.std() / np.sqrt(5000)
    assert 0.3 * se < means.std() < 3.0 * se


def test_rejects(ray_session):
    t = pa.table({"g": ["a"], "id": pa.array([1], pa.int64()),
                  "v": pa.array([0.5])})
    with pytest.raises(Exception, match="integer-valued"):
        poisson_bootstrap(rd.from_arrow(t), "g", "v",
                          id_col="id").materialize()
    t2 = _mk(["a"], [1], [1])
    with pytest.raises(ValueError, match="n_boot"):
        poisson_bootstrap(rd.from_arrow(t2), "g", "v", id_col="id",
                          n_boot=0)
