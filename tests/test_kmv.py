"""Goldens for sketches.kmv_sketch / kmv_jaccard."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.sketches import (kmv_jaccard,
                                                    kmv_sketch)


def _h(keys, seed=7):
    k = np.asarray(keys, np.uint64)
    return ((k * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911))
            % np.uint64(1 << 32)).astype(np.int64)


def _mk(g, k):
    return pa.table({"g": pa.array(g),
                     "key": pa.array(np.asarray(k, np.int64))})


def test_sketch_naive_parity_layout_invariant(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    k = rng.integers(0, 10 ** 6, n)
    for nb in (1, 6):
        ds = rd.from_arrow(_mk(g, k))
        if nb > 1:
            ds = ds.repartition(nb)
        out = kmv_sketch(ds, "g", "key", k=16, seed=7).to_pandas()
        for grp in "ab":
            exp = np.sort(np.unique(_h(np.unique(k[g == grp]))))[:16]
            got = out[out.g == grp].sort_values("rank")
            assert (got["h"].to_numpy() == exp).all()
            assert list(got["rank"]) == list(range(1, len(exp) + 1))


def test_undersized_group_keeps_all(ray_session):
    ds = rd.from_arrow(_mk(["x"] * 3, [5, 9, 5]))
    out = kmv_sketch(ds, "g", "key", k=64).to_pandas()
    assert len(out) == 2  # distinct keys only


def test_estimate_accuracy():
    # saturated sketch estimates distinct count within ~25% at k=64
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 1 << 30, 30000))
    h = np.sort(np.unique(_h(keys)))
    k = 64
    est = (k - 1) * (1 << 32) / h[k - 1]
    assert abs(est - len(keys)) / len(keys) < 0.25


def test_jaccard_exact_overlap(ray_session):
    # group a = {0..99}, b = {50..149}: true J = 50/150
    g = ["a"] * 100 + ["b"] * 100
    k = list(range(100)) + list(range(50, 150))
    sk = kmv_sketch(rd.from_arrow(_mk(g, k)), "g", "key",
                    k=200).to_pandas()
    tbl = pa.Table.from_pandas(sk[["g", "h"]])
    out = kmv_jaccard(tbl, "g", 200).to_pandas()
    # k >= |union| -> estimator is EXACT
    r = out.iloc[0]
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    assert r["kk"] == 150 and r["inter"] == 50
    assert r["jaccard"] == 50 / 150.0


def test_jaccard_estimator_near_truth(ray_session):
    rng = np.random.default_rng(5)
    base = np.unique(rng.integers(0, 1 << 28, 8000))
    a = base[:6000]
    b = base[2000:8000]  # J = 4000/8000 = 0.5
    g = ["a"] * len(a) + ["b"] * len(b)
    sk = kmv_sketch(rd.from_arrow(_mk(g, np.r_[a, b])), "g", "key",
                    k=256).to_pandas()
    out = kmv_jaccard(pa.Table.from_pandas(sk[["g", "h"]]), "g",
                      256).to_pandas()
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    assert abs(out.iloc[0]["jaccard"] - true_j) < 0.1


def test_rejects(ray_session):
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(rd.from_arrow(_mk(["a"], [1])), "g", "key", k=0)
    big = _mk(["a"], [1 << 31])
    with pytest.raises(Exception, match="2\\^31"):
        kmv_sketch(rd.from_arrow(big), "g", "key").materialize()
