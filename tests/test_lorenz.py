"""Goldens for groupstats.lorenz_deciles."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import lorenz_deciles


def _mk(g, v, i):
    return pa.table({"g": pa.array(g),
                     "v": pa.array(np.asarray(v, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def test_naive_parity_and_monotone(ray_session):
    rng = np.random.default_rng(3)
    n = 500
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    v = rng.integers(0, 1000, n)
    i = rng.permutation(n)
    out = lorenz_deciles(rd.from_arrow(_mk(g, v, i)).repartition(4),
                         "g", "v", id_col="id").to_pandas()
    for grp in "abc":
        m = g == grp
        sv = np.sort(v[m])
        cum = np.cumsum(sv)
        sub = out[out.g == grp].sort_values("k")
        assert len(sub) == 10
        for _, r in sub.iterrows():
            pos = -(-int(r["k"]) * len(sv) // 10)
            assert r["pos"] == pos
            assert r["cum"] == int(cum[pos - 1])
            assert r["total"] == int(cum[-1])
            assert r["share"] == r["cum"] / float(r["total"])
        sh = sub["share"].to_numpy()
        assert (np.diff(sh) >= 0).all() and sh[-1] == 1.0
        # Lorenz curve sits below the diagonal (concentration)
        assert (sh[:-1] <= sub["k"].to_numpy()[:-1] / 10 + 1e-12).all()


def test_equal_values_hit_diagonal(ray_session):
    out = lorenz_deciles(
        rd.from_arrow(_mk(["g"] * 100, [7] * 100, range(100))),
        "g", "v", id_col="id").to_pandas().sort_values("k")
    assert np.allclose(out["share"], np.arange(1, 11) / 10)


def test_rejects(ray_session):
    t = _mk(["g"], [-1], [1])
    with pytest.raises(Exception, match="non-negative"):
        lorenz_deciles(rd.from_arrow(t), "g", "v",
                       id_col="id").materialize()
    with pytest.raises(ValueError, match="n_points"):
        lorenz_deciles(rd.from_arrow(t), "g", "v", id_col="id",
                       n_points=1)
