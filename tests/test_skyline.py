"""Goldens for relational.skyline (Pareto front)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.relational import (_local_skyline,
                                                      skyline)


def _naive(m):
    out = set()
    for i in range(len(m)):
        dom = False
        for j in range(len(m)):
            if i != j and all(m[j][k] >= m[i][k]
                              for k in range(len(m[i]))) \
                    and any(m[j][k] > m[i][k]
                            for k in range(len(m[i]))):
                dom = True
                break
        if not dom:
            out.add(tuple(m[i]))
    return out


def test_2d_naive_parity_fuzz(ray_session):
    rng = np.random.default_rng(3)
    m = rng.integers(0, 30, size=(400, 2))
    exp = _naive(m.tolist())
    for nb in (1, 5):
        t = pa.table({"x": pa.array(m[:, 0].astype(np.int64)),
                      "y": pa.array(m[:, 1].astype(np.int64))})
        ds = rd.from_arrow(t)
        if nb > 1:
            ds = ds.repartition(nb)
        out = skyline(ds, ["x", "y"]).to_pandas()
        got = set(zip(out["x"], out["y"]))
        assert got == exp


def test_3d_naive_parity(ray_session):
    rng = np.random.default_rng(7)
    m = rng.integers(0, 12, size=(200, 3))
    exp = _naive(m.tolist())
    t = pa.table({c: pa.array(m[:, i].astype(np.int64))
                  for i, c in enumerate("xyz")})
    out = skyline(rd.from_arrow(t).repartition(3),
                  ["x", "y", "z"]).to_pandas()
    got = set(zip(out["x"], out["y"], out["z"]))
    assert got == exp


def test_local_skyline_dedups_and_ties():
    m = np.array([[5, 5], [5, 5], [5, 4], [4, 5], [6, 1], [1, 6]])
    keep = _local_skyline(m)
    pts = {tuple(r) for r in m[keep]}
    assert pts == {(5, 5), (6, 1), (1, 6)}
    assert len(keep) == 3  # exact duplicate dropped


def test_keep_duplicates_returns_all_rows(ray_session):
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "x": pa.array([9, 9, 1, 9], pa.int64()),
                  "y": pa.array([9, 9, 1, 8], pa.int64())})
    out = skyline(rd.from_arrow(t), ["x", "y"],
                  keep_duplicates=True).to_pandas()
    assert sorted(out["id"]) == [1, 2]


def test_rejects(ray_session):
    t = pa.table({"x": pa.array([0.5]), "y": pa.array([1],
                                                     pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        skyline(rd.from_arrow(t), ["x", "y"])
    with pytest.raises(ValueError, match="at least one"):
        skyline(rd.from_arrow(t), [])
