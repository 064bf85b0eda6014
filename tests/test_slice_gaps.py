"""Goldens for groupstats.slice_gaps."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import slice_gaps


def test_planted_hot_slice_ranks_first(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    d1 = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    d2 = np.array(["x", "y"])[rng.integers(0, 2, n)]
    v = rng.integers(0, 100, n)
    v = v + np.where(d1 == "c", 500, 0)      # hot slice
    t = pa.table({"d1": pa.array(d1), "d2": pa.array(d2),
                  "v": pa.array(v.astype(np.int64))})
    out = slice_gaps(rd.from_arrow(t).repartition(4), ["d1", "d2"],
                     "v").to_pandas()
    top = out.loc[out["score"].abs().idxmax()]
    assert (top["dim"], top["val"]) == ("d1", "c")
    # exact witnesses
    for _, r in out.iterrows():
        m = (d1 == r["val"]) if r["dim"] == "d1" else (d2 == r["val"])
        assert r["n"] == int(m.sum())
        assert r["s"] == int(v[m].sum())
        assert r["mean"] == r["s"] / r["n"]
    N, S = len(v), int(v.sum())
    r0 = out.iloc[0]
    assert r0["gap"] == r0["s"] / r0["n"] - S / N
    assert r0["score"] == r0["gap"] * np.sqrt(float(r0["n"]))


def test_rejects(ray_session):
    t = pa.table({"d": ["a"], "v": pa.array([0.5])})
    with pytest.raises(ValueError, match="dimension"):
        slice_gaps(rd.from_arrow(t), [], "v")
    with pytest.raises(Exception, match="integer-valued"):
        slice_gaps(rd.from_arrow(t), ["d"], "v")
