"""Goldens for groupstats.diff_in_diff."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import diff_in_diff


def _mk(a, p, v):
    return pa.table({"arm": pa.array(np.asarray(a, np.int64)),
                     "period": pa.array(np.asarray(p, np.int64)),
                     "v": pa.array(np.asarray(v, np.int64))})


def test_planted_effect_recovered(ray_session):
    rng = np.random.default_rng(3)
    n = 4000
    a = rng.integers(0, 2, n)
    p = rng.integers(0, 2, n)
    base = rng.integers(0, 100, n)
    # common trend +50 in period 1, treatment effect +30 on (1,1)
    v = base + 50 * p + 30 * (a * p)
    out = diff_in_diff(rd.from_arrow(_mk(a, p, v)).repartition(4),
                       "arm", "period", "v").to_pandas().iloc[0]
    exp = {}
    for aa in (0, 1):
        for pp in (0, 1):
            m = (a == aa) & (p == pp)
            exp[(aa, pp)] = (int(m.sum()), int(v[m].sum()))
    for aa in (0, 1):
        for pp in (0, 1):
            assert out[f"n{aa}{pp}"] == exp[(aa, pp)][0]
            assert out[f"s{aa}{pp}"] == exp[(aa, pp)][1]
            assert out[f"m{aa}{pp}"] == \
                exp[(aa, pp)][1] / exp[(aa, pp)][0]
    # noise cancels in expectation: estimate near +30
    assert abs(out["did"] - 30) < 5
    assert out["did"] == (out["m11"] - out["m10"]) \
        - (out["m01"] - out["m00"])


def test_empty_cell_nulls(ray_session):
    out = diff_in_diff(rd.from_arrow(_mk([0, 0, 1], [0, 1, 0],
                                         [1, 2, 3])),
                       "arm", "period", "v").to_pandas().iloc[0]
    assert out["n11"] == 0
    assert pd.isna(out["m11"]) and pd.isna(out["did"])


def test_rejects(ray_session):
    with pytest.raises(Exception, match="0/1"):
        diff_in_diff(rd.from_arrow(_mk([2], [0], [1])), "arm",
                     "period", "v").to_pandas()
    tf = pa.table({"arm": pa.array([0], pa.int64()),
                   "period": pa.array([0], pa.int64()),
                   "v": pa.array([0.5])})
    with pytest.raises(Exception, match="integer-valued"):
        diff_in_diff(rd.from_arrow(tf), "arm", "period", "v")
