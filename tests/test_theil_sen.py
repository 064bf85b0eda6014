"""Goldens for groupstats.theil_sen_by_group."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import theil_sen_by_group


def _mk(g, x, y, i):
    return pa.table({"g": pa.array(g),
                     "x": pa.array(np.asarray(x, np.int64)),
                     "y": pa.array(np.asarray(y, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def _naive(x, y):
    sl = []
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            if x[j] != x[i]:
                sl.append((y[j] - y[i]) / (x[j] - x[i]))
    if not sl:
        return 0, None
    sl.sort()
    idx = max(1, -(-len(sl) // 2))
    return len(sl), sl[idx - 1]


def test_naive_parity_layouts(ray_session):
    rng = np.random.default_rng(3)
    n = 120
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    x = rng.integers(0, 40, n)
    y = rng.integers(-100, 100, n)
    i = rng.permutation(n)
    for nb in (1, 4):
        ds = rd.from_arrow(_mk(g, x, y, i))
        if nb > 1:
            ds = ds.repartition(nb)
        out = theil_sen_by_group(ds, "g", "x", "y",
                                 id_col="id").to_pandas() \
            .sort_values("g").reset_index(drop=True)
        for _, r in out.iterrows():
            m = g == r["g"]
            np_, sl = _naive(x[m].tolist(), y[m].tolist())
            assert r["n_pairs"] == np_
            assert r["slope"] == sl


def test_outlier_robustness(ray_session):
    # clean slope 3 with 20% wild outliers: TS recovers ~3, OLS won't
    rng = np.random.default_rng(9)
    x = np.arange(100)
    y = 3 * x + rng.integers(-2, 3, 100)
    y[::5] += 10000
    ds = rd.from_arrow(_mk(["g"] * 100, x, y, np.arange(100)))
    out = theil_sen_by_group(ds, "g", "x", "y",
                             id_col="id").to_pandas()
    assert abs(out.iloc[0]["slope"] - 3.0) < 0.5


def test_constant_x_null_slope(ray_session):
    ds = rd.from_arrow(_mk(["g"] * 3, [5, 5, 5], [1, 2, 3],
                           [1, 2, 3]))
    out = theil_sen_by_group(ds, "g", "x", "y",
                             id_col="id").to_pandas()
    assert out.iloc[0]["n_pairs"] == 0
    assert pd.isna(out.iloc[0]["slope"])


def test_rejects(ray_session):
    ds = rd.from_arrow(_mk(["g"] * 3, [1, 2, 3], [1, 2, 3],
                           [1, 2, 3]))
    with pytest.raises(Exception, match="max_group_rows"):
        theil_sen_by_group(ds, "g", "x", "y", id_col="id",
                           max_group_rows=2).materialize()
    tf = pa.table({"g": ["g"], "x": pa.array([0.5]),
                   "y": pa.array([1], pa.int64()),
                   "id": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        theil_sen_by_group(rd.from_arrow(tf), "g", "x", "y",
                           id_col="id").materialize()
