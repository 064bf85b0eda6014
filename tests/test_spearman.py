"""Goldens for groupstats.spearman_by_group."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import spearman_by_group


def _mk(g, x, y):
    return pa.table({"g": pa.array(g),
                     "x": pa.array(np.asarray(x, np.int64)),
                     "y": pa.array(np.asarray(y, np.int64))})


def test_scipy_free_parity_with_ties(ray_session):
    rng = np.random.default_rng(3)
    n = 400
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    x = rng.integers(0, 20, n)       # heavy ties
    y = x * 3 + rng.integers(0, 15, n)
    out = spearman_by_group(rd.from_arrow(_mk(g, x, y))
                            .repartition(4), "g", "x",
                            "y").to_pandas().set_index("g")
    for grp in "ab":
        m = g == grp
        rx = pd.Series(x[m]).rank().to_numpy()
        ry = pd.Series(y[m]).rank().to_numpy()
        exp = np.corrcoef(rx, ry)[0, 1]
        assert abs(out.loc[grp, "rho"] - exp) < 1e-12
        assert out.loc[grp, "rho"] > 0.8  # strong monotone relation


def test_perfect_monotone_and_antitone(ray_session):
    x = np.arange(50)
    out = spearman_by_group(
        rd.from_arrow(_mk(["u"] * 50, x, x * x)), "g", "x",
        "y").to_pandas()
    # two-sqrt wobble: fl(sqrt(v)*sqrt(v)) != v (the corr_matrix
    # diagonal convention — matched exactly by the SQL twin)
    assert abs(out.iloc[0]["rho"] - 1.0) < 1e-15
    out2 = spearman_by_group(
        rd.from_arrow(_mk(["u"] * 50, x, -x)), "g", "x",
        "y").to_pandas()
    assert abs(out2.iloc[0]["rho"] + 1.0) < 1e-15


def test_constant_side_null(ray_session):
    out = spearman_by_group(
        rd.from_arrow(_mk(["u"] * 5, [7] * 5, [1, 2, 3, 4, 5])),
        "g", "x", "y").to_pandas()
    assert pd.isna(out.iloc[0]["rho"])


def test_rejects(ray_session):
    t = pa.table({"g": ["u"], "x": pa.array([0.5]),
                  "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        spearman_by_group(rd.from_arrow(t), "g", "x",
                          "y").materialize()
