"""Goldens for evalmetrics.conformal_intervals."""
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import conformal_intervals


def _cal_mask(ids, calib_mod=5, seed=3):
    ids = np.asarray(ids, np.uint64)
    h = ((ids % np.uint64(1 << 20)) * np.uint64(2654435761)
         + np.uint64(seed) * np.uint64(1315423911)) % np.uint64(1 << 32)
    return (h % np.uint64(calib_mod)) == 0


def _mk(i, s, y):
    return pa.table({"id": pa.array(np.asarray(i, np.int64)),
                     "s": pa.array(np.asarray(s, np.int64)),
                     "y": pa.array(np.asarray(y, np.int64))})


def test_qhat_exact_and_interval_arithmetic(ray_session):
    rng = np.random.default_rng(7)
    n = 2000
    ids = np.arange(n)
    y = rng.integers(0, 1000, n)
    s = y + rng.integers(-50, 51, n)
    out = conformal_intervals(rd.from_arrow(_mk(ids, s, y)), "s",
                              "y", "id", alpha=0.1).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    cal = _cal_mask(ids)
    resid = np.abs(s - y)
    cr = np.sort(resid[cal])
    idx = math.ceil((1.0 - 0.1) * (len(cr) + 1))
    qhat = int(cr[idx - 1])
    assert len(out) == int((~cal).sum())
    assert (out["lo"].to_numpy() == out["s"].to_numpy() - qhat).all()
    assert (out["hi"].to_numpy() == out["s"].to_numpy() + qhat).all()
    exp_cov = (np.abs(out["s"].to_numpy() - out["y"].to_numpy())
               <= qhat).astype(int)
    assert (out["covered"].to_numpy() == exp_cov).all()


def test_marginal_coverage_guarantee(ray_session):
    # iid residuals: empirical coverage on the test split >= 1 - alpha
    # (up to sampling noise)
    rng = np.random.default_rng(11)
    n = 8000
    ids = np.arange(n)
    y = np.zeros(n, int)
    s = rng.integers(-1000, 1000, n)
    out = conformal_intervals(rd.from_arrow(_mk(ids, s, y)), "s",
                              "y", "id", alpha=0.2).to_pandas()
    cov = out["covered"].mean()
    assert cov >= 0.78


def test_unbounded_interval_nulls(ray_session):
    # tiny calibration set + tiny alpha -> idx > n_cal -> null bounds
    ids = np.arange(30)
    out = conformal_intervals(
        rd.from_arrow(_mk(ids, ids, ids * 0)), "s", "y", "id",
        alpha=0.01).to_pandas()
    assert out["lo"].isna().all() and out["hi"].isna().all()
    assert (out["covered"] == 1).all()


def test_rejects(ray_session):
    t = _mk([1], [1], [1])
    with pytest.raises(ValueError, match="alpha"):
        conformal_intervals(rd.from_arrow(t), "s", "y", "id",
                            alpha=1.5)
    with pytest.raises(ValueError, match="calib_mod"):
        conformal_intervals(rd.from_arrow(t), "s", "y", "id",
                            calib_mod=1)
    tf = pa.table({"id": pa.array([1], pa.int64()),
                   "s": pa.array([0.5]), "y": pa.array([1],
                                                       pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        conformal_intervals(rd.from_arrow(tf), "s", "y", "id")
