"""Goldens for evalmetrics.youden_threshold."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import youden_threshold


def _mk(s, y):
    return pa.table({"s": pa.array(np.asarray(s, np.int64)),
                     "y": pa.array(np.asarray(y, np.int64))})


def test_separable_case_finds_boundary(ray_session):
    # positives >= 100, negatives < 100: perfect separation
    s = list(range(0, 100)) + list(range(100, 200))
    y = [0] * 100 + [1] * 100
    out = youden_threshold(rd.from_arrow(_mk(s, y)), "s",
                           "y").to_pandas().iloc[0]
    assert out["threshold"] == 100
    assert out["tp"] == 100 and out["fp"] == 0
    assert out["j"] == 1.0


def test_naive_parity_fuzz(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    y = rng.integers(0, 2, n)
    s = rng.integers(-50, 50, n) + y * 20
    out = youden_threshold(rd.from_arrow(_mk(s, y)).repartition(4),
                           "s", "y").to_pandas().iloc[0]
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    best, best_t = None, None
    for t in sorted(set(s.tolist())):
        tp = int(((s >= t) & (y == 1)).sum())
        fp = int(((s >= t) & (y == 0)).sum())
        jn = tp * n_neg - fp * n_pos
        if best is None or jn > best:
            best, best_t = jn, t
    assert out["threshold"] == best_t and out["j_num"] == best


def test_single_class_nulls(ray_session):
    out = youden_threshold(rd.from_arrow(_mk([1, 2], [1, 1])), "s",
                           "y").to_pandas().iloc[0]
    assert pd.isna(out["threshold"]) and pd.isna(out["j"])
    assert out["n_pos"] == 2 and out["n_neg"] == 0
