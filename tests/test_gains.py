"""Goldens for evalmetrics.gains_table."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import gains_table


def _mk(s, y, i):
    return pa.table({"s": pa.array(np.asarray(s, np.int64)),
                     "y": pa.array(np.asarray(y, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def test_naive_parity_and_informative_model(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    y = rng.integers(0, 2, n)
    s = rng.integers(-40, 40, n) + y * 30
    i = rng.permutation(n)
    out = gains_table(rd.from_arrow(_mk(s, y, i)).repartition(4),
                      "s", "y", id_col="id").to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    df = pd.DataFrame({"s": s, "y": y, "i": i}) \
        .sort_values(["s", "i"], ascending=[False, True]) \
        .reset_index(drop=True)
    df["bin"] = (df.index * 10) // n
    exp = df.groupby("bin")["y"].agg(["size", "sum"])
    assert (out["n_k"].to_numpy() == exp["size"].to_numpy()).all()
    assert (out["pos_k"].to_numpy() == exp["sum"].to_numpy()).all()
    n_pos = int(y.sum())
    cum = exp["sum"].cumsum()
    assert np.allclose(out["gain"], cum / n_pos)
    # informative scores: top decile lift well above 1, monotone-ish
    assert out["lift"][0] > 1.4
    assert out["gain"].iloc[-1] == 1.0 and out["lift"].iloc[-1] == 1.0


def test_random_scores_lift_near_one(ray_session):
    rng = np.random.default_rng(9)
    n = 5000
    out = gains_table(rd.from_arrow(_mk(rng.integers(0, 1000, n),
                                        rng.integers(0, 2, n),
                                        np.arange(n))),
                      "s", "y", id_col="id").to_pandas()
    assert abs(out["lift"][0] - 1.0) < 0.25


def test_rejects(ray_session):
    t = pa.table({"s": pa.array([0.5]), "y": pa.array([1], pa.int64()),
                  "id": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        gains_table(rd.from_arrow(t), "s", "y", id_col="id")
    t2 = _mk([1], [2], [1])
    with pytest.raises(Exception, match="0/1"):
        gains_table(rd.from_arrow(t2), "s", "y", id_col="id")
    with pytest.raises(ValueError, match="n_bins"):
        gains_table(rd.from_arrow(_mk([1], [1], [1])), "s", "y",
                    id_col="id", n_bins=1)
