"""Goldens for groupstats.trimmed_mean_by_group."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import trimmed_mean_by_group


def _mk(g, v, i):
    return pa.table({"g": pa.array(g),
                     "v": pa.array(np.asarray(v, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def test_naive_parity_and_outlier_robustness(ray_session):
    rng = np.random.default_rng(3)
    n = 900
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    v = rng.integers(0, 100, n)
    v[::40] += 100000                     # wild outliers
    i = rng.permutation(n)
    for nb in (1, 4):
        ds = rd.from_arrow(_mk(g, v, i))
        if nb > 1:
            ds = ds.repartition(nb)
        out = trimmed_mean_by_group(ds, "g", "v", id_col="id",
                                    trim=0.1).to_pandas() \
            .set_index("g")
        for grp in "abc":
            sv = np.sort(v[g == grp])
            t = int(0.1 * len(sv))
            kept = sv[t:len(sv) - t]
            r = out.loc[grp]
            assert r["n"] == len(sv) and r["t"] == t
            assert r["s_kept"] == int(kept.sum())
            assert r["mean_t"] == kept.sum() / len(kept)
            # outliers trimmed away: mean_t near the clean mean
            assert r["mean_t"] < 200


def test_small_group_null(ray_session):
    out = trimmed_mean_by_group(
        rd.from_arrow(_mk(["g", "g"], [1, 2], [1, 2])), "g", "v",
        id_col="id", trim=0.4).to_pandas()
    # n=2, t=0 at trim .4 -> kept 2 (floor(0.8)=0): mean defined
    assert out.iloc[0]["mean_t"] == 1.5
    out2 = trimmed_mean_by_group(
        rd.from_arrow(_mk(["g"] * 3, [1, 2, 9], [1, 2, 3])), "g",
        "v", id_col="id", trim=0.4).to_pandas()
    # n=3, t=1 -> kept 1: median-like
    assert out2.iloc[0]["mean_t"] == 2.0


def test_rejects(ray_session):
    t = _mk(["g"], [1], [1])
    with pytest.raises(ValueError, match="trim"):
        trimmed_mean_by_group(rd.from_arrow(t), "g", "v",
                              id_col="id", trim=0.5)
    tf = pa.table({"g": ["g"], "v": pa.array([0.5]),
                   "id": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="integer-valued"):
        trimmed_mean_by_group(rd.from_arrow(tf), "g", "v",
                              id_col="id").materialize()
