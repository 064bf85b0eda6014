"""Goldens for groupstats.quantile_map (CDF matching)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import quantile_map


def _mk(g, i, v):
    return pa.table({"g": pa.array(g),
                     "id": pa.array(np.asarray(i, np.int64)),
                     "v": pa.array(np.asarray(v, np.int64),
                                   pa.int64())})


def _naive(df, ref):
    r = df[df.g == ref].sort_values(["v", "id"]).v.to_numpy()
    out = []
    for g, grp in df.groupby("g"):
        grp = grp.sort_values(["v", "id"]).reset_index(drop=True)
        n = len(grp)
        for rk0, row in grp.iterrows():
            idx = (int(rk0 + 1) * len(r) + n - 1) // n
            out.append((g, row["id"], row["v"], int(r[idx - 1])))
    return sorted(out)


def test_naive_parity_unequal_groups(ray_session):
    rng = np.random.default_rng(31)
    g = np.r_[["a"] * 40, ["b"] * 17, ["c"] * 63]
    v = rng.integers(-50, 50, len(g))
    i = rng.permutation(len(g))
    df = pd.DataFrame({"g": g, "id": i, "v": v})
    exp = _naive(df, "a")
    for nb in (1, 5):
        ds = rd.from_arrow(_mk(g, i, v))
        if nb > 1:
            ds = ds.repartition(nb)
        out = quantile_map(ds, "g", "v", "a", id_col="id") \
            .to_pandas()
        got = sorted(zip(out["g"], out["id"], out["v"],
                         out["v_qm"]))
        assert [tuple(map(lambda x: x, t)) for t in got] == exp


def test_ref_group_identity(ray_session):
    rng = np.random.default_rng(3)
    v = rng.integers(0, 100, 50)
    ds = rd.from_arrow(_mk(["r"] * 50, np.arange(50), v))
    out = quantile_map(ds, "g", "v", "r", id_col="id").to_pandas()
    assert (out["v_qm"].to_numpy() == out["v"].to_numpy()).all()


def test_duplicate_values_tie_break(ray_session):
    # two equal-valued rows in a 2-row group vs a 4-value reference:
    # ranks 1,2 -> idx 2,4 -> ref order stats 20,40
    t = _mk(["r", "r", "r", "r", "b", "b"],
            [1, 2, 3, 4, 5, 6], [10, 20, 30, 40, 7, 7])
    out = quantile_map(rd.from_arrow(t), "g", "v", "r",
                       id_col="id").to_pandas()
    b = out[out.g == "b"].sort_values("id")
    assert list(b["v_qm"]) == [20, 40]


def test_nulls_dropped_and_rejects(ray_session):
    t = pa.table({"g": ["r", "r", "b"],
                  "id": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([1, None, 5], pa.int64())})
    out = quantile_map(rd.from_arrow(t), "g", "v", "r",
                       id_col="id").to_pandas()
    assert len(out) == 2
    with pytest.raises(ValueError, match="no rows"):
        quantile_map(rd.from_arrow(t), "g", "v", "zzz", id_col="id")
    tf = pa.table({"g": ["r"], "id": pa.array([1], pa.int64()),
                   "v": pa.array([0.5])})
    with pytest.raises(Exception, match="integer-valued"):
        quantile_map(rd.from_arrow(tf), "g", "v", "r", id_col="id")
