"""Goldens for window.watermark_late_events."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.window import watermark_late_events


def _mk(e, ts, arr):
    return pa.table({"ent": pa.array(e),
                     "ts": pa.array(np.asarray(ts, np.int64)),
                     "arr": pa.array(np.asarray(arr, np.int64))})


def _naive(df, lateness):
    out = {}
    for ent, g in df.groupby("ent"):
        g = g.sort_values("arr")
        wm = None
        for r in g.itertuples():
            late = int(wm is not None and r.ts < wm - lateness)
            out[(ent, r.arr)] = (wm, late)
            wm = r.ts if wm is None else max(wm, r.ts)
    return out


def test_naive_parity_fuzz_layouts(ray_session):
    rng = np.random.default_rng(29)
    n = 800
    e = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    ts = rng.integers(0, 10 ** 6, n)
    arr = rng.permutation(n)
    df = pd.DataFrame({"ent": e, "ts": ts, "arr": arr})
    exp = _naive(df, 1000)
    for nb in (1, 5):
        ds = rd.from_arrow(_mk(e, ts, arr))
        if nb > 1:
            ds = ds.repartition(nb)
        out = watermark_late_events(ds, "ent", "ts", "arr",
                                    1000).to_pandas()
        assert len(out) == n
        for r in out.itertuples():
            wm, late = exp[(r.ent, r.arr)]
            got_wm = None if pd.isna(r.wm) else int(r.wm)
            assert (got_wm, int(r.late)) == (wm, late)


def test_first_arrival_never_late(ray_session):
    t = _mk(["u", "u"], [100, 5], [1, 2])
    out = watermark_late_events(rd.from_arrow(t), "ent", "ts",
                                "arr", 10).to_pandas() \
        .sort_values("arr")
    assert pd.isna(out.iloc[0]["wm"]) and out.iloc[0]["late"] == 0
    assert out.iloc[1]["wm"] == 100 and out.iloc[1]["late"] == 1


def test_lateness_boundary_exclusive(ray_session):
    # ts == wm - lateness is ON TIME (strict <)
    t = _mk(["u", "u", "u"], [100, 90, 89], [1, 2, 3])
    out = watermark_late_events(rd.from_arrow(t), "ent", "ts",
                                "arr", 10).to_pandas() \
        .sort_values("arr")
    assert list(out["late"]) == [0, 0, 1]


def test_reject(ray_session):
    t = _mk(["u"], [1], [1])
    with pytest.raises(ValueError, match="allowed_lateness"):
        watermark_late_events(rd.from_arrow(t), "ent", "ts", "arr",
                              -1)


def test_arrival_tie_break_by_id(ray_session):
    # two rows share an arrival value: without id_col the replay order
    # is arbitrary; with id_col the order (and wm/late) is pinned
    t = pa.table({
        "ent": pa.array(["x"] * 3),
        "ts": pa.array([100, 50, 10], pa.int64()),
        "arr": pa.array([1, 2, 2], pa.int64()),
        "id": pa.array([30, 20, 10], pa.int64())})
    out = watermark_late_events(rd.from_arrow(t), "ent", "ts", "arr",
                                allowed_lateness=0, id_col="id") \
        .to_pandas().set_index("id")
    # replay order by (arr, id): id30(arr1,ts100) -> id10(arr2,ts10)
    # -> id20(arr2,ts50)
    assert pd.isna(out.loc[30, "wm"])
    assert out.loc[10, "wm"] == 100 and out.loc[10, "late"] == 1
    assert out.loc[20, "wm"] == 100 and out.loc[20, "late"] == 1
