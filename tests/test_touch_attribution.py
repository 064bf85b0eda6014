"""Goldens for groupstats.touch_attribution."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import touch_attribution


def _mk(u, ts, ty, v, i):
    return pa.table({"u": pa.array(np.asarray(u, np.int64)),
                     "ts": pa.array(np.asarray(ts, np.int64)),
                     "ty": pa.array(ty),
                     "v": pa.array(np.asarray(v, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def _naive(df, window, mode):
    rows = []
    for _, c in df[df.ty == "conv"].iterrows():
        t = df[(df.ty == "touch") & (df.u == c.u)
               & (df.ts >= c.ts - window)
               & ((df.ts < c.ts)
                  | ((df.ts == c.ts) & (df.id < c.id)))]
        t = t.sort_values(["ts", "id"]).reset_index(drop=True)
        k = len(t)
        if k == 0:
            rows.append((c.id, None, c.v))
        elif mode == "first":
            rows.append((c.id, t.iloc[0].id, c.v))
        elif mode == "last":
            rows.append((c.id, t.iloc[-1].id, c.v))
        else:
            base, rem = divmod(int(c.v), k)
            for j in range(k):
                rows.append((c.id, t.iloc[j].id,
                             base + (1 if j < rem else 0)))
    return sorted(rows, key=lambda r: (r[0], r[1] if r[1] is not None
                                       else -1))


def test_naive_parity_all_modes_fuzz(ray_session):
    rng = np.random.default_rng(17)
    n = 500
    u = rng.integers(0, 12, n)
    ts = rng.integers(0, 1000, n)
    ty = np.where(rng.random(n) < 0.3, "conv", "touch")
    v = rng.integers(0, 997, n)
    i = rng.permutation(n)
    df = pd.DataFrame({"u": u, "ts": ts, "ty": ty, "v": v, "id": i})
    for mode in ("linear", "first", "last"):
        exp = _naive(df, 100, mode)
        for nb in (1, 4):
            ds = rd.from_arrow(_mk(u, ts, ty, v, i))
            if nb > 1:
                ds = ds.repartition(nb)
            out = touch_attribution(ds, "u", "ts", "ty", "v", "id",
                                    "conv", ["touch"], 100,
                                    mode=mode).to_pandas()
            got = sorted(
                [(int(r.conv_id),
                  None if pd.isna(r.touch_id) else int(r.touch_id),
                  int(r.alloc)) for r in out.itertuples()],
                key=lambda r: (r[0], r[1] if r[1] is not None
                               else -1))
            assert got == exp, mode


def test_credit_conservation(ray_session):
    rng = np.random.default_rng(5)
    n = 400
    u = rng.integers(0, 8, n)
    ts = rng.integers(0, 500, n)
    ty = np.where(rng.random(n) < 0.4, "conv", "touch")
    v = rng.integers(0, 10 ** 6, n)
    ids = np.arange(n)
    ds = rd.from_arrow(_mk(u, ts, ty, v, ids))
    out = touch_attribution(ds, "u", "ts", "ty", "v", "id", "conv",
                            ["touch"], 50).to_pandas()
    total_conv = int(v[ty == "conv"].sum())
    assert int(out["alloc"].sum()) == total_conv


def test_window_boundary_inclusive(ray_session):
    # touch exactly window_us before the conversion qualifies
    t = _mk([1, 1], [0, 100], ["touch", "conv"], [0, 10], [1, 2])
    out = touch_attribution(rd.from_arrow(t), "u", "ts", "ty", "v",
                            "id", "conv", ["touch"],
                            100).to_pandas()
    assert len(out) == 1 and out.iloc[0]["touch_id"] == 1


def test_rejects(ray_session):
    t = _mk([1], [0], ["conv"], [-5], [1])
    with pytest.raises(Exception, match="non-negative"):
        touch_attribution(rd.from_arrow(t), "u", "ts", "ty", "v",
                          "id", "conv", ["touch"],
                          10).materialize()
    with pytest.raises(ValueError, match="unknown mode"):
        touch_attribution(rd.from_arrow(t), "u", "ts", "ty", "v",
                          "id", "conv", ["touch"], 10, mode="x")
    with pytest.raises(ValueError, match="window_us"):
        touch_attribution(rd.from_arrow(t), "u", "ts", "ty", "v",
                          "id", "conv", ["touch"], 0)
