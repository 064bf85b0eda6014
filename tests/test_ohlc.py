"""Goldens for window.ohlc_bars."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.window import ohlc_bars


def _mk(e, ts, v, i):
    return pa.table({"ent": pa.array(e),
                     "ts": pa.array(np.asarray(ts, np.int64)),
                     "v": pa.array(np.asarray(v, np.int64)),
                     "id": pa.array(np.asarray(i, np.int64))})


def test_naive_parity_layouts(ray_session):
    rng = np.random.default_rng(3)
    n = 600
    e = np.array(["a", "b"])[rng.integers(0, 2, n)]
    ts = rng.integers(0, 1000, n)
    v = rng.integers(-100, 100, n)
    i = rng.permutation(n)
    import pandas as pd
    df = pd.DataFrame({"e": e, "ts": ts, "v": v, "i": i,
                       "bar": ts // 100})
    for nb in (1, 5):
        ds = rd.from_arrow(_mk(e, ts, v, i))
        if nb > 1:
            ds = ds.repartition(nb)
        out = ohlc_bars(ds, "ent", "ts", "v", "id",
                        bar_us=100).to_pandas()
        for _, r in out.iterrows():
            g = df[(df.e == r["ent"]) & (df.bar == r["bar"])] \
                .sort_values(["ts", "i"])
            assert r["n"] == len(g)
            assert r["open"] == g.iloc[0]["v"]
            assert r["close"] == g.iloc[-1]["v"]
            assert r["high"] == g["v"].max()
            assert r["low"] == g["v"].min()
        assert len(out) == df.groupby(["e", "bar"]).ngroups


def test_single_row_bar(ray_session):
    out = ohlc_bars(rd.from_arrow(_mk(["x"], [5], [42], [1])),
                    "ent", "ts", "v", "id", bar_us=10).to_pandas()
    r = out.iloc[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == \
        (42, 42, 42, 42, 1)


def test_reject(ray_session):
    t = _mk(["x"], [5], [42], [1])
    with pytest.raises(ValueError, match="bar_us"):
        ohlc_bars(rd.from_arrow(t), "ent", "ts", "v", "id", 0)
