"""Multi-lag feature pack (stages/window.lag_pack)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.window import lag_pack


def test_lag_pack_matches_repeated_shift():
    rng = np.random.default_rng(3)
    n = 200
    ent = rng.integers(0, 7, size=n)
    t = pa.table({
        "e": pa.array([f"u{v}" for v in ent]),
        "o": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 100, size=n).astype(np.int64)),
    })
    out = lag_pack(rd.from_arrow(t), "e", ["o"], ["v"],
                   lags=(1, 3), num_buckets=4).to_pandas() \
        .sort_values(["e", "o"]).reset_index(drop=True)
    import pandas as pd
    exp = t.to_pandas().sort_values(["e", "o"]).reset_index(drop=True)
    for p in (1, 3):
        g = exp.groupby("e")["v"].shift(p)
        got = out[f"v_lag{p}"]
        assert ((g.isna() & got.isna())
                | (g.values == got.values)).all()


def test_lag_pack_token_arrays_and_rejects():
    t = pa.table({
        "e": ["a", "a", "a", "b"],
        "o": pa.array([1, 2, 3, 1], type=pa.int64()),
        "tok": pa.array([[1, 2], [3], [], [9]],
                        type=pa.list_(pa.int32()))})
    out = lag_pack(rd.from_arrow(t), "e", ["o"], ["tok"],
                   lags=(1, 2), num_buckets=2).take_all()
    rows = {(r["e"], r["o"]): r for r in out}
    assert rows[("a", 1)]["tok_lag1"] is None
    assert rows[("a", 2)]["tok_lag1"] == [1, 2]
    assert rows[("a", 3)]["tok_lag1"] == [3]
    assert rows[("a", 3)]["tok_lag2"] == [1, 2]
    assert rows[("b", 1)]["tok_lag1"] is None
    with pytest.raises(ValueError, match="positive"):
        lag_pack(rd.from_arrow(t), "e", ["o"], ["tok"], lags=(0,))
    with pytest.raises(ValueError, match="duplicates"):
        lag_pack(rd.from_arrow(t), "e", ["o"], ["tok"], lags=(1, 1))
