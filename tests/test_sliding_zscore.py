"""Trailing-window z-score (stages/window.sliding_zscore)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.window import sliding_zscore


def _ds(ent, vals):
    return rd.from_arrow(pa.table({
        "e": pa.array(ent),
        "o": pa.array(range(len(ent)), type=pa.int64()),
        "v": pa.array(vals, type=pa.int64())}))


def _naive(vals, w):
    out = []
    for i in range(len(vals)):
        win = vals[max(0, i - w + 1):i + 1]
        n = len(win)
        S = sum(win)
        S2 = sum(x * x for x in win)
        varnum = n * S2 - S * S
        if n < 2 or varnum <= 0:
            out.append(None)
        else:
            out.append((float(vals[i]) - float(S) / float(n))
                       / np.sqrt(float(varnum) / float(n * (n - 1))))
    return out


def test_zscore_naive_parity_exact():
    rng = np.random.default_rng(13)
    per_ent = {f"u{k}": rng.integers(-40, 40, size=60).tolist()
               for k in range(5)}
    ent, vals = [], []
    for k, vs in per_ent.items():
        ent += [k] * len(vs)
        vals += vs
    out = sliding_zscore(_ds(ent, vals), "e", ["o"], "v", window=6,
                         num_buckets=4).to_pandas() \
        .sort_values(["e", "o"]).reset_index(drop=True)
    for k, vs in per_ent.items():
        got = out[out["e"] == k]["v_w6_z"].tolist()
        exp = _naive(vs, 6)
        assert len(got) == len(exp)
        for g, x in zip(got, exp):
            if x is None:
                assert g is None or np.isnan(g)
            else:
                assert g == x  # identical IEEE expression


def test_zscore_degenerate_and_rejects():
    # constant window → zero variance → null
    out = sliding_zscore(_ds(["a"] * 4, [5, 5, 5, 9]), "e", ["o"],
                         "v", window=3).to_pandas() \
        .sort_values("o").reset_index(drop=True)
    z = out["v_w3_z"]
    assert z.iloc[0] is None or np.isnan(z.iloc[0])   # n=1
    assert np.isnan(z.iloc[1]) or z.iloc[1] is None   # 5,5 zero var
    assert np.isnan(z.iloc[2]) or z.iloc[2] is None   # 5,5,5
    assert z.iloc[3] == _naive([5, 5, 9], 3)[-1]      # window 5,5,9
    with pytest.raises(ValueError, match="window"):
        sliding_zscore(_ds(["a"], [1]), "e", ["o"], "v", window=1)
    with pytest.raises(Exception, match="integer-valued"):
        sliding_zscore(rd.from_arrow(pa.table({
            "e": ["a", "a"], "o": pa.array([1, 2], type=pa.int64()),
            "v": pa.array([1.5, 2.0])})), "e", ["o"], "v",
            window=2).to_pandas()
    big = 1 << 33
    with pytest.raises(Exception, match="bound"):
        sliding_zscore(_ds(["a", "a"], [big, big - 1]), "e", ["o"],
                       "v", window=4).to_pandas()
