"""Golden-oracle tests for the numpy window kernels (no Ray needed).

Oracle = naive pandas implementations (≤40 lines each, per FIXTURES.md).
"""
import numpy as np
import pandas as pd
import pytest

from feature_extraction_ray.functions import windows as W


def _frame(seed=0, n=500, n_ent=7):
    rng = np.random.default_rng(seed)
    ent = np.sort(rng.integers(0, n_ent, size=n))
    ts = np.cumsum(rng.integers(0, 100, size=n))
    v = rng.normal(size=n)
    v[rng.random(n) < 0.2] = np.nan
    df = pd.DataFrame({"ent": ent, "ts": ts, "v": v})
    df = df.sort_values(["ent", "ts"], kind="stable").reset_index(drop=True)
    return df


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [1, 2, 5])
def test_lag_lead_match_pandas(seed, k):
    df = _frame(seed)
    ng = W.group_starts(df["ent"].to_numpy())
    vals, valid = W.lag(df["v"].to_numpy(), ng, k)
    got = np.where(valid, vals, np.nan)
    exp = df.groupby("ent")["v"].shift(k).to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)

    vals, valid = W.lead(df["v"].to_numpy(), ng, k)
    got = np.where(valid, vals, np.nan)
    exp = df.groupby("ent")["v"].shift(-k).to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)


@pytest.mark.parametrize("seed", [0, 3])
def test_ffill_bfill_match_pandas(seed):
    df = _frame(seed)
    ng = W.group_starts(df["ent"].to_numpy())
    isnull = df["v"].isna().to_numpy()
    vals, still = W.ffill(df["v"].to_numpy(), isnull, ng)
    got = np.where(still, np.nan, vals)
    exp = df.groupby("ent")["v"].ffill().to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)

    vals, still = W.bfill(df["v"].to_numpy(), isnull, ng)
    got = np.where(still, np.nan, vals)
    exp = df.groupby("ent")["v"].bfill().to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)


def test_sessionize_matches_naive():
    df = _frame(5)
    ng = W.group_starts(df["ent"].to_numpy())
    gap = 50
    got = W.sessionize(df["ts"].to_numpy(), ng, gap)

    def naive(g):
        brk = (g["ts"].diff() > gap).fillna(False)
        return brk.cumsum()

    exp = df.groupby("ent", group_keys=False).apply(naive).to_numpy()
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("w", [1, 3, 10])
def test_sliding_mean_matches_pandas_rolling(w):
    df = _frame(7)
    ng = W.group_starts(df["ent"].to_numpy())
    isnull = df["v"].isna().to_numpy()
    mean, nullmask = W.sliding_mean(df["v"].to_numpy(), isnull, ng, w)
    got = np.where(nullmask, np.nan, mean)
    exp = (df.groupby("ent")["v"]
           .rolling(w, min_periods=1).mean()
           .reset_index(level=0, drop=True).sort_index().to_numpy())
    np.testing.assert_allclose(got, exp, equal_nan=True, atol=1e-12)


def test_mattr_naive():
    toks = np.array([1, 2, 1, 3, 3, 4, 1, 2])
    w = 3
    # naive: mean over windows of (#distinct / w)
    exp = np.mean([len(set(toks[i:i + w].tolist())) / w
                   for i in range(len(toks) - w + 1)])
    assert abs(W.mattr(toks, w) - exp) < 1e-12
    # short stream → plain TTR
    assert W.mattr(np.array([1, 1, 2]), 10) == 2 / 3
    assert np.isnan(W.mattr(np.array([], dtype=np.int64), 5))


def test_empty_inputs():
    empty = np.array([], dtype=np.int64)
    ng = W.group_starts(empty)
    assert len(W.sessionize(empty, ng, 10)) == 0
    vals, valid = W.lag(empty.astype(float), ng, 1)
    assert len(vals) == 0
