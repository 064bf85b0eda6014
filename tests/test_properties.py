"""Property-based tests (hypothesis): window kernels vs pandas on random
inputs, and the zero-temporal-leakage invariant for the as-of kernel
(SURVEY §5 item 2)."""
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from feature_extraction_ray.functions import windows as W


@st.composite
def sorted_frames(draw):
    n = draw(st.integers(1, 120))
    n_ent = draw(st.integers(1, 5))
    ent = np.sort(np.array(draw(st.lists(
        st.integers(0, n_ent - 1), min_size=n, max_size=n))))
    gaps = np.array(draw(st.lists(st.integers(0, 50),
                                  min_size=n, max_size=n)))
    ts = np.cumsum(gaps)
    vals = np.array(draw(st.lists(
        st.one_of(st.floats(-100, 100), st.none()),
        min_size=n, max_size=n)), dtype=object)
    v = np.array([np.nan if x is None else float(x) for x in vals])
    df = pd.DataFrame({"ent": ent, "ts": ts, "v": v})
    return df.sort_values(["ent", "ts"], kind="stable").reset_index(
        drop=True)


@settings(max_examples=60, deadline=None)
@given(sorted_frames(), st.integers(1, 4))
def test_lag_property(df, k):
    ng = W.group_starts(df["ent"].to_numpy())
    vals, valid = W.lag(df["v"].to_numpy(), ng, k)
    got = np.where(valid, vals, np.nan)
    exp = df.groupby("ent")["v"].shift(k).to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)


@settings(max_examples=60, deadline=None)
@given(sorted_frames())
def test_ffill_property(df):
    ng = W.group_starts(df["ent"].to_numpy())
    isnull = df["v"].isna().to_numpy()
    vals, still = W.ffill(df["v"].to_numpy(), isnull, ng)
    got = np.where(still, np.nan, vals)
    exp = df.groupby("ent")["v"].ffill().to_numpy()
    np.testing.assert_allclose(got, exp, equal_nan=True)


@settings(max_examples=60, deadline=None)
@given(sorted_frames(), st.integers(1, 60))
def test_sessionize_property(df, gap):
    ng = W.group_starts(df["ent"].to_numpy())
    got = W.sessionize(df["ts"].to_numpy(), ng, gap)
    exp = (df.groupby("ent", group_keys=False)["ts"]
           .apply(lambda s: (s.diff() > gap).fillna(False).cumsum())
           .to_numpy())
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=40, deadline=None)
@given(sorted_frames(), st.data())
def test_asof_zero_leakage_property(left, data):
    """Deleting all right rows with ts' > cutoff must not change any
    match at or before the cutoff (the north-rule invariant) — checked
    at the merge-kernel level for arbitrary inputs."""
    from feature_extraction_ray.stages.asof import _merge_keyframes
    n_r = data.draw(st.integers(0, 80))
    r_ent = np.sort(np.array(data.draw(st.lists(
        st.integers(0, 4), min_size=n_r, max_size=n_r))))
    r_ts = np.array(sorted(data.draw(st.lists(
        st.integers(0, 3000), min_size=n_r, max_size=n_r))))
    order = np.argsort(r_ts, kind="stable")
    r_ent2, r_ts2 = r_ent[order], r_ts[order]
    l_sorted = left.sort_values("ts", kind="stable")
    l_ent = l_sorted["ent"].to_numpy()
    l_ts = l_sorted["ts"].to_numpy()
    full = _merge_keyframes(l_ent, l_ts, r_ent2, r_ts2,
                            "backward", None, True)
    cutoff = data.draw(st.integers(0, 3000))
    keep = r_ts2 <= cutoff
    trunc = _merge_keyframes(l_ent, l_ts, r_ent2[keep], r_ts2[keep],
                             "backward", None, True)
    # map truncated indices back to full-side indices
    kept_idx = np.flatnonzero(keep)
    for i in range(len(l_ts)):
        if l_ts[i] <= cutoff:
            a = full[i]
            b = trunc[i]
            a_key = (r_ent2[a], r_ts2[a]) if a >= 0 else None
            b_key = (r_ent2[kept_idx[b]], r_ts2[kept_idx[b]]) \
                if b >= 0 else None
            assert a_key == b_key, (i, a_key, b_key)
