"""Isotonic (PAV) calibration (stages/evalmetrics.isotonic_fit)."""
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import isotonic_fit


def _ds(scores, labels):
    return rd.from_arrow(pa.table({
        "s": pa.array(scores, type=pa.int64()),
        "y": pa.array(labels, type=pa.int64())}))


def _naive_pav(levels):
    """O(L²) exact-rational PAV reference over (score, n, pos)."""
    pools = []
    for s, n, p in levels:
        cp, cn, w = p, n, [s]
        while pools and Fraction(pools[-1][0], pools[-1][1]) >= \
                Fraction(cp, cn):
            pp, pn, pw = pools.pop()
            cp, cn, w = cp + pp, cn + pn, pw + w
        pools.append((cp, cn, w))
    out = {}
    for cp, cn, w in pools:
        for s in w:
            out[s] = (cp, cn)
    return out


def test_pav_hand_case_and_monotone():
    # scores 1..4 with violating means: 1→1.0, 2→0.0 must pool
    scores = [1, 2, 2, 3, 4, 4]
    labels = [1, 0, 0, 0, 1, 1]
    out = isotonic_fit(_ds(scores, labels), "s", "y").to_pandas() \
        .sort_values("score").reset_index(drop=True)
    # level table: (1,1,1),(2,2,0),(3,1,0),(4,2,2)
    # PAV: 1.0 vs 0.0 pool → 1/3; vs 0.0 pool → 1/4; 1.0 stays
    assert list(out["score"]) == [1, 2, 3, 4]
    assert list(out["iso"]) == [1.0 / 4.0] * 3 + [1.0]
    assert (np.diff(out["iso"].values) >= 0).all()


def test_pav_naive_rational_parity():
    rng = np.random.default_rng(41)
    scores = rng.integers(-30, 30, size=800).tolist()
    prob = 1.0 / (1.0 + np.exp(-np.asarray(scores) / 10.0))
    labels = (rng.random(800) < prob).astype(int).tolist()
    out = isotonic_fit(_ds(scores, labels), "s", "y").to_pandas() \
        .sort_values("score").reset_index(drop=True)
    lv = {}
    for s, y in zip(scores, labels):
        n, p = lv.get(s, (0, 0))
        lv[s] = (n + 1, p + y)
    levels = [(s, lv[s][0], lv[s][1]) for s in sorted(lv)]
    exp = _naive_pav(levels)
    for r in out.itertuples():
        cp, cn = exp[r.score]
        assert r.iso == float(cp) / float(cn)
    assert (np.diff(out["iso"].values) >= -0.0).all()
    # squared-error optimality vs the unpooled means (sanity: the fit
    # can't be worse than the best constant)
    ybar = sum(labels) / len(labels)
    sse_fit = sum(lv[r.score][0] *
                  ((lv[r.score][1] / lv[r.score][0]) - r.iso) ** 2
                  for r in out.itertuples())
    sse_const = sum(lv[s][0] * ((lv[s][1] / lv[s][0]) - ybar) ** 2
                    for s in lv)
    assert sse_fit <= sse_const + 1e-9


def test_pav_minimax_identity():
    # iso_i == min_{k>=i} max_{j<=i} avg(j..k) computed in doubles
    rng = np.random.default_rng(9)
    scores = rng.integers(0, 12, size=120).tolist()
    labels = rng.integers(0, 2, size=120).tolist()
    out = isotonic_fit(_ds(scores, labels), "s", "y").to_pandas() \
        .sort_values("score").reset_index(drop=True)
    lv = {}
    for s, y in zip(scores, labels):
        n, p = lv.get(s, (0, 0))
        lv[s] = (n + 1, p + y)
    ss = sorted(lv)
    n = np.array([lv[s][0] for s in ss], dtype=np.int64)
    p = np.array([lv[s][1] for s in ss], dtype=np.int64)
    cn = np.concatenate([[0], np.cumsum(n)])
    cp = np.concatenate([[0], np.cumsum(p)])
    L = len(ss)
    for i in range(L):
        best = None
        for k in range(i, L):
            mx = None
            for j in range(0, i + 1):
                a = float(cp[k + 1] - cp[j]) / float(cn[k + 1] - cn[j])
                mx = a if mx is None else max(mx, a)
            best = mx if best is None else min(best, mx)
        assert out["iso"].iloc[i] == best


def test_pav_rejects_and_degenerate():
    with pytest.raises(Exception, match="0/1"):
        isotonic_fit(_ds([1, 2], [0, 2]), "s", "y").to_pandas()
    out = isotonic_fit(_ds([5, 5, 5], [1, 0, 1]), "s", "y") \
        .to_pandas()
    assert len(out) == 1 and out["iso"].iloc[0] == 2.0 / 3.0
