"""Interpolated Kneser–Ney bigram LM (stages/tokengrams)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import (
    fit_token_kn_bigram, token_kn_pairs, token_kn_surprisal)


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def _naive_fit(docs):
    from collections import Counter
    pairs = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            pairs[(a, b)] += 1
    cv, n1v, n1w = Counter(), Counter(), Counter()
    for (a, b), c in pairs.items():
        cv[a] += c
        n1v[a] += 1
        n1w[b] += 1
    return pairs, cv, n1v, n1w, len(pairs)


def _naive_p(pairs, cv, n1v, n1w, n1pp, a, b, d=0.75):
    c = pairs.get((a, b), 0)
    if cv.get(a, 0) == 0:
        p = n1w.get(b, 0) / n1pp
        return p if p > 0.0 else 1.0 / (n1pp + 1)
    t1 = max(c - d, 0.0) / cv[a]
    return t1 + ((d * n1v[a]) / cv[a]) * (n1w.get(b, 0) / n1pp)


def test_kn_hand_computed():
    docs = [[1, 2, 3], [2, 3], [3, 1]]
    out = token_kn_pairs(_ds(docs)).to_pandas()
    out = out.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    # pairs: (1,2)x1 (2,3)x2 (3,1)x1; cv: 1→1 2→2 3→1; n1v all 1;
    # n1w: 2→1 3→1 1→1; n1pp=3
    # p(2|1) = .25/1 + (.75/1)*(1/3) = 0.5
    # p(3|2) = 1.25/2 + (.75/2)*(1/3) = 0.75
    # p(1|3) = .25/1 + (.75/1)*(1/3) = 0.5
    got = {(r.doc_id, r.pos): (r.w1, r.w2, r.c, r.cv, r.n1v, r.n1w,
                               r.p_kn) for r in out.itertuples()}
    assert got[("d0", 1)] == (1, 2, 1, 1, 1, 1, 0.5)
    assert got[("d0", 2)] == (2, 3, 2, 2, 1, 1, 0.75)
    assert got[("d1", 1)] == (2, 3, 2, 2, 1, 1, 0.75)
    assert got[("d2", 1)] == (3, 1, 1, 1, 1, 1, 0.5)
    assert len(out) == 4


def test_kn_normalizes_over_vocab():
    """Σ_w p_kn(w|v) == 1 over the FULL vocab for every seen context —
    the discounted mass exactly redistributed by continuation."""
    rng = np.random.default_rng(7)
    docs = [rng.integers(0, 12, size=rng.integers(2, 30)).tolist()
            for _ in range(40)]
    lm = fit_token_kn_bigram(_ds(docs))
    vocab = sorted({t for d in docs for t in d})
    pairs, cv, n1v, n1w, n1pp = _naive_fit(docs)
    for v in sorted(cv):
        tot = sum(_naive_p(pairs, cv, n1v, n1w, n1pp, v, w)
                  for w in vocab)
        assert abs(tot - 1.0) < 1e-12
    assert lm["n1pp"] == n1pp


def test_kn_fuzz_naive_parity():
    """Engine per-pair rows == naive reference BIT-EXACTLY (identical
    single IEEE expression) across random corpora, including docs with
    repeats, 1-token and empty docs."""
    rng = np.random.default_rng(11)
    docs = []
    for _ in range(120):
        n = int(rng.integers(0, 25))
        docs.append(rng.integers(0, 9, size=n).tolist())
    docs += [[], [5], [3, 3, 3, 3]]
    out = token_kn_pairs(_ds(docs)).to_pandas()
    pairs, cv, n1v, n1w, n1pp = _naive_fit(docs)
    n_exp = sum(max(len(d) - 1, 0) for d in docs)
    assert len(out) == n_exp
    for r in out.itertuples():
        i = int(r.doc_id[1:])
        a, b = docs[i][r.pos - 1], docs[i][r.pos]
        assert (r.w1, r.w2) == (a, b)
        assert r.c == pairs[(a, b)]
        assert r.cv == cv[a]
        assert r.n1v == n1v[a]
        assert r.n1w == n1w[b]
        assert r.p_kn == _naive_p(pairs, cv, n1v, n1w, n1pp, a, b)


def test_kn_surprisal_and_unseen():
    """Per-doc aggregate drops <2-token docs; scoring held-out docs
    exercises the unseen-pair / unseen-context / floor paths."""
    train = [[1, 2, 3, 1, 2], [2, 3, 1]]
    lm = fit_token_kn_bigram(_ds(train))
    test = [[1, 2], [1, 99], [99, 1], [7], []]
    out = token_kn_surprisal(_ds(test), lm=lm).to_pandas()
    assert sorted(out["doc_id"]) == ["d0", "d1", "d2"]
    pairs, cv, n1v, n1w, n1pp = _naive_fit(train)
    by = dict(zip(out["doc_id"], out["sum_neglogp"]))
    # seen pair
    assert by["d0"] == -np.log(
        _naive_p(pairs, cv, n1v, n1w, n1pp, 1, 2))
    # unseen continuation w=99 with seen context: p = t1(0) + term*0 = 0
    # → floors at 1/(n1pp+1)
    assert by["d1"] == -np.log(1.0 / (n1pp + 1))
    # unseen context 99 → continuation distribution alone
    assert by["d2"] == -np.log(n1w[1] / n1pp)
