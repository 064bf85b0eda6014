"""Goldens for stages/tokengrams.winnow_fingerprints — the MOSS
winnowing selection: naive parity, the shared-run guarantee,
rightmost tie-break, short-doc windows, loud input rejects."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import winnow_fingerprints


def _naive(docs, k=3, w=4):
    out = set()
    A, M, P = 40503, 1 << 25, 1 << 20
    for did, toks in docs:
        n = len(toks)
        if n < k:
            continue
        hs = []
        for p in range(n - k + 1):
            h = 0
            for j in range(k):
                h = (h * A + toks[p + j] % P) % M
            hs.append(h)
        ng = len(hs)
        keys = [h * P + (P - 1 - (i + 1)) for i, h in enumerate(hs)]
        for e in range(ng):
            if e + 1 < min(w, ng):
                continue
            mk = min(keys[max(0, e - w + 1):e + 1])
            out.add((did, P - 1 - (mk % P), mk // P))
    return out


def _run(docs, **kw):
    t = pa.table({"doc_id": [d for d, _ in docs],
                  "tokens": pa.array([x for _, x in docs],
                                     pa.list_(pa.int32()))})
    got = winnow_fingerprints(rd.from_arrow(t), **kw).to_pandas()
    if got.empty:
        return set()
    return set(zip(got["doc_id"], got["pos"], got["fp"]))


def test_naive_parity_fuzz():
    rng = np.random.default_rng(7)
    docs = [(f"d{i}", rng.integers(0, 40, size=rng.integers(0, 25))
             .tolist()) for i in range(120)]
    for k, w in ((3, 4), (2, 5), (1, 3), (4, 1)):
        assert _run(docs, k=k, w=w) == _naive(docs, k=k, w=w), (k, w)


def test_shared_run_guarantee():
    # any shared token run of length >= w + k - 1 (= 6 here) shares
    # at least one fingerprint between the two docs
    rng = np.random.default_rng(1)
    shared = rng.integers(0, 1000, size=6).tolist()
    a = rng.integers(1000, 2000, size=10).tolist() + shared
    b = shared + rng.integers(2000, 3000, size=10).tolist()
    got = _run([("a", a), ("b", b)])
    fa = {f for d, p, f in got if d == "a"}
    fb = {f for d, p, f in got if d == "b"}
    assert fa & fb


def test_rightmost_tie_and_short_doc():
    # identical gram hashes everywhere (constant tokens): min key is
    # the RIGHTMOST gram of each window
    got = _run([("c", [5] * 8)], k=3, w=4)
    # grams at pos 1..6; windows end at pos 4,5,6 selecting pos 4,5,6
    assert {(d, p) for d, p, _ in got} == {("c", 4), ("c", 5), ("c", 6)}
    # short doc: fewer grams than w -> ONE whole-doc window
    got = _run([("s", [1, 2, 3, 4])], k=3, w=4)   # 2 grams
    assert len(got) == 1
    # below k tokens: nothing
    assert _run([("t", [1, 2])], k=3, w=4) == set()
    assert _run([("u", [])], k=3, w=4) == set()


def test_loud_rejects():
    with pytest.raises(Exception, match="negative"):
        _run([("n", [1, -2, 3, 4])])
    with pytest.raises(ValueError, match="k and w"):
        _run([("z", [1, 2, 3])], k=0)
