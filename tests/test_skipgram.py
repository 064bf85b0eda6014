"""Skip-gram pair counts (stages/tokengrams.token_skipgram_pairs)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import token_skipgram_pairs


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def _naive(docs, w):
    exp = {}
    for d in docs:
        for i in range(len(d)):
            for j in range(len(d)):
                if i != j and abs(i - j) <= w:
                    k = (d[i], d[j])
                    exp[k] = exp.get(k, 0) + 1
    return exp


def test_skipgram_naive_parity():
    rng = np.random.default_rng(29)
    docs = [rng.integers(0, 40, size=int(rng.integers(0, 12)))
            .tolist() for _ in range(70)] + [[], [5]]
    for w in (1, 2, 3):
        out = token_skipgram_pairs(_ds(docs), window=w).to_pandas()
        exp = _naive(docs, w)
        assert len(out) == len(exp)
        for r in out.itertuples():
            assert exp[(r.center, r.context)] == r.cnt


def test_skipgram_symmetry_and_rejects():
    out = token_skipgram_pairs(_ds([[1, 2, 3, 1]]), window=2) \
        .to_pandas()
    m = {(r.center, r.context): r.cnt for r in out.itertuples()}
    for (a, b), c in m.items():
        assert m[(b, a)] == c     # both-directions convention
    # window=1 equals consecutive-pair counts both ways
    o1 = token_skipgram_pairs(_ds([[7, 8, 7]]), window=1).to_pandas()
    m1 = {(r.center, r.context): r.cnt for r in o1.itertuples()}
    assert m1 == {(7, 8): 2, (8, 7): 2}
    with pytest.raises(ValueError, match="window"):
        token_skipgram_pairs(_ds([[1]]), window=0)
