"""Signed feature hashing (stages/tokengrams.hashed_token_features)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import hashed_token_features


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def _bucket(tk, d, seed=1):
    return ((tk % (1 << 20)) * 2654435761
            + seed * 1315423911) % (1 << 32) % d


def _sgn(tk, seed=1):
    return 1 - 2 * (((tk % (1 << 20)) * 2246822519
                     + seed * 2654435761) % (1 << 32) >> 31)


def test_hashed_features_naive_parity():
    rng = np.random.default_rng(13)
    docs = [rng.integers(0, 50000, size=int(rng.integers(0, 40)))
            .tolist() for _ in range(80)] + [[], [7]]
    out = hashed_token_features(_ds(docs), n_features=32).to_pandas()
    exp = {}
    for i, d in enumerate(docs):
        for tk in d:
            k = (f"d{i}", _bucket(tk, 32))
            n, v = exp.get(k, (0, 0))
            exp[k] = (n + 1, v + _sgn(tk))
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert exp[(r.doc_id, r.bucket)] == (r.n, r.value)


def test_hashed_features_properties():
    # same doc twice → identical rows; signs can cancel to value 0
    # while the bucket row survives (n counts occurrences)
    # find two tokens sharing a bucket with opposite signs (d=2 is
    # impossible: with odd multipliers both hashes reduce to
    # (base+1) mod 2, so bucket-equal forces sign-equal)
    d = 4
    t1, t2 = 0, 1
    found = False
    for t1 in range(64):
        for t2 in range(t1 + 1, 256):
            if _bucket(t1, d) == _bucket(t2, d) and _sgn(t1) != _sgn(t2):
                found = True
                break
        if found:
            break
    assert found
    out = hashed_token_features(_ds([[t1, t2]]), n_features=d) \
        .to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 2 and out["value"].iloc[0] == 0
    # linearity: value(doc+doc) == 2*value(doc)
    doc = [1, 2, 3, 4, 5, 1]
    a = hashed_token_features(_ds([doc]), n_features=8).to_pandas()
    b = hashed_token_features(_ds([doc + doc]), n_features=8) \
        .to_pandas()
    m = a.merge(b, on="bucket")
    assert (m["value_y"] == 2 * m["value_x"]).all()
    assert (m["n_y"] == 2 * m["n_x"]).all()
    with pytest.raises(ValueError):
        hashed_token_features(_ds([[1]]), n_features=0)


def test_hashed_bigrams_naive_parity():
    def _bb(a, b, d, seed=1):
        return ((a % (1 << 20)) * 2654435761
                + (b % (1 << 20)) * 2246822519
                + seed * 1315423911) % (1 << 32) % d

    def _bs(a, b, seed=1):
        return 1 - 2 * (((a % (1 << 20)) * 2246822519
                         + (b % (1 << 20)) * 2654435761
                         + seed * 2654435761) % (1 << 32) >> 31)

    rng = np.random.default_rng(19)
    docs = [rng.integers(0, 50000, size=int(rng.integers(0, 15)))
            .tolist() for _ in range(60)] + [[], [7]]
    out = hashed_token_features(_ds(docs), n_features=32,
                                ngram=2).to_pandas()
    exp = {}
    for i, d in enumerate(docs):
        for a, b in zip(d, d[1:]):
            k = (f"d{i}", _bb(a, b, 32))
            n, v = exp.get(k, (0, 0))
            exp[k] = (n + 1, v + _bs(a, b))
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert exp[(r.doc_id, r.bucket)] == (r.n, r.value)
    # short docs emit nothing; order matters: (a,b) != (b,a)
    one = hashed_token_features(_ds([[5, 9], [9, 5]]), n_features=1 << 16,
                                ngram=2).to_pandas()
    assert len(one) == 2
    assert one["bucket"].iloc[0] != one["bucket"].iloc[1]
    with pytest.raises(ValueError, match="ngram"):
        hashed_token_features(_ds([[1]]), ngram=3)
