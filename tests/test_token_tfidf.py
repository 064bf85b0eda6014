"""Token-native TF-IDF (stages/tokengrams.token_tfidf)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import token_tfidf


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def test_tfidf_naive_parity():
    rng = np.random.default_rng(53)
    docs = [rng.integers(0, 60, size=int(rng.integers(0, 25)))
            .tolist() for _ in range(80)] + [[]]
    out = token_tfidf(_ds(docs), num_buckets=4).to_pandas()
    N = len(docs)
    tf, dfc = {}, {}
    for i, d in enumerate(docs):
        seen = set()
        for tk in d:
            tf[(f"d{i}", tk)] = tf.get((f"d{i}", tk), 0) + 1
            if tk not in seen:
                seen.add(tk)
                dfc[tk] = dfc.get(tk, 0) + 1
    assert len(out) == len(tf)
    nf = float(N)
    toks = sorted(dfc)
    idf = np.log(nf / np.array([dfc[t] for t in toks],
                               dtype=np.float64))
    idf_of = {t: v for t, v in zip(toks, idf)}
    for r in out.itertuples():
        assert tf[(r.doc_id, r.token)] == r.tf
        assert dfc[r.token] == r.df
        assert r.tfidf == float(r.tf) * idf_of[r.token]


def test_tfidf_properties_and_reject():
    # token in every doc → idf = ln(1) = 0 → tfidf 0 exactly
    out = token_tfidf(_ds([[7, 7, 1], [7, 2], [7]]),
                      num_buckets=2).to_pandas()
    sub = out[out["token"] == 7]
    assert (sub["df"] == 3).all() and (sub["tfidf"] == 0.0).all()
    assert sorted(sub["tf"]) == [1, 1, 2]
    with pytest.raises(ValueError, match="empty"):
        token_tfidf(_ds([]))
