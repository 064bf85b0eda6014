"""Topic-model (A6 analog) tests: vocab gate parity with the reference's
filter_extremes semantics, and planted-topic recovery by the EM fit."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.topics import (
    build_vocab, doc_topics, fit_topics, topic_model_pipeline)


def _planted_corpus(n_docs=120, words_per_doc=30, seed=3):
    """3 topics with disjoint vocabularies; each doc drawn from one."""
    rng = np.random.default_rng(seed)
    vocabs = [[f"t{k}w{i}" for i in range(25)] for k in range(3)]
    texts, true = [], []
    for d in range(n_docs):
        k = d % 3
        texts.append(" ".join(rng.choice(vocabs[k], size=words_per_doc)))
        true.append(k)
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts, "true_topic": true})


def test_build_vocab_filter_extremes():
    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [
        "common rare alpha beta", "common alpha beta gamma",
        "common beta gamma delta", "common gamma delta alpha"]})
    ds = rd.from_arrow(pa.Table.from_pandas(docs))
    # 'common' in 4/4 docs -> above no_above=0.8 (hi=3.2) -> dropped;
    # 'rare' in 1 doc -> below no_below=2 -> dropped
    v = build_vocab(ds, no_below=2, no_above=0.8)
    assert "common" not in set(v["word"])
    assert "rare" not in set(v["word"])
    assert {"alpha", "beta", "gamma", "delta"} == set(v["word"])
    assert sorted(v["word_id"]) == list(range(4))


def test_topic_recovery_planted():
    docs = _planted_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(
        docs[["doc_id", "text"]]))
    vocab, phi, per_doc = topic_model_pipeline(
        ds, n_topics=3, iters=8, no_below=1, no_above=1.0, seed=7)
    assert phi.shape == (3, len(vocab))
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-9)
    out = per_doc.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["true"] = docs["true_topic"]
    # purity: every true topic maps to one dominant learned topic
    purity = out.groupby("true")["top_topic"].agg(
        lambda s: s.value_counts().iloc[0] / len(s))
    assert (purity >= 0.95).all(), purity
    # the 3 learned topics must be distinct
    assert out.groupby("true")["top_topic"].agg(
        lambda s: s.value_counts().index[0]).nunique() == 3
    # topic mixtures are proper distributions
    mix = np.stack(out["topic_mix"].to_numpy())
    np.testing.assert_allclose(mix.sum(axis=1), 1.0, rtol=1e-6)


def test_fit_deterministic_given_seed():
    docs = _planted_corpus(n_docs=30)
    ds = rd.from_arrow(pa.Table.from_pandas(docs[["doc_id", "text"]]))
    vocab = build_vocab(ds, no_below=1, no_above=1.0)
    p1 = fit_topics(ds, vocab, n_topics=3, iters=3, seed=11)
    p2 = fit_topics(rd.from_arrow(pa.Table.from_pandas(
        docs[["doc_id", "text"]])), vocab, n_topics=3, iters=3, seed=11)
    np.testing.assert_allclose(p1, p2, rtol=1e-9)
