"""Distributed topic modeling — the A6 analog (the one reference entry
point with no engine analog in round 1).

Reference: ``archived/train_topic_model.py:96-132`` builds a gensim
``Dictionary`` (``filter_extremes(no_below=5, no_above=0.6)``), converts
docs to bags-of-words, and fits LDA-Mallet (a Java Gibbs sampler).
Neither gensim nor Mallet ships here; the engine re-expresses the same
pipeline Ray-Data-first with a PLSA/LDA-style EM fit (public algorithm —
Hofmann's PLSA E/M steps with a symmetric Dirichlet-like smoothing prior;
deterministic seeded init, fixed iteration count):

* :func:`build_vocab` — distributed (word → doc-freq, term-freq) counts,
  ``filter_extremes``-equivalent gate, contiguous word ids. The model
  state is BOUNDED by ``max_vocab`` — that is what makes the broadcast
  topic-word matrix (K × V float64) a legitimate 100-TB design: the
  corpus streams, only the model is resident.
* :func:`fit_topics` — per-iteration: broadcast φ (topic-word), one
  ``map_batches`` E-step emitting per-batch PRE-AGGREGATED sparse
  (word_id, per-topic weight) partials, one ``groupby(word_id)`` sum,
  M-step normalization on the driver (V × K, vocab-bounded). The E-step
  is fully vectorized: word→id via dictionary-encode on batch uniques,
  per-doc θ updated by K bincounts over the (doc, word, cnt) triplets.
* :func:`doc_topics` — final per-doc mixture + argmax topic as a
  streaming pass (Dataset out, never materialized on the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum


def build_vocab(ds: Dataset, text_col: str = "text", no_below: int = 5,
                no_above: float = 0.6, max_vocab: int = 100_000,
                n_docs: int | None = None) -> pd.DataFrame:
    """Dictionary + ``filter_extremes`` analog: distributed per-batch
    (word, doc-freq, term-freq) partials → one groupby → frequency gate →
    contiguous ids (deterministic: sorted by (-doc_freq, word), truncated
    to ``max_vocab``). Returns a frame (word, word_id, doc_freq)."""
    import pyarrow.compute as pc

    if n_docs is None:
        n_docs = ds.count()

    def partial(t: pa.Table) -> pa.Table:
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(t[text_col]))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_of = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), n))
        tb = pa.table({"d": doc_of, "word": flat}).filter(
            pc.greater(pc.utf8_length(flat), 0))
        per_doc = tb.group_by(["d", "word"]).aggregate([([], "count_all")])
        out = per_doc.group_by("word").aggregate(
            [("d", "count"), ("count_all", "sum")])
        return out.rename_columns(["word", "df", "tf"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("df", alias_name="doc_freq"),
                                   Sum("tf", alias_name="term_freq"))
    pdf = counts.to_pandas()
    hi = no_above * n_docs
    pdf = pdf[(pdf["doc_freq"] >= no_below) & (pdf["doc_freq"] <= hi)]
    pdf = pdf.sort_values(["doc_freq", "word"],
                          ascending=[False, True], kind="stable") \
        .head(max_vocab).reset_index(drop=True)
    pdf["word_id"] = np.arange(len(pdf), dtype=np.int64)
    return pdf[["word", "word_id", "doc_freq"]]


def _batch_triplets(t: pa.Table, text_col: str, w2id: dict):
    """(doc_row, word_id, count) triplets for one batch, vectorized:
    split once, map word→id on batch-unique words only, run-length count
    per (doc, word). OOV words are dropped (gensim doc2bow behavior)."""
    import pyarrow.compute as pc
    words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t[text_col]))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(t), dtype=np.int64), n)
    if len(flat) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    de = flat.dictionary_encode()
    uniq = de.dictionary.to_pylist()
    codes = de.indices.to_numpy(zero_copy_only=False)
    uid = np.array([w2id.get(w, -1) for w in uniq], dtype=np.int64)
    wid = uid[codes]
    keep = wid >= 0
    wid, doc_of = wid[keep], doc_of[keep]
    order = np.lexsort((wid, doc_of))
    wid, doc_of = wid[order], doc_of[order]
    new = np.r_[True, (doc_of[1:] != doc_of[:-1]) | (wid[1:] != wid[:-1])]
    starts = np.r_[np.flatnonzero(new), len(wid)]
    cnt = np.diff(starts).astype(np.float64)
    return doc_of[starts[:-1]], wid[starts[:-1]], cnt


def _estep_arrays(doc_t, wid_t, cnt, n_docs, phi, inner_iters):
    """Vectorized PLSA E-step over one batch's triplets: returns the
    per-doc θ (n_docs × K) and per-triplet responsibilities (nnz × K)."""
    k = phi.shape[0]
    theta = np.full((n_docs, k), 1.0 / k)
    if len(wid_t) == 0:
        return theta, np.zeros((0, k))
    phi_w = phi[:, wid_t].T                        # (nnz, K)
    for _ in range(inner_iters):
        resp = theta[doc_t] * phi_w
        resp /= np.maximum(resp.sum(axis=1, keepdims=True), 1e-300)
        wr = resp * cnt[:, None]
        for j in range(k):
            theta[:, j] = np.bincount(doc_t, weights=wr[:, j],
                                      minlength=n_docs)[:n_docs]
        theta /= np.maximum(theta.sum(axis=1, keepdims=True), 1e-300)
    resp = theta[doc_t] * phi_w
    resp /= np.maximum(resp.sum(axis=1, keepdims=True), 1e-300)
    return theta, resp * cnt[:, None]


def fit_topics(ds: Dataset, vocab: pd.DataFrame, n_topics: int = 10,
               iters: int = 15, inner_iters: int = 10, beta: float = 0.01,
               seed: int = 29, text_col: str = "text",
               concurrency=(1, 8)) -> np.ndarray:
    """EM fit of the topic-word matrix φ (n_topics × V, rows sum to 1).

    Each iteration: ``ray.put(φ)`` once → one actor-pool ``map_batches``
    E-step (emits one sparse partial row per word present in the batch)
    → one ``groupby(word_id)`` sum of K weight columns → driver M-step
    (`V × K` floats, vocab-bounded). ``iters`` is fixed → deterministic
    given the seed (up to float reduction order)."""
    v = len(vocab)
    rng = np.random.default_rng(seed)
    phi = rng.random((n_topics, v)) + 0.1
    phi /= phi.sum(axis=1, keepdims=True)
    w2id = dict(zip(vocab["word"], vocab["word_id"].astype(int)))
    w2id_ref = ray.put(w2id)
    ds = ds.materialize()       # read the corpus once, iterate over blocks

    kcols = [f"t{j}" for j in range(n_topics)]

    from .partition import broadcast_get

    def make_estep(phi_ref):
        # task-pool closure: w2id deserializes once per worker (memoized
        # on its ref); φ is re-broadcast each iteration. A fresh actor
        # pool PER EM ITERATION paid ~2 s spin-up × iters before.
        def estep(t: pa.Table) -> pa.Table:
            w2id = broadcast_get(w2id_ref)
            phi_it = broadcast_get(phi_ref)
            doc_t, wid_t, cnt = _batch_triplets(t, text_col, w2id)
            _theta, wresp = _estep_arrays(doc_t, wid_t, cnt, len(t),
                                          phi_it, inner_iters)
            if len(wid_t) == 0:
                cols = {"word_id": pa.array([], type=pa.int64())}
                for c in kcols:
                    cols[c] = pa.array([], type=pa.float64())
                return pa.table(cols)
            wuniq, winv = np.unique(wid_t, return_inverse=True)
            cols = {"word_id": pa.array(wuniq)}
            for j, c in enumerate(kcols):
                cols[c] = pa.array(np.bincount(
                    winv, weights=wresp[:, j], minlength=len(wuniq)))
            return pa.table(cols)
        return estep

    for _ in range(iters):
        phi_ref = ray.put(phi)
        partials = ds.map_batches(make_estep(phi_ref),
                                  batch_format="pyarrow")
        agg = partials.groupby("word_id").aggregate(
            *[Sum(c, alias_name=c) for c in kcols]).to_pandas()
        new = np.full((n_topics, v), beta)
        wid = agg["word_id"].to_numpy(dtype=np.int64)
        for j, c in enumerate(kcols):
            new[j, wid] += agg[c].to_numpy(dtype=np.float64)
        phi = new / new.sum(axis=1, keepdims=True)
    return phi


def doc_topics(ds: Dataset, vocab: pd.DataFrame, phi: np.ndarray,
               id_col: str = "doc_id", text_col: str = "text",
               inner_iters: int = 10, concurrency=(1, 8)) -> Dataset:
    """Per-doc topic mixture + argmax topic (streaming; Dataset out)."""
    w2id_ref = ray.put(dict(zip(vocab["word"],
                                vocab["word_id"].astype(int))))
    phi_ref = ray.put(phi)
    k = phi.shape[0]

    from .partition import broadcast_get

    def transform(t: pa.Table) -> pa.Table:
        w2id = broadcast_get(w2id_ref)
        phi_w = broadcast_get(phi_ref)
        doc_t, wid_t, cnt = _batch_triplets(t, text_col, w2id)
        theta, _ = _estep_arrays(doc_t, wid_t, cnt, len(t),
                                 phi_w, inner_iters)
        mix = pa.FixedSizeListArray.from_arrays(
            pa.array(theta.reshape(-1)), k)
        return pa.table({
            id_col: t[id_col],
            "topic_mix": mix,
            "top_topic": pa.array(theta.argmax(axis=1).astype(np.int64)),
        })

    return ds.map_batches(transform, batch_format="pyarrow")


def topic_model_pipeline(ds: Dataset, n_topics: int = 10, iters: int = 10,
                         no_below: int = 5, no_above: float = 0.6,
                         max_vocab: int = 100_000, seed: int = 29,
                         id_col: str = "doc_id",
                         text_col: str = "text"):
    """Full A6 flow (``train_topic_model.py:96-132`` analog): vocab build
    + filter_extremes gate → EM topic fit → per-doc topic assignment.
    Returns (vocab frame, φ, per-doc Dataset)."""
    vocab = build_vocab(ds, text_col, no_below, no_above, max_vocab)
    phi = fit_topics(ds, vocab, n_topics=n_topics, iters=iters, seed=seed,
                     text_col=text_col)
    return vocab, phi, doc_topics(ds, vocab, phi, id_col, text_col)
