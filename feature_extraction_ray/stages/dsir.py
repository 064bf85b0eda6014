"""DSIR data selection — importance resampling for LM pretraining data.

Implements the public DSIR recipe (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023): fit two
bag-of-n-gram multinomials — one on a small TARGET domain, one on the
RAW pool — score every raw document with its log importance weight
``Σ_f c_f(doc)·(ln p_target(f) − ln p_raw(f))``, then resample via the
Gumbel-top-k trick (deterministic seeded Gumbel noise per doc, so a
resumed run selects the identical subset).

Deviation from the paper, documented: the paper hashes n-grams into a
fixed bucket count to bound model size; this engine uses an EXPLICIT
top-V vocabulary (most-frequent unigram+bigram features, deterministic
``(count desc, feature asc)`` tie-break) with a single OOV bucket.
Same memory bound, but every model entry stays a readable n-gram and
the whole fit→score→select chain is exactly SQL-checkable (the hashed
variant's bucket function is not portable to the DuckDB oracle).

Ray plan (scale notes):
* fit — one ``map_batches`` partial-count pass per domain (Arrow
  dictionary-encode + bincount, no Python word loops) → ONE
  ``groupby(feat).sum`` exchange over the union → vocab-bounded model
  on the driver (top-V computed DATASET-side via sort+limit so the
  driver never holds the full n-gram vocabulary).
* score — model broadcast once (``ray.put``), fetched once per worker
  process via ``partition.cached_kernel``; scoring is one vectorized
  pass (unique-feature lookup only), zero shuffles.
* select — per-batch local top-k partials (each block emits ≤ k rows)
  merged once; the corpus never sorts globally and never lands on the
  driver.

No counterpart in the reference repo (it has no data-selection code);
this is part of the beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .text import _segment_sum, _split_flat

SEP = "\x1f"   # can't appear inside a whitespace-split token stream's
               # words in practice; same reserved separator the bigram
               # LM fit uses (stages/text.py)


# ---------------------------------------------------------------------------
# feature construction (unigram + bigram keys, prefix-disambiguated)
# ---------------------------------------------------------------------------

def _feature_streams(txt, use_bigrams: bool = True):
    """Whitespace-tokenize a text column and return the per-doc unigram
    and bigram feature-key streams: ``(ukeys, uoffs, bkeys, boffs)``
    where ``ukeys[uoffs[i]:uoffs[i+1]]`` are doc i's unigram keys
    ``"U\\x1fword"`` and ``bkeys`` likewise ``"B\\x1fw1\\x1fw2"`` for
    consecutive in-doc pairs. All-Arrow/NumPy; no per-row loops."""
    import pyarrow.compute as pc

    flat, _fl, offsets, real, n_real = _split_flat(txt)
    if real is not None:
        flat = flat.filter(pa.array(real))
        offs = np.zeros(len(n_real) + 1, dtype=np.int64)
        np.cumsum(n_real, out=offs[1:])
    else:
        offs = offsets
    if len(flat):
        ukeys = pc.binary_join_element_wise(pa.scalar("U"), flat, SEP)
    else:
        ukeys = pa.array([], type=pa.string())
    m = np.maximum(np.diff(offs) - 1, 0)          # bigrams per doc
    boffs = np.zeros(len(m) + 1, dtype=np.int64)
    np.cumsum(m, out=boffs[1:])
    tot = int(m.sum())
    if use_bigrams and tot:
        i1 = (np.arange(tot, dtype=np.int64)
              - np.repeat(np.cumsum(m) - m, m)
              + np.repeat(offs[:-1], m))
        bkeys = pc.binary_join_element_wise(
            pa.scalar("B"), flat.take(pa.array(i1)),
            flat.take(pa.array(i1 + 1)), SEP)
    else:
        bkeys = pa.array([], type=pa.string())
        if not use_bigrams:
            boffs = np.zeros(len(m) + 1, dtype=np.int64)
    return ukeys, offs, bkeys, boffs


def _count_partial(keys_list) -> pa.Table:
    """Partial counts over one batch's concatenated key streams:
    dictionary-encode once, bincount codes — ``(feat, cnt)``."""
    arrs = [k for k in keys_list if len(k)]
    if not arrs:
        return pa.table({"feat": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    keys = pa.concat_arrays([a.combine_chunks() if
                             isinstance(a, pa.ChunkedArray) else a
                             for a in arrs])
    de = keys.dictionary_encode()
    cnt = np.bincount(de.indices.to_numpy(zero_copy_only=False),
                      minlength=len(de.dictionary))
    return pa.table({"feat": de.dictionary.cast(pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64))})


# ---------------------------------------------------------------------------
# fit
# ---------------------------------------------------------------------------

def fit_dsir(target_ds: Dataset, raw_ds: Dataset, text_col: str = "text",
             top_v: int | None = None, alpha: float = 1.0,
             use_bigrams: bool = True) -> dict:
    """Fit the two DSIR multinomials over a SHARED vocabulary.

    One partial-count pass per domain (each emits ``(feat, ct, cr)``
    with the other domain's column zeroed), union → one
    ``groupby(feat)`` exchange. ``top_v`` bounds the model: the top-V
    features by combined count (ties → feature asc) stay explicit,
    everything else folds into one OOV bucket whose counts are the
    exact remainders — so ``Σ p = 1`` still holds and the model dict
    is at most V+1 entries regardless of corpus size.

    Per-feature log weight (add-``alpha`` smoothing over V+1 buckets),
    computed with the exact IEEE sequence the SQL oracle uses::

        lam_f = ln((ct_f + α)/(Nt + α(V+1))) − ln((cr_f + α)/(Nr + α(V+1)))

    Returns ``{"lam": {feat: λ}, "lam_oov": λ_oov, "n_target": Nt,
    "n_raw": Nr, "v": V, "alpha": α, "use_bigrams": bool}``.
    """
    from ray.data.aggregate import Sum

    def partials(which: str):
        def fn(t: pa.Table) -> pa.Table:
            uk, _uo, bk, _bo = _feature_streams(t[text_col], use_bigrams)
            c = _count_partial([uk, bk])
            zero = pa.array(np.zeros(len(c), dtype=np.int64))
            cols = {"feat": c["feat"],
                    "ct": c["cnt"] if which == "t" else zero,
                    "cr": c["cnt"] if which == "r" else zero}
            return pa.table(cols)
        return fn

    union = target_ds.map_batches(partials("t"), batch_format="pyarrow") \
        .union(raw_ds.map_batches(partials("r"), batch_format="pyarrow"))
    agg = union.groupby("feat").aggregate(
        Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr")) \
        .materialize()
    tot = agg.aggregate(Sum("ct", alias_name="nt"),
                        Sum("cr", alias_name="nr")) or {}
    n_t = int(tot.get("nt") or 0)
    n_r = int(tot.get("nr") or 0)

    if top_v is not None and agg.count() > top_v:
        # dataset-side cap: the driver only ever receives V rows
        def with_total(t: pa.Table) -> pa.Table:
            return t.append_column(
                "total", pa.array(
                    t["ct"].to_numpy(zero_copy_only=False)
                    + t["cr"].to_numpy(zero_copy_only=False)))
        vocab = agg.map_batches(with_total, batch_format="pyarrow") \
            .sort(["total", "feat"], descending=[True, False]) \
            .limit(top_v).to_pandas()
    else:
        vocab = agg.to_pandas().sort_values(
            ["feat"]).reset_index(drop=True)

    ct = vocab["ct"].to_numpy(dtype=np.float64)
    cr = vocab["cr"].to_numpy(dtype=np.float64)
    v = len(vocab)
    dent = float(n_t) + alpha * (v + 1)
    denr = float(n_r) + alpha * (v + 1)
    lam = np.log((ct + alpha) / dent) - np.log((cr + alpha) / denr)
    ct_oov = float(n_t - int(vocab["ct"].sum()))
    cr_oov = float(n_r - int(vocab["cr"].sum()))
    lam_oov = (np.log((ct_oov + alpha) / dent)
               - np.log((cr_oov + alpha) / denr))
    return {"lam": dict(zip(vocab["feat"], lam)),
            "lam_oov": float(lam_oov), "n_target": n_t, "n_raw": n_r,
            "v": v, "alpha": alpha, "use_bigrams": use_bigrams}


# ---------------------------------------------------------------------------
# score
# ---------------------------------------------------------------------------

class DsirScorer:
    """Scoring kernel (task-pool, memoized once per worker process via
    ``partition.cached_kernel``): per-doc ``(doc_id, n_feats, n_oov,
    logw)`` under a broadcast DSIR model. Vectorized — one tokenize per
    batch, model lookup over the batch's UNIQUE features only
    (dictionary-encode), per-doc sums are segmented adds."""

    def __init__(self, model_ref, text_col: str = "text"):
        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        self.lam = m["lam"]
        self.lam_oov = m["lam_oov"]
        self.use_bigrams = m["use_bigrams"]
        self.text_col = text_col

    def _stream_sums(self, keys, offs):
        """(per-doc λ sums, per-doc OOV counts) for one key stream."""
        n = len(offs) - 1
        if not len(keys):
            return (np.zeros(n, dtype=np.float64),
                    np.zeros(n, dtype=np.int64))
        de = keys.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        uniq = de.dictionary.to_pylist()
        lam_u = np.array([self.lam.get(k, self.lam_oov) for k in uniq],
                         dtype=np.float64)
        oov_u = np.array([k not in self.lam for k in uniq], dtype=np.int64)
        return (_segment_sum(lam_u[codes], offs),
                _segment_sum(oov_u[codes], offs))

    def __call__(self, batch: pa.Table) -> pa.Table:
        uk, uoffs, bk, boffs = _feature_streams(
            batch[self.text_col], self.use_bigrams)
        su, ou = self._stream_sums(uk, uoffs)
        sb, ob = self._stream_sums(bk, boffs)
        n_u = np.diff(uoffs)
        n_b = np.diff(boffs)
        n_feats = n_u + n_b
        keep = n_feats > 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_feats": pa.array(n_feats.astype(np.int64)),
            "n_oov": pa.array((ou + ob).astype(np.int64)),
            "logw": pa.array(su + sb),
        }).filter(pa.array(keep))


def dsir_scores(raw_ds: Dataset, model: dict | None = None,
                target_ds: Dataset | None = None,
                text_col: str = "text", **fit_kw) -> Dataset:
    """Fit (if no ``model`` given; requires ``target_ds``) + score:
    per-doc ``(doc_id, n_feats, n_oov, logw)`` log importance weights
    over the raw pool. Zero-shuffle broadcast scoring pass; empty docs
    (no features) drop out — they carry no evidence either way."""
    if model is None:
        if target_ds is None:
            raise ValueError("need model= or target_ds= to fit")
        model = fit_dsir(target_ds, raw_ds, text_col, **fit_kw)
    ref = ray.put(model)
    from .partition import cached_kernel

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(DsirScorer, ref, text_col)(batch)

    return raw_ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# select (Gumbel top-k resampling / plain top-k)
# ---------------------------------------------------------------------------

def gumbel_key(doc_id: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministic per-doc standard-Gumbel draw, SQL-portable:
    ``h = ((doc_id + seed)·2654435761) mod 2³²`` (Knuth multiplicative
    hash; the seed is added BEFORE the multiply so seed+1 lands on a
    completely different hash, not a neighboring one; exact in uint64
    for doc_id + seed < 2³² — the oracle twin computes the identical
    value in HUGEINT), ``u = (h + 0.5)/2³²`` ∈ (0,1),
    ``g = −ln(−ln(u))``. Same doc_id + seed ⇒ same noise on every
    machine and every resume."""
    h = ((doc_id.astype(np.uint64) + np.uint64(seed))
         * np.uint64(2654435761)) % np.uint64(4294967296)
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    return -np.log(-np.log(u))


def _round_np(x: np.ndarray, nd: int) -> np.ndarray:
    """DuckDB-bit-exact half-away-from-zero round (the numpy twin of
    ``pipelines.queries._round_arr``): floor(|x·10^nd| + 0.5)·sign/10^nd."""
    p = float(10 ** nd)
    scaled = x * p
    return np.floor(np.abs(scaled) + 0.5) * np.sign(scaled) / p


def dsir_select(scores: Dataset, k: int, seed: int = 0,
                temperature: float | None = 1.0,
                logw_col: str = "logw", id_col: str = "doc_id",
                key_round: int | None = None) -> pa.Table:
    """Select ``k`` docs from a scored pool. ``temperature=None`` takes
    the deterministic top-k by ``(logw desc, doc_id asc)``; a float T
    runs Gumbel-top-k — equivalent to sampling WITHOUT replacement with
    probability ∝ exp(logw/T) (the paper's resampling step), but fully
    deterministic given ``seed``. Adds the ``gkey`` column (= the
    sampling key actually ranked on). ``key_round`` rounds the key to
    that many decimals (DuckDB-exact sequence) BEFORE ranking so an SQL
    twin ranking its own fp-reassociated floats agrees exactly.

    Plan: each block emits its local top-k (the ``(key desc, id asc)``
    order is TOTAL — ids are unique — so plain head-k partials are
    exact), one bounded merge finishes; the pool is never globally
    sorted and never materializes on the driver beyond k·n_blocks rows.
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        lw = t[logw_col].to_numpy(zero_copy_only=False)
        key = lw if temperature is None else (
            lw / temperature
            + gumbel_key(t[id_col].to_numpy(zero_copy_only=False), seed))
        if key_round is not None:
            key = _round_np(key.astype(np.float64), key_round)
        t = t.append_column("gkey", pa.array(key.astype(np.float64)))
        idx = pc.sort_indices(t, sort_keys=[("gkey", "descending"),
                                            (id_col, "ascending")])
        return t.take(idx[:k])

    merged = scores.map_batches(partial, batch_format="pyarrow") \
        .to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in merged])
    idx = pc.sort_indices(tbl, sort_keys=[("gkey", "descending"),
                                          (id_col, "ascending")])
    return tbl.take(idx[:k])
