"""Token-native n-gram operators over pre-tokenized sequences.

The engine's canonical input is the north-rule tokens table
(``doc_id:string, tokens:list<int32>, …`` — ``BASELINE.json:input_hint``,
``fixtures.py`` F1). The curation family in ``stages/curation.py``
shingles TEXT (word k-grams); these are their token-id twins, operating
directly on the ``list<int32>`` payload with no string materialization —
at 100 TB the tokenized form is the one on disk, and decoding back to
text just to re-shingle would double the read volume. Reference analog:
the per-call token streams the text-feature scripts consume
(``/root/reference/text_features/extract_verbosity_stats.py:10-36``
iterates word tokens per segment); gram semantics follow the public
Gopher-repetition / benchmark-decontamination recipes, same as the word
twins.

Gram identity: a ``k``-gram of int32 token ids. ``k == 1`` grams are the
biased ids themselves and ``k == 2`` grams are packed COLLISION-FREE into
uint64 (``(u0 << 32) | u1`` after biasing ids into ``[0, 2^32)``);
``k >= 3`` uses the same FNV-multiplier Horner convention as the word
shingler (``dedup._shingles_of_batch``) — collision odds are ~2⁻⁶⁴ per
pair and the unit tests verify every emitted count against exact
tuple-based naives.

Short-document convention (shared with the word shingler AND the SQL
oracles): a document with ``1 <= len < k`` tokens contributes ONE gram
spanning all its tokens; empty (or null) documents contribute none. In
DuckDB terms every document's gram list is
``[list_slice(tokens, i, i + k - 1) for i in 1 .. max(len - k + 1, 1)]``.

Scale shape: every op here is a zero-shuffle ``map_batches`` scan; the
only driver-side state is the (small by contract) eval-suite gram set,
broadcast once via ``ray.put``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .curation import _gram_run_stats
from .dedup import MinHasher as _MinHasher
from .dedup import SimHasher as _SimHasher
from .dedup import _scheme_id as _dedup_scheme_id
from .partition import broadcast_get, cached_kernel

_FNV = np.uint64(1099511628211)
_BIAS = np.int64(1) << np.int64(31)


def _biased_flat(col: pa.Array):
    """Flatten a ``list<int32>`` column → (uint64 ids in [0, 2^32),
    per-row lengths int64). Null lists count as empty."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.list_value_length(col)
    lengths = pc.fill_null(lengths, 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    u = (flat + _BIAS).astype(np.uint64)
    return u, lengths


def token_shingles_of_batch(batch: pa.Table, tokens_col: str, k: int,
                            unique: bool = True):
    """Vectorized token-id shingling for a whole batch: one flat pass
    over the concatenated token buffer (cross-doc windows masked), the
    word shingler's shape — returns ``(grams uint64, doc_offsets)``
    sorted ``(doc, gram)``; ``unique=False`` keeps duplicates for the
    repetition-statistics path."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u, row_len = _biased_flat(batch[tokens_col])
    n_docs = len(row_len)
    doc_of = np.repeat(np.arange(n_docs), row_len)
    N = len(u)
    valid_n = max(N - k + 1, 0)
    with np.errstate(over="ignore"):
        if valid_n:
            if k == 1:
                sh = u.copy()
            elif k == 2:
                sh = (u[:valid_n] << np.uint64(32)) | u[1:valid_n + 1]
            else:
                sh = u[:valid_n].copy()
                for j in range(1, k):
                    sh = sh * _FNV + u[j:valid_n + j]
            in_doc = doc_of[:valid_n] == doc_of[k - 1:] if k > 1 else \
                np.ones(valid_n, dtype=bool)
        else:
            sh = np.zeros(0, dtype=np.uint64)
            in_doc = np.zeros(0, dtype=bool)
        sh_doc = doc_of[:valid_n][in_doc]
        sh = sh[in_doc]
        # short docs (0 < len < k): one gram over all their tokens,
        # packed with the same k-dependent scheme restricted to len
        short = np.flatnonzero((row_len < k) & (row_len > 0))
        if len(short):
            starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(row_len, out=starts[1:])
            extra = np.empty(len(short), dtype=np.uint64)
            for i, d in enumerate(short):
                seg = u[starts[d]:starts[d + 1]]
                h = seg[0]
                for x in seg[1:]:
                    h = h * _FNV + x
                extra[i] = h
            sh = np.concatenate([sh, extra])
            sh_doc = np.concatenate([sh_doc, short.astype(np.int64)])
    order = np.lexsort((sh, sh_doc))
    sh, sh_doc = sh[order], sh_doc[order]
    if unique and len(sh):
        keep = np.r_[True, (sh[1:] != sh[:-1]) |
                     (sh_doc[1:] != sh_doc[:-1])]
        sh, sh_doc = sh[keep], sh_doc[keep]
    counts = np.bincount(sh_doc, minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return sh, offsets


# ---------------------------------------------------------------------------
# Gopher-style repetition over token ids
# ---------------------------------------------------------------------------

def token_repetition_stats(ds: Dataset, tokens_col: str = "tokens",
                           id_cols: Sequence[str] = ("doc_id",),
                           k: int = 2) -> Dataset:
    """Per-document token ``k``-gram occurrence counts — ``n_grams``
    (with repeats), ``n_distinct``, ``max_count`` — the integer
    numerators/denominators of the Gopher repetition filters computed
    on the pre-tokenized payload. Integers only (oracle-exact); zero
    shuffles; empty documents yield no row."""
    def stats(batch: pa.Table) -> pa.Table:
        sh, offsets = token_shingles_of_batch(batch, tokens_col, k,
                                              unique=False)
        n_grams = offsets[1:] - offsets[:-1]
        n_distinct, max_count = _gram_run_stats(sh, n_grams)
        keep = n_grams > 0
        cols = {c: batch[c].filter(pa.array(keep)) for c in id_cols}
        cols["n_grams"] = pa.array(n_grams[keep], type=pa.int64())
        cols["n_distinct"] = pa.array(n_distinct[keep], type=pa.int64())
        cols["max_count"] = pa.array(max_count[keep], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow")


def token_repetition_filter(ds: Dataset, tokens_col: str = "tokens",
                            k: int = 2, max_dup_pct: int = 30,
                            max_top_pct: int = 20) -> Dataset:
    """Gate documents on the :func:`token_repetition_stats` signals in
    exact integer arithmetic inline with the stream (no join): keep docs
    where duplicated-gram fraction ≤ ``max_dup_pct``% AND the top gram's
    share ≤ ``max_top_pct``%."""
    def gate(batch: pa.Table) -> pa.Table:
        sh, offsets = token_shingles_of_batch(batch, tokens_col, k,
                                              unique=False)
        n_grams = offsets[1:] - offsets[:-1]
        n_distinct, max_count = _gram_run_stats(sh, n_grams)
        ok = ((n_grams - n_distinct) * 100 <= max_dup_pct * n_grams) & \
             (max_count * 100 <= max_top_pct * n_grams) & (n_grams > 0)
        return batch.filter(pa.array(ok))

    return ds.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# context-window chunking + vocabulary remap
# ---------------------------------------------------------------------------

def token_chunks(ds: Dataset, tokens_col: str = "tokens",
                 id_col: str = "doc_id", window: int = 512,
                 stride: int = 256, drop_last: bool = False) -> Dataset:
    """Split every document's token array into overlapping context
    windows — the long-document → model-context preprocessing step
    (embedding inference, chunked retrieval, sliding-window training).
    Emits one row per chunk: ``id_col``, ``chunk_idx`` (0-based),
    ``tokens_col`` (the window slice), ``n_tok`` (its length).

    Chunk starts are ``0, stride, 2·stride, …`` while ``start <
    len`` (so a doc shorter than ``window`` yields exactly one chunk —
    empty docs yield none); the final window is the possibly-short tail
    unless ``drop_last=True`` drops trailing chunks shorter than
    ``window`` EXCEPT a doc's first (a short doc keeps its only chunk).
    Zero shuffles — one vectorized gather per batch (flat index
    arithmetic, no Python loop over docs or chunks)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        n = len(lengths)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        n_chunks = np.where(lengths > 0,
                            (np.maximum(lengths - 1, 0) // stride) + 1, 0)
        doc_of = np.repeat(np.arange(n), n_chunks)
        total = int(n_chunks.sum())
        first = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=first[1:])
        cidx = np.arange(total, dtype=np.int64) - first[doc_of]
        c_start = cidx * stride
        c_len = np.minimum(c_start + window, lengths[doc_of]) - c_start
        if drop_last:
            keep = (c_len >= window) | (cidx == 0)
            doc_of, cidx = doc_of[keep], cidx[keep]
            c_start, c_len = c_start[keep], c_len[keep]
            total = len(cidx)
        # flat gather indices: one arange per chunk, clipped per length
        offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(c_len, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - \
            np.repeat(offs[:-1], c_len)
        gidx = np.repeat(starts[doc_of] + c_start, c_len) + pos
        vals = flat.take(pa.array(gidx))
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(doc_of)),
            "chunk_idx": pa.array(cidx),
            tokens_col: pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32), type=pa.int32()), vals),
            "n_tok": pa.array(c_len),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def remap_token_ids(ds: Dataset, mapping: dict | "np.ndarray",
                    tokens_col: str = "tokens",
                    unk_id: int | None = None,
                    drop_unmapped: bool = False) -> Dataset:
    """Vocabulary migration: rewrite every token id through a broadcast
    old→new mapping (tokenizer version bumps, vocab merges/reorders).
    ``mapping`` is a dict or a dense array indexed by old id. Ids
    outside the mapping become ``unk_id`` (or are dropped when
    ``drop_unmapped=True``; one of the two must be chosen if any id is
    unmapped — unmapped ids with neither policy raise). Zero shuffles;
    one ``ray.put`` of the (sorted-key, value) arrays, one searchsorted
    gather per batch."""
    if isinstance(mapping, dict):
        keys = np.fromiter(mapping.keys(), dtype=np.int64,
                           count=len(mapping))
        vals = np.fromiter(mapping.values(), dtype=np.int64,
                           count=len(mapping))
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
    else:
        arr = np.asarray(mapping, dtype=np.int64)
        keys = np.arange(len(arr), dtype=np.int64)
        vals = arr
    ref = ray.put({"keys": keys, "vals": vals})

    def remap(batch: pa.Table) -> pa.Table:
        tab = broadcast_get(ref)
        k, v = tab["keys"], tab["vals"]
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(flat):
            idx = np.searchsorted(k, flat)
            idx[idx == len(k)] = 0
            hit = (k[idx] == flat) if len(k) else \
                np.zeros(len(flat), dtype=bool)
            out = np.where(hit, v[idx] if len(k) else 0, -1)
            if not hit.all():
                if drop_unmapped:
                    doc_of = np.repeat(np.arange(len(lengths)), lengths)
                    lengths = np.bincount(doc_of[hit],
                                          minlength=len(lengths))
                    out = out[hit]
                elif unk_id is not None:
                    out = np.where(hit, out, unk_id)
                else:
                    bad = int(flat[~hit][0])
                    raise ValueError(
                        f"remap_token_ids: id {bad} has no mapping; "
                        f"pass unk_id= or drop_unmapped=True")
        else:
            out = np.zeros(0, dtype=np.int64)
        offs = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        new = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), type=pa.int32()),
            pa.array(out.astype(np.int32), type=pa.int32()))
        return batch.set_column(batch.column_names.index(tokens_col),
                                pa.field(tokens_col,
                                         pa.list_(pa.int32())), new)

    return ds.map_batches(remap, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-table profiler (ingest QA)
# ---------------------------------------------------------------------------

def token_profile(ds: Dataset, tokens_col: str = "tokens") -> "object":
    """One-row QA profile of a token table — the ingest sanity check a
    100-TB tokenized corpus gets before any pipeline runs. Exact
    integers only: ``n_docs``, ``n_empty_docs`` (empty or null lists),
    ``n_tokens``, ``min_len``/``max_len``/``median_len`` (non-empty
    docs; median = DuckDB ``quantile_disc`` convention, the sorted
    value at 1-based index ``max(1, ceil(n/2))``), ``vocab_size``
    (distinct ids), ``top_token``/``top_count`` (most frequent id,
    smallest-id tie-break).

    Scale shape: one streamed pass emits per-block (length, count) and
    (token, count) partials — both bounded by the block's distinct
    values — packed into one key and summed through ONE
    ``groupby().sum`` exchange, so the driver receives at most
    vocab + distinct-length rows regardless of corpus or block count.
    Returns a one-row pandas DataFrame."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        _, lengths = _biased_flat(t[tokens_col])
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        lu, lc = np.unique(lengths, return_counts=True)
        tu, tc = (np.unique(flat, return_counts=True) if len(flat)
                  else (np.zeros(0, dtype=np.int64),
                        np.zeros(0, dtype=np.int64)))
        # one packed key: value*2 + kind (kind 0 = length, 1 = token id
        # biased non-negative) — single-key groupby stays on Ray's fast
        # path where the 2-key aggregate is the slow one
        key = np.r_[lu * 2, (tu.astype(np.int64) + (1 << 31)) * 2 + 1]
        return pa.table({
            "key": pa.array(key.astype(np.int64)),
            "cnt": pa.array(np.r_[lc, tc].astype(np.int64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    key = agg["key"].to_numpy()
    cnt = agg["cnt"].to_numpy()
    is_tok = (key % 2) == 1
    lv = pd.Series(cnt[~is_tok], index=key[~is_tok] // 2).sort_index()
    tv = pd.Series(cnt[is_tok],
                   index=key[is_tok] // 2 - (1 << 31)).sort_index()
    n_docs = int(lv.sum())
    n_empty = int(lv.get(0, 0))
    n_tokens = int((lv.index.to_numpy() * lv.to_numpy()).sum())
    ne = lv[lv.index > 0]
    if len(ne):
        vals = ne.index.to_numpy()
        cnts = ne.to_numpy()
        cum = np.cumsum(cnts)
        target = max(1, -(-int(cum[-1]) // 2))   # ceil(n/2), 1-based
        med = int(vals[np.searchsorted(cum, target)])
        mn, mx = int(vals[0]), int(vals[-1])
    else:
        med = mn = mx = None
    if len(tv):
        c = tv.to_numpy()
        i = np.lexsort((tv.index.to_numpy(), -c))[0]
        top_token, top_count = int(tv.index[i]), int(c[i])
        vocab = int(len(tv))
    else:
        top_token = top_count = None
        vocab = 0
    return pd.DataFrame({
        "n_docs": [n_docs], "n_empty_docs": [n_empty],
        "n_tokens": [n_tokens], "min_len": [mn], "max_len": [mx],
        "median_len": [med], "vocab_size": [vocab],
        "top_token": [top_token], "top_count": [top_count],
    })


# ---------------------------------------------------------------------------
# token-native MinHash near-dup dedup
# ---------------------------------------------------------------------------

class TokenMinHasher(_MinHasher):
    """MinHasher with the shingler swapped for token-id grams and its
    own scheme family, so a token store can never silently mix with a
    word-gram store (the ``sig_scheme`` loud-mismatch contract)."""

    SCHEME_FAMILY = "minhash-muladd2^64-tokgram-band"

    def _batch_shingles(self, batch: pa.Table):
        return token_shingles_of_batch(batch, self.text_col,
                                       self.shingle_k)


def token_minhash_signatures(ds: Dataset, tokens_col: str = "tokens",
                             id_col: str = "doc_id", num_perm: int = 128,
                             bands: int = 16,
                             shingle_k: int = 8) -> Dataset:
    """MinHash signatures computed from token-id ``shingle_k``-grams —
    the signature feed for the near-dup stack run natively on the
    pre-tokenized payload (no text decode). Same schema as
    ``dedup.minhash_signatures``."""
    def sign(batch: pa.Table) -> pa.Table:
        return cached_kernel(TokenMinHasher, tokens_col, id_col,
                             num_perm, bands, shingle_k)(batch)

    return ds.map_batches(sign, batch_format="pyarrow")


def token_minhash_lsh_dedup(ds: Dataset, tokens_col: str = "tokens",
                            id_col: str = "doc_id", num_perm: int = 128,
                            bands: int = 16, shingle_k: int = 8,
                            threshold: float = 0.8,
                            num_buckets: int | None = None,
                            output: str = "pandas",
                            pairing: str = "all"):
    """Full near-dup pipeline over token ids: token-gram signatures →
    the SAME banded-candidate / signature-verification / connected-
    components stack as the text path (``dedup.minhash_lsh_dedup`` with
    ``sig_ds=`` — only the shingler differs). ``id_col`` must be
    int64-castable (the clustering stage's contract, same as the text
    path)."""
    from .dedup import minhash_lsh_dedup
    sig = token_minhash_signatures(ds, tokens_col, id_col, num_perm,
                                   bands, shingle_k).materialize()
    return minhash_lsh_dedup(ds, id_col=id_col, num_perm=num_perm,
                             bands=bands, shingle_k=shingle_k,
                             threshold=threshold, num_buckets=num_buckets,
                             output=output, sig_ds=sig, pairing=pairing)


# ---------------------------------------------------------------------------
# token-native SimHash near-dup dedup
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 avalanche — spreads small token ids over
    all 64 bits (word SimHash gets this for free from string FNV; raw
    ids would concentrate votes in the low bits)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class TokenSimHasher(_SimHasher):
    """SimHash with token-id features: each token contributes one
    splitmix64-avalanched 64-bit feature; votes/bands shared with the
    word hasher, distinct scheme so word stores fail loudly if mixed."""

    def __init__(self, tokens_col: str, id_col: str):
        super().__init__(tokens_col, id_col)
        self.scheme = _dedup_scheme_id("simhash-splitmix64-tok-4x16bands")

    def _batch_features(self, batch: pa.Table):
        u, row_len = _biased_flat(batch[self.text_col])
        return _splitmix64(u), row_len


def token_simhash_signatures(ds: Dataset, tokens_col: str = "tokens",
                             id_col: str = "doc_id") -> Dataset:
    """SimHash signatures from token ids (no text decode) — same schema
    and banded layout as ``dedup.simhash_signatures``."""
    def sign(batch: pa.Table) -> pa.Table:
        return cached_kernel(TokenSimHasher, tokens_col, id_col)(batch)

    return ds.map_batches(sign, batch_format="pyarrow")


def token_simhash_dedup(ds: Dataset, tokens_col: str = "tokens",
                        id_col: str = "doc_id", max_hamming: int = 3,
                        num_buckets: int | None = None,
                        output: str = "pandas"):
    """Banded-Hamming near-dup clustering over token-id SimHashes —
    ``dedup.simhash_dedup`` with the signature source swapped via
    ``sig_ds``; ``id_col`` must be int64-castable (clustering-stage
    contract)."""
    from .dedup import simhash_dedup
    sig = token_simhash_signatures(ds, tokens_col, id_col).materialize()
    return simhash_dedup(ds, id_col=id_col, max_hamming=max_hamming,
                         num_buckets=num_buckets, output=output,
                         sig_ds=sig)


# ---------------------------------------------------------------------------
# unigram-LM surprisal over token ids (perplexity-style quality scoring)
# ---------------------------------------------------------------------------

def fit_token_unigram_lm(ds: Dataset, tokens_col: str = "tokens",
                         top_k: int | None = None) -> dict:
    """Distributed unigram LM over token ids: per-batch partial counts
    (unique + bincount over the flat id buffer) → one small
    ``groupby(token).sum()`` exchange → driver-side sorted lookup
    (int32 tokens + float64 logprobs — a real tokenizer vocab is ≤ a
    few hundred k ids, trivially driver-sized; ``top_k`` caps it anyway,
    most-frequent first with smaller-id tie-break, capped-out ids score
    as OOV at floor 1/total)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.int32()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"token": pa.array(u, type=pa.int32()),
                         "cnt": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    total = int(counts["cnt"].sum())
    tok = counts["token"].to_numpy(dtype=np.int64)
    cnt = counts["cnt"].to_numpy(dtype=np.int64)
    if top_k is not None and len(tok) > top_k:
        sel = np.lexsort((tok, -cnt))[:top_k]
        tok, cnt = tok[sel], cnt[sel]
    order = np.argsort(tok)
    tok, cnt = tok[order], cnt[order]
    lp = np.log(cnt.astype(np.float64) / max(total, 1))
    return {"tokens": tok.astype(np.int32), "logprob": lp, "total": total}


class _TokenSurprisalScorer:
    """Per-worker kernel: broadcast (sorted token ids, logprobs); per
    batch one searchsorted lookup over the flat buffer + per-doc
    segmented sums. OOV ids (top_k-capped fits) score at ln(1/total)."""

    def __init__(self, lm_ref, tokens_col: str):
        lm = broadcast_get(lm_ref)
        self.tok = lm["tokens"].astype(np.int64)
        self.lp = lm["logprob"]
        self.floor = -np.log(max(lm["total"], 1))
        self.tokens_col = tokens_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(flat):
            if len(self.tok):
                idx = np.searchsorted(self.tok, flat)
                idx[idx == len(self.tok)] = 0
                vals = np.where(self.tok[idx] == flat, self.lp[idx],
                                self.floor)
            else:
                vals = np.full(len(flat), self.floor)
            from .text import _segment_sum
            offs = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offs[1:])
            sums = _segment_sum(vals, offs)
        else:
            sums = np.zeros(len(batch), dtype=np.float64)
        keep = lengths > 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tok": pa.array(lengths, type=pa.int64()),
            "sum_logprob": pa.array(sums),
        }).filter(pa.array(keep))


def token_surprisal_scores(ds: Dataset, lm: dict | None = None,
                           tokens_col: str = "tokens") -> Dataset:
    """Fit (if no ``lm``) + score: per-doc ``(doc_id, n_tok,
    sum_logprob)`` under the corpus token-unigram LM — the CCNet/Gopher
    perplexity-filter shape run natively on the pre-tokenized payload.
    Zero-token docs are dropped (no distribution). Per-doc sums are
    segmented left-to-right reduceat adds; oracle comparisons round
    (ln values are irrational → boundary-safe, the established
    convention)."""
    if lm is None:
        lm = fit_token_unigram_lm(ds, tokens_col)
    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_TokenSurprisalScorer, ref, tokens_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination over token ids
# ---------------------------------------------------------------------------

def token_eval_gram_hashes(eval_ds: Dataset, tokens_col: str = "tokens",
                           k: int = 3) -> np.ndarray:
    """Sorted uint64 grams of every distinct token ``k``-gram in the
    eval set. Driver-side BY DESIGN (benchmark suites are small; the
    corpus never lands on the driver)."""
    def grams(batch: pa.Table) -> pa.Table:
        sh, _ = token_shingles_of_batch(batch, tokens_col, k)
        return pa.table({"g": pa.array(np.unique(sh), type=pa.uint64())})

    rows = eval_ds.map_batches(grams, batch_format="pyarrow").take_all()
    if not rows:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.array([r["g"] for r in rows], dtype=np.uint64))


class _TokenDecontamScorer:
    """Per-worker kernel: broadcast eval-gram membership via one
    ``searchsorted`` per batch (zero-copy per-process fetch through
    ``broadcast_get``)."""

    def __init__(self, grams_ref, tokens_col: str, k: int):
        self.grams_ref = grams_ref
        self.tokens_col = tokens_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams = broadcast_get(self.grams_ref)
        sh, offsets = token_shingles_of_batch(batch, self.tokens_col,
                                              self.k)
        n_overlap = np.zeros(len(batch), dtype=np.int64)
        if len(sh) and len(grams):
            idx = np.searchsorted(grams, sh)
            idx[idx == len(grams)] = 0
            hit = grams[idx] == sh
            seg_len = offsets[1:] - offsets[:-1]
            doc_of = np.repeat(np.arange(len(batch)), seg_len)
            n_overlap += np.bincount(doc_of[hit], minlength=len(batch)
                                     ).astype(np.int64)
        batch = batch.append_column(
            "n_overlap", pa.array(n_overlap, type=pa.int64()))
        return batch.append_column(
            "keep", pa.array(n_overlap == 0, type=pa.bool_()))


def _token_gram_positions(batch: pa.Table, tokens_col: str, k: int):
    """Every FULL-WINDOW token ``k``-gram with its 0-based position:
    ``(gram uint64, doc_index int64, pos int64)``. No short-doc
    fallback — a doc with < k tokens has no removable span (the
    span-removal convention; mirrors ``curation._gram_positions``)."""
    u, row_len = _biased_flat(batch[tokens_col])
    n_docs = len(row_len)
    doc_of = np.repeat(np.arange(n_docs), row_len)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(row_len, out=starts[1:])
    valid_n = max(len(u) - k + 1, 0)
    if not valid_n:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros(0, dtype=np.uint64), z, z
    with np.errstate(over="ignore"):
        if k == 1:
            sh = u.copy()
        elif k == 2:
            sh = (u[:valid_n] << np.uint64(32)) | u[1:valid_n + 1]
        else:
            sh = u[:valid_n].copy()
            for j in range(1, k):
                sh = sh * _FNV + u[j:valid_n + j]
    in_doc = doc_of[:valid_n] == doc_of[k - 1:] if k > 1 else \
        np.ones(valid_n, dtype=bool)
    doc = doc_of[:valid_n][in_doc]
    pos = np.arange(valid_n, dtype=np.int64)[in_doc] - starts[doc]
    return sh[in_doc], doc, pos


def _span_explode_factory(tokens_col: str, id_col: str, k: int):
    def explode(batch: pa.Table) -> pa.Table:
        sh, doc, pos = _token_gram_positions(batch, tokens_col, k)
        ids = batch[id_col].take(pa.array(doc))
        return pa.table({"gram": pa.array(sh, type=pa.uint64()),
                         id_col: ids,
                         "pos": pa.array(pos, type=pa.int64())})
    return explode


def _dup_occurrences_factory(id_col: str, min_docs: int,
                             keep_canonical: bool):
    """Per-gram-bucket kernel: keep only occurrences of grams seen in
    >= min_docs DISTINCT docs; optionally spare each dup gram's
    lexicographically-first (doc, pos) occurrence."""
    def dup_occurrences(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.drop_columns(["gram"])
        g = tbl["gram"].to_numpy(zero_copy_only=False)
        d_raw = tbl[id_col].to_numpy(zero_copy_only=False)
        p = tbl["pos"].to_numpy(zero_copy_only=False)
        # codes sorted by doc id so lexicographic (doc, pos) order is
        # meaningful for the canonical-copy rule
        _, d = np.unique(d_raw, return_inverse=True)
        order = np.lexsort((p, d, g))
        gs, ds_, = g[order], d[order]
        pair_start = np.r_[True, (gs[1:] != gs[:-1]) |
                           (ds_[1:] != ds_[:-1])]
        gram_start = np.r_[True, gs[1:] != gs[:-1]]
        gram_id = np.cumsum(gram_start) - 1
        ndocs = np.bincount(gram_id[pair_start])
        keep = ndocs[gram_id] >= min_docs
        if keep_canonical:
            keep &= ~gram_start  # first (doc,pos) of each dup gram spared
        out = np.zeros(len(tbl), dtype=bool)
        out[order] = keep
        return tbl.filter(pa.array(out)).drop_columns(["gram"])
    return dup_occurrences


def _span_tag_fns(tokens_col: str, id_col: str):
    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            tokens_col: batch[tokens_col],
            "pos": pa.nulls(len(batch), pa.int64()),
        })

    def tag_occ(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            tokens_col: pa.nulls(len(batch), pa.list_(pa.int32())),
            "pos": batch["pos"],
        })
    return tag_docs, tag_occ


def _span_rebuild_factory(tokens_col: str, id_col: str, k: int):
    """Per-doc-bucket kernel: interval-paint covered positions over the
    flat token buffer (delta + cumsum), re-pack survivors."""
    def rebuild(tbl: pa.Table) -> pa.Table:
        is_doc = pc.is_null(tbl["pos"])
        docs = tbl.filter(is_doc)
        occr = tbl.filter(pc.invert(is_doc))
        n = len(docs)
        if n == 0:
            return pa.table({
                id_col: docs[id_col],
                tokens_col: pa.array([], type=pa.list_(pa.int32())),
                "n_tok_clean": pa.array([], type=pa.int64()),
                "n_removed": pa.array([], type=pa.int64())})
        ids = docs[id_col].to_numpy(zero_copy_only=False)
        sort = np.argsort(ids, kind="stable")
        docs = docs.take(pa.array(sort))
        ids = ids[sort]
        u, row_len = _biased_flat(docs[tokens_col])
        tok_col = docs[tokens_col]
        if isinstance(tok_col, pa.ChunkedArray):
            tok_col = tok_col.combine_chunks()
        flat = tok_col.flatten().combine_chunks() if isinstance(
            tok_col.flatten(), pa.ChunkedArray) else tok_col.flatten()
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(row_len, out=starts[1:])
        total = int(starts[-1])
        delta = np.zeros(total + 1, dtype=np.int64)
        if len(occr):
            o_ids = occr[id_col].to_numpy(zero_copy_only=False)
            o_pos = occr["pos"].to_numpy(zero_copy_only=False)
            didx = np.searchsorted(ids, o_ids)
            s_idx = starts[didx] + o_pos
            e_idx = starts[didx] + np.minimum(o_pos + k, row_len[didx])
            np.add.at(delta, s_idx, 1)
            np.add.at(delta, e_idx, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        doc_of = np.repeat(np.arange(n), row_len)
        new_len = np.bincount(doc_of[keep], minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_len, out=offsets[1:])
        clean = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            flat.filter(pa.array(keep)))
        return pa.table({
            id_col: docs[id_col],
            tokens_col: clean,
            "n_tok_clean": pa.array(new_len),
            "n_removed": pa.array(row_len - new_len, type=pa.int64())})
    return rebuild


def remove_duplicate_token_spans(ds: Dataset, tokens_col: str = "tokens",
                                 id_col: str = "doc_id", k: int = 8,
                                 min_docs: int = 2,
                                 keep_canonical: bool = False,
                                 num_buckets: int = 32) -> Dataset:
    """Cut cross-document duplicated spans OUT of the token streams —
    the removal action of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2022), at token-``k``-gram granularity:
    a gram occurring in ≥ ``min_docs`` DISTINCT documents marks every
    token position any of its occurrences covers; covered positions are
    deleted and the survivors re-packed in order. Emits one row per
    input document: ``id_col``, cleaned ``tokens_col``, ``n_tok_clean``,
    ``n_removed`` (a fully-duplicated document comes back with an empty
    token list, not dropped — the caller decides). Within-doc-only
    repetition is untouched (``min_docs`` counts DISTINCT docs).

    ``keep_canonical=True`` spares each dup gram's lexicographically
    first ``(doc_id, pos)`` occurrence (Lee et al. keep one copy); note
    a spared occurrence's positions may still fall to OTHER overlapping
    dup grams — inherent to gram granularity.

    Scale shape: TWO bucketed exchanges and zero driver state — grams
    bucket by hash (each gram decided wholly inside one task), surviving
    ``(doc, pos)`` rows + the corpus itself union-bucket by document for
    a vectorized interval-paint rebuild (delta array + cumsum over the
    flat token buffer; no Python loop over rows or spans). For the
    resumable variant see
    :func:`remove_duplicate_token_spans_checkpointed`."""
    from .window import bucketed_apply

    grams = ds.select_columns([id_col, tokens_col]).map_batches(
        _span_explode_factory(tokens_col, id_col, k),
        batch_format="pyarrow")
    occ = bucketed_apply(
        grams, "gram",
        _dup_occurrences_factory(id_col, min_docs, keep_canonical),
        num_buckets=num_buckets)
    tag_docs, tag_occ = _span_tag_fns(tokens_col, id_col)
    tagged = ds.select_columns([id_col, tokens_col]).map_batches(
        tag_docs, batch_format="pyarrow").union(
        occ.map_batches(tag_occ, batch_format="pyarrow"))
    return bucketed_apply(tagged, id_col,
                          _span_rebuild_factory(tokens_col, id_col, k),
                          num_buckets=num_buckets, drop_bucket=False)


def remove_duplicate_token_spans_checkpointed(
        input_paths, ckpt_dir: str, *, tokens_col: str = "tokens",
        id_col: str = "doc_id", k: int = 8, min_docs: int = 2,
        keep_canonical: bool = False, occ_buckets: int = 32,
        rebuild_buckets: int = 16) -> dict:
    """Resumable span removal: both exchanges land in per-partition
    checkpoint directories with lineage manifests (the
    ``minhash_lsh_dedup_checkpointed`` pattern), so a killed 100-TB
    span-dedup resumes at one-bucket granularity and a parameter change
    invalidates exactly the stages it affects.

    Layout under ``ckpt_dir``::

        occ/      part-{hash(gram) % occ_buckets}.parquet  + manifests
        rebuild/  part-{hash(doc_id) % rebuild_buckets}.parquet

    The cleaned corpus is ``checkpoint.read_result(ckpt_dir +
    "/rebuild")`` (or stream the verified files). A resumed run
    byte-compares equal to an uninterrupted one after a doc_id sort
    (tested). Returns per-stage stats + fingerprints."""
    import glob as _glob
    import os

    import ray.data as rd

    from ..state import checkpoint as CP
    from .dedup import _fp16

    if isinstance(input_paths, str):
        files = sorted(_glob.glob(os.path.join(input_paths,
                                               "*.parquet"))) \
            if os.path.isdir(input_paths) else [input_paths]
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError(
            "remove_duplicate_token_spans_checkpointed: no input files")
    fp_in = CP.input_fingerprint_of(files)
    fp_occ = _fp16(fp_in, "token-span-occ", k, min_docs,
                   keep_canonical, occ_buckets)
    fp_rebuild = _fp16(fp_occ, "token-span-rebuild", rebuild_buckets)
    occ_dir = os.path.join(ckpt_dir, "occ")
    rebuild_dir = os.path.join(ckpt_dir, "rebuild")

    docs = rd.read_parquet(files, columns=[id_col, tokens_col])
    if CP.missing_partitions(occ_dir, fp_occ, occ_buckets):
        grams = docs.map_batches(
            _span_explode_factory(tokens_col, id_col, k),
            batch_format="pyarrow")
        s_occ = CP.run_partitioned(
            grams, occ_dir, entity_col="gram", num_buckets=occ_buckets,
            input_fingerprint=fp_occ,
            process_fn=_dup_occurrences_factory(id_col, min_docs,
                                                keep_canonical))
    else:
        s_occ = {"written": [], "skipped": list(range(occ_buckets)),
                 "rows": 0}
    occ_files = CP.verified_files(occ_dir, fp_occ)

    if CP.missing_partitions(rebuild_dir, fp_rebuild, rebuild_buckets):
        tag_docs, tag_occ = _span_tag_fns(tokens_col, id_col)
        occ_rows = rd.read_parquet(occ_files) if occ_files else None
        tagged = docs.map_batches(tag_docs, batch_format="pyarrow")
        if occ_rows is not None:
            tagged = tagged.union(occ_rows.map_batches(
                tag_occ, batch_format="pyarrow"))
        s_rebuild = CP.run_partitioned(
            tagged, rebuild_dir, entity_col=id_col,
            num_buckets=rebuild_buckets, input_fingerprint=fp_rebuild,
            process_fn=_span_rebuild_factory(tokens_col, id_col, k))
    else:
        s_rebuild = {"written": [],
                     "skipped": list(range(rebuild_buckets)), "rows": 0}
    return {"occ": s_occ, "rebuild": s_rebuild,
            "fingerprints": {"input": fp_in, "occ": fp_occ,
                             "rebuild": fp_rebuild}}


def token_decontaminate(ds: Dataset, eval_ds: Dataset,
                        tokens_col: str = "tokens", k: int = 3,
                        drop: bool = False) -> Dataset:
    """Flag (or drop) corpus documents sharing any token ``k``-gram with
    ``eval_ds`` — benchmark decontamination run natively on the
    pre-tokenized payload. Appends ``n_overlap`` (count of the document's
    DISTINCT grams found in the eval set) and ``keep``. Eval grams =
    one ``ray.put`` broadcast; corpus = streamed zero-shuffle scan."""
    grams = token_eval_gram_hashes(eval_ds, tokens_col, k)
    ref = ray.put(grams)

    def score(batch: pa.Table) -> pa.Table:
        kern = cached_kernel(_TokenDecontamScorer, ref, tokens_col, k)
        return kern(batch)

    out = ds.map_batches(score, batch_format="pyarrow")
    if drop:
        out = out.filter(expr="n_overlap == 0")
    return out


# ---------------------------------------------------------------------------
# bigram LM surprisal on token ids
# ---------------------------------------------------------------------------

_CTX_SENTINEL = np.int64((1 << 32) - 1)


def _packed_pairs_of_batch(col, tokens_col=None):
    """Flat consecutive in-doc token pairs packed into ONE int64 key
    ``(w1 << 32) | w2`` (ids are non-negative int32, so keys stay
    positive and a real pair can never collide with the context
    sentinel ``(w1 << 32) | 0xFFFFFFFF``), plus per-doc pair counts."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.maximum(lengths - 1, 0)
    tot = int(m.sum())
    if tot == 0:
        return np.zeros(0, dtype=np.int64), m
    offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    i1 = (np.arange(tot, dtype=np.int64)
          - np.repeat(np.cumsum(m) - m, m)
          + np.repeat(offs[:-1], m))
    keys = (flat[i1] << np.int64(32)) | flat[i1 + 1]
    return keys, m


def fit_token_bigram_lm(ds: Dataset, tokens_col: str = "tokens",
                        top_k: int | None = None) -> dict:
    """Distributed bigram LM over token ids — the word-order-aware rung
    above :func:`fit_token_unigram_lm`, run natively on the
    pre-tokenized payload: per-batch partial counts of packed
    consecutive-pair keys AND of context occurrences (w1, packed with
    the sentinel low word) ride ONE ``groupby(key).sum()`` exchange;
    the driver derives conditional-MLE logprobs ``ln(n12 / nctx(w1))``
    over a sorted int64 key array (vocab²-bounded in principle, corpus-
    pair-bounded in practice; ``top_k`` caps the PAIR table most-
    frequent-first with smaller-key tie-break — context counts stay
    exact — and capped-out pairs score the OOV floor
    ``-ln(total_pairs)``)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys, _ = _packed_pairs_of_batch(t[tokens_col])
        if len(keys) == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        ctx = (keys >> np.int64(32)) << np.int64(32) | _CTX_SENTINEL
        u, c = np.unique(np.concatenate([keys, ctx]), return_counts=True)
        return pa.table({"key": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    key = counts["key"].to_numpy(dtype=np.int64)
    cnt = counts["cnt"].to_numpy(dtype=np.int64)
    is_ctx = (key & _CTX_SENTINEL) == _CTX_SENTINEL
    ctx_key, ctx_cnt = key[is_ctx], cnt[is_ctx]
    pk, pn = key[~is_ctx], cnt[~is_ctx]
    total = int(pn.sum())
    if top_k is not None and len(pk) > top_k:
        sel = np.lexsort((pk, -pn))[:top_k]
        pk, pn = pk[sel], pn[sel]
    order = np.argsort(pk)
    pk, pn = pk[order], pn[order]
    co = np.argsort(ctx_key)
    ctx_key, ctx_cnt = ctx_key[co], ctx_cnt[co]
    want = (pk >> np.int64(32)) << np.int64(32) | _CTX_SENTINEL
    nc = ctx_cnt[np.searchsorted(ctx_key, want)]
    lp = np.log(pn.astype(np.float64) / nc.astype(np.float64))
    return {"keys": pk, "logprob": lp, "total": total}


class _TokenBigramScorer:
    """Per-worker kernel: broadcast (sorted packed pair keys, logprobs);
    per batch one searchsorted over the packed flat pair buffer +
    per-doc segmented sums. Unseen pairs (top_k-capped fits) score the
    ``-ln(total_pairs)`` floor."""

    def __init__(self, lm_ref, tokens_col: str):
        from .partition import broadcast_get
        lm = broadcast_get(lm_ref)
        self.keys = lm["keys"]
        self.lp = lm["logprob"]
        self.floor = -np.log(max(lm["total"], 1))
        self.tokens_col = tokens_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, m = _packed_pairs_of_batch(batch[self.tokens_col])
        vals = np.zeros(len(keys), dtype=np.float64)
        if len(keys):
            if len(self.keys):
                idx = np.searchsorted(self.keys, keys)
                idx[idx == len(self.keys)] = 0
                hit = self.keys[idx] == keys
                vals = np.where(hit, self.lp[idx], self.floor)
            else:
                vals = np.full(len(keys), self.floor)
        starts = np.zeros(len(m) + 1, dtype=np.int64)
        np.cumsum(m, out=starts[1:])
        nz = m > 0
        sums = np.zeros(len(m), dtype=np.float64)
        if nz.any():
            sums[nz] = np.add.reduceat(vals, starts[:-1][nz])
        out = batch.filter(pa.array(nz))
        out = out.append_column("n_pairs",
                                pa.array(m[nz], type=pa.int64()))
        return out.append_column("sum_logprob", pa.array(sums[nz]))


def token_bigram_surprisal(ds: Dataset, lm: dict | None = None,
                           tokens_col: str = "tokens") -> Dataset:
    """Fit (if no ``lm``) + score: per-doc ``(…, n_pairs,
    sum_logprob)`` under the corpus token-BIGRAM conditional LM — the
    word-order-aware perplexity filter run natively on token ids.
    Docs with fewer than two tokens are dropped (no bigram). Oracle
    comparisons round (ln values are irrational → boundary-safe)."""
    from .partition import cached_kernel
    if lm is None:
        lm = fit_token_bigram_lm(ds, tokens_col)
    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_TokenBigramScorer, ref, tokens_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-dropout augmentation
# ---------------------------------------------------------------------------

def augment_token_dropout(ds: Dataset, tokens_col: str = "tokens",
                          id_col: str = "did", rate_pct: int = 10,
                          seed: int = 1,
                          out_col: str = "tokens_aug") -> Dataset:
    """Deterministic token-dropout augmentation — the SimCSE-style
    positive-view generator run natively on the ``list<int32>``
    payload: the token at position ``p`` of doc ``d`` survives iff
    ``((d mod 2²⁰)·2654435761 + (p+1)·40503 + seed·1315423911) mod 2³²
    mod 100 ≥ rate_pct``. The decision depends only on (id, position,
    seed), so views are reproducible under any partitioning and
    different ``seed`` values give independent views of the same doc
    (the contrastive-pair recipe); every term stays below 2⁶³, so a
    BIGINT SQL twin reproduces the mask bit-for-bit. ``id_col`` must
    be an integer column (derive one upstream for string ids). Zero
    shuffles; appends ``out_col`` (list<int32>) and ``n_kept``.

    A short doc can lose every token (empty view) — callers decide;
    dropout never reorders survivors."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        n = len(t)
        did = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos = np.arange(int(starts[-1]), dtype=np.int64) \
            - starts[doc_of]
        h = ((did[doc_of] % np.uint64(1 << 20)) * np.uint64(2654435761)
             + (pos + 1).astype(np.uint64) * np.uint64(40503)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32) % np.uint64(100)
        keep = h >= np.uint64(rate_pct)
        kept = flat.filter(pa.array(keep)) if len(flat) else flat
        n_kept = np.bincount(doc_of[keep], minlength=n) \
            .astype(np.int64) if len(flat) else \
            np.zeros(n, dtype=np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_kept, out=offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pc.cast(kept, pa.int32()))
        t = t.append_column(out_col, lst)
        return t.append_column("n_kept", pa.array(n_kept))

    return ds.map_batches(fn, batch_format="pyarrow")


def corrupt_token_spans(ds: Dataset, tokens_col: str = "tokens",
                        id_col: str = "did", span_len: int = 3,
                        rate_pm: int = 50, seed: int = 1,
                        sentinel_base: int = 32000) -> Dataset:
    """Deterministic T5-style span corruption on the ``list<int32>``
    payload: a span CANDIDATE starts at position ``p`` of doc ``d``
    when ``hash(d, p, seed) mod 1000 < rate_pm`` (the same overflow-
    safe integer family as :func:`augment_token_dropout`), covers
    ``span_len`` tokens capped at the doc end, and overlapping
    candidates MERGE (union of intervals — no sequential sampling, so
    the mask is order-free and reproducible under any partitioning).
    Each maximal covered run ``i`` (0-based, left to right) becomes
    sentinel ``sentinel_base + i``:

    - ``input_tokens``  — uncovered tokens, each run replaced by its
      sentinel at the run start (T5 encoder input);
    - ``target_tokens`` — per run: sentinel, then the run's original
      tokens (T5 decoder target);
    - ``n_spans``.

    Zero shuffles; every quantity is integer-exact, so a SQL twin
    (gap-and-islands over the covered positions) reproduces both
    sequences bit-for-bit."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(t)
        did = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        N = int(starts[-1])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos = np.arange(N, dtype=np.int64) - starts[doc_of]
        h = ((did[doc_of] % np.uint64(1 << 20)) * np.uint64(2654435761)
             + (pos + 1).astype(np.uint64) * np.uint64(40503)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32) % np.uint64(1000)
        cand = np.flatnonzero(h < np.uint64(rate_pm))
        delta = np.zeros(N + 1, dtype=np.int64)
        if len(cand):
            np.add.at(delta, cand, 1)
            ends = np.minimum(cand + span_len,
                              starts[doc_of[cand] + 1])
            np.add.at(delta, ends, -1)
        covered = np.cumsum(delta[:N]) > 0
        # maximal runs: a run starts at a covered position whose
        # predecessor (same doc) is uncovered or absent
        prev_cov = np.r_[False, covered[:-1]]
        run_start = covered & (~prev_cov | (pos == 0))
        # island index per doc: global cumsum rebased at doc starts
        g = np.cumsum(run_start)
        island = g - 1 - np.r_[0, g][starts[doc_of]]  # runs before doc
        n_spans = np.bincount(doc_of[run_start], minlength=n) \
            .astype(np.int64)
        sent = sentinel_base + island
        # encoder input: uncovered tokens + sentinel at each run start
        in_keep = ~covered | run_start
        in_vals = np.where(covered, sent, flat)[in_keep]
        in_lens = np.bincount(doc_of[in_keep], minlength=n) \
            .astype(np.int64)
        in_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(in_lens, out=in_offs[1:])
        # decoder target: per run, sentinel then the covered tokens —
        # sentinel rows sort just before their run's first token
        cov_idx = np.flatnonzero(covered)
        rs_idx = np.flatnonzero(run_start)
        tg_doc = np.concatenate([doc_of[cov_idx], doc_of[rs_idx]])
        tg_isl = np.concatenate([island[cov_idx], island[rs_idx]])
        tg_pos = np.concatenate([pos[cov_idx],
                                 np.full(len(rs_idx), -1,
                                         dtype=np.int64)])
        tg_val = np.concatenate([flat[cov_idx], sent[rs_idx]])
        order = np.lexsort((tg_pos, tg_isl, tg_doc))
        tg_val = tg_val[order]
        tg_lens = (np.bincount(doc_of[cov_idx], minlength=n)
                   + n_spans).astype(np.int64)
        tg_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tg_lens, out=tg_offs[1:])
        t = t.append_column("input_tokens", pa.ListArray.from_arrays(
            pa.array(in_offs, type=pa.int32()),
            pa.array(in_vals.astype(np.int32))))
        t = t.append_column("target_tokens", pa.ListArray.from_arrays(
            pa.array(tg_offs, type=pa.int32()),
            pa.array(tg_val.astype(np.int32))))
        return t.append_column("n_spans", pa.array(n_spans))

    return ds.map_batches(fn, batch_format="pyarrow")


def mask_tokens_mlm(ds: Dataset, tokens_col: str = "tokens",
                    id_col: str = "did", rate_pm: int = 150,
                    seed: int = 1, mask_id: int = 32099,
                    vocab_size: int = 32000,
                    label_pad: int = -100) -> Dataset:
    """Deterministic BERT-style MLM masking — the 80/10/10 recipe with
    every choice derived from ONE overflow-safe integer hash of
    ``(id, position, seed)`` (the :func:`augment_token_dropout`
    family), so the corruption is reproducible under any partitioning
    and a BIGINT SQL twin reproduces inputs AND labels bit-for-bit:

    - position selected iff ``h mod 1000 < rate_pm``;
    - among selected, action ``(h ÷ 1000) mod 10``: 0–7 → ``mask_id``,
      8 → random id ``(h ÷ 10000) mod vocab_size``, 9 → keep;
    - ``masked_tokens``: the corrupted input;
    - ``labels``: the original token at selected positions,
      ``label_pad`` elsewhere (the standard ignore-index convention).

    Zero shuffles, one vectorized pass per batch."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(t)
        did = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        N = int(starts[-1])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos = np.arange(N, dtype=np.int64) - starts[doc_of]
        h = ((did[doc_of] % np.uint64(1 << 20)) * np.uint64(2654435761)
             + (pos + 1).astype(np.uint64) * np.uint64(40503)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        sel = (h % np.uint64(1000)) < np.uint64(rate_pm)
        action = (h // np.uint64(1000)) % np.uint64(10)
        rand_id = ((h // np.uint64(10000))
                   % np.uint64(vocab_size)).astype(np.int64)
        masked = np.where(sel & (action <= np.uint64(7)),
                          np.int64(mask_id), flat)
        masked = np.where(sel & (action == np.uint64(8)),
                          rand_id, masked)
        labels = np.where(sel, flat, np.int64(label_pad))
        n_masked = np.bincount(doc_of[sel], minlength=n) \
            .astype(np.int64) if N else np.zeros(n, dtype=np.int64)
        offs32 = pa.array(starts, type=pa.int32())
        t = t.append_column("masked_tokens", pa.ListArray.from_arrays(
            offs32, pa.array(masked.astype(np.int32))))
        t = t.append_column("labels", pa.ListArray.from_arrays(
            offs32, pa.array(labels.astype(np.int32))))
        return t.append_column("n_masked", pa.array(n_masked))

    return ds.map_batches(fn, batch_format="pyarrow")


def build_nsp_pairs(ds: Dataset, tokens_col: str = "tokens",
                    id_col: str = "did", neg_rate_pm: int = 500,
                    seed: int = 1) -> Dataset:
    """Deterministic BERT-style next-segment pair construction on the
    ``list<int32>`` payload: each doc with ≥ 2 tokens splits at
    ``n // 2`` into (segment A, segment B); the doc-level hash (the
    dropout family at position 0) decides ``label`` — with probability
    ``neg_rate_pm``‰ segment B is REPLACED by the second half of a
    pseudo-random OTHER doc, chosen by the :func:`~.curation
    .sample_negatives` modular stride over the global rank (self-free
    for every stride when n ≥ 2, reproducible under any partitioning).
    Emits ``(…, label 1=is-next / 0=random, tok_a, tok_b)``.

    Scale shape: two-phase rank assign + ONE hash join keyed on the
    partner rank (positives join back to their own rank, so the single
    join serves both labels); segment slicing is pure offset
    arithmetic, zero extra shuffles."""
    from .partition import row_number
    from .relational import hash_join

    def ge2(t: pa.Table) -> pa.Table:
        ln = pc.fill_null(pc.list_value_length(t[tokens_col]), 0)
        return t.filter(pc.greater_equal(ln, pa.scalar(2)))

    ranked = row_number(
        ds.select_columns([id_col, tokens_col]).map_batches(
            ge2, batch_format="pyarrow"),
        [id_col], out_col="__rk", start=0).materialize()
    n = ranked.count()
    if n < 2:
        raise ValueError("need at least 2 eligible docs for NSP pairs")
    stride = 1 + (seed * 2654435761) % (n - 1)

    def halves(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        m = len(t)
        starts = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        mid = lengths // 2
        # segment A: positions [start, start+mid)
        a_idx = (np.arange(int(mid.sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(mid) - mid, mid)
                 + np.repeat(starts[:-1], mid))
        a_offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(mid, out=a_offs[1:])
        tok_a = pa.ListArray.from_arrays(
            pa.array(a_offs, type=pa.int32()),
            flat.take(pa.array(a_idx)))
        # segment B: positions [start+mid, end)
        bl = lengths - mid
        b_idx = (np.arange(int(bl.sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(bl) - bl, bl)
                 + np.repeat(starts[:-1] + mid, bl))
        b_offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(bl, out=b_offs[1:])
        tok_b = pa.ListArray.from_arrays(
            pa.array(b_offs, type=pa.int32()),
            flat.take(pa.array(b_idx)))
        did = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = ((did % np.uint64(1 << 20)) * np.uint64(2654435761)
             + np.uint64(40503)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32) % np.uint64(1000)
        neg = h < np.uint64(neg_rate_pm)
        rk = t["__rk"].to_numpy(zero_copy_only=False)
        prk = np.where(neg, (rk + stride) % n, rk)
        return pa.table({
            id_col: t[id_col],
            "label": pa.array((~neg).astype(np.int64)),
            "tok_a": tok_a,
            "__rk": t["__rk"],
            "__prk": pa.array(prk.astype(np.int64)),
            "__own_b": tok_b})

    segs = ranked.map_batches(halves, batch_format="pyarrow") \
        .materialize()
    left = segs.drop_columns(["__own_b", "__rk"])
    right = segs.map_batches(
        lambda t: pa.table({"__rk": t["__rk"], "tok_b": t["__own_b"]}),
        batch_format="pyarrow")
    out = hash_join(left, right, left_key="__prk", right_key="__rk",
                    how="inner")
    return out.drop_columns(["__prk"])




def fim_transform(ds: Dataset, tokens_col: str = "tokens",
                  id_col: str = "did", seed: int = 1,
                  pre_id: int = 32001, suf_id: int = 32002,
                  mid_id: int = 32003) -> Dataset:
    """Deterministic fill-in-the-middle (FIM) transform in PSM order —
    the code-model pretraining objective: two hash-derived cut points
    (the dropout hash family at positions 1 and 2) split each doc into
    prefix ``[0, lo)``, middle ``[lo, hi)``, suffix ``[hi, n)``, and
    the output sequence is ``⟨PRE⟩ prefix ⟨SUF⟩ suffix ⟨MID⟩ middle``
    (training then continues the middle after seeing both sides). Cuts
    are uniform over ``[0, n]`` per hash, reproducible under any
    partitioning; empty segments are legal (a cut pair may make any
    segment empty). Appends ``fim_tokens`` (length n + 3) and
    ``n_middle``. Zero shuffles, one vectorized lexsort-gather pass."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(t)
        did = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        N = int(starts[-1])

        def dochash(p):
            return (((did % np.uint64(1 << 20)) * np.uint64(2654435761)
                     + np.uint64(p) * np.uint64(40503)
                     + np.uint64(seed) * np.uint64(1315423911))
                    % np.uint64(1 << 32)).astype(np.int64)

        c1 = dochash(1) % (lengths + 1)
        c2 = dochash(2) % (lengths + 1)
        lo = np.minimum(c1, c2)
        hi = np.maximum(c1, c2)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos = np.arange(N, dtype=np.int64) - starts[doc_of]
        # segment order: 0 ⟨PRE⟩, 1 prefix, 2 ⟨SUF⟩, 3 suffix,
        # 4 ⟨MID⟩, 5 middle
        seg = np.where(pos < lo[doc_of], 1,
                       np.where(pos < hi[doc_of], 5, 3))
        sent_doc = np.repeat(np.arange(n, dtype=np.int64), 3)
        sent_seg = np.tile(np.array([0, 2, 4], dtype=np.int64), n)
        sent_val = np.tile(np.array([pre_id, suf_id, mid_id],
                                    dtype=np.int64), n)
        all_doc = np.concatenate([doc_of, sent_doc])
        all_seg = np.concatenate([seg, sent_seg])
        all_pos = np.concatenate([pos, np.full(3 * n, -1,
                                               dtype=np.int64)])
        all_val = np.concatenate([flat, sent_val])
        order = np.lexsort((all_pos, all_seg, all_doc))
        vals = all_val[order]
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths + 3, out=offs[1:])
        t = t.append_column("fim_tokens", pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(vals.astype(np.int32))))
        return t.append_column(
            "n_middle", pa.array((hi - lo).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def vocab_coverage(ds: Dataset, ks, tokens_col: str = "tokens") -> pa.Table:
    """Tokenizer-vocabulary coverage curve: for each candidate vocab
    size ``k`` in ``ks``, how much of the corpus token stream the
    ``k`` most frequent token ids cover — the standard analysis behind
    "what vocab size / frequency cutoff do we ship" and the OOV-rate
    estimate for a truncated vocab. Ranking is by (count desc, token
    asc), so results are deterministic under ties.

    Emits one row per ``k``: ``covered_types`` (= min(k, V)),
    ``covered_tokens``, ``oov_tokens`` — all exact int64.

    Scale shape: per-block ``np.unique`` partial counts ride ONE
    ``groupby(token).sum()`` exchange; the ranked cumulative sum runs
    driver-side over the VOCAB-BOUNDED count table (the same documented
    contract as the unigram/bigram LM fits — token vocabularies are
    ≤ millions of rows while the corpus is TBs)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(flat.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    if len(counts) == 0 or "tok" not in counts.columns:
        # empty-corpus groupby emits blocks missing the key column
        tok = np.array([], dtype=np.int64)
        cnt = np.array([], dtype=np.int64)
    else:
        tok = counts["tok"].to_numpy(dtype=np.int64)
        cnt = counts["cnt"].to_numpy(dtype=np.int64)
    order = np.lexsort((tok, -cnt))
    csum = np.cumsum(cnt[order])
    total = int(csum[-1]) if len(csum) else 0
    ks_arr = np.asarray(list(ks), dtype=np.int64)
    if len(ks_arr) == 0 or (ks_arr < 0).any():
        raise ValueError("ks must be non-empty, all >= 0")
    ctypes = np.minimum(ks_arr, len(tok))
    if len(csum) == 0:
        ctok = np.zeros(len(ks_arr), dtype=np.int64)
    else:
        ctok = np.where(ctypes > 0, csum[np.maximum(ctypes, 1) - 1], 0)
    return pa.table({
        "k": pa.array(ks_arr),
        "covered_types": pa.array(ctypes.astype(np.int64)),
        "covered_tokens": pa.array(ctok.astype(np.int64)),
        "oov_tokens": pa.array((total - ctok).astype(np.int64))})


def token_exact_dedup(ds: Dataset, tokens_col: str = "tokens",
                      id_col: str = "doc_id",
                      num_buckets: int | None = None,
                      keep_cols=None) -> Dataset:
    """Exact duplicate-SEQUENCE dedup run natively on the token
    payload — completes the token-native dedup trio (exact / MinHash /
    SimHash): each ``list<int32>`` serializes to its canonical
    ``'a,b,c'`` string (integers → the serialization is injective;
    empty list → ``''``, null → null, grouped like SQL ``GROUP BY``)
    and the min-``id_col`` row per distinct sequence survives through
    :func:`~feature_extraction_ray.stages.dedup.exact_dedup`'s ONE
    hash-bucketed exchange with ``n_dups`` multiplicity. The token
    column rides ``keep_cols`` so survivors keep their payload."""
    from .dedup import exact_dedup

    def ser(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.binary_join(pc.cast(col, pa.list_(pa.string())),
                           pa.scalar(",", type=pa.string()))
        return t.append_column("__tok_key", s)

    kc = [tokens_col] + [c for c in (keep_cols or [])
                         if c != tokens_col]
    out = exact_dedup(ds.map_batches(ser, batch_format="pyarrow"),
                      content_col="__tok_key", id_col=id_col,
                      num_buckets=num_buckets, keep_cols=kc)
    return out.drop_columns(["__tok_key"])


def token_freq_spectrum(ds: Dataset,
                        tokens_col: str = "tokens") -> Dataset:
    """Frequency-of-frequencies spectrum of the token stream: for each
    occurrence count ``c``, how many distinct token ids occur EXACTLY
    ``c`` times (``n_types``) and the token mass they carry
    (``n_tokens = c·n_types``) — the count-of-counts table behind
    Good–Turing smoothing, hapax analysis and vocab-pruning decisions.
    Exact int64. Scale shape: per-block ``np.unique`` partials ride
    ONE ``groupby(token)`` exchange, then the vocab-bounded count
    table rides a second (tiny) ``groupby(cnt)`` — the corpus itself
    never shuffles."""
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(flat.astype(np.int64), return_counts=True)
        return pa.table({"tok": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum
    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))
    spec = counts.groupby("cnt").aggregate(
        Count(alias_name="n_types"))

    def fin(t: pa.Table) -> pa.Table:
        if "cnt" not in t.column_names or len(t) == 0:
            return pa.table({"cnt": pa.array([], type=pa.int64()),
                             "n_types": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64())})
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_types"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cnt": pa.array(c), "n_types": pa.array(n),
                         "n_tokens": pa.array(c * n)})

    return spec.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS algorithm)
# ---------------------------------------------------------------------------

_WIN_A = np.int64(40503)
_WIN_M = np.int64(1 << 25)
_POS_CAP = np.int64(1 << 20)


def winnow_fingerprints(ds: Dataset, tokens_col: str = "tokens",
                        id_col: str = "doc_id", k: int = 3,
                        w: int = 4) -> Dataset:
    """Winnowing document fingerprints (the MOSS local fingerprinting
    scheme): hash every ``k``-gram of token ids, slide a window of
    ``w`` consecutive gram hashes over each document, and select each
    window's MINIMUM — rightmost position on ties — emitting the
    distinct ``(doc, pos, fp)`` selections. The guarantee that makes
    this the partial-overlap detector (vs MinHash's whole-doc
    similarity): any shared token run of length ``>= w + k - 1``
    between two documents shares at least one selected fingerprint,
    and selection density is ~``2/(w+1)`` of grams regardless of
    document length.

    Exact integer arithmetic end-to-end so the SQL twin reproduces
    every selection bit-for-bit: gram hash =
    ``(sum_j (t_{p+j} mod 2^20) * 40503^(k-1-j)) mod 2^25`` (every
    intermediate < 2^63), and the rightmost-min tie-break rides a
    single packed key ``h * 2^20 + (2^20 - 1 - pos)`` whose plain MIN
    picks the smallest hash then the LARGEST position. Documents
    shorter than ``k`` tokens emit nothing; documents with fewer than
    ``w`` grams emit one whole-doc window. Positions are 1-based gram
    starts (the ``list_slice`` convention).

    Scale shape: one zero-shuffle vectorized pass — the sliding min is
    ``w-1`` shifted ``np.minimum`` ops over the batch's flat gram
    stream with cross-doc candidates masked; no Python loop over rows
    or windows. Token ids must be non-negative and documents shorter
    than 2^20 tokens (both raise loudly — the position packing and the
    mod-2^20 id fold are the SQL-parity contract)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    kk, ww = int(k), int(w)

    def fp(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        row_len = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(flat) and flat.min() < 0:
            raise ValueError("winnow_fingerprints: negative token ids")
        if len(row_len) and row_len.max() >= int(_POS_CAP) - 1:
            raise ValueError("winnow_fingerprints: document exceeds "
                             "2^20 tokens; split it first")
        n_docs = len(row_len)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), row_len)
        N = len(flat)
        vn = max(N - kk + 1, 0)
        empty = pa.table({id_col: pa.array([], batch[id_col].type),
                          "pos": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
        if vn == 0:
            return empty
        t0 = flat % int(_POS_CAP)
        h = t0[:vn].copy()
        for j in range(1, kk):
            h = (h * _WIN_A + t0[j:vn + j]) % _WIN_M
        h %= _WIN_M
        in_doc = doc_of[:vn] == doc_of[kk - 1:] if kk > 1 else \
            np.ones(vn, dtype=bool)
        gdoc = doc_of[:vn][in_doc]
        h = h[in_doc]
        if len(h) == 0:
            return empty
        # 1-based gram start within its doc
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(row_len, out=starts[1:])
        gpos = np.flatnonzero(in_doc) - starts[doc_of[:vn][in_doc]] + 1
        key = h * _POS_CAP + (_POS_CAP - 1 - gpos)
        # sliding min over the last ww keys, cross-doc shifts masked
        big = np.int64(1) << np.int64(62)
        m = key.copy()
        for j in range(1, ww):
            if j >= len(key):
                break
            cand = np.where(gdoc[j:] == gdoc[:-j], key[:-j], big)
            np.minimum(m[j:], cand, out=m[j:])
        ng = np.bincount(gdoc, minlength=n_docs)
        sel = gpos >= np.minimum(ww, ng[gdoc])
        packed = (gdoc[sel] << np.int64(45)) | m[sel]
        packed = np.unique(packed)
        d_idx = packed >> np.int64(45)
        mk = packed & ((np.int64(1) << np.int64(45)) - 1)
        pos = _POS_CAP - 1 - (mk % _POS_CAP)
        return pa.table({
            id_col: batch[id_col].take(pa.array(d_idx)),
            "pos": pa.array(pos), "fp": pa.array(mk // _POS_CAP)})

    return ds.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# interpolated Kneser–Ney bigram LM
# ---------------------------------------------------------------------------

def fit_token_kn_bigram(ds: Dataset, tokens_col: str = "tokens",
                        discount: float = 0.75) -> dict:
    """Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the
    Chen & Goodman 1999 interpolated formulation — public recipe) fit
    natively on the ``list<int32>`` payload: the SAME one-exchange
    packed-pair count plan as :func:`fit_token_bigram_lm` supplies
    ``c(v,w)`` and ``c(v·)``; the continuation statistics ``N1+(v·)``
    (distinct successors of ``v``), ``N1+(·w)`` (distinct predecessors
    of ``w``) and ``N1+(··)`` (distinct bigram types) derive on the
    driver from the pair table — every count an exact int64.

        p_kn(w|v) = (c(v,w) − d)/c(v·)                  [seen pair]
                  + ((d·N1+(v·))/c(v·)) · (N1+(·w)/N1+(··))

    and Σ_w p_kn(w|v) == 1 exactly over the full vocabulary (the
    discounted mass d·N1+(v·) is redistributed by the continuation
    distribution — pinned by a property test). The pair table must fit
    the driver (vocab²-bounded in principle, corpus-pair-bounded in
    practice — the same contract as :func:`fit_token_bigram_lm`)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys, _ = _packed_pairs_of_batch(t[tokens_col])
        if len(keys) == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    pk = counts["key"].to_numpy(dtype=np.int64)
    pn = counts["cnt"].to_numpy(dtype=np.int64)
    order = np.argsort(pk)
    pk, pn = pk[order], pn[order]
    v = pk >> np.int64(32)
    w = pk & np.int64((1 << 32) - 1)
    # contexts: pk is sorted, so v is sorted — run-length reduce
    ctx_ids, ctx_start = np.unique(v, return_index=True)
    ctx_cnt = np.add.reduceat(pn, ctx_start) if len(pn) else \
        np.zeros(0, dtype=np.int64)
    ctx_n1 = np.diff(np.r_[ctx_start, len(pk)]) if len(pk) else \
        np.zeros(0, dtype=np.int64)
    cont_ids, cont_n1 = np.unique(w, return_counts=True)
    return {"pair_keys": pk, "pair_cnt": pn,
            "ctx_ids": ctx_ids, "ctx_cnt": ctx_cnt.astype(np.int64),
            "ctx_n1": ctx_n1.astype(np.int64),
            "cont_ids": cont_ids, "cont_n1": cont_n1.astype(np.int64),
            "n1pp": int(len(pk)), "discount": float(discount)}


class _TokenKNScorer:
    """Per-worker kernel: broadcast KN model; one searchsorted per
    lookup table over the batch's packed flat pair buffer. Emits either
    per-pair rows (exact integer counts + the single-expression
    ``p_kn``) or per-doc surprisal aggregates."""

    def __init__(self, lm_ref, tokens_col: str, id_col: str,
                 per_pair: bool):
        lm = broadcast_get(lm_ref)
        self.lm = lm
        self.tokens_col = tokens_col
        self.id_col = id_col
        self.per_pair = per_pair

    def _lookup(self, ids, table_ids, table_vals):
        out = np.zeros(len(ids), dtype=np.int64)
        if len(table_ids) and len(ids):
            idx = np.searchsorted(table_ids, ids)
            idx[idx == len(table_ids)] = 0
            hit = table_ids[idx] == ids
            out = np.where(hit, table_vals[idx], 0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        lm = self.lm
        d = lm["discount"]
        keys, m = _packed_pairs_of_batch(batch[self.tokens_col])
        v = keys >> np.int64(32)
        w = keys & np.int64((1 << 32) - 1)
        c = self._lookup(keys, lm["pair_keys"], lm["pair_cnt"])
        cv = self._lookup(v, lm["ctx_ids"], lm["ctx_cnt"])
        n1v = self._lookup(v, lm["ctx_ids"], lm["ctx_n1"])
        n1w = self._lookup(w, lm["cont_ids"], lm["cont_n1"])
        n1pp = lm["n1pp"]
        cvf = cv.astype(np.float64)
        pcont = n1w.astype(np.float64) / np.float64(max(n1pp, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = np.maximum(c.astype(np.float64) - d, 0.0) / cvf
            p = t1 + ((d * n1v.astype(np.float64)) / cvf) * pcont
        # unseen context → the continuation distribution alone; a token
        # never seen as a continuation floors at 1/(N1+(··)+1)
        p = np.where(cv > 0, p, pcont)
        p = np.where(p > 0.0, p, 1.0 / np.float64(n1pp + 1))
        nz = m > 0
        if self.per_pair:
            doc_of = np.repeat(np.arange(len(m), dtype=np.int64), m)
            pos = np.arange(int(m.sum()), dtype=np.int64) \
                - np.repeat(np.cumsum(m) - m, m) + 1
            ids = batch[self.id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.table({
                self.id_col: ids.take(pa.array(doc_of)),
                "pos": pa.array(pos),
                "w1": pa.array(v), "w2": pa.array(w),
                "c": pa.array(c), "cv": pa.array(cv),
                "n1v": pa.array(n1v), "n1w": pa.array(n1w),
                "p_kn": pa.array(p)})
        starts = np.zeros(len(m) + 1, dtype=np.int64)
        np.cumsum(m, out=starts[1:])
        sums = np.zeros(len(m), dtype=np.float64)
        if nz.any():
            sums[nz] = np.add.reduceat(-np.log(p), starts[:-1][nz])
        out = batch.filter(pa.array(nz))
        out = out.append_column("n_pairs",
                                pa.array(m[nz], type=pa.int64()))
        return out.append_column("sum_neglogp", pa.array(sums[nz]))


def token_kn_pairs(ds: Dataset, lm: dict | None = None,
                   tokens_col: str = "tokens",
                   id_col: str = "doc_id",
                   discount: float = 0.75) -> Dataset:
    """Per-bigram-position Kneser–Ney table: one row per consecutive
    token pair with the exact integer sufficient statistics
    ``(c, cv, n1v, n1w)`` and ``p_kn`` as ONE fixed IEEE expression over
    them — the oracle-facing projection of :func:`fit_token_kn_bigram`
    (a SQL twin derives the identical counts from the raw corpus and
    compares ``p_kn`` STRICTLY). ``pos`` is the 1-based index of the
    pair's first token. Zero shuffles after the fit."""
    if lm is None:
        lm = fit_token_kn_bigram(ds, tokens_col, discount)
    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_TokenKNScorer, ref, tokens_col, id_col,
                             True)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


def token_kn_surprisal(ds: Dataset, lm: dict | None = None,
                       tokens_col: str = "tokens",
                       discount: float = 0.75) -> Dataset:
    """Fit (if no ``lm``) + score: per-doc ``(…, n_pairs,
    sum_neglogp)`` under the interpolated Kneser–Ney bigram LM — the
    smoothing-aware perplexity filter (CCNet-style quality bucketing
    without a pretrained model). Docs with fewer than two tokens are
    dropped (no bigram). Float sums reduce in-doc order; oracle
    comparisons go through :func:`token_kn_pairs` (strict) rather than
    the per-doc ln sums."""
    if lm is None:
        lm = fit_token_kn_bigram(ds, tokens_col, discount)
    ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_TokenKNScorer, ref, tokens_col, "",
                             False)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

def hashed_token_features(ds: Dataset, tokens_col: str = "tokens",
                          id_col: str = "doc_id",
                          n_features: int = 1024,
                          seed: int = 1,
                          ngram: int = 1) -> Dataset:
    """Signed feature hashing (Weinberger et al. 2009, "Feature Hashing
    for Large Scale Multitask Learning" — the hashing trick) run
    natively on the ``list<int32>`` payload: every token occurrence
    maps to ``bucket = h(tok, seed) mod n_features`` with a ±1 sign
    from an independent second hash (the unbiased inner-product
    variant), and the doc's sparse vector is the signed occurrence sum
    per bucket. Both hashes use the shared overflow-safe integer family
    (every term < 2⁶³), so a BIGINT SQL twin reproduces buckets, signs
    and sums bit-for-bit. The sign is the TOP bit of the second hash
    (``h2 >> 31``), not the bottom bit: with odd multipliers,
    bucket-equality under a power-of-two ``n_features`` forces
    ``base1 ≡ base2 (mod 2^k)``, which pins every LOW bit of any
    odd-multiplier hash — a parity sign would make colliding tokens
    always agree, silently degrading to unsigned (biased) hashing.

    Output: one row per (doc, occupied bucket) — ``id_col, bucket,
    n`` (occurrence count) ``, value`` (signed sum; may be 0 when signs
    cancel — the bucket is still emitted, matching SQL GROUP BY
    semantics). Zero shuffles: the per-doc reduction happens inside the
    batch (``np.unique`` on packed (row, bucket) keys); no vocabulary
    is fit, so the op streams at any scale.

    ``ngram=2`` hashes ADJACENT TOKEN PAIRS instead (the fastText
    word-ngram trick): bucket and sign come from the two-multiplier
    pair combos ``a·2654435761 + b·2246822519`` / the swapped pair
    (each term < 2⁵², still BIGINT-safe — a packed 40-bit base times a
    large multiplier would overflow int64, which is why the pair
    enters the hash as two products, not one packed value); docs
    shorter than 2 tokens emit nothing."""
    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")
    # sign multiplier must be LARGE mod 2^32 (a small one leaves the
    # top bit nearly constant across nearby token ids — correlated
    # signs) and odd; base < 2^20 keeps base*mul2 < 2^52 (BIGINT-safe)
    mul1, mul2 = np.uint64(2654435761), np.uint64(2246822519)
    add1 = np.uint64((seed * 1315423911) % (1 << 64))
    add2 = np.uint64((seed * 2654435761) % (1 << 64))

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        if ngram == 2:
            same = doc_of[:-1] == doc_of[1:] if len(flat) else \
                np.zeros(0, dtype=bool)
            a = (flat[:-1] if len(flat) else flat)[same] \
                % np.uint64(1 << 20)
            bb = (flat[1:] if len(flat) else flat)[same] \
                % np.uint64(1 << 20)
            doc_of = (doc_of[:-1] if len(doc_of) else doc_of)[same]
            h1 = a * mul1 + bb * mul2 + add1
            h2 = a * mul2 + bb * mul1 + add2
        else:
            base = flat % np.uint64(1 << 20)
            h1 = base * mul1 + add1
            h2 = base * mul2 + add2
        b = (h1 % np.uint64(1 << 32)
             % np.uint64(n_features)).astype(np.int64)
        sgn = 1 - 2 * (h2 % np.uint64(1 << 32)
                       // np.uint64(1 << 31)).astype(np.int64)
        pack = doc_of * n_features + b
        u, inv, cnt = np.unique(pack, return_inverse=True,
                                return_counts=True)
        val = np.zeros(len(u), dtype=np.int64)
        np.add.at(val, inv, sgn)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(u // n_features)),
            "bucket": pa.array(u % n_features),
            "n": pa.array(cnt.astype(np.int64)),
            "value": pa.array(val)})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# chi-square token-class association (feature selection)
# ---------------------------------------------------------------------------

def token_class_chi2(ds: Dataset, tokens_col: str = "tokens",
                     class_col: str = "entity",
                     classes: Sequence[str] | None = None,
                     num_buckets: int = 32) -> Dataset:
    """Per-token chi-square statistic of the token-occurrence ×
    document-class contingency table — the SelectKBest(chi2) feature
    selection shape run natively on the ``list<int32>`` payload.
    For token t with per-class occurrence counts O_tc, row total
    R_t = Σ_c O_tc, class totals C_c and grand total N:
    ``chi2_t = Σ_c (O_tc − E_tc)² / E_tc`` with ``E_tc = R_t·C_c / N``
    (zero cells included — they contribute E_tc).

    Exactness contract: every count is exact int64. Per-block
    ``np.unique`` partials (the corpus never shuffles) ride ONE
    bucketed exchange on the token, whose task both merges the
    partial counts (lexsort + reduceat) and pivots the dense K-column
    contingency rows; class totals reduce zero-exchange from the
    materialized partials to K driver ints; chi2 accumulates the K
    class terms in FIXED class order with each term the ONE IEEE
    expression ``(O−(R·C)/N)² / ((R·C)/N)`` — a SQL twin spelling the
    identical left-associated sum compares STRICTLY.

    ``classes``: explicit class order (raises on unseen values in the
    data); default = sorted distinct values (one extra pruned pass
    over ``class_col``). Classes with zero token mass raise loudly.
    Output: ``token, n`` (= R_t) ``, chi2``."""
    if classes is None:
        vals = ds.select_columns([class_col]).unique(class_col)
        classes = sorted(vals)
    classes = list(classes)
    if not classes:
        raise ValueError("classes must be non-empty")
    if len(set(classes)) != len(classes):
        raise ValueError("classes contains duplicates")
    K = len(classes)
    _class_arr = pa.array(classes)

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ccol = t[class_col]
        if isinstance(ccol, pa.ChunkedArray):
            ccol = ccol.combine_chunks()
        idx = pc.index_in(ccol, value_set=_class_arr)
        if idx.null_count:
            bad_i = pc.index(pc.is_null(idx), True).as_py()
            raise ValueError(
                f"unseen {class_col} value "
                f"{ccol[bad_i].as_py()!r} not in classes")
        cidx_doc = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        cidx = np.repeat(cidx_doc, lengths)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "cidx": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(flat * K + cidx, return_counts=True)
        return pa.table({"tok": pa.array(u // K),
                         "cidx": pa.array(u % K),
                         "cnt": pa.array(c.astype(np.int64))})

    # vocab·K-bounded per-block partials, consumed by two passes
    counts = ds.map_batches(partial,
                            batch_format="pyarrow").materialize()

    def class_partial(t: pa.Table) -> pa.Table:
        tot = np.zeros(K, dtype=np.int64)
        if "cidx" in t.column_names and len(t):
            ci = t["cidx"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            c = t["cnt"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            np.add.at(tot, ci, c)
        return pa.table({"cidx": pa.array(np.arange(K, dtype=np.int64)),
                         "cvec": pa.array(tot)})

    # class totals zero-exchange: one K-row partial per block, summed
    # on the driver (blocks·K rows — driver-safe since K is a
    # driver-held list by contract)
    C = np.zeros(K, dtype=np.int64)
    for r in counts.map_batches(class_partial,
                                batch_format="pyarrow").take_all():
        C[int(r["cidx"])] += int(r["cvec"])
    N = int(C.sum())
    if N == 0:
        raise ValueError("empty corpus: no token occurrences")
    zero = [classes[i] for i in range(K) if C[i] == 0]
    if zero:
        raise ValueError(f"classes with zero token mass: {zero}")

    from .window import bucketed_apply

    def fold(t: pa.Table) -> pa.Table:
        tok = t["tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = t["cidx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        utok, inv = np.unique(tok, return_inverse=True)
        O = np.zeros((len(utok), K), dtype=np.int64)
        # merge per-block partials and pivot in one scatter-add
        np.add.at(O, (inv, ci), cnt)
        R = O.sum(axis=1)
        Rf = R.astype(np.float64)
        chi2 = np.zeros(len(utok), dtype=np.float64)
        for c in range(K):
            E = (Rf * float(C[c])) / float(N)
            d = O[:, c].astype(np.float64) - E
            chi2 = chi2 + (d * d) / E
        return pa.table({"token": pa.array(utok),
                         "n": pa.array(R),
                         "chi2": pa.array(chi2)})

    return bucketed_apply(counts, "tok", fold,
                          num_buckets=num_buckets, drop_bucket=False)


# ---------------------------------------------------------------------------
# token-embedding pooling (doc featurization from a broadcast matrix)
# ---------------------------------------------------------------------------

def pool_token_embeddings(ds: Dataset, emb: "np.ndarray",
                          tokens_col: str = "tokens",
                          id_col: str = "doc_id",
                          agg: str = "mean",
                          oov: str = "raise") -> Dataset:
    """Pool each document's token-embedding vectors into one doc
    vector — the bag-of-embeddings featurizer (fastText
    sentence-vector / mean-pool shape) run natively on the
    ``list<int32>`` payload against a broadcast ``(V, D)`` embedding
    matrix. Token ids index ``emb`` rows directly (remap upstream,
    e.g. ``token_remap`` or a ``% V`` fold, for arbitrary id spaces).

    Exactness contract: with an INTEGER ``emb`` (e.g. micro-unit
    quantized embeddings) the per-dim sums are exact int64 and the
    mean is ONE division per dim — SQL twins compare STRICTLY. Float
    matrices pool in float64 (reduction order fixed: ``np.add.reduceat``
    over the flattened stream in document order).

    Scale shape: ``ray.put`` the matrix ONCE, every task reads it
    zero-copy through the per-worker broadcast cache — zero shuffles,
    no join against a vocabulary table, streams at any corpus size.
    ``oov``: ``'raise'`` (default) on ids outside ``[0, V)``, or
    ``'skip'`` to drop them from the pool (a doc of only OOV tokens
    pools like an empty doc). Output: ``id_col, n`` (pooled token
    count) ``, vec`` (list<double>; null for empty pools under
    ``agg='mean'``, zeros under ``'sum'``)."""
    import ray as _ray
    from .partition import broadcast_get

    if agg not in ("mean", "sum"):
        raise ValueError("agg must be 'mean' or 'sum'")
    if oov not in ("raise", "skip"):
        raise ValueError("oov must be 'raise' or 'skip'")
    emb = np.ascontiguousarray(emb)
    if emb.ndim != 2 or len(emb) == 0:
        raise ValueError("emb must be a non-empty (V, D) matrix")
    V, D = emb.shape
    exact = np.issubdtype(emb.dtype, np.integer)
    ref = _ray.put(emb.astype(np.int64 if exact else np.float64))

    def fn(t: pa.Table) -> pa.Table:
        m = broadcast_get(ref)
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bad = (flat < 0) | (flat >= V)
        if bad.any():
            if oov == "raise":
                raise ValueError(
                    f"token id {int(flat[bad][0])} outside [0, {V})")
            doc_of = np.repeat(np.arange(len(t), dtype=np.int64),
                               lengths)
            keep = ~bad
            flat, doc_of = flat[keep], doc_of[keep]
            lengths = np.bincount(doc_of, minlength=len(t))
        offsets = np.concatenate(
            [np.zeros(1, dtype=np.int64),
             np.cumsum(lengths, dtype=np.int64)[:-1]]) \
            if len(t) else np.zeros(0, dtype=np.int64)
        sums = np.zeros((len(t), D),
                        dtype=np.int64 if exact else np.float64)
        nz = lengths > 0
        if flat.size:
            # reduceat needs strictly valid segment starts: compute on
            # the non-empty docs' offsets only
            seg = offsets[nz]
            red = np.add.reduceat(m[flat], seg, axis=0)
            # reduceat merges adjacent segments only when starts repeat
            # — they can't here (each start is distinct for non-empty
            # docs)
            sums[nz] = red
        n = lengths
        if agg == "sum":
            vec = sums.astype(np.float64)
            valid = np.ones(len(t), dtype=bool)
        else:
            denom = np.where(nz, n, 1).astype(np.float64)
            vec = sums.astype(np.float64) / denom[:, None]
            valid = nz
        flat_vec = pa.array(vec.reshape(-1))
        lv = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(t) + 1) * D, D, dtype=np.int32)),
            flat_vec)
        if not valid.all():
            lv = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(t) + 1) * D, D,
                                   dtype=np.int32)),
                flat_vec, mask=pa.array(~valid))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids,
                         "n": pa.array(n),
                         "vec": lv})

    return ds.map_batches(fn, batch_format="pyarrow")


def token_skipgram_pairs(ds: Dataset, tokens_col: str = "tokens",
                         window: int = 2) -> Dataset:
    """Skip-gram (center, context) pair counts within a ±``window``
    positional neighborhood — the word2vec / GloVe training-pair
    extractor run natively on the ``list<int32>`` payload. Every
    ordered pair with ``1 ≤ |i−j| ≤ window`` in the same document
    counts once (both directions, per the word2vec convention), so
    ``cnt(a,b) == cnt(b,a)`` globally. Exact int64: per-block
    ``np.unique`` partials on collision-free packed keys
    ``(center << 32) | context`` ride ONE ``groupby(key)`` exchange
    (vocab²-bounded — the corpus never shuffles). Output: ``center,
    context, cnt``."""
    from ray.data.aggregate import Sum

    if window < 1:
        raise ValueError("window must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        keys = []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            same = doc_of[:-d] == doc_of[d:]
            a, b = flat[:-d][same], flat[d:][same]
            keys.append((a << np.int64(32)) | b)   # forward
            keys.append((b << np.int64(32)) | a)   # backward
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"key": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    g = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))

    def fin(t: pa.Table) -> pa.Table:
        if "key" not in t.column_names or len(t) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"center": z, "context": z, "cnt": z})
        k = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "center": pa.array(k >> np.int64(32)),
            "context": pa.array(k & np.int64(0xFFFFFFFF)),
            "cnt": t["cnt"]})

    return g.map_batches(fin, batch_format="pyarrow")


def token_tfidf(ds: Dataset, tokens_col: str = "tokens",
                id_col: str = "doc_id",
                num_buckets: int = 32) -> Dataset:
    """TF-IDF long form run natively on the ``list<int32>`` payload —
    the token twin of the word-level :class:`...text.TfIdf`: one row
    per distinct (doc, token) with exact int64 ``tf`` (in-doc
    occurrences) and ``df`` (documents containing the token), and
    ``tfidf = tf · ln(N / df)`` with the natural-log IDF as ONE fixed
    expression (logs are irrational → round BOTH sides when comparing;
    np.log drifts 1 ulp off DuckDB ln on ~26% of inputs — measured).

    Scale shape: per-block distinct-(doc, token) partials (the doc
    never straddles blocks, so tf is block-local and exact) → the
    vocab-bounded df rides ONE ``groupby(token)`` exchange → df
    re-attaches through ONE :func:`...cc.attach_values` exchange (no
    broadcast — vocabulary unbounded); N is one streamed count."""
    from ray.data.aggregate import Sum
    from .cc import attach_values

    n_docs = ds.count()
    if n_docs == 0:
        raise ValueError("empty corpus")

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        if len(flat) == 0:
            return pa.table({
                id_col: pa.array([], type=t.schema.field(id_col).type),
                "token": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int64())})
        mx = int(flat.max()) + 1
        u, cnt = np.unique(doc_of * mx + flat, return_counts=True)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(u // mx)),
            "token": pa.array(u % mx),
            "tf": pa.array(cnt.astype(np.int64))})

    tf = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        if "token" not in t.column_names or len(t) == 0:
            return pa.table({"token": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        u, c = np.unique(t["token"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), return_counts=True)
        return pa.table({"token": pa.array(u),
                         "df": pa.array(c.astype(np.int64))})

    df = tf.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"))
    joined = attach_values(tf, "token", df, "token", ["df"],
                           how="inner", num_buckets=num_buckets)

    nf = float(n_docs)

    def fin(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return t.append_column(
            "tfidf", pa.array(tfv * np.log(nf / dfv)))

    return joined.map_batches(fin, batch_format="pyarrow")


def token_heaps_curve(ds: Dataset, ks, id_col: str = "doc_id",
                      tokens_col: str = "tokens") -> pa.Table:
    """Heaps'-law vocabulary-growth curve: for each prefix length ``k``
    in ``ks``, the number of DISTINCT token ids among the first ``k``
    tokens of the global stream (docs ascending by ``id_col``, tokens
    in document order) — the standard V(n) ~ K·nᵝ diagnostic behind
    "is the corpus still contributing new vocabulary" and dedup-audit
    saturation checks. Emits one row per ``k``: ``n_seen_tokens``
    (= min(k, stream length)) and ``n_distinct_tokens`` — exact int64.

    Scale shape: a weighted two-phase prefix scan (the
    ``partition.row_number`` pattern) hands each doc-sorted block its
    global token offset — the driver holds one int per block — so a
    block computes every occurrence's global position locally; the
    block's per-token MIN position partials (``np.unique`` first-hit,
    positions within a block are increasing) ride ONE
    ``groupby(token).min()`` exchange, and the curve finishes
    driver-side over the VOCAB-BOUNDED first-position table (the same
    documented contract as :func:`vocab_coverage`). The corpus itself
    never shuffles beyond the doc-id sort. Ties in ``id_col`` take
    block order — pass unique ids for full determinism."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    ks_arr = np.asarray(list(ks), dtype=np.int64)
    if len(ks_arr) == 0 or (ks_arr < 0).any():
        raise ValueError("ks must be non-empty, all >= 0")

    refs = ds.sort([id_col]).to_arrow_refs()

    empty_part = pa.table({"tok": pa.array([], type=pa.int64()),
                           "fp": pa.array([], type=pa.int64())})

    @ray.remote
    def block_ntok(t: pa.Table) -> int:
        if len(t) == 0 or tokens_col not in t.column_names:
            return 0           # empty sort/repartition blocks lose columns
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return len(col.flatten())

    @ray.remote
    def partial(t: pa.Table, base: int) -> pa.Table:
        if len(t) == 0 or tokens_col not in t.column_names:
            return empty_part
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "fp": pa.array([], type=pa.int64())})
        # global positions inside a doc-sorted block are contiguous, so
        # gpos = base + local index; np.unique's first-occurrence index
        # lands on the block-local MIN position per token.
        u, first = np.unique(flat, return_index=True)
        return pa.table({"tok": pa.array(u),
                         "fp": pa.array(base + first.astype(np.int64))})

    lens = np.array(ray.get([block_ntok.remote(r) for r in refs]),
                    dtype=np.int64)
    bases = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        bases[1:] = np.cumsum(lens[:-1])
    total = int(lens.sum()) if len(lens) else 0
    if total == 0:
        return pa.table({
            "k": pa.array(ks_arr),
            "n_seen_tokens": pa.array(np.zeros(len(ks_arr), np.int64)),
            "n_distinct_tokens": pa.array(np.zeros(len(ks_arr), np.int64))})
    parts = rd.from_arrow_refs(
        [partial.remote(r, int(b)) for r, b in zip(refs, bases)])
    fp = parts.groupby("tok").aggregate(Min("fp", alias_name="fp")) \
        .to_pandas()
    fps = np.sort(fp["fp"].to_numpy(dtype=np.int64))
    n_seen = np.minimum(ks_arr, total)
    n_distinct = np.searchsorted(fps, ks_arr, side="left")
    return pa.table({
        "k": pa.array(ks_arr),
        "n_seen_tokens": pa.array(n_seen.astype(np.int64)),
        "n_distinct_tokens": pa.array(n_distinct.astype(np.int64))})
