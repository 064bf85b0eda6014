"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  L2-normalized once, ``ray.put`` once; every batch does one numpy matmul
  and emits its local top-k per query; a tiny final per-query merge picks
  the global top-k. Communication = k rows per (query, block), never the
  corpus.
* :func:`knn_lsh` — scale path: random-hyperplane signatures bucket the
  corpus (one ``map_batches`` + ``groupby``); queries probe their own and
  neighboring buckets (multi-probe by flipping the lowest-margin bits).
  Approximate; recall measured against brute force in tests.
* :func:`embedding_dedup` — near-dup by cosine ≥ threshold via the same
  hyperplane buckets + verified pairwise cosine + connected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.clip(n, 1e-12, None)


def _batch_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    col = tbl[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if isinstance(col, (pa.FixedSizeListArray,)) or pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        dim = int(lens[0]) if len(lens) else 0
    return flat.reshape(len(col), dim).astype(np.float32)


class _TopKPartial:
    """Actor: holds the normalized query matrix; per batch emits its local
    top-k (query_id, vec_id, score) rows."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 dtype=np.float32):
        q = ray.get(queries_ref) if isinstance(
            queries_ref, ray.ObjectRef) else queries_ref
        self.dtype = dtype
        self.q = _norm_rows(np.asarray(q, dtype=dtype))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(batch, self.vec_col).astype(self.dtype))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = self.q @ m.T                      # (n_queries, n_batch)
        k = min(self.k, scores.shape[1])
        if k == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        nq = scores.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        vid = ids[part.reshape(-1)]
        sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
        return pa.table({"query_id": pa.array(qid),
                         "vec_id": pa.array(vid.astype(np.int64)),
                         "score": pa.array(sc.astype(np.float64))})


def knn_bruteforce(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   concurrency=(1, 8), dtype=np.float32,
                   merge: str = "driver") -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns (query_id, vec_id,
    score, rank) sorted by (query_id, rank); ties broken by vec_id so the
    result is deterministic. ``dtype=np.float64`` for oracle-precision
    scores (float32 matmul is ~2x faster and the default).

    ``merge="driver"`` collects the per-block partials (k × n_blocks ×
    n_queries rows) — fine for interactive query counts.
    ``merge="distributed"`` reduces them with a ``groupby(query_id)``
    shuffle instead, so 10⁵+ simultaneous queries never funnel through
    the driver."""
    ref = ray.put(np.asarray(query_vecs, dtype=dtype))
    partials = ds.map_batches(
        _TopKPartial, batch_format="pyarrow",
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, vec_col=vec_col,
                                   id_col=id_col, dtype=dtype),
        concurrency=concurrency)

    def _finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["query_id", "score", "vec_id"],
                              ascending=[True, False, True], kind="stable")
        out = pdf.groupby("query_id", group_keys=False).head(
            k).reset_index(drop=True)
        out["rank"] = out.groupby("query_id").cumcount().astype("int64")
        return out

    if merge == "distributed":
        reduced = partials.groupby("query_id").map_groups(
            lambda g: _finalize(g), batch_format="pandas")
        return _finalize(reduced.to_pandas())   # tiny: nq × k rows

    return _finalize(partials.to_pandas())


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float32)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    proj = m @ planes.T
    bits = (proj > 0).astype(np.uint64)
    return (bits << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def knn_lsh(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            bits: int = 8, probes: int = 8, seed: int = 11) -> pd.DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus, probe each query's
    bucket plus the ``probes-1`` buckets reached by flipping its
    lowest-|margin| bits, brute-force within the probed set."""
    q = _norm_rows(np.asarray(query_vecs, dtype=np.float32))
    planes = _hyperplanes(q.shape[1], bits, seed)

    def assign(tbl: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        b = _bucket_of(m, planes)
        return pa.table({
            id_col: tbl[id_col],
            vec_col: tbl[vec_col],
            "__bucket_lsh": pa.array(b.astype(np.int64)),
        })

    bucketed = ds.map_batches(assign, batch_format="pyarrow")

    # multi-probe set per query: own bucket + buckets reached by flipping
    # subsets of the lowest-|margin| bits, ordered by total flipped margin
    from itertools import combinations
    proj = q @ planes.T
    base = (proj > 0).astype(np.uint64)
    base_id = (base << np.arange(bits, dtype=np.uint64)).sum(axis=1)
    order = np.argsort(np.abs(proj), axis=1)
    probe_sets = []
    m = min(bits, 8)  # consider subsets of the 8 lowest-margin bits
    for qi in range(len(q)):
        margins = np.abs(proj[qi])
        cands = []
        for r in (1, 2, 3):
            for combo in combinations(order[qi, :m].tolist(), r):
                cands.append((sum(margins[list(combo)]), combo))
        cands.sort(key=lambda t: t[0])
        buckets = {int(base_id[qi])}
        for _, combo in cands:
            if len(buckets) >= probes:
                break
            mask = 0
            for bit in combo:
                mask |= 1 << int(bit)
            buckets.add(int(base_id[qi]) ^ mask)
        probe_sets.append(buckets)
    wanted = sorted(set().union(*probe_sets)) if probe_sets else []

    wanted_arr = pa.array(wanted, type=pa.int64())
    sub = bucketed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["__bucket_lsh"],
                                            value_set=wanted_arr)),
        batch_format="pyarrow")
    cand = sub.to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                             "rank": []})
    mat = _norm_rows(np.stack(
        [np.asarray(v, dtype=np.float32) for v in cand[vec_col]]))
    ids = cand[id_col].to_numpy()
    bks = cand["__bucket_lsh"].to_numpy()
    frames = []
    for qi in range(len(q)):
        mask = np.isin(bks, list(probe_sets[qi]))
        if not mask.any():
            continue
        sc = mat[mask] @ q[qi]
        sel_ids = ids[mask]
        kk = min(k, len(sc))
        top = np.argsort(-sc, kind="stable")[:kk]
        frames.append(pd.DataFrame({
            "query_id": qi, "vec_id": sel_ids[top].astype(np.int64),
            "score": sc[top].astype(np.float64),
            "rank": np.arange(kk, dtype=np.int64)}))
    return (pd.concat(frames).reset_index(drop=True) if frames
            else pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                               "rank": []}))


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 10,
                 seed: int = 23) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (numpy only).

    Deterministic: k-means++-ish init by farthest-point from a seeded
    start, fixed iteration count. Sample sizes are bounded by the caller
    so this is O(sample × k × iters) on the driver."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    centers = [sample[rng.integers(0, n)]]
    for _ in range(k - 1):
        d = np.min(
            [np.linalg.norm(sample - c, axis=1) for c in centers], axis=0)
        centers.append(sample[int(np.argmax(d))])
    cent = np.stack(centers)
    for _ in range(iters):
        assign = np.argmax(_norm_rows(sample) @ _norm_rows(cent).T, axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = sample[mask].mean(axis=0)
    return _norm_rows(cent)


def knn_ivf(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            n_centroids: int = 16, n_probe: int = 4,
            sample_size: int = 2048, seed: int = 23) -> pd.DataFrame:
    """IVF ANN: cluster a sample into ``n_centroids`` (driver-side seeded
    k-means), broadcast the centroids, assign every vector to its nearest
    centroid in one ``map_batches``, then brute-force only the vectors in
    each query's ``n_probe`` nearest cells.

    The scale path next to :func:`knn_lsh`: at corpus scale the centroid
    fit touches a bounded sample, the assignment is one streaming pass,
    and a query reads ``n_probe / n_centroids`` of the corpus."""
    q = _norm_rows(np.asarray(query_vecs, dtype=np.float32))
    sample_rows = ds.limit(sample_size).to_pandas()
    sample = _norm_rows(np.stack(
        [np.asarray(v, dtype=np.float32) for v in sample_rows[vec_col]]))
    cent = _kmeans_lite(sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) \
            else cent_ref
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        cell = np.argmax(m @ c.T, axis=1)
        return pa.table({
            id_col: tbl[id_col], vec_col: tbl[vec_col],
            "__ivf_cell": pa.array(cell.astype(np.int64)),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    qcells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    wanted = pa.array(sorted(set(qcells.reshape(-1).tolist())),
                      type=pa.int64())
    cand = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["__ivf_cell"],
                                            value_set=wanted)),
        batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                             "rank": []})
    mat = _norm_rows(np.stack(
        [np.asarray(v, dtype=np.float32) for v in cand[vec_col]]))
    ids = cand[id_col].to_numpy()
    cells = cand["__ivf_cell"].to_numpy()
    frames = []
    for qi in range(len(q)):
        mask = np.isin(cells, qcells[qi])
        if not mask.any():
            continue
        sc = mat[mask] @ q[qi]
        sel = ids[mask]
        kk = min(k, len(sc))
        order = np.lexsort((sel, -sc))[:kk]
        frames.append(pd.DataFrame({
            "query_id": qi, "vec_id": sel[order].astype(np.int64),
            "score": sc[order].astype(np.float64),
            "rank": np.arange(kk, dtype=np.int64)}))
    return (pd.concat(frames).reset_index(drop=True) if frames
            else pd.DataFrame({"query_id": [], "vec_id": [], "score": [],
                               "rank": []}))


def embedding_dedup(ds: Dataset, threshold: float = 0.95,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    bits: int = 6, seed: int = 11,
                    max_bucket: int = 4096, num_buckets: int = 16,
                    output: str = "pandas"):
    """Near-dup by embedding cosine: hyperplane buckets → in-bucket pairwise
    cosine ≥ threshold → distributed connected components (cluster = min
    id, same tail as the MinHash/SimHash pipelines — see ``stages/cc.py``).

    The in-bucket all-pairs matmul is O(b²); buckets are capped at
    ``max_bucket`` smallest ids (a hot bucket is boilerplate where a
    representative pairing suffices), mirroring the MinHash
    ``max_bucket`` guard. Raise ``bits`` to shrink buckets at corpus
    scale."""
    from .dedup import _cluster_output
    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 0
    planes = _hyperplanes(dim, bits, seed)

    def assign(tbl: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        b = _bucket_of(m, planes)
        return pa.table({
            id_col: tbl[id_col], vec_col: tbl[vec_col],
            "__bucket_lsh": pa.array(b.astype(np.int64)),
        })

    def pairs_of_shard(tbl: pa.Table) -> pa.Table:
        """All LSH buckets hashed into this shard: per-bucket capped
        all-pairs cosine, vectorized (one zero-copy matrix per shard,
        one matmul per bucket)."""
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if len(tbl) < 2:
            return empty
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bks = tbl["__bucket_lsh"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bks))
        ids, bks, m = ids[order], bks[order], m[order]
        starts = np.r_[np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]]),
                       len(bks)]
        a_out, b_out = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            e = min(e, s + max_bucket)
            if e - s < 2:
                continue
            sub = m[s:e]
            sims = sub @ sub.T
            i, j = np.triu_indices(e - s, k=1)
            keep = sims[i, j] >= threshold
            a_out.append(ids[s:e][i[keep]])
            b_out.append(ids[s:e][j[keep]])
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out)),
                         "b": pa.array(np.concatenate(b_out))})

    from .window import bucketed_apply
    bucketed = ds.map_batches(assign, batch_format="pyarrow")
    pairs = bucketed_apply(bucketed, "__bucket_lsh", pairs_of_shard,
                           num_buckets=num_buckets, drop_bucket=False)
    return _cluster_output(ds.select_columns([id_col]), pairs, id_col,
                           num_buckets, output)
