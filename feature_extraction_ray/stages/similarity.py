"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  L2-normalized once, ``ray.put`` once; every batch does one numpy matmul
  and emits its local top-k per query; a tiny final per-query merge picks
  the global top-k. Communication = k rows per (query, block), never the
  corpus.
* :func:`knn_lsh` — scale path: random-hyperplane signatures bucket the
  corpus (one streaming ``map_batches`` pass); queries probe their own
  and neighboring buckets (multi-probe by flipping the lowest-margin
  bits). Probed candidates are scored INSIDE ``map_batches`` against the
  broadcast query matrix — they never reach the driver. Approximate;
  recall measured against brute force in tests.
* :func:`knn_ivf` — IVF variant: bounded-sample k-means centroids,
  streaming cell assignment, per-query ``n_probe`` cells; same
  in-cluster scoring + merge tail as LSH.
* :func:`embedding_dedup` — near-dup by cosine ≥ threshold via the same
  hyperplane buckets (capped per-shard all-pairs) + distributed
  connected components (``stages/cc.py``).
* :func:`semdedup` — SemDeDup (Abbas et al. 2023): same pair-scan + CC
  tail but over data-adaptive k-means cells (bounded-sample fit,
  broadcast centroids, streaming assignment).

Top-k merges: per-block partials reduce either on the driver
(interactive) or via one bucketed exchange with a vectorized per-shard
top-k (``merge="distributed"``/``"dataset"``) — safe for 10⁵+ query
batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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
        # tie-INCLUSIVE local top-k: argpartition alone drops candidates
        # tied with the k-th best arbitrarily (exact-duplicate vectors
        # make score ties real); keeping every row ≥ the k-th score lets
        # the global merge break ties deterministically by vec_id
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        kth = np.take_along_axis(scores, part, axis=1).min(axis=1)
        qid, idx = np.nonzero(scores >= kth[:, None])
        return pa.table({"query_id": pa.array(qid.astype(np.int64)),
                         "vec_id": pa.array(ids[idx].astype(np.int64)),
                         "score": pa.array(
                             scores[qid, idx].astype(np.float64))})


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
    from .partition import cached_kernel
    ref = ray.put(np.asarray(query_vecs, dtype=dtype))

    def score(batch: pa.Table) -> pa.Table:
        # task pool + per-worker kernel memo keyed on the broadcast ref:
        # each worker normalizes the query matrix once, no actor spin-up
        return cached_kernel(_TopKPartial, ref, k, vec_col, id_col,
                             dtype)(batch)

    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, merge)


def _finalize_topk(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Deterministic top-k per query from partial rows: sort by (query,
    score desc, vec_id asc) and rank — ties always break on vec_id."""
    pdf = pdf.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True], kind="stable")
    out = pdf.groupby("query_id", group_keys=False).head(
        k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return out


def _topk_shard_factory(k: int):
    """Vectorized exact top-k per query over one shard of partial rows
    (every row of a query is in the shard): one lexsort, run-relative
    ranks, keep rank < k. No per-query Python calls — safe for 10⁵+
    queries per shard."""
    def topk_shard(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64()),
                             "rank": pa.array([], type=pa.int64())})
        qid = tbl["query_id"].to_numpy(zero_copy_only=False)
        vid = tbl["vec_id"].to_numpy(zero_copy_only=False)
        sc = tbl["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sc, qid))
        qid, vid, sc = qid[order], vid[order], sc[order]
        starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
        run_id = np.repeat(np.arange(len(starts)),
                           np.diff(np.r_[starts, len(qid)]))
        rank = np.arange(len(qid)) - starts[run_id]
        keep = rank < k
        return pa.table({
            "query_id": pa.array(qid[keep].astype(np.int64)),
            "vec_id": pa.array(vid[keep].astype(np.int64)),
            "score": pa.array(sc[keep].astype(np.float64)),
            "rank": pa.array(rank[keep].astype(np.int64))})
    return topk_shard


def _merge_topk(partials: Dataset, k: int, merge: str):
    """Reduce per-block top-k partials to the global top-k per query.

    ``merge="driver"`` collects k × n_blocks rows per query — fine for
    interactive query counts. ``merge="distributed"`` reduces with one
    bucketed exchange on query_id and a vectorized per-shard top-k, so
    10⁵+ simultaneous queries never funnel through the driver; the final
    frame is only nq × k rows. ``merge="dataset"`` is the same reduce but
    returns the Dataset (write it to parquet at batch scale)."""
    if merge in ("distributed", "dataset"):
        from .window import bucketed_apply
        reduced = bucketed_apply(partials, "query_id",
                                 _topk_shard_factory(k), num_buckets=32,
                                 drop_bucket=False)
        if merge == "dataset":
            return reduced
        return (reduced.to_pandas()
                .sort_values(["query_id", "rank"])
                .reset_index(drop=True))
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    return _finalize_topk(pdf, k)


class _ProbedTopK:
    """Actor for bucketed ANN scoring: holds the normalized query matrix
    plus a bucket→query-index mapping (both ``ray.put`` once). Per batch:
    keep only rows whose bucket any query probes, group rows by bucket
    (sorted runs), one matmul per (bucket, probing-queries) pair, emit
    local top-k rows (query_id, vec_id, score). Candidates never leave
    the cluster; the driver sees only merged top-k partials."""

    def __init__(self, queries_ref, bucket2q_ref, k: int, vec_col: str,
                 id_col: str, bucket_col: str, dtype=np.float32):
        self.dtype = dtype
        self.q = _norm_rows(np.asarray(ray.get(queries_ref), dtype=dtype))
        self.b2q = ray.get(bucket2q_ref)      # dict bucket -> np.ndarray qidx
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.bucket_col = bucket_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        if len(batch) == 0:
            return empty
        bks = batch[self.bucket_col].to_numpy(zero_copy_only=False)
        m = _norm_rows(_batch_matrix(batch, self.vec_col).astype(self.dtype))
        ids = batch[self.id_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        # Sort by (bucket, vec_id): vec_id-ascending columns make the
        # stable per-row score sort below break ties deterministically by
        # smallest vec_id (argpartition picked arbitrarily among ties at
        # the k-boundary, which could flip oracle-checked exhaustive-probe
        # results on duplicate embeddings).
        order = np.lexsort((ids, bks))
        bks, m, ids = bks[order], m[order], ids[order]
        starts = np.r_[np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]]),
                       len(bks)]
        qs, vs, ss = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            qidx = self.b2q.get(int(bks[s]))
            if qidx is None:
                continue
            scores = self.q[qidx] @ m[s:e].T        # (nq_probe, run)
            kk = min(self.k, e - s)
            part = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
            qs.append(np.repeat(qidx.astype(np.int64), part.shape[1]))
            vs.append(ids[s:e][part.reshape(-1)])
            ss.append(np.take_along_axis(scores, part, axis=1).reshape(-1))
        if not qs:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(qs)),
            "vec_id": pa.array(np.concatenate(vs)),
            "score": pa.array(np.concatenate(ss).astype(np.float64))})


def _probed_topk(bucketed: Dataset, q: np.ndarray, probe_lists,
                 k: int, vec_col: str, id_col: str, bucket_col: str,
                 merge: str, concurrency, dtype=np.float32) -> pd.DataFrame:
    """Shared tail of knn_lsh / knn_ivf: prune to probed buckets, score
    inside ``map_batches`` against the broadcast query set, merge."""
    b2q: dict = {}
    for qi, buckets in enumerate(probe_lists):
        for b in buckets:
            b2q.setdefault(int(b), []).append(qi)
    b2q = {b: np.asarray(qs, dtype=np.int64) for b, qs in b2q.items()}
    wanted_arr = pa.array(sorted(b2q), type=pa.int64())

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.is_in(t[bucket_col],
                                         value_set=wanted_arr))

    from .partition import cached_kernel
    q_ref, b2q_ref = ray.put(q), ray.put(b2q)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_ProbedTopK, q_ref, b2q_ref, k, vec_col,
                             id_col, bucket_col, dtype)(batch)

    partials = bucketed.map_batches(prune, batch_format="pyarrow") \
        .map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, merge)


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float32)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    proj = m @ planes.T
    bits = (proj > 0).astype(np.uint64)
    return (bits << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def knn_lsh(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            bits: int = 8, probes: int | str = 8, seed: int = 11,
            merge: str = "driver", dtype=np.float32,
            concurrency=(1, 8)) -> pd.DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus, probe each query's
    bucket plus the ``probes-1`` buckets reached by flipping its
    lowest-|margin| bits, score the probed set INSIDE ``map_batches``
    against the broadcast query matrix (candidates never reach the
    driver), merge per-block top-k partials (``merge="distributed"`` for
    batch query sets).

    ``probes="all"`` probes every ``2**bits`` bucket — exhaustive, so the
    result equals :func:`knn_bruteforce` and the whole bucketing/in-map
    scoring/top-k-merge path runs under the exact brute-force oracle
    (pair with ``dtype=np.float64`` for bit-stable scores)."""
    q = _norm_rows(np.asarray(query_vecs, dtype=dtype))
    planes = _hyperplanes(q.shape[1], bits, seed).astype(dtype)

    def assign(tbl: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(tbl, vec_col).astype(dtype))
        b = _bucket_of(m, planes)
        return pa.table({
            id_col: tbl[id_col],
            vec_col: tbl[vec_col],
            "__bucket_lsh": pa.array(b.astype(np.int64)),
        })

    bucketed = ds.map_batches(assign, batch_format="pyarrow")

    if probes == "all":
        all_buckets = set(range(1 << bits))
        probe_sets = [all_buckets] * len(q)
    else:
        probe_sets = _multiprobe_sets(q, planes.astype(np.float32),
                                      bits, probes)
    return _probed_topk(bucketed, q, probe_sets, k, vec_col, id_col,
                        "__bucket_lsh", merge, concurrency, dtype=dtype)


def _multiprobe_sets(q: np.ndarray, planes: np.ndarray, bits: int,
                     probes: int) -> list:
    """Multi-probe bucket set per query — own bucket plus the buckets
    reached by flipping subsets (size ≤ 3) of the lowest-|margin| bits,
    ordered by total flipped margin. Fully vectorized across queries:
    one matmul over a fixed combo-indicator matrix for the margin sums,
    one (exact, < 2⁵³) float matmul for the XOR masks — no per-query
    Python loop, so a 10⁵-query batch costs milliseconds on the driver."""
    from itertools import combinations
    proj = q @ planes.T
    base = (proj > 0).astype(np.uint64)
    base_id = (base << np.arange(bits, dtype=np.uint64)).sum(axis=1)
    m = min(bits, 8)  # consider subsets of the 8 lowest-margin bits
    ranks = np.argsort(np.abs(proj), axis=1)[:, :m]        # (nq, m)
    margins_ranked = np.take_along_axis(np.abs(proj), ranks, axis=1)
    combos = [c for r in (1, 2, 3) if r <= m
              for c in combinations(range(m), r)]
    cmat = np.zeros((len(combos), m))
    for ci, c in enumerate(combos):
        cmat[ci, list(c)] = 1.0
    msum = margins_ranked @ cmat.T                         # (nq, ncombo)
    # XOR masks: Σ 2^bit over the combo's ranked bits; values < 2^bits
    # so the float64 matmul is exact
    pw = np.power(2.0, ranks.astype(np.float64))           # (nq, m)
    masks = (pw @ cmat.T).astype(np.uint64)                # (nq, ncombo)
    take = min(max(probes - 1, 0), len(combos))
    # stable ascending-margin order ties to combo enumeration order,
    # matching the original per-query sort
    order_c = np.argsort(msum, axis=1, kind="stable")[:, :take]
    flip_ids = base_id[:, None] ^ np.take_along_axis(masks, order_c,
                                                     axis=1)
    return [{int(base_id[qi]), *map(int, flip_ids[qi])}
            for qi in range(len(q))]


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
            sample_size: int = 2048, seed: int = 23,
            merge: str = "driver", dtype=np.float32,
            concurrency=(1, 8)) -> pd.DataFrame:
    """IVF ANN: cluster a sample into ``n_centroids`` (driver-side seeded
    k-means on a bounded sample), broadcast the centroids, assign every
    vector to its nearest centroid in one ``map_batches``, then score only
    the vectors in each query's ``n_probe`` nearest cells — inside
    ``map_batches`` against the broadcast query matrix, so candidates
    never reach the driver.

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
    return _probed_topk(assigned, q, [row.tolist() for row in qcells],
                        k, vec_col, id_col, "__ivf_cell", merge,
                        concurrency, dtype=dtype)


def embedding_dedup(ds: Dataset, threshold: float = 0.95,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    bits: int = 6, seed: int = 11,
                    max_bucket: int = 4096,
                    num_buckets: int | None = None,
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
    if num_buckets is None:
        from .partition import derive_num_buckets
        num_buckets = derive_num_buckets(ds)
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

    from .window import bucketed_apply
    bucketed = ds.map_batches(assign, batch_format="pyarrow")
    pairs = bucketed_apply(
        bucketed, "__bucket_lsh",
        _pairs_scan_factory(vec_col, id_col, "__bucket_lsh", threshold,
                            max_bucket, "embedding_dedup"),
        num_buckets=num_buckets, drop_bucket=False)
    return _cluster_output(ds.select_columns([id_col]), pairs, id_col,
                           num_buckets, output)


def _pairs_scan_factory(vec_col: str, id_col: str, cell_col: str,
                        threshold: float, max_bucket: int, stat_key: str):
    """Per-shard capped all-pairs cosine over the cells hashed into the
    shard: one zero-copy matrix per shard, one matmul per cell, pairs
    with cosine ≥ threshold emitted as (a, b) id edges. Cells larger than
    ``max_bucket`` keep their smallest ids (truncation counted into
    ``truncation_report()``)."""
    def pairs_of_shard(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if len(tbl) < 2:
            return empty
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bks = tbl[cell_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bks))
        ids, bks, m = ids[order], bks[order], m[order]
        starts = np.r_[np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]]),
                       len(bks)]
        a_out, b_out = [], []
        n_capped = rows_capped = 0
        for s, e0 in zip(starts[:-1], starts[1:]):
            e = min(e0, s + max_bucket)
            if e0 - s > max_bucket:
                n_capped += 1
                rows_capped += e0 - s - max_bucket
            if e - s < 2:
                continue
            sub = m[s:e]
            sims = sub @ sub.T
            i, j = np.triu_indices(e - s, k=1)
            keep = sims[i, j] >= threshold
            a_out.append(ids[s:e][i[keep]])
            b_out.append(ids[s:e][j[keep]])
        if n_capped:
            from .dedup import record_truncation
            record_truncation(stat_key, n_capped, rows_capped)
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out)),
                         "b": pa.array(np.concatenate(b_out))})
    return pairs_of_shard


def semdedup(ds: Dataset, threshold: float = 0.95, n_clusters: int = 64,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 4096, seed: int = 23,
             max_bucket: int = 4096, num_buckets: int | None = None,
             output: str = "pandas"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means cells — cluster a bounded sample into ``n_clusters``
    centroids on the driver, broadcast them, assign every vector to its
    nearest cell in one streaming pass, then pairwise cosine ≥
    ``threshold`` WITHIN each cell + the engine's distributed
    connected-components tail (cluster = min id, ``stages/cc.py``).

    Identical exchange shape to :func:`embedding_dedup` (one bucketed
    pair scan + CC) but with data-adaptive cells instead of random
    hyperplanes: near-dups concentrate in the same k-means cell, so
    recall at equal cell size is higher on clustered corpora. Like the
    paper, cross-cell duplicates are missed by design; ``n_clusters=1``
    degenerates to exact all-pairs (used by the equivalence golden).
    """
    from .dedup import _cluster_output
    if num_buckets is None:
        from .partition import derive_num_buckets
        num_buckets = derive_num_buckets(ds)
    sample_rows = ds.limit(sample_size).to_pandas()
    if len(sample_rows) == 0:
        import ray.data as rd
        empty_pairs = rd.from_arrow(pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64())}))
        return _cluster_output(ds.select_columns([id_col]), empty_pairs,
                               id_col, num_buckets, output)
    sample = _norm_rows(np.stack(
        [np.asarray(v, dtype=np.float32) for v in sample_rows[vec_col]]))
    cent = _kmeans_lite(sample, n_clusters, seed=seed)
    cent_ref = ray.put(cent)
    from .partition import broadcast_get

    def assign(tbl: pa.Table) -> pa.Table:
        c = broadcast_get(cent_ref)    # deserialized once per worker
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        cell = np.argmax(m @ c.T, axis=1)
        return pa.table({
            id_col: tbl[id_col], vec_col: tbl[vec_col],
            "__sem_cell": pa.array(cell.astype(np.int64)),
        })

    from .window import bucketed_apply
    bucketed = ds.map_batches(assign, batch_format="pyarrow")
    pairs = bucketed_apply(
        bucketed, "__sem_cell",
        _pairs_scan_factory(vec_col, id_col, "__sem_cell", threshold,
                            max_bucket, "semdedup"),
        num_buckets=num_buckets, drop_bucket=False)
    return _cluster_output(ds.select_columns([id_col]), pairs, id_col,
                           num_buckets, output)


# ---------------------------------------------------------------------------
# Persistent IVF index (build once, query many)
# ---------------------------------------------------------------------------

def build_ivf_index(ds: Dataset, path: str, n_centroids: int = 64,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_size: int = 4096, seed: int = 23) -> dict:
    """Build and PERSIST an IVF index: bounded-sample k-means centroids +
    the corpus written as parquet PARTITIONED BY CELL
    (``{path}/__ivf_cell=<c>/``). A later :func:`query_ivf_index` reads
    only the probed cells' files — at corpus scale a query touches
    ``n_probe / n_centroids`` of the BYTES ON DISK, not just of the rows.
    Centroids live in ``{path}/_centroids.parquet``. Deterministic
    (seeded sample + k-means). Returns {"n_centroids", "dim", "path"}.
    """
    import pyarrow.parquet as _pq
    sample_rows = ds.limit(sample_size).to_pandas()
    sample = _norm_rows(np.stack(
        [np.asarray(v, dtype=np.float32) for v in sample_rows[vec_col]]))
    cent = _kmeans_lite(sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        cell = np.argmax(m @ c.T, axis=1)
        return pa.table({
            id_col: tbl[id_col], vec_col: tbl[vec_col],
            "__ivf_cell": pa.array(cell.astype(np.int64)),
        })

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["__ivf_cell"])
    dim = cent.shape[1]
    _pq.write_table(pa.table({
        "cell": pa.array(np.arange(len(cent), dtype=np.int64)),
        "centroid": pa.FixedSizeListArray.from_arrays(
            pa.array(cent.reshape(-1).astype(np.float32)), dim),
    }), f"{path}/_centroids.parquet")
    return {"n_centroids": int(len(cent)), "dim": int(dim), "path": path}


def query_ivf_index(path: str, query_vecs: np.ndarray, k: int = 10,
                    n_probe: int = 4, vec_col: str = "embedding",
                    id_col: str = "vec_id", merge: str = "driver",
                    concurrency=(1, 8)) -> pd.DataFrame:
    """ANN query against a persisted IVF index: load the (tiny) centroid
    table, pick each query's ``n_probe`` nearest cells, and
    ``read_parquet`` ONLY those cell directories — unprobed cells never
    leave storage. Scoring/merge is the shared in-map probed-top-k path."""
    import os
    import pyarrow.parquet as _pq
    import ray.data as rd
    ctbl = _pq.read_table(f"{path}/_centroids.parquet")
    cent = np.asarray(ctbl["centroid"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False), dtype=np.float32) \
        .reshape(len(ctbl), -1)
    q = _norm_rows(np.asarray(query_vecs, dtype=np.float32))
    qcells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in qcells for c in row})
    # Ray expands a SINGLE directory path but treats a list as files —
    # list each probed cell's parquet files explicitly
    dirs = []
    for c in wanted:
        d = os.path.join(path, f"__ivf_cell={c}")
        if os.path.isdir(d):
            dirs.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                        if f.endswith(".parquet"))
    if not dirs:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    sub = rd.read_parquet(dirs)

    def recover_cell(tbl: pa.Table) -> pa.Table:
        # hive partition value comes back as a column when reading the
        # partition dirs; recompute if absent (pruned reads)
        if "__ivf_cell" in tbl.column_names:
            cell = tbl["__ivf_cell"].cast(pa.int64())
            return pa.table({id_col: tbl[id_col], vec_col: tbl[vec_col],
                             "__ivf_cell": cell})
        m = _norm_rows(_batch_matrix(tbl, vec_col))
        cell = np.argmax(m @ cent.T, axis=1)
        return pa.table({id_col: tbl[id_col], vec_col: tbl[vec_col],
                         "__ivf_cell": pa.array(cell.astype(np.int64))})

    sub = sub.map_batches(recover_cell, batch_format="pyarrow")
    return _probed_topk(sub, q, [row.tolist() for row in qcells], k,
                        vec_col, id_col, "__ivf_cell", merge, concurrency)


def kmeans_fit(ds: Dataset, k: int, vec_col: str = "embedding",
               id_col: str = "vec_id", iters: int = 10,
               sample_size: int = 2048, seed: int = 23,
               normalize: bool = True) -> dict:
    """FULLY DISTRIBUTED Lloyd's k-means over an embedding column: the
    textbook Ray-Data iterative pattern. Init is the seeded
    farthest-point pick of ``_kmeans_lite`` on a bounded sample; each
    iteration then BROADCASTS the centroids (``ray.put`` once) and runs
    ONE streaming ``map_batches`` pass where every batch emits a
    k×(d+1) partial (per-cluster vector sums via ``np.add.at`` +
    counts) — zero shuffles per iteration, driver traffic is
    #blocks·k·d floats, never the corpus. The init sample is sorted by
    ``id_col`` (fully deterministic) and partials are merged on the
    driver sorted by a per-batch key (min id), so run-to-run variation
    is bounded by float-addition reordering across block boundaries
    (≲1e-15 per step) — block layouts themselves are not stable across
    Ray runs.

    Returns ``{"centroids": (k, d) float64, "iters": n, "inertia":
    final within-cluster cosine objective}``. Empty clusters keep their
    previous centroid (standard Lloyd convention)."""
    proj = ds.select_columns([id_col, vec_col]).materialize()
    # deterministic init sample regardless of block order: a stable
    # id-hash stride picks ~sample_size rows, then sort by id
    n_total = proj.count()
    stride = max(1, n_total // sample_size)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return t.filter(pa.array((h % np.uint64(stride)) == 0))

    sample_rows = proj.map_batches(pick, batch_format="pyarrow") \
        .to_pandas().sort_values(id_col, kind="stable") \
        .reset_index(drop=True).head(sample_size)
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in sample_rows[vec_col]])
    if normalize:
        sample = _norm_rows(sample)
    cent = _kmeans_lite(sample.astype(np.float32), k,
                        iters=0, seed=seed).astype(np.float64)
    k = len(cent)
    d = cent.shape[1]

    sim = 0.0       # inertia of the LAST iteration; 0.0 when iters=0
    for it in range(iters):
        ref = ray.put(cent)

        def partial(tbl: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _batch_matrix(tbl, vec_col).astype(np.float64)
            if normalize:
                m = _norm_rows(m)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=k).astype(np.float64)
            ids = tbl[id_col].to_numpy(zero_copy_only=False)
            key = int(ids.min()) if len(ids) else -1
            sim = (m * c[assign]).sum()
            return pa.table({
                "key": pa.array([key], type=pa.int64()),
                "sums": pa.array([sums.ravel()]),
                "cnt": pa.array([cnt]),
                "sim": pa.array([float(sim)])})

        parts = proj.map_batches(partial,
                                 batch_format="pyarrow").to_pandas()
        parts = parts.sort_values("key").reset_index(drop=True)
        tot = np.zeros(k * d)
        cnt = np.zeros(k)
        sim = 0.0
        for _, r in parts.iterrows():
            tot += np.asarray(r["sums"], dtype=np.float64)
            cnt += np.asarray(r["cnt"], dtype=np.float64)
            sim += float(r["sim"])
        sums = tot.reshape(k, d)
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / cnt[nz, None]
        if normalize:
            cent[nz] = _norm_rows(cent[nz])
    return {"centroids": cent, "iters": iters,
            "inertia": float(sim), "normalize": normalize}


def kmeans_assign(ds: Dataset, model: dict, vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  out_col: str = "cluster") -> Dataset:
    """Assign every vector to its nearest (cosine if the model was fit
    normalized) centroid — broadcast centroids, one streaming pass."""
    cent = np.asarray(model["centroids"], dtype=np.float64)
    normalize = bool(model.get("normalize", True))
    ref = ray.put(cent)
    from .partition import broadcast_get

    def fn(tbl: pa.Table) -> pa.Table:
        c = broadcast_get(ref)
        m = _batch_matrix(tbl, vec_col).astype(np.float64)
        if normalize:
            m = _norm_rows(m)
        assign = np.argmax(m @ c.T, axis=1)
        return pa.table({id_col: tbl[id_col],
                         out_col: pa.array(assign.astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_mmr(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
            fetch_k: int = 50, lam: float = 0.5,
            vec_col: str = "embedding", id_col: str = "vec_id",
            dtype=np.float64) -> pd.DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998): fetch each query's exact cosine top-``fetch_k``
    with :func:`knn_bruteforce` (distributed — candidates never exceed
    queries × fetch_k rows), pull ONLY the candidate vectors via a
    broadcast semi-join, then greedily select k results maximizing
    ``λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s)`` per query
    (vectorized: one running max over candidate×candidate sims).
    ``λ=1`` degenerates to plain top-k (ties → smaller vec_id, matching
    ``knn_bruteforce``). Returns (query_id, vec_id, score, mmr, rank)."""
    cand = knn_bruteforce(ds, query_vecs, k=fetch_k, vec_col=vec_col,
                          id_col=id_col, dtype=dtype)
    need = pa.array(np.unique(cand["vec_id"].to_numpy()))

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return t.filter(_pc.is_in(t[id_col], value_set=need)) \
            .select([id_col, vec_col])

    vec_rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    vid = vec_rows[id_col].to_numpy()
    V = _norm_rows(np.stack([np.asarray(v, dtype=dtype)
                             for v in vec_rows[vec_col]]))
    row_of = {int(i): j for j, i in enumerate(vid)}
    q = _norm_rows(np.asarray(query_vecs, dtype=dtype))
    out = []
    for qi, grp in cand.groupby("query_id", sort=True):
        ids = grp["vec_id"].to_numpy()
        rel = grp["score"].to_numpy(dtype=np.float64)
        C = V[[row_of[int(i)] for i in ids]]
        sims = C @ C.T                       # candidate×candidate
        chosen: list[int] = []
        max_sim = np.full(len(ids), -np.inf)
        alive = np.ones(len(ids), dtype=bool)
        for r in range(min(k, len(ids))):
            pen = np.where(np.isfinite(max_sim), max_sim, 0.0)
            mmr = lam * rel - (1.0 - lam) * pen
            mmr_m = np.where(alive, mmr, -np.inf)
            # deterministic: best mmr, ties -> better rel, then lower id
            best = np.lexsort((ids, -rel, -mmr_m))[0]
            chosen.append(best)
            alive[best] = False
            max_sim = np.maximum(max_sim, sims[:, best])
            out.append((qi, int(ids[best]), float(rel[best]),
                        float(mmr_m[best]), r + 1))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "score",
                                      "mmr", "rank"])


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN, the 100-TB memory path
# ---------------------------------------------------------------------------

def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 29) -> np.ndarray:
    """Seeded Euclidean mini k-means on a driver-side sample (numpy
    only; farthest-point init, fixed iteration count, empty clusters
    keep their centroid — fully deterministic)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(k, n)
    sample = np.asarray(sample, dtype=np.float64)
    centers = [sample[rng.integers(0, n)]]
    for _ in range(k - 1):
        d = np.min([((sample - c) ** 2).sum(axis=1) for c in centers],
                   axis=0)
        centers.append(sample[int(np.argmax(d))])
    cent = np.stack(centers)
    s2 = (sample * sample).sum(axis=1)
    for _ in range(iters):
        d2 = s2[:, None] + (cent * cent).sum(axis=1)[None] \
            - 2.0 * (sample @ cent.T)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = sample[mask].mean(axis=0)
    return cent


def fit_pq(ds: Dataset, m: int = 4, ksub: int = 16,
           vec_col: str = "embedding", id_col: str = "vec_id",
           sample_size: int = 4096, iters: int = 10, seed: int = 29,
           codebooks=None) -> dict:
    """Fit product-quantization codebooks (Jégou et al. 2011): split the
    ``d``-dim space into ``m`` contiguous subspaces of ``d/m`` dims and
    run Euclidean k-means (``ksub`` centroids) in each, over a BOUNDED
    deterministic sample (stable id-hash stride, sorted by id — same
    trick as :func:`kmeans_fit`; block layouts are not run-stable).
    The codebook is m·ksub·(d/m) floats — driver/broadcast-sized at any
    corpus scale; a vector then compresses to ``m`` uint8 codes (e.g.
    128-dim float32 → 8 bytes at m=8, 64×).

    ``codebooks`` (shape ``(m, ksub, d/m)``) skips fitting and plants
    given centroids — the exact-oracle hook (integer codebooks make the
    whole encode+ADC pipeline exact-integer arithmetic).

    Returns ``{"codebooks": (m, ksub, dsub) float64, "m": m,
    "ksub": ksub, "dim": d}``."""
    if codebooks is not None:
        cb = np.asarray(codebooks, dtype=np.float64)
        assert cb.ndim == 3, "codebooks must be (m, ksub, dsub)"
        return {"codebooks": cb, "m": cb.shape[0], "ksub": cb.shape[1],
                "dim": cb.shape[0] * cb.shape[2]}
    proj = ds.select_columns([id_col, vec_col]).materialize()
    n_total = proj.count()
    stride = max(1, n_total // sample_size)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return t.filter(pa.array((h % np.uint64(stride)) == 0))

    rows = proj.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .sort_values(id_col, kind="stable").head(sample_size)
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in rows[vec_col]])
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    cb = np.stack([
        _kmeans_l2(sample[:, j * dsub:(j + 1) * dsub], ksub,
                   iters=iters, seed=seed + j)
        for j in range(m)])
    return {"codebooks": cb, "m": m, "ksub": cb.shape[1], "dim": d}


def pq_encode(ds: Dataset, model: dict, vec_col: str = "embedding",
              id_col: str = "vec_id") -> Dataset:
    """Encode every vector to its ``m`` nearest-subcentroid codes: one
    zero-shuffle streaming pass against the broadcast codebook
    (``ray.put`` once, ``broadcast_get`` per worker). Ties break to the
    LOWEST code index (np.argmin), deterministically. Emits
    ``(id_col, pq_code fixed_size_list<uint8>[m])``."""
    from .partition import broadcast_get
    cb = np.asarray(model["codebooks"], dtype=np.float64)
    m, ksub, dsub = cb.shape
    ref = ray.put(cb)

    def enc(tbl: pa.Table) -> pa.Table:
        c = broadcast_get(ref)
        x = _batch_matrix(tbl, vec_col).astype(np.float64)
        n = len(x)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            cj = c[j]
            d2 = (xs * xs).sum(axis=1)[:, None] \
                + (cj * cj).sum(axis=1)[None] - 2.0 * (xs @ cj.T)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: tbl[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m),
        })

    return ds.map_batches(enc, batch_format="pyarrow")


class _PQAdcTopK:
    """Task-pool kernel: holds the per-query ADC lookup table
    (nq, m, ksub) of squared subdistances, built ONCE per worker from
    the broadcast (queries, codebook); per batch sums m table lookups
    per (query, vector) and emits local top-k partials. The corpus side
    touches only the m-byte codes — the compressed-domain scan."""

    def __init__(self, q_ref, cb_ref, k: int, id_col: str):
        q = np.asarray(ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef)
                       else q_ref, dtype=np.float64)
        cb = np.asarray(ray.get(cb_ref) if isinstance(cb_ref, ray.ObjectRef)
                        else cb_ref, dtype=np.float64)
        m, ksub, dsub = cb.shape
        nq = len(q)
        lut = np.empty((nq, m, ksub), dtype=np.float64)
        for j in range(m):
            qs = q[:, j * dsub:(j + 1) * dsub]
            cj = cb[j]
            lut[:, j, :] = (qs * qs).sum(axis=1)[:, None] \
                + (cj * cj).sum(axis=1)[None] - 2.0 * (qs @ cj.T)
        self.lut = lut
        self.m = m
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        n = len(batch)
        if n == 0:
            return empty
        codes_col = batch["pq_code"]
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        codes = codes_col.flatten().to_numpy(
            zero_copy_only=False).reshape(n, self.m)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        dist = np.zeros((self.lut.shape[0], n), dtype=np.float64)
        for j in range(self.m):
            dist += self.lut[:, j, :][:, codes[:, j]]
        k = min(self.k, n)
        # tie-INCLUSIVE local top-k (quantized distances tie OFTEN — a
        # whole PQ cell shares one distance): keep every row ≤ the k-th
        # distance so the global merge's (score, vec_id) tie-break is
        # deterministic and oracle-exact
        part = np.argpartition(dist, k - 1, axis=1)[:, :k]
        kth = np.take_along_axis(dist, part, axis=1).max(axis=1)
        qid, idx = np.nonzero(dist <= kth[:, None])
        return pa.table({"query_id": pa.array(qid.astype(np.int64)),
                         "vec_id": pa.array(ids[idx].astype(np.int64)),
                         "score": pa.array(-dist[qid, idx])})


def pq_search(codes_ds: Dataset, model: dict, query_vecs: np.ndarray,
              k: int = 10, id_col: str = "vec_id",
              merge: str = "driver"):
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: queries
    stay exact, corpus vectors are their m-byte codes; per-batch
    distance is m LUT lookups, partials merge through the shared knn
    tail (:func:`_merge_topk` — one bucketed exchange at batch-query
    scale). ``score`` is NEGATED squared L2 so larger = closer and the
    rank/tie conventions match the cosine pipelines (ties → lower
    vec_id)."""
    from .partition import cached_kernel
    q_ref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    cb_ref = ray.put(np.asarray(model["codebooks"], dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_PQAdcTopK, q_ref, cb_ref, k, id_col)(batch)

    partials = codes_ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, merge)


# ---------------------------------------------------------------------------
# IVF-PQ persistent index (Jégou et al. 2011 "IVFADC"): coarse cells on
# disk, residual PQ codes inside — the composed 100-TB ANN path
# ---------------------------------------------------------------------------

def _ivfpq_train(ds: Dataset, n_centroids: int, m: int, ksub: int,
                 vec_col: str, id_col: str, sample_size: int,
                 iters: int, seed: int, normalize: bool,
                 coarse_centroids, codebooks):
    """Deterministic IVF-PQ training (shared by the direct and the
    checkpointed builders): one bounded id-hash-stride sample (block
    layouts are not run-stable, the stride is), seeded coarse k-means,
    then per-subspace residual codebooks — bit-identical across reruns
    on the same input, which is what lets the checkpointed builder
    RETRAIN on resume instead of persisting mid-build model state."""
    if coarse_centroids is not None and codebooks is not None:
        return (np.asarray(coarse_centroids, dtype=np.float64),
                np.asarray(codebooks, dtype=np.float64))
    proj = ds.select_columns([id_col, vec_col]).materialize()
    n_total = proj.count()
    stride = max(1, n_total // sample_size)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return t.filter(pa.array((h % np.uint64(stride)) == 0))

    rows = proj.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .sort_values(id_col, kind="stable").head(sample_size)
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in rows[vec_col]])
    if normalize:
        sample = _norm_rows(sample)
    if coarse_centroids is not None:
        cent = np.asarray(coarse_centroids, dtype=np.float64)
    else:
        cent = _kmeans_l2(sample, n_centroids, iters=iters, seed=seed)
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    # residual training set: sample minus its nearest coarse centroid
    d2 = ((sample[:, None, :] - cent[None]) ** 2).sum(axis=2)
    resid = sample - cent[np.argmin(d2, axis=1)]
    if codebooks is not None:
        cb = np.asarray(codebooks, dtype=np.float64)
    else:
        cb = np.stack([
            _kmeans_l2(resid[:, j * dsub:(j + 1) * dsub], ksub,
                       iters=iters, seed=seed + 1 + j)
            for j in range(m)])
    return cent, cb


def _ivfpq_encoder(cent_ref, cb_ref, m_: int, dsub_: int,
                   normalize: bool, vec_col: str, id_col: str):
    """Per-batch IVFADC encoder (shared by both builders): nearest
    coarse cell, residual, per-subspace nearest codeword."""
    def encode(tbl: pa.Table) -> pa.Table:
        from .partition import broadcast_get
        c = broadcast_get(cent_ref)
        book = broadcast_get(cb_ref)
        x = _batch_matrix(tbl, vec_col).astype(np.float64)
        if normalize:
            x = _norm_rows(x)
        d2 = (x * x).sum(axis=1)[:, None] + (c * c).sum(axis=1)[None] \
            - 2.0 * (x @ c.T)
        cell = np.argmin(d2, axis=1)
        r = x - c[cell]
        codes = np.empty((len(x), m_), dtype=np.uint8)
        for j in range(m_):
            rs = r[:, j * dsub_:(j + 1) * dsub_]
            bj = book[j]
            dd = (rs * rs).sum(axis=1)[:, None] \
                + (bj * bj).sum(axis=1)[None] - 2.0 * (rs @ bj.T)
            codes[:, j] = np.argmin(dd, axis=1).astype(np.uint8)
        return pa.table({
            id_col: tbl[id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m_),
            "__ivf_cell": pa.array(cell.astype(np.int64)),
        })

    return encode


def build_ivfpq_index(ds: Dataset, path: str, n_centroids: int = 64,
                      m: int = 4, ksub: int = 16,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      sample_size: int = 4096, iters: int = 10,
                      seed: int = 23, normalize: bool = True,
                      coarse_centroids=None, codebooks=None) -> dict:
    """Build and persist an IVF-PQ index: coarse k-means cells partition
    the corpus on disk (``{path}/__ivf_cell=<c>/``) and each vector is
    stored as the ``m``-byte PQ code of its RESIDUAL (x − cell centroid)
    — the IVFADC layout. A query then reads ONLY its probed cells' files
    AND only ``m`` bytes per vector: at 100 TB of raw float32 the probed
    bytes shrink by ``(n_probe/n_centroids) × (4·dim/m)`` (~1000× at
    n_probe=4/64 cells, dim=128, m=8).

    Both trainings run over one bounded deterministic sample (id-hash
    stride — block layouts are not run-stable); residual codebooks are
    fit per subspace with seeded Euclidean k-means. ``coarse_centroids``
    / ``codebooks`` skip fitting and plant given arrays — the
    exact-oracle hook (integer plants make assignment, residuals and ADC
    exact-integer; pair with ``normalize=False``).

    Persists ``_centroids.parquet`` (cell, centroid),
    ``_codebooks.parquet`` (flattened (m, ksub, dsub) + geometry +
    normalize flag). Returns the model dict."""
    import pyarrow.parquet as _pq

    cent, cb = _ivfpq_train(ds, n_centroids, m, ksub, vec_col, id_col,
                            sample_size, iters, seed, normalize,
                            coarse_centroids, codebooks)
    m_, ksub_, dsub_ = cb.shape
    dim = m_ * dsub_
    assert cent.shape[1] == dim, "centroid dim != codebook dim"

    cent_ref = ray.put(cent)
    cb_ref = ray.put(cb)
    encode = _ivfpq_encoder(cent_ref, cb_ref, m_, dsub_, normalize,
                            vec_col, id_col)
    encoded = ds.map_batches(encode, batch_format="pyarrow")
    # consolidate cells before the partitioned write: a raw write emits
    # one file per (block × cell) — measured 1867 tiny files for a
    # 200k-vector/64-cell build, and the query then pays one read task
    # per file (31 s → the exchange makes it ~1 file per cell)
    from .window import bucketed_apply
    encoded = bucketed_apply(encoded, "__ivf_cell", lambda t: t,
                             num_buckets=min(64, max(8, len(cent))))
    encoded.write_parquet(path, partition_cols=["__ivf_cell"])
    return _ivfpq_persist_model(path, cent, cb, normalize)


def _ivfpq_persist_model(path: str, cent, cb, normalize: bool) -> dict:
    """Write the index sidecars (``_centroids.parquet``,
    ``_codebooks.parquet``) and return the model dict — written LAST,
    so their presence doubles as the build-completion marker."""
    import pyarrow.parquet as _pq
    m_, ksub_, dsub_ = cb.shape
    dim = m_ * dsub_
    _pq.write_table(pa.table({
        "cell": pa.array(np.arange(len(cent), dtype=np.int64)),
        "centroid": pa.FixedSizeListArray.from_arrays(
            pa.array(cent.reshape(-1)), dim),
    }), f"{path}/_centroids.parquet")
    _pq.write_table(pa.table({
        "m": pa.array([m_], type=pa.int64()),
        "ksub": pa.array([ksub_], type=pa.int64()),
        "dim": pa.array([dim], type=pa.int64()),
        "normalize": pa.array([normalize]),
        "codebooks": pa.array([cb.reshape(-1).tolist()],
                              type=pa.list_(pa.float64())),
    }), f"{path}/_codebooks.parquet")
    return {"n_centroids": int(len(cent)), "dim": int(dim), "m": int(m_),
            "ksub": int(ksub_), "normalize": normalize, "path": path,
            "centroids": cent, "codebooks": cb}


def build_ivfpq_index_checkpointed(
        input_paths, path: str, ckpt_dir: str, *,
        n_centroids: int = 64, m: int = 4, ksub: int = 16,
        vec_col: str = "embedding", id_col: str = "vec_id",
        sample_size: int = 4096, iters: int = 10, seed: int = 23,
        normalize: bool = True, coarse_centroids=None, codebooks=None,
        enc_buckets: int | None = None) -> dict:
    """Resumable IVF-PQ index build (round-4 verdict item 6): the
    expensive full-corpus ENCODE pass lands in per-partition checkpoint
    files with lineage manifests at exactly the cell-consolidation
    boundary — ``checkpoint.run_partitioned`` hash-buckets by
    ``__ivf_cell``, so each checkpoint partition holds whole cells (the
    same exchange geometry the direct builder uses to avoid
    one-file-per-(block × cell) output). A killed build resumes by
    re-encoding ONLY the missing cell buckets; the final hive-layout
    write then re-reads the checkpointed PQ CODES (m bytes per vector —
    ~1000× smaller than the raw vectors), never the corpus.

    Training is NOT checkpointed: ``_ivfpq_train`` is deterministic
    (id-hash-stride sample + seeded k-means), so a resumed run retrains
    bit-identically from the same input — one cheap bounded pass
    instead of mid-build model state to version. Parameter changes
    roll the encode fingerprint and invalidate the checkpoint.

    The index at ``path`` is rebuilt from the checkpoint on every call
    that finds it incomplete (sidecars ``_centroids.parquet`` /
    ``_codebooks.parquet`` are written LAST as the completion marker;
    stale cell dirs are cleared first so a killed final write can't
    double vectors). Returns the model dict plus ``{"enc": run
    stats}``. Kill-and-resume byte-identity is pinned in
    ``tests/test_ivfpq_checkpoint.py``."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    import ray.data as rd

    from ..state import checkpoint as CP
    from .dedup import _fp16

    if isinstance(input_paths, str):
        files = sorted(_glob.glob(_os.path.join(input_paths,
                                                "*.parquet"))) \
            if _os.path.isdir(input_paths) else [input_paths]
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError("build_ivfpq_index_checkpointed: no input")
    fp_in = CP.input_fingerprint_of(files)
    fp_enc = _fp16(fp_in, "ivfpq-enc", n_centroids, m, ksub,
                   sample_size, iters, seed, normalize,
                   "" if coarse_centroids is None
                   else str(np.asarray(coarse_centroids).tolist()),
                   "" if codebooks is None
                   else str(np.asarray(codebooks).tolist()),
                   enc_buckets or 0)
    enc_dir = _os.path.join(ckpt_dir, "enc")

    ds = rd.read_parquet(files, columns=[id_col, vec_col])
    cent, cb = _ivfpq_train(ds, n_centroids, m, ksub, vec_col, id_col,
                            sample_size, iters, seed, normalize,
                            coarse_centroids, codebooks)
    m_, ksub_, dsub_ = cb.shape
    nb = enc_buckets or min(64, max(8, len(cent)))

    if CP.missing_partitions(enc_dir, fp_enc, nb):
        encode = _ivfpq_encoder(ray.put(cent), ray.put(cb), m_, dsub_,
                                normalize, vec_col, id_col)
        s_enc = CP.run_partitioned(
            ds.map_batches(encode, batch_format="pyarrow"),
            enc_dir, entity_col="__ivf_cell", num_buckets=nb,
            input_fingerprint=fp_enc)
    else:
        s_enc = {"written": [], "skipped": list(range(nb)), "rows": 0}

    done_marker = _os.path.join(path, "_codebooks.parquet")
    if s_enc["written"] or not _os.path.exists(done_marker):
        # rebuild the probed-cell hive layout from the checkpointed
        # codes; clear stale cell dirs first (idempotent final write)
        for d in _glob.glob(_os.path.join(path, "__ivf_cell=*")):
            _shutil.rmtree(d)
        enc_files = CP.verified_files(enc_dir, fp_enc)
        rd.read_parquet(enc_files).write_parquet(
            path, partition_cols=["__ivf_cell"])
    model = _ivfpq_persist_model(path, cent, cb, normalize)
    model["enc"] = s_enc
    return model


class _IvfPqTopK:
    """Task-pool kernel for IVF-PQ scans: holds per-(query, probed-cell)
    ADC lookup tables — LUT[q, c, j, code] = ||(q − cent_c)_j − cb_j[code]||²
    so summing m gathers gives the exact ADC distance to the residual-
    decoded vector. Per batch: rows grouped by cell (one lexsort), one
    vectorized gather-sum per (cell, probing-queries) pair, tie-INCLUSIVE
    local top-k (quantized distances tie often)."""

    def __init__(self, lut_ref, k: int, id_col: str):
        # lut: dict cell -> (qidx int64[nq_c], lut float64[nq_c, m, ksub])
        self.luts = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) \
            else lut_ref
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        n = len(batch)
        if n == 0:
            return empty
        cells = batch["__ivf_cell"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes_col = batch["pq_code"]
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        m = codes_col.type.list_size
        codes = codes_col.flatten().to_numpy(
            zero_copy_only=False).reshape(n, m)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(cells, kind="stable")
        cells_s, codes_s, ids_s = cells[order], codes[order], ids[order]
        starts = np.flatnonzero(np.r_[True, cells_s[1:] != cells_s[:-1]])
        bounds = np.r_[starts, n]
        out_q, out_v, out_s = [], [], []
        for si, ei in zip(bounds[:-1], bounds[1:]):
            cell = int(cells_s[si])
            hit = self.luts.get(cell)
            if hit is None:
                continue
            qidx, lut = hit
            sub_codes = codes_s[si:ei]
            dist = np.zeros((len(qidx), ei - si), dtype=np.float64)
            for j in range(m):
                dist += lut[:, j, :][:, sub_codes[:, j]]
            k = min(self.k, ei - si)
            part = np.argpartition(dist, k - 1, axis=1)[:, :k]
            kth = np.take_along_axis(dist, part, axis=1).max(axis=1)
            qi, vi = np.nonzero(dist <= kth[:, None])
            out_q.append(qidx[qi])
            out_v.append(ids_s[si:ei][vi])
            out_s.append(-dist[qi, vi])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
            "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
            "score": pa.array(np.concatenate(out_s))})


def query_ivfpq_index(path: str, query_vecs: np.ndarray, k: int = 10,
                      n_probe: int = 4, id_col: str = "vec_id",
                      merge: str = "driver"):
    """ANN query against a persisted IVF-PQ index: load the tiny
    centroid/codebook tables, pick each query's ``n_probe`` nearest
    cells (``n_probe="all"`` = exhaustive, the equivalence-golden hook),
    ``read_parquet`` ONLY those cells' code files, and scan them with
    per-(query, cell) ADC lookup tables built once on the driver
    (nq·n_probe·m·ksub floats — broadcast-sized). ``score`` is the
    negated squared ADC distance; ties break by vec_id through the
    shared top-k merge."""
    import os as _os
    import pyarrow.parquet as _pq
    import ray.data as rd
    ctbl = _pq.read_table(f"{path}/_centroids.parquet")
    dim = ctbl["centroid"].type.list_size
    cent = ctbl["centroid"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).reshape(len(ctbl), dim)
    meta = _pq.read_table(f"{path}/_codebooks.parquet")
    m = int(meta["m"][0].as_py())
    ksub = int(meta["ksub"][0].as_py())
    normalize = bool(meta["normalize"][0].as_py())
    cb = np.asarray(meta["codebooks"][0].as_py(),
                    dtype=np.float64).reshape(m, ksub, dim // m)
    dsub = dim // m

    q = np.asarray(query_vecs, dtype=np.float64)
    if normalize:
        q = _norm_rows(q)
    nq = len(q)
    qd2 = (q * q).sum(axis=1)[:, None] + (cent * cent).sum(axis=1)[None] \
        - 2.0 * (q @ cent.T)
    if n_probe == "all":
        qcells = np.tile(np.arange(len(cent)), (nq, 1))
    else:
        # deterministic probe order: (distance, cell) lexsort
        qcells = np.lexsort((np.broadcast_to(np.arange(len(cent)),
                                             qd2.shape), qd2),
                            axis=1)[:, :n_probe]
    # per-cell LUTs for the queries that probe it
    cell2q: dict[int, list[int]] = {}
    for qi in range(nq):
        for c in qcells[qi]:
            cell2q.setdefault(int(c), []).append(qi)
    luts = {}
    for c, qlist in cell2q.items():
        qidx = np.asarray(qlist, dtype=np.int64)
        r = q[qidx] - cent[c]           # query residual vs this cell
        lut = np.empty((len(qidx), m, ksub), dtype=np.float64)
        for j in range(m):
            rs = r[:, j * dsub:(j + 1) * dsub]
            bj = cb[j]
            lut[:, j, :] = (rs * rs).sum(axis=1)[:, None] \
                + (bj * bj).sum(axis=1)[None] - 2.0 * (rs @ bj.T)
        luts[c] = (qidx, lut)
    files = []
    for c in sorted(cell2q):
        d = _os.path.join(path, f"__ivf_cell={c}")
        if _os.path.isdir(d):
            files.extend(_os.path.join(d, f)
                         for f in sorted(_os.listdir(d))
                         if f.endswith(".parquet"))
    if not files:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    sub = rd.read_parquet(files)
    lut_ref = ray.put(luts)

    from .partition import cached_kernel

    def score(batch: pa.Table) -> pa.Table:
        t = batch
        if "__ivf_cell" in t.column_names:
            t = t.set_column(t.schema.get_field_index("__ivf_cell"),
                             "__ivf_cell", t["__ivf_cell"].cast(pa.int64()))
        return cached_kernel(_IvfPqTopK, lut_ref, k, id_col)(t)

    partials = sub.map_batches(score, batch_format="pyarrow")
    return _merge_topk(partials, k, merge)


# ---------------------------------------------------------------------------
# distributed PCA (streaming moment accumulation)
# ---------------------------------------------------------------------------

def pca_fit(ds: Dataset, vec_col: str = "embedding", k: int = 8,
            center: bool = True) -> dict:
    """Distributed PCA over an embedding column — ONE streaming pass,
    zero shuffles: every block emits its float64 moment partials
    ``(n, Σx ∈ ℝᵈ, XᵀX ∈ ℝᵈˣᵈ)`` as a single flattened row (d is an
    embedding dimension, so d² is driver-trivial even at 100 TB of
    rows); the driver reduces #blocks rows, forms the covariance
    ``G/n − μμᵀ`` and eigendecomposes (``np.linalg.eigh`` on the d×d
    symmetric matrix). Components are returned by DESCENDING explained
    variance with a deterministic sign convention (largest-|.|
    coordinate positive) so refits agree up to float reduction order.

    Returns ``{"mean": (d,), "components": (k, d), "explained_var":
    (k,), "total_var": float, "n": int}``.
    """
    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, vec_col).astype(np.float64)
        n, d = m.shape
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "s": pa.array([m.sum(axis=0)]),
            "g": pa.array([(m.T @ m).reshape(-1)]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts) or int(parts["n"].sum()) == 0:
        raise ValueError("pca_fit needs a non-empty vector column")
    n = float(parts["n"].sum())
    s = np.sum([np.asarray(v, dtype=np.float64)
                for v in parts["s"]], axis=0)
    g = np.sum([np.asarray(v, dtype=np.float64)
                for v in parts["g"]], axis=0)
    d = len(s)
    mu = s / n if center else np.zeros(d)
    cov = g.reshape(d, d) / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # (k, d)
    # deterministic sign: the largest-|coordinate| entry is positive
    amax = np.argmax(np.abs(comps), axis=1)
    sign = np.sign(comps[np.arange(len(comps)), amax])
    sign[sign == 0] = 1.0
    comps = comps * sign[:, None]
    ev = np.maximum(evals[order], 0.0)
    return {"mean": mu, "components": comps, "explained_var": ev,
            "total_var": float(np.maximum(evals, 0.0).sum()),
            "n": int(n)}


def pca_transform(ds: Dataset, model: dict, vec_col: str = "embedding",
                  out_col: str = "pca", whiten: bool = False) -> Dataset:
    """Project vectors onto fitted components (broadcast model, one
    vectorized matmul per batch, zero shuffles). ``whiten=True`` scales
    each coordinate by ``1/√λ`` (unit variance per component — the
    preprocessing SemDeDup-style embedding dedup benefits from)."""
    ref = ray.put({"mean": model["mean"], "components": model["components"],
                   "scale": (1.0 / np.sqrt(np.maximum(
                       model["explained_var"], 1e-12))
                       if whiten else None)})
    from .partition import broadcast_get

    def project(t: pa.Table) -> pa.Table:
        m = broadcast_get(ref)
        x = _batch_matrix(t, vec_col).astype(np.float64)
        y = (x - m["mean"]) @ m["components"].T
        if m["scale"] is not None:
            y = y * m["scale"]
        return t.append_column(out_col, pa.array(list(y)))

    return ds.map_batches(project, batch_format="pyarrow")


class _HardNegPartial:
    """Per-worker kernel for :func:`hard_negatives`: holds the
    normalized anchor matrix + ids + labels; per corpus batch masks
    SAME-label pairs and self-matches to -inf and emits tie-inclusive
    local top-k candidate rows (same merge contract as _TopKPartial)."""

    def __init__(self, ref, k: int, vec_col: str, id_col: str,
                 label_col: str, dtype=np.float64):
        a = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.q = _norm_rows(np.asarray(a["vecs"], dtype=dtype))
        self.ids = np.asarray(a["ids"], dtype=np.int64)
        self.labels = np.asarray(a["labels"])
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.label_col = label_col
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64())})
        if len(batch) == 0 or len(self.ids) == 0:
            return empty
        m = _norm_rows(_batch_matrix(batch, self.vec_col)
                       .astype(self.dtype))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        labels = batch[self.label_col].to_numpy(zero_copy_only=False)
        scores = self.q @ m.T                     # (n_anchors, n_batch)
        mask = (self.labels[:, None] == labels[None, :]) | \
               (self.ids[:, None] == ids[None, :])
        scores = np.where(mask, -np.inf, scores)
        k = min(self.k, scores.shape[1])
        if k == 0:
            return empty
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        kth = np.take_along_axis(scores, part, axis=1).min(axis=1)
        qid, idx = np.nonzero((scores >= kth[:, None])
                              & np.isfinite(scores))
        return pa.table({
            "query_id": pa.array(self.ids[qid]),
            "vec_id": pa.array(ids[idx]),
            "score": pa.array(scores[qid, idx].astype(np.float64))})


def hard_negatives(ds: Dataset, k: int = 5,
                   anchors_ds: Dataset | None = None,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   label_col: str = "label", dtype=np.float64,
                   merge: str = "driver",
                   max_anchors: int = 100_000) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the ``k`` MOST-similar corpus vectors with a DIFFERENT label
    (same-label neighbors are positives, not negatives; self never
    matches) — cosine scores, deterministic vec_id tie-break, exact
    brute-force over the streamed corpus.

    ``anchors_ds`` defaults to the corpus itself. The anchor matrix is
    broadcast once (``ray.put``) and read zero-copy per worker —
    capped at ``max_anchors`` with a loud error; beyond that, batch the
    anchors and route each batch through the persistent IVF-PQ index
    (`build_ivfpq_index`), the established at-scale ANN path. Output
    columns: (anchor_id, neg_id, score, rank)."""
    from .partition import cached_kernel
    src = anchors_ds if anchors_ds is not None else ds
    atbl = pa.Table.from_pandas(
        src.select_columns([id_col, vec_col, label_col]).to_pandas(),
        preserve_index=False)
    if len(atbl) > max_anchors:
        raise ValueError(
            f"{len(atbl)} anchors exceed max_anchors={max_anchors}; "
            "batch the anchors through the IVF-PQ index instead")
    anchors = {"vecs": _batch_matrix(atbl, vec_col),
               "ids": atbl[id_col].to_numpy(zero_copy_only=False),
               "labels": atbl[label_col].to_numpy(zero_copy_only=False)}
    ref = ray.put(anchors)

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(_HardNegPartial, ref, k, vec_col, id_col,
                             label_col, dtype)(batch)

    partials = ds.map_batches(score, batch_format="pyarrow")
    out = _merge_topk(partials, k, merge)
    if isinstance(out, pd.DataFrame):
        return out.rename(columns={"query_id": "anchor_id",
                                   "vec_id": "neg_id"})
    return out.map_batches(
        lambda t: t.rename_columns(
            ["anchor_id" if c == "query_id" else
             ("neg_id" if c == "vec_id" else c)
             for c in t.column_names]),
        batch_format="pyarrow")


def quantize_embeddings_int8(ds: Dataset, vec_col: str = "embedding",
                             out_col: str = "codes",
                             scale_col: str = "scale") -> Dataset:
    """Per-vector symmetric int8 quantization for embedding STORAGE
    (4× smaller than float32 at <1% cosine error for typical
    embeddings — the storage-side sibling of PQ, which compresses for
    SEARCH): ``code = clamp(round(v / s · 127), ±127)`` with
    ``s = max|v|`` per vector; all-zero vectors quantize to all-zero
    codes with scale 0. Rounding uses the DuckDB-exact
    ``floor(|x|+0.5)·sign`` sequence, so codes are INTEGER-EXACT
    against a SQL twin. Dequantization is ``code · s / 127``. Zero
    shuffles."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(t)
        mat = _batch_matrix(t, vec_col).astype(np.float64)
        s = np.abs(mat).max(axis=1) if n else np.zeros(0)
        safe = np.where(s == 0, 1.0, s)
        x = mat / safe[:, None] * 127.0
        q = (np.floor(np.abs(x) + 0.5) * np.sign(x))
        q = np.clip(q, -127, 127).astype(np.int64)
        q[s == 0] = 0
        dim = mat.shape[1] if n else 0
        offs = np.arange(n + 1, dtype=np.int64) * dim
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(q.reshape(-1).astype(np.int8)))
        t = t.append_column(out_col, lst)
        return t.append_column(scale_col, pa.array(s))

    return ds.map_batches(fn, batch_format="pyarrow")


def rrf_fuse(a: Dataset, b: Dataset, *, id_a: str, id_b: str,
             score_a: str, score_b: str, k: int = 60,
             num_buckets: int = 32) -> Dataset:
    """Reciprocal-rank fusion of two retrieval rankings (Cormack/
    Clarke/Büttcher's RRF — the standard hybrid-search combiner for a
    lexical BM25 list and a semantic embedding list): each input ranks
    by (score desc, id asc), and the fused score of an id is
    ``Σ 1/(k + rank)`` over the lists it appears in (an id present in
    only one list keeps its single term — FULL outer combination, the
    published formulation). Emits ``r_a`` / ``r_b`` (1-based ranks,
    null when absent) and ``rrf``.

    Determinism / oracle parity: callers pass scores ALREADY rounded
    deterministically (ties broken by id), ranks are exact integers,
    and the fused score is exactly two IEEE terms added in fixed order
    — so a SQL twin compares strictly with no tolerance.

    Scale shape: two prefix-scan sorts (``partition.row_number``) and
    ONE full-outer hash-join exchange; no list is driver-materialized."""
    from .partition import row_number
    from .relational import hash_join

    def _ranked(ds: Dataset, idc: str, sc: str, out: str) -> Dataset:
        def neg(t: pa.Table) -> pa.Table:
            s = t[sc].to_numpy(zero_copy_only=False).astype(np.float64)
            return t.append_column("__neg", pa.array(-s))

        r = row_number(ds.select_columns([idc, sc])
                       .map_batches(neg, batch_format="pyarrow"),
                       ["__neg", idc], out_col=out, start=1)
        return r.map_batches(lambda t: t.select([idc, out]),
                             batch_format="pyarrow")

    ra = _ranked(a, id_a, score_a, "r_a")
    rb = _ranked(b, id_b, score_b, "r_b")
    joined = hash_join(ra, rb, left_key=id_a, right_key=id_b,
                       how="full", num_buckets=num_buckets)

    def fuse(t: pa.Table) -> pa.Table:
        def term(col):
            d = pc.divide(
                pa.scalar(1.0),
                pc.cast(pc.add(col, pa.scalar(k, type=pa.int64())),
                        pa.float64()))
            return pc.if_else(pc.is_null(col), pa.scalar(0.0), d)

        rrf = pc.add(term(t["r_a"]), term(t["r_b"]))
        return t.append_column("rrf", rrf)

    return joined.map_batches(fuse, batch_format="pyarrow")


def _mat64(tbl: pa.Table, vec_col: str) -> np.ndarray:
    """Like _batch_matrix but float64-preserving (kcenter exactness)."""
    col = tbl[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        dim = int(lens[0]) if len(lens) else 0
    return flat.reshape(len(col), dim)


def _mat_list(m: np.ndarray) -> pa.ListArray:
    n, d = m.shape
    off = pa.array((np.arange(n + 1) * d).astype(np.int32))
    return pa.ListArray.from_arrays(off, pa.array(m.ravel()))


def kcenter_select(ds: Dataset, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   plan: str = "exact") -> pa.Table:
    """Greedy k-center (Gonzalez farthest-point) coreset selection —
    the classic 2-approximation for data pruning / active-learning
    coresets: seed at the lowest id, then repeatedly pick the point
    with the LARGEST squared-euclidean distance to the selected set
    (ties → lowest id).

    ``plan="exact"``: the textbook sequential greedy, distributed —
    per-point running min-distance state lives in a (id, vec, mind)
    Dataset that is updated against the ONE new center each round and
    re-materialized (block count constant under ``map_batches``), so
    each of the k rounds is one streaming pass plus a per-block top-1
    partial scan (driver traffic = #blocks rows/round; the corpus
    never lands on the driver). INTEGER-valued embeddings keep every
    distance exact int64 (the ``dim·(2·maxabs)² < 2^63`` bound is
    checked from streamed per-block maxes and rejects loudly), so a
    SQL twin compares strictly; float inputs run the same plan in
    float64.

    ``plan="merge"``: the one-pass composition for when k scans are
    too many — every block runs the local greedy k in-task and emits k
    candidate rows; the driver then runs greedy k over the
    (blocks × k) candidates. Bounded approximation (each block's local
    greedy 2-covers the block, the final greedy 2-covers the candidate
    set); tested to recover planted well-separated clusters exactly.

    Returns a k-row ``pa.Table`` (rank, <id_col>, mind) in selection
    order; ``mind`` is the covering distance² at selection time (NULL
    for the seed). Stops early when fewer than k points exist.
    """
    if k < 1:
        raise ValueError("kcenter_select: k must be >= 1")
    if plan not in ("exact", "merge"):
        raise ValueError(f"kcenter_select: unknown plan {plan!r}")
    proj = ds.select_columns([id_col, vec_col]).materialize()

    if plan == "merge":
        def local_greedy(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "vec": pa.array([], pa.list_(
                                     pa.float64()))})
            m = _mat64(t, vec_col)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            m, ids = m[order], ids[order]
            sel = [0]
            mind = ((m - m[0]) ** 2).sum(axis=1)
            mind[0] = -1.0
            for _ in range(1, min(k, len(ids))):
                j = int(np.argmax(mind))
                if mind[j] < 0:
                    break
                sel.append(j)
                mind = np.minimum(mind, ((m - m[j]) ** 2).sum(axis=1))
                mind[j] = -1.0
            sel = np.asarray(sel)
            return pa.table({id_col: pa.array(ids[sel].astype(np.int64)),
                             "vec": _mat_list(m[sel])})

        cand = proj.map_batches(local_greedy,
                                batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(id_col, kind="stable")
        ids = cand[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in cand["vec"]]) if len(cand) else \
            np.zeros((0, 1))
        if len(ids) == 0:
            raise ValueError("kcenter_select: empty input")
        picks = [(1, int(ids[0]), None)]
        mind = ((m - m[0]) ** 2).sum(axis=1)
        mind[0] = -1.0
        for r in range(2, min(k, len(ids)) + 1):
            j = int(np.argmax(mind))
            picks.append((r, int(ids[j]), float(mind[j])))
            mind = np.minimum(mind, ((m - m[j]) ** 2).sum(axis=1))
            mind[j] = -1.0
        return pa.table({
            "rank": pa.array([p[0] for p in picks], pa.int64()),
            id_col: pa.array([p[1] for p in picks], pa.int64()),
            "mind": pa.array([p[2] for p in picks], pa.float64())})

    # ---- exact plan ----
    def seed_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "vec": pa.array([], pa.list_(pa.float64())),
            "maxabs": pa.array([], pa.float64()),
            "allint": pa.array([], pa.bool_())})
        if len(t) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _mat64(t, vec_col)
        j = int(np.argmin(ids))
        return pa.table({
            "id": pa.array([int(ids[j])], pa.int64()),
            "vec": _mat_list(m[j:j + 1]),
            "maxabs": pa.array([float(np.abs(m).max())]),
            "allint": pa.array([bool(np.all(m == np.floor(m)))])})

    parts = proj.map_batches(seed_partial,
                             batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("kcenter_select: empty input")
    allint = bool(parts["allint"].all())
    maxabs = float(parts["maxabs"].max())
    srow = parts.sort_values("id").iloc[0]
    seed_id = int(srow["id"])
    seed_vec = np.asarray(srow["vec"], dtype=np.float64)
    dim = len(seed_vec)
    if allint and dim * (2.0 * maxabs) ** 2 >= float(2 ** 63):
        raise ValueError(
            "kcenter_select: integer embeddings exceed the exact-int64 "
            f"distance bound (dim*(2*maxabs)^2 = "
            f"{dim * (2.0 * maxabs) ** 2:.3g} >= 2^63); rescale first")

    def d2(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        if allint:
            diff = m.astype(np.int64) - c.astype(np.int64)
            return (diff * diff).sum(axis=1)
        return ((m - c) ** 2).sum(axis=1)

    sentinel = np.int64(-1) if allint else -1.0
    mtype = pa.int64() if allint else pa.float64()

    def init_factory(cvec, cid):
        def fn(t: pa.Table) -> pa.Table:
            m = _mat64(t, vec_col)
            ids = t[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            mind = d2(m, cvec)
            mind[ids == cid] = sentinel
            return pa.table({"id": pa.array(ids),
                             "vec": _mat_list(m),
                             "mind": pa.array(mind, mtype)})
        return fn

    def update_factory(cvec, cid):
        def fn(t: pa.Table) -> pa.Table:
            m = _mat64(t, "vec")
            ids = t["id"].to_numpy(zero_copy_only=False)
            mind = t["mind"].to_numpy(zero_copy_only=False)
            upd = np.minimum(mind, d2(m, cvec))
            upd[mind == sentinel] = sentinel
            upd[ids == cid] = sentinel
            return pa.table({"id": t["id"], "vec": t["vec"],
                             "mind": pa.array(upd, mtype)})
        return fn

    def top1(t: pa.Table) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "vec": pa.array([], pa.list_(pa.float64())),
                          "mind": pa.array([], mtype)})
        if len(t) == 0:
            return empty
        mind = t["mind"].to_numpy(zero_copy_only=False)
        live = mind != sentinel
        if not live.any():
            return empty
        ids = t["id"].to_numpy(zero_copy_only=False)
        # exact in the native dtype: max mind among live, tie -> min id
        mx = mind[live].max()
        at = live & (mind == mx)
        j = int(np.flatnonzero(at)[np.argmin(ids[at])])
        return t.take([j])

    picks = [(1, seed_id, None)]
    state = proj.map_batches(init_factory(seed_vec, seed_id),
                             batch_format="pyarrow").materialize()
    for r in range(2, k + 1):
        tops = state.map_batches(top1,
                                 batch_format="pyarrow").to_pandas()
        if tops.empty:
            break
        tops = tops.sort_values(["mind", "id"],
                                ascending=[False, True])
        best = tops.iloc[0]
        bid = int(best["id"])
        bm = int(best["mind"]) if allint else float(best["mind"])
        picks.append((r, bid, bm))
        if r == k:
            break
        cvec = np.asarray(best["vec"], dtype=np.float64)
        state = state.map_batches(update_factory(cvec, bid),
                                  batch_format="pyarrow").materialize()
    return pa.table({
        "rank": pa.array([p[0] for p in picks], pa.int64()),
        id_col: pa.array([p[1] for p in picks], pa.int64()),
        "mind": pa.array([p[2] for p in picks], mtype)})


def _popcnt64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount (numpy 1.26 has no bitwise_count)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return (x * h01) >> np.uint64(56)


def _rp_signs(d_in: int, out_dim: int, seed: int) -> np.ndarray:
    """Deterministic ±1 sign matrix via the BILINEAR GF(2) form
    sign(i,j) = (−1)^popcount(a_i & b_j) over 32-bit row/column masks
    from the repo's multiplicative constants. For uniform masks the
    form is EXACTLY unbiased and distinct columns are exactly
    uncorrelated (E[(−1)^popcount(a & m)] = 0 for any m ≠ 0), and the
    multiplicative masks measure |column corr| ≈ 0.05 — unlike any
    additive-in-j hash family, whose sign columns come out nearly
    identical (measured: JL distance correlation −0.06). BIGINT/
    bit_count SQL reproduces it bit-for-bit."""
    i = np.arange(1, d_in + 1, dtype=np.uint64)
    j = np.arange(1, out_dim + 1, dtype=np.uint64)
    a = (i * np.uint64(2654435761)
         + np.uint64(seed) * np.uint64(1315423911)) % np.uint64(1 << 32)
    b = (j * np.uint64(2246822519)) % np.uint64(1 << 32)
    par = _popcnt64(a[:, None] & b[None, :]) & np.uint64(1)
    return np.where(par == 1, -1, 1).astype(np.int64)


def random_projection(ds: Dataset, out_dim: int,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id", seed: int = 5,
                      exact: bool = False,
                      layout: str = "list") -> Dataset:
    """Johnson–Lindenstrauss signed random projection (Achlioptas ±1):
    ``y = x @ S`` where ``S`` is the deterministic (d_in × out_dim)
    ±1 matrix of :func:`_rp_signs` — the zero-shuffle, fit-free
    dimensionality reduction (PCA's cheap streaming sibling; distances
    preserved in expectation to within the JL bound).

    One streaming ``map_batches`` pass; the sign matrix is recomputed
    per batch from the hash family (O(d_in·out_dim) integer ops — no
    broadcast object needed, no state). ``exact=True`` requires
    integer-valued vectors, computes in int64 (per-batch
    ``d_in·maxabs < 2^62`` bound checked, loud reject) and emits exact
    BIGINT outputs that a SQL twin reproduces bit-for-bit; the default
    float mode emits float64.

    ``layout="list"`` keeps (id, y list<...>); ``layout="long"`` emits
    (id, j, y) rows — the oracle-facing shape."""
    if out_dim < 1:
        raise ValueError("random_projection: out_dim must be >= 1")
    if layout not in ("list", "long"):
        raise ValueError(f"random_projection: unknown layout "
                         f"{layout!r}")

    def fn(t: pa.Table) -> pa.Table:
        ytype = pa.int64() if exact else pa.float64()
        if len(t) == 0:
            if layout == "long":
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "j": pa.array([], pa.int64()),
                                 "y": pa.array([], ytype)})
            return pa.table({id_col: pa.array([], pa.int64()),
                             "y": pa.array([], pa.list_(ytype))})
        m = _mat64(t, vec_col)
        d_in = m.shape[1]
        S = _rp_signs(d_in, out_dim, seed)
        if exact:
            if not np.all(m == np.floor(m)):
                raise ValueError(
                    "random_projection(exact=True): vectors must be "
                    "integer-valued; quantize first")
            maxabs = float(np.abs(m).max()) if m.size else 0.0
            if d_in * maxabs >= float(2 ** 62):
                raise ValueError(
                    "random_projection(exact=True): d_in*maxabs "
                    f"= {d_in * maxabs:.3g} >= 2^62; rescale first")
            y = m.astype(np.int64) @ S
        else:
            y = m @ S.astype(np.float64)
        ids = t[id_col]
        if layout == "long":
            n = len(t)
            return pa.table({
                id_col: ids.take(pa.array(np.repeat(
                    np.arange(n), out_dim))),
                "j": pa.array(np.tile(np.arange(out_dim,
                                                dtype=np.int64), n)),
                "y": pa.array(y.ravel(), ytype)})
        return pa.table({id_col: ids, "y": _mat_list(
            y.astype(np.float64)) if not exact else
            pa.ListArray.from_arrays(
                pa.array((np.arange(len(t) + 1) * out_dim)
                         .astype(np.int32)),
                pa.array(y.ravel()))})

    return ds.map_batches(fn, batch_format="pyarrow")


def procrustes_crosscov(ds: Dataset, a_col: str, b_col: str,
                        exact: bool = True) -> pa.Table:
    """Cross-covariance matrix ``M = Σ_i a_i b_iᵀ`` between two
    aligned embedding columns — the sufficient statistic of
    orthogonal Procrustes alignment, computed the ``corr_matrix``
    way: per-block d×d partials (one matmul) reduced through a tiny
    driver sum; with ``exact=True`` (integer-valued vectors) every
    cell is exact int64 — a SQL twin reproduces M bit-for-bit. Each
    block ships its ``(rows, maxa, maxb)`` alongside the partial and
    the bound ``n·maxa·maxb < 2^62`` is enforced on the GLOBAL row
    count before the driver sum (a per-block check alone would let
    many individually-safe partials wrap int64 when summed). Returns
    the long-form table (i, j, m)."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        a = _mat64(t, a_col)
        b = _mat64(t, b_col)
        if exact:
            if not (np.all(a == np.floor(a))
                    and np.all(b == np.floor(b))):
                raise ValueError("procrustes_crosscov(exact): "
                                 "vectors must be integer-valued")
            ma = float(np.abs(a).max()) if a.size else 0.0
            mb = float(np.abs(b).max()) if b.size else 0.0
            if len(t) * ma * mb >= float(2 ** 62):
                raise ValueError("procrustes_crosscov: n*maxa*maxb "
                                 ">= 2^62 — rescale first")
            m = a.astype(np.int64).T @ b.astype(np.int64)
        else:
            ma = mb = 0.0
            m = a.T @ b
        return pa.table({"m": pa.array([m.ravel()]),
                         "d1": pa.array([m.shape[0]], pa.int64()),
                         "d2": pa.array([m.shape[1]], pa.int64()),
                         "n": pa.array([len(t)], pa.int64()),
                         "maxa": pa.array([ma], pa.float64()),
                         "maxb": pa.array([mb], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        raise ValueError("procrustes_crosscov: empty input")
    d1 = int(parts["d1"].iloc[0])
    d2 = int(parts["d2"].iloc[0])
    if exact:
        n_all = int(parts["n"].sum())
        ma_all = float(parts["maxa"].max())
        mb_all = float(parts["maxb"].max())
        if n_all * ma_all * mb_all >= float(2 ** 62):
            raise ValueError(
                "procrustes_crosscov: GLOBAL n*maxa*maxb "
                f"= {n_all * ma_all * mb_all:.3g} >= 2^62 — the "
                "summed cross-covariance could wrap int64; rescale "
                "or shift the vectors first")
    dt = np.int64 if exact else np.float64
    M = np.zeros((d1, d2), dt)
    for _, r in parts.iterrows():
        M += np.asarray(r["m"], dtype=dt).reshape(d1, d2)
    ii = np.repeat(np.arange(d1, dtype=np.int64), d2)
    jj = np.tile(np.arange(d2, dtype=np.int64), d1)
    return pa.table({"i": pa.array(ii), "j": pa.array(jj),
                     "m": pa.array(M.ravel())})


def procrustes_align(ds: Dataset, a_col: str, b_col: str,
                     out_col: str = "aligned"):
    """Orthogonal Procrustes alignment (Schönemann 1966): the
    rotation ``R = U Vᵀ`` from the SVD of the cross-covariance
    ``M = Σ a_i b_iᵀ`` minimizing ``Σ ‖aᵢR − bᵢ‖²`` over orthogonal
    R — the classic cross-lingual / cross-run embedding aligner.
    M accumulates distributed (one matmul per block, driver sum of
    d×d partials); the d×d SVD runs on the driver; the rotation
    broadcasts into one streaming ``map_batches`` pass appending the
    aligned vectors. Returns ``(aligned_ds, R)``; exact-recovery of a
    planted rotation is pinned in tests."""
    import ray as _ray

    from .partition import broadcast_get
    tbl = procrustes_crosscov(ds, a_col, b_col, exact=False)
    d1 = int(tbl["i"].to_numpy().max()) + 1
    d2 = int(tbl["j"].to_numpy().max()) + 1
    M = np.asarray(tbl["m"].to_numpy()).reshape(d1, d2)
    U, _s, Vt = np.linalg.svd(M)
    R = U @ Vt
    ref = _ray.put(R)

    def fn(t: pa.Table) -> pa.Table:
        rot = broadcast_get(ref)
        a = _mat64(t, a_col)
        return t.append_column(out_col, _mat_list(a @ rot))

    return ds.map_batches(fn, batch_format="pyarrow"), R
