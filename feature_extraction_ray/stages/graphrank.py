"""Distributed PageRank over an edge Dataset.

Standard damped PageRank (Brin & Page 1998), the variant WITHOUT
dangling-mass redistribution: ``rank_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E}
rank_k(u) / outdeg(u)``; parallel edges count with multiplicity (they
enter ``outdeg`` and contribute once each).

Two plans, equivalent by construction (golden-tested against a dense
power iteration and against each other):

* ``plan="broadcast"`` — the right shape when the NODE table fits one
  machine even though the EDGE table is huge (the common web/purchase
  graph regime). Setup collects per-block distinct-node and out-degree
  partials (node-table sized, never edge-sized), pre-indexes the edges
  once into compact ``(src_idx, dst_idx) int32`` blocks, and each
  iteration is ONE zero-shuffle vectorized map over the edge blocks — a
  per-block ``np.bincount`` scatter of ``rank/deg`` into a dense partial
  vector — plus an O(nodes) driver merge and ``ray.put`` of the next
  rank vector (fetched once per worker via the memoized
  ``partition.broadcast_get``). No all-to-all at all.
* ``plan="partitioned"`` — the all-distributed scale path when even the
  node table must stay sharded: rank attached onto static weighted edges
  with the bucketed hash-join exchange (``cc.attach_values``), gathered
  with a bucketed ``groupby(dst)`` whose output block count is BOUNDED
  by ``num_buckets`` (a plain ``Dataset.groupby`` emits
  input-block-count output blocks, which compounds per iteration —
  observed 64 extra blocks/round before this fix), zero-weight
  self-loops keeping every node present. Rank is materialized each
  round (iterative lazy lineage would otherwise re-execute from the
  root every iteration).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .cc import attach_values
from .partition import broadcast_get

_SRC, _DST, _W = "_pr_src", "_pr_dst", "_pr_w"


def _project(edges: Dataset, src_col: str, dst_col: str) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({_SRC: pc.cast(t[src_col], pa.string()),
                         _DST: pc.cast(t[dst_col], pa.string())})
    return edges.map_batches(fn, batch_format="pyarrow")


def _rank_table(nodes: np.ndarray, rank: np.ndarray,
                n: int, scaled: bool) -> pa.Table:
    cols = {"node": pa.array(nodes), "rank": pa.array(rank)}
    if scaled:
        cols["rank_scaled"] = pa.array(rank * float(n))
    return pa.table(cols)


def pagerank(edges: Dataset, src_col: str, dst_col: str,
             damping: float = 0.85, iters: int = 3,
             scaled: bool = False, num_buckets: int = 32,
             plan: str = "broadcast") -> Dataset:
    """PageRank after ``iters`` synchronous iterations from the uniform
    start ``1/N``. Returns ``(node, rank[, rank_scaled])`` —
    ``rank_scaled = rank * N`` is the O(1)-mean normalization that keeps
    fixed-decimal rounding stable across graph sizes. Node ids must be
    strings (callers tag mixed id spaces into one namespace)."""
    if plan == "broadcast":
        return _pagerank_broadcast(edges, src_col, dst_col, damping,
                                   iters, scaled)
    if plan == "partitioned":
        return _pagerank_partitioned(edges, src_col, dst_col, damping,
                                     iters, scaled, num_buckets)
    raise ValueError(f"unknown plan {plan!r}")


# ---------------------------------------------------------------------------
# Broadcast plan (node table fits the driver; edges stream, no shuffle)
# ---------------------------------------------------------------------------

def _pagerank_broadcast(edges: Dataset, src_col: str, dst_col: str,
                        damping: float, iters: int,
                        scaled: bool) -> Dataset:
    # materialize the projected edges ONCE: the degree pass and the
    # indexing pass would otherwise each re-execute the full upstream
    # lineage (often a join that built the edge list)
    e = _project(edges, src_col, dst_col).materialize()

    # node + out-degree partials: per-block Arrow hash aggregates, so the
    # driver receives node-table-sized partials, never edge rows
    def partials(t: pa.Table) -> pa.Table:
        agg = t.group_by([_SRC]).aggregate([([], "count_all")])
        agg = agg.rename_columns(["node", "_d"])
        dsts = pa.table({"node": t[_DST]}).group_by(["node"]).aggregate([])
        dsts = dsts.append_column("_d", pa.array(
            np.zeros(len(dsts), np.int64)))
        return pa.concat_tables([agg, dsts])

    part_tbls = ray.get(
        e.map_batches(partials, batch_format="pyarrow").to_arrow_refs())
    merged = pa.concat_tables([p for p in part_tbls if p.num_rows]) \
        .group_by(["node"]).aggregate([("_d", "sum")])
    nodes = np.sort(merged["node"].to_numpy(zero_copy_only=False))
    deg = np.zeros(len(nodes), dtype=np.float64)
    pos = np.searchsorted(nodes, merged["node"].to_numpy(
        zero_copy_only=False))
    deg[pos] = merged["_d_sum"].to_numpy(zero_copy_only=False)
    n = len(nodes)
    base = (1.0 - damping) / n

    # pre-index the edges ONCE into compact int32 pairs
    nodes_ref = ray.put(nodes)

    def index_edges(t: pa.Table) -> pa.Table:
        nd = broadcast_get(nodes_ref)
        s = np.searchsorted(nd, t[_SRC].to_numpy(zero_copy_only=False))
        d = np.searchsorted(nd, t[_DST].to_numpy(zero_copy_only=False))
        return pa.table({"_si": pa.array(s.astype(np.int32)),
                         "_di": pa.array(d.astype(np.int32))})

    indexed = e.map_batches(index_edges,
                            batch_format="pyarrow").materialize()

    rank = np.full(n, 1.0 / n)
    # rank * (1/deg), NOT rank/deg: the partitioned plan and the SQL
    # oracle both multiply by a precomputed 1/outdeg weight, and the two
    # IEEE expressions differ in the last bit
    inv_deg = 1.0 / np.maximum(deg, 1.0)  # deg>0 for every actual src
    for _ in range(iters):
        share_ref = ray.put(rank * inv_deg)

        def scatter(t: pa.Table) -> pa.Table:
            share = broadcast_get(share_ref)
            si = t["_si"].to_numpy(zero_copy_only=False)
            di = t["_di"].to_numpy(zero_copy_only=False)
            s = np.bincount(di, weights=share[si], minlength=0)
            nz = np.flatnonzero(s)
            return pa.table({"_i": pa.array(nz.astype(np.int64)),
                             "_s": pa.array(s[nz])})

        parts = ray.get(indexed.map_batches(
            scatter, batch_format="pyarrow").to_arrow_refs())
        s = np.zeros(n, dtype=np.float64)
        for p in parts:
            if p.num_rows:
                idx = p["_i"].to_numpy(zero_copy_only=False)
                np.add.at(s, idx, p["_s"].to_numpy(zero_copy_only=False))
        rank = base + damping * s

    import ray.data as rd
    return rd.from_arrow(_rank_table(nodes, rank, n, scaled))


# ---------------------------------------------------------------------------
# Partitioned plan (node table itself sharded; 2 bounded exchanges/iter)
# ---------------------------------------------------------------------------

def _pagerank_partitioned(edges: Dataset, src_col: str, dst_col: str,
                          damping: float, iters: int, scaled: bool,
                          num_buckets: int) -> Dataset:
    from .window import bucketed_apply

    # three setup consumers (node set, out-degrees, weighted edges) —
    # materialize the projection once instead of re-running the lineage
    e = _project(edges, src_col, dst_col).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t[_SRC].combine_chunks(),
                                 t[_DST].combine_chunks()])
        return pa.table({"node": both}).group_by(["node"]).aggregate([])

    def distinct_bucket(t: pa.Table) -> pa.Table:
        return t.group_by(["node"]).aggregate([])

    nodes = bucketed_apply(
        e.map_batches(node_partial, batch_format="pyarrow"),
        "node", distinct_bucket, num_buckets,
        drop_bucket=False).materialize()
    n = nodes.count()
    base = (1.0 - damping) / n

    def deg_partial(t: pa.Table) -> pa.Table:
        agg = t.group_by([_SRC]).aggregate([([], "count_all")])
        return agg.rename_columns([_SRC, "_d"])

    def deg_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by([_SRC]).aggregate([("_d", "sum")])
        return agg.rename_columns([_SRC, "_d"])

    outdeg = bucketed_apply(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        _SRC, deg_bucket, num_buckets, drop_bucket=False)

    def weigh(t: pa.Table) -> pa.Table:
        w = pc.divide(pa.scalar(1.0), pc.cast(t["_d"], pa.float64()))
        return pa.table({_SRC: t[_SRC], _DST: t[_DST], _W: w})

    weighted = attach_values(e, _SRC, outdeg, _SRC, ["_d"],
                             num_buckets=num_buckets) \
        .map_batches(weigh, batch_format="pyarrow")

    def self_loops(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t)), type=pa.float64())
        return pa.table({_SRC: t["node"], _DST: t["node"], _W: z})

    edges2 = weighted.union(
        nodes.map_batches(self_loops, batch_format="pyarrow")).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        r = pa.array(np.full(len(t), 1.0 / n), type=pa.float64())
        return pa.table({"node": t["node"], "rank": r})

    rank = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        c = pc.multiply(t["rank"], t[_W])
        g = pa.table({"node": t[_DST], "_c": c})
        agg = g.group_by(["node"]).aggregate([("_c", "sum")])
        return agg.rename_columns(["node", "_s"])

    def gather_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by(["node"]).aggregate([("_s", "sum")])
        agg = agg.rename_columns(["node", "_s"])
        r = pc.add(pa.scalar(base),
                   pc.multiply(pa.scalar(damping),
                               pc.cast(agg["_s"], pa.float64())))
        return pa.table({"node": agg["node"], "rank": r})

    for _ in range(iters):
        # scatter: one bucketed hash-join exchange; gather: one bucketed
        # groupby whose output block count stays == num_buckets (constant
        # across iterations — Dataset.groupby would grow it every round)
        rank = bucketed_apply(
            attach_values(edges2, _SRC, rank, "node", ["rank"],
                          num_buckets=num_buckets)
            .map_batches(contrib, batch_format="pyarrow"),
            "node", gather_bucket, num_buckets,
            drop_bucket=False).materialize()

    if not scaled:
        return rank

    def scale(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_scaled", pc.multiply(t["rank"], pa.scalar(float(n))))

    return rank.map_batches(scale, batch_format="pyarrow")
