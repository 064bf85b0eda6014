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
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from .cc import attach_values
from .partition import broadcast_get, sort_table

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
        # groupby
        rank = bucketed_apply(
            attach_values(edges2, _SRC, rank, "node", ["rank"],
                          num_buckets=num_buckets)
            .map_batches(contrib, batch_format="pyarrow"),
            "node", gather_bucket, num_buckets,
            drop_bucket=False).materialize()
        # bound the rank table's block count: the groupby emits ~input-
        # block-count blocks and the attach union feeds rank back in,
        # so without this coalesce each round adds ~edge-block-count
        # blocks and per-round wall grows linearly (measured on the
        # k-core sibling loop, graphrank._core_numbers_partitioned —
        # latent here because default iters=3). Shuffle-free
        # split/merge, not an exchange.
        if rank.num_blocks() > 2 * num_buckets:
            rank = rank.repartition(num_buckets).materialize()

    if not scaled:
        return rank

    def scale(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_scaled", pc.multiply(t["rank"], pa.scalar(float(n))))

    return rank.map_batches(scale, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Triangle counting + local clustering coefficient
# ---------------------------------------------------------------------------

def triangle_counts(edges: Dataset, src_col: str, dst_col: str,
                    num_buckets: int = 32, closure: str = "auto",
                    broadcast_edge_limit: int = 2 ** 25) -> Dataset:
    """Per-node triangle count, degree, and local clustering coefficient
    ``2·t / (deg·(deg−1))`` over an undirected simple graph (input edge
    rows may repeat, carry either direction, or contain self-loops —
    all are canonicalized away).

    Plan (the classic degree-ordered orientation, e.g. MapReduce
    triangle enumeration à la Suri–Vassilvitskii WWW'11): orient every
    edge toward its higher-``(degree, id)`` endpoint, which bounds each
    out-neighborhood by O(√m), so per-node wedge fan-out is bounded and
    hub nodes cannot explode a task. Two closure plans:

    * ``closure="broadcast"`` (picked by ``"auto"`` when the distinct
      edge count ≤ ``broadcast_edge_limit``, 2²⁵ ≈ 268 MB of packed
      int64 keys): the sorted packed edge-key array ships once via
      ``ray.put`` and every wedge closes IN the wedge task with a
      vectorized ``searchsorted`` membership test, emitting per-node
      count partials directly — wedges (the Θ(Σ outdeg²) blow-up term,
      measured 30M+ rows on a dense co-purchase graph where the edge
      set is 1M) never leave the task and never hit an exchange.
      Exchanges: canonical-distinct (1) + wedge/count co-location (1).
    * ``closure="attach"`` — the all-distributed scale path when even
      the edge-key array cannot be broadcast: wedges flow through one
      ``attach_values`` hash-join exchange against the oriented edges.
      Exchanges: 4.

    The node/degree table rides the broadcast regime — same contract as
    :func:`pagerank` ``plan="broadcast"`` (node table fits one machine
    even when the edge table is huge); int node ids must fit uint32 so
    an oriented pair packs into one int64 join key. Triangle identity
    is orientation-invariant, so the per-node counts match a plain
    a<b<c SQL enumeration. Output: ``node, degree, n_tri, clustering``
    (clustering null for degree < 2; exact-int division → bit-exact).
    """
    if closure not in ("auto", "broadcast", "attach"):
        raise ValueError(f"unknown closure plan {closure!r}")
    from .window import bucketed_apply

    def canonical(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        g = pa.table({"_a": a, "_b": b}).filter(pc.not_equal(a, b))
        return g.group_by(["_a", "_b"]).aggregate([])

    def bucket_distinct(tbl: pa.Table) -> pa.Table:
        return tbl.select(["_a", "_b"]).group_by(
            ["_a", "_b"]).aggregate([])

    dedup = bucketed_apply(
        edges.map_batches(canonical, batch_format="pyarrow"),
        "_a", bucket_distinct, num_buckets,
        drop_bucket=False).materialize()

    # degree table (node-sized): per-block endpoint counts -> driver merge
    def deg_partial(t: pa.Table) -> pa.Table:
        both = pa.table({"node": pa.array(np.concatenate(
            [_np_i64(t["_a"]), _np_i64(t["_b"])]))})
        agg = both.group_by(["node"]).aggregate([([], "count_all")])
        return agg.rename_columns(["node", "deg"])

    parts = [ray.get(r) for r in dedup.map_batches(
        deg_partial, batch_format="pyarrow").to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "degree": pa.array([], type=pa.int64()),
            "n_tri": pa.array([], type=pa.int64()),
            "clustering": pa.array([], type=pa.float64())}))
    degt = pa.concat_tables(parts).group_by(["node"]).aggregate(
        [("deg", "sum")])
    nodes = degt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    degs = degt["deg_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(nodes)
    nodes, degs = nodes[order], degs[order]
    if nodes.min() < 0 or nodes.max() >= 2 ** 32:
        raise ValueError("triangle_counts packs (node, node) into int64:"
                         " ids must fit uint32")
    deg_ref = ray.put((nodes, degs))

    PACK = np.int64(2 ** 32)

    def orient(t: pa.Table) -> pa.Table:
        from .partition import broadcast_get
        nd, dg = broadcast_get(deg_ref)
        a = _np_i64(t["_a"])
        b = _np_i64(t["_b"])
        da = dg[np.searchsorted(nd, a)]
        db = dg[np.searchsorted(nd, b)]
        # orient toward the higher (degree, id) endpoint
        fwd = (da < db) | ((da == db) & (a < b))
        u = np.where(fwd, a, b)
        v = np.where(fwd, b, a)
        dv = np.where(fwd, db, da)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "dv": pa.array(dv),
                         "uv": pa.array(u * PACK + v)})

    oriented = dedup.map_batches(orient,
                                 batch_format="pyarrow").materialize()

    if closure == "auto":
        closure = ("broadcast" if oriented.count() <= broadcast_edge_limit
                   else "attach")

    def _wedge_arrays(tbl: pa.Table):
        """(u, v, w) wedge index arrays from one apex bucket, with the
        (v, w) leg already rank-ordered to match the edge orientation."""
        tbl = sort_table(tbl, ["u", "dv", "v"])
        u = _np_i64(tbl["u"])
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        from .editdist import _pairs_within_runs
        ii, jj = _pairs_within_runs(starts, counts)
        if len(ii) == 0:
            return None
        v = _np_i64(tbl["v"])
        return u[ii], v[ii], v[jj]

    def _count_partial(node_arr: np.ndarray) -> pa.Table:
        g = pa.table({"node": pa.array(node_arr)})
        agg = g.group_by(["node"]).aggregate([([], "count_all")])
        return agg.rename_columns(["node", "t"])

    _count_empty = pa.table({"node": pa.array([], type=pa.int64()),
                             "t": pa.array([], type=pa.int64())})

    if closure == "broadcast":
        uv_parts = [ray.get(r) for r in oriented.select_columns(
            ["uv"]).to_arrow_refs()]
        uv_sorted = np.sort(np.concatenate(
            [_np_i64(p["uv"]) for p in uv_parts if p.num_rows]))
        uv_ref = ray.put(uv_sorted)

        def close_in_task(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return _count_empty
            wa = _wedge_arrays(tbl)
            if wa is None:
                return _count_empty
            u, v, w = wa
            from .partition import broadcast_get
            keys = broadcast_get(uv_ref)
            vw = v * PACK + w
            pos = np.searchsorted(keys, vw)
            hit = (pos < len(keys)) & (keys[np.minimum(
                pos, len(keys) - 1)] == vw)
            if not hit.any():
                return _count_empty
            return _count_partial(np.concatenate(
                [u[hit], v[hit], w[hit]]))

        counted = bucketed_apply(oriented, "u", close_in_task,
                                 num_buckets, drop_bucket=False)
    else:
        def wedges(tbl: pa.Table) -> pa.Table:
            empty = pa.table({"u": pa.array([], type=pa.int64()),
                              "v": pa.array([], type=pa.int64()),
                              "w": pa.array([], type=pa.int64()),
                              "vw": pa.array([], type=pa.int64())})
            if len(tbl) == 0:
                return empty
            wa = _wedge_arrays(tbl)
            if wa is None:
                return empty
            u, v, w = wa
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "w": pa.array(w),
                             "vw": pa.array(v * PACK + w)})

        wedge_ds = bucketed_apply(oriented, "u", wedges, num_buckets,
                                  drop_bucket=False)
        closed = attach_values(
            wedge_ds, "vw",
            oriented.select_columns(["uv"]).map_batches(
                lambda t: t.append_column("__hit", pa.array(
                    np.ones(len(t), dtype=np.int8))),
                batch_format="pyarrow"),
            "uv", ["__hit"], num_buckets=num_buckets, dup="first")

        def tri_nodes(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["__hit"]))
            if len(t) == 0:
                return _count_empty
            return _count_partial(np.concatenate(
                [_np_i64(t["u"]), _np_i64(t["v"]), _np_i64(t["w"])]))

        counted = closed.map_batches(tri_nodes, batch_format="pyarrow")

    cparts = [ray.get(r) for r in counted.to_arrow_refs()]
    cparts = [p for p in cparts if p.num_rows]
    tri = np.zeros(len(nodes), dtype=np.int64)
    if cparts:
        ct = pa.concat_tables(cparts).group_by(["node"]).aggregate(
            [("t", "sum")])
        cn = ct["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        cv = ct["t_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        tri[np.searchsorted(nodes, cn)] = cv
    denom = degs * (degs - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc_val = (2 * tri).astype(np.float64) / denom.astype(np.float64)
    clustering = pa.array(cc_val, from_pandas=True)
    clustering = pc.if_else(pa.array(denom <= 0),
                            pa.scalar(None, type=pa.float64()),
                            clustering)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes), "degree": pa.array(degs),
        "n_tri": pa.array(tri), "clustering": clustering}))


def _np_i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def label_propagation(edges: Dataset, src_col: str, dst_col: str,
                      iters: int = 5) -> Dataset:
    """Synchronous label-propagation community detection: every node
    starts in its own community, then each round adopts the most
    frequent label among its in-neighbors (ties → smallest label;
    isolated-in-degree nodes keep theirs) — deterministic by
    construction, unlike the classic async/randomized LP. Pass a
    symmetrized edge list for undirected semantics.

    Broadcast plan (the ``pagerank`` regime: node table fits the
    driver, edges only stream): edges are pre-indexed ONCE to int32
    pairs; each iteration broadcasts the label vector and every block
    emits packed ``(dst, label) → count`` partials via one
    ``np.unique`` — the driver merges partials and takes the
    per-dst (count desc, label asc) head. Zero shuffles per iteration;
    driver traffic is bounded by distinct (dst, label) pairs per
    block. Returns ``(node, community)`` where community is the
    elected label's node id."""
    e = _project(edges, src_col, dst_col).materialize()

    def node_partials(t: pa.Table) -> pa.Table:
        a = pa.table({"node": t[_SRC]}).group_by(["node"]).aggregate([])
        b = pa.table({"node": t[_DST]}).group_by(["node"]).aggregate([])
        return pa.concat_tables([a, b])

    part_tbls = ray.get(
        e.map_batches(node_partials, batch_format="pyarrow")
        .to_arrow_refs())
    merged = pa.concat_tables([p for p in part_tbls if p.num_rows]) \
        .group_by(["node"]).aggregate([])
    nodes = np.sort(merged["node"].to_numpy(zero_copy_only=False))
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def index_edges(t: pa.Table) -> pa.Table:
        nd = broadcast_get(nodes_ref)
        s = np.searchsorted(nd, t[_SRC].to_numpy(zero_copy_only=False))
        d = np.searchsorted(nd, t[_DST].to_numpy(zero_copy_only=False))
        return pa.table({"_si": pa.array(s.astype(np.int32)),
                         "_di": pa.array(d.astype(np.int32))})

    indexed = e.map_batches(index_edges,
                            batch_format="pyarrow").materialize()
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        lab_ref = ray.put(labels)

        def scatter(t: pa.Table, _ref=lab_ref) -> pa.Table:
            lab = broadcast_get(_ref)
            si = t["_si"].to_numpy(zero_copy_only=False)
            di = t["_di"].to_numpy(zero_copy_only=False)
            key = di.astype(np.int64) * n + lab[si]
            uniq, cnt = np.unique(key, return_counts=True)
            return pa.table({"_k": pa.array(uniq),
                             "_c": pa.array(cnt.astype(np.int64))})

        parts = ray.get(indexed.map_batches(
            scatter, batch_format="pyarrow").to_arrow_refs())
        parts = [p for p in parts if p.num_rows]
        if not parts:
            break
        ks = np.concatenate([p["_k"].to_numpy(zero_copy_only=False)
                             for p in parts])
        cs = np.concatenate([p["_c"].to_numpy(zero_copy_only=False)
                             for p in parts])
        order = np.argsort(ks, kind="stable")
        ks, cs = ks[order], cs[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        csum = np.add.reduceat(cs, starts)
        ku = ks[starts]
        dst, lab = ku // n, ku % n
        o2 = np.lexsort((lab, -csum, dst))
        d2, l2 = dst[o2], lab[o2]
        head = np.flatnonzero(np.r_[True, d2[1:] != d2[:-1]])
        new = labels.copy()
        new[d2[head]] = l2[head]
        labels = new

    import ray.data as rd
    comm = nodes[labels]
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes), "community": pa.array(comm)}))


def core_numbers(edges: Dataset, src_col: str, dst_col: str,
                 max_iters: int = 10_000, plan: str = "broadcast",
                 num_buckets: int = 32) -> Dataset:
    """Full k-core decomposition (coreness per node) via the iterative
    h-index fixpoint (Lü et al. 2016): start every node at its degree,
    then repeatedly set ``c(v) ← H-index of {c(u) : u ~ v}``; the
    sequence decreases monotonically to the coreness.

    Edges are treated as UNDIRECTED (symmetrized internally;
    duplicates and self-loops dropped). Two plans, equivalent by
    construction (equality golden in tests):

    * ``plan="broadcast"`` — the measured-local default (the
      ``pagerank``/``label_propagation`` judgment call, ~10× the
      partitioned plan locally): node + edge index arrays live on the
      driver after one distributed projection pass — int32 pairs, so
      ~16 MB per 2M edges; each round is ONE lexsort + reduceat over
      the edge array using the identity ``H = max_r min(r, v_r)`` on
      desc-sorted neighbor values, no per-node Python.
    * ``plan="partitioned"`` — the beyond-driver scale path: the edge
      list NEVER lands on the driver. Symmetrized-distinct edges are
      built with one bucketed exchange; each round attaches the
      current c(src) with the bucketed hash join (``cc.attach_values``)
      and gathers the per-node h-index with a ``bucketed_apply`` whose
      output block count is BOUNDED by ``num_buckets`` — two bounded
      exchanges per round, exactly the ``_pagerank_partitioned``
      shape. Convergence is detected by the scalar ``sum(core)``
      (the per-node sequence is monotone non-increasing, so an
      unchanged sum IS the fixpoint).

    Raises ``RuntimeError`` if the fixpoint does not converge within
    ``max_iters`` (returning intermediate non-coreness values silently
    would violate the repo's loud-reject convention). Returns
    (node, core) with core the exact coreness (validated against naive
    peeling in tests)."""
    if plan == "broadcast":
        return _core_numbers_broadcast(edges, src_col, dst_col,
                                       max_iters)
    if plan == "partitioned":
        return _core_numbers_partitioned(edges, src_col, dst_col,
                                         max_iters, num_buckets)
    raise ValueError(f"unknown plan {plan!r}")


def _core_numbers_broadcast(edges: Dataset, src_col: str,
                            dst_col: str, max_iters: int) -> Dataset:
    e = _project(edges, src_col, dst_col).materialize()

    def dedup(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t[_SRC], t[_DST]))
        return t.filter(keep)

    refs = [r for r in ray.get(
        e.map_batches(dedup, batch_format="pyarrow")
        .to_arrow_refs()) if r.num_rows]
    tbl = pa.concat_tables(refs) if refs else None
    if tbl is None or tbl.num_rows == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "core": pa.array([], pa.int64())}))
    s_raw = tbl[_SRC].to_numpy(zero_copy_only=False)
    d_raw = tbl[_DST].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.r_[s_raw, d_raw], return_inverse=True)
    s, d = inv[:len(s_raw)], inv[len(s_raw):]
    # symmetrize + dedup parallel edges
    a = np.r_[s, d].astype(np.int64)
    b = np.r_[d, s].astype(np.int64)
    packed = a * len(nodes) + b
    packed = np.unique(packed)
    a = packed // len(nodes)
    b = packed % len(nodes)
    n = len(nodes)
    c = np.bincount(b, minlength=n).astype(np.int64)  # degree init
    for _ in range(max_iters):
        v = c[a]
        order = np.lexsort((-v, b))
        bb, vv = b[order], v[order]
        starts = np.flatnonzero(np.r_[True, bb[1:] != bb[:-1]])
        r = (np.arange(len(bb)) - np.repeat(
            starts, np.diff(np.r_[starts, len(bb)])) + 1)
        h = np.maximum.reduceat(np.minimum(r, vv), starts)
        new = np.zeros(n, np.int64)
        new[bb[starts]] = h
        if (new == c).all():
            break
        c = new
    else:
        raise RuntimeError(
            f"core_numbers: h-index fixpoint did not converge within "
            f"max_iters={max_iters} rounds — raise max_iters (the "
            "intermediate values are NOT corenesses)")
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes),
        "core": pa.array(c)}))


def _core_numbers_partitioned(edges: Dataset, src_col: str,
                              dst_col: str, max_iters: int,
                              num_buckets: int) -> Dataset:
    from .window import bucketed_apply

    _empty = pa.table({"node": pa.array([], pa.string()),
                       "core": pa.array([], pa.int64())})
    e = _project(edges, src_col, dst_col).materialize()

    # symmetrize + drop self-loops; per-block distinct partial keeps the
    # exchange no bigger than the distinct edge set
    def sym(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t[_SRC], t[_DST])))
        a = pa.concat_arrays([t[_SRC].combine_chunks(),
                              t[_DST].combine_chunks()])
        b = pa.concat_arrays([t[_DST].combine_chunks(),
                              t[_SRC].combine_chunks()])
        return pa.table({"_a": a, "_b": b}) \
            .group_by(["_a", "_b"]).aggregate([])

    def distinct_bucket(t: pa.Table) -> pa.Table:
        return t.group_by(["_a", "_b"]).aggregate([])

    # identical (_a,_b) copies always share a bucket, so the per-bucket
    # distinct is an exact global distinct (one exchange)
    sym_edges = bucketed_apply(
        e.map_batches(sym, batch_format="pyarrow"),
        "_b", distinct_bucket, num_buckets,
        drop_bucket=False).materialize()
    if sym_edges.count() == 0:
        return rd.from_arrow(_empty)

    # initial state c(v) = deg(v): one bucketed count over the gather key
    def deg_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by(["_b"]).aggregate([([], "count_all")])
        return agg.rename_columns(["node", "core"])

    state = bucketed_apply(sym_edges, "_b", deg_bucket,
                           num_buckets, drop_bucket=False).materialize()
    total = int(state.sum(on="core"))

    def project_ba(t: pa.Table) -> pa.Table:
        return pa.table({"_b": t["_b"], "_ca": t["_ca"]})

    def gather(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty
        bs = t["_b"].to_numpy(zero_copy_only=False)
        v = t["_ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, code = np.unique(bs, return_inverse=True)
        order = np.lexsort((-v, code))
        cc_, vv = code[order], v[order]
        starts = np.flatnonzero(np.r_[True, cc_[1:] != cc_[:-1]])
        r = (np.arange(len(cc_)) - np.repeat(
            starts, np.diff(np.r_[starts, len(cc_)])) + 1)
        h = np.maximum.reduceat(np.minimum(r, vv), starts)
        return pa.table({"node": pa.array(uniq[cc_[starts]]),
                         "core": pa.array(h)})

    for _ in range(max_iters):
        # attach c(src): one bucketed hash-join exchange; gather: one
        # bucketed h-index pass
        state = bucketed_apply(
            attach_values(sym_edges, "_a", state, "node", ["core"],
                          rename={"core": "_ca"},
                          num_buckets=num_buckets)
            .map_batches(project_ba, batch_format="pyarrow"),
            "_b", gather, num_buckets,
            drop_bucket=False).materialize()
        # BOUND the state's block count: groupby emits ~input-block-
        # count output blocks, and the attach union feeds the state
        # back in — without this coalesce every round adds ~edge-block-
        # count blocks and the per-round wall grows LINEARLY (measured
        # 135 s → 415 s over 30 rounds on the 1.2M-edge sf0.1
        # co-purchase graph; FLAT ~4.5 s/round with it — 38 rounds in
        # 173.6 s total). Shuffle-free split/merge repartition, not an
        # exchange.
        if state.num_blocks() > 2 * num_buckets:
            state = state.repartition(num_buckets).materialize()
        s = int(state.sum(on="core"))
        if s == total:        # monotone non-increasing ⇒ fixpoint
            break
        total = s
    else:
        raise RuntimeError(
            f"core_numbers: h-index fixpoint did not converge within "
            f"max_iters={max_iters} rounds — raise max_iters (the "
            "intermediate values are NOT corenesses)")
    return state


def _distinct_undirected(e: Dataset,
                         num_buckets: int = 32) -> Dataset:
    """Distinct undirected string pairs: orient (min, max), hash-bucket
    by the first endpoint, per-bucket lexsort dedup."""
    from .window import bucketed_apply

    def orient(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t[_SRC], t[_DST])
        hi = pc.max_element_wise(t[_SRC], t[_DST])
        return pa.table({_SRC: lo, _DST: hi})

    def dedup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({_SRC: pa.array([], pa.string()),
                             _DST: pa.array([], pa.string())})
        a = t[_SRC].to_numpy(zero_copy_only=False)
        b = t[_DST].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({_SRC: pa.array(a[keep]),
                         _DST: pa.array(b[keep])})

    return bucketed_apply(e.map_batches(orient,
                                        batch_format="pyarrow"),
                          _SRC, dedup, num_buckets,
                          drop_bucket=False)


def degree_assortativity(edges: Dataset, src_col: str,
                         dst_col: str) -> Dataset:
    """Degree assortativity coefficient (Newman 2002) of an
    UNDIRECTED graph — the Pearson correlation of endpoint degrees
    over the symmetrized edge list, the classic one-number structural
    diagnostic (social graphs assortative, web/dependency graphs
    disassortative). Exactness contract mirrors
    ``groupstats.corr_matrix``: per-block EXACT int64 sufficient
    statistics (M directed edge-ends; Σx, Σx², Σxy over endpoint
    degree pairs) reduce through one tiny driver sum, and

        r = (M·Σxy − Σx·Σy) / (sqrt(M·Σxx − Σx²)·sqrt(M·Σyy − Σy²))

    with Σy = Σx by symmetry is ONE fixed IEEE expression — the SQL
    twin compares STRICTLY (sqrt is correctly rounded). Zero-degree
    variance yields null. Scale shape: degrees via ONE
    node-bounded groupby, attached to edges with ONE bucketed
    ``attach_values`` exchange per endpoint; bound
    ``M·max_deg² < 2^62`` checked."""
    from .cc import attach_values
    e = _distinct_undirected(
        _project(edges, src_col, dst_col)).materialize()

    def sym(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t[_SRC], t[_DST]))
        t = t.filter(keep)
        return pa.table({
            "a": pa.concat_arrays([t[_SRC].combine_chunks()
                                   if isinstance(t[_SRC],
                                                 pa.ChunkedArray)
                                   else t[_SRC],
                                   t[_DST].combine_chunks()
                                   if isinstance(t[_DST],
                                                 pa.ChunkedArray)
                                   else t[_DST]]),
            "b": pa.concat_arrays([t[_DST].combine_chunks()
                                   if isinstance(t[_DST],
                                                 pa.ChunkedArray)
                                   else t[_DST],
                                   t[_SRC].combine_chunks()
                                   if isinstance(t[_SRC],
                                                 pa.ChunkedArray)
                                   else t[_SRC]])})

    se = e.map_batches(sym, batch_format="pyarrow").materialize()
    deg = se.groupby("a").count()

    def rn(t: pa.Table) -> pa.Table:
        if "a" not in t.column_names:
            return pa.table({"node": pa.array([], pa.string()),
                             "deg": pa.array([], pa.int64())})
        return pa.table({"node": t["a"],
                         "deg": pc.cast(t["count()"], pa.int64())})

    degt = deg.map_batches(rn, batch_format="pyarrow")
    j = attach_values(se, "a", degt, "node", ["deg"],
                      rename={"deg": "dx"})
    j = attach_values(j, "b", degt, "node", ["deg"],
                      rename={"deg": "dy"})

    def partial(t: pa.Table) -> pa.Table:
        x = t["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "m": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "maxd": pa.array([int(x.max()) if len(x) else 0],
                             pa.int64())})

    parts = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = int(parts["m"].sum())
    if m == 0:
        return rd.from_arrow(pa.table({
            "m": pa.array([0], pa.int64()),
            "sx": pa.array([0], pa.int64()),
            "sxx": pa.array([0], pa.int64()),
            "sxy": pa.array([0], pa.int64()),
            "r": pa.array([None], pa.float64())}))
    sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sxy = int(parts["sxy"].sum())
    maxd = int(parts["maxd"].max())
    if m * maxd * maxd >= 2 ** 62:
        raise ValueError("degree_assortativity: M*max_deg^2 >= 2^62 "
                         "— exact int64 sufficient stats would "
                         "overflow")
    num = np.float64(m * sxy - sx * sx)
    var = np.float64(m * sxx - sx * sx)
    if var == 0.0:
        r_arr = pa.array([None], pa.float64())
    else:
        r = num / (np.sqrt(var) * np.sqrt(var))
        r_arr = pa.array([float(r)], pa.float64())
    return rd.from_arrow(pa.table({
        "m": pa.array([m], pa.int64()),
        "sx": pa.array([sx], pa.int64()),
        "sxx": pa.array([sxx], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "r": r_arr}))


def attribute_modularity(edges: Dataset, src_col: str, dst_col: str,
                         node_attr: Dataset, node_col: str,
                         attr_col: str) -> Dataset:
    """Newman modularity of a GIVEN node partition (an attribute
    community, e.g. customers by nation): per community c,

        q_c = e_c / m − (d_c / (2·m))²

    with ``e_c`` intra-community undirected edges, ``d_c`` the
    community degree sum and ``m`` total undirected edges — each row's
    ``q_c`` is ONE fixed IEEE expression over exact int64 witnesses
    (e_c, d_c, m), so the SQL twin compares STRICTLY row-by-row (the
    global Q = Σ q_c is left to the caller: a cross-engine float sum
    would reassociate). Self-loops and duplicate edges dropped;
    nodes missing an attribute reject loudly. ONE attach exchange per
    endpoint + one community-bounded groupby."""
    from .cc import attach_values
    e = _distinct_undirected(
        _project(edges, src_col, dst_col)).materialize()

    def dedup(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t[_SRC], t[_DST]))
        return t.filter(keep)

    ded = e.map_batches(dedup, batch_format="pyarrow")

    def attr_prep(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t[node_col], pa.string()),
                         "attr": pc.cast(t[attr_col], pa.string())})

    at = node_attr.map_batches(attr_prep, batch_format="pyarrow")
    j = attach_values(ded, _SRC, at, "node", ["attr"],
                      rename={"attr": "ca"})
    j = attach_values(j, _DST, at, "node", ["attr"],
                      rename={"attr": "cb"}).materialize()
    n_edges = j.count()
    n_input = ded.count()
    if n_edges != n_input:
        raise ValueError(
            f"attribute_modularity: {n_input - n_edges} edge "
            f"endpoints have no attribute row")

    def partial(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False)
        cb = t["cb"].to_numpy(zero_copy_only=False)
        cs = np.r_[ca, cb]
        ug, gi = np.unique(cs, return_inverse=True)
        d = np.bincount(gi, minlength=len(ug)).astype(np.int64)
        intra = ca == cb
        ei = np.zeros(len(ug), np.int64)
        if intra.any():
            np.add.at(ei, gi[:len(ca)][intra], 1)
        return pa.table({"attr": pa.array(ug),
                         "d_c": pa.array(d),
                         "e_c": pa.array(ei)})

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("attr").aggregate(Sum("d_c", alias_name="d_c"),
                                   Sum("e_c", alias_name="e_c"))
    m = n_edges

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "attr" not in t.column_names:
            return pa.table({"attr": pa.array([], pa.string()),
                             "e_c": pa.array([], pa.int64()),
                             "d_c": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64()),
                             "q_c": pa.array([], pa.float64())})
        ec = t["e_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        dc = t["d_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = ec / np.float64(m)
        half = dc / (2.0 * np.float64(m))
        q = frac - half * half
        return pa.table({"attr": t["attr"], "e_c": pa.array(ec),
                         "d_c": pa.array(dc),
                         "m": pa.array(np.full(len(ec), m,
                                               np.int64)),
                         "q_c": pa.array(q)})

    return agg.map_batches(finish, batch_format="pyarrow")
