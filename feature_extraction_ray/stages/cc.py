"""Distributed graph clustering + bucketed hash-join primitives.

These are the scale-out replacements for the round-1 driver funnel in the
near-dedup pipelines (driver brief; no reference analog — the reference
has no dedup):

* :func:`attach_values` — bucketed hash join: attach value columns from a
  lookup table onto a fact table on an equality key. One all-to-all over
  the union of both sides; the per-bucket probe is a vectorized
  ``np.searchsorted`` + Arrow ``take`` (no per-row Python).
* :func:`connected_components` — distributed connected components over an
  edge list via alternating large-star / small-star rounds (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC 2014 — public
  algorithm). Each half-round is ONE bucketed exchange; rounds needed =
  O(log² n) worst case, 2–3 in practice for near-dup clusters (small
  diameter). No driver-side union-find, no corpus-sized ``to_pandas``.
* :func:`assign_clusters` — final (id → cluster label) assignment as one
  more bucketed join; emits (id, cluster_id, is_duplicate).

Partitioning assumption: a single hash bucket of edges / lookup rows fits
one task's heap (buckets are hash-uniform over ids; raise ``num_buckets``
for bigger graphs — the exchange shape is unchanged).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .partition import stable_bucket
from .window import bucketed_apply

_SIDE = "__cc_side"        # 0 = fact rows, 1 = lookup rows


def _empty_like(field: pa.Field, n: int) -> pa.Array:
    return pa.nulls(n, type=field.type)


def attach_values(fact: Dataset, fact_key: str, lookup: Dataset,
                  lookup_key: str, value_cols: Sequence[str],
                  rename: Mapping[str, str] | None = None,
                  how: str = "inner", num_buckets: int = 32,
                  dup: str = "min",
                  distinct_fact_cols: Sequence[str] | None = None) -> Dataset:
    """Distributed equi-join: attach ``value_cols`` of ``lookup`` onto
    ``fact`` rows where ``fact[fact_key] == lookup[lookup_key]``.

    Both sides are tagged, unioned, hash-bucketed by the key, and joined
    per bucket with a sorted ``np.searchsorted`` probe — one all-to-all
    total, never a driver materialization. ``how`` ∈ {"inner", "left",
    "outer"}: ``outer`` additionally emits one row per UNMATCHED lookup
    key (fact columns null except ``fact_key``, which carries the
    lookup key — both sides of a FULL OUTER JOIN, since lookup keys are
    deduplicated to one row by the ``dup`` rule).
    Duplicate lookup keys keep one row per key, so the join never fans
    out rows: ``dup="min"`` keeps the row whose FIRST value column is
    minimal (the other value columns ride along from that same row —
    NOT a per-column min), ``dup="first"`` keeps the first row in stable
    sort order. For nested (list) value types the min pre-sort is
    skipped and the first-by-stable-sort row wins regardless of ``dup``.

    ``distinct_fact_cols``: drop duplicate fact rows (same values in these
    columns) inside each bucket BEFORE attaching values — rows with equal
    ``fact_key`` always co-locate, so for any column set that includes the
    key this is an exact global distinct fused into the join exchange
    (used to strip the per-band duplication of LSH candidate pairs before
    the expensive signature attach).
    """
    rename = dict(rename or {})
    out_names = [rename.get(c, c) for c in value_cols]
    fact_schema = fact.schema()
    if fact_schema is None:          # lazy pipeline whose schema can't be
        fact = fact.materialize()    # inferred without execution
        fact_schema = fact.schema()
    lk_schema = lookup.schema()
    if lk_schema is None:
        lookup = lookup.materialize()
        lk_schema = lookup.schema()
    lk_types = {n: t for n, t in zip(lk_schema.names, lk_schema.types)}
    fact_cols = list(fact_schema.names)
    ftypes = dict(zip(fact_schema.names, fact_schema.types))
    # unified schema: fact cols + __cc_side + renamed value cols
    uni_value_fields = [pa.field(out, lk_types[c])
                        for c, out in zip(value_cols, out_names)]

    def tag_fact(tbl: pa.Table) -> pa.Table:
        tbl = tbl.append_column(_SIDE, pa.array(
            np.zeros(len(tbl), dtype=np.int8)))
        for f in uni_value_fields:
            tbl = tbl.append_column(f.name, _empty_like(f, len(tbl)))
        return tbl

    def tag_lookup(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        cols = {}
        for name in fact_cols:
            if name == fact_key:
                cols[name] = tbl[lookup_key].cast(ftypes[fact_key])
            else:
                cols[name] = _empty_like(pa.field(name, ftypes[name]), n)
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        for c, out in zip(value_cols, out_names):
            cols[out] = tbl[c]
        return pa.table(cols)

    left = fact.map_batches(tag_fact, batch_format="pyarrow")
    right = lookup.select_columns(
        list(dict.fromkeys([lookup_key, *value_cols]))).map_batches(
        tag_lookup, batch_format="pyarrow")
    unioned = left.union(right)

    def _lookup_order(lk: pa.Table, keys: np.ndarray) -> np.ndarray:
        # duplicate keys: searchsorted(side="left") lands on the FIRST row
        # of a run; pre-sorting by (key, value) makes that the min value
        if dup == "min" and len(keys) and not pa.types.is_nested(
                uni_value_fields[0].type):
            vals = lk[out_names[0]].to_numpy(zero_copy_only=False)
            return np.lexsort((vals, keys))
        return np.argsort(keys, kind="stable")

    def unmatched_lookup_rows(lk: pa.Table, order: np.ndarray,
                              skeys: np.ndarray,
                              fkeys: np.ndarray) -> pa.Table:
        """One lookup row per key with no fact match, taken from the
        dup-representative (first row of each sorted key run). The
        lookup side of the union already HAS the output shape — fact
        columns null, ``fact_key`` carrying the key — so this is a pure
        ``take``."""
        run_start = np.r_[True, skeys[1:] != skeys[:-1]] if len(skeys) \
            else np.zeros(0, dtype=bool)
        rep = order[np.flatnonzero(run_start)]
        rep_keys = skeys[run_start]
        if len(fkeys):
            fk_sorted = np.sort(fkeys)
            p = np.searchsorted(fk_sorted, rep_keys)
            pc_ = np.clip(p, 0, len(fk_sorted) - 1)
            hit = (p < len(fk_sorted)) & (fk_sorted[pc_] == rep_keys)
        else:
            hit = np.zeros(len(rep_keys), dtype=bool)
        return lk.take(pa.array(rep[~hit].astype(np.int64)))

    def join_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        is_lk = side == 1
        lk = tbl.filter(pa.array(is_lk))
        ft = tbl.filter(pa.array(~is_lk))
        ft = ft.drop_columns([_SIDE, *out_names])
        if len(ft) == 0:
            empty_ft = _with_null_values(ft, uni_value_fields)
            if how != "outer" or len(lk) == 0:
                return empty_ft
            keys0 = lk[fact_key].to_numpy(zero_copy_only=False)
            order0 = _lookup_order(lk, keys0)
            extra = unmatched_lookup_rows(lk, order0, keys0[order0],
                                          np.zeros(0, dtype=keys0.dtype))
            return extra.select(empty_ft.column_names)
        if distinct_fact_cols:
            cols = [ft[c].to_numpy(zero_copy_only=False)
                    for c in distinct_fact_cols]
            order_d = np.lexsort(cols[::-1])
            keep = np.ones(len(ft), dtype=bool)
            srt = [c[order_d] for c in cols]
            dup_mask = np.ones(len(ft) - 1, dtype=bool) \
                if len(ft) > 1 else np.zeros(0, dtype=bool)
            for c in srt:
                dup_mask &= c[1:] == c[:-1]
            keep[order_d[1:][dup_mask]] = False
            if not keep.all():
                ft = ft.filter(pa.array(keep))
        keys = lk[fact_key].to_numpy(zero_copy_only=False)
        order = _lookup_order(lk, keys)
        skeys = keys[order]
        fkeys = ft[fact_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, fkeys, side="left")
        pos_c = np.clip(pos, 0, max(len(skeys) - 1, 0))
        matched = (len(skeys) > 0) & (pos < len(skeys))
        if len(skeys):
            matched = matched & (skeys[pos_c] == fkeys)
        else:
            matched = np.zeros(len(fkeys), dtype=bool)
        if how == "inner":
            if not matched.all():
                ft = ft.filter(pa.array(matched))
                pos_c = pos_c[matched]
            take_idx = pa.array(order[pos_c].astype(np.int64)) \
                if len(pos_c) else pa.array([], type=pa.int64())
            for f in uni_value_fields:
                col = lk[f.name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                ft = ft.append_column(f.name, col.take(take_idx))
            return ft
        # how == "left"/"outer": null where unmatched
        src = order[pos_c] if len(skeys) else np.zeros(len(fkeys), np.int64)
        idx = pa.array(src.astype(np.int64), mask=~matched)
        for f in uni_value_fields:
            col = lk[f.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ft = ft.append_column(f.name, col.take(idx) if len(lk)
                                  else _empty_like(f, len(ft)))
        if how == "outer" and len(lk):
            extra = unmatched_lookup_rows(lk, order, skeys, fkeys)
            if len(extra):
                ft = pa.concat_tables(
                    [ft, extra.select(ft.column_names)])
        return ft

    return bucketed_apply(unioned, fact_key, join_bucket,
                          num_buckets=num_buckets)


def _with_null_values(ft: pa.Table, fields) -> pa.Table:
    for f in fields:
        ft = ft.append_column(f.name, _empty_like(f, len(ft)))
    return ft


# ---------------------------------------------------------------------------
# Connected components (alternating star rounds)
# ---------------------------------------------------------------------------

_MIX1 = np.uint64(0x9E3779B97F4A7C15)


def _edge_checksum_arrays(u: np.ndarray, v: np.ndarray):
    """Order/partition-insensitive (sum-combined) digest of an edge list."""
    with np.errstate(over="ignore"):
        h = (u.astype(np.uint64) * np.uint64(0x100000001B3)) ^ \
            (v.astype(np.uint64) + _MIX1)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
    return int(h.sum(dtype=np.uint64)), len(u)


def _canonicalize(tbl: pa.Table) -> pa.Table:
    """(a,b) → canonical directed (u=big, v=small), self-loops dropped."""
    a = tbl["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    u = np.maximum(a, b)
    v = np.minimum(a, b)
    return pa.table({"u": pa.array(u), "v": pa.array(v)})


def _both_directions(tbl: pa.Table) -> pa.Table:
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    return pa.table({"x": pa.array(np.concatenate([u, v])),
                     "y": pa.array(np.concatenate([v, u]))})


def _large_star_bucket(tbl: pa.Table) -> pa.Table:
    """Per bucket of both-direction rows grouped by x: for each x with
    neighborhood Γ(x), m = min(Γ(x) ∪ {x}); emit canonical (y, m) for every
    y ∈ Γ(x) with y > x. Vectorized over sorted runs; per-bucket dedup."""
    x = tbl["x"].to_numpy(zero_copy_only=False)
    y = tbl["y"].to_numpy(zero_copy_only=False)
    if len(x) == 0:
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
    order = np.lexsort((y, x))
    x, y = x[order], y[order]
    # drop duplicate (x, y) rows (exact per-bucket dedup of the multiset)
    keep = np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
    x, y = x[keep], y[keep]
    starts = np.r_[np.flatnonzero(np.r_[True, x[1:] != x[:-1]]), len(x)]
    m_run = np.minimum(np.minimum.reduceat(y, starts[:-1]), x[starts[:-1]])
    run_id = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
    m = m_run[run_id]
    sel = y > x
    return pa.table({"u": pa.array(y[sel].astype(np.int64)),
                     "v": pa.array(m[sel].astype(np.int64))})


def _small_star_bucket(tbl: pa.Table) -> pa.Table:
    """Per bucket of canonical (u, v) rows grouped by u (v < u always):
    m = min over the run's v; emit (v, m) for v ≠ m plus (u, m)."""
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    if len(u) == 0:
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    u, v = u[keep], v[keep]
    starts = np.r_[np.flatnonzero(np.r_[True, u[1:] != u[:-1]]), len(u)]
    m_run = np.minimum.reduceat(v, starts[:-1])
    run_id = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
    m = m_run[run_id]
    sel = v != m
    out_u = np.concatenate([v[sel], u[starts[:-1]]])
    out_v = np.concatenate([m[sel], m_run])
    return pa.table({"u": pa.array(out_u.astype(np.int64)),
                     "v": pa.array(out_v.astype(np.int64))})


def _edge_stats(edges: Dataset) -> tuple:
    """(checksum, count) over the edge Dataset — tiny per-block partials."""
    def digest(tbl: pa.Table) -> pa.Table:
        s, n = _edge_checksum_arrays(
            tbl["u"].to_numpy(zero_copy_only=False),
            tbl["v"].to_numpy(zero_copy_only=False))
        return pa.table({"chk": pa.array([s], type=pa.uint64()),
                         "n": pa.array([n], type=pa.int64())})
    parts = edges.map_batches(digest, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return (0, 0)
    chk = parts["chk"].to_numpy(dtype=np.uint64)
    with np.errstate(over="ignore"):
        total = chk.sum(dtype=np.uint64)
    return (int(total), int(parts["n"].sum()))


def _union_find_table(tbl: pa.Table) -> pa.Table:
    """Path-compressed union-find over one edge table → (node, label)
    rows for non-root nodes. Runs INSIDE a Ray task (single block), never
    on the driver."""
    a = tbl["a"].to_numpy(zero_copy_only=False)
    b = tbl["b"].to_numpy(zero_copy_only=False)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = list(parent)
    labels = [find(x) for x in nodes]
    keep = [(n, l) for n, l in zip(nodes, labels) if n != l]
    return pa.table({
        "node": pa.array([n for n, _ in keep], type=pa.int64()),
        "label": pa.array([l for _, l in keep], type=pa.int64())})


def connected_components_compact(edges: Dataset) -> Dataset:
    """CC for edge sets that fit one task (≲ tens of millions of rows):
    coalesce to a single block and run union-find in ONE Ray task — no
    driver materialization, 1 exchange instead of ~2 per star round.
    The size-adaptive entry point is :func:`connected_components_auto`."""
    one = edges.repartition(1)
    return one.map_batches(_union_find_table, batch_format="pyarrow",
                           batch_size=None)


def connected_components_auto(edges: Dataset, num_buckets: int = 32,
                              max_rounds: int = 25,
                              compact_threshold: int = 2_000_000,
                              n_edges: int | None = None) -> Dataset:
    """Size-adaptive connected components: small verified-pair sets (the
    overwhelmingly common dedup case) take the 1-exchange single-task
    union-find; larger graphs take the star-round path whose per-round
    exchanges scale out. ``n_edges`` avoids a recount when the caller
    already materialized the edge set."""
    if n_edges is None:
        edges = edges.materialize()
        n_edges = edges.count()
    if n_edges <= compact_threshold:
        return connected_components_compact(edges)
    return connected_components(edges, num_buckets=num_buckets,
                                max_rounds=max_rounds)


def connected_components(edges: Dataset, num_buckets: int = 32,
                         max_rounds: int = 25) -> Dataset:
    """Distributed CC over an (a, b) edge Dataset → (node, label) Dataset
    with ``label`` = min node id of the component; root nodes are omitted
    (their label is themselves).

    Alternating large-star / small-star; each half-round is one bucketed
    all-to-all; converged when the canonical edge set is stable (checksum +
    count — the label multiset is monotone non-increasing, so a stable
    digest means a fixpoint). Only the O(1)-sized digest ever reaches the
    driver.
    """
    cur = edges.map_batches(_canonicalize, batch_format="pyarrow")
    prev_stats = None
    for _ in range(max_rounds):
        both = cur.map_batches(_both_directions, batch_format="pyarrow")
        ls = bucketed_apply(both, "x", _large_star_bucket,
                            num_buckets=num_buckets, drop_bucket=False)
        cur = bucketed_apply(ls, "u", _small_star_bucket,
                             num_buckets=num_buckets,
                             drop_bucket=False).materialize()
        stats = _edge_stats(cur)
        if stats == prev_stats:
            break
        prev_stats = stats
    # fixpoint edges are (member → root); collapse residual duplicates by
    # min label per member inside the final assignment join (dup="min").
    def rename(tbl: pa.Table) -> pa.Table:
        return pa.table({"node": tbl["u"], "label": tbl["v"]})
    return cur.map_batches(rename, batch_format="pyarrow")


def assign_clusters(ids: Dataset, labels: Dataset, id_col: str = "doc_id",
                    num_buckets: int = 32,
                    broadcast_rows: int | None = 4_000_000) -> Dataset:
    """(id) ⟕ (node → label) → (id, cluster_id, is_duplicate); ids with
    no label are their own cluster representative.

    The label table only contains nodes that appear in some verified
    near-dup pair, so it is tiny relative to the corpus in every
    realistic dedup run. When it has ≤ ``broadcast_rows`` rows (default
    4M ≈ 64 MB of two int64 columns) the join is a BROADCAST: the sorted
    (node → min label) arrays are ``ray.put`` once and every map task
    probes them with ``np.searchsorted`` — zero exchange, the corpus-side
    ``ids`` stream is never shuffled. Larger label tables fall back to
    the bucketed hash join (``attach_values``), which scales out."""
    import pyarrow.compute as pc
    labels = labels.materialize()
    n_labels = labels.count()
    if broadcast_rows is not None and n_labels <= broadcast_rows:
        import ray
        if n_labels == 0:
            node = np.zeros(0, dtype=np.int64)
            lab = np.zeros(0, dtype=np.int64)
        else:
            tbl = pa.concat_tables(
                [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows])
            node = tbl["node"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            lab = tbl["label"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            order = np.lexsort((lab, node))
            node, lab = node[order], lab[order]
            keep = np.r_[True, node[1:] != node[:-1]]   # min label per node
            node, lab = node[keep], lab[keep]
        ref = ray.put((node, lab))

        def lookup(tbl: pa.Table) -> pa.Table:
            n_arr, l_arr = ray.get(ref)      # zero-copy from object store
            ids_np = tbl[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(n_arr):
                pos = np.searchsorted(n_arr, ids_np)
                pos_c = np.minimum(pos, len(n_arr) - 1)
                found = n_arr[pos_c] == ids_np
                cluster = np.where(found, l_arr[pos_c], ids_np)
            else:
                cluster = ids_np
            return pa.table({
                id_col: tbl[id_col],
                "cluster_id": pa.array(cluster),
                "is_duplicate": pa.array(cluster != ids_np),
            })

        return ids.map_batches(lookup, batch_format="pyarrow")

    joined = attach_values(ids, id_col, labels, "node", ["label"],
                           how="left", num_buckets=num_buckets, dup="min")

    def finalize(tbl: pa.Table) -> pa.Table:
        ids_arr = tbl[id_col]
        lab = tbl["label"]
        cluster = pc.coalesce(lab, ids_arr)
        return pa.table({
            id_col: ids_arr,
            "cluster_id": cluster.cast(pa.int64()),
            "is_duplicate": pc.not_equal(cluster.cast(pa.int64()),
                                         ids_arr.cast(pa.int64())),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")
