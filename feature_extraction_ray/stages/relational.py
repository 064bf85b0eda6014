"""Relational building blocks: broadcast hash join, semi/anti join filters.

Reference parity (cites only; fresh implementation):

* broadcast projection join — metadata dict mapped onto segments,
  ``microsoft_asr_features/group_audio_files.py:42-50`` (J1/J2).
* semi-join filter — ``df[df.audio_file_id.isin(call_ids)]``,
  ``group_audio_files.py:42-44`` (M13).

Plan: the small side is materialized once on the driver, ``ray.put`` once,
and every map task does a vectorized hash lookup per batch — no shuffle.
For large–large equi-joins use ``Dataset.join`` (hash shuffle) or the
bucketed pattern in ``stages/partition.py``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _small_side_table(ds: Dataset) -> pa.Table:
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p for p in parts if len(p)] or parts[:1]
    if not parts:
        return pa.table({}, schema=ds.schema().base_schema)
    return pa.concat_tables(parts, promote_options="default")


def broadcast_join(left: Dataset, right: Dataset, *, left_key: str,
                   right_key: str, right_value_cols: Sequence[str],
                   how: str = "inner", suffix: str = "_r") -> Dataset:
    """Map-side hash join: ship the small ``right`` once via ``ray.put``,
    look it up per batch with a pandas indexed take (vectorized).

    ``how`` ∈ {"inner", "left"}. Duplicate right keys keep the LAST
    occurrence (projection-join semantics, like ``Series.map`` of a dict —
    ``group_audio_files.py:49-50``).
    """
    right_tbl = _small_side_table(right).select(
        list(dict.fromkeys([right_key, *right_value_cols])))
    rdf = right_tbl.to_pandas().drop_duplicates(right_key, keep="last")
    rdf = rdf.set_index(right_key)
    ref = ray.put(rdf)

    from .partition import broadcast_get

    def join_batch(batch: pa.Table) -> pa.Table:
        rdf: pd.DataFrame = broadcast_get(ref)   # deserialized once/worker
        keys = batch[left_key].to_numpy(zero_copy_only=False)
        idx = rdf.index.get_indexer(keys)
        found = idx >= 0
        if how == "inner":
            if not found.all():
                batch = batch.filter(pa.array(found))
                idx = idx[found]
            found = None  # every remaining row matched
        for c in right_value_cols:
            vals = rdf[c].to_numpy()[np.clip(idx, 0, None)]
            arr = pa.array(vals, from_pandas=True)
            if found is not None:
                arr = pc.if_else(pa.array(found), arr,
                                 pa.nulls(len(arr), type=arr.type))
            name = f"{c}{suffix}" if c in batch.column_names else c
            batch = batch.append_column(name, arr)
        return batch

    return left.map_batches(join_batch, batch_format="pyarrow")


def semi_join(left: Dataset, right: Dataset, *, left_key: str,
              right_key: str, anti: bool = False) -> Dataset:
    """Filter ``left`` to rows whose key is (not, if ``anti``) present in
    ``right`` — broadcast key-set + vectorized ``pc.is_in`` per batch."""
    keys = _small_side_table(right)[right_key]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    key_set = pc.unique(keys)
    ref = ray.put(key_set)

    def filter_batch(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[left_key], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return left.map_batches(filter_batch, batch_format="pyarrow")


def normalize_by_group(ds: Dataset, group_col: str,
                       value_cols: Sequence[str], method: str = "zscore",
                       suffix: str | None = None,
                       num_buckets: int = 32) -> Dataset:
    """Group-wise feature normalization: append ``{col}{suffix}`` =
    z-score ``(x - mean)/std`` (sample std, ddof=1) or min-max
    ``(x - min)/(max - min)`` per ``group_col`` — the per-entity scaling
    step of a feature-engineering pipeline.

    ONE bucketed exchange (hash groups to entity-complete buckets, the
    windowed-operator pattern), then exact two-pass moments per group
    inside the task — numerically stable (no sum-of-squares
    cancellation), vectorized via segmented sums. Degenerate groups
    (single row for zscore, constant for minmax) yield null, matching
    SQL ``NULLIF`` semantics. Assumes a group's rows fit one task, like
    every windowed operator here; groups-as-distributions that don't
    fit a task need the partial-aggregate path instead."""
    from ..functions.windows import group_starts
    from .window import bucketed_apply
    sfx = suffix or ("_z" if method == "zscore" else "_mm")
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown normalization method {method!r}")

    def fn(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[(group_col, "ascending")])
        tbl = tbl.take(idx)
        ent = tbl[group_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        codes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        ng = group_starts(codes)
        run_id = np.cumsum(ng) - 1
        starts = np.flatnonzero(ng)
        n = np.diff(np.r_[starts, len(tbl)]).astype(np.float64)
        for c in value_cols:
            v = pc.cast(tbl[c], pa.float64()).to_numpy(
                zero_copy_only=False)
            gsum = np.add.reduceat(v, starts)
            mean = gsum / n
            if method == "zscore":
                dev = v - mean[run_id]
                ssd = np.add.reduceat(dev * dev, starts)
                with np.errstate(invalid="ignore", divide="ignore"):
                    std = np.sqrt(ssd / np.where(n > 1, n - 1, np.nan))
                    z = dev / std[run_id]
                bad = ~np.isfinite(z)
                tbl = tbl.append_column(f"{c}{sfx}", pa.array(z, mask=bad))
            else:
                lo = np.minimum.reduceat(v, starts)
                hi = np.maximum.reduceat(v, starts)
                with np.errstate(invalid="ignore", divide="ignore"):
                    mm = (v - lo[run_id]) / (hi - lo)[run_id]
                bad = ~np.isfinite(mm)
                tbl = tbl.append_column(f"{c}{sfx}", pa.array(mm, mask=bad))
        return tbl

    return bucketed_apply(ds, group_col, fn, num_buckets)


def pivot_counts(ds: Dataset, group_col: str, pivot_col: str,
                 value_col: str | None = None,
                 pivot_values: Sequence | None = None,
                 max_pivot: int = 256) -> Dataset:
    """Reshape long → wide: one row per ``group_col``, one column per
    ``pivot_col`` value holding the row count (or the SUM of
    ``value_col``) — SQL ``count(*)/sum(v) FILTER (WHERE pivot = 'x')``.

    Distributed as indicator columns + partial-aggregate sums inside
    ``map_batches``, then ONE small ``groupby(group)`` exchange — never a
    per-value shuffle. ``pivot_values`` pins the output columns (and
    their order); when None they are discovered with a zero-shuffle
    distinct pass, capped at ``max_pivot`` (wide-pivot explosions are a schema
    smell, not a data path)."""
    if pivot_values is None:
        # ZERO-SHUFFLE discovery: per-block pc.unique partials unioned
        # on the driver — Dataset.unique's aggregate exchange costs
        # ~3.5 s fixed all-to-all coordination for a result this op
        # caps at max_pivot values anyway
        def distinct_part(t: pa.Table) -> pa.Table:
            c = t[pivot_col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            u = pc.unique(c)
            # cap the partial (a block over the limit proves overflow
            # with max_pivot+1 values); the AUTHORITATIVE ValueError is
            # raised on the driver so callers catch a plain exception,
            # not a RayTaskError wrapper
            return pa.table({pivot_col: u.slice(0, max_pivot + 1)})

        parts = ds.select_columns([pivot_col]).map_batches(
            distinct_part, batch_format="pyarrow").to_pandas()
        vals = set(parts[pivot_col]) if len(parts) else set()
        if len(vals) > max_pivot:
            raise ValueError(
                f"{pivot_col} has {len(vals)} distinct values "
                f"(max_pivot={max_pivot}); pass pivot_values=... to pin "
                "the columns you want")
        pivot_values = sorted(vals)
    names = [f"{pivot_col}_{v}" for v in pivot_values]

    def indicators(t: pa.Table) -> pa.Table:
        pv = t[pivot_col]
        cols = {group_col: t[group_col]}
        base = pc.cast(t[value_col], pa.float64()) if value_col else None
        for v, name in zip(pivot_values, names):
            m = pc.equal(pv, v)
            if value_col:
                cols[name] = pc.if_else(m, base, pa.scalar(0.0))
            else:
                cols[name] = pc.cast(m, pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum
    aggs = [Sum(n, alias_name=n) for n in names]
    return ds.map_batches(indicators, batch_format="pyarrow") \
        .groupby(group_col).aggregate(*aggs)


def _sentinel_array(n: int, typ: pa.DataType) -> pa.Array:
    """A constant placeholder column of ``typ`` (value is irrelevant: the
    ``grouping`` bitmask rides in the shuffle key, so sentinel cells can
    only ever merge with other sentinel cells of the same level)."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, type=typ)
    if pa.types.is_date32(typ):
        # date32 casts from int32 (days), not int64
        return pa.array(np.zeros(n, dtype=np.int32)).cast(typ)
    return pc.cast(pa.array(np.zeros(n, dtype=np.int64)), typ)


def rollup_agg(ds: Dataset, group_cols: Sequence[str], value_col: str,
               out_count: str = "n_rows",
               out_sum: str | None = None,
               mode: str = "rollup",
               sets: Sequence[Sequence[str]] | None = None) -> Dataset:
    """SQL ``GROUP BY ROLLUP(c1, .., ck)`` (``mode="rollup"``: every
    prefix level — (c1..ck), (c1..ck-1), .., ()), ``GROUP BY
    CUBE(c1, .., ck)`` (``mode="cube"``: all 2^k column subsets) or
    ``GROUP BY GROUPING SETS(...)`` (``mode="sets"``: exactly the
    subsets listed in ``sets`` — distinct; duplicate sets raise since
    the merged exchange cannot emit a level twice):
    count + sum of ``value_col`` per level.
    Output columns: ``group_cols`` (rolled-up cells are NULL, as in SQL),
    ``grouping`` (the ``GROUPING(c1..ck)`` bitmask: bit j set when column
    k-1-j is rolled up), ``out_count``, ``out_sum``.

    Distributed as the partial-aggregate pattern: each map task collapses
    its batch with one Arrow hash-aggregate per level so the ONE
    shuffle moves a few partial rows per (group, level), never raw rows.
    Rolled-up key cells travel as typed sentinels because the
    ``grouping`` bitmask is part of the shuffle key — levels can never
    merge — and are restored to NULL after the final aggregate."""
    gcols = list(group_cols)
    out_sum = out_sum or f"{value_col}_sum"
    k = len(gcols)
    if k == 0:
        raise ValueError("rollup_agg needs at least one group column")
    if mode == "rollup":
        masks = [(1 << (k - lvl)) - 1 for lvl in range(k, -1, -1)]
    elif mode == "cube":
        masks = list(range(1 << k))
    elif mode == "sets":
        if not sets:
            raise ValueError("mode='sets' needs a non-empty `sets`")
        masks = []
        for s in sets:
            unknown = set(s) - set(gcols)
            if unknown:
                raise ValueError(f"unknown grouping-set columns "
                                 f"{sorted(unknown)}")
            masks.append(sum(1 << (k - 1 - j)
                             for j, c in enumerate(gcols)
                             if c not in set(s)))
        if len(set(masks)) != len(masks):
            raise ValueError("duplicate grouping sets")
    else:
        raise ValueError(f"unknown mode {mode!r}")

    def partial(t: pa.Table) -> pa.Table:
        base = t.select([*gcols, value_col])
        gtypes = {c: base.schema.field(c).type for c in gcols}
        # SQL count(*) semantics at every level: count ALL rows, not
        # non-null value cells (a ones column keeps keyed and grand-
        # total levels consistent when value_col has nulls)
        base = base.append_column(
            "__ones", pa.array(np.ones(len(base), dtype=np.int64)))
        levels = []
        for mask in masks:
            keys = [c for j, c in enumerate(gcols)
                    if not mask & (1 << (k - 1 - j))]
            if keys:
                g = base.group_by(keys).aggregate([
                    (value_col, "sum"), ("__ones", "sum")])
                g = g.rename_columns([*keys, "__s", "__c"])
            else:
                g = pa.table({
                    "__s": pa.array([pc.sum(base[value_col]).as_py()],
                                    type=pa.float64()),
                    "__c": pa.array([len(base)], type=pa.int64()),
                })
            cols = {}
            for c in gcols:
                cols[c] = (g[c] if c in g.column_names
                           else _sentinel_array(len(g), gtypes[c]))
            cols["grouping"] = pa.array(
                np.full(len(g), mask, dtype=np.int64))
            cols["__s"] = pc.cast(g["__s"], pa.float64())
            cols["__c"] = pc.cast(g["__c"], pa.int64())
            levels.append(pa.table(cols))
        return pa.concat_tables(levels)

    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([*gcols, "grouping"]) \
        .aggregate(Sum("__c", alias_name=out_count),
                   Sum("__s", alias_name=out_sum))

    def restore_nulls(t: pa.Table) -> pa.Table:
        grp = t["grouping"].to_numpy(zero_copy_only=False)
        for j, c in enumerate(gcols):
            rolled = (grp & (1 << (k - 1 - j))) != 0
            if rolled.any():
                col = t[c].combine_chunks() if isinstance(
                    t[c], pa.ChunkedArray) else t[c]
                nulled = pc.if_else(pa.array(rolled),
                                    pa.nulls(len(t), type=col.type), col)
                t = t.set_column(t.column_names.index(c),
                                 pa.field(c, col.type), nulled)
        return t

    return agg.map_batches(restore_nulls, batch_format="pyarrow")


def explode_column(ds: Dataset, list_col: str, out_col: str | None = None,
                   index_col: str | None = "pos") -> Dataset:
    """UNNEST WITH ORDINALITY: one output row per list element, scalar
    columns repeated, plus a 1-based ``index_col`` position. Null/empty
    lists emit no rows (SQL unnest semantics). Fully vectorized:
    ``flatten`` + ``np.repeat`` of the parent row indices — no Python
    loop over rows; runs per batch, so it never shuffles."""
    out_col = out_col or list_col

    def fn(t: pa.Table) -> pa.Table:
        lst = t[list_col]
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        rep = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), lens))
        cols = {}
        for name in t.column_names:
            if name == list_col:
                continue
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[name] = col.take(rep)
        # flatten() skips null lists, matching the lens accounting
        cols[out_col] = lst.flatten()
        if index_col:
            starts = np.zeros(len(t) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            pos = np.arange(int(starts[-1]), dtype=np.int64) - \
                np.repeat(starts[:-1], lens) + 1
            cols[index_col] = pa.array(pos)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def unpivot(ds: Dataset, id_cols: Sequence[str],
            value_cols: Sequence[str], var_name: str = "variable",
            value_name: str = "value") -> Dataset:
    """Wide→long reshape (SQL ``UNPIVOT`` / pandas ``melt``): each input
    row emits one output row per ``value_cols`` entry, carrying
    ``id_cols``, the source column's name (``var_name``) and its value
    (``value_name``). Pure ``map_batches`` — zero shuffle; the inverse
    of the pivot in ``pipelines/queries.events_pivot_by_user``.

    Value columns are cast to a common type (their shared type, else
    float64 for mixed numerics)."""
    schema = ds.schema().base_schema
    vtypes = [schema.field(c).type for c in value_cols]
    common = vtypes[0] if all(t == vtypes[0] for t in vtypes) \
        else pa.float64()

    def fn(batch: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            t = batch.select(list(id_cols))
            t = t.append_column(var_name, pa.array(
                np.full(len(batch), c, dtype=object), type=pa.string()))
            t = t.append_column(value_name, batch[c].cast(common))
            pieces.append(t)
        return pa.concat_tables(pieces)

    return ds.map_batches(fn, batch_format="pyarrow")


def group_entropy(ds: Dataset, group_col: str, label_col: str,
                  out_col: str = "entropy",
                  num_buckets: int = 32) -> Dataset:
    """Shannon entropy (nats) of each group's label distribution —
    a distribution-shape feature (e.g. how varied a user's event mix
    is). Map-side partial (group, label) counts per block (Arrow
    ``group_by``), ONE exchange of the aggregated rows (never the
    data), then vectorized segmented entropy per bucket. Returns
    (group, ``out_col``, ``n_rows``)."""
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, label_col]) \
            .group_by([group_col, label_col]) \
            .aggregate([(label_col, "count")])
        return g.rename_columns([group_col, label_col, "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from .partition import entity_group_starts, sort_table

    def ent(tbl: pa.Table) -> pa.Table:
        # merge per-block partials, then entropy per group
        tbl = tbl.group_by([group_col, label_col]) \
            .aggregate([("n", "sum")]) \
            .rename_columns([group_col, label_col, "n"])
        tbl = sort_table(tbl, [group_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.add.reduceat(n, starts)
        p = n / tot[run_id]
        terms = np.where(p > 0, -p * np.log(p), 0.0)
        h = np.add.reduceat(terms, starts)
        groups = tbl[group_col].take(pa.array(starts.astype(np.int64)))
        return pa.table({group_col: groups,
                         out_col: pa.array(h),
                         "n_rows": pa.array(tot.astype(np.int64))})

    from .window import bucketed_apply
    return bucketed_apply(partials, group_col, ent,
                          num_buckets=num_buckets, drop_bucket=False)


def snapshot_diff(old: Dataset, new: Dataset, key_col: str,
                  value_cols: Sequence[str],
                  num_buckets: int = 32) -> Dataset:
    """Change-data capture between two snapshots keyed by ``key_col``:
    one row per key that was ``added`` (new only), ``removed`` (old
    only) or ``changed`` (present in both, any ``value_cols`` differ —
    SQL ``IS DISTINCT FROM``, nulls equal). Tagged union, ONE bucketed
    exchange, vectorized searchsorted key alignment per bucket.
    Returns (key, change). Keys must be unique within each snapshot."""
    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            tbl = tbl.select([key_col, *value_cols])
            return tbl.append_column(
                "__side", pa.array(np.full(len(tbl), side, dtype=np.int8)))
        return fn

    tagged = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def diff(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        ot = tbl.filter(pa.array(side == 0))
        nt = tbl.filter(pa.array(side == 1))
        ok = ot[key_col].to_numpy(zero_copy_only=False)
        nk = nt[key_col].to_numpy(zero_copy_only=False)
        oi, ni = np.argsort(ok, kind="stable"), np.argsort(nk, kind="stable")
        ok, nk = ok[oi], nk[ni]
        ot, nt = ot.take(pa.array(oi)), nt.take(pa.array(ni))
        pos = np.searchsorted(nk, ok)
        in_new = np.zeros(len(ok), dtype=bool)
        valid = pos < len(nk)
        in_new[valid] = nk[pos[valid]] == ok[valid]
        removed = ok[~in_new]
        pos2 = np.searchsorted(ok, nk)
        in_old = np.zeros(len(nk), dtype=bool)
        valid2 = pos2 < len(ok)
        in_old[valid2] = ok[pos2[valid2]] == nk[valid2]
        added = nk[~in_old]
        # matched pairs: old row i ↔ new row pos[i]
        om = np.flatnonzero(in_new)
        nm = pos[om]
        changed_mask = np.zeros(len(om), dtype=bool)
        for c in value_cols:
            a = ot[c].take(pa.array(om))
            b = nt[c].take(pa.array(nm))
            eq = pc.equal(a, b)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            # or_kleene: (null == null) must win over the null from equal()
            eq = pc.fill_null(pc.or_kleene(eq, both_null), False)
            changed_mask |= ~eq.to_numpy(zero_copy_only=False)
        changed = ok[om][changed_mask]
        keys = np.concatenate([added, removed, changed])
        labels = (["added"] * len(added) + ["removed"] * len(removed) +
                  ["changed"] * len(changed))
        key_arr = pa.array(keys, type=tbl.schema.field(key_col).type) \
            if len(keys) else pa.array([], type=tbl.schema.field(key_col).type)
        return pa.table({key_col: key_arr,
                         "change": pa.array(labels, type=pa.string())})

    from .window import bucketed_apply
    return bucketed_apply(tagged, key_col, diff,
                          num_buckets=num_buckets, drop_bucket=False)


def set_ops(a: Dataset, b: Dataset, key_cols: Sequence[str],
            ops: Sequence[str] = ("intersect", "except_a", "except_b"),
            op_col: str = "op") -> Dataset:
    """Distinct set algebra over key tuples (SQL ``INTERSECT`` /
    ``EXCEPT`` / reverse ``EXCEPT``), all requested ops from ONE
    aggregate pass.

    The at-scale shape: each map task collapses its block to distinct
    key tuples with per-side presence flags (Arrow hash aggregate), a
    single Dataset ``groupby`` merges the flags with ``max`` — the
    exchange moves distinct keys, never raw rows — and a final stateless
    map emits one tagged row per (key, op) membership. No driver
    materialization; adding ops costs nothing beyond the output rows.
    """
    valid = {"intersect", "except_a", "except_b"}
    if not set(ops) <= valid:
        raise ValueError(f"ops must be a subset of {sorted(valid)}")
    key_cols = list(key_cols)

    def flag(side: str):
        def fn(tbl: pa.Table) -> pa.Table:
            t = tbl.select(key_cols)
            agg = t.group_by(key_cols).aggregate([([], "count_all")])
            n = len(agg)
            agg = agg.drop_columns(["count_all"])
            # fixed column ORDER on both branches — unioned blocks must
            # agree positionally, not just by name
            for c in ("_in_a", "_in_b"):
                v = np.ones(n, np.int8) if c == side else np.zeros(n, np.int8)
                agg = agg.append_column(c, pa.array(v))
            return agg
        return fn

    from ray.data.aggregate import Max

    tagged = a.map_batches(flag("_in_a"), batch_format="pyarrow").union(
        b.map_batches(flag("_in_b"), batch_format="pyarrow"))
    merged = tagged.groupby(key_cols).aggregate(
        Max("_in_a", alias_name="_in_a"), Max("_in_b", alias_name="_in_b"))

    def emit(tbl: pa.Table) -> pa.Table:
        ia = tbl["_in_a"].to_numpy(zero_copy_only=False).astype(bool)
        ib = tbl["_in_b"].to_numpy(zero_copy_only=False).astype(bool)
        masks = {"intersect": ia & ib, "except_a": ia & ~ib,
                 "except_b": ib & ~ia}
        keys = tbl.select(key_cols)
        parts, labels = [], []
        for op in ops:
            m = masks[op]
            if m.any():
                parts.append(keys.filter(pa.array(m)))
                labels.extend([op] * int(m.sum()))
        if not parts:
            cols = {op_col: pa.array([], type=pa.string())}
            for c in key_cols:
                cols[c] = pa.array([], type=tbl.schema.field(c).type)
            return pa.table(cols)
        out = pa.concat_tables(parts)
        return out.add_column(0, op_col, pa.array(labels, type=pa.string()))

    return merged.map_batches(emit, batch_format="pyarrow")


def extract_json_field(ds: Dataset, col: str, field: str,
                       out_col: str | None = None,
                       out_type: pa.DataType | None = None) -> Dataset:
    """Extract one scalar field from a flat-JSON string column — the
    semi-structured payload pattern (event ``props``, API blobs).

    Zero shuffle, fully vectorized: Arrow's RE2 ``extract_regex`` pulls
    the field value (quoted-string or bare number/bool/null), unescapes
    nothing (flat scalar fields only — nested objects/arrays and escaped
    quotes are out of scope; route those payloads through a parser in an
    actor-pool stage instead), and casts to ``out_type``. Missing field,
    JSON null, or a failed cast all yield null (SQL
    ``TRY_CAST(j->>'f')`` semantics).
    """
    out_col = out_col or field
    import re as _re
    f = _re.escape(field)
    # two mutually-exclusive passes (quoted vs bare): Arrow's
    # extract_regex reports a non-participating alternation group as ""
    # rather than null, which would swallow bare-number matches
    pat_q = r'"' + f + r'"\s*:\s*"(?P<q>[^"\\]*)"'
    pat_b = (r'"' + f + r'"\s*:\s*'
             r'(?P<b>-?[0-9][0-9.eE+-]*|true|false|null)')

    def fn(t: pa.Table) -> pa.Table:
        s = t[col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.cast(s, pa.string())
        quoted = pc.struct_field(pc.extract_regex(s, pattern=pat_q), "q")
        bare = pc.struct_field(pc.extract_regex(s, pattern=pat_b), "b")
        # JSON null → SQL NULL (not the string "null")
        bare = pc.if_else(pc.equal(bare, pa.scalar("null")),
                          pa.scalar(None, type=pa.string()), bare)
        val = pc.coalesce(quoted, bare)
        if out_type is not None and not pa.types.is_string(out_type):
            val = pc.cast(val, out_type, safe=False)
        return t.append_column(out_col, val)

    return ds.map_batches(fn, batch_format="pyarrow")


def validate_rules(ds: Dataset, rules) -> Dataset:
    """Data-quality assertion pass: count violations of named row-level
    rules in ONE streaming map (zero shuffle — per-block violation
    counts are summed by a tiny aggregate of ``len(rules)``-row
    partials). ``rules`` is a sequence of ``(name, fn)`` where ``fn``
    maps an Arrow table to a BOOLEAN array that is True when the row
    VIOLATES the rule (nulls count as violations — SQL
    ``coalesce(NOT ok, TRUE)`` semantics). Returns
    ``(rule, n_violations, n_rows)``."""
    from ray.data.aggregate import Sum
    rules = list(rules)
    names = [n for n, _ in rules]

    def partial(t: pa.Table) -> pa.Table:
        counts = []
        for _, fn in rules:
            bad = fn(t)
            if isinstance(bad, pa.ChunkedArray):
                bad = bad.combine_chunks()
            bad = pc.fill_null(bad, True)
            counts.append(int(pc.sum(pc.cast(bad, pa.int64())).as_py()
                              or 0))
        return pa.table({"rule": pa.array(names),
                         "n_violations": pa.array(counts,
                                                  type=pa.int64()),
                         "n_rows": pa.array([len(t)] * len(rules),
                                            type=pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("rule").aggregate(
            Sum("n_violations", alias_name="n_violations"),
            Sum("n_rows", alias_name="n_rows"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "rule": t["rule"],
            "n_violations": pc.cast(t["n_violations"], pa.int64()),
            "n_rows": pc.cast(t["n_rows"], pa.int64())})

    return out.map_batches(finalize, batch_format="pyarrow")


def anti_join(left: Dataset, right: Dataset, *, left_key: str,
              right_key: str, num_buckets: int = 32) -> Dataset:
    """Distributed anti-join: keep ``left`` rows whose key has NO match
    in ``right`` (SQL ``WHERE NOT EXISTS``). Unlike the broadcast
    :func:`semi_join`\\ ``(anti=True)``, this never ships the right key
    set to the driver: the right side collapses to per-block DISTINCT
    keys carrying an int8 marker, and one ``attach_values`` exchange
    (tagged union + bucketed searchsorted probe) attaches the marker to
    left rows — survivors are the rows where it stayed null. Use this
    when the right key set is too large to broadcast; one all-to-all
    total, the exchange moves distinct right keys + left rows once.
    """
    from .cc import attach_values

    def distinct_keys(t: pa.Table) -> pa.Table:
        g = pa.table({right_key: t[right_key]}).group_by(
            [right_key]).aggregate([])
        return g.append_column(
            "__hit", pa.array(np.ones(len(g), dtype=np.int8)))

    marks = right.select_columns([right_key]).map_batches(
        distinct_keys, batch_format="pyarrow")
    tagged = attach_values(left, left_key, marks, right_key, ["__hit"],
                           how="left", num_buckets=num_buckets,
                           dup="first")

    def keep_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["__hit"])).drop_columns(["__hit"])

    return tagged.map_batches(keep_unmatched, batch_format="pyarrow")


def cohort_retention(ds: Dataset, entity_col: str, ts_col: str,
                     freq: str = "month",
                     num_buckets: int = 64) -> Dataset:
    """Cohort retention matrix: entities are cohorted by their first
    active period (``freq`` ∈ {"month", "day"}); output is one row per
    ``(cohort, offset)`` with the distinct-entity count active that
    many periods after the cohort period. Month cohorts emit
    ``cohort_ym`` = year·100+month, day cohorts ``cohort_day`` = epoch
    days — integer witnesses, no date-type transport. The classic
    product-analytics rollup.

    Plan: per-batch DISTINCT (entity, period) pre-aggregation (packed
    int64 ``np.unique`` — shrinks the exchange to ≤ one row per entity
    per period per batch) → ONE bucketed exchange by entity (cohort =
    first period of the sorted unique run, offsets and cell counts fall
    out of two more packed uniques) → a tiny ``groupby().sum()`` over
    ≤ cohorts×offsets partial rows. Assumes period indexes < 100000
    (month: 83 centuries; day: until 2243) and offsets < 1000."""
    from ray.data.aggregate import Sum
    from .window import bucketed_apply
    if freq not in ("month", "day"):
        raise ValueError(f"freq must be 'month' or 'day', got {freq!r}")

    def distinct_pairs(t: pa.Table) -> pa.Table:
        u = t[entity_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if freq == "month":
            y = pc.year(t[ts_col]).to_numpy(zero_copy_only=False)
            m = pc.month(t[ts_col]).to_numpy(zero_copy_only=False)
            mi = y.astype(np.int64) * 12 + (m.astype(np.int64) - 1)
        else:
            us = pc.cast(t[ts_col], pa.int64()).to_numpy(
                zero_copy_only=False)
            mi = us // 86_400_000_000
        ku = np.unique(u * 100000 + mi)
        return pa.table({entity_col: pa.array(ku // 100000),
                         "mi": pa.array(ku % 100000)})

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[entity_col].to_numpy(zero_copy_only=False)
        mi = t["mi"].to_numpy(zero_copy_only=False)
        ku = np.unique(u * 100000 + mi)
        uu, mm = ku // 100000, ku % 100000
        new = np.r_[True, uu[1:] != uu[:-1]] if len(uu) else \
            np.zeros(0, dtype=bool)
        # cohort month = first (= min) month of each sorted unique run
        cmi = mm[np.flatnonzero(new)][np.cumsum(new) - 1] if len(uu) \
            else mm
        k2, cnt = np.unique(cmi * 1000 + (mm - cmi), return_counts=True)
        return pa.table({"cmi": pa.array(k2 // 1000),
                         "month_offset": pa.array(k2 % 1000),
                         "n": pa.array(cnt.astype(np.int64))})

    partials = bucketed_apply(pairs, entity_col, per_bucket, num_buckets,
                              drop_bucket=False)
    out = partials.groupby(["cmi", "month_offset"]).aggregate(
        Sum("n", alias_name="n_users"))

    def finish(t: pa.Table) -> pa.Table:
        cmi = t["cmi"].to_numpy(zero_copy_only=False)
        if freq == "month":
            cohort = ((cmi // 12) * 100 + (cmi % 12) + 1).astype(np.int64)
            names = ("cohort_ym", "month_offset")
        else:
            cohort = cmi.astype(np.int64)
            names = ("cohort_day", "day_offset")
        return pa.table({names[0]: pa.array(cohort),
                         names[1]: pc.cast(t["month_offset"],
                                           pa.int64()),
                         "n_users": pc.cast(t["n_users"], pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def apply_changes(base: Dataset, changes: Dataset, key_col: str,
                  op_col: str = "op",
                  num_buckets: int = 32) -> Dataset:
    """MERGE / CDC-apply: fold a changeset into a snapshot. Each change
    row carries ``op_col`` ∈ {'I', 'U', 'D'} — 'I'/'U' upsert the
    change row's columns for that key (insert-if-absent and update
    share a code path), 'D' drops the key. Base rows whose key has no
    change pass through bit-safe. The inverse of ``snapshot_diff``:
    ``apply_changes(old, diff-as-changes) == new``.

    Tagged union, ONE bucketed exchange, searchsorted key alignment
    per bucket — no driver materialization. Keys must be unique within
    each input (at most one change per key; duplicates raise)."""
    base_cols = [c for c in base.schema().names]
    if key_col not in base_cols:
        raise ValueError(f"{key_col!r} not in base schema")

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            if side == 0:
                tbl = tbl.select(base_cols)
                opv = pa.nulls(len(tbl), pa.string())
            else:
                opv = tbl[op_col]
                if isinstance(opv, pa.ChunkedArray):
                    opv = opv.combine_chunks()
                opv = opv.cast(pa.string())
                tbl = tbl.select(base_cols)
            return tbl.append_column("__op", opv).append_column(
                "__side", pa.array(np.full(len(tbl), side, dtype=np.int8)))
        return fn

    tagged = base.map_batches(tag(0), batch_format="pyarrow").union(
        changes.map_batches(tag(1), batch_format="pyarrow"))

    def apply_fn(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        bt = tbl.filter(pa.array(side == 0))
        ct = tbl.filter(pa.array(side == 1))
        ck = ct[key_col].to_numpy(zero_copy_only=False)
        ci = np.argsort(ck, kind="stable")
        ck = ck[ci]
        if len(ck) > 1 and (ck[1:] == ck[:-1]).any():
            raise ValueError("duplicate change rows for a key")
        ct = ct.take(pa.array(ci))
        bk = bt[key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck, bk)
        changed = np.zeros(len(bk), dtype=bool)
        valid = pos < len(ck)
        changed[valid] = ck[pos[valid]] == bk[valid]
        keep_base = bt.filter(pa.array(~changed)).select(base_cols)
        ops = ct["__op"].to_numpy(zero_copy_only=False)
        keep_change = ct.filter(pa.array(ops != "D")).select(base_cols)
        return pa.concat_tables([keep_base, keep_change])

    from .window import bucketed_apply
    return bucketed_apply(tagged, key_col, apply_fn, num_buckets,
                          drop_bucket=False)


def snapshot_at(changes: Dataset, key_col: str, ts_col: str,
                as_of, op_col: str = "op",
                num_buckets: int = 32) -> Dataset:
    """Point-in-time snapshot reconstruction from a CDC log: for every
    key, the LAST change at-or-before ``as_of`` wins ('I'/'U' rows
    materialize, 'D' means the key did not exist at that time; later
    changes are invisible). Completes the CDC family next to
    ``snapshot_diff`` (state → changes) and ``apply_changes``
    (state + changes → state). ONE bucketed exchange by key; the
    per-bucket kernel is a (key, ts) sort + run-tail pick. Ties on ts
    within a key break by log order of ``op`` ascending — give the log
    a unique sequence column as ``ts_col`` for total determinism."""
    from .partition import sort_table

    def fn(tbl: pa.Table) -> pa.Table:
        flt = tbl.filter(pc.less_equal(
            tbl[ts_col], pa.scalar(as_of, type=tbl.schema.field(
                ts_col).type)))
        if len(flt) == 0:
            return flt.drop_columns([op_col]) if op_col in \
                flt.column_names else flt
        flt = sort_table(flt, [key_col, ts_col])
        k = flt[key_col].to_numpy(zero_copy_only=False)
        last = np.flatnonzero(np.r_[k[1:] != k[:-1], True])
        head = flt.take(pa.array(last.astype(np.int64)))
        ops = head[op_col].to_numpy(zero_copy_only=False)
        return head.filter(pa.array(ops != "D")).drop_columns([op_col])

    from .window import bucketed_apply
    return bucketed_apply(changes, key_col, fn, num_buckets)


def golden_record(ds: Dataset, key_col: str,
                  order_cols: Sequence[str],
                  value_cols: Sequence[str],
                  num_buckets: int = 32) -> Dataset:
    """Master-data golden record: collapse each key to ONE row where
    every value column independently takes its LAST NON-NULL value in
    ``order_cols`` order (different columns may come from different
    source rows — the survivorship rule record consolidation uses);
    a column with no non-null value stays null. ONE bucketed
    exchange; per column the kernel is one reversed validity argmax
    over sorted runs — no per-row Python."""
    from .window import bucketed_apply, _sorted_with_starts

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, key_col, list(order_cols))
        n = len(tbl)
        key = tbl[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        starts = np.flatnonzero(ng) if n else np.zeros(0, np.int64)
        run_id = np.cumsum(ng) - 1 if n else np.zeros(0, np.int64)
        out = {key_col: key.take(pa.array(starts.astype(np.int64)))}
        if n:
            run_start = starts[run_id]
        for c in value_cols:
            col = tbl[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if n == 0:
                out[c] = col.slice(0, 0)
                continue
            valid = ~np.asarray(pc.is_null(col).to_numpy(
                zero_copy_only=False))
            idx = np.arange(n)
            # last valid index at-or-before each row, reset per run
            lastg = np.maximum.accumulate(np.where(valid, idx, -1))
            last = np.where(lastg >= run_start, lastg, -1)
            pick = last[np.r_[starts[1:] - 1, n - 1]]   # at run ends
            take = pa.array([int(p) if p >= 0 else None for p in pick],
                            type=pa.int64())
            out[c] = col.take(take)
        return pa.table(out)

    return bucketed_apply(ds, key_col, fn, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# general partitioned equi-join (many-to-many fan-out)
# ---------------------------------------------------------------------------

def detect_hot_keys(ds: Dataset, key_col: str, num_buckets: int,
                    factor: float = 4.0, k: int = 64) -> set:
    """Skew pre-pass for :func:`hash_join`'s auto-salt mode: one
    Misra-Gries heavy-hitters scan over the key column (≤ ``k``
    counters per block to the driver, never the key multiset) plus a
    row count; a key is HOT when even its MG UNDERestimate exceeds
    ``factor ×`` a bucket's fair share ``n / num_buckets`` — i.e. the
    key alone would make its bucket ≥ ``factor``× the average. Returns
    the (possibly empty) hot-key set typed like the column (int or
    str); float keys are rejected (hash-partitioning float keys is a
    design smell)."""
    from .sketches import heavy_hitters

    kt = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    if not (pa.types.is_integer(kt) or pa.types.is_string(kt)
            or pa.types.is_large_string(kt)):
        raise ValueError(f"auto-salt needs int/string keys, got {kt}")
    proj = ds.select_columns([key_col]).materialize()
    n = proj.count()
    if n == 0:
        return set()
    hh, _err = heavy_hitters(proj, key_col, k=k)
    hh = hh[hh["value"].notna()]
    cut = factor * n / num_buckets
    hot = hh.loc[hh["count"] > cut, "value"]
    return {int(v) for v in hot} if pa.types.is_integer(kt) \
        else set(hot)


def hash_join(left: Dataset, right: Dataset, *, left_key: str,
              right_key: str, how: str = "inner",
              right_cols: Sequence[str] | None = None,
              rename=None, num_buckets: int = 32,
              hot_keys=None, salt_factor: int = 8) -> Dataset:
    """Distributed general equi-join with full M:N fan-out — the
    big-×-big sibling of :func:`broadcast_join` (small side on the
    driver) and :func:`~..stages.cc.attach_values` (right side
    deduplicated to one row per key).

    Both sides are tagged into one unified schema, hash-bucketed by the
    key and unioned — ONE all-to-all exchange total. Per bucket the key
    column is dictionary-encoded once and every key's left-run × right-
    run cross product is emitted by the vectorized run-pair kernel
    (``editdist._cross_join_runs`` — pure index arithmetic, no Python
    rows). ``how`` ∈ {"inner", "left", "right", "full"}; unmatched rows
    pass through as pure ``take`` slices of the unified table (their
    other side's columns are already null there), with the join key
    coalesced into ``left_key`` (SQL ``COALESCE(l.k, r.k)``). Null keys
    never match (SQL semantics) and surface only under outer variants.

    Output columns: every ``left`` column, then ``right_cols`` (default:
    all right columns except ``right_key``), renamed via ``rename`` or
    auto-suffixed ``_r`` on collision with a left name.

    Skew: pass ``hot_keys`` (a set of key values) to salt — hot LEFT
    rows scatter over ``salt_factor`` dedicated buckets per hot key
    (batch-position round-robin) while hot RIGHT rows replicate into
    each, so no single task holds a hot key's full fan-in. Replication
    makes unmatched-RIGHT accounting ambiguous, so salting is limited
    to ``how`` ∈ {"inner", "left"}. The emitted row multiset is
    identical with or without salting. ``hot_keys="auto"`` runs
    :func:`detect_hot_keys` over the LEFT key first (one extra pass —
    a Misra-Gries scan, never the key multiset to the driver); the
    scheme fixes probe-side skew, so put the skewed side on the LEFT
    (a key hot on the RIGHT would replicate, making it worse — swap
    the roles instead).

    Partitioning assumption: one hash bucket of BOTH sides' rows (and
    its matched cross product) fits a task heap; raise ``num_buckets``
    (and salt known hot keys) for bigger inputs. The 100-TB shape:
    output is written straight back out per bucket — nothing
    driver-side.

    Why not ``Dataset.join``? Ray 2.49's native hash-shuffle join runs
    through aggregator actors whose spin-up dominates locally (measured
    9.3–21.4 s vs 2.4–3.8 s here for the same sf0.1 lineitem⋈orders;
    CLAUDE.md's HASH_SHUFFLE note), and it offers no hot-key salting.
    For repeatedly-joined sorted layouts, skip the exchange entirely —
    ``sources.writers.zonemapped_merge_join`` (0.08–0.12 s same join).
    """
    from .editdist import _cross_join_runs
    from .partition import BUCKET_COL, stable_bucket
    _SIDE = "__join_side"

    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unknown how {how!r}")
    if hot_keys and how not in ("inner", "left"):
        raise ValueError("hot-key salting supports how='inner'/'left' only")

    ls = left.schema()
    if ls is None:
        left = left.materialize()
        ls = left.schema()
    rs = right.schema()
    if rs is None:
        right = right.materialize()
        rs = right.schema()
    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError(f"unknown hot_keys mode {hot_keys!r}")
        hot_keys = detect_hot_keys(left, left_key, num_buckets)
    left_names = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    if right_cols is None:
        right_cols = [c for c in rs.names if c != right_key]
    rename = dict(rename or {})
    out_right = []
    for c in right_cols:
        out = rename.get(c, c)
        if c not in rename and out in left_names:
            out = out + "_r"      # auto-suffix default names only
        if out in left_names or out in out_right:
            raise ValueError(f"output column collision on {out!r}")
        out_right.append(out)
    right_fields = [pa.field(o, rtypes[c])
                    for c, o in zip(right_cols, out_right)]
    key_type = ltypes[left_key]
    out_names = left_names + out_right

    hot_list = sorted(hot_keys) if hot_keys else None
    n_extra = len(hot_list) * salt_factor if hot_list else 0

    def _buckets(key_arr: pa.Array, replicate: bool):
        """(bucket ids, row indices) — hot keys map into the dedicated
        salted range; ``replicate`` (build side) emits every salt."""
        base = stable_bucket(key_arr, num_buckets)
        if not hot_list:
            return base, None
        hidx = pc.index_in(key_arr, value_set=pa.array(
            hot_list, type=key_arr.type))
        hnp = hidx.to_numpy(zero_copy_only=False)
        hot = ~np.isnan(hnp.astype(np.float64)) if hnp.dtype != object \
            else np.array([v is not None for v in hnp])
        hi = np.where(hot, np.nan_to_num(
            hnp.astype(np.float64)).astype(np.int64), 0)
        if not replicate:
            salt = np.arange(len(base), dtype=np.int64) % salt_factor
            b = np.where(hot, num_buckets + hi * salt_factor + salt,
                         base).astype(np.int32)
            return b, None
        # build side: non-hot rows once, hot rows once per salt
        cold_rows = np.flatnonzero(~hot)
        hot_rows = np.flatnonzero(hot)
        idx = np.r_[cold_rows, np.repeat(hot_rows, salt_factor)]
        salts = np.tile(np.arange(salt_factor, dtype=np.int64),
                        len(hot_rows))
        b = np.r_[base[cold_rows],
                  (num_buckets + hi[hot_rows].repeat(salt_factor)
                   * salt_factor + salts)].astype(np.int32)
        return b, idx

    def tag_left(tbl: pa.Table) -> pa.Table:
        key = tbl[left_key]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        b, _ = _buckets(key, replicate=False)
        tbl = tbl.append_column(_SIDE, pa.array(
            np.zeros(len(tbl), dtype=np.int8)))
        for f in right_fields:
            tbl = tbl.append_column(f.name, pa.nulls(len(tbl), f.type))
        return tbl.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    def tag_right(tbl: pa.Table) -> pa.Table:
        key = tbl[right_key].cast(key_type)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        b, idx = _buckets(key, replicate=True)
        if idx is not None:
            tbl = tbl.take(pa.array(idx.astype(np.int64)))
            key = key.take(pa.array(idx.astype(np.int64)))
        n = len(tbl)
        cols = {}
        for name in left_names:
            cols[name] = key if name == left_key else pa.nulls(
                n, ltypes[name])
        cols[_SIDE] = pa.array(np.ones(n, dtype=np.int8))
        for c, o in zip(right_cols, out_right):
            cols[o] = tbl[c]
        cols[BUCKET_COL] = pa.array(b, pa.int32())
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns(
        list(dict.fromkeys([right_key, *right_cols]))).map_batches(
        tag_right, batch_format="pyarrow")
    unioned = lt.union(rt)

    def join_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        key = tbl[left_key]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        de = key.dictionary_encode()
        codes = pc.fill_null(de.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        cl, cr = codes[li], codes[ri]
        vl, vr = cl >= 0, cr >= 0
        ai, bi = _cross_join_runs(cl[vl], li[vl], cr[vr], ri[vr])
        cols = {c: (tbl[c].combine_chunks() if isinstance(
            tbl[c], pa.ChunkedArray) else tbl[c]) for c in out_names}
        a_idx = pa.array(ai.astype(np.int64))
        b_idx = pa.array(bi.astype(np.int64))
        out = {c: cols[c].take(a_idx) for c in left_names}
        out.update({c: cols[c].take(b_idx) for c in out_right})
        pieces = [pa.table(out)]
        if how in ("left", "full") or how == "right":
            common = np.intersect1d(np.unique(cl[vl]), np.unique(cr[vr]))
        if how in ("left", "full"):
            un = li[~(vl & np.isin(cl, common))]
            pieces.append(tbl.select(out_names).take(
                pa.array(un.astype(np.int64))))
        if how in ("right", "full"):
            un = ri[~(vr & np.isin(cr, common))]
            pieces.append(tbl.select(out_names).take(
                pa.array(un.astype(np.int64))))
        return pa.concat_tables(pieces).combine_chunks()

    return unioned.groupby(BUCKET_COL).map_groups(
        join_bucket, batch_format="pyarrow")


def range_lookup_join(facts: Dataset, ranges: Dataset, *, value_col: str,
                      lo_col: str, hi_col: str,
                      range_value_cols: Sequence[str],
                      how: str = "left", suffix: str = "_r") -> Dataset:
    """Broadcast non-equi lookup join: attach the single range row whose
    half-open interval ``[lo, hi)`` contains ``facts[value_col]`` — the
    GeoIP / tax-bracket / SLA-tier enrichment shape. The range table
    must be non-overlapping (validated at build; overlap raises) and is
    broadcast once (sorted ``lo`` array + ``ray.put``); every batch does
    ONE ``np.searchsorted`` probe — zero shuffles, corpus never moves.
    ``how`` ∈ {"inner", "left"} (left: out-of-range facts keep nulls).

    For a RANGE side too big to broadcast, partition facts by range
    bucket instead (``interval_join`` in ``stages/interval.py`` is the
    general two-big-sides machinery); this operator is the
    broadcast-regime fast path.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    rtbl = _small_side_table(ranges).select(
        list(dict.fromkeys([lo_col, hi_col, *range_value_cols])))
    lo = np.asarray(rtbl[lo_col].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    hi = np.asarray(rtbl[hi_col].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    if np.any(hi < lo):
        raise ValueError("range table has hi < lo rows")
    if len(lo) > 1 and np.any(lo[1:] < hi[:-1]):
        raise ValueError("range table intervals overlap")
    vals = {c: rtbl[c].take(pa.array(order.astype(np.int64)))
            .combine_chunks() for c in range_value_cols}
    ref = ray.put({"lo": lo, "hi": hi, "vals": vals})

    from .partition import broadcast_get

    def probe(t: pa.Table) -> pa.Table:
        m = broadcast_get(ref)
        v = np.asarray(t[value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        i = np.searchsorted(m["lo"], v, side="right") - 1
        ic = np.clip(i, 0, None)
        hit = (i >= 0) & (v < m["hi"][ic]) & ~np.isnan(v)
        if how == "inner":
            t = t.filter(pa.array(hit))
            ic = ic[hit]
            take = pa.array(ic.astype(np.int64))
        else:
            take = pa.array(ic.astype(np.int64), mask=~hit)
        for c, col in m["vals"].items():
            name = f"{c}{suffix}" if c in t.column_names else c
            t = t.append_column(name, col.take(take))
        return t

    return facts.map_batches(probe, batch_format="pyarrow")


def scd2_history(changes: Dataset, key_col: str, ts_col: str,
                 value_cols: Sequence[str], *, op_col: str | None = None,
                 delete_op: str = "D",
                 num_buckets: int = 64) -> Dataset:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one output row per (key, surviving version) carrying
    ``value_cols``, with half-open validity ``[valid_from, valid_to)``
    (``valid_to`` null while current), a 1-based ``version`` and an
    ``is_current`` flag — the warehouse-standard SCD2 table that
    :func:`snapshot_at` point-queries reconstruct one instant of.

    Rows whose ``op_col`` equals ``delete_op`` CLOSE the key's open
    interval at their timestamp without opening a new version (they
    emit no row; a key ending in a delete has no current version).
    Change order within a key is ``ts_col`` ascending — duplicate
    (key, ts) pairs are ambiguous history and raise.

    One bucketed exchange; per bucket a single sort + vectorized
    lead/cumcount (no per-row Python). Keys must each fit a task, the
    standard windowed-operator invariant.
    """
    from .window import bucketed_apply

    def fn(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[(key_col, "ascending"),
                                              (ts_col, "ascending")])
        tbl = tbl.take(idx)
        if len(tbl) == 0:
            ts0 = tbl[ts_col]
            return pa.table({key_col: tbl[key_col],
                             **{c: tbl[c] for c in value_cols},
                             "valid_from": ts0,
                             "valid_to": ts0,
                             "version": pa.array([], type=pa.int64()),
                             "is_current": pa.array([], type=pa.bool_())})
        key = tbl[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        codes = key.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        n = len(tbl)
        ts = tbl[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            if pa.types.is_timestamp(ts.type) else \
            ts.to_numpy(zero_copy_only=False)
        same_next = np.r_[codes[1:] == codes[:-1], False]
        if n > 1 and np.any((tsv[1:] == tsv[:-1])
                            & (codes[1:] == codes[:-1])):
            raise ValueError(
                f"duplicate ({key_col}, {ts_col}) change rows — "
                "ambiguous SCD2 history")
        # valid_to = next change's ts within the key (null at the tail)
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = tsv[1:] if n > 1 else 0
        valid_to = pa.array(nxt, mask=~same_next)
        if pa.types.is_timestamp(ts.type):
            valid_to = valid_to.cast(ts.type)
        if op_col is not None:
            is_del = pc.equal(tbl[op_col], delete_op).to_numpy(
                zero_copy_only=False)
            is_del = np.asarray(is_del, dtype=bool)
        else:
            is_del = np.zeros(n, dtype=bool)
        keep = ~is_del
        # version: 1-based count of SURVIVING rows within the key
        newk = np.r_[True, codes[1:] != codes[:-1]]
        gid = np.cumsum(newk) - 1
        kept_rank = np.cumsum(keep)
        base = np.zeros(gid.max() + 1 if n else 0, dtype=np.int64)
        starts = np.flatnonzero(newk)
        base[gid[starts]] = kept_rank[starts] - keep[starts]
        version = kept_rank - base[gid]
        is_current = keep & ~same_next
        cols = {key_col: key}
        for c in value_cols:
            cols[c] = tbl[c]
        cols["valid_from"] = ts
        cols["valid_to"] = valid_to
        cols["version"] = pa.array(version.astype(np.int64))
        cols["is_current"] = pa.array(is_current)
        return pa.table(cols).filter(pa.array(keep))

    return bucketed_apply(changes, key_col, fn, num_buckets,
                          drop_bucket=False)


def scd2_lookup(facts: Dataset, history: Dataset, *, fact_key: str,
                fact_ts: str, hist_key: str,
                value_cols: Sequence[str],
                valid_from: str = "valid_from",
                valid_to: str = "valid_to",
                num_buckets: int = 64) -> Dataset:
    """Point-in-time dimension lookup against an SCD2 history (the
    consumer side of :func:`scd2_history`): attach the version whose
    half-open validity ``[valid_from, valid_to)`` CONTAINS each fact's
    timestamp. Built on the as-of join (last ``valid_from ≤ ts`` per
    key) plus the ``valid_to`` gate — a fact landing in a gap (the key
    was deleted at that instant) gets nulls, exactly like a
    time-travel query against the dimension.

    One bucketed exchange (the as-of machinery); the gate fuses into
    the per-bucket merge task, so gapped matches never leave it."""
    from .asof import asof_join

    vcols = list(value_cols)
    out = asof_join(facts, history, left_by=fact_key,
                    right_by=hist_key, left_on=fact_ts,
                    right_on=valid_from,
                    right_value_cols=[*vcols, valid_to],
                    num_buckets=num_buckets)

    def gate(t: pa.Table) -> pa.Table:
        ts = t[fact_ts]
        vt = t[valid_to]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.int64())
            vt = pc.cast(vt, pa.int64())
        # keep the match only while ts < valid_to (null valid_to = open
        # version; unmatched facts have null vt too and stay null)
        ok = pc.or_kleene(pc.is_null(vt), pc.less(ts, vt))
        for c in vcols:
            col = t[c]
            t = t.set_column(t.column_names.index(c),
                             pa.field(c, col.type),
                             pc.if_else(ok, col,
                                        pa.nulls(len(t), type=col.type)))
        return t.drop_columns([valid_to])

    return out.map_batches(gate, batch_format="pyarrow")


def dict_encode_column(ds: Dataset, col: str,
                       out_col: str | None = None):
    """Global dictionary encoding of a string column — the storage /
    shuffle-volume optimization every 100-TB string column wants
    before a wide exchange: build the distinct-value codebook ONCE
    (one value-bounded ``groupby`` exchange), assign dense codes by
    SORTED value order (``code = dense_rank() − 1`` — deterministic,
    so a SQL twin reproduces every code), then broadcast the codebook
    and map each row via one vectorized ``pc.index_in`` pass (zero
    further shuffles).

    Returns ``(encoded_ds, codebook)`` where ``codebook`` is a
    ``pa.Table`` (code int64, value) sorted by code, and
    ``encoded_ds`` carries ``out_col`` (default ``{col}_code``; null
    values stay null). Codebook must fit driver/worker memory — the
    documented broadcast-regime contract (beyond that, hash-partition
    the codebook and use ``attach_values``)."""
    import ray as _ray

    from .partition import broadcast_get
    out_name = out_col or f"{col}_code"
    distinct = ds.groupby(col).count().to_pandas()
    vals = distinct[col].dropna().to_numpy()
    vals = np.sort(vals)
    codebook = pa.table({
        "code": pa.array(np.arange(len(vals), dtype=np.int64)),
        "value": pa.array(vals)})
    ref = _ray.put(pa.array(vals))

    def fn(t: pa.Table) -> pa.Table:
        lookup = broadcast_get(ref)
        codes = pc.index_in(t[col], value_set=lookup)
        return t.append_column(out_name,
                               pc.cast(codes, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow"), codebook


def _local_skyline(m: np.ndarray) -> np.ndarray:
    """Row indices of the maximal (non-dominated) DISTINCT vectors of
    ``m`` under >=-all / >-some dominance. 2-D is fully vectorized
    (sort by (x desc, y desc); keep iff y strictly exceeds the
    running max — covers ties and duplicates); d ≥ 3 sorts by the
    first dim desc and scans with vectorized dominance checks against
    the kept set (O(n·k), k = skyline size)."""
    n, d = m.shape
    if n == 0:
        return np.zeros(0, np.int64)
    order = np.lexsort(tuple(m[:, j] for j in range(d - 1, -1, -1)))[
        ::-1]
    sm = m[order]
    if d == 2:
        y = sm[:, 1]
        runmax = np.r_[np.int64(np.iinfo(np.int64).min),
                       np.maximum.accumulate(y)[:-1]]
        keep_mask = y > runmax
        return order[np.flatnonzero(keep_mask)]
    kept = []
    for i in range(n):
        row = sm[i]
        if kept:
            K = sm[np.array(kept)]
            if ((K >= row).all(axis=1)
                    & (K > row).any(axis=1)).any():
                continue
            if ((K == row).all(axis=1)).any():
                continue
        kept.append(i)
    return order[np.array(kept, np.int64)]


def skyline(ds: Dataset, cols: Sequence[str],
            keep_duplicates: bool = False) -> Dataset:
    """Skyline / Pareto-front query (Börzsönyi et al. 2001): the rows
    not DOMINATED by any other row — b dominates a when b ≥ a on
    every skyline column and > on at least one. All-integer columns
    required (exact dominance; quantize first). "Bigger is better" on
    every column — negate a column upstream for minimization.

    Scale shape: the skyline operator is MERGEABLE
    (``sky(A ∪ B) ⊆ sky(A) ∪ sky(B)``) — every block prunes to its
    local skyline in one ``map_batches`` pass (sorted single scan,
    O(n·k)), survivors concatenate on the driver (skyline-sized, not
    data-sized) and one final local pass finishes. Distinct value
    combinations only (``keep_duplicates=True`` re-attaches every
    input row matching a skyline point via a broadcast membership
    filter — a second streaming pass, no shuffle).

    Default output: the DISTINCT skyline value combinations (the
    ``cols`` only — a representative input row would be
    block-order-nondeterministic); ``keep_duplicates=True`` returns
    every full input row matching a skyline point (deterministic set
    semantics)."""
    if not cols:
        raise ValueError("skyline: need at least one column")

    def prune(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        m = np.stack([t[c].to_numpy(zero_copy_only=False)
                      for c in cols], axis=1)
        if not np.all(m == np.floor(m)):
            raise ValueError("skyline: columns must be "
                             "integer-valued; quantize first")
        keep = _local_skyline(m.astype(np.int64))
        return t.take(pa.array(np.sort(keep)))

    import ray as _ray
    pruned = _ray.get(ds.map_batches(prune, batch_format="pyarrow")
                      .to_arrow_refs())
    pruned = [p for p in pruned if p.num_rows]
    if not pruned:
        sch = ds.schema()
        import ray.data as rd
        if sch is None:
            return ds
        return rd.from_arrow(pa.table(
            {f.name: pa.array([], f.type) for f in sch}))
    cand = pa.concat_tables(pruned)
    m = np.stack([cand[c].to_numpy(zero_copy_only=False)
                  for c in cols], axis=1).astype(np.int64)
    keep = _local_skyline(m)
    final = cand.take(pa.array(np.sort(keep)))
    import ray.data as rd
    if not keep_duplicates:
        return rd.from_arrow(final.select(list(cols)))
    sky = {tuple(r) for r in m[keep]}
    sky_ref = _ray.put(np.array(sorted(sky), np.int64))

    def member(t: pa.Table) -> pa.Table:
        from .partition import broadcast_get as _bg
        pts = _bg(sky_ref)
        mm = np.ascontiguousarray(np.stack(
            [t[c].to_numpy(zero_copy_only=False) for c in cols],
            axis=1).astype(np.int64))
        vd = np.dtype([("", np.int64)] * mm.shape[1])
        ok = np.isin(mm.view(vd).ravel(),
                     np.ascontiguousarray(pts).view(vd).ravel())
        return t.filter(pa.array(ok))

    return ds.map_batches(member, batch_format="pyarrow")
