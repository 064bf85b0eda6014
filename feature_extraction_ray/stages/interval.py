"""Point-in-interval (range) join over Ray Data datasets.

``interval_join(left, right)`` matches each left row at event time ``t``
with EVERY right interval ``[start, end]`` of the same entity where
``start <= t <= end`` (inner join, one output row per matching pair).
This is the non-equi join Ray Data lacks natively — validity windows,
promo periods, on-call shifts, attribution windows.

Physical plan (the engine's standard exchange shape — see
``stages/asof.py``): both sides are tagged and unioned under a common
schema, bucketed by ``hash(entity) % B`` (ONE all-to-all), and each
bucket resolves its pairs vectorized:

1. both sides sort by (entity-code, time) so every entity's interval
   starts are one contiguous ascending run; two ``np.searchsorted``
   calls on a composite ``code * K + ts-rank`` key (strictly
   lexicographic, overflow-safe: both factors ≤ rows-per-bucket) bound
   each left row's candidate run — ``hi`` = last start ≤ t and ``lo`` =
   first start ≥ t − max_len(entity), where ``max_len`` is the entity's
   longest interval; any interval covering ``t`` has
   ``start ≥ t − max_len``, so [lo, hi] is candidate-complete;
2. pair emission is ``np.repeat`` + run-relative ``arange`` (no Python
   loop), then one vectorized ``end ≥ t`` filter;
3. payload columns — any Arrow type — gather via ``take`` on the
   surviving pair indices.

Scale note: per-bucket work is O(pairs examined) = Σ_left |[lo, hi]|.
One pathologically long interval per entity widens every candidate run
of that entity; if an entity mixes year-long and minute-long intervals,
split it into duration classes upstream (join per class, union results)
— the same remedy the module's ``max_len`` bound makes explicit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .asof import _common_entity_type, _normalize_keys, _ENT, _TS, _SIDE
from .window import bucketed_apply, DEFAULT_NUM_BUCKETS

_END = "__iv_end"


def _transport_type(t: pa.DataType) -> pa.DataType:
    """Union/join transport form: fixed-size lists become VARIABLE lists,
    because ``pa.nulls(n, fixed_size_list)`` materializes n×list_size
    child values (gigabytes of NULL padding on big tables — CLAUDE.md
    gotcha; same treatment as the dedup signature transport)."""
    return pa.list_(t.value_type) if pa.types.is_fixed_size_list(t) \
        else t


def _cast_col(col, typ: pa.DataType):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(typ) if col.type != typ else col


def match_interval_pairs(lcode: np.ndarray, lts: np.ndarray,
                         rcode: np.ndarray, rstart: np.ndarray,
                         rend: np.ndarray):
    """Pure pairing kernel: every (left i, right j) with
    ``rcode[j] == lcode[i]`` and ``rstart[j] <= lts[i] <= rend[j]``.

    Requires the right arrays sorted by (rcode, rstart); left order is
    free (each left row's bounds are independent searchsorted probes).
    ``lcode`` entries < 0 never match (the broadcast plan's "entity has
    no intervals" marker). Returns ``(lidx, ridx)`` int64 arrays.

    Bounds: ``hi`` = last start ≤ t, ``lo`` = first start ≥
    t − max_len(entity); any interval covering t has end ≥ t, hence
    start = end − len ≥ t − max_len, so [lo, hi] is candidate-complete.
    The composite ``code * K + rank(start)`` key is strictly
    lexicographic and overflow-safe (both factors ≤ rows).
    Hypothesis-tested against the O(n·m) oracle in
    ``tests/test_interval_rollup.py``."""
    uniq = np.unique(rstart)
    K = np.int64(len(uniq) + 2)
    comp_right = rcode * K + np.searchsorted(uniq, rstart)
    hi = np.searchsorted(
        comp_right, lcode * K + np.searchsorted(uniq, lts, "right"),
        "left") - 1
    n_codes = int(max(rcode.max() if len(rcode) else -1,
                      lcode.max() if len(lcode) else -1)) + 1
    max_len = np.zeros(max(n_codes, 1), dtype=np.int64)
    if len(rcode):
        np.maximum.at(max_len, rcode, rend - rstart)
    ml = max_len[np.clip(lcode, 0, None)]
    lo = np.searchsorted(
        comp_right, lcode * K + np.searchsorted(uniq, lts - ml, "left"),
        "left")
    valid = (lcode >= 0) & (hi >= lo) & (hi >= 0)
    if len(rcode):
        valid &= rcode[np.clip(hi, 0, None)] == lcode
    else:
        valid[:] = False
    counts = np.where(valid, hi - lo + 1, 0)
    lidx = np.repeat(np.arange(len(lts), dtype=np.int64), counts)
    offs = np.zeros(len(lts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    ridx = (np.arange(int(offs[-1]), dtype=np.int64)
            - np.repeat(offs[:-1], counts) + np.repeat(lo, counts))
    ok = rend[ridx] >= lts[lidx]            # start <= t guaranteed by hi
    return lidx[ok], ridx[ok]


def interval_join(left: Dataset, right: Dataset, *,
                  left_by: str, right_by: str, left_on: str,
                  right_start: str, right_end: str,
                  right_value_cols: Sequence[str],
                  num_buckets: int = DEFAULT_NUM_BUCKETS,
                  broadcast: bool = False,
                  suffix: str = "_r") -> Dataset:
    """Inner join: left point events × right intervals, matching
    ``left.left_by == right.right_by`` and
    ``right_start <= left_on <= right_end`` (both bounds inclusive).

    Output = matching (left row, right row) pairs: all left columns plus
    ``right_value_cols`` (suffixed on name collision). Timestamp keys are
    normalized to int64 microseconds on both sides (mixed units safe).

    ``broadcast=True`` selects the zero-shuffle plan for a small right
    side (the common validity-window/dimension case): the interval table
    is sorted and indexed ONCE on the driver, ``ray.put`` once, and every
    left batch resolves its pairs against the cached index in-map — no
    exchange at all.
    """
    if broadcast:
        return _interval_broadcast(
            left, right, left_by=left_by, right_by=right_by,
            left_on=left_on, right_start=right_start, right_end=right_end,
            right_value_cols=right_value_cols, suffix=suffix)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    ent_type = _common_entity_type(lschema.field(left_by).type,
                                   rschema.field(right_by).type)
    rcols = list(dict.fromkeys(right_value_cols))
    rtypes = {c: rschema.field(c).type for c in rcols}
    left_names = list(lschema.names)
    # list payloads travel in transport (variable-list) form through the
    # tagged union; restored to their original types per output row
    ltypes = {c: lschema.field(c).type for c in left_names}
    l_tt = {c: _transport_type(t) for c, t in ltypes.items()}
    r_tt = {c: _transport_type(t) for c, t in rtypes.items()}

    def tag_left(tbl: pa.Table) -> pa.Table:
        tbl = _normalize_keys(tbl, left_by, left_on, ent_type)
        for c in left_names:
            if l_tt[c] != ltypes[c]:
                tbl = tbl.set_column(tbl.column_names.index(c),
                                     pa.field(c, l_tt[c]),
                                     _cast_col(tbl[c], l_tt[c]))
        tbl = tbl.append_column(_END, pa.nulls(len(tbl), type=pa.int64()))
        tbl = tbl.append_column(_SIDE, pa.array(
            np.zeros(len(tbl), dtype=np.int8)))
        for c in rcols:
            tbl = tbl.append_column(f"__r_{c}",
                                    pa.nulls(len(tbl), type=r_tt[c]))
        return tbl

    def tag_right(tbl: pa.Table) -> pa.Table:
        # _TS carries the interval START; _END the normalized end
        tbl = _normalize_keys(tbl, right_by, right_start, ent_type)
        end_norm = _normalize_keys(tbl.select([right_by, right_end]),
                                   right_by, right_end, ent_type)[_TS]
        out = {}
        for name in left_names:
            out[name] = pa.nulls(len(tbl), type=l_tt[name])
        out[_ENT] = tbl[_ENT]
        out[_TS] = tbl[_TS]
        out[_END] = end_norm
        out[_SIDE] = pa.array(np.ones(len(tbl), dtype=np.int8))
        for c in rcols:
            out[f"__r_{c}"] = _cast_col(tbl[c], r_tt[c])
        return pa.table(out)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def pair_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        ltbl = tbl.filter(pa.array(side == 0))
        rtbl = tbl.filter(pa.array(side == 1))
        keep = ltbl.select(left_names)
        if len(ltbl) == 0 or len(rtbl) == 0:
            empty = pa.table({c: pa.array([], type=ltypes[c])
                              for c in left_names})
            for c in rcols:
                name = f"{c}{suffix}" if c in empty.column_names else c
                empty = empty.append_column(
                    name, pa.array([], type=rtypes[c]))
            return empty
        # shared entity codes (one dictionary over both sides); only the
        # RIGHT side needs (code, start) order — left probes are
        # order-free searchsorteds
        lent = ltbl[_ENT].combine_chunks() if isinstance(
            ltbl[_ENT], pa.ChunkedArray) else ltbl[_ENT]
        rent = rtbl[_ENT].combine_chunks() if isinstance(
            rtbl[_ENT], pa.ChunkedArray) else rtbl[_ENT]
        nl = len(ltbl)
        codes_all = pa.chunked_array([lent, rent]).combine_chunks() \
            .dictionary_encode().indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lcode, rcode_raw = codes_all[:nl], codes_all[nl:]
        lts = ltbl[_TS].to_numpy(zero_copy_only=False)
        rstart_raw = rtbl[_TS].to_numpy(zero_copy_only=False)
        rorder = np.lexsort((rstart_raw, rcode_raw))
        rtbl = rtbl.take(pa.array(rorder))
        rpayload = pa.table({c: rtbl[f"__r_{c}"] for c in rcols})
        rcode, rstart = rcode_raw[rorder], rstart_raw[rorder]
        rend = rtbl[_END].to_numpy(zero_copy_only=False)
        lidx, ridx = match_interval_pairs(lcode, lts, rcode, rstart, rend)
        out = keep.take(pa.array(lidx))
        # restore transport (variable-list) columns to their originals:
        # every output cell is a real row, so the fixed size holds
        for c in left_names:
            if l_tt[c] != ltypes[c]:
                out = out.set_column(out.column_names.index(c),
                                     pa.field(c, ltypes[c]),
                                     _cast_col(out[c], ltypes[c]))
        for c in rcols:
            col = rpayload[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            name = f"{c}{suffix}" if c in out.column_names else c
            out = out.append_column(
                name, _cast_col(col.take(pa.array(ridx)), rtypes[c]))
        return out

    return bucketed_apply(tagged, _ENT, pair_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def _interval_broadcast(left: Dataset, right: Dataset, *, left_by,
                        right_by, left_on, right_start, right_end,
                        right_value_cols, suffix) -> Dataset:
    """Broadcast plan: right is materialized once, sorted by
    (entity, start) and indexed (entity → run, composite search key,
    per-entity max length) on the driver; every left batch probes the
    ``ray.put`` index in-map. Same candidate-run bound as the
    partitioned plan."""
    import pandas as pd
    import ray
    from .partition import broadcast_get
    from .relational import _small_side_table

    lschema = left.schema().base_schema
    rtbl = _small_side_table(right)
    ent_type = _common_entity_type(lschema.field(left_by).type,
                                   rtbl.schema.field(right_by).type)
    rcols = list(dict.fromkeys(right_value_cols))
    left_names = list(lschema.names)

    rtbl = _normalize_keys(rtbl, right_by, right_start, ent_type)
    end_norm = _normalize_keys(rtbl.select([right_by, right_end]),
                               right_by, right_end, ent_type)[_TS]
    rtbl = rtbl.append_column(_END, end_norm)
    rent_np = rtbl[_ENT].to_numpy(zero_copy_only=False)
    rstart_np = rtbl[_TS].to_numpy(zero_copy_only=False)
    order = np.lexsort((rstart_np, rent_np))
    rtbl = rtbl.take(pa.array(order))
    rent_np, rstart_np = rent_np[order], rstart_np[order]
    rend_np = rtbl[_END].to_numpy(zero_copy_only=False)
    # entity runs over the sorted table: run index IS the entity code
    if len(rtbl):
        new_run = np.r_[True, rent_np[1:] != rent_np[:-1]]
    else:
        new_run = np.array([], dtype=bool)
    run_idx = np.cumsum(new_run) - 1 if len(rtbl) else \
        np.array([], dtype=np.int64)
    run_ents = pd.Index(rent_np[new_run]) if len(rtbl) else pd.Index([])
    payload = pa.table({c: rtbl[c] for c in rcols}) if rcols \
        else pa.table({})
    ref = ray.put((run_ents, run_idx, rstart_np, rend_np, payload))

    def join_batch(batch: pa.Table) -> pa.Table:
        run_ents, run_idx, rstart, rend, payload = broadcast_get(ref)
        keyed = _normalize_keys(batch.select([left_by, left_on]),
                                left_by, left_on, ent_type)
        lent = keyed[_ENT].to_numpy(zero_copy_only=False)
        lts = keyed[_TS].to_numpy(zero_copy_only=False)
        lcode = run_ents.get_indexer(lent)           # -1 = no intervals
        lidx, ridx = match_interval_pairs(lcode, lts, run_idx, rstart,
                                          rend)
        out = batch.select(left_names).take(pa.array(lidx))
        for c in rcols:
            col = payload[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            name = f"{c}{suffix}" if c in out.column_names else c
            out = out.append_column(name, col.take(pa.array(ridx)))
        return out

    return left.map_batches(join_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interval × interval self overlap join
# ---------------------------------------------------------------------------

def overlap_pairs_sorted(code: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Pure kernel: index pairs ``(i < j)`` of overlapping intervals
    within the same entity code, over arrays SORTED by ``(code, s)``.

    With starts sorted, a pair overlaps iff ``s[j] <= e[i]`` (the other
    bound ``e[j] >= s[j] >= s[i]`` is automatic), so every row pairs
    with the contiguous run ``(i, hi_i]`` where ``hi_i`` is the last
    same-code index with start ≤ its end — two ``searchsorted`` probes
    on the overflow-safe composite ``code·K + rank(start)`` key (same
    construction as :func:`match_interval_pairs`). Degenerate intervals
    (``e < s``) pair with nothing on either leg (the left leg falls out
    of the run bound; the right leg is verified). Returns ``(ii, jj)``
    int64 arrays. Fuzz-tested vs the O(n²) oracle."""
    n = len(s)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    uniq = np.unique(s)
    K = np.int64(len(uniq) + 2)
    comp = code * K + np.searchsorted(uniq, s)
    hi = np.searchsorted(
        comp, code * K + np.searchsorted(uniq, e, "right"), "left") - 1
    m = np.clip(hi - np.arange(n, dtype=np.int64), 0, None)
    tot = int(m.sum())
    if tot == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    offs = np.cumsum(m) - m
    ii = np.repeat(np.arange(n, dtype=np.int64), m)
    jj = (np.arange(tot, dtype=np.int64) - np.repeat(offs, m)
          + ii + 1)
    # e[j] >= s[j] >= s[i] holds for well-formed intervals, but a
    # DEGENERATE j (e < s) can still land in i's start-run — verify
    ok = e[jj] >= s[ii]
    return ii[ok], jj[ok]


def overlapping_intervals(ds: Dataset, by: str, key_col: str,
                          start_col: str, end_col: str,
                          num_buckets: int = DEFAULT_NUM_BUCKETS
                          ) -> Dataset:
    """Self overlap join: every unordered pair of rows sharing ``by``
    whose ``[start, end]`` intervals intersect (both bounds inclusive —
    SQL ``a.s <= b.e AND b.s <= a.e``). Emits
    ``(by, key_a < key_b)``, each pair exactly once.

    ONE exchange bucketed by entity; the per-bucket kernel sorts by
    (entity, start) and pairs each interval with its contiguous
    overlap run (:func:`overlap_pairs_sorted`) — no per-row Python.
    Fan-out is the true overlap count; pathologically deep interval
    stacks should be range-capped upstream (no-silent-caps: this stage
    never truncates). Temporal columns are normalized to int64 µs
    before comparison (Ray's sort downcasts timestamp keys — CLAUDE.md
    gotcha)."""
    def _i64(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_temporal(col.type):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        key_type = tbl.schema.field(key_col).type
        by_type = tbl.schema.field(by).type
        if len(tbl) == 0:
            return pa.table({by: pa.array([], type=by_type),
                             "key_a": pa.array([], type=key_type),
                             "key_b": pa.array([], type=key_type)})
        from .partition import sort_table
        tbl = sort_table(tbl, [by, start_col, key_col])
        ent = tbl[by]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        code = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ii, jj = overlap_pairs_sorted(code, _i64(tbl[start_col]),
                                      _i64(tbl[end_col]))
        keys = tbl[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ka = keys.take(pa.array(ii))
        kb = keys.take(pa.array(jj))
        return pa.table({by: ent.take(pa.array(ii)),
                         "key_a": pc.min_element_wise(ka, kb),
                         "key_b": pc.max_element_wise(ka, kb)})

    cols = list(dict.fromkeys([by, key_col, start_col, end_col]))
    return bucketed_apply(ds.select_columns(cols), by, per_bucket,
                          num_buckets, drop_bucket=False)


def interval_coverage(ds: Dataset, entity_col: str, start_col: str,
                      end_col: str,
                      num_buckets: int = 32) -> Dataset:
    """Union-of-intervals coverage per entity: total length covered by
    the (possibly overlapping) ``[start, end)`` intervals, plus the
    interval count and the number of MERGED disjoint segments — the
    'active time' / SLA-coverage reduction. Exact int64 over integer
    bounds: per entity sorted by (start, end), each interval's new
    coverage is ``max(0, end − max(start, running-max-of-previous-
    ends))`` (the classic sweep), with the exclusive running max
    computed by a segmented doubling scan + one within-run shift. ONE
    bucketed exchange; output is one row per entity."""
    import numpy as np
    import pyarrow as pa
    from .window import bucketed_apply, _sorted_with_starts

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col,
                                      [start_col, end_col])
        n = len(tbl)
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        if n == 0:
            return pa.table({
                entity_col: ent.slice(0, 0),
                "n_intervals": pa.array([], type=pa.int64()),
                "n_segments": pa.array([], type=pa.int64()),
                "covered": pa.array([], type=pa.int64())})
        s = tbl[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = tbl[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        # segmented inclusive running max of e (doubling scan)
        pm = e.copy()
        step = 1
        max_pos = int(pos.max())
        while step <= max_pos:
            idx = np.flatnonzero(pos >= step)
            pm[idx] = np.maximum(pm[idx], pm[idx - step])
            step *= 2
        # exclusive: previous row's inclusive max within the run
        pmax = np.empty(n, dtype=np.int64)
        first = pos == 0
        pmax[~first] = pm[np.flatnonzero(~first) - 1]
        pmax[first] = s[first]                 # first row covers e - s
        new_cov = np.maximum(0, e - np.maximum(s, pmax))
        seg = first | (s > pmax)
        cnt = np.diff(np.r_[starts, n]).astype(np.int64)
        cov = np.add.reduceat(new_cov, starts).astype(np.int64)
        nseg = np.add.reduceat(seg.astype(np.int64), starts)
        return pa.table({
            entity_col: ent.take(pa.array(starts.astype(np.int64))),
            "n_intervals": pa.array(cnt),
            "n_segments": pa.array(nseg.astype(np.int64)),
            "covered": pa.array(cov)})

    return bucketed_apply(ds, entity_col, fn, num_buckets,
                          drop_bucket=False)
