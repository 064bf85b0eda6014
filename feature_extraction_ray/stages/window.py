"""Windowed Dataset operators: shift (lag/lead), fill, sessionize, sliding aggs.

Each operator is expressed Ray-Data-first: a stateless vectorized
``map_batches`` assigns ``hash(entity) % B`` buckets, one
``groupby(bucket)`` shuffle co-locates each bucket, and the windowed kernel
(``functions.windows`` — O(n) numpy on sorted runs) runs per bucket inside
``map_groups`` over zero-copy Arrow tables. Payload gathers use
``Array.take`` with null indices, so any column type — including
``list<int32>`` token sequences — shifts/fills without conversion.

Reference semantics reproduced (cites into ``/root/reference`` for parity,
implementations original): silence lag
``microsoft_asr_features/extract_timing_features.py:142-163``; duration
propagation ``kaldi_asr_features/extract_timing_feats.py:95-114``; gap
predicates ``timing_features/extract_word_phone_timing.py:40``; MATTR
sliding window ``text_features/extract_lexical_diversity.py:10-52``.
"""

from __future__ import annotations

import datetime
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions import windows as W
from .partition import BUCKET_COL, entity_group_starts, group_field_type, sort_table, with_bucket

DEFAULT_NUM_BUCKETS = 64


def bucketed_apply(ds: Dataset, entity_col: str,
                   table_fn: Callable[[pa.Table], pa.Table],
                   num_buckets: int = DEFAULT_NUM_BUCKETS,
                   drop_bucket: bool = True, **map_groups_kwargs) -> Dataset:
    """Shuffle primitive: bucket by entity hash, apply ``table_fn`` per bucket.

    ``table_fn`` receives one whole bucket as an Arrow table (every entity
    fully contained) and returns an Arrow table. This is the engine's only
    all-to-all exchange; every windowed operator composes with it.
    """
    ds = with_bucket(ds, entity_col, num_buckets)
    out = ds.groupby(BUCKET_COL).map_groups(
        table_fn, batch_format="pyarrow", **map_groups_kwargs)
    if drop_bucket:
        out = out.drop_columns([BUCKET_COL])
    return out


def _sorted_with_starts(tbl: pa.Table, entity_col: str,
                        order_cols: Sequence[str]):
    tbl = sort_table(tbl, [entity_col, *order_cols])
    return tbl, entity_group_starts(tbl, entity_col)


def _take_with_nulls(col, src: np.ndarray, valid: np.ndarray):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = pa.array(src.astype(np.int64), mask=~valid)
    return col.take(idx)


def shift(ds: Dataset, entity_col: str, order_cols: Sequence[str],
          value_cols: Sequence[str], periods: int = 1,
          suffix: str | None = None,
          num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Lag (``periods > 0``) or lead (``periods < 0``) within each entity.

    Appends ``{col}{suffix}`` for each value column (default suffix
    ``_lag{p}`` / ``_lead{p}``); rows with no source row in the same entity
    get nulls. Works on any Arrow type, tokens included.
    """
    if periods == 0:
        raise ValueError("periods must be nonzero")
    sfx = suffix or (f"_lag{periods}" if periods > 0 else f"_lead{-periods}")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        if periods > 0:
            src, valid = W.lag_indices(ng, periods)
        else:
            src, valid = W.lead_indices(ng, -periods)
        for c in value_cols:
            tbl = tbl.append_column(f"{c}{sfx}",
                                    _take_with_nulls(tbl[c], src, valid))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def cumulative(ds: Dataset, entity_col: str, order_cols: Sequence[str],
              value_cols: Sequence[str], agg: str = "sum",
              suffix: str | None = None,
              num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Running ``sum``/``min``/``max`` per entity in ``order_cols`` order
    (SQL ``AGG(col) OVER (PARTITION BY entity ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``). Appends ``{col}{suffix}`` (default ``_cum{agg}``);
    per-bucket compute is a C-level grouped cumulative (no Python rows)."""
    if agg not in ("sum", "min", "max"):
        raise ValueError(f"unknown cumulative agg {agg!r}")
    sfx = suffix or f"_cum{agg}"

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        run_id = np.cumsum(ng) - 1
        starts = np.flatnonzero(ng)
        for c in value_cols:
            v = tbl[c].to_numpy(zero_copy_only=False)
            is_float = v.dtype.kind == "f"
            nan = np.isnan(v) if is_float else np.zeros(len(v), dtype=bool)
            if agg == "sum":
                # global cumsum, subtract the running total at each run
                # start (the sliding_sum_count pattern) — NaNs skipped
                # like pandas cumsum (stay NaN, don't poison the run).
                filled = np.where(nan, 0, v) if is_float else v
                cs = np.cumsum(filled)
                base = np.where(starts > 0, cs[starts - 1], 0)
                out = cs - base[run_id]
            else:
                fillv = (np.inf if agg == "min" else -np.inf) if is_float \
                    else None
                filled = np.where(nan, fillv, v) if is_float else v.copy()
                acc = np.minimum.accumulate if agg == "min" \
                    else np.maximum.accumulate
                out = np.empty_like(filled)
                bounds = np.r_[starts, len(v)]
                for s, e in zip(bounds[:-1], bounds[1:]):
                    out[s:e] = acc(filled[s:e])
            if is_float:
                out = np.where(nan, np.nan, out)
            tbl = tbl.append_column(f"{c}{sfx}",
                                    pa.array(out, from_pandas=True))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def row_number(ds: Dataset, entity_col: str, order_cols: Sequence[str],
               out_col: str = "row_num",
               num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """1-based rank of each row within its entity in ``order_cols`` order
    (SQL ``row_number() OVER (PARTITION BY entity ORDER BY ...)``) —
    deterministic when ``order_cols`` is a unique key within the entity."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id] + 1
        return tbl.append_column(out_col, pa.array(rank))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def rank_features(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                  tie_cols: Sequence[str] | None = None,
                  ntile: int | None = None,
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """SQL rank family per entity in one bucketed pass: appends ``rnk``
    (competition rank — ties share, next rank skips), ``drnk``
    (dense rank), ``prnk`` (``percent_rank`` = (rnk-1)/(n-1), 0.0 for
    singleton partitions), ``cdist`` (``cume_dist`` = rows ≤ tie group /
    n) and, when ``ntile`` is set, ``tile{n}`` (SQL NTILE bucketing: the
    first ``n_rows % ntile`` tiles get the extra row).

    Rows sort by ``order_cols``; ties are decided by ``tie_cols``
    (default: all of ``order_cols``). Pass a wider ``order_cols`` with a
    narrower ``tie_cols`` to pin NTILE determinism (NTILE splits tie
    groups by physical order, so ``order_cols`` should end in a unique
    key) while rank/dense/percent/cume still honor SQL tie semantics on
    the logical ordering columns. Fully vectorized: one sort + boundary
    scans per bucket; no Python loop over rows."""
    tie_cols = list(tie_cols) if tie_cols is not None else list(order_cols)
    if ntile is not None and ntile < 1:
        raise ValueError("ntile must be >= 1")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        run_len = np.diff(np.r_[starts, n])[run_id]
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        # tie-group boundary: entity change OR any tie col differs from
        # the previous row (nulls compare equal, like SQL ordering)
        boundary = ng.copy()
        for c in tie_cols:
            col = tbl[c].combine_chunks() if isinstance(tbl[c],
                                                        pa.ChunkedArray) \
                else tbl[c]
            cur, prev = col.slice(1), col.slice(0, n - 1)
            neq = pc.fill_null(pc.not_equal(cur, prev), True)
            both_null = pc.and_(pc.is_null(cur), pc.is_null(prev))
            neq = pc.and_(neq, pc.invert(both_null))
            boundary[1:] |= neq.to_numpy(zero_copy_only=False)
        gfirst = np.maximum.accumulate(
            np.where(boundary, np.arange(n, dtype=np.int64), 0))
        rnk = gfirst - starts[run_id] + 1
        dcum = np.cumsum(boundary)
        drnk = dcum - dcum[starts[run_id]] + 1
        prnk = np.where(run_len > 1, (rnk - 1) / np.maximum(run_len - 1, 1),
                        0.0)
        # cume_dist needs the END of each tie group
        bpos = np.flatnonzero(boundary)
        gend = np.r_[bpos[1:], n][dcum - 1] - 1
        cdist = (gend - starts[run_id] + 1) / run_len
        tbl = tbl.append_column("rnk", pa.array(rnk))
        tbl = tbl.append_column("drnk", pa.array(drnk))
        tbl = tbl.append_column("prnk", pa.array(prnk))
        tbl = tbl.append_column("cdist", pa.array(cdist))
        if ntile is not None:
            q, r = run_len // ntile, run_len % ntile
            cut = r * (q + 1)
            tile = np.where(pos < cut, pos // np.maximum(q + 1, 1),
                            r + (pos - cut) // np.maximum(q, 1)) + 1
            tbl = tbl.append_column(f"tile{ntile}", pa.array(tile))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def grouped_topk(ds: Dataset, entity_col: str, sort_keys, k: int,
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Top-k rows PER ENTITY by ``sort_keys`` (list of (col, "ascending"
    | "descending")) — SQL ``QUALIFY row_number() OVER (PARTITION BY
    entity ORDER BY ...) <= k``. One bucketed exchange; per-bucket Arrow
    sort + vectorized run-relative rank filter. Include a unique
    tie-break column in ``sort_keys`` for deterministic output."""
    def fn(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[(entity_col, "ascending"),
                                              *sort_keys])
        tbl = tbl.take(idx)
        ng = entity_group_starts(tbl, entity_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id]
        return tbl.filter(pa.array(rank < k))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def fill(ds: Dataset, entity_col: str, order_cols: Sequence[str],
         value_cols: Sequence[str], method: str = "ffill",
         suffix: str | None = None,
         num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Forward/backward-fill nulls within each entity (``method`` ∈
    {"ffill", "bfill"}). Appends ``{col}{suffix}`` (default ``_{method}``)."""
    if method not in ("ffill", "bfill"):
        raise ValueError(f"unknown fill method {method!r}")
    sfx = suffix or f"_{method}"
    idx_fn = W.ffill_indices if method == "ffill" else W.bfill_indices

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        for c in value_cols:
            isnull = pc.is_null(tbl[c]).to_numpy(zero_copy_only=False)
            src, still_null = idx_fn(isnull, ng)
            tbl = tbl.append_column(f"{c}{sfx}",
                                    _take_with_nulls(tbl[c], src, ~still_null))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def _gap_to_units(gap, ts_type: pa.DataType):
    if isinstance(gap, datetime.timedelta):
        if pa.types.is_timestamp(ts_type):
            unit = ts_type.unit
            mult = {"s": 1, "ms": 1_000, "us": 1_000_000,
                    "ns": 1_000_000_000}[unit]
            return int(gap.total_seconds() * mult)
        raise TypeError("timedelta gap requires a timestamp ts column")
    return gap


def sessionize(ds: Dataset, entity_col: str, ts_col: str, gap,
               order_cols: Sequence[str] = (),
               out_col: str = "session_id",
               num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Gap-based sessionization: 0-based ``session_id`` per entity, new
    session whenever ``ts - prev_ts > gap`` (reference analog: silence
    detection between word end/start, ``extract_timing_features.py:142-163``).

    ``gap`` may be a ``datetime.timedelta`` (timestamp columns) or a number
    in the column's own units. Extra ``order_cols`` break ts ties
    deterministically.
    """
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, [ts_col, *order_cols])
        ts = tbl[ts_col]
        gap_units = _gap_to_units(gap, ts.type)
        if pa.types.is_timestamp(ts.type):
            tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            tsv = ts.to_numpy(zero_copy_only=False)
        sid = W.sessionize(tsv, ng, gap_units)
        return tbl.append_column(out_col, pa.array(sid, type=pa.int64()))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def sliding_agg(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                value_col: str, window: int,
                aggs: Sequence[str] = ("mean",),
                num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Trailing-row sliding aggregates (``mean``/``sum``/``count``/``min``/
    ``max``) over the last ``window`` rows per entity (MATTR-style window,
    generalised)."""
    bad = set(aggs) - {"mean", "sum", "count", "min", "max"}
    if bad:
        raise ValueError(f"unsupported sliding aggs: {bad}")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        col = pc.cast(tbl[value_col], pa.float64())
        isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = col.to_numpy(zero_copy_only=False)
        sums, counts = W.sliding_sum_count(v, isnull, ng, window)
        if {"min", "max"} & set(aggs):
            mins, maxs = W.sliding_min_max(v, ng, window)
        for a in aggs:
            name = f"{value_col}_w{window}_{a}"
            if a == "sum":
                tbl = tbl.append_column(name, pa.array(sums))
            elif a == "count":
                tbl = tbl.append_column(name, pa.array(counts,
                                                       type=pa.int64()))
            elif a == "min":
                tbl = tbl.append_column(
                    name, pa.array(mins, mask=np.isnan(mins)))
            elif a == "max":
                tbl = tbl.append_column(
                    name, pa.array(maxs, mask=np.isnan(maxs)))
            else:
                mean = np.divide(sums, counts,
                                 out=np.full(len(sums), np.nan),
                                 where=counts > 0)
                tbl = tbl.append_column(
                    name, pa.array(mean, mask=counts == 0))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def time_window_agg(ds: Dataset, entity_col: str, ts_col: str,
                    value_col: str, span: datetime.timedelta,
                    order_cols: Sequence[str] = (),
                    num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """TIME-based trailing window: per row, count + sum of same-entity
    values with ``ts' ∈ [ts − span, ts]`` (SQL ``RANGE BETWEEN INTERVAL …
    PRECEDING AND CURRENT ROW``). searchsorted + prefix sums per bucket."""
    span_us = int(span.total_seconds() * 1_000_000)

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, [ts_col, *order_cols])
        tsv = tbl[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        col = pc.cast(tbl[value_col], pa.float64())
        isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = col.to_numpy(zero_copy_only=False)
        sums, counts = W.time_range_sum_count(tsv, v, isnull, ng, span_us)
        tbl = tbl.append_column(f"{value_col}_tw_cnt",
                                pa.array(counts, type=pa.int64()))
        tbl = tbl.append_column(f"{value_col}_tw_sum", pa.array(sums))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def tumbling_agg(ds: Dataset, entity_col: str, ts_col: str,
                 every: datetime.timedelta, value_col: str | None = None,
                 window_col: str = "window_start") -> Dataset:
    """Tumbling (fixed-size, non-overlapping) event-time windows: floor
    each ts to its window start, then an ordinary grouped aggregate —
    the SQL ``GROUP BY key, date_trunc/floor(ts)`` shape. Partial
    aggregation happens inside the map (Arrow hash agg) so only partials
    shuffle."""
    from ray.data.aggregate import Sum as _Sum
    every_us = int(every.total_seconds() * 1_000_000)

    def derive_partial(t: pa.Table) -> pa.Table:
        tsv = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        win = pc.multiply(pc.floor(pc.divide(pc.cast(tsv, pa.float64()),
                                             every_us)),
                          float(every_us))
        win = pc.cast(pc.cast(win, pa.int64()), pa.timestamp("us"))
        t = t.append_column(window_col, win)
        aggs = [(value_col, "sum"), (value_col, "count")] if value_col \
            else [(entity_col, "count")]
        g = t.group_by([entity_col, window_col]).aggregate(aggs)
        if value_col:
            return g.rename_columns([entity_col, window_col,
                                     "w_sum", "w_cnt"])
        return g.rename_columns([entity_col, window_col, "w_cnt"])

    partials = ds.map_batches(derive_partial, batch_format="pyarrow")
    agg_list = [_Sum("w_cnt", alias_name="w_cnt")]
    if value_col:
        agg_list.append(_Sum("w_sum", alias_name="w_sum"))
    out = partials.groupby([entity_col, window_col]).aggregate(*agg_list)

    def fix(t: pa.Table) -> pa.Table:
        i = t.column_names.index("w_cnt")
        return t.set_column(i, pa.field("w_cnt", pa.int64()),
                            pc.cast(t["w_cnt"], pa.int64()))
    return out.map_batches(fix, batch_format="pyarrow")


def grouped_concat(ds: Dataset, entity_col: str,
                   order_cols: Sequence[str], value_col: str,
                   sep: str = ",", out_col: str | None = None,
                   num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Grouped ordered string aggregation (SQL ``string_agg(value, sep
    ORDER BY order_cols)``): one row per entity with the group's values
    joined in ``order_cols`` order.

    One bucketed exchange, then per-bucket: stable sort, group offsets,
    ``pa.ListArray`` over the value strings, ``pc.binary_join`` — fully
    Arrow, no per-group Python loop. ``order_cols`` should totally
    order each group (include a unique tiebreak column) for a
    deterministic result. Null values propagate to a null group result
    (Arrow ``binary_join`` semantics) — drop them upstream if SQL's
    skip-nulls behavior is wanted."""
    out_col = out_col or f"{value_col}_concat"

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, starts = _sorted_with_starts(tbl, entity_col, order_cols)
        col = tbl[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        start_idx = np.flatnonzero(starts)
        offsets = np.append(start_idx, len(tbl)).astype(np.int64)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets), col.cast(pa.large_utf8()))
        joined = pc.binary_join(lst, pa.scalar(sep, type=pa.large_utf8()))
        ents = tbl[entity_col].take(pa.array(start_idx))
        return pa.table({entity_col: ents,
                         out_col: joined.cast(pa.utf8())})

    # fn's output omits the bucket column already — nothing to drop
    return bucketed_apply(ds, entity_col, fn, num_buckets=num_buckets,
                          drop_bucket=False)


def _ewma_run(x: np.ndarray, alpha: float) -> np.ndarray:
    """Vectorized EWMA recurrence for one sorted run (pandas
    ``ewm(alpha=..., adjust=False)``: y₀ = x₀, yₜ = (1-α)yₜ₋₁ + αxₜ).

    Closed form per chunk: yₜ = aᵗ⁺¹·c + α·aᵗ·Σⱼ xⱼ·a⁻ʲ with carry
    c (run start: c = x₀ — algebraically exact since a + α = 1).
    Chunk length is capped so a⁻ᴸ stays well inside float range; the
    cumsum's graceful forgetting of early terms mirrors the EWMA's own
    decay, so precision tracks the exact recurrence to ~1e-13."""
    a = 1.0 - alpha
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    if a <= 0.0:  # alpha == 1: y = x
        out[:] = x
        return out
    L = int(max(8, min(4096, 100.0 / max(1e-12, -np.log10(a)))))
    c = x[0]
    i = 0
    while i < n:
        j = min(n, i + L)
        xs = x[i:j]
        m = j - i
        p = a ** np.arange(m + 1)
        y = alpha * p[:m] * np.cumsum(xs / p[:m]) + p[1:m + 1] * c
        out[i:j] = y
        c = y[-1]
        i = j
    return out


def ewma(ds: Dataset, entity_col: str, order_cols: Sequence[str],
         value_cols: Sequence[str], alpha: float,
         suffix: str = "_ewma",
         num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Per-entity exponentially weighted moving average in
    ``order_cols`` order (pandas ``groupby(entity).ewm(alpha,
    adjust=False).mean()``): appends ``{col}{suffix}``. One bucketed
    exchange; per-run compute is the chunked closed form above (no
    per-row Python). Null/NaN values propagate."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        bounds = np.r_[np.flatnonzero(ng), len(tbl)]
        for c in value_cols:
            v = tbl[c].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.empty(len(v), dtype=np.float64)
            for s, e in zip(bounds[:-1], bounds[1:]):
                out[s:e] = _ewma_run(v[s:e], alpha)
            tbl = tbl.append_column(f"{c}{suffix}",
                                    pa.array(out, from_pandas=True))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def sliding_quantile(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                     value_col: str, window: int, q: float = 0.5,
                     out_col: str | None = None,
                     num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Moving discrete quantile over the trailing ``window`` rows per
    entity (SQL ``quantile_disc(v, q) OVER (PARTITION BY entity ORDER BY
    ... ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``): for the m
    ≤ window values in scope, the value at 1-based sorted index
    ``max(1, ceil(q*m))`` — DuckDB's ``quantile_disc`` convention, an
    actual data value (bit-safe pass-through).

    Kernel is an (n × window) gather + one axis-1 sort — fully
    vectorized, memory bounded by ``window`` doubles per row (intended
    for small trailing windows; values must be non-null)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    name = out_col or f"{value_col}_q{int(round(q * 100))}w{window}"

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(name, pa.array([], type=pa.float64()))
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        m = np.minimum(pos + 1, window)
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        J = np.arange(window, dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)[:, None] - J[None, :]
        valid = J[None, :] < m[:, None]
        mat = np.where(valid, v[np.maximum(idx, 0)], np.nan)
        mat.sort(axis=1)  # NaN padding sorts last
        qi = np.maximum(np.ceil(q * m).astype(np.int64) - 1, 0)
        out = mat[np.arange(n), qi]
        return tbl.append_column(name, pa.array(out))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def running_distinct(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                     value_col: str, out_col: str | None = None,
                     num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Cumulative distinct count per entity in event order — for each
    row, how many distinct ``value_col`` values the entity has produced
    up to and including that row (SQL has no ``COUNT(DISTINCT) OVER
    (... ROWS UNBOUNDED PRECEDING)``; the oracle is a correlated
    subquery). Requires ``(entity, *order_cols)`` to be a total order.

    Fully vectorized: a lexsort by (entity, value, order) marks each
    (entity, value) run head as a first occurrence, the flags scatter
    back to event order, and a per-run cumsum counts them — O(n log n),
    no per-row state."""
    name = out_col or f"n_distinct_{value_col}"

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(name, pa.array([], type=pa.int64()))
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        ecodes = ent.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        val = tbl[value_col]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        vcodes = val.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        # first occurrence of each (entity, value) in event order:
        # stable lexsort keeps event order within (entity, value) runs
        order = np.lexsort((np.arange(n), vcodes, ecodes))
        ec, vc = ecodes[order], vcodes[order]
        head = np.r_[True, (ec[1:] != ec[:-1]) | (vc[1:] != vc[:-1])]
        first = np.zeros(n, dtype=np.int64)
        first[order] = head
        # per-entity running sum of first-occurrence flags
        starts = np.flatnonzero(ng)
        cs = np.cumsum(first)
        base = np.where(starts > 0, cs[starts - 1], 0)
        run_id = np.cumsum(ng) - 1
        out = cs - base[run_id]
        return tbl.append_column(name, pa.array(out))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def cusum(ds: Dataset, entity_col: str, order_cols: Sequence[str],
          value_col: str, k: int, h: int,
          out_col: str = "cusum", flag_col: str = "drift_flag",
          num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """One-sided CUSUM drift statistic per entity: ``s₀ = 0, sᵢ =
    max(0, sᵢ₋₁ + (xᵢ − k))``, flagging rows where ``sᵢ > h`` — the
    classic sequential changepoint / drift detector (Page 1954).

    Computed without the recursion via the prefix identity ``sᵢ = Pᵢ −
    min(0, min_{j≤i} Pⱼ)`` with ``P = cumsum(x − k)``; over an INTEGER
    value column (pre-scale decimals to cents) and integer ``k`` every
    intermediate is exact int64, so the oracle's window-function
    spelling of the same identity compares strictly equal. The
    segmented prefix-min uses a Hillis–Steele doubling scan (log₂ of
    the longest entity run vector passes — no per-row Python, no float
    detour). ONE exchange bucketed by entity."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(
                out_col, pa.array([], type=pa.int64())).append_column(
                flag_col, pa.array([], type=pa.bool_()))
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        d = v.to_numpy(zero_copy_only=False).astype(np.int64) \
            - np.int64(k)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        cs = np.cumsum(d)
        base = np.where(starts > 0, cs[starts - 1], 0)
        P = cs - base[run_id]                  # per-run prefix sums
        # segmented inclusive prefix-min (doubling scan, int64-exact)
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        max_pos = int(pos.max())
        pm = P.copy()
        step = 1
        while step <= max_pos:
            idx = np.flatnonzero(pos >= step)
            pm[idx] = np.minimum(pm[idx], pm[idx - step])
            step *= 2
        s = P - np.minimum(pm, 0)
        return tbl.append_column(out_col, pa.array(s)).append_column(
            flag_col, pa.array(s > np.int64(h)))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def interpolate_linear(ds: Dataset, entity_col: str,
                       order_cols: Sequence[str], value_col: str,
                       x_col: str, out_col: str = "value_interp",
                       num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Per-entity time-weighted linear interpolation of missing values:
    each null gets ``v_prev + (v_next − v_prev) · (x − x_prev)/(x_next −
    x_prev)`` between its nearest non-null neighbors in ``order_cols``
    order (``x_col`` is the numeric axis, e.g. epoch-µs — it must be
    non-decreasing under the sort). Leading/trailing nulls stay null;
    non-null rows pass through bit-safe; a degenerate ``x_next ==
    x_prev`` span falls back to ``v_prev``. ONE bucketed exchange;
    neighbor discovery is two monotone scans (``np.maximum/
    minimum.accumulate``) segmented by run-start bounds checks — no
    per-row Python. IEEE expression order matches the
    ``last_value/first_value IGNORE NULLS`` SQL twin term-for-term."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(out_col,
                                     pa.array([], type=pa.float64()))
        vcol = tbl[value_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = ~np.asarray(pc.is_null(vcol).to_numpy(
            zero_copy_only=False))
        v = vcol.to_numpy(zero_copy_only=False).astype(np.float64)
        x = tbl[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        run_start = starts[run_id]
        run_end = (np.r_[starts[1:], n] - 1)[run_id]
        idx = np.arange(n)
        # nearest valid neighbor at-or-before / at-or-after, per run
        prevg = np.maximum.accumulate(np.where(valid, idx, -1))
        prev = np.where(prevg >= run_start, prevg, -1)
        nxtg = np.minimum.accumulate(
            np.where(valid, idx, n)[::-1])[::-1]
        nxt = np.where(nxtg <= run_end, nxtg, -1)
        fill = (~valid) & (prev >= 0) & (nxt >= 0)
        out = np.where(valid, v, np.nan)
        if fill.any():
            p, q = prev[fill], nxt[fill]
            xd = x[q] - x[p]
            with np.errstate(invalid="ignore", divide="ignore"):
                ratio = (x[fill] - x[p]).astype(np.float64) \
                    / xd.astype(np.float64)
                interp = v[p] + (v[q] - v[p]) * ratio
            out[fill] = np.where(xd > 0, interp, v[p])
        mask = valid | fill
        return tbl.append_column(
            out_col, pa.array(np.where(mask, out, 0.0), type=pa.float64(),
                              mask=~mask))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def rle_runs(ds: Dataset, entity_col: str, order_cols: Sequence[str],
             value_col: str, id_col: str,
             num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Gaps-and-islands run-length encoding: collapse CONSECUTIVE equal
    values per entity (in ``order_cols`` order) into one row per run —
    ``(entity, value, run_idx (1-based per entity), run_len,
    start/end id)``. The classic sessionization-adjacent profiling
    primitive (SQL spells it with the row_number-difference trick).
    ONE bucketed exchange; run boundaries are a dictionary-encode +
    adjacent-compare, everything else is boundary-index arithmetic.
    Nulls compare equal to each other (one run)."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        ecol, vcol, icol = tbl[entity_col], tbl[value_col], tbl[id_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        if isinstance(icol, pa.ChunkedArray):
            icol = icol.combine_chunks()
        empty = pa.table({
            entity_col: ecol.slice(0, 0),
            value_col: vcol.slice(0, 0),
            "run_idx": pa.array([], type=pa.int64()),
            "run_len": pa.array([], type=pa.int64()),
            "start_id": icol.slice(0, 0), "end_id": icol.slice(0, 0)})
        if n == 0:
            return empty
        de = vcol.dictionary_encode()
        codes = pc.fill_null(de.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_run = ng.copy()
        new_run[1:] |= codes[1:] != codes[:-1]
        rs = np.flatnonzero(new_run)                 # run starts
        re_ = np.r_[rs[1:], n] - 1                   # run ends
        run_len = re_ - rs + 1
        # 1-based run index within entity: entity starts among runs
        ent_start_runs = np.flatnonzero(ng[rs])
        first_run_of_ent = np.zeros(len(rs), dtype=np.int64)
        first_run_of_ent[ent_start_runs] = 1
        ent_of_run = np.cumsum(first_run_of_ent) - 1
        run_idx = np.arange(len(rs)) - \
            np.flatnonzero(first_run_of_ent)[ent_of_run] + 1
        take_s = pa.array(rs.astype(np.int64))
        return pa.table({
            entity_col: ecol.take(take_s) if not isinstance(
                ecol, pa.ChunkedArray) else ecol.combine_chunks()
                .take(take_s),
            value_col: vcol.take(take_s),
            "run_idx": pa.array(run_idx),
            "run_len": pa.array(run_len.astype(np.int64)),
            "start_id": icol.take(take_s),
            "end_id": icol.take(pa.array(re_.astype(np.int64)))})

    return bucketed_apply(ds, entity_col, fn, num_buckets,
                          drop_bucket=False)


def drawdown(ds: Dataset, entity_col: str, order_cols: Sequence[str],
             value_col: str, out_col: str = "drawdown",
             num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Per-entity running-peak deficit: with balance ``Pᵢ = Σ_{j≤i} xⱼ``
    the drawdown is ``max_{j≤i} Pⱼ − Pᵢ`` — the classic
    risk/feature-engineering measure of how far below its historical
    peak a cumulative series sits. Exact int64 over integer values
    (pre-scale decimals to cents). Segmented running max via the same
    Hillis–Steele doubling scan as ``cusum``; ONE bucketed exchange."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(out_col,
                                     pa.array([], type=pa.int64()))
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        d = v.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        cs = np.cumsum(d)
        base = np.where(starts > 0, cs[starts - 1], 0)
        P = cs - base[run_id]                   # per-run balances
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        max_pos = int(pos.max())
        pm = P.copy()                           # segmented running max
        step = 1
        while step <= max_pos:
            idx = np.flatnonzero(pos >= step)
            pm[idx] = np.maximum(pm[idx], pm[idx - step])
            step *= 2
        return tbl.append_column(out_col, pa.array(pm - P))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def sliding_slope(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                  value_col: str, window: int,
                  out_col: str = "slope",
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Rolling OLS trend per entity: the least-squares slope of the
    last ``window`` values against their within-entity positions —
    the local-trend feature a forecasting pipeline derives per row.
    All sufficient statistics (n, Σx, Σy, Σxy, Σx², with x = 1-based
    position and an INTEGER value column) are exact int64 sliding sums
    (cumsum differences), so ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``
    is derived from bit-identical integers by both engines and compares
    STRICTLY equal. Rows with window size 1 emit null (degenerate
    denominator; x strictly increases so n ≥ 2 is always well-posed).
    ONE bucketed exchange."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n_rows = len(tbl)
        if n_rows == 0:
            return tbl.append_column(out_col,
                                     pa.array([], type=pa.float64()))
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        y = v.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        pos = np.arange(n_rows, dtype=np.int64) - starts[run_id]
        x = pos + 1

        def sliding_sum(a: np.ndarray) -> np.ndarray:
            cs = np.cumsum(a)
            base = np.where(starts > 0, cs[starts - 1], 0)
            run_cs = cs - base[run_id]          # per-run prefix sums
            # value k rows back WITHIN the run (0 when pos < k)
            back = np.zeros(n_rows, dtype=np.int64)
            far = pos >= window
            back[far] = run_cs[np.flatnonzero(far) - window]
            return run_cs - back

        n = np.minimum(pos + 1, window)
        sx = sliding_sum(x)
        sy = sliding_sum(y)
        sxy = sliding_sum(x * y)
        sxx = sliding_sum(x * x)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        ok = den > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = num.astype(np.float64) / den.astype(np.float64)
        return tbl.append_column(
            out_col, pa.array(np.where(ok, slope, 0.0), mask=~ok))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def sliding_corr(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                 x_col: str, y_col: str, window: int,
                 out_col: str = "corr",
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Rolling Pearson correlation of two INTEGER series per entity
    over the trailing ``window`` rows: all sufficient statistics (n,
    Σx, Σy, Σxy, Σx², Σy²) are exact int64 sliding sums, so ``corr =
    (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))`` derives
    from bit-identical integers in both engines — strictly equal
    doubles. Windows with n < 2 or a constant side emit null. ONE
    bucketed exchange (the covariance sibling of ``sliding_slope``)."""
    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        n_rows = len(tbl)
        if n_rows == 0:
            return tbl.append_column(out_col,
                                     pa.array([], type=pa.float64()))

        def col64(c):
            v = tbl[c]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return v.to_numpy(zero_copy_only=False).astype(np.int64)

        x, y = col64(x_col), col64(y_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        pos = np.arange(n_rows, dtype=np.int64) - starts[run_id]

        def sliding_sum(a: np.ndarray) -> np.ndarray:
            cs = np.cumsum(a)
            base = np.where(starts > 0, cs[starts - 1], 0)
            run_cs = cs - base[run_id]
            back = np.zeros(n_rows, dtype=np.int64)
            far = pos >= window
            back[far] = run_cs[np.flatnonzero(far) - window]
            return run_cs - back

        n = np.minimum(pos + 1, window)
        sx, sy = sliding_sum(x), sliding_sum(y)
        sxy = sliding_sum(x * y)
        sxx, syy = sliding_sum(x * x), sliding_sum(y * y)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        ok = (dx > 0) & (dy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = num.astype(np.float64) / np.sqrt(
                dx.astype(np.float64) * dy.astype(np.float64))
        return tbl.append_column(
            out_col, pa.array(np.where(ok, corr, 0.0), mask=~ok))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def lag_pack(ds: Dataset, entity_col: str, order_cols: Sequence[str],
             value_cols: Sequence[str], lags: Sequence[int] = (1, 2, 3),
             num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Multi-lag feature pack: every ``(value_col, lag)`` combination
    appended in ONE bucketed exchange — the autoregressive feature
    builder (``v_lag1..v_lagK``) that would otherwise cost one
    :func:`shift` exchange PER lag. Positive lags only; columns named
    ``{col}_lag{p}``; rows with no source row in the entity get nulls;
    works on any Arrow type, token arrays included."""
    lags = list(lags)
    if not lags or any(int(p) < 1 for p in lags):
        raise ValueError("lags must be positive integers")
    if len(set(lags)) != len(lags):
        raise ValueError("lags contains duplicates")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        for p in lags:
            src, valid = W.lag_indices(ng, int(p))
            for c in value_cols:
                tbl = tbl.append_column(
                    f"{c}_lag{int(p)}",
                    _take_with_nulls(tbl[c], src, valid))
        return tbl

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def sliding_zscore(ds: Dataset, entity_col: str,
                   order_cols: Sequence[str], value_col: str,
                   window: int,
                   num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Trailing-window z-score — the rolling anomaly feature:
    ``z = (v − mean_w) / std_w`` over the last ``window`` rows per
    entity INCLUDING the current row (sample std, ``n−1``
    denominator); rows whose window has ``n < 2`` or zero variance get
    null. The value column must be INTEGER-valued (quantize
    fixed-decimal floats upstream), so the windowed sums S and S² are
    exact int64 (integer window sums reassociate exactly — the segment
    tree cannot drift them, unlike float chains) and

        ``z = (v − S/n) / sqrt((n·S² − S·S) / (n·(n−1)))``

    is ONE fixed IEEE expression — SQL twins compare STRICTLY. The
    int64 bound ``window²·max(v²) < 2⁶²`` is checked per block. ONE
    bucketed exchange; windowed sums via prefix-sum differences."""
    if window < 2:
        raise ValueError("window must be >= 2")
    name = f"{value_col}_w{window}_z"

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, entity_col, order_cols)
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi.astype(v.dtype), v):
            raise ValueError(f"{value_col} must be integer-valued")
        if len(vi) and (window * window
                        * int(np.abs(vi).max()) ** 2) >= (1 << 62):
            raise ValueError("int64 exactness bound exceeded: "
                             "window²·max(v²)")
        n_rows = len(vi)
        if n_rows == 0:
            return tbl.append_column(
                name, pa.array([], type=pa.float64()))
        run_id = np.cumsum(ng) - 1
        starts = np.flatnonzero(ng)
        i = np.arange(n_rows, dtype=np.int64)
        j = np.maximum(starts[run_id], i - window + 1)
        cs = np.concatenate([[0], np.cumsum(vi, dtype=np.int64)])
        cs2 = np.concatenate([[0], np.cumsum(vi * vi,
                                             dtype=np.int64)])
        n = i + 1 - j
        S = cs[i + 1] - cs[j]
        S2 = cs2[i + 1] - cs2[j]
        varnum = n * S2 - S * S
        ok = (n >= 2) & (varnum > 0)
        z = np.zeros(n_rows, dtype=np.float64)
        if ok.any():
            no, So, Vo, vo = n[ok], S[ok], varnum[ok], vi[ok]
            z[ok] = (vo.astype(np.float64)
                     - So.astype(np.float64) / no.astype(np.float64)) \
                / np.sqrt(Vo.astype(np.float64)
                          / (no * (no - 1)).astype(np.float64))
        return tbl.append_column(
            name, pa.array(z, mask=~ok))

    return bucketed_apply(ds, entity_col, fn, num_buckets)


def watermark_late_events(ds: Dataset, entity_col: str, ts_col: str,
                          arrival_col: str, allowed_lateness: int,
                          num_buckets: int = DEFAULT_NUM_BUCKETS,
                          id_col: str | None = None) -> Dataset:
    """Keyed watermark / late-data detection — the streaming-semantics
    op every event-time pipeline needs before windowed aggregation:
    replaying each entity's stream in ARRIVAL order, the watermark at
    a row is the max event time of strictly-earlier arrivals, and the
    row is LATE when its event time trails the watermark by more than
    ``allowed_lateness`` (same unit as ``ts_col``; timestamps are
    normalized to µs int64 per the repo convention).

    Appends ``wm`` (null for each entity's first arrival) and ``late``
    (0/1 int). All-integer comparisons — the SQL window twin
    (max OVER ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) matches
    bit-for-bit. ONE bucketed exchange; per bucket ONE
    ``np.maximum.accumulate`` over segment-offset-encoded values (a
    segmented running max with no per-row Python; falls back to a
    per-segment loop only if the disjoint-range encoding would
    overflow int64).

    ``id_col`` breaks ties among equal arrival values (sort by
    (entity, arrival, id); twin ORDER BY arrival, id) — without it,
    rows sharing an arrival value get an arbitrary replay order and
    wm/late are nondeterministic; pass it whenever ``arrival_col``
    is not injective per entity (the repo's deterministic-ordering
    convention)."""
    if allowed_lateness < 0:
        raise ValueError("watermark_late_events: allowed_lateness "
                         "must be >= 0")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            sch = tbl.schema
            return pa.table(
                {n: pa.array([], type=sch.field(n).type)
                 for n in sch.names}
                | {"wm": pa.array([], pa.int64()),
                   "late": pa.array([], pa.int64())})
        sort_keys = [entity_col, arrival_col]
        if id_col is not None:
            sort_keys.append(id_col)
        tbl = sort_table(tbl, sort_keys)
        ts = tbl[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(entity_group_starts(tbl, entity_col))
        reset = np.zeros(len(tsv), np.int64)
        reset[starts] = 1
        seg_id = np.cumsum(reset) - 1
        # prefix-of-strictly-before within each segment
        lo = np.int64(np.iinfo(np.int64).min)
        shifted = np.empty(len(tsv), np.int64)
        shifted[0] = lo
        shifted[1:] = tsv[:-1]
        shifted[starts] = lo
        base = np.int64(tsv.min())
        span = np.int64(tsv.max()) - base + np.int64(2)
        n_seg = int(seg_id[-1]) + 1
        if n_seg * int(span) < 2 ** 62:
            # offset each segment into a disjoint range so ONE
            # accumulate computes every segmented running max
            enc = np.where(shifted == lo, np.int64(-1),
                           shifted - base) + seg_id * span
            acc = np.maximum.accumulate(enc)
            dec = acc - seg_id * span
        else:                              # rare overflow fallback
            dec = np.empty(len(tsv), np.int64)
            ends = np.r_[starts[1:], len(tsv)]
            for s, e in zip(starts, ends):
                seg = np.where(shifted[s:e] == lo, np.int64(-1),
                               shifted[s:e] - base)
                dec[s:e] = np.maximum.accumulate(seg)
        has = dec >= 0
        wm = np.where(has, dec + base, 0)
        late = (has & (tsv < wm - np.int64(allowed_lateness))) \
            .astype(np.int64)
        return tbl.append_column(
            "wm", pa.array(wm, mask=~has)).append_column(
            "late", pa.array(late))

    return bucketed_apply(ds, entity_col, per_bucket, num_buckets)


def ohlc_bars(ds: Dataset, entity_col: str, ts_col: str,
              value_col: str, id_col: str, bar_us: int,
              num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """OHLC bars — the financial-style resample: per (entity, bar)
    report ``open``/``close`` (value at the first/last (ts, id) in
    the bar), ``high``/``low`` (max/min) and ``n``. All values are
    PASS-THROUGH (bit-safe, no arithmetic) and the (ts, id) ordering
    is fully deterministic, so the arg_min/arg_max SQL twin compares
    STRICTLY. ``bar = ts_us // bar_us`` (µs-normalized timestamps).
    ONE bucketed exchange; per-bucket lexsort + reduceat — no per-row
    Python."""
    if bar_us <= 0:
        raise ValueError("ohlc_bars: bar_us must be > 0")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({entity_col: pa.array([], group_field_type(tbl, entity_col)),
                          "bar": pa.array([], pa.int64()),
                          "open": pa.array([], pa.int64()),
                          "high": pa.array([], pa.int64()),
                          "low": pa.array([], pa.int64()),
                          "close": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(tbl) == 0:
            return empty
        ts = tbl[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        bar = tsv // np.int64(bar_us)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        v = tbl[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ent = tbl[entity_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tsv, bar, ent))
        ent, bar, v = ent[order], bar[order], v[order]
        starts = np.flatnonzero(
            np.r_[True, (ent[1:] != ent[:-1]) | (bar[1:] != bar[:-1])])
        cnt = np.diff(np.r_[starts, len(ent)])
        ends = starts + cnt - 1
        return pa.table({
            entity_col: pa.array(ent[starts]),
            "bar": pa.array(bar[starts]),
            "open": pa.array(v[starts]),
            "high": pa.array(np.maximum.reduceat(v, starts)),
            "low": pa.array(np.minimum.reduceat(v, starts)),
            "close": pa.array(v[ends]),
            "n": pa.array(cnt.astype(np.int64))})

    return bucketed_apply(ds, entity_col, per_bucket, num_buckets,
                          drop_bucket=False)
