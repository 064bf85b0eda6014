"""Grouped order statistics, argmax, funnels, and time-series resampling.

Each operator follows the engine's one-exchange pattern: a vectorized
``map_batches`` pre-aggregates (or just tags buckets), ONE
``groupby(bucket).map_groups`` all-to-all co-locates each group, and the
per-bucket kernel is pure numpy/Arrow over sorted runs — no Python row
loops, no driver materialization.

Scale notes
-----------
* :func:`grouped_quantiles` is the EXACT path: a group's values must fit
  one task (same contract as every windowed operator). The 100-TB path
  for quantiles over huge groups is the mergeable sketch in
  ``stages/sketches.py`` (``approx_quantiles``); this operator exists for
  exact SQL-parity order statistics (median/IQR/outlier gating).
* :func:`grouped_argmax` and :func:`funnel_counts` shuffle only
  pre-aggregated partials — distinct ``(group, label)`` pairs and
  per-bucket step counts respectively — never raw rows beyond the first
  co-location.
* :func:`resample_time_series` fans out one row per period in each
  entity's observed span; the fan-out is bounded by
  ``span / freq`` per entity and generated with ``np.arange`` arithmetic
  (no per-period Python loop).

Reference parity: grouped medians/extrema mirror the per-group feature
aggregations of ``/root/reference/featurize/featurizers.py`` (group-level
summary stats); the funnel/resample operators are the training-data
pipeline extensions the brief calls for (no reference counterpart).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from .partition import entity_group_starts, group_field_type, sort_table
from .window import DEFAULT_NUM_BUCKETS, bucketed_apply


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Exact grouped quantiles (+ IQR outlier counts)
# ---------------------------------------------------------------------------

def grouped_quantiles(ds: Dataset, group_col: str, value_col: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75),
                      iqr_outliers: bool = True,
                      num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Exact per-group discrete quantiles (SQL ``quantile_disc`` semantics).

    For a group of ``n`` non-null values sorted ascending, quantile ``q``
    is the value at 1-based index ``max(1, ceil(q*n))`` — an ACTUAL data
    value (bit-safe pass-through, no interpolation), so results hash
    identically against a SQL oracle. Output columns: ``group_col``,
    ``n_values`` (int64), one ``q{percent}`` column per requested
    quantile, and (when ``iqr_outliers``) ``n_outliers`` — the count of
    values outside ``[q25 - 1.5*IQR, q75 + 1.5*IQR]`` (requires 0.25 and
    0.75 in ``qs``; both engines evaluate the identical double
    expression, so the strict comparisons agree bitwise).
    """
    if iqr_outliers and not (0.25 in qs and 0.75 in qs):
        raise ValueError("iqr_outliers requires 0.25 and 0.75 in qs")
    qnames = [f"q{int(round(q * 100))}" for q in qs]

    def drop_missing(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        v = t[value_col]
        ok = pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(v)))
        return t.filter(pc.fill_null(ok, False))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        counts = np.diff(np.r_[starts, len(tbl)])
        v = _np(tbl[value_col]).astype(np.float64)
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        out = {group_col: grp.take(pa.array(starts)),
               "n_values": pa.array(counts.astype(np.int64))}
        qv = {}
        for q, name in zip(qs, qnames):
            idx = starts + np.maximum(
                np.ceil(q * counts).astype(np.int64) - 1, 0)
            qv[name] = v[idx]
            out[name] = pa.array(qv[name])
        if iqr_outliers:
            run_id = np.cumsum(ng) - 1
            q25, q75 = qv["q25"], qv["q75"]
            lo = q25 - 1.5 * (q75 - q25)
            hi = q75 + 1.5 * (q75 - q25)
            mask = (v < lo[run_id]) | (v > hi[run_id])
            n_out = np.add.reduceat(mask, starts).astype(np.int64) \
                if len(starts) else np.zeros(0, np.int64)
            out["n_outliers"] = pa.array(n_out)
        return pa.table(out)

    return bucketed_apply(ds.map_batches(drop_missing,
                                         batch_format="pyarrow"),
                          group_col, per_bucket, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# Grouped argmax / mode
# ---------------------------------------------------------------------------

def grouped_argmax(ds: Dataset, group_col: str, label_col: str,
                   out_label: str | None = None, out_count: str = "n",
                   num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Most frequent ``label_col`` per ``group_col`` (SQL ``mode``), ties
    broken by the lexicographically/numerically smallest label.

    The at-scale shape: each map task collapses its block to distinct
    ``(group, label, count)`` partials with Arrow's C++ hash aggregate,
    the single exchange moves only those partials, and the per-bucket
    finalizer re-sums and picks the (count desc, label asc) head row per
    group.
    """
    out_label = out_label or f"top_{label_col}"

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, label_col]).filter(
            pc.is_valid(t[label_col]))
        agg = t.group_by([group_col, label_col]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, label_col, "_c"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by([group_col, label_col]).aggregate([("_c", "sum")])
        agg = agg.rename_columns([group_col, label_col, "_c"])
        agg = agg.sort_by([(group_col, "ascending"), ("_c", "descending"),
                           (label_col, "ascending")])
        starts = np.flatnonzero(entity_group_starts(agg, group_col))
        head = agg.take(pa.array(starts))
        return pa.table({
            group_col: head[group_col],
            out_label: head[label_col],
            out_count: pc.cast(head["_c"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply(partials, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# Ordered funnel
# ---------------------------------------------------------------------------

def funnel_counts(ds: Dataset, user_col: str, type_col: str, ts_col: str,
                  steps: Sequence[str], max_gap_us: int | None = None,
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Classic ordered funnel: for each step ``k``, the number of users
    with a ``steps[0]`` event, then a strictly later ``steps[1]`` event,
    then a strictly later ``steps[2]`` event, … (each step's anchor is
    the EARLIEST qualifying event, i.e. ``t_k = min ts of step-k events
    with ts > t_{k-1}``, additionally within ``max_gap_us`` of
    ``t_{k-1}`` when a conversion window is given).

    One raw-row exchange (bucketed by user); the per-bucket kernel runs
    ``len(steps)`` masked ``np.minimum.reduceat`` passes — sequential in
    steps, vectorized across every user in the bucket. Per-bucket output
    is ``len(steps)`` partial-count rows; a tiny final groupby sums them.
    Output: ``step`` (1-based int64), ``event_type``, ``n_users``.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    SENT = np.int64(np.iinfo(np.int64).max)

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[type_col], value_set=pa.array(steps))
        t = t.filter(pc.fill_null(keep, False))
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({user_col: t[user_col], type_col: t[type_col],
                         "_ts": ts_us})

    def per_bucket(tbl: pa.Table) -> pa.Table:
        out_step = np.arange(1, len(steps) + 1, dtype=np.int64)
        if len(tbl) == 0:
            return pa.table({"step": pa.array(out_step),
                             "event_type": pa.array(steps),
                             "n_users": pa.array(
                                 np.zeros(len(steps), np.int64))})
        tbl = sort_table(tbl, [user_col, "_ts"])
        ng = entity_group_starts(tbl, user_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        ts = _np(tbl["_ts"]).astype(np.int64)
        typ = tbl[type_col]
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        n_users_bucket = len(starts)
        t_prev = np.full(n_users_bucket, np.int64(-1))
        alive_counts = np.empty(len(steps), dtype=np.int64)
        for k, step in enumerate(steps):
            is_step = _np(pc.equal(typ, step)).astype(bool)
            prev = t_prev[run_id]
            qual = is_step & (ts > prev)
            if max_gap_us is not None and k > 0:
                # subtraction (not prev + gap) so a SENT-valued prev
                # can't overflow; qual is already False for those rows
                qual &= (ts - prev) <= np.int64(max_gap_us)
            masked = np.where(qual, ts, SENT)
            t_k = np.minimum.reduceat(masked, starts)
            alive = t_k != SENT
            alive_counts[k] = int(alive.sum())
            # users that never reach step k keep SENT, which no later
            # ts can exceed — they drop out of every later step too.
            t_prev = np.where(alive, t_k, SENT)
        return pa.table({"step": pa.array(out_step),
                         "event_type": pa.array(steps),
                         "n_users": pa.array(alive_counts)})

    partials = bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                              user_col, per_bucket, num_buckets,
                              drop_bucket=False)
    # final rollup is provably tiny (num_buckets × len(steps) rows) —
    # a driver merge saves the second all-to-all's ~2 s fixed cost
    import ray as _ray
    import ray.data as _rd
    tbls = [t for t in _ray.get(partials.to_arrow_refs()) if t.num_rows]
    total = np.zeros(len(steps), dtype=np.int64)
    for t in tbls:
        steps_idx = t["step"].to_numpy(zero_copy_only=False) - 1
        np.add.at(total, steps_idx,
                  t["n_users"].to_numpy(zero_copy_only=False))
    return _rd.from_arrow(pa.table({
        "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
        "event_type": pa.array(list(steps)),
        "n_users": pa.array(total)}))


# ---------------------------------------------------------------------------
# Time-series resample / gap-fill
# ---------------------------------------------------------------------------

def resample_time_series(ds: Dataset, entity_col: str, ts_col: str,
                         value_col: str, freq_us: int,
                         num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Regularize each entity's event stream onto a fixed-period grid
    (``freq_us`` microseconds), filling gaps: one output row per period
    from the entity's first observed period to its last, with
    ``n_events`` (0 for gaps) and ``sum_value`` (0.0 for gaps).

    Pre-aggregation keeps the exchange small: each map task collapses raw
    rows to ``(entity, period, count, sum)`` partials, so the all-to-all
    moves at most ``entities × active periods`` rows regardless of input
    size. The per-bucket kernel merges partials with one Arrow hash
    aggregate and scatters them into the dense grid with pure
    ``np.arange``/fancy-index arithmetic.

    Output: ``entity_col``, ``period_ts`` (timestamp[us], period start),
    ``n_events`` int64, ``sum_value`` float64.
    """
    freq = np.int64(freq_us)

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([entity_col, ts_col, value_col])
        t = t.filter(pc.is_valid(t[ts_col]))
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        # floor division in int space (numpy // floors toward -inf, which
        # matches SQL date_trunc for any epoch sign)
        slot = _np(ts_us) // freq
        g = pa.table({entity_col: t[entity_col],
                      "_slot": pa.array(slot),
                      "_v": pc.cast(t[value_col], pa.float64())})
        agg = g.group_by([entity_col, "_slot"]).aggregate(
            [([], "count_all"), ("_v", "sum")])
        return agg.rename_columns([entity_col, "_slot", "_n", "_sv"])

    def per_bucket(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by([entity_col, "_slot"]).aggregate(
            [("_n", "sum"), ("_sv", "sum")])
        agg = agg.rename_columns([entity_col, "_slot", "_n", "_sv"])
        agg = sort_table(agg, [entity_col, "_slot"])
        ng = entity_group_starts(agg, entity_col)
        starts = np.flatnonzero(ng)
        ends = np.r_[starts[1:], len(agg)]
        slot = _np(agg["_slot"]).astype(np.int64)
        lo, hi = slot[starts], slot[ends - 1]
        lens = (hi - lo + 1).astype(np.int64)
        offsets = np.r_[0, np.cumsum(lens)]
        total = int(offsets[-1])
        # dense grid: per-entity arange without a per-entity loop
        grid_slot = (np.arange(total, dtype=np.int64)
                     - np.repeat(offsets[:-1], lens)
                     + np.repeat(lo, lens))
        ent = agg[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        ent_out = ent.take(pa.array(np.repeat(starts, lens)))
        run_id = np.cumsum(ng) - 1
        pos = offsets[:-1][run_id] + (slot - lo[run_id])
        n_out = np.zeros(total, dtype=np.int64)
        n_out[pos] = _np(agg["_n"]).astype(np.int64)
        sv_out = np.zeros(total, dtype=np.float64)
        sv_out[pos] = _np(agg["_sv"]).astype(np.float64)
        return pa.table({
            entity_col: ent_out,
            "period_ts": pa.array(grid_slot * freq).cast(pa.timestamp("us")),
            "n_events": pa.array(n_out),
            "sum_value": pa.array(sv_out),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply(partials, entity_col, per_bucket, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# Robust scaling (median / MAD)
# ---------------------------------------------------------------------------

def robust_scale(ds: Dataset, group_col: str, value_col: str,
                 keep_cols: Sequence[str] = (),
                 out_col: str | None = None,
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Outlier-robust per-group standardization: ``(v - median) / MAD``
    where MAD is the median absolute deviation (both medians at the
    discrete ``ceil(q*n)`` index — SQL ``quantile_disc`` convention).
    Groups with MAD 0 yield null. One bucketed exchange; the per-bucket
    kernel is two segmented median passes (sort + lexsort of residuals)
    — no Python loops. Values must be non-null."""
    name = out_col or f"{value_col}_robust"
    keep_cols = list(keep_cols)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        counts = np.diff(np.r_[starts, len(tbl)])
        run_id = np.cumsum(ng) - 1
        v = _np(tbl[value_col]).astype(np.float64)
        med_idx = starts + np.maximum(
            np.ceil(0.5 * counts).astype(np.int64) - 1, 0)
        med = v[med_idx]
        resid = np.abs(v - med[run_id])
        # segmented second median: residuals sorted within each run
        order = np.lexsort((resid, run_id))
        r_sorted = resid[order]
        mad = r_sorted[starts + np.maximum(
            np.ceil(0.5 * counts).astype(np.int64) - 1, 0)]
        denom = mad[run_id]
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = (v - med[run_id]) / denom
        out = pa.array(scaled, from_pandas=True, type=pa.float64())
        out = pc.if_else(pa.array(denom == 0.0), pa.scalar(
            None, type=pa.float64()), out)
        return tbl.select([*keep_cols, group_col, value_col]) \
            .append_column(name, out)

    keep = [*keep_cols, group_col, value_col]

    def prune(t: pa.Table) -> pa.Table:
        return t.select(keep)

    return bucketed_apply(ds.map_batches(prune, batch_format="pyarrow"),
                          group_col, per_bucket, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# Column profiling
# ---------------------------------------------------------------------------

def profile_columns(ds: Dataset, columns: Sequence[str],
                    num_buckets: int = 16) -> Dataset:
    """Data-quality profile of the named columns in one pass:
    ``n_nulls``, exact ``n_distinct``, and min/max of the string
    representation per column (int/string columns — numeric-to-text
    formatting is engine-portable for integers; float/timestamp repr is
    not, so cast those upstream if needed).

    The at-scale shape: each map task melts its block to distinct
    ``(column, value)`` pairs (Arrow hash aggregate — nulls are a
    group, carrying the null count), one exchange merges pairs
    (``groupby([column, value]).sum``), and a second tiny rollup per
    column computes the distinct count, null total and extrema. The
    exchange payload is bounded by the columns' distinct values, never
    the row count."""
    columns = list(columns)

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            val = pc.cast(t[c], pa.string())
            g = pa.table({"column": pa.array([c] * len(t)),
                          "val": val})
            agg = g.group_by(["column", "val"]).aggregate([([],
                                                            "count_all")])
            parts.append(agg.rename_columns(["column", "val", "c"]))
        return pa.concat_tables(parts)

    from ray.data.aggregate import Max, Min
    merged = ds.map_batches(melt, batch_format="pyarrow") \
        .groupby(["column", "val"]).aggregate(Sum("c", alias_name="c"))

    def partial2(t: pa.Table) -> pa.Table:
        isnull = pc.is_null(t["val"])
        nulls = t.filter(isnull)
        vals = t.filter(pc.invert(isnull))
        nv = vals.group_by(["column"]).aggregate(
            [([], "count_all"), ("val", "min"), ("val", "max")])
        nv = nv.rename_columns(["column", "n_distinct", "min_value",
                                "max_value"])
        nv = nv.append_column("n_nulls", pa.array(
            np.zeros(len(nv), np.int64)))
        nn = nulls.group_by(["column"]).aggregate([("c", "sum")])
        nn = nn.rename_columns(["column", "n_nulls"])
        nn = nn.append_column("n_distinct", pa.array(
            np.zeros(len(nn), np.int64)))
        nn = nn.append_column("min_value",
                              pa.nulls(len(nn), pa.string()))
        nn = nn.append_column("max_value",
                              pa.nulls(len(nn), pa.string()))
        cols = ["column", "n_nulls", "n_distinct", "min_value",
                "max_value"]
        return pa.concat_tables([nv.select(cols), nn.select(cols)])

    out = merged.map_batches(partial2, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("n_nulls", alias_name="n_nulls"),
            Sum("n_distinct", alias_name="n_distinct"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": t["column"],
            "n_nulls": pc.cast(t["n_nulls"], pa.int64()),
            "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
            "min_value": t["min_value"],
            "max_value": t["max_value"],
        })

    return out.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Grouped linear regression (trend)
# ---------------------------------------------------------------------------

def grouped_linreg(ds: Dataset, group_col: str, x_col: str,
                   y_col: str) -> Dataset:
    """Per-group ordinary-least-squares line fit from the five
    sufficient statistics (n, Σx, Σy, Σx², Σxy): ``slope = (nΣxy −
    ΣxΣy) / (nΣx² − (Σx)²)``, ``intercept = (Σy − slope·Σx)/n``
    (slope null for degenerate groups with zero x-variance).

    This is the ideal at-scale aggregate: each map task collapses its
    block to one partial-sums row per group (Arrow hash aggregate), the
    only exchange moves those partials, and the finalizer is stateless
    arithmetic. Callers should CENTER x near its range (e.g. days since
    the data's epoch, not the Unix epoch) — the denominator is a
    difference of large near-equal sums and loses precision otherwise.

    Output: group, ``n`` (int64), ``slope``, ``intercept`` (float64).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        g = pa.table({group_col: t[group_col], "_x": x, "_y": y,
                      "_xx": pc.multiply(x, x), "_xy": pc.multiply(x, y)})
        agg = g.group_by([group_col]).aggregate(
            [([], "count_all"), ("_x", "sum"), ("_y", "sum"),
             ("_xx", "sum"), ("_xy", "sum")])
        return agg.rename_columns([group_col, "_n", "_sx", "_sy",
                                   "_sxx", "_sxy"])

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Sum("_n", alias_name="_n"), Sum("_sx", alias_name="_sx"),
            Sum("_sy", alias_name="_sy"), Sum("_sxx", alias_name="_sxx"),
            Sum("_sxy", alias_name="_sxy"))

    def finalize(t: pa.Table) -> pa.Table:
        n = _np(t["_n"]).astype(np.float64)
        sx = _np(t["_sx"]).astype(np.float64)
        sy = _np(t["_sy"]).astype(np.float64)
        sxx = _np(t["_sxx"]).astype(np.float64)
        sxy = _np(t["_sxy"]).astype(np.float64)
        denom = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / denom
            intercept = (sy - slope * sx) / n
        bad = denom == 0.0
        return pa.table({
            group_col: t[group_col],
            "n": pa.array(n.astype(np.int64)),
            "slope": pc.if_else(pa.array(bad),
                                pa.scalar(None, type=pa.float64()),
                                pa.array(slope, from_pandas=True)),
            "intercept": pc.if_else(pa.array(bad),
                                    pa.scalar(None, type=pa.float64()),
                                    pa.array(intercept, from_pandas=True)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_quantiles_cont(ds: Dataset, group_col: str, value_col: str,
                           qs: Sequence[float] = (0.25, 0.5, 0.75),
                           num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Linearly interpolated per-group quantiles (SQL ``quantile_cont`` /
    ``percentile_cont``): with ``h = (n-1)*q`` over the sorted non-null
    values, ``v[floor(h)] + (v[ceil(h)] - v[floor(h)]) * (h - floor(h))``.
    The oracle spells out the identical IEEE expression, so results are
    bit-exact without rounding. Output: group, ``n_values``, one
    ``q{percent}c`` column per quantile."""
    qnames = [f"q{int(round(q * 100))}c" for q in qs]

    def drop_missing(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        v = t[value_col]
        ok = pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(v)))
        return t.filter(pc.fill_null(ok, False))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        counts = np.diff(np.r_[starts, len(tbl)])
        v = _np(tbl[value_col]).astype(np.float64)
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        out = {group_col: grp.take(pa.array(starts)),
               "n_values": pa.array(counts.astype(np.int64))}
        for q, name in zip(qs, qnames):
            h = (counts - 1).astype(np.float64) * q
            lo = np.floor(h)
            f = h - lo
            ilo = starts + lo.astype(np.int64)
            ihi = starts + np.ceil(h).astype(np.int64)
            vlo, vhi = v[ilo], v[ihi]
            out[name] = pa.array(vlo + (vhi - vlo) * f)
        return pa.table(out)

    return bucketed_apply(ds.map_batches(drop_missing,
                                         batch_format="pyarrow"),
                          group_col, per_bucket, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# Grouped Pearson correlation
# ---------------------------------------------------------------------------

def _corr_from_sums(n, sx, sy, sxx, syy, sxy):
    """``r = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))`` with
    nulls for degenerate groups (n == 0 or zero variance on either
    side). All inputs float64; the SQL oracles spell out the identical
    IEEE expression (including the vx/vy ≤ 0 guard) so results compare
    strictly equal when the sums are exact integers."""
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    bad = (vx <= 0.0) | (vy <= 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy))
    return r, bad


def grouped_corr(ds: Dataset, group_col: str, x_col: str,
                 y_col: str, out_col: str = "corr_xy") -> Dataset:
    """Per-group Pearson correlation from six sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) — same shuffle shape as
    :func:`grouped_linreg`: each map task collapses its block to one
    partials row per group, the only exchange moves those rows.

    Exactness: when BOTH columns are integer-typed the partials are
    int64 (exact up to 2⁵³ when later widened to float64) and the
    finalizer's float expression matches an oracle that casts the same
    integer sums to DOUBLE — bit-exact, no rounding. Float inputs fall
    back to float64 sums (reduction-order drift applies; compare
    rounded). Callers wanting exact results over decimal data should
    pre-scale to integer units (cents) in a map stage.
    """
    def partial(t: pa.Table) -> pa.Table:
        x, y = t[x_col], t[y_col]
        int_exact = (pa.types.is_integer(x.type)
                     and pa.types.is_integer(y.type))
        typ = pa.int64() if int_exact else pa.float64()
        x = pc.cast(x, typ)
        y = pc.cast(y, typ)
        g = pa.table({group_col: t[group_col], "_x": x, "_y": y,
                      "_xx": pc.multiply(x, x), "_yy": pc.multiply(y, y),
                      "_xy": pc.multiply(x, y)})
        agg = g.group_by([group_col]).aggregate(
            [([], "count_all"), ("_x", "sum"), ("_y", "sum"),
             ("_xx", "sum"), ("_yy", "sum"), ("_xy", "sum")])
        return agg.rename_columns([group_col, "_n", "_sx", "_sy",
                                   "_sxx", "_syy", "_sxy"])

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Sum("_n", alias_name="_n"), Sum("_sx", alias_name="_sx"),
            Sum("_sy", alias_name="_sy"), Sum("_sxx", alias_name="_sxx"),
            Sum("_syy", alias_name="_syy"), Sum("_sxy", alias_name="_sxy"))

    def finalize(t: pa.Table) -> pa.Table:
        n = _np(t["_n"]).astype(np.float64)
        r, bad = _corr_from_sums(
            n, _np(t["_sx"]).astype(np.float64),
            _np(t["_sy"]).astype(np.float64),
            _np(t["_sxx"]).astype(np.float64),
            _np(t["_syy"]).astype(np.float64),
            _np(t["_sxy"]).astype(np.float64))
        return pa.table({
            group_col: t[group_col],
            "n": pa.array(n.astype(np.int64)),
            out_col: pc.if_else(pa.array(bad),
                                pa.scalar(None, type=pa.float64()),
                                pa.array(r, from_pandas=True)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-entity lag-k autocorrelation
# ---------------------------------------------------------------------------

def grouped_autocorr(ds: Dataset, entity_col: str, order_cols: Sequence[str],
                     value_col: str, lag: int = 1,
                     out_col: str = "autocorr",
                     num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Per-entity lag-``k`` autocorrelation: Pearson correlation of the
    pairs ``(v_t, v_{t+k})`` over the entity's rows sorted by
    ``order_cols`` (ties must be broken by a unique trailing column for
    determinism). Emits ``(entity, n_pairs, autocorr)``; ``autocorr`` is
    null when there are no pairs or either side has zero variance.

    Shape: ONE exchange bucketed by entity; the per-bucket kernel sorts,
    slices the lagged pair arrays per run, and reduces the six
    sufficient statistics per run with ``np.add.reduceat`` (int64-exact
    for integer value columns — pre-scale decimals to integer units for
    strict oracle parity, same contract as :func:`grouped_corr`).
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        ent_t = pa.table({entity_col: tbl[entity_col]}).schema
        if len(tbl) == 0:
            return pa.table({
                entity_col: pa.array([], type=ent_t.field(0).type),
                "n_pairs": pa.array([], type=pa.int64()),
                out_col: pa.array([], type=pa.float64())})
        tbl = sort_table(tbl, [entity_col, *order_cols])
        ng = entity_group_starts(tbl, entity_col)
        starts = np.flatnonzero(ng)
        counts = np.diff(np.r_[starts, len(tbl)])
        v = _np(tbl[value_col])
        int_exact = np.issubdtype(v.dtype, np.integer)
        v = v.astype(np.int64 if int_exact else np.float64)
        m = np.maximum(counts - lag, 0)          # pairs per run
        # pair index arrays: for each run, i in [start, start+m)
        tot = int(m.sum())
        ent = tbl[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        ent_first = ent.take(pa.array(starts))
        if tot == 0:
            return pa.table({
                entity_col: ent_first,
                "n_pairs": pa.array(np.zeros(len(starts), np.int64)),
                out_col: pa.nulls(len(starts), pa.float64())})
        # flat pair positions: repeat run starts, add within-run arange
        off = np.repeat(np.cumsum(m) - m, m)
        idx = np.arange(tot) - off + np.repeat(starts, m)
        x, y = v[idx], v[idx + lag]
        # per-run segment reduction (runs with m == 0 get zeros)
        nz = np.flatnonzero(m)
        seg = (np.cumsum(m) - m)[nz].astype(np.int64)
        def red(a):
            out = np.zeros(len(starts), dtype=a.dtype)
            out[nz] = np.add.reduceat(a, seg)
            return out.astype(np.float64)
        sx, sy = red(x), red(y)
        sxx, syy, sxy = red(x * x), red(y * y), red(x * y)
        n = m.astype(np.float64)
        r, bad = _corr_from_sums(n, sx, sy, sxx, syy, sxy)
        bad |= m == 0
        return pa.table({
            entity_col: ent_first,
            "n_pairs": pa.array(m.astype(np.int64)),
            out_col: pc.if_else(pa.array(bad),
                                pa.scalar(None, type=pa.float64()),
                                pa.array(r, from_pandas=True))})

    cols = list(dict.fromkeys([entity_col, *order_cols, value_col]))
    return bucketed_apply(ds.select_columns(cols), entity_col, per_bucket,
                          num_buckets, drop_bucket=False)


# ---------------------------------------------------------------------------
# Grouped winsorization (quantile clipping)
# ---------------------------------------------------------------------------

def winsorize(ds: Dataset, group_col: str, value_col: str,
              lower_q: float = 0.05, upper_q: float = 0.95,
              out_col: str | None = None,
              num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Clip each row's value to its group's [lower_q, upper_q]
    discrete-quantile bounds (``quantile_disc`` convention: sorted value
    at 1-based index ``max(1, ceil(q·n))`` over non-null values — the
    same convention :func:`grouped_quantiles` validates against DuckDB).
    Clipped outputs are existing doubles (bound or original value), so
    oracle comparison is bit-safe with no rounding.

    Emits the input rows (minus nulls in ``value_col``) with the
    winsorized value in ``out_col`` (default ``{value_col}_w``). ONE
    exchange bucketed by group; per-bucket kernel sorts by (group,
    value) and clips via ``np.minimum/np.maximum`` — a group's rows must
    fit one task (exact-path contract; use the sketch quantiles +
    broadcast bounds for groups beyond that).
    """
    out_name = out_col or f"{value_col}_w"

    def drop_missing(t: pa.Table) -> pa.Table:
        v = t[value_col]
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_kleene(ok, pc.invert(pc.is_nan(v)))
        return t.filter(pc.fill_null(ok, False))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            sch = tbl.schema
            return pa.table(
                {n: pa.array([], type=sch.field(n).type)
                 for n in sch.names}
                | {out_name: pa.array([], type=pa.float64())})
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        counts = np.diff(np.r_[starts, len(tbl)])
        v = _np(tbl[value_col]).astype(np.float64)
        def bound(q):
            k = np.maximum(1, np.ceil(q * counts).astype(np.int64))
            return v[starts + k - 1]
        lo = np.repeat(bound(lower_q), counts)
        hi = np.repeat(bound(upper_q), counts)
        w = np.minimum(np.maximum(v, lo), hi)
        return tbl.append_column(out_name, pa.array(w))

    return bucketed_apply(ds.map_batches(drop_missing,
                                         batch_format="pyarrow"),
                          group_col, per_bucket, num_buckets,
                          drop_bucket=True)


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

def target_encode_loo(ds: Dataset, group_col: str, target_col: str,
                      out_col: str = "target_loo") -> Dataset:
    """Leave-one-out target encoding: each row gets the mean target of
    its OWN group excluding itself — ``(Σ_g − x) / (n_g − 1)``, null for
    singleton groups (the standard leakage-free categorical encoder).

    Zero-shuffle broadcast plan: per-block ``(group, Σ, n)`` partials
    (group-table-sized) merge on the driver, ship once via ``ray.put``,
    and the input streams through one vectorized lookup map. With an
    integer target the sums are exact, each numerator is an exact int64
    difference, and the single division matches an oracle spelling the
    identical expression — bit-exact.
    """
    def partial(t: pa.Table) -> pa.Table:
        x = t[target_col]
        typ = pa.int64() if pa.types.is_integer(x.type) else pa.float64()
        g = pa.table({group_col: t[group_col],
                      "_x": pc.cast(x, typ)})
        agg = g.group_by([group_col]).aggregate(
            [("_x", "sum"), ([], "count_all")])
        return agg.rename_columns([group_col, "_s", "_n"])

    import ray
    parts = [ray.get(r) for r in ds.map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    merged = pa.concat_tables(parts).group_by([group_col]).aggregate(
        [("_s", "sum"), ("_n", "sum")])
    keys = merged[group_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    sums = _np(merged["_s_sum"])
    ns = _np(merged["_n_sum"]).astype(np.int64)
    ref = ray.put((keys, sums, ns))

    def encode(t: pa.Table) -> pa.Table:
        from .partition import broadcast_get
        k, s, n = broadcast_get(ref)
        idx = pc.index_in(t[group_col], value_set=k).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = _np(t[target_col])
        loo = (s[idx] - x).astype(np.float64) \
            / (n[idx] - 1).astype(np.float64)
        bad = n[idx] <= 1
        return t.append_column(out_col, pc.if_else(
            pa.array(bad), pa.scalar(None, type=pa.float64()),
            pa.array(loo, from_pandas=True)))

    return ds.map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Contingency table with chi-square contributions
# ---------------------------------------------------------------------------

def contingency_chi2(ds: Dataset, a_col: str, b_col: str) -> Dataset:
    """Long-form contingency table over two categorical columns: one row
    per observed ``(a, b)`` cell with the observed count, the
    independence-expected count ``row_tot · col_tot / N``, and the
    χ² contribution ``(o − e)² / e``.

    Per-block cell-count partials (cells are category-product-sized,
    never row-sized) merge on the driver; expected/contribution are
    single-expression float64 over exact integer marginals, spelled
    identically in the SQL oracle — bit-exact per row. The global χ²
    statistic is the SUM of contributions (left to the caller/oracle
    as a checksum, since a float sum's reduction order is engine-
    specific)."""
    import ray
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"a": t[a_col], "b": t[b_col]})
        agg = g.group_by(["a", "b"]).aggregate([([], "count_all")])
        return agg.rename_columns(["a", "b", "o"])

    parts = [ray.get(r) for r in ds.map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return rd.from_arrow(pa.table({
            a_col: pa.array([], type=pa.string()),
            b_col: pa.array([], type=pa.string()),
            "observed": pa.array([], type=pa.int64()),
            "expected": pa.array([], type=pa.float64()),
            "chi2_contrib": pa.array([], type=pa.float64())}))
    cells = pa.concat_tables(parts).group_by(["a", "b"]).aggregate(
        [("o", "sum")])
    o = _np(cells["o_sum"]).astype(np.int64)
    a = cells["a"].combine_chunks() if isinstance(
        cells["a"], pa.ChunkedArray) else cells["a"]
    b = cells["b"].combine_chunks() if isinstance(
        cells["b"], pa.ChunkedArray) else cells["b"]
    ai = a.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    bi = b.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    row_tot = np.zeros(int(ai.max()) + 1, dtype=np.int64)
    np.add.at(row_tot, ai, o)
    col_tot = np.zeros(int(bi.max()) + 1, dtype=np.int64)
    np.add.at(col_tot, bi, o)
    N = np.float64(o.sum())
    e = (row_tot[ai].astype(np.float64)
         * col_tot[bi].astype(np.float64)) / N
    diff = o.astype(np.float64) - e
    contrib = diff * diff / e
    return rd.from_arrow(pa.table({
        a_col: a, b_col: b, "observed": pa.array(o),
        "expected": pa.array(e), "chi2_contrib": pa.array(contrib)}))


# ---------------------------------------------------------------------------
# Group-statistic imputation
# ---------------------------------------------------------------------------

def impute_by_group(ds: Dataset, group_col: str, value_col: str,
                    strategy: str = "median",
                    out_col: str | None = None,
                    num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Fill nulls in ``value_col`` with the group's ``median``
    (quantile_disc convention — an existing value, bit-safe) or
    ``mode`` (most frequent; ties → smallest value, matching
    :func:`grouped_argmax`). Non-null values pass through untouched.
    ONE exchange bucketed by group; groups that are entirely null stay
    null. Output: input rows + ``out_col`` (default
    ``{value_col}_filled``)."""
    if strategy not in ("median", "mode"):
        raise ValueError(f"unknown strategy {strategy!r}")
    out_name = out_col or f"{value_col}_filled"

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            sch = tbl.schema
            return pa.table(
                {n: pa.array([], type=sch.field(n).type)
                 for n in sch.names}
                | {out_name: pa.array([], type=sch.field(value_col).type)})
        tbl = sort_table(tbl, [group_col, value_col])
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        gcode = grp.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        n = len(gcode)
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        # sort puts nulls LAST within each group, so the valid rows are
        # a prefix of every group run
        starts = np.flatnonzero(np.r_[True, gcode[1:] != gcode[:-1]])
        nn = np.add.reduceat(valid.astype(np.int64), starts)
        fill_idx = np.full(int(gcode.max()) + 1, -1, dtype=np.int64)
        if strategy == "median":
            has = nn > 0
            k = np.maximum(1, np.ceil(0.5 * nn[has]).astype(np.int64))
            fill_idx[gcode[starts[has]]] = starts[has] + k - 1
        else:
            # mode over the valid subset: longest equal-value run, ties
            # -> earliest run == smallest value (values sorted ascending)
            iv = np.flatnonzero(valid)
            if len(iv):
                sub_g = gcode[iv]
                sub_v = v.take(pa.array(iv)).dictionary_encode() \
                    .indices.to_numpy(zero_copy_only=False)
                r = np.flatnonzero(np.r_[True,
                                         (sub_g[1:] != sub_g[:-1])
                                         | (sub_v[1:] != sub_v[:-1])])
                rlen = np.diff(np.r_[r, len(sub_g)])
                rgrp = sub_g[r]
                order = np.lexsort((r, -rlen, rgrp))
                rg_sorted = rgrp[order]
                first = np.r_[True, rg_sorted[1:] != rg_sorted[:-1]]
                picks = order[first]
                fill_idx[rgrp[picks]] = iv[r[picks]]
        take = np.where(valid, np.arange(n, dtype=np.int64),
                        fill_idx[gcode])
        filled = v.take(pa.array(take, mask=take < 0))
        return tbl.append_column(out_name, filled)

    return bucketed_apply(ds, group_col, per_bucket, num_buckets,
                          drop_bucket=True)


def update_grouped_sums(state: Dataset, changes: Dataset, group_col: str,
                        value_col: str, op_col: str = "op",
                        sum_col: str = "sum_v",
                        cnt_col: str = "n") -> Dataset:
    """Incremental aggregate maintenance: given a materialized grouped
    sum/count state and an insert/delete changeset ('I' adds the row's
    value, 'D' retracts it; model an update as D+I), produce the new
    state WITHOUT touching the base data — the delta-view-maintenance
    primitive that makes a 100-TB rollup refreshable from a day's
    changes. Per-batch signed partials (dictionary-encode + two
    bincounts, no Python loops) union with the old state into ONE tiny
    ``groupby().sum()`` over #groups-sized rows; groups whose count
    reaches zero drop out. Exact over integer value columns."""
    from ray.data.aggregate import Sum

    def delta(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        de = g.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ops = t[op_col].to_numpy(zero_copy_only=False)
        sign = np.where(ops == "D", -1, 1).astype(np.int64)
        k = len(de.dictionary)
        # int64 np.add.at, NOT float64 bincount weights: exactness must
        # hold past 2^53 (the docstring's "exact over integer value
        # columns" contract)
        dsum = np.zeros(k, dtype=np.int64)
        np.add.at(dsum, codes, sign * v)
        dcnt = np.zeros(k, dtype=np.int64)
        np.add.at(dcnt, codes, sign)
        return pa.table({group_col: de.dictionary,
                         sum_col: pa.array(dsum),
                         cnt_col: pa.array(dcnt)})

    unioned = state.select_columns([group_col, sum_col, cnt_col]).union(
        changes.map_batches(delta, batch_format="pyarrow"))
    out = unioned.groupby(group_col).aggregate(
        Sum(sum_col, alias_name=sum_col), Sum(cnt_col, alias_name=cnt_col))

    def drop_empty(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t[cnt_col], 0))
        return pa.table({group_col: t[group_col],
                         sum_col: pc.cast(t[sum_col], pa.int64()),
                         cnt_col: pc.cast(t[cnt_col], pa.int64())})

    return out.map_batches(drop_empty, batch_format="pyarrow")


def welch_ttest(ds: Dataset, group_col: str, value_col: str,
                split_col: str) -> Dataset:
    """Per-group Welch's unequal-variance t-test between the two arms
    of ``split_col`` (0/1) — the A/B-testing reduction. The exchange
    carries only INTEGER sufficient statistics (n, Σx, Σx² per arm,
    exact int64 over an integer value column), so the derived doubles —
    mean difference, Welch t, Satterthwaite df — are computed from
    bit-identical inputs by the engine and the SQL twin and compare
    STRICTLY equal with no rounding. Per-batch bincount partials →
    one #groups-sized groupby-sum; groups with an arm of n < 2 emit
    null t/df."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        de = g.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arm = t[split_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(de.dictionary)
        cols = {group_col: de.dictionary}
        for a in (0, 1):
            m = arm == a
            # int64 np.add.at for s/q (exact past 2^53 — float64
            # bincount weights would silently round); counts can't
            # overflow, plain bincount is fine
            cols[f"n{a}"] = pa.array(np.bincount(
                codes[m], minlength=k).astype(np.int64))
            s = np.zeros(k, dtype=np.int64)
            np.add.at(s, codes[m], v[m])
            cols[f"s{a}"] = pa.array(s)
            q = np.zeros(k, dtype=np.int64)
            np.add.at(q, codes[m], v[m] * v[m])
            cols[f"q{a}"] = pa.array(q)
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            *[Sum(c, alias_name=c)
              for c in ("n0", "s0", "q0", "n1", "s1", "q1")])

    def finish(t: pa.Table) -> pa.Table:
        n0 = t["n0"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1 = t["n1"].to_numpy(zero_copy_only=False).astype(np.float64)
        s0 = t["s0"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1"].to_numpy(zero_copy_only=False).astype(np.float64)
        q0 = t["q0"].to_numpy(zero_copy_only=False).astype(np.float64)
        q1 = t["q1"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = (n0 > 1) & (n1 > 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            m0, m1 = s0 / n0, s1 / n1
            v0 = (q0 - s0 * s0 / n0) / (n0 - 1.0)
            v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
            se0, se1 = v0 / n0, v1 / n1
            tstat = (m1 - m0) / np.sqrt(se0 + se1)
            df = (se0 + se1) * (se0 + se1) / (
                se0 * se0 / (n0 - 1.0) + se1 * se1 / (n1 - 1.0))
        ok = ok & np.isfinite(np.where(ok, tstat, 0.0)) \
            & np.isfinite(np.where(ok, df, 0.0))
        out = pa.table({
            group_col: t[group_col],
            "n0": pc.cast(t["n0"], pa.int64()),
            "n1": pc.cast(t["n1"], pa.int64()),
            "s0": pc.cast(t["s0"], pa.int64()),
            "s1": pc.cast(t["s1"], pa.int64()),
            "mean_diff": pa.array(np.where(ok, m1 - m0, 0.0),
                                  mask=~ok),
            "t_stat": pa.array(np.where(ok, tstat, 0.0), mask=~ok),
            "df": pa.array(np.where(ok, df, 0.0), mask=~ok)})
        return out

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_distinct_count(ds: Dataset, group_col: str, value_col: str,
                           out_col: str = "n_distinct",
                           num_buckets: int = 64) -> Dataset:
    """Exact COUNT(DISTINCT value) per group: per-batch DISTINCT
    (group, value) pre-aggregation (one lexsort-free dictionary-encode
    + packed ``np.unique`` per batch shrinks the exchange to unique
    pairs per batch), then ONE bucketed exchange by group with a
    per-bucket unique + run-length count. The exact twin of the
    HLL-style ``approx_distinct`` sketch for when the distinct
    cardinality per group is bounded."""
    from .window import bucketed_apply

    def distinct_pairs(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col])
        g = t[group_col]
        v = t[value_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if len(t) == 0:
            return t
        gc = g.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        vc = v.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        # first row of each distinct (group, value) pair, sorted runs
        order = np.lexsort((vc, gc))
        gs, vs = gc[order], vc[order]
        new = np.r_[True, (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])]
        return t.take(pa.array(order[new].astype(np.int64)))

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t[group_col]
        v = t[value_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        gde = g.dictionary_encode()
        gc = gde.indices.to_numpy(zero_copy_only=False)
        vc = v.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        nv = int(vc.max()) + 1 if len(vc) else 1
        uniq = np.unique(gc.astype(np.int64) * nv + vc)
        gids, cnt = np.unique(uniq // nv, return_counts=True)
        return pa.table({
            group_col: gde.dictionary.take(pa.array(gids)),
            out_col: pa.array(cnt.astype(np.int64))})

    return bucketed_apply(pairs, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


def churn_labels(ds: Dataset, entity_col: str, ts_col: str,
                 horizon_days: int,
                 num_buckets: int = 64) -> Dataset:
    """Training-label generation: one row per (entity, active epoch-day)
    with ``churned`` = TRUE when the entity has NO activity in the
    following ``horizon_days`` days (next active day − day >
    horizon; an entity's LAST active day is always churned — right-
    censoring is the caller's policy knob). Per-batch packed DISTINCT
    (entity, day) pre-aggregation → ONE bucketed exchange → sorted-run
    ``next-day`` diff per entity. All-integer."""
    from .window import bucketed_apply

    def distinct_pairs(t: pa.Table) -> pa.Table:
        u = t[entity_col].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        ku = np.unique(u * 100000 + day)
        return pa.table({entity_col: pa.array(ku // 100000),
                         "day": pa.array(ku % 100000)})

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[entity_col].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        ku = np.unique(u * 100000 + d)          # re-dedup across batches
        uu, dd = ku // 100000, ku % 100000
        last = np.r_[uu[1:] != uu[:-1], True]
        gap = np.empty(len(ku), dtype=np.int64)
        gap[:-1] = dd[1:] - dd[:-1]
        gap[last] = horizon_days + 1            # last day: no next
        return pa.table({entity_col: pa.array(uu),
                         "day": pa.array(dd),
                         "churned": pa.array(gap > horizon_days)})

    return bucketed_apply(pairs, entity_col, per_bucket, num_buckets,
                          drop_bucket=False)


def kaplan_meier(ds: Dataset, entity_col: str, ts_col: str) -> Dataset:
    """Kaplan–Meier survival over entity lifetimes (duration = last −
    first active epoch-day; synthetic-complete data, no censoring):
    one row per distinct duration t with the at-risk count ``n_t``,
    the event count ``d_t`` and ``survival = Π_{s ≤ t} (1 − d_s/n_s)``
    — computed as ``exp(cumsum(ln(1 − d/n)))`` in DURATION ORDER, the
    exact IEEE sequence the SQL twin spells (a step with d == n kills
    survival to exactly 0.0 from there on; DuckDB's ln(0) raises, so
    both engines guard that step with the same CASE). Exchanges: one
    per-entity min/max groupby over batch-distinct (entity, day)
    pairs + one tiny duration-count groupby; the ≤ #distinct-durations
    survival table is finished on the driver."""
    import ray
    from ray.data.aggregate import Max, Min
    import ray.data as rd

    def distinct_pairs(t: pa.Table) -> pa.Table:
        u = t[entity_col].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        ku = np.unique(u * 100000 + day)
        return pa.table({entity_col: pa.array(ku // 100000),
                         "day": pa.array(ku % 100000)})

    life = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby(entity_col).aggregate(Min("day", alias_name="first"),
                                       Max("day", alias_name="last"))

    def dur_counts(t: pa.Table) -> pa.Table:
        dur = (t["last"].to_numpy(zero_copy_only=False)
               - t["first"].to_numpy(zero_copy_only=False))
        u, c = np.unique(dur, return_counts=True)
        return pa.table({"dur": pa.array(u.astype(np.int64)),
                         "d": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum
    counts = life.map_batches(dur_counts, batch_format="pyarrow") \
        .groupby("dur").aggregate(Sum("d", alias_name="d"))
    tbl = pa.concat_tables(
        [t for t in (ray.get(r) for r in counts.to_arrow_refs())
         if t.num_rows])
    order = np.argsort(tbl["dur"].to_numpy(zero_copy_only=False))
    dur = tbl["dur"].to_numpy(zero_copy_only=False)[order]
    d = tbl["d"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
    total = int(d.sum())
    n = total - np.r_[0, np.cumsum(d)[:-1]]
    alive = d < n
    with np.errstate(divide="ignore"):
        term = np.where(alive, np.log(1.0 - d / n), 0.0)
    dead = np.cumsum(~alive) > 0
    surv = np.where(dead, 0.0, np.exp(np.cumsum(term)))
    return rd.from_arrow(pa.table({
        "dur": pa.array(dur.astype(np.int64)), "d": pa.array(d),
        "n": pa.array(n.astype(np.int64)),
        "survival": pa.array(surv)}))


def prorate_by_group(ds: Dataset, group_col: str, weight_col: str,
                     total_col: str, order_cols: Sequence[str],
                     out_col: str = "alloc",
                     num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Largest-remainder proration: split each group's INTEGER total
    across its rows proportionally to an integer weight so the
    allocations SUM EXACTLY to the total — the invoice/budget
    allocation primitive floating-point division cannot provide. Base
    share = ``total·wᵢ // W``; the leftover units go to the rows with
    the largest remainders ``(total·wᵢ) mod W`` (ties → first in
    ``order_cols`` order). All int64 (requires ``total·max(w)`` <
    2⁶³); zero-weight groups allocate by remainder order alone (every
    base is 0). ONE bucketed exchange."""
    from .window import bucketed_apply, _sorted_with_starts

    def fn(tbl: pa.Table) -> pa.Table:
        tbl, ng = _sorted_with_starts(tbl, group_col, order_cols)
        n = len(tbl)
        if n == 0:
            return tbl.append_column(out_col,
                                     pa.array([], type=pa.int64()))
        w = tbl[weight_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        total = tbl[total_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        W = np.add.reduceat(w, starts)[run_id]
        with np.errstate(divide="ignore", invalid="ignore"):
            prod = total * w
            base = np.where(W > 0, prod // np.maximum(W, 1), 0)
            rem = np.where(W > 0, prod % np.maximum(W, 1), w)
        leftover = (total[starts] -
                    np.add.reduceat(base, starts)).astype(np.int64)
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        order = np.lexsort((pos, -rem, run_id))
        rank = np.arange(n) - starts[run_id[order]]
        gets_one = np.zeros(n, dtype=np.int64)
        gets_one[order] = rank < leftover[run_id[order]]
        return tbl.append_column(out_col, pa.array(base + gets_one))

    return bucketed_apply(ds, group_col, fn, num_buckets)


def psi_by_group(ds: Dataset, group_col: str, value_col: str,
                 split_col: str, n_bins: int = 10) -> Dataset:
    """Population Stability Index per group — the standard drift
    monitor between a reference arm (``split_col == 0``) and a
    comparison arm (1): global decile boundaries come from the
    reference arm's EXACT quantile_disc quantiles (computed from a
    zero-shuffle value-histogram reduction — exact at any scale for
    bounded-cardinality integer values, no sort), rows bin by
    #boundaries-strictly-below, per-(group, arm, bin) counts ride one
    tiny groupby, and ``PSI = Σ_bins (p − q)·ln(p/q)`` with Laplace
    smoothing ``p = (c + 0.5)/(n + n_bins/2)`` — an identical IEEE
    expression in the SQL twin (bin-sum order differs → round
    downstream). Returns (group, n_ref, n_cmp, psi)."""
    from ray.data.aggregate import Sum

    # exact reference-arm quantiles via a value histogram (ints only)
    def hist_partial(t: pa.Table) -> pa.Table:
        arm = t[split_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[arm == 0]
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    hist = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    vv = hist["v"].to_numpy()
    cc = hist["c"].to_numpy()
    n_ref_total = int(cc.sum())
    cum = np.cumsum(cc)
    # quantile_disc: sorted value at 1-based index max(1, ceil(q*n))
    bounds = []
    for j in range(1, n_bins):
        idx = max(1, int(np.ceil(j / n_bins * n_ref_total)))
        bounds.append(int(vv[np.searchsorted(cum, idx)]))
    bounds_arr = np.array(sorted(set(bounds)), dtype=np.int64)

    def bin_counts(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        de = g.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arm = t[split_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # bin = #boundaries strictly below x
        b = np.searchsorted(bounds_arr, v, side="left")
        k = len(de.dictionary)
        packed = (codes * 2 + arm) * (len(bounds_arr) + 1) + b
        u, c = np.unique(packed, return_counts=True)
        nb = len(bounds_arr) + 1
        return pa.table({
            group_col: de.dictionary.take(pa.array(u // (2 * nb))),
            "arm": pa.array(((u // nb) % 2).astype(np.int64)),
            "bin": pa.array((u % nb).astype(np.int64)),
            "c": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(bin_counts, batch_format="pyarrow") \
        .groupby([group_col, "arm", "bin"]) \
        .aggregate(Sum("c", alias_name="c"))

    nb = len(bounds_arr) + 1

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        out = []
        for grp, sub in df.groupby(group_col, sort=True):
            cr = np.zeros(nb)
            cm = np.zeros(nb)
            for _, r in sub.iterrows():
                (cr if r["arm"] == 0 else cm)[int(r["bin"])] = r["c"]
            n_r, n_c = cr.sum(), cm.sum()
            p = (cr + 0.5) / (n_r + nb * 0.5)
            q = (cm + 0.5) / (n_c + nb * 0.5)
            psi = float(((p - q) * np.log(p / q)).sum())
            out.append((grp, int(n_r), int(n_c), psi))
        return pa.table({
            group_col: pa.array([o[0] for o in out]),
            "n_ref": pa.array([o[1] for o in out], type=pa.int64()),
            "n_cmp": pa.array([o[2] for o in out], type=pa.int64()),
            "psi": pa.array([o[3] for o in out], type=pa.float64())})

    # the count table is #groups × 2 × n_bins rows — one task finishes it
    return counts.repartition(1).map_batches(finish,
                                             batch_format="pyarrow")


def gini_by_group(ds: Dataset, group_col: str, value_col: str,
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Gini coefficient per group over non-negative INTEGER values —
    the inequality/concentration measure: with the group's values
    sorted ascending, ``gini = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx)``
    (1-based i). Numerator and denominator are exact int64, so the
    single division matches the SQL twin bit-for-bit. Groups with
    Σx = 0 or n < 2 emit null. ONE bucketed exchange, sorted-run
    segmented arithmetic."""
    from .window import bucketed_apply

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        n_rows = len(tbl)
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        if n_rows == 0:
            return pa.table({group_col: grp.slice(0, 0),
                             "n": pa.array([], type=pa.int64()),
                             "gini": pa.array([], type=pa.float64())})
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        n = np.diff(np.r_[starts, n_rows]).astype(np.int64)
        i = np.arange(n_rows, dtype=np.int64) - starts[run_id] + 1
        coef = 2 * i - n[run_id] - 1
        num = np.add.reduceat(coef * v, starts)
        sx = np.add.reduceat(v, starts)
        den = n * sx
        ok = (den > 0) & (n > 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            gini = num.astype(np.float64) / den.astype(np.float64)
        return pa.table({
            group_col: grp.take(pa.array(starts.astype(np.int64))),
            "n": pa.array(n),
            "gini": pa.array(np.where(ok, gini, 0.0), mask=~ok)})

    return bucketed_apply(ds, group_col, fn, num_buckets,
                          drop_bucket=False)


def benford_test(ds: Dataset, group_col: str, value_col: str) -> Dataset:
    """Benford's-law conformance per group — the classic fraud /
    data-quality screen: first-significant-digit counts of POSITIVE
    integer values (digit = first character of the decimal string,
    identical extraction in the SQL twin) vs the Benford expectation
    ``p_d = ln(1 + 1/d)/ln(10)``, scored as the χ² statistic
    ``Σ_d (obs_d − n·p_d)² / (n·p_d)``. Per-batch packed (group,
    digit) counts → ONE tiny groupby; χ² finished vectorized. Returns
    (group, n, chi2)."""
    from ray.data.aggregate import Sum

    def digit_counts(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        de = g.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = v > 0
        codes, v = codes[keep], v[keep]
        s = pc.cast(pa.array(v), pa.string())
        d = pc.cast(pc.utf8_slice_codeunits(s, 0, 1),
                    pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique(codes * 10 + d, return_counts=True)
        return pa.table({
            group_col: de.dictionary.take(pa.array(u // 10)),
            "digit": pa.array((u % 10).astype(np.int64)),
            "c": pa.array(c.astype(np.int64))})

    counts = ds.map_batches(digit_counts, batch_format="pyarrow") \
        .groupby([group_col, "digit"]).aggregate(Sum("c", alias_name="c"))

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        out = []
        p = np.log(1.0 + 1.0 / np.arange(1, 10)) / np.log(10.0)
        for grp, sub in df.groupby(group_col, sort=True):
            obs = np.zeros(9)
            for _, r in sub.iterrows():
                obs[int(r["digit"]) - 1] = r["c"]
            n = obs.sum()
            exp_ = n * p
            chi2 = float((((obs - exp_) * (obs - exp_)) / exp_).sum())
            out.append((grp, int(n), chi2))
        return pa.table({
            group_col: pa.array([o[0] for o in out]),
            "n": pa.array([o[1] for o in out], type=pa.int64()),
            "chi2": pa.array([o[2] for o in out], type=pa.float64())})

    return counts.repartition(1).map_batches(finish,
                                             batch_format="pyarrow")


def weighted_median_by_group(ds: Dataset, group_col: str,
                             value_col: str, weight_col: str,
                             num_buckets: int = DEFAULT_NUM_BUCKETS
                             ) -> Dataset:
    """Lower weighted median per group over integer values/weights:
    the first value (ascending) whose running weight reaches half the
    total — ``min v : 2·cumw(v) ≥ W`` — an ACTUAL data value
    (bit-safe pass-through, quantile_disc-style convention, exact
    integer comparisons so the SQL twin matches strictly). Zero-total
    groups emit null. ONE bucketed exchange, sorted-run cumsum."""
    from .window import bucketed_apply

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, value_col])
        ng = entity_group_starts(tbl, group_col)
        n_rows = len(tbl)
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        if n_rows == 0:
            return pa.table({group_col: grp.slice(0, 0),
                             "w_total": pa.array([], type=pa.int64()),
                             "w_median": pa.array([], type=pa.int64())})
        v = tbl[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        w = tbl[weight_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        cs = np.cumsum(w)
        base = np.where(starts > 0, cs[starts - 1], 0)
        cumw = cs - base[run_id]
        W = np.add.reduceat(w, starts)
        hit = 2 * cumw >= W[run_id]
        # first hit per run: positions where hit & (first in run to hit)
        idx = np.arange(n_rows)
        first_hit_g = np.minimum.accumulate(
            np.where(hit, idx, n_rows)[::-1])[::-1]
        # per-run first hit = value at min hit index within run
        run_end = np.r_[starts[1:], n_rows] - 1
        pick = first_hit_g[starts]
        ok = (W > 0) & (pick <= run_end)
        take = pa.array([int(p) if o else None
                         for p, o in zip(pick, ok)], type=pa.int64())
        return pa.table({
            group_col: grp.take(pa.array(starts.astype(np.int64))),
            "w_total": pa.array(W.astype(np.int64)),
            "w_median": v.take(take)})

    return bucketed_apply(ds, group_col, fn, num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# global exact quantile thresholds + equal-frequency binning (qcut)
# ---------------------------------------------------------------------------

def global_quantiles_disc(ds: Dataset, value_col: str,
                          qs: Sequence[float]) -> np.ndarray:
    """EXACT global ``quantile_disc`` values over one column at any
    scale: one range-partition sort, per-block row counts to the driver
    (#blocks ints — never the values), an exclusive scan locates each
    quantile's owning block, and one tiny task per touched block picks
    the value at its local offset. Nulls/NaNs are dropped first (SQL
    aggregate semantics). Convention: 1-based sorted index
    ``max(1, ceil(q·n))`` — bit-identical to DuckDB ``quantile_disc``
    (the repo-wide verified rule)."""
    import ray

    def clean(t: pa.Table) -> pa.Table:
        v = t[value_col]
        ok = pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(
            pc.cast(v, pa.float64()))))
        return t.select([value_col]).filter(pc.fill_null(ok, False))

    refs = ds.map_batches(clean, batch_format="pyarrow") \
        .sort(value_col).to_arrow_refs()

    @ray.remote
    def block_len(t: pa.Table) -> int:
        return len(t)

    @ray.remote
    def pick(t: pa.Table, offsets):
        v = t[value_col].to_numpy(zero_copy_only=False)
        return [float(v[o]) for o in offsets]

    lens = np.array(ray.get([block_len.remote(r) for r in refs]),
                    dtype=np.int64)
    n = int(lens.sum())
    if n == 0:
        raise ValueError("global_quantiles_disc over an empty column")
    bases = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=bases[1:])
    want: dict[int, list] = {}
    for qi, q in enumerate(qs):
        g = max(1, int(np.ceil(q * n))) - 1          # 0-based global
        b = int(np.searchsorted(bases, g, side="right") - 1)
        want.setdefault(b, []).append((qi, g - int(bases[b])))
    got = {b: ray.get(pick.remote(refs[b], [off for _, off in pairs]))
           for b, pairs in want.items()}
    out = np.zeros(len(qs), dtype=np.float64)
    for b, pairs in want.items():
        for (qi, _off), val in zip(pairs, got[b]):
            out[qi] = val
    return out


def quantile_bucket(ds: Dataset, value_col: str, n_buckets: int = 10,
                    out_col: str | None = None) -> Dataset:
    """Equal-frequency binning (pandas ``qcut`` / decile coding):
    append the 0-based bucket id ``#(thresholds ≤ value)`` where the
    ``n_buckets − 1`` thresholds are EXACT global ``quantile_disc``
    values at ``i/n_buckets``. Value-based, so ties land in one bucket
    deterministically in every engine (unlike row-split NTILE); null
    values get a null bucket. One sort for the thresholds, then a
    broadcast zero-shuffle scoring pass."""
    out_col = out_col or f"{value_col}_qbucket"
    qs = [i / n_buckets for i in range(1, n_buckets)]
    thr = global_quantiles_disc(ds, value_col, qs)

    def score(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        arr = v.to_numpy(zero_copy_only=False)
        b = np.searchsorted(thr, arr, side="right").astype(np.int64)
        mask = ~np.isfinite(arr)
        return t.append_column(out_col, pa.array(b, mask=mask))

    return ds.map_batches(score, batch_format="pyarrow")



def target_encode_m_estimate(ds: Dataset, key_col: str, target_col: str,
                      m: float = 0.0,
                      num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Leave-one-out target encoding with m-estimate smoothing — the
    PARTITIONED, shrinkage-adding sibling of :func:`target_encode_loo`
    (which is the plain-LOO broadcast plan for driver-fitting group
    tables; this one never broadcasts, so key cardinality is
    unbounded):

        ``te = ((Σ_key − v) + m·prior) / ((n_key − 1) + m)``,
        ``prior = Σ_total / n_total``

    The target must be INTEGER-VALUED (the repo's float-stat oracle
    rule: ship exact-int sufficient statistics through the exchange,
    derive doubles with one fixed IEEE expression) — then a SQL twin
    compares STRICTLY with no rounding. ``te`` is null for singleton
    keys when ``m == 0`` (0/0). Appends ``te`` to every input row.

    Scale shape: per-block dictionary-encode + ``np.add.at`` int64
    partials → ONE ``groupby(key)`` exchange builds the per-key stats
    table → stats re-attach via ONE ``attach_values`` exchange (NO
    broadcast: key cardinality is unbounded); the global prior is two
    driver ints."""
    from ray.data.aggregate import Sum

    from .cc import attach_values

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = t[target_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi.astype(v.dtype), v):
            raise ValueError(f"{target_col} must be integer-valued "
                             "for exact LOO encoding")
        de = k.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = len(de.dictionary)
        s = np.zeros(nd, dtype=np.int64)
        np.add.at(s, codes, vi)
        c = np.bincount(codes, minlength=nd).astype(np.int64)
        return pa.table({key_col: de.dictionary, "__s": pa.array(s),
                         "__c": pa.array(c)})

    stats = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("__s", alias_name="__s"),
                                    Sum("__c", alias_name="__c")) \
        .materialize()
    tot = stats.sum(["__s", "__c"])
    prior = float(tot["sum(__s)"]) / float(tot["sum(__c)"])

    joined = attach_values(ds, key_col, stats, key_col,
                           ["__s", "__c"], how="inner",
                           num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        v = t[target_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t["__s"].to_numpy(zero_copy_only=False)
        c = t["__c"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            te = ((s - v).astype(np.float64) + m * prior) \
                / ((c - 1).astype(np.float64) + m)
        return t.drop_columns(["__s", "__c"]).append_column(
            "te", pa.array(te, mask=np.isnan(te)))

    return joined.map_batches(fin, batch_format="pyarrow")


def target_encode_oof(ds: Dataset, key_col: str, target_col: str,
                      id_col: str, k: int = 5, m: float = 0.0,
                      seed: int = 1,
                      num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Out-of-fold K-fold target encoding — the cross-validation-safe
    sibling of :func:`target_encode_m_estimate`: rows are assigned a
    deterministic fold by the shared overflow-safe hash family
    (``fold = ((id % 2²⁰)·2654435761 + seed·1315423911) mod 2³² mod k``
    — every term < 2⁶³, so a BIGINT SQL twin reproduces folds
    bit-for-bit) and each row is encoded by its key's statistics
    EXCLUDING its own fold:

        ``te = ((Σ_key − Σ_{key,fold}) + m·prior)
               / ((n_key − n_{key,fold}) + m)``

    (the standard leakage guard: a row's own fold never contributes to
    its encoding — stronger than plain LOO when the same entity repeats
    within a fold). Null when the key has no out-of-fold rows and
    ``m == 0``. The target must be INTEGER-VALUED (loud reject), so all
    sufficient statistics are exact int64 and ``te`` is ONE fixed IEEE
    expression — SQL twins compare STRICTLY. ``id_col`` must be an
    integer column (derive one upstream for string ids).

    Scale shape: ONE ``bucketed_apply`` exchange on the key — the
    (key, fold) stats live only inside their bucket task (k·nd ints),
    never globally; the global prior is two driver ints from a tiny
    pre-aggregate. Appends ``fold`` and ``te``."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from .window import bucketed_apply

    def _vi(t: pa.Table) -> np.ndarray:
        v = t[target_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi.astype(v.dtype), v):
            raise ValueError(f"{target_col} must be integer-valued "
                             "for exact OOF encoding")
        return vi

    def pri(t: pa.Table) -> pa.Table:
        vi = _vi(t)
        return pa.table({"__s": pa.array([int(vi.sum())]),
                         "__n": pa.array([len(t)])})

    tot = ds.map_batches(pri, batch_format="pyarrow").sum(["__s", "__n"])
    prior = float(tot["sum(__s)"]) / float(tot["sum(__n)"])
    mul = np.uint64(2654435761)
    add = np.uint64((seed * 1315423911) % (1 << 64))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            z = pa.array([], type=pa.int64())
            zf = pa.array([], type=pa.float64())
            out = pa.table({n: pa.array([], type=tbl.schema.field(n).type)
                            for n in tbl.column_names})
            return out.append_column("fold", z).append_column("te", zf)
        vi = _vi(tbl)
        did = tbl[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        fold = ((did % np.uint64(1 << 20)) * mul + add) \
            % np.uint64(1 << 32) % np.uint64(k)
        fold = fold.astype(np.int64)
        key = tbl[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        de = key.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nd = len(de.dictionary)
        pack = codes * k + fold
        sf = np.zeros(nd * k, dtype=np.int64)
        np.add.at(sf, pack, vi)
        nf = np.bincount(pack, minlength=nd * k).astype(np.int64)
        s_key = sf.reshape(nd, k).sum(axis=1)
        n_key = nf.reshape(nd, k).sum(axis=1)
        num = (s_key[codes] - sf[pack]).astype(np.float64) + m * prior
        den = (n_key[codes] - nf[pack]).astype(np.float64) + m
        with np.errstate(invalid="ignore", divide="ignore"):
            te = num / den
        te = np.where(den == 0.0, np.nan, te)
        out = tbl.append_column("fold", pa.array(fold))
        return out.append_column(
            "te", pa.array(te, mask=(den == 0.0)))

    return bucketed_apply(ds, key_col, per_bucket, num_buckets)


def woe_encode(ds: Dataset, key_col: str, label_col: str,
               smoothing: float = 0.5,
               num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Weight-of-evidence categorical encoding — the supervised
    credit-scoring encoder: each row gets its key's

        ``woe = ln( ((pos_k + s) / P) / ((neg_k + s) / Q) )``

    where ``pos_k`` / ``neg_k`` are the key's exact int64 label-1 /
    label-0 counts, ``P`` / ``Q`` the global counts (two driver ints
    from a tiny pre-aggregate) and ``s`` the additive smoothing that
    keeps rare keys finite (``s > 0`` enforced loudly — at ``s = 0`` a
    one-sided key hits ``ln(0)``, which DuckDB raises on and numpy
    silently turns into ``-inf``). The label must be integer 0/1 (loud
    reject), so every sufficient statistic is exact and ``woe`` is ONE
    fixed IEEE expression up to the final ``ln`` — numpy's vectorized
    log differs from libm/DuckDB ``ln`` by 1 ulp on ~26% of inputs
    (measured), so SQL twins must round BOTH sides (irrational log
    values are rounding-boundary-safe; ratio-1 keys give exact 0.0).

    Scale shape: ONE ``bucketed_apply`` exchange on the key; per-key
    counts live only inside their bucket task and each row's encoding
    gathers back by inverse index — no join, no second exchange.
    Appends ``woe``."""
    if not smoothing > 0:
        raise ValueError("smoothing must be > 0")
    s = float(smoothing)

    def _lab(t: pa.Table) -> np.ndarray:
        v = t[label_col].to_numpy(zero_copy_only=False)
        vi = v.astype(np.int64)
        if not np.array_equal(vi.astype(v.dtype), v) or \
                not np.all((vi == 0) | (vi == 1)):
            raise ValueError(f"{label_col} must be integer 0/1")
        return vi

    def pri(t: pa.Table) -> pa.Table:
        vi = _lab(t)
        return pa.table({"__p": pa.array([int(vi.sum())]),
                         "__n": pa.array([len(t)])})

    tot = ds.map_batches(pri, batch_format="pyarrow").sum(["__p", "__n"])
    P = int(tot["sum(__p)"])
    Q = int(tot["sum(__n)"]) - P
    if P == 0 or Q == 0:
        raise ValueError("labels are single-class: WOE undefined")
    Pf, Qf = float(P), float(Q)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(
                "woe", pa.array([], type=pa.float64()))
        vi = _lab(tbl)
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
        _, inv = np.unique(keys, return_inverse=True)
        nk = int(inv.max()) + 1
        pos = np.zeros(nk, dtype=np.int64)
        np.add.at(pos, inv, vi)
        n = np.bincount(inv, minlength=nk)
        neg = n - pos
        woe = np.log(((pos.astype(np.float64) + s) / Pf)
                     / ((neg.astype(np.float64) + s) / Qf))
        return tbl.append_column("woe", pa.array(woe[inv]))

    return bucketed_apply(ds, key_col, per_bucket,
                          num_buckets=num_buckets)


def corr_matrix(ds: Dataset, cols: Sequence[str]):
    """Exact Pearson correlation matrix across ``d`` integer-valued
    columns in ONE streaming pass with NO exchange — the
    feature-redundancy screen run before model training. Per-block
    partials are the classic sufficient statistics (n, per-column
    sums, upper-triangle cross-product sums), all exact int64, reduced
    with a single ``Dataset.sum``; the driver derives

        ``corr_ij = (n·S_ij − s_i·s_j)
                    / (sqrt(n·S_ii − s_i²) · sqrt(n·S_jj − s_j²))``

    — IEEE sqrt is correctly rounded, so a SQL twin spelling the
    identical expression over the identical integers compares
    STRICTLY. Zero-variance columns yield null correlations (DuckDB
    CASE twin). Columns must be integer-valued (quantize fixed-decimal
    floats upstream with the DuckDB-exact rounder); the int64
    exactness bound ``n²·max|v_i|·max|v_j| < 2⁶²`` is CHECKED from the
    streamed per-column max and violated input raises loudly.

    Returns a driver-side ``pyarrow.Table`` (``col_a, col_b, n,
    corr``; upper triangle incl. diagonal) — d² values, never the
    data."""
    cols = list(cols)
    d = len(cols)
    if d < 2:
        raise ValueError("need at least two columns")
    pairs = [(i, j) for i in range(d) for j in range(i, d)]

    def partial(t: pa.Table) -> pa.Table:
        mats = []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False)
            vi = v.astype(np.int64)
            if not np.array_equal(vi.astype(v.dtype), v):
                raise ValueError(f"{c} must be integer-valued")
            mats.append(vi)
        out = {"n": pa.array([len(t)], type=pa.int64())}
        for i, c in enumerate(cols):
            out[f"s{i}"] = pa.array([int(mats[i].sum())])
            out[f"m{i}"] = pa.array(
                [int(np.abs(mats[i]).max()) if len(t) else 0])
        for i, j in pairs:
            out[f"p{i}_{j}"] = pa.array(
                [int((mats[i] * mats[j]).sum())])
        return pa.table(out)

    names = (["n"] + [f"s{i}" for i in range(d)]
             + [f"p{i}_{j}" for i, j in pairs])
    red = ds.map_batches(partial, batch_format="pyarrow")
    agg = red.sum(names)
    n = int(agg["sum(n)"]) if agg and agg.get("sum(n)") is not None \
        else 0
    if n == 0:
        raise ValueError("empty input")
    mx = red.max([f"m{i}" for i in range(d)])
    s = [int(agg[f"sum(s{i})"]) for i in range(d)]
    m = [int(mx[f"max(m{i})"]) for i in range(d)]
    for i, j in pairs:
        if n * n * max(m[i], 1) * max(m[j], 1) >= (1 << 62):
            raise ValueError(
                f"int64 exactness bound exceeded for ({cols[i]}, "
                f"{cols[j]}): n²·max|v_i|·max|v_j| >= 2^62")
    P = {(i, j): int(agg[f"sum(p{i}_{j})"]) for i, j in pairs}
    var = {i: n * P[(i, i)] - s[i] * s[i] for i in range(d)}
    ca, cb, cn, cc = [], [], [], []
    for i, j in pairs:
        ca.append(cols[i])
        cb.append(cols[j])
        cn.append(n)
        if var[i] == 0 or var[j] == 0:
            cc.append(None)
        else:
            num = float(n * P[(i, j)] - s[i] * s[j])
            cc.append(num / (np.sqrt(float(var[i]))
                             * np.sqrt(float(var[j]))))
    return pa.table({"col_a": pa.array(ca), "col_b": pa.array(cb),
                     "n": pa.array(cn, type=pa.int64()),
                     "corr": pa.array(cc, type=pa.float64())})


def quantile_map(ds: Dataset, group_col: str, value_col: str,
                 ref_group, id_col: str,
                 out_col: str | None = None,
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Quantile mapping / CDF matching — align every group's value
    distribution onto the REFERENCE group's empirical distribution
    (quantile normalization's unequal-group-size sibling; the classic
    domain-adaptation / batch-effect-correction transform). Each row
    maps to the reference order statistic at the same quantile
    position:

        idx    = ceil(rank_g · n_ref / n_g)      (1-based, exact ints)
        mapped = ref's idx-th smallest value

    with ``rank_g`` the row's 1-based ``row_number`` within its group
    ordered by (value, ``id_col``) — the id tie-break pins WHICH of
    two equal-valued rows receives which order statistic, so the SQL
    window twin matches bit-for-bit. Values must be integer-valued; mapped
    outputs are existing reference values (exact, no arithmetic).
    Reference rows map onto themselves (identity).

    Scale shape: the reference CDF is ONE ``groupby(value)`` count
    exchange collapsed to (distinct value, cumulative count) — bounded
    by the distinct-value cardinality, broadcast to every task — plus
    ONE bucketed exchange on the group for in-task ranking
    (lexsort + run offsets; no per-row Python). The corpus itself
    never lands on the driver.
    """
    import ray as _ray

    from .partition import broadcast_get

    out_name = out_col or f"{value_col}_qm"

    def prep(t: pa.Table) -> pa.Table:
        v = t[value_col]
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_kleene(ok, pc.invert(pc.is_nan(v)))
        t = t.filter(pc.fill_null(ok, False))
        vv = _np(t[value_col])
        if not np.all(vv == np.floor(vv)):
            raise ValueError("quantile_map: values must be "
                             "integer-valued; quantize first")
        return t

    clean = ds.map_batches(prep, batch_format="pyarrow").materialize()

    # reference CDF: distinct value -> count, via one tiny groupby
    ref = clean.map_batches(
        lambda t: t.filter(pc.equal(t[group_col], ref_group)),
        batch_format="pyarrow") \
        .groupby(value_col).count().to_pandas()
    if ref.empty:
        raise ValueError(
            f"quantile_map: reference group {ref_group!r} has no rows")
    ref = ref.sort_values(value_col).reset_index(drop=True)
    ref_vals = ref[value_col].to_numpy().astype(np.int64)
    ref_cum = ref["count()"].to_numpy().astype(np.int64).cumsum()
    n_ref = int(ref_cum[-1])
    ref_ref = _ray.put((ref_vals, ref_cum))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            sch = tbl.schema
            return pa.table(
                {n: pa.array([], type=sch.field(n).type)
                 for n in sch.names}
                | {out_name: pa.array([], type=pa.int64())})
        rvals, rcum = broadcast_get(ref_ref)
        tbl = sort_table(tbl, [group_col, value_col, id_col])
        starts = np.flatnonzero(
            entity_group_starts(tbl, group_col))
        counts = np.diff(np.r_[starts, len(tbl)])
        if counts.max() * n_ref >= 2 ** 62:
            raise ValueError("quantile_map: n_group*n_ref >= 2^62 — "
                             "rank index would overflow int64")
        n_g = np.repeat(counts, counts).astype(np.int64)
        rk = (np.arange(len(tbl), dtype=np.int64)
              - np.repeat(starts, counts) + 1)
        idx = (rk * n_ref + n_g - 1) // n_g          # 1..n_ref exact
        pos = np.searchsorted(rcum, idx, side="left")
        return tbl.append_column(out_name, pa.array(rvals[pos]))

    return bucketed_apply(clean, group_col, per_bucket, num_buckets,
                          drop_bucket=True)


# Poisson(1) CDF thresholds scaled to uint32 — floor(CDF(k)·2^32) for
# k = 0..7. Weight = #{k : h >= T_k} ∈ 0..8, a PURE INTEGER ladder the
# SQL twin reproduces with the same literals (no float anywhere).
_POISSON1_T32 = np.array([1580030168, 3160060337, 3950075421,
                          4213413783, 4279248373, 4292415291,
                          4294609777, 4294923276], dtype=np.uint64)


def poisson_bootstrap(ds: Dataset, group_col: str, value_col: str,
                      id_col: str, n_boot: int = 16,
                      seed: int = 11) -> Dataset:
    """Poisson bootstrap — the streaming, shuffle-free bootstrap for
    group-mean uncertainty at web scale (each row enters resample ``b``
    with weight ~ Poisson(1), independently per row — no resampling
    pass over the data is ever materialized). Weights are DETERMINISTIC:

        h(id, b) = ((id mod 2^20) · (2654435761 + 2630847822·b)
                    + seed · 1315423911)  mod 2^32
        w(id, b) = #{k : h >= floor(CDF_Pois(1)(k) · 2^32)} ∈ 0..8

    — the multiplier varies MULTIPLICATIVELY with ``b`` (the repo's
    epoch_order lesson: an additive-in-b term would make resamples
    near-identical), every term < 2^63 so a BIGINT SQL twin reproduces
    each weight bit-for-bit, and the Poisson inverse-CDF is a pure
    integer ladder (no float comparisons).

    Emits one row per (group, b): ``n_eff`` (Σw), ``s`` (Σw·v, exact
    int64 — values must be integer-valued) and ``mean`` = s/n_eff (ONE
    division; null when n_eff = 0). Scale shape: per-block partial
    sums via ``np.add.at`` int64 scatters ride ONE tiny
    groupby(group, b) exchange — #groups·n_boot rows out, the data
    never shuffles."""
    if n_boot < 1 or n_boot > 64:
        raise ValueError("poisson_bootstrap: n_boot must be in 1..64")
    B = n_boot

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "b": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "s_part": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        v = _np(t[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("poisson_bootstrap: values must be "
                             "integer-valued; quantize first")
        v = v.astype(np.int64)
        ids = _np(t[id_col]).astype(np.uint64) % np.uint64(1 << 20)
        b = np.arange(B, dtype=np.uint64)
        mult = np.uint64(2654435761) + np.uint64(2630847822) * b
        h = (ids[:, None] * mult[None, :]
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        w = np.searchsorted(_POISSON1_T32, h.ravel(),
                            side="right").reshape(len(t), B) \
            .astype(np.int64)
        g = t[group_col].to_numpy(zero_copy_only=False)
        ug, gi = np.unique(g, return_inverse=True)
        key = gi[:, None] * B + np.arange(B)[None, :]
        n_cells = len(ug) * B
        n_part = np.zeros(n_cells, np.int64)
        s_part = np.zeros(n_cells, np.int64)
        np.add.at(n_part, key.ravel(), w.ravel())
        np.add.at(s_part, key.ravel(), (w * v[:, None]).ravel())
        return pa.table({
            group_col: pa.array(np.repeat(ug, B)),
            "b": pa.array(np.tile(np.arange(B, dtype=np.int64),
                                  len(ug))),
            "n_part": pa.array(n_part),
            "s_part": pa.array(s_part)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby([group_col, "b"]).aggregate(
        Sum("n_part", alias_name="n_eff"),
        Sum("s_part", alias_name="s"))

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n_eff" not in t.column_names:
            return pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                             "b": pa.array([], pa.int64()),
                             "n_eff": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "mean": pa.array([], pa.float64())})
        n = t["n_eff"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(n > 0, s / np.maximum(n, 1), np.nan)
        return pa.table({group_col: t[group_col], "b": t["b"],
                         "n_eff": pa.array(n), "s": pa.array(s),
                         "mean": pa.array(mean, mask=n == 0)})

    return agg.map_batches(finish, batch_format="pyarrow")


def touch_attribution(ds: Dataset, user_col: str, ts_col: str,
                      type_col: str, value_col: str, id_col: str,
                      conv_type: str, touch_types: Sequence[str],
                      window_us: int, mode: str = "linear",
                      num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Marketing-style multi-touch attribution — split each
    conversion's value across the user's preceding touch events within
    a lookback window (the classic first-touch / last-touch / linear
    credit models; the event-analytics sibling of
    :func:`funnel_counts`).

    A touch qualifies for a conversion when it belongs to
    ``touch_types``, happened within ``window_us`` microseconds before
    the conversion, and strictly precedes it in (ts, id) order (tie
    ties deterministically). ``mode``:

    * ``"first"`` / ``"last"`` — full value to the earliest / latest
      qualifying touch,
    * ``"linear"`` — largest-remainder equal split of the integer
      value: ``base = total // k`` with the first ``total % k``
      touches in (ts, id) order getting one extra unit — allocations
      sum EXACTLY to the total (the ``prorate_by_group`` convention).

    Values must be integer-valued and non-negative (floor-division /
    modulo sign semantics differ between numpy and SQL on negatives —
    loud reject). Conversions with no qualifying touch emit one row
    with a NULL ``touch_id`` carrying the full value, so credit is
    conserved corpus-wide. ONE bucketed exchange on the user; per
    bucket everything is prefix-count + searchsorted vectorized."""
    if mode not in ("first", "last", "linear"):
        raise ValueError(f"touch_attribution: unknown mode {mode!r}")
    if window_us <= 0:
        raise ValueError("touch_attribution: window_us must be > 0")
    touch_set = set(touch_types)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"conv_id": pa.array([], pa.int64()),
                          "touch_id": pa.array([], pa.int64()),
                          "alloc": pa.array([], pa.int64())})
        if len(tbl) == 0:
            return empty
        tbl = sort_table(tbl, [user_col, ts_col, id_col])
        ts = tbl[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        tsv = _np(ts).astype(np.int64)
        ids = _np(tbl[id_col]).astype(np.int64)
        typ = tbl[type_col].to_numpy(zero_copy_only=False)
        val = _np(tbl[value_col])
        if not np.all(val == np.floor(val)):
            raise ValueError("touch_attribution: values must be "
                             "integer-valued; quantize first")
        val = val.astype(np.int64)
        is_t = np.isin(typ, list(touch_set))
        is_c = typ == conv_type
        if is_c.any() and val[is_c].min() < 0:
            raise ValueError("touch_attribution: conversion values "
                             "must be non-negative")
        useg = np.flatnonzero(entity_group_starts(tbl, user_col))
        ucnt = np.diff(np.r_[useg, len(tbl)])
        # prefix count of touches, restarting per user
        cum = np.cumsum(is_t)
        base_at = np.repeat(cum[useg] - is_t[useg], ucnt)
        tpre = cum - base_at           # touches at-or-before each row
        n_before = tpre - is_t         # strictly before (ts,id) order
        # per-user touch arrays
        t_pos = np.flatnonzero(is_t)
        t_ts = tsv[t_pos]
        convs = np.flatnonzero(is_c)
        if len(convs) == 0:
            return empty
        out_conv, out_touch, out_alloc = [], [], []
        # vectorized window bounds: for conv row r in user u, the
        # touch indices live in the GLOBAL t_pos order; user u's
        # touches occupy [t_user_start[u], t_user_start[u]+n_touch_u).
        user_of_row = np.repeat(np.arange(len(useg)), ucnt)
        u_t0 = (cum[useg] - is_t[useg])
        hi = n_before[convs] + u_t0[user_of_row[convs]]
        # lower bound via searchsorted per user segment on t_ts
        lo = np.empty(len(convs), np.int64)
        for ui in np.unique(user_of_row[convs]):
            seg0 = u_t0[ui]
            seg1 = u_t0[ui + 1] if ui + 1 < len(useg) else len(t_pos)
            m = user_of_row[convs] == ui
            lo[m] = seg0 + np.searchsorted(
                t_ts[seg0:seg1], tsv[convs[m]] - window_us,
                side="left")
        k = np.maximum(hi - lo, 0)
        total = val[convs]
        # unattributed conversions
        miss = k == 0
        out_conv.append(ids[convs[miss]])
        out_touch.append(np.full(int(miss.sum()), -1, np.int64))
        out_alloc.append(total[miss])
        miss_mask = miss.copy()
        some = ~miss
        if some.any():
            ci = convs[some]
            ks = k[some]
            los = lo[some]
            tot = total[some]
            if mode == "first":
                tix = t_pos[los]
                out_conv.append(ids[ci])
                out_touch.append(ids[tix])
                out_alloc.append(tot)
            elif mode == "last":
                tix = t_pos[los + ks - 1]
                out_conv.append(ids[ci])
                out_touch.append(ids[tix])
                out_alloc.append(tot)
            else:
                offs = (np.arange(int(ks.sum()))
                        - np.repeat(np.cumsum(ks) - ks, ks))
                tix = t_pos[np.repeat(los, ks) + offs]
                base = np.repeat(tot // ks, ks)
                rem = np.repeat(tot % ks, ks)
                alloc = base + (offs < rem).astype(np.int64)
                out_conv.append(np.repeat(ids[ci], ks))
                out_touch.append(ids[tix])
                out_alloc.append(alloc)
        conv_a = np.concatenate(out_conv)
        touch_a = np.concatenate(out_touch)
        alloc_a = np.concatenate(out_alloc)
        null_mask = touch_a == -1
        # only the unattributed sentinel rows are null
        n_miss = int(miss_mask.sum())
        null_flags = np.zeros(len(touch_a), bool)
        null_flags[:n_miss] = True
        return pa.table({
            "conv_id": pa.array(conv_a),
            "touch_id": pa.array(touch_a, mask=null_flags),
            "alloc": pa.array(alloc_a)})

    return bucketed_apply(ds, user_col, per_bucket, num_buckets,
                          drop_bucket=False)


def ks_test_by_group(ds: Dataset, group_col: str, value_col: str,
                     arm_col: str,
                     num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Two-sample Kolmogorov–Smirnov test per group — the classic
    distribution-drift / A-B distribution check completing the drift
    family (PSI, CUSUM, Welch t): for each group, the KS statistic
    between arm 0 and arm 1 of the integer value column,

        d_num = max over distinct v of |F0(v)·n1 − F1(v)·n0|   (exact)
        d     = d_num / (n0·n1)                     (ONE division)
        p     = 2·exp(−2·d_num² / (n0·n1·(n0+n1)))  (asymptotic
                two-sided Smirnov approximation; round-6 — exp of a
                nonzero rational is irrational, boundary-safe)

    — the cross-multiplied integer numerator makes the max EXACT (no
    float CDF), so the SQL window twin matches the witness columns
    bit-for-bit. Groups with an empty arm yield NULL d/p.

    Scale shape: per-block distinct-(group, value, arm) count partials
    (packed-key ``np.unique``) collapse block rows to their distinct
    values, then ONE bucketed exchange on the group merges partials
    and walks each group's value-sorted cumulative counts — bounded by
    per-group distinct-value cardinality, never raw rows."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "v": pa.array([], pa.int64()),
                          "arm": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        v = _np(t[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("ks_test_by_group: values must be "
                             "integer-valued; quantize first")
        v = v.astype(np.int64)
        arm = _np(t[arm_col]).astype(np.int64)
        if not np.isin(arm, (0, 1)).all():
            raise ValueError("ks_test_by_group: arm must be "
                             "0/1-valued")
        g = t[group_col].to_numpy(zero_copy_only=False)
        ug, gi = np.unique(g, return_inverse=True)
        order = np.lexsort((arm, v, gi))
        gi, v, arm = gi[order], v[order], arm[order]
        new = np.r_[True, (gi[1:] != gi[:-1]) | (v[1:] != v[:-1])
                    | (arm[1:] != arm[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(gi)])
        return pa.table({
            group_col: pa.array(ug[gi[starts]]),
            "v": pa.array(v[starts]),
            "arm": pa.array(arm[starts]),
            "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def per_group_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "n0": pa.array([], pa.int64()),
                          "n1": pa.array([], pa.int64()),
                          "d_num": pa.array([], pa.int64()),
                          "d": pa.array([], pa.float64()),
                          "p": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = _np(t["v"]).astype(np.int64)
        arm = _np(t["arm"]).astype(np.int64)
        cnt = _np(t["cnt"]).astype(np.int64)
        ug, gi = np.unique(g, return_inverse=True)
        order = np.lexsort((arm, v, gi))
        gi, v, arm, cnt = (gi[order], v[order], arm[order],
                           cnt[order])
        # merge duplicate (g, v, arm) partials
        new = np.r_[True, (gi[1:] != gi[:-1]) | (v[1:] != v[:-1])
                    | (arm[1:] != arm[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.add.reduceat(cnt, starts)
        gi, v, arm = gi[starts], v[starts], arm[starts]
        rows = []
        for ui in range(len(ug)):
            m = gi == ui
            vv, aa, cc = v[m], arm[m], cnt[m]
            n0 = int(cc[aa == 0].sum())
            n1 = int(cc[aa == 1].sum())
            if n0 * n1 * (n0 + n1) >= 2 ** 62:
                raise ValueError("ks_test_by_group: n0*n1*(n0+n1) "
                                 ">= 2^62 — p-value product would "
                                 "overflow int64")
            uv = np.unique(vv)
            c0 = np.zeros(len(uv), np.int64)
            c1 = np.zeros(len(uv), np.int64)
            pos = np.searchsorted(uv, vv)
            np.add.at(c0, pos[aa == 0], cc[aa == 0])
            np.add.at(c1, pos[aa == 1], cc[aa == 1])
            f0 = np.cumsum(c0)
            f1 = np.cumsum(c1)
            if n0 == 0 or n1 == 0:
                rows.append((ug[ui], n0, n1, None, None, None))
                continue
            d_num = int(np.abs(f0 * n1 - f1 * n0).max())
            d = float(d_num) / (float(n0) * float(n1))
            expo = (-2.0 * (float(d_num) * float(d_num))
                    / (float(n0) * float(n1) * float(n0 + n1)))
            p = 2.0 * np.exp(expo)
            rows.append((ug[ui], n0, n1, d_num, d, float(p)))
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "n0": pa.array([r[1] for r in rows], pa.int64()),
            "n1": pa.array([r[2] for r in rows], pa.int64()),
            "d_num": pa.array([r[3] for r in rows], pa.int64()),
            "d": pa.array([r[4] for r in rows], pa.float64()),
            "p": pa.array([r[5] for r in rows], pa.float64())})

    return bucketed_apply(parts, group_col, per_group_bucket,
                          num_buckets, drop_bucket=False)


def theil_sen_by_group(ds: Dataset, group_col: str, x_col: str,
                       y_col: str, id_col: str,
                       max_group_rows: int = 20_000,
                       num_buckets: int = DEFAULT_NUM_BUCKETS
                       ) -> Dataset:
    """Per-group Theil–Sen robust slope — the median of all pairwise
    slopes ``(y_j − y_i)/(x_j − x_i)`` over pairs with distinct x
    (up to 29% outlier breakdown vs OLS's 0): the robust sibling of
    :func:`grouped_linreg`. Exactness: x/y must be integer-valued, so
    every pairwise slope is ONE float64 division of exact ints
    (bit-identical in SQL) and the median follows the repo's pinned
    ``quantile_disc`` convention (sorted value at 1-based index
    ``max(1, ceil(0.5·n_pairs))``) — equal doubles make the pick
    value-deterministic, so the twin compares STRICTLY. Output per
    group: ``n`` rows, ``n_pairs``, ``slope`` (null when no
    distinct-x pair exists).

    Scale: the pair set is O(n²) per group — the EXACT-path contract
    caps a group at ``max_group_rows`` (loud reject; sample or use
    ``grouped_linreg`` beyond). ONE bucketed exchange; the per-bucket
    kernel builds pair slopes with one triu_indices vectorized pass.
    """
    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(tbl, group_col)),
                          "n": pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "slope": pa.array([], pa.float64())})
        if len(tbl) == 0:
            return empty
        x = _np(tbl[x_col])
        y = _np(tbl[y_col])
        if not (np.all(x == np.floor(x))
                and np.all(y == np.floor(y))):
            raise ValueError("theil_sen_by_group: x and y must be "
                             "integer-valued; quantize first")
        tbl = sort_table(tbl, [group_col, x_col, id_col])
        x = _np(tbl[x_col]).astype(np.int64)
        y = _np(tbl[y_col]).astype(np.int64)
        g = tbl[group_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(entity_group_starts(tbl, group_col))
        cnt = np.diff(np.r_[starts, len(tbl)])
        rows = []
        for s, c in zip(starts, cnt):
            if c > max_group_rows:
                raise ValueError(
                    f"theil_sen_by_group: group {g[s]!r} has {c} "
                    f"rows > max_group_rows={max_group_rows} — "
                    "exact pairwise path refuses; sample first")
            xs, ys = x[s:s + c], y[s:s + c]
            ii, jj = np.triu_indices(int(c), 1)
            dx = xs[jj] - xs[ii]
            keep = dx != 0
            n_pairs = int(keep.sum())
            if n_pairs == 0:
                rows.append((g[s], int(c), 0, None))
                continue
            sl = (ys[jj] - ys[ii])[keep] / dx[keep]
            sl.sort(kind="stable")
            idx = max(1, -(-n_pairs // 2))        # ceil(0.5·n)
            rows.append((g[s], int(c), n_pairs,
                         float(sl[idx - 1])))
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
            "slope": pa.array([r[3] for r in rows], pa.float64())})

    return bucketed_apply(ds, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


def diff_in_diff(ds: Dataset, arm_col: str, period_col: str,
                 value_col: str) -> Dataset:
    """Difference-in-differences estimator — the classic 2×2 causal
    contrast completing the A/B family (Welch t, KS, PSI, bootstrap):
    with cell means ``m[arm][period]`` over the integer value column,

        did = (m₁₁ − m₁₀) − (m₀₁ − m₀₀)

    Every cell's (n, s) is an exact int64 sufficient statistic riding
    ONE tiny 4-group exchange; each mean is ONE division and ``did``
    is the fixed parenthesized IEEE expression over them — the SQL
    twin compares STRICTLY. Arms/periods must be 0/1-valued; empty
    cells null the estimate. Output: one row of cell witnesses
    (n/s per cell), means, and ``did``."""
    def partial(t: pa.Table) -> pa.Table:
        v = _np(t[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("diff_in_diff: values must be "
                             "integer-valued; quantize first")
        v = v.astype(np.int64)
        a = _np(t[arm_col]).astype(np.int64)
        p = _np(t[period_col]).astype(np.int64)
        if not (np.isin(a, (0, 1)).all()
                and np.isin(p, (0, 1)).all()):
            raise ValueError("diff_in_diff: arm and period must be "
                             "0/1-valued")
        cell = a * 2 + p
        n = np.bincount(cell, minlength=4).astype(np.int64)
        s = np.zeros(4, np.int64)
        np.add.at(s, cell, v)
        return pa.table({"cell": pa.array(np.arange(4, dtype=np.int64)),
                         "n": pa.array(n), "s": pa.array(s)})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s")) \
        .to_pandas().set_index("cell")
    n = [int(agg["n"].get(c, 0)) for c in range(4)]
    s = [int(agg["s"].get(c, 0)) for c in range(4)]
    m = [float(np.float64(s[c]) / np.float64(n[c])) if n[c] else None
         for c in range(4)]
    did = None
    if all(n):
        did = float((m[3] - m[2]) - (m[1] - m[0]))
    cols = {}
    for c, (an, pn) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        cols[f"n{an}{pn}"] = pa.array([n[c]], pa.int64())
        cols[f"s{an}{pn}"] = pa.array([s[c]], pa.int64())
        cols[f"m{an}{pn}"] = pa.array([m[c]], pa.float64())
    cols["did"] = pa.array([did], pa.float64())
    import ray.data as rd
    return rd.from_arrow(pa.table(cols))


def burstiness_by_entity(ds: Dataset, entity_col: str, ts_col: str,
                         id_col: str,
                         num_buckets: int = DEFAULT_NUM_BUCKETS
                         ) -> Dataset:
    """Inter-arrival burstiness (Goh & Barabási 2008) per entity:
    with μ, σ the mean/std of the consecutive inter-arrival gaps
    (events ordered by (ts, id), timestamps µs int64),

        B = (σ − μ) / (σ + μ)   ∈ (−1, 1)

    — B≈−1 periodic, ≈0 Poisson, →1 extremely bursty. Exactness:
    gaps are exact int64; the sufficient statistics (n_gaps, Σd, Σd²)
    ride as witnesses; σ = sqrt((n·Σd² − (Σd)²)) / n is taken via the
    population form with EXACT integer radicand so B is one fixed
    expression — the SQL twin (HUGEINT-exact radicand) compares
    STRICTLY. Entities with < 2 events yield nulls. ONE bucketed
    exchange, diff/reduceat per bucket; ``n·max_gap² < 2^62``
    checked."""
    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({entity_col: pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "sum_d": pa.array([], pa.int64()),
                          "sum_d2": pa.array([], pa.int64()),
                          "b": pa.array([], pa.float64())})
        if len(tbl) == 0:
            return empty
        tbl = sort_table(tbl, [entity_col, ts_col, id_col])
        ts = tbl[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        ent = tbl[entity_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(entity_group_starts(tbl, entity_col))
        cnt = np.diff(np.r_[starts, len(tbl)])
        d = np.diff(tsv)
        rows = []
        for s, c in zip(starts, cnt):
            if c < 2:
                rows.append((ent[s], 0, 0, 0, None))
                continue
            g = d[s:s + c - 1]
            n = int(c - 1)
            mg = int(g.max())
            if n * mg * mg >= 2 ** 62:
                raise ValueError("burstiness_by_entity: n*max_gap^2 "
                                 ">= 2^62 — rescale timestamps")
            sd = int(g.sum())
            sd2 = int((g * g).sum())
            rad = n * sd2 - sd * sd          # exact int >= 0
            sig = np.sqrt(np.float64(rad))
            mu = np.float64(sd)
            b = float((sig - mu) / (sig + mu)) if rad or sd else None
            rows.append((ent[s], n, sd, sd2, b))
        return pa.table({
            entity_col: pa.array([r[0] for r in rows]),
            "n_gaps": pa.array([r[1] for r in rows], pa.int64()),
            "sum_d": pa.array([r[2] for r in rows], pa.int64()),
            "sum_d2": pa.array([r[3] for r in rows], pa.int64()),
            "b": pa.array([r[4] for r in rows], pa.float64())})

    return bucketed_apply(ds, entity_col, per_bucket, num_buckets,
                          drop_bucket=False)


def slice_gaps(ds: Dataset, dim_cols: Sequence[str],
               value_col: str) -> Dataset:
    """One-dimension slice auditing (SliceFinder-lite) — for every
    categorical dimension value, how far does the slice's mean value
    sit from the global mean, and how significant is the gap: the
    model-debugging / data-auditing pass that surfaces "orders from
    segment X run 2σ hot". Per slice (dim, val):

        n, s   — exact int64 witnesses
        mean   = s/n                     (ONE division)
        gap    = s/n − S/N               (fixed expression)
        score  = gap · sqrt(n)           (the z-score shape up to the
                                          pooled-σ factor — rank by
                                          |score|)

    Every float is one fixed IEEE expression over exact ints — the
    UNION-ALL GROUP BY SQL twin compares STRICTLY (ranking is left to
    the consumer; the driver compare is order-insensitive). ONE tiny
    (dims × values)-bounded exchange of per-block partials."""
    if not dim_cols:
        raise ValueError("slice_gaps: need at least one dimension")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"dim": pa.array([], pa.string()),
                          "val": pa.array([], pa.string()),
                          "n_part": pa.array([], pa.int64()),
                          "s_part": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        v = _np(t[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("slice_gaps: values must be "
                             "integer-valued; quantize first")
        v = v.astype(np.int64)
        outs = []
        for dc in dim_cols:
            g = pc.cast(t[dc], pa.string()) \
                .to_numpy(zero_copy_only=False)
            ug, gi = np.unique(g, return_inverse=True)
            n = np.bincount(gi, minlength=len(ug)).astype(np.int64)
            s = np.zeros(len(ug), np.int64)
            np.add.at(s, gi, v)
            outs.append(pa.table({
                "dim": pa.array(np.full(len(ug), dc)),
                "val": pa.array(ug),
                "n_part": pa.array(n),
                "s_part": pa.array(s)}))
        return pa.concat_tables(outs)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["dim", "val"]).aggregate(
            Sum("n_part", alias_name="n"),
            Sum("s_part", alias_name="s")).to_pandas()
    if agg.empty:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "dim": pa.array([], pa.string()),
            "val": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "mean": pa.array([], pa.float64()),
            "gap": pa.array([], pa.float64()),
            "score": pa.array([], pa.float64())}))
    d0 = agg[agg["dim"] == dim_cols[0]]
    N = int(d0["n"].sum())
    S = int(d0["s"].sum())
    n = agg["n"].to_numpy().astype(np.int64)
    s = agg["s"].to_numpy().astype(np.int64)
    mean = s / np.maximum(n, 1).astype(np.float64)
    gmean = np.float64(S) / np.float64(N)
    gap = mean - gmean
    score = gap * np.sqrt(n.astype(np.float64))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "dim": pa.array(agg["dim"].to_numpy()),
        "val": pa.array(agg["val"].to_numpy()),
        "n": pa.array(n), "s": pa.array(s),
        "mean": pa.array(mean), "gap": pa.array(gap),
        "score": pa.array(score)}))


def lorenz_deciles(ds: Dataset, group_col: str, value_col: str,
                   id_col: str, n_points: int = 10,
                   num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Lorenz-curve points per group — the concentration curve behind
    :func:`gini_by_group` (what share of total value do the bottom
    k/n_points of rows hold?): values sorted ascending (ties by id),
    at each decile boundary ``pos_k = ceil(k·n/n_points)`` report the
    EXACT integer cumulative sum and its share

        share_k = cum_k / total        (ONE division; null when
                                        total = 0)

    Values must be integer-valued and non-negative (a Lorenz curve
    over mixed-sign values is not monotone — loud reject). Exact
    int64 witnesses (n, pos, cum, total) make the window-cumsum SQL
    twin STRICT. ONE bucketed exchange; per-group sort + cumsum +
    one searchsorted per boundary ladder."""
    if n_points < 2:
        raise ValueError("lorenz_deciles: n_points must be >= 2")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(tbl, group_col)),
                          "k": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "cum": pa.array([], pa.int64()),
                          "total": pa.array([], pa.int64()),
                          "share": pa.array([], pa.float64())})
        if len(tbl) == 0:
            return empty
        v = _np(tbl[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("lorenz_deciles: values must be "
                             "integer-valued; quantize first")
        if len(v) and v.min() < 0:
            raise ValueError("lorenz_deciles: values must be "
                             "non-negative")
        tbl = sort_table(tbl, [group_col, value_col, id_col])
        v = _np(tbl[value_col]).astype(np.int64)
        g = tbl[group_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(entity_group_starts(tbl, group_col))
        cnt = np.diff(np.r_[starts, len(tbl)])
        rows = []
        for s, c in zip(starts, cnt):
            vv = v[s:s + c]
            cum = np.cumsum(vv)
            total = int(cum[-1])
            for k in range(1, n_points + 1):
                pos = -(-k * int(c) // n_points)   # ceil
                ck = int(cum[pos - 1])
                share = ck / np.float64(total) if total else None
                rows.append((g[s], k, pos, ck, total, share))
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "pos": pa.array([r[2] for r in rows], pa.int64()),
            "cum": pa.array([r[3] for r in rows], pa.int64()),
            "total": pa.array([r[4] for r in rows], pa.int64()),
            "share": pa.array([r[5] for r in rows], pa.float64())})

    return bucketed_apply(ds, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


def trimmed_mean_by_group(ds: Dataset, group_col: str,
                          value_col: str, id_col: str,
                          trim: float = 0.1,
                          num_buckets: int = DEFAULT_NUM_BUCKETS
                          ) -> Dataset:
    """Per-group trimmed mean — the robust location estimate between
    the mean and the median (complements :func:`winsorize`, which
    CLIPS; trimming DROPS): sort by (value, id), drop exactly
    ``t = floor(trim·n)`` rows from EACH end, and report

        n, t, s_kept (exact int64)    mean_t = s_kept / (n − 2t)

    — one division of exact ints, so the row_number window twin
    compares STRICTLY. Values must be integer-valued; groups with
    ``n − 2t ≤ 0`` yield null. ONE bucketed exchange; per-group
    cumsum-difference, no per-row Python."""
    if not (0.0 <= trim < 0.5):
        raise ValueError("trimmed_mean_by_group: trim must be in "
                         "[0, 0.5)")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(tbl, group_col)),
                          "n": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64()),
                          "s_kept": pa.array([], pa.int64()),
                          "mean_t": pa.array([], pa.float64())})
        if len(tbl) == 0:
            return empty
        v = _np(tbl[value_col])
        if not np.all(v == np.floor(v)):
            raise ValueError("trimmed_mean_by_group: values must be "
                             "integer-valued; quantize first")
        tbl = sort_table(tbl, [group_col, value_col, id_col])
        v = _np(tbl[value_col]).astype(np.int64)
        g = tbl[group_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(entity_group_starts(tbl, group_col))
        cnt = np.diff(np.r_[starts, len(tbl)])
        cum = np.cumsum(v)
        rows = []
        for s, c in zip(starts, cnt):
            n = int(c)
            t = int(trim * n)
            kept = n - 2 * t
            if kept <= 0:
                rows.append((g[s], n, t, 0, None))
                continue
            hi = int(cum[s + n - t - 1])
            lo = int(cum[s + t - 1]) if t else \
                (int(cum[s - 1]) if s else 0)
            if t == 0:
                lo = int(cum[s - 1]) if s else 0
            sk = hi - lo
            rows.append((g[s], n, t, sk,
                         float(np.float64(sk) / np.float64(kept))))
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "t": pa.array([r[2] for r in rows], pa.int64()),
            "s_kept": pa.array([r[3] for r in rows], pa.int64()),
            "mean_t": pa.array([r[4] for r in rows], pa.float64())})

    return bucketed_apply(ds, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


def cohens_kappa(ds: Dataset, a_col: str, b_col: str) -> Dataset:
    """Cohen's κ inter-annotator agreement between two label columns
    — the annotation-quality companion to the majority-vote
    aggregator: with exact counts ``n``, ``agree`` and per-label
    marginals,

        po = agree / n
        pe = Σ_l n_a(l)·n_b(l) / n²
        κ  = (po − pe) / (1 − pe)

    — every input an exact int64 (per-block label-pair bincount
    partials through ONE label-bounded exchange) and po/pe/κ fixed
    IEEE expressions, so the SQL twin compares STRICTLY (κ null when
    pe = 1, the degenerate single-label case). Labels must be small
    non-negative ints."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"la": pa.array([], pa.int64()),
                          "lb": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        a = _np(t[a_col]).astype(np.int64)
        b = _np(t[b_col]).astype(np.int64)
        if len(a) and (a.min() < 0 or b.min() < 0):
            raise ValueError("cohens_kappa: labels must be "
                             "non-negative ints")
        if len(a) and max(int(a.max()), int(b.max())) > 10 ** 6:
            raise ValueError("cohens_kappa: label space too large")
        k = max(int(a.max()), int(b.max())) + 1 if len(a) else 1
        key = a * k + b
        u, c = np.unique(key, return_counts=True)
        return pa.table({"la": pa.array((u // k).astype(np.int64)),
                         "lb": pa.array((u % k).astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["la", "lb"]).aggregate(
            Sum("cnt", alias_name="cnt")).to_pandas()
    import ray.data as rd
    if agg.empty:
        raise ValueError("cohens_kappa: empty input")
    la = agg["la"].to_numpy().astype(np.int64)
    lb = agg["lb"].to_numpy().astype(np.int64)
    c = agg["cnt"].to_numpy().astype(np.int64)
    n = int(c.sum())
    agree = int(c[la == lb].sum())
    k = int(max(la.max(), lb.max())) + 1
    na = np.zeros(k, np.int64)
    nb = np.zeros(k, np.int64)
    np.add.at(na, la, c)
    np.add.at(nb, lb, c)
    s = int((na * nb).sum())
    po = np.float64(agree) / np.float64(n)
    pe = np.float64(s) / (np.float64(n) * np.float64(n))
    kappa = float((po - pe) / (1.0 - pe)) if pe != 1.0 else None
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "agree": pa.array([agree], pa.int64()),
        "s_marg": pa.array([s], pa.int64()),
        "po": pa.array([float(po)], pa.float64()),
        "pe": pa.array([float(pe)], pa.float64()),
        "kappa": pa.array([kappa], pa.float64())}))


def spearman_by_group(ds: Dataset, group_col: str, x_col: str,
                      y_col: str,
                      num_buckets: int = DEFAULT_NUM_BUCKETS
                      ) -> Dataset:
    """Per-group Spearman rank correlation — Pearson over
    tie-averaged ranks, completing the correlation family
    (:func:`grouped_corr` is Pearson on values; Spearman is the
    monotone-robust sibling). Exactness: tie-averaged ranks are exact
    in HALVES (the AUC r2 trick), so the op carries ``d = 2·rank``
    int64 and the five sufficient statistics (n, Σdx, Σdx², Σdy²,
    Σdxdy — Σdy = Σdx by construction) are exact ints;

        ρ = (n·Σdxdy − Σdx·Σdy) /
            (sqrt(n·Σdx² − Σdx²̂)·sqrt(n·Σdy² − Σdy²̂))

    is the corr_matrix two-sqrt fixed expression (HUGEINT-exact
    differences in the twin) — STRICT. Values must be
    integer-valued; zero-variance sides yield null; the
    ``n³ < 2^62``-ish bound follows from d ≤ 2n (checked)."""
    def per_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(tbl, group_col)),
                          "n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.int64()),
                          "sxx": pa.array([], pa.int64()),
                          "syy": pa.array([], pa.int64()),
                          "sxy": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.float64())})
        if len(tbl) == 0:
            return empty
        xv = _np(tbl[x_col])
        yv = _np(tbl[y_col])
        if not (np.all(xv == np.floor(xv))
                and np.all(yv == np.floor(yv))):
            raise ValueError("spearman_by_group: values must be "
                             "integer-valued; quantize first")
        tbl = sort_table(tbl, [group_col])
        x = _np(tbl[x_col]).astype(np.int64)
        y = _np(tbl[y_col]).astype(np.int64)
        g = tbl[group_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(entity_group_starts(tbl, group_col))
        cnt = np.diff(np.r_[starts, len(tbl)])

        def double_ranks(v):
            # 2*average-rank per element (ties share), 1-based
            order = np.argsort(v, kind="stable")
            sv = v[order]
            newv = np.r_[True, sv[1:] != sv[:-1]]
            rst = np.flatnonzero(newv)
            rc = np.diff(np.r_[rst, len(sv)])
            # run of c elements starting at 0-based pos p:
            # 2*avg rank = 2p + c + 1
            d_run = 2 * rst + rc + 1
            d = np.empty(len(sv), np.int64)
            d[order] = np.repeat(d_run, rc)
            return d

        rows = []
        for s, c in zip(starts, cnt):
            n = int(c)
            if 8 * n ** 3 >= 2 ** 62:
                raise ValueError("spearman_by_group: group too "
                                 "large for exact int64 rank stats")
            dx = double_ranks(x[s:s + c])
            dy = double_ranks(y[s:s + c])
            sx = int(dx.sum())
            sxx = int((dx * dx).sum())
            syy = int((dy * dy).sum())
            sxy = int((dx * dy).sum())
            num = n * sxy - sx * sx        # Σdy == Σdx
            vx = n * sxx - sx * sx
            vy = n * syy - sx * sx
            if vx == 0 or vy == 0:
                rho = None
            else:
                rho = float(np.float64(num)
                            / (np.sqrt(np.float64(vx))
                               * np.sqrt(np.float64(vy))))
            rows.append((g[s], n, sx, sxx, syy, sxy, rho))
        return pa.table({
            group_col: pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "sx": pa.array([r[2] for r in rows], pa.int64()),
            "sxx": pa.array([r[3] for r in rows], pa.int64()),
            "syy": pa.array([r[4] for r in rows], pa.int64()),
            "sxy": pa.array([r[5] for r in rows], pa.int64()),
            "rho": pa.array([r[6] for r in rows], pa.float64())})

    return bucketed_apply(ds, group_col, per_bucket, num_buckets,
                          drop_bucket=False)
