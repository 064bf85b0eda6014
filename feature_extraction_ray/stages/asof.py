"""Point-in-time as-of join over Ray Data datasets.

The reference only ever attaches point-in-time metadata implicitly — rows
are ordered by (``date``,``time``,``segment_start``) and metadata joined by
date-truncated keys (``group_audio_files.py:26-28``,
``kaldi_asr_features/extract_timing_feats.py:71-72``) — so features never
see data past their position. This module makes that a first-class
operator with zero temporal leakage: a left row at time ``t`` only ever
matches right rows with ``ts ≤ t`` (``direction="backward"``,
``allow_exact_matches=True``).

Two physical plans:

* **broadcast** (small right side — the reference's metadata/duration
  tables, ``extract_timing_features.py:30-37``): the right table is sorted
  once, ``ray.put`` once, and every map task merges its batch against it.
  No shuffle.
* **partitioned** (both sides large): both sides are tagged and unioned
  under a common schema, bucketed by ``hash(entity) % B`` (one shuffle),
  and each bucket does a per-entity ordered merge. The merge itself runs on
  (entity, ts, row-position) key frames via ``pandas.merge_asof`` (cython
  two-pointer, ``by=`` entity) and payload columns — including
  ``list<int32>`` tokens — are gathered afterwards with a null-aware Arrow
  ``take``, so wide payloads never round-trip through pandas.

Tie-breaking: among right rows with equal (entity, ts) the **last one in
``right_order_cols`` order** wins (latest-knowledge semantics). Pass
``right_order_cols`` to pin determinism when duplicate timestamps exist.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .window import bucketed_apply, DEFAULT_NUM_BUCKETS

_ENT = "__asof_ent"
_TS = "__asof_ts"
_SIDE = "__asof_side"
_POS = "__asof_pos"


def _normalize_keys(tbl: pa.Table, by: str, on: str,
                    ent_type: pa.DataType) -> pa.Table:
    """Append normalized entity/ts key columns (shared dtypes across sides)."""
    ent = tbl[by].cast(ent_type) if tbl[by].type != ent_type else tbl[by]
    ts = tbl[on]
    if pa.types.is_timestamp(ts.type):
        # normalize to µs FIRST: the two sides may carry different units
        # (e.g. an upstream engine emitting timestamp[s]) and a raw int64
        # view would compare seconds against microseconds
        ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
    elif not pa.types.is_integer(ts.type):
        ts = ts.cast(pa.float64())
    tbl = tbl.append_column(_ENT, ent)
    tbl = tbl.append_column(_TS, ts.cast(pa.int64())
                            if pa.types.is_integer(ts.type) else ts)
    return tbl


def _common_entity_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    if lt == rt:
        return lt
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        return pa.int64()
    return pa.large_utf8()


def _merge_keyframes(left_ent, left_ts, right_ent, right_ts,
                     direction: str, tolerance, allow_exact_matches: bool):
    """Two-pointer as-of match on key arrays → right positions (-1 = none).

    Both sides must be sorted by ts (globally); entity grouping handled by
    pandas ``by=``.
    """
    if len(right_ts) == 0:
        return np.full(len(left_ts), -1, dtype=np.int64)
    # pandas requires identical key dtypes; empty/py-list inputs drift
    right_ts = np.asarray(right_ts).astype(np.asarray(left_ts).dtype,
                                           copy=False)
    lf = pd.DataFrame({_ENT: left_ent, _TS: left_ts,
                       _POS: np.arange(len(left_ts), dtype=np.int64)})
    rf = pd.DataFrame({_ENT: right_ent, _TS: right_ts,
                       "__rpos": np.arange(len(right_ts), dtype=np.int64)})
    merged = pd.merge_asof(lf, rf, on=_TS, by=_ENT, direction=direction,
                           tolerance=tolerance,
                           allow_exact_matches=allow_exact_matches)
    rpos = merged["__rpos"].to_numpy()
    lpos = merged[_POS].to_numpy()
    # restore left order: merged is sorted by ts; map back via lpos
    out = np.full(len(left_ts), -1, dtype=np.int64)
    valid = ~pd.isna(rpos)
    out[lpos[valid]] = rpos[valid].astype(np.int64)
    return out


def _gather_right(left_tbl: pa.Table, right_tbl: pa.Table,
                  right_value_cols: Sequence[str], rpos: np.ndarray,
                  suffix: str) -> pa.Table:
    idx = pa.array(np.clip(rpos, 0, max(len(right_tbl) - 1, 0)),
                   mask=rpos < 0)
    out = left_tbl
    for c in right_value_cols:
        name = f"{c}{suffix}" if c in left_tbl.column_names else c
        if len(right_tbl) == 0:
            col = pa.nulls(len(left_tbl), type=right_tbl.schema.field(c).type)
        else:
            rc = right_tbl[c]
            if isinstance(rc, pa.ChunkedArray):
                rc = rc.combine_chunks()
            col = rc.take(idx)
        out = out.append_column(name, col)
    return out


def asof_join(left: Dataset, right: Dataset, *,
              left_by: str, right_by: str,
              left_on: str, right_on: str,
              right_value_cols: Sequence[str],
              direction: str = "backward",
              tolerance=None,
              allow_exact_matches: bool = True,
              right_order_cols: Sequence[str] = (),
              broadcast: bool = False,
              num_buckets: int = DEFAULT_NUM_BUCKETS,
              suffix: str = "_r",
              post_fn=None,
              salt_hot: dict | None = None) -> Dataset:
    """As-of join ``left`` with ``right`` on entity + event time.

    Output = all left rows + ``right_value_cols`` from the matched right row
    (null where no match). See module docstring for plan selection and
    leakage/tie semantics.

    ``post_fn`` (partitioned plan only): an Arrow ``table -> table``
    callable fused into the per-bucket merge task. The bucket it sees is
    entity-complete, so windowed enrichment (sessionize, lag, sliding) and
    even whole-group feature aggregation can run there without a second
    shuffle.
    """
    # keys are normalized to int64 microseconds for timestamp columns —
    # convert a timedelta tolerance to the same unit
    import datetime as _dt
    if isinstance(tolerance, _dt.timedelta):
        tolerance = int(tolerance.total_seconds() * 1_000_000)
    if broadcast:
        if post_fn is not None:
            raise ValueError("post_fn requires the partitioned plan")
        return _asof_broadcast(left, right, left_by=left_by,
                               right_by=right_by, left_on=left_on,
                               right_on=right_on,
                               right_value_cols=right_value_cols,
                               direction=direction, tolerance=tolerance,
                               allow_exact_matches=allow_exact_matches,
                               right_order_cols=right_order_cols,
                               suffix=suffix)
    return _asof_partitioned(left, right, left_by=left_by, right_by=right_by,
                             left_on=left_on, right_on=right_on,
                             right_value_cols=right_value_cols,
                             direction=direction, tolerance=tolerance,
                             allow_exact_matches=allow_exact_matches,
                             right_order_cols=right_order_cols,
                             num_buckets=num_buckets, suffix=suffix,
                             post_fn=post_fn, salt_hot=salt_hot)


def _prepare_right_table(right_tbl: pa.Table, right_by: str, right_on: str,
                         right_value_cols: Sequence[str],
                         right_order_cols: Sequence[str],
                         ent_type: pa.DataType) -> pa.Table:
    cols = list(dict.fromkeys([right_by, right_on, *right_value_cols,
                               *right_order_cols]))
    right_tbl = right_tbl.select(cols)
    right_tbl = _normalize_keys(right_tbl, right_by, right_on, ent_type)
    order = [(_TS, "ascending")] + [(c, "ascending") for c in right_order_cols]
    idx = pc.sort_indices(right_tbl, sort_keys=order)
    return right_tbl.take(idx)


class _BroadcastAsof:
    """Actor: holds the sorted right table (fetched once per actor) and
    as-of merges every left batch against it."""

    def __init__(self, right_ref, left_by, left_on, right_value_cols,
                 direction, tolerance, allow_exact, suffix, ent_type):
        self.right = ray.get(right_ref) if isinstance(
            right_ref, ray.ObjectRef) else right_ref
        self.right_ent = self.right[_ENT].to_numpy(zero_copy_only=False)
        self.right_ts = self.right[_TS].to_numpy(zero_copy_only=False)
        self.left_by = left_by
        self.left_on = left_on
        self.right_value_cols = right_value_cols
        self.direction = direction
        self.tolerance = tolerance
        self.allow_exact = allow_exact
        self.suffix = suffix
        self.ent_type = ent_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        keyed = _normalize_keys(batch, self.left_by, self.left_on,
                                self.ent_type)
        order = pc.sort_indices(keyed, sort_keys=[(_TS, "ascending")])
        keyed = keyed.take(order)
        rpos = _merge_keyframes(
            keyed[_ENT].to_numpy(zero_copy_only=False),
            keyed[_TS].to_numpy(zero_copy_only=False),
            self.right_ent, self.right_ts,
            self.direction, self.tolerance, self.allow_exact)
        out = _gather_right(keyed.drop_columns([_ENT, _TS]), self.right,
                            self.right_value_cols, rpos, self.suffix)
        return out


def _asof_broadcast(left: Dataset, right: Dataset, *, left_by, right_by,
                    left_on, right_on, right_value_cols, direction,
                    tolerance, allow_exact_matches, right_order_cols,
                    suffix, concurrency=(1, 8)) -> Dataset:
    right_parts = [ray.get(r) for r in right.to_arrow_refs()]
    if right_parts:
        right_tbl = pa.concat_tables(
            [t for t in right_parts if len(t)] or right_parts[:1],
            promote_options="default")
    else:
        right_tbl = pa.table({}, schema=right.schema().base_schema)
    lt = left.schema().base_schema.field(left_by).type
    ent_type = _common_entity_type(lt, right_tbl.schema.field(right_by).type)
    prepared = _prepare_right_table(right_tbl, right_by, right_on,
                                    right_value_cols, right_order_cols,
                                    ent_type)
    from .partition import cached_kernel
    ref = ray.put(prepared)

    def merge_batch(batch: pa.Table) -> pa.Table:
        # task pool + per-worker kernel memo keyed on the broadcast ref:
        # each worker fetches/indexes the right table once, and no actor
        # pool has to spin up per pipeline run
        return cached_kernel(_BroadcastAsof, ref, left_by, left_on,
                             tuple(right_value_cols), direction, tolerance,
                             allow_exact_matches, suffix, ent_type)(batch)

    return left.map_batches(merge_batch, batch_format="pyarrow")


def _salt_suffixes(ts: np.ndarray, k: int) -> np.ndarray:
    """Deterministic round-robin salt index per row (splitmix of ts)."""
    v = ts.astype(np.uint64)
    with np.errstate(over="ignore"):
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
    return (v % np.uint64(max(k, 1))).astype(np.int64)


def asof_prepare(left: Dataset, right: Dataset, *, left_by, right_by,
                 left_on, right_on, right_value_cols,
                 direction="backward", tolerance=None,
                 allow_exact_matches=True, right_order_cols=(),
                 suffix="_r", salt_hot: dict | None = None):
    """Build the partitioned plan's ingredients without running it:
    returns ``(unioned_ds, merge_fn, entity_col)`` where ``unioned_ds``
    is the side-tagged union (shuffle-ready on ``entity_col``) and
    ``merge_fn`` performs the per-bucket as-of merge. Used by
    :func:`asof_join` and by checkpointed pipelines that want to own the
    bucket loop (state/checkpoint.run_partitioned).

    ``salt_hot`` = ``{entity_value: salt_factor}`` for skewed entities
    (pick them with ``stages.partition.skew_report``): a hot entity's
    LEFT rows are deterministically spread over ``entity#s{k}`` shards
    while its RIGHT rows are REPLICATED into every shard, so each shard
    merges against the full right history — results are identical to the
    unsalted plan, but the hot key's merge work parallelizes k-ways
    (north rule: salt + repartition before the as-of merge; never under
    sessionize/windows, whose groups must stay whole)."""
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    ent_type = _common_entity_type(lschema.field(left_by).type,
                                   rschema.field(right_by).type)
    if salt_hot:
        ent_type = pa.large_utf8()   # salted keys are strings
    rcols = list(dict.fromkeys([*right_value_cols, *right_order_cols]))
    rtypes = {c: rschema.field(c).type for c in rcols}
    left_names = list(lschema.names)
    salt_hot = {str(k): int(v) for k, v in (salt_hot or {}).items()}

    def _salted_ent(tbl: pa.Table, replicate: bool):
        """Append salted _ENT; right side (replicate=True) returns an
        index expansion replicating hot rows into every shard.

        Vectorized: per-row salt factors come from a pandas map over the
        (hot-keys-only) dict, suffixes are numpy string ops + one Arrow
        ``binary_join_element_wise`` — no Python loop over rows."""
        import pandas as pd
        import pyarrow.compute as pc
        ent = tbl[_ENT]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        s = pd.Series(ent.to_pandas())
        factors = s.map(salt_hot)
        is_hot = factors.notna().to_numpy()
        ts = tbl[_TS].to_numpy(zero_copy_only=False)
        if not replicate:
            ks = _salt_suffixes(ts, 1 << 30)
            fac = factors.fillna(1).to_numpy(dtype=np.int64) \
                .astype(np.uint64)
            mod = ks.astype(np.uint64) % fac    # non-hot rows: mod 1 = 0,
            suffix = np.char.add("#s", mod.astype("U20"))  # if_else'd away
            salted = pc.binary_join_element_wise(
                ent.cast(pa.string()),
                pa.array(suffix, type=pa.string()), "")
            out = pc.if_else(pa.array(is_hot), salted,
                             ent.cast(pa.string()))
            return out.cast(ent_type), None
        reps = factors.fillna(1).to_numpy(dtype=np.int64)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), reps)
        starts = np.zeros(len(s) + 1, dtype=np.int64)
        np.cumsum(reps, out=starts[1:])
        k_of = np.arange(len(idx), dtype=np.int64) - starts[:-1][idx]
        suffix = np.char.add("#s", k_of.astype("U20"))
        base = ent.cast(pa.string()).take(pa.array(idx))
        salted = pc.binary_join_element_wise(
            base, pa.array(suffix, type=pa.string()), "")
        out = pc.if_else(pa.array(is_hot[idx]), salted, base)
        return out.cast(ent_type), idx

    def tag_left(tbl: pa.Table) -> pa.Table:
        tbl = _normalize_keys(tbl, left_by, left_on, ent_type)
        if salt_hot:
            salted, _ = _salted_ent(tbl, replicate=False)
            tbl = tbl.set_column(tbl.column_names.index(_ENT),
                                 pa.field(_ENT, ent_type), salted)
        tbl = tbl.append_column(_SIDE, pa.array(
            np.zeros(len(tbl), dtype=np.int8)))
        for c in rcols:
            name = f"__r_{c}"
            tbl = tbl.append_column(name, pa.nulls(len(tbl), type=rtypes[c]))
        return tbl

    def tag_right(tbl: pa.Table) -> pa.Table:
        tbl = _normalize_keys(tbl, right_by, right_on, ent_type)
        if salt_hot:
            salted, idx = _salted_ent(tbl, replicate=True)
            tbl = tbl.take(pa.array(idx))
            tbl = tbl.set_column(tbl.column_names.index(_ENT),
                                 pa.field(_ENT, ent_type), salted)
        out = {}
        for name in left_names:
            out[name] = pa.nulls(len(tbl), type=lschema.field(name).type)
        out[_ENT] = tbl[_ENT]
        out[_TS] = tbl[_TS]
        out[_SIDE] = pa.array(np.ones(len(tbl), dtype=np.int8))
        for c in rcols:
            out[f"__r_{c}"] = tbl[c]
        return pa.table(out)

    tagged_left = left.map_batches(tag_left, batch_format="pyarrow")
    tagged_right = right.map_batches(tag_right, batch_format="pyarrow")
    unioned = tagged_left.union(tagged_right)

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        ltbl = tbl.filter(pa.array(side == 0))
        rtbl = tbl.filter(pa.array(side == 1))
        lorder = pc.sort_indices(ltbl, sort_keys=[(_TS, "ascending")])
        ltbl = ltbl.take(lorder)
        rorder = pc.sort_indices(
            rtbl, sort_keys=[(_TS, "ascending")] +
            [(f"__r_{c}", "ascending") for c in right_order_cols])
        rtbl = rtbl.take(rorder)
        rpayload = pa.table(
            {c: rtbl[f"__r_{c}"] for c in rcols}) if rcols else rtbl
        if len(rtbl) == 0:
            rpos = np.full(len(ltbl), -1, dtype=np.int64)
        else:
            rpos = _merge_keyframes(
                ltbl[_ENT].to_numpy(zero_copy_only=False),
                ltbl[_TS].to_numpy(zero_copy_only=False),
                rtbl[_ENT].to_numpy(zero_copy_only=False),
                rtbl[_TS].to_numpy(zero_copy_only=False),
                direction, tolerance, allow_exact_matches)
        keep = ltbl.select(left_names)
        return _gather_right(keep, rpayload, right_value_cols, rpos, suffix)

    return unioned, merge_bucket, _ENT


def _asof_partitioned(left: Dataset, right: Dataset, *, left_by, right_by,
                      left_on, right_on, right_value_cols, direction,
                      tolerance, allow_exact_matches, right_order_cols,
                      num_buckets, suffix, post_fn=None,
                      salt_hot=None) -> Dataset:
    if salt_hot and post_fn is not None:
        raise ValueError(
            "salt_hot splits hot entities across shards — fused windowed "
            "post_fns need whole entities; run them as a separate stage")
    unioned, merge_fn, ent = asof_prepare(
        left, right, left_by=left_by, right_by=right_by, left_on=left_on,
        right_on=right_on, right_value_cols=right_value_cols,
        direction=direction, tolerance=tolerance,
        allow_exact_matches=allow_exact_matches,
        right_order_cols=right_order_cols, suffix=suffix,
        salt_hot=salt_hot)

    def bucket_fn(tbl):
        out = merge_fn(tbl)
        if post_fn is not None:
            out = post_fn(out)
        return out

    # bucket_fn projects away helper cols (keep = left_names);
    # BUCKET_COL was consumed by groupby and not re-emitted.
    return bucketed_apply(unioned, ent, bucket_fn,
                          num_buckets=num_buckets, drop_bucket=False)


def asof_join_autosalt(left: Dataset, right: Dataset, *,
                       left_by: str, right_by: str,
                       left_on: str, right_on: str,
                       right_value_cols, hot_share: float = 0.2,
                       max_salt: int = 8, num_buckets: int =
                       DEFAULT_NUM_BUCKETS, **kwargs) -> Dataset:
    """As-of join with measured skew handling: one cheap
    ``groupby(entity).count()`` pass sizes the entities; any entity
    holding more than ``hot_share`` of the left rows is salted with a
    factor proportional to its share (capped at ``max_salt``). The
    measurement is the step the reference never did — its equal-file
    shards let one hot subject dominate a task (SURVEY §4)."""
    from .partition import skew_report
    rep = skew_report(left, left_by)
    total = max(rep["total_rows"], 1)
    salt_hot = {}
    for ent, cnt in rep["top"]:
        share = cnt / total
        if share > hot_share:
            salt_hot[ent] = min(max_salt,
                                max(2, int(np.ceil(share * num_buckets))))
    return asof_join(left, right, left_by=left_by, right_by=right_by,
                     left_on=left_on, right_on=right_on,
                     right_value_cols=right_value_cols,
                     num_buckets=num_buckets,
                     salt_hot=salt_hot or None, **kwargs)
