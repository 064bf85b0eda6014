"""Streaming windowed operators: O(block) memory, buckets larger than RAM.

``stages/window.bucketed_apply`` materializes a whole bucket per task —
right for feature aggregation, wrong when one entity's history exceeds a
worker's heap. This module is the engine's out-of-core path, the "raw Ray
tasks as a last resort" case the driver brief allows: windowed semantics
that a ``map_batches`` actor pool cannot express because Ray Data does
not guarantee ordered batch→actor affinity.

Plan:

1. ``with_bucket`` + ``sort([bucket, entity, order...], boundaries=
   [1..B-1])`` — one all-to-all; output blocks align EXACTLY to buckets
   and are internally (entity, ts)-sorted (verified in tests).
2. Each bucket's blocks form a dependency CHAIN of Ray tasks: task *i*
   processes slice *i* with the carry state returned by task *i−1*. For
   sort-contiguous data the only entity that can span a slice boundary
   is the last one, so carry state is a handful of scalars — never the
   bucket. The driver only schedules: block REFS and carry REFS flow
   between tasks; no table ever lands on the driver.
3. Slices are bounded by ``max_rows_per_block``, so peak memory per task
   is O(slice) regardless of bucket size.
4. Chains across buckets run in PARALLEL; within a chain execution is
   sequential by construction — the price of streaming order.

Partitioning assumption (documented per the brief): an entity's rows
must all hash to one bucket — the same invariant every windowed operator
in this engine relies on.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions import windows as W
from .partition import BUCKET_COL, with_bucket


# ---------------------------------------------------------------------------
# per-slice kernels with carry state
# ---------------------------------------------------------------------------

def _lag1_block(tbl: pa.Table, carry, entity_col: str, value_col: str,
                out_col: str):
    """carry = (last_entity, last_value_scalar) of the previous slice."""
    n = len(tbl)
    if n == 0:
        return tbl.append_column(out_col, pa.array([], type=tbl.schema.field(
            value_col).type)), carry
    ent = np.asarray(tbl[entity_col].to_pylist())
    col = tbl[value_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ng = W.group_starts(ent)
    src, valid = W.lag_indices(ng, 1)
    lagged = col.take(pa.array(src.astype(np.int64), mask=~valid))
    if isinstance(lagged, pa.ChunkedArray):
        lagged = lagged.combine_chunks()
    if carry is not None and ent[0] == carry[0]:
        first = pa.array([carry[1]], type=col.type)
        lagged = pa.concat_arrays([first, lagged.slice(1)])
    new_carry = (ent[-1], col[n - 1].as_py())
    return tbl.append_column(out_col, lagged), new_carry


def _ffill_block(tbl: pa.Table, carry, entity_col: str, value_col: str,
                 out_col: str):
    """carry = (last_entity, last_non_null_value_or_None)."""
    import pyarrow.compute as pc
    n = len(tbl)
    if n == 0:
        return tbl.append_column(out_col, pa.array([], type=tbl.schema.field(
            value_col).type)), carry
    ent = np.asarray(tbl[entity_col].to_pylist())
    col = tbl[value_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
    ng = W.group_starts(ent)
    src, still = W.ffill_indices(isnull, ng)
    filled = col.take(pa.array(src.astype(np.int64), mask=still))
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    gid = np.cumsum(ng)
    # still-null rows are always the PREFIX of their entity's run; the
    # first entity's prefix takes the carried value when it continues
    if carry is not None and carry[1] is not None and ent[0] == carry[0]:
        head_null = still & (gid == 1)
        if head_null.any():
            fill_val = pa.array([carry[1]] * int(head_null.sum()),
                                type=col.type)
            filled = pc.replace_with_mask(filled, pa.array(head_null),
                                          fill_val)
    last_val = filled[n - 1].as_py()
    if last_val is None and carry is not None and ent[-1] == carry[0] \
            and gid[-1] == 1:
        last_val = carry[1]      # single-entity slice, all null, continue
    new_carry = (ent[-1], last_val)
    return tbl.append_column(out_col, filled), new_carry


def _bfill_block(tbl: pa.Table, carry, entity_col: str, value_col: str,
                 out_col: str):
    """Backward-fill; chains run in REVERSE block order, so ``carry`` is
    the FIRST entity's next non-null value from the following slice:
    carry = (first_entity, first_non_null_value_or_None)."""
    import pyarrow.compute as pc
    n = len(tbl)
    if n == 0:
        return tbl.append_column(out_col, pa.array([], type=tbl.schema.field(
            value_col).type)), carry
    ent = np.asarray(tbl[entity_col].to_pylist())
    col = tbl[value_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
    ng = W.group_starts(ent)
    src, still = W.bfill_indices(isnull, ng)
    filled = col.take(pa.array(src.astype(np.int64), mask=still))
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    gid = np.cumsum(ng)
    # still-null rows are the SUFFIX of their entity's run; the last
    # entity's suffix takes the carried (future) value when it continues
    if carry is not None and carry[1] is not None and ent[-1] == carry[0]:
        tail_null = still & (gid == gid[-1])
        if tail_null.any():
            fill_val = pa.array([carry[1]] * int(tail_null.sum()),
                                type=col.type)
            filled = pc.replace_with_mask(filled, pa.array(tail_null),
                                          fill_val)
    first_val = filled[0].as_py()
    if first_val is None and carry is not None and ent[0] == carry[0] \
            and gid[-1] == 1:
        first_val = carry[1]     # single-entity slice, all null, continue
    new_carry = (ent[0], first_val)
    return tbl.append_column(out_col, filled), new_carry


def _sessionize_block(tbl: pa.Table, carry, entity_col: str, ts_col: str,
                      gap_us: int, out_col: str):
    """carry = (last_entity, last_ts_us, last_session_id)."""
    n = len(tbl)
    if n == 0:
        return tbl.append_column(out_col, pa.array([], type=pa.int64())), \
            carry
    ent = np.asarray(tbl[entity_col].to_pylist())
    tsv = tbl[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    ng = W.group_starts(ent)
    sid = W.sessionize(tsv, ng, gap_us)
    if carry is not None and ent[0] == carry[0]:
        run = ent == ent[0]
        base = carry[2] if (tsv[0] - carry[1]) <= gap_us else carry[2] + 1
        sid = sid + np.where(run, base, 0)
    new_carry = (ent[-1], int(tsv[-1]), int(sid[-1]))
    return tbl.append_column(out_col, pa.array(sid, type=pa.int64())), \
        new_carry


def _cumsum_block(tbl: pa.Table, carry, entity_col: str, value_col: str,
                  out_col: str = "cumsum"):
    """Running per-entity sum; carry = (last_entity, its running sum).
    NaNs stay NaN and don't poison the run (pandas cumsum semantics)."""
    n = len(tbl)
    if n == 0:
        return tbl.append_column(out_col,
                                 pa.array([], type=pa.float64())), carry
    ent = np.asarray(tbl[entity_col].to_pylist())
    v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    nan = np.isnan(v)
    filled = np.where(nan, 0.0, v)
    cs = np.cumsum(filled)
    ng = W.group_starts(ent)
    starts = np.flatnonzero(ng)
    base = np.where(starts > 0, cs[starts - 1], 0.0)
    run_id = np.cumsum(ng) - 1
    out = cs - base[run_id]
    carried = carry is not None and ent[0] == carry[0]
    if carried:
        out = out + np.where(ent == ent[0], carry[1], 0.0)
    out = np.where(nan, np.nan, out)
    # sorted slices: ent[-1] == ent[0] implies ONE run, so the carry
    # base contributes to the outgoing sum only in that case
    last_run_sum = float(cs[-1] - (cs[starts[-1] - 1]
                                   if starts[-1] > 0 else 0.0))
    if carried and ent[-1] == ent[0]:
        last_run_sum += carry[1]
    new_carry = (ent[-1], last_run_sum)
    return tbl.append_column(out_col, pa.array(out)), new_carry


_KERNELS = {
    "lag1": _lag1_block,
    "ffill": _ffill_block,
    "bfill": _bfill_block,
    "sessionize": _sessionize_block,
    "cumsum": _cumsum_block,
}
_REVERSE_OPS = {"bfill"}   # carry flows from the bucket's END backwards


@ray.remote(num_returns=2)
def _chain_task(block: pa.Table, offset: int, length: int, carry,
                op: str, kwargs: dict):
    piece = block.slice(offset, length)
    if BUCKET_COL in piece.column_names:
        piece = piece.drop_columns([BUCKET_COL])
    return _KERNELS[op](piece, carry, **kwargs)


@ray.remote
def _block_bounds(tbl: pa.Table):
    n = len(tbl)
    if n == 0:
        return (None, None, 0)
    b = tbl[BUCKET_COL]
    return (int(b[0].as_py()), int(b[n - 1].as_py()), n)


def streaming_window(ds: Dataset, op: str, *, entity_col: str,
                     order_cols: Sequence[str], num_buckets: int = 32,
                     max_rows_per_block: int = 100_000,
                     **op_kwargs) -> Dataset:
    """Apply a streaming windowed op (``lag1`` / ``ffill`` / ``bfill`` /
    ``sessionize`` / ``cumsum``) with bounded per-task memory. See
    module docstring.

    ``op_kwargs`` are kernel-specific: ``value_col``/``out_col`` for
    lag1/ffill; ``ts_col``/``gap_us``/``out_col`` for sessionize.
    """
    if op not in _KERNELS:
        raise ValueError(f"unknown streaming op {op!r}")
    bucketed = with_bucket(ds, entity_col, num_buckets)
    sorted_ds = bucketed.sort([BUCKET_COL, entity_col, *order_cols],
                              boundaries=list(range(1, num_buckets)))
    refs = sorted_ds.to_arrow_refs()
    bounds = ray.get([_block_bounds.remote(r) for r in refs])

    # chains = contiguous block runs; never split two blocks sharing a
    # bucket (an entity could span them)
    chains: list[list] = []
    prev_last = None
    for ref, (first_b, last_b, n) in zip(refs, bounds):
        if n == 0:
            continue
        if chains and prev_last == first_b:
            chains[-1].append((ref, n))
        else:
            chains.append([(ref, n)])
        prev_last = last_b

    kernel_kwargs = {**op_kwargs, "entity_col": entity_col}
    reverse = op in _REVERSE_OPS
    out_refs = []
    for chain in chains:
        slices = [(ref, off, min(max_rows_per_block, n - off))
                  for ref, n in chain
                  for off in range(0, n, max_rows_per_block)]
        if reverse:
            slices = slices[::-1]
        carry = None
        chain_out = []
        for ref, off, length in slices:
            out_ref, carry = _chain_task.remote(
                ref, off, length, carry, op, kernel_kwargs)
            chain_out.append(out_ref)
        out_refs.extend(chain_out[::-1] if reverse else chain_out)

    import ray.data as rd
    return rd.from_arrow_refs(out_refs)
