"""One-pass dataset profiling — the `DESCRIBE`/data-quality summary an
engine owes its users before any pipeline runs.

:func:`profile_columns` streams the dataset ONCE and emits one summary
row per column: row/null counts (exact int64), min/max (exact,
type-faithful via a numeric channel for numerics/timestamps/bools and
a lexicographic channel for strings), mean/std for numerics (exact
float64 moments), a HyperLogLog distinct estimate (mergeable registers
ride the partials; exact when you need exact belongs to
``groupstats.grouped_distinct``), and the top-k values by count
(per-block top candidates merged by sum — EXACT whenever a value makes
every block's top-32, an underestimate otherwise; the decrement-true
Misra-Gries single-column sketch is ``sketches.heavy_hitters``).
Per block the partial is one row per column; the driver
reduces ``#blocks × #columns`` rows — nothing scales with row count.

Nested (list/struct) columns report counts/nulls only. No reference
counterpart (the reference has no profiling); part of the engine
surface.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .partition import _stable_hash_strings
from .sketches import HyperLogLog

_TOPK_BLOCK = 32          # MG counters per block per column


def _col_partial(col, name: str, p: int):
    """One profile-partial dict for a column chunk."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    n = len(col)
    nulls = col.null_count
    out = {"column": name, "dtype": str(t), "n": n, "nulls": nulls,
           "num_min": None, "num_max": None, "str_min": None,
           "str_max": None, "sum": None, "sumsq": None,
           "hll": None, "top_vals": None, "top_cnts": None}
    if pa.types.is_nested(t) or n == nulls:
        return out
    numeric = (pa.types.is_integer(t) or pa.types.is_floating(t)
               or pa.types.is_boolean(t) or pa.types.is_timestamp(t))
    if numeric:
        v = col
        if pa.types.is_timestamp(t) or pa.types.is_boolean(t):
            v = v.cast(pa.int64())
        arr = v.to_numpy(zero_copy_only=False).astype(np.float64)
        if nulls or pa.types.is_floating(t):
            valid = arr[~np.isnan(arr)]
            # missing = Arrow null OR float NaN (profiler convention)
            out["nulls"] = n - len(valid)
        else:
            valid = arr
        if len(valid):
            out["num_min"] = float(valid.min())
            out["num_max"] = float(valid.max())
            out["sum"] = float(valid.sum())
            out["sumsq"] = float((valid * valid).sum())
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(col)
        out["str_min"] = mm["min"].as_py()
        out["str_max"] = mm["max"].as_py()
    else:
        return out
    # distinct estimate + top values over the value's string form for
    # strings / exact value hash for numerics
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_integer(t):
        base = col.drop_null()
        h = _stable_hash_strings(base)
        hll = HyperLogLog(p)
        hll.add_hashes(h)
        out["hll"] = hll.registers
        de = base.dictionary_encode()
        cnt = np.bincount(de.indices.to_numpy(zero_copy_only=False)
                          .astype(np.int64),
                          minlength=len(de.dictionary))
        k = min(_TOPK_BLOCK, len(cnt))
        top = np.argpartition(-cnt, k - 1)[:k] if k else np.array([], int)
        out["top_vals"] = [str(x) for x in
                           de.dictionary.take(pa.array(top)).to_pylist()]
        out["top_cnts"] = cnt[top].astype(np.int64)
    return out


def profile_columns(ds: Dataset, columns: Sequence[str] | None = None,
                    top_k: int = 5, hll_p: int = 12) -> pa.Table:
    """Profile ``columns`` (default: all) in one streaming pass; returns
    an Arrow table with one row per column (see module docstring)."""
    schema = ds.schema()
    names = list(columns or schema.names)

    def partial(t: pa.Table) -> pa.Table:
        rows = [_col_partial(t[c], c, hll_p) for c in names
                if c in t.column_names]
        return pa.table({
            "column": pa.array([r["column"] for r in rows]),
            "dtype": pa.array([r["dtype"] for r in rows]),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "nulls": pa.array([r["nulls"] for r in rows], pa.int64()),
            "num_min": pa.array([r["num_min"] for r in rows],
                                pa.float64()),
            "num_max": pa.array([r["num_max"] for r in rows],
                                pa.float64()),
            "str_min": pa.array([r["str_min"] for r in rows]),
            "str_max": pa.array([r["str_max"] for r in rows]),
            "sum": pa.array([r["sum"] for r in rows], pa.float64()),
            "sumsq": pa.array([r["sumsq"] for r in rows], pa.float64()),
            "hll": pa.array([None if r["hll"] is None
                             else r["hll"].tolist() for r in rows],
                            pa.list_(pa.uint8())),
            "top_vals": pa.array([r["top_vals"] for r in rows],
                                 pa.list_(pa.string())),
            "top_cnts": pa.array([None if r["top_cnts"] is None
                                  else r["top_cnts"].tolist()
                                  for r in rows],
                                 pa.list_(pa.int64())),
        })

    import ray as _ray
    # Arrow-ref collection, NOT Dataset.to_pandas(): Ray's pandas
    # conversion lifts list columns (hll registers, top values) into
    # its tensor extension and breaks on ragged lists
    refs = ds.map_batches(partial, batch_format="pyarrow") \
        .to_arrow_refs()
    parts = pa.concat_tables([_ray.get(r) for r in refs]).to_pandas()
    out_rows = []
    dtypes = dict(zip(schema.names, schema.types))
    for name in names:
        g = parts[parts["column"] == name]
        t = dtypes[name]
        n = int(g["n"].sum())
        nulls = int(g["nulls"].sum())
        row = {"column": name, "dtype": str(t), "n": n, "nulls": nulls,
               "min": None, "max": None, "mean": None, "std": None,
               "n_distinct_est": None, "top_values": None,
               "top_counts": None}
        is_ts = pa.types.is_timestamp(t)

        def fmt(x):
            if x is None or (isinstance(x, float) and np.isnan(x)):
                return None
            if is_ts:
                return str(np.datetime64(int(x), "us"))
            return str(int(x)) if float(x).is_integer() and \
                (pa.types.is_integer(t) or pa.types.is_boolean(t)
                 or is_ts) else str(x)

        nm = g["num_min"].dropna()
        if len(nm):
            row["min"], row["max"] = fmt(nm.min()), fmt(g["num_max"].max())
            s, sq = float(g["sum"].sum()), float(g["sumsq"].sum())
            nv = n - nulls
            if nv:
                mean = s / nv
                row["mean"] = mean
                row["std"] = float(np.sqrt(max(sq / nv - mean * mean,
                                               0.0)))
        sm = g["str_min"].dropna()
        if len(sm):
            row["min"] = sm.min()
            row["max"] = g["str_max"].dropna().max()
        hlls = [v for v in g["hll"] if v is not None]
        if hlls:
            regs = np.maximum.reduce([np.asarray(v, dtype=np.uint8)
                                      for v in hlls])
            h = HyperLogLog(hll_p)
            h.registers = regs
            row["n_distinct_est"] = float(h.estimate())
        tops: dict[str, int] = {}
        for vals, cnts in zip(g["top_vals"], g["top_cnts"]):
            if vals is None:
                continue
            for v, c in zip(vals, cnts):
                tops[v] = tops.get(v, 0) + int(c)
        if tops:
            best = sorted(tops.items(), key=lambda kv: (-kv[1], kv[0]))
            row["top_values"] = [v for v, _ in best[:top_k]]
            row["top_counts"] = [c for _, c in best[:top_k]]
        out_rows.append(row)
    return pa.table({
        "column": pa.array([r["column"] for r in out_rows]),
        "dtype": pa.array([r["dtype"] for r in out_rows]),
        "n": pa.array([r["n"] for r in out_rows], pa.int64()),
        "nulls": pa.array([r["nulls"] for r in out_rows], pa.int64()),
        "min": pa.array([r["min"] for r in out_rows], pa.string()),
        "max": pa.array([r["max"] for r in out_rows], pa.string()),
        "mean": pa.array([r["mean"] for r in out_rows], pa.float64()),
        "std": pa.array([r["std"] for r in out_rows], pa.float64()),
        "n_distinct_est": pa.array([r["n_distinct_est"]
                                    for r in out_rows], pa.float64()),
        "top_values": pa.array([r["top_values"] for r in out_rows],
                               pa.list_(pa.string())),
        "top_counts": pa.array([r["top_counts"] for r in out_rows],
                               pa.list_(pa.int64())),
    })
