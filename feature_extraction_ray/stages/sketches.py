"""Mergeable sketches for corpus-scale statistics.

The reference computes exact distincts in memory (SURVEY §2.7) — at
10¹²-sequence scale an exact global distinct is a full shuffle, so the
engine adds the classic mergeable-sketch pattern (guide: "emit one
serialized sketch per batch and merge them in a second, tiny stage"):

* :class:`HyperLogLog` — dense HLL with ``2^p`` registers; per-batch
  build is vectorized numpy (one hash pass + ``np.maximum.reduceat``
  on sorted registers); merge = elementwise max; the only data movement
  is one ``2^p``-byte array per block.
* :func:`heavy_hitters` — mergeable Misra-Gries top-k counters
  (Agarwal et al. 2012): ≤ k+1 rows per block, underestimate error
  bounded by the summed decrements, EXACT when global distinct ≤ k.
* :func:`approx_quantiles` — deterministic strided block samples with
  run weights; bounded rank error, blocks × samples communication.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .partition import _stable_hash_strings, group_field_type


class HyperLogLog:
    """Dense HLL (Flajolet et al.); ``p`` index bits → 2^p registers."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """Vectorized register update from 64-bit hashes.

        Applies a murmur3 fmix64 finalizer first: FNV-1a (the engine's
        string hash) mixes low bits well but its TOP bits barely avalanche
        for short strings, which collapses the register index."""
        if len(h) == 0:
            return
        h = h.astype(np.uint64).copy()
        with np.errstate(over="ignore"):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = position of the first 1-bit in the remaining 64-p bits
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        mask = np.uint64(1) << np.uint64(63)
        alive = np.ones(len(h), dtype=bool)
        for r in range(64 - self.p + 1):
            top = (x & mask) != 0
            done = alive & top
            lz[done] = r + 1
            alive &= ~top
            if not alive.any():
                break
            x = x << np.uint64(1)
        order = np.argsort(idx, kind="stable")
        sidx, slz = idx[order], lz[order]
        starts = np.flatnonzero(np.r_[True, sidx[1:] != sidx[:-1]])
        maxes = np.maximum.reduceat(slz, starts)
        regs = sidx[starts]
        self.registers[regs] = np.maximum(self.registers[regs], maxes)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)      # linear counting regime
        return float(e)


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Approximate global distinct count of ``col``: one vectorized sketch
    per block (map_batches emits 2^p bytes), merged on the driver.

    Standard error ≈ 1.04/√(2^p) (~1.6 % at p=12); communication is
    blocks × 4 KiB regardless of corpus size.
    """
    def sketch_batch(tbl: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        c = tbl[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        hll.add_hashes(_stable_hash_strings(c))
        return pa.table({"sketch": pa.array([hll.registers.tobytes()],
                                            type=pa.binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    merged = HyperLogLog(p)
    for raw in parts["sketch"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(raw, dtype=np.uint8).copy()
        merged = merged.merge(other)
    return merged.estimate()


def heavy_hitters(ds: Dataset, col: str, k: int = 64):
    """Mergeable Misra-Gries heavy hitters: each block emits an exact
    value-count table collapsed to ≤ ``k`` counters (subtract the
    (k+1)-largest count, drop non-positives — the decrement-based MG
    summary), and the driver merges by summing counters and collapsing
    once more (Agarwal et al. 2012 mergeable-summaries result).

    Guarantees: every value with true count > n/(k+1) is reported;
    reported counts are UNDERestimates with error ≤ the returned
    ``max_err`` (total decrement). When the global distinct count of
    ``col`` is ≤ k no decrement ever fires and the result is EXACT
    (``max_err == 0``) — the oracle-checkable mode. Communication is ≤ k
    rows per block regardless of corpus size. Null values form their own
    EXACT group (SQL ``GROUP BY`` semantics: null counts ride on the
    per-block meta row, never decremented), reported as a null
    ``value`` row.

    Returns ``(DataFrame[value, count] sorted by count desc, max_err)``.
    """
    def summary_batch(tbl: pa.Table) -> pa.Table:
        c = tbl[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        enc = c.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        n_null = int(enc.indices.null_count)
        if n_null:
            idx = idx[~pa.compute.is_null(enc.indices).to_numpy(
                zero_copy_only=False)]
        cnt = np.bincount(idx.astype(np.int64),
                          minlength=len(enc.dictionary))
        decr = 0
        keep = cnt > 0
        if keep.sum() > k:
            pos = cnt[cnt > 0]
            decr = int(np.partition(pos, len(pos) - k - 1)[len(pos) - k - 1])
            cnt = cnt - decr
            keep = cnt > 0
        vals = enc.dictionary.filter(pa.array(keep))
        n_keep = int(keep.sum())
        # one meta row per block carries the block's decrement AND its
        # null-group count (value rows stay pure counters, so the merge
        # is a plain groupby-sum; the null group is never decremented)
        return pa.table({
            "value": pa.concat_arrays(
                [vals.cast(pa.large_utf8()),
                 pa.nulls(1, type=pa.large_utf8())]),
            "count": pa.array(np.r_[cnt[keep].astype(np.int64), n_null]),
            "decr": pa.array(np.r_[np.zeros(n_keep, dtype=np.int64),
                                   decr]),
        })

    import pandas as pd
    parts = ds.map_batches(summary_batch, batch_format="pyarrow") \
        .to_pandas()
    if len(parts) == 0 or "value" not in parts.columns:
        return pd.DataFrame({"value": [], "count": []}), 0
    meta = parts["value"].isna()
    total_decr = int(parts.loc[meta, "decr"].sum())
    n_null = int(parts.loc[meta, "count"].sum())
    merged = parts[~meta].groupby("value", as_index=False)["count"].sum()
    if len(merged) > k:
        d = int(np.partition(merged["count"].to_numpy(),
                             len(merged) - k - 1)[len(merged) - k - 1])
        merged = merged.assign(count=merged["count"] - d)
        merged = merged[merged["count"] > 0]
        total_decr += d
    if n_null:
        merged = pd.concat([merged, pd.DataFrame(
            {"value": [None], "count": [n_null]})], ignore_index=True)
    return (merged.sort_values(["count", "value"],
                               ascending=[False, True])
            .reset_index(drop=True)), total_decr


def approx_quantiles(ds: Dataset, col: str, qs, samples_per_block: int = 256):
    """Mergeable approximate quantiles: each block emits a sorted STRIDED
    sample of ≤ ``samples_per_block`` (value, weight) pairs — weight = the
    run of rows the sampled value represents — and the driver computes a
    weighted quantile over blocks × samples_per_block rows, regardless of
    corpus size. Deterministic (no RNG); per-quantile rank error is
    bounded by ~1/samples_per_block of each block's rows.

    The exact per-GROUP path for bounded group counts is a
    ``groupby().map_groups`` median (see ``median_value_by_type``); this
    sketch is the global path when no single task can hold a full sort.
    """
    import pandas as pd

    def sample_batch(tbl: pa.Table) -> pa.Table:
        c = tbl[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        v = np.sort(c.to_numpy(zero_copy_only=False).astype(np.float64))
        v = v[~np.isnan(v)]
        n = len(v)
        if n == 0:
            return pa.table({"value": pa.array([], type=pa.float64()),
                             "weight": pa.array([], type=pa.int64())})
        stride = max(1, int(np.ceil(n / samples_per_block)))
        idx = np.arange(0, n, stride)
        w = np.diff(np.r_[idx, n])
        return pa.table({"value": pa.array(v[idx]),
                         "weight": pa.array(w.astype(np.int64))})

    parts = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return {float(q): float("nan") for q in qs}
    parts = parts.sort_values("value", kind="stable")
    cw = parts["weight"].cumsum().to_numpy()
    total = cw[-1]
    vals = parts["value"].to_numpy()
    out = {}
    for q in qs:
        target = q * (total - 1)
        pos = int(np.searchsorted(cw, target, side="right"))
        out[float(q)] = float(vals[min(pos, len(vals) - 1)])
    return out


def equi_width_histogram(ds: Dataset, value_col: str, lo: float,
                         hi: float, num_bins: int) -> Dataset:
    """Equi-width histogram: per-block ``np.bincount`` partials (one
    tiny (bin, n) table per block — at most ``num_bins`` rows), then a
    ``num_bins``-key groupby-sum. The all-to-all moves O(blocks ×
    num_bins) rows, never the data. Out-of-range values clip into the
    first/last bin (SQL ``least``/``greatest``); nulls/NaN are dropped.
    Only non-empty bins are emitted (SQL GROUP BY parity). Bin i covers
    ``[lo + i·w, lo + (i+1)·w)`` with ``w = (hi - lo)/num_bins``."""
    from ray.data.aggregate import Sum
    width = (hi - lo) / num_bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        v = v[~np.isnan(v)]
        b = np.floor((v - lo) / width)
        b = np.clip(b, 0, num_bins - 1).astype(np.int64)
        cnt = np.bincount(b, minlength=num_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("bin").aggregate(Sum("n", alias_name="n"))

    def fix(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n")
        t = t.set_column(i, pa.field("n", pa.int64()),
                         t["n"].cast(pa.int64()))
        w = pc.add(pc.multiply(t["bin"].cast(pa.float64()), width), lo)
        return t.append_column("bin_lo", w)

    return out.map_batches(fix, batch_format="pyarrow")


def grouped_approx_distinct(ds: Dataset, group_col: str, value_col: str,
                            p: int = 10,
                            num_buckets: int = 64) -> Dataset:
    """Approximate DISTINCT count PER GROUP — the at-scale "unique
    users per key" shape: each batch collapses to one register vector
    per group present (vectorized: value hashes → (group, register)
    lexsort + ``maximum.reduceat``; no Python per group), so the
    exchange moves ``groups-per-block × 2^p`` bytes instead of raw
    rows; one bucketed exchange then max-merges registers per group and
    estimates. Mergeable by construction (same registers the global
    :class:`HyperLogLog` uses, including its linear-counting regime).
    The EXACT twin for modest cardinalities is
    ``groupstats.grouped_distinct``; this is the sketch for when values
    per group dwarf task heaps. Returns ``(group_col,
    n_distinct_est: float64)``."""
    from .partition import _stable_hash_strings
    from .window import bucketed_apply

    m = 1 << p

    def _ranks(h: np.ndarray) -> tuple:
        """(register index, rank) per hash — same mix/rank math as
        HyperLogLog.add_hashes, shared convention."""
        h = h.astype(np.uint64).copy()
        with np.errstate(over="ignore"):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        mask = np.uint64(1) << np.uint64(63)
        alive = np.ones(len(h), dtype=bool)
        for r in range(64 - p + 1):
            top = (x & mask) != 0
            lz[alive & top] = r + 1
            alive &= ~top
            if not alive.any():
                break
            x = x << np.uint64(1)
        return idx, lz

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col]).drop_null()
        if len(t) == 0:
            return pa.table({group_col: t[group_col],
                             "__regs": pa.array([], pa.list_(pa.uint8(),
                                                             m))})
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        gde = grp.dictionary_encode()
        gcodes = gde.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        h = _stable_hash_strings(t[value_col])
        ridx, rank = _ranks(h)
        ng = len(gde.dictionary)
        regs = np.zeros((ng, m), dtype=np.uint8)
        flat = gcodes * m + ridx
        order = np.argsort(flat, kind="stable")
        sf, sr = flat[order], rank[order]
        starts = np.flatnonzero(np.r_[True, sf[1:] != sf[:-1]])
        regs.reshape(-1)[sf[starts]] = np.maximum.reduceat(sr, starts)
        return pa.table({
            group_col: gde.dictionary,
            "__regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs.reshape(-1)), m)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(tbl: pa.Table) -> pa.Table:
        grp = tbl[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        gde = grp.dictionary_encode()
        gcodes = gde.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        regs = tbl["__regs"]
        if isinstance(regs, pa.ChunkedArray):
            regs = regs.combine_chunks()
        flat = regs.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(tbl), m)
        ng = len(gde.dictionary)
        merged = np.zeros((ng, m), dtype=np.uint8)
        np.maximum.at(merged, gcodes, flat)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -merged.astype(np.float64))
        e = alpha * m * m / inv.sum(axis=1)
        zeros = (merged == 0).sum(axis=1)
        lin = np.where(zeros > 0, m * np.log(
            np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0)), e)
        est = np.where((e <= 2.5 * m) & (zeros > 0), lin, e)
        return pa.table({group_col: gde.dictionary,
                         "n_distinct_est": pa.array(est)})

    return bucketed_apply(parts, group_col, merge,
                          num_buckets=num_buckets, drop_bucket=False)


def calibration_bins(ds: Dataset, score_col: str, label_col: str,
                     n_bins: int, lo: int, hi: int) -> Dataset:
    """Reliability-diagram / calibration table for a scored, labeled
    dataset: scores are INTEGER units (e.g. micro-units of a rounded
    probability or similarity — the caller quantizes, keeping the op
    integer-exact) binned by pure integer arithmetic over the
    half-open range ``[lo, hi)``:

        ``bin = clip((s − lo)·n_bins // (hi − lo), 0, n_bins−1)``

    Per non-empty bin: ``n``, ``sum_label``, ``sum_score`` (exact
    int64) and ``mean_label`` / ``mean_score`` (ONE division of exact
    ints each — a SQL twin compares strictly). The gap between
    mean_label and normalized mean_score per bin IS the calibration
    error (ECE numerator). Scale shape: per-block bincount/``add.at``
    partials (≤ ``n_bins`` rows per block) ride a tiny groupby-sum —
    the data never shuffles."""
    from ray.data.aggregate import Sum
    if hi <= lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    span = hi - lo

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        si = s.astype(np.int64)
        li = lab.astype(np.int64)
        if not (np.array_equal(si.astype(s.dtype), s)
                and np.array_equal(li.astype(lab.dtype), lab)):
            raise ValueError("score and label must be integer-valued")
        b = np.clip((si - lo) * n_bins // span, 0, n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        sl = np.zeros(n_bins, dtype=np.int64)
        np.add.at(sl, b, li)
        ss = np.zeros(n_bins, dtype=np.int64)
        np.add.at(ss, b, si)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64)),
                         "sum_label": pa.array(sl[nz]),
                         "sum_score": pa.array(ss[nz])})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n", alias_name="n"),
                                  Sum("sum_label", alias_name="sum_label"),
                                  Sum("sum_score", alias_name="sum_score"))

    def fin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "bin" not in t.column_names:
            # empty-corpus groupby emits blocks missing the key column
            z = pa.array([], type=pa.int64())
            zf = pa.array([], type=pa.float64())
            return pa.table({"bin": z, "n": z, "sum_label": z,
                             "sum_score": z, "mean_label": zf,
                             "mean_score": zf})
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sl = t["sum_label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ss = t["sum_score"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "bin": t["bin"].combine_chunks().cast(pa.int64())
            if isinstance(t["bin"], pa.ChunkedArray)
            else t["bin"].cast(pa.int64()),
            "n": pa.array(n), "sum_label": pa.array(sl),
            "sum_score": pa.array(ss),
            "mean_label": pa.array(sl.astype(np.float64) / n),
            "mean_score": pa.array(ss.astype(np.float64) / n)})

    return agg.map_batches(fin, batch_format="pyarrow")


def count_min_sketch(ds: Dataset, tokens_col: str = "tokens",
                     width: int = 1024, depth: int = 4,
                     seed: int = 1) -> pa.Table:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the token
    stream: a ``depth × width`` exact-int64 counter grid where row
    ``r`` buckets each occurrence at

        ``col = ((tok % 2²⁰)·2654435761 + (r+1)·40503
                 + seed·1315423911) mod 2³² mod width``

    — the shared overflow-safe hash family with the row index in the
    position slot, so a BIGINT SQL twin reproduces every cell
    bit-for-bit. Per-block partials are ``np.bincount`` grids riding
    ONE sketch-bounded ``groupby`` exchange (``depth·width`` rows out
    — the corpus never shuffles, and the merged sketch is exactly the
    sum of per-block sketches: the mergeability that makes CMS the
    streaming frequency structure). Returns a driver-side
    ``pyarrow.Table`` (``row, col, cnt``; zero cells omitted) meant to
    be broadcast; point-query with :func:`cms_estimate`."""
    from ray.data.aggregate import Sum

    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    mul = np.uint64(2654435761)
    w64 = np.uint64(width)
    adds = [np.uint64(((r + 1) * 40503 + seed * 1315423911)
                      % (1 << 64)) for r in range(depth)]

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        if len(flat) == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        base = flat % np.uint64(1 << 20)
        keys, cnts = [], []
        for r in range(depth):
            c = ((base * mul + adds[r]) % np.uint64(1 << 32)
                 % w64).astype(np.int64)
            g = np.bincount(c, minlength=width)
            nz = np.nonzero(g)[0]
            keys.append(r * width + nz)
            cnts.append(g[nz])
        return pa.table({"key": pa.array(np.concatenate(keys)),
                         "cnt": pa.array(np.concatenate(cnts)
                                         .astype(np.int64))})

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")) \
        .take_all()
    rows, cols_, cnts = [], [], []
    for rec in merged:
        if "key" not in rec or rec["key"] is None:
            continue
        k = int(rec["key"])
        rows.append(k // width)
        cols_.append(k % width)
        cnts.append(int(rec["cnt"]))
    rows_a = np.array(rows, dtype=np.int64)
    cols_a = np.array(cols_, dtype=np.int64)
    cnts_a = np.array(cnts, dtype=np.int64)
    order = np.lexsort((cols_a, rows_a))
    return pa.table({"row": pa.array(rows_a[order]),
                     "col": pa.array(cols_a[order]),
                     "cnt": pa.array(cnts_a[order])})


def cms_estimate(sketch: pa.Table, tokens, width: int = 1024,
                 depth: int = 4, seed: int = 1) -> np.ndarray:
    """Point-query a :func:`count_min_sketch` table: the estimate for
    each token is the MIN over the ``depth`` rows' cells — an upper
    bound on the true count (exact when no collision landed in any of
    the token's cells). Vectorized over the query tokens; cells absent
    from the sparse sketch read as 0."""
    grid = np.zeros((depth, width), dtype=np.int64)
    grid[sketch["row"].to_numpy(zero_copy_only=False),
         sketch["col"].to_numpy(zero_copy_only=False)] = \
        sketch["cnt"].to_numpy(zero_copy_only=False)
    toks = np.asarray(tokens, dtype=np.uint64)
    base = toks % np.uint64(1 << 20)
    mul = np.uint64(2654435761)
    est = None
    for r in range(depth):
        add = np.uint64(((r + 1) * 40503 + seed * 1315423911)
                        % (1 << 64))
        c = ((base * mul + add) % np.uint64(1 << 32)
             % np.uint64(width)).astype(np.int64)
        v = grid[r, c]
        est = v if est is None else np.minimum(est, v)
    return est


# ---------------------------------------------------------------------------
# 32-bit SQL-twinnable HLL: integer-exact register evidence
# ---------------------------------------------------------------------------

def _bitlen_f64(v: np.ndarray) -> np.ndarray:
    """floor(log2(v)) + 1 for non-negative int64 v < 2^53, vectorized and
    EXACT (frexp's exponent on an exactly-represented integer)."""
    _, e = np.frexp(v.astype(np.float64))
    return e.astype(np.int64)                 # 0 for v == 0


def hll32_registers(ds: Dataset, col: str, p: int = 6,
                    seed: int = 7) -> Dataset:
    """HyperLogLog register table over an INTEGER key column, built so a
    BIGINT SQL twin reproduces every register bit-for-bit — the
    integer-exact correctness witness for the sketch family (the
    production 64-bit string path is :func:`approx_distinct`; this is
    the classic 32-bit Flajolet variant on the engine's shared
    overflow-safe hash family).

    ``h = (key·2654435761 + seed·1315423911) mod 2^32``; register =
    the TOP ``p`` bits (``h // 2^(32-p)`` — multiplicative hashes
    avalanche high bits, not low), ``v`` = the remaining ``W = 32-p``
    bits, ``rho = W - bitlen(v) + 1`` (``W+1`` when v = 0). Every term
    stays < 2^63 for keys < 2^31, so the SQL twin is overflow-safe
    (loud reject above). Per-block partials collapse to ≤ 2^p rows
    (lexsort run-max), then ONE register-bounded groupby.max — the data
    never shuffles. Only TOUCHED registers appear (SQL GROUP BY twin);
    :func:`hll32_estimate` treats missing ones as zeros."""
    if not (3 <= p <= 16):
        raise ValueError("p must be in [3, 16]")
    m = 1 << p
    w = 32 - p

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if c.null_count:
            c = c.drop_null()
        k = c.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and (k.min() < 0 or k.max() >= (1 << 31)):
            raise ValueError("hll32 keys must be in [0, 2^31) for "
                             "SQL-twin overflow safety")
        u = k.astype(np.uint64)
        h = (u * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        reg = (h >> np.uint64(w)).astype(np.int64)
        v = (h & np.uint64((1 << w) - 1)).astype(np.int64)
        rho = w - _bitlen_f64(v) + 1          # v==0 -> w+1
        order = np.argsort(reg, kind="stable")
        sreg, srho = reg[order], rho[order]
        starts = np.flatnonzero(np.r_[True, sreg[1:] != sreg[:-1]]) \
            if len(sreg) else np.zeros(0, np.int64)
        return pa.table({
            "register": pa.array(sreg[starts]),
            "rho": pa.array(np.maximum.reduceat(srho, starts)
                            if len(starts) else srho[:0])})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby("register").max("rho")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "register" not in t.schema.names:
            return pa.table({"register": pa.array([], type=pa.int64()),
                             "rho_max": pa.array([], type=pa.int64())})
        return pa.table({"register": t["register"],
                         "rho_max": t["max(rho)"]})

    return out.map_batches(finish, batch_format="pyarrow")


def hll32_estimate(registers, p: int) -> float:
    """Distinct-count estimate from a :func:`hll32_registers` result
    (pandas/Arrow with register+rho_max; absent registers count as 0).
    Standard bias-corrected harmonic mean + linear-counting regime."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    tbl = registers.to_pandas() if hasattr(registers, "to_pandas") \
        else registers
    regs[np.asarray(tbl["register"], dtype=np.int64)] = \
        np.asarray(tbl["rho_max"], dtype=np.int64)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(e)


def hll32_sql(table: str, key_col: str, p: int = 6, seed: int = 7,
              where: str = "") -> str:
    """The DuckDB spelling of the identical register construction —
    generated bitlen CASE ladder, every term BIGINT-safe."""
    m = 1 << p
    w = 32 - p
    ladder = " ".join(
        f"WHEN v >= {1 << (b - 1)} THEN {b}" for b in range(w, 0, -1))
    return f"""
WITH h AS (SELECT (({key_col}::BIGINT * 2654435761
                    + {seed}::BIGINT * 1315423911) % 4294967296) AS hv
           FROM {table}
           WHERE {key_col} IS NOT NULL {where} ),
r AS (SELECT hv // {1 << w} AS register, hv % {1 << w} AS v FROM h)
SELECT register,
       max({w} - (CASE {ladder} ELSE 0 END) + 1)::BIGINT AS rho_max
FROM r GROUP BY register
"""


def kmv_sketch(ds: Dataset, group_col: str, key_col: str, k: int = 64,
               seed: int = 7,
               num_buckets: int = 32) -> Dataset:
    """KMV (k-minimum-values) distinct sketch per group — the
    mergeable bottom-k companion to :func:`hll32_registers` that also
    supports SET OVERLAP estimation (:func:`kmv_jaccard`), which HLL
    cannot. Uses the same overflow-safe 32-bit family
    ``h = (key·2654435761 + seed·1315423911) mod 2^32``; the odd
    multiplier is invertible mod 2^32 so distinct keys < 2^31 map to
    DISTINCT hashes (keys outside [0, 2^31) reject loudly) and a
    BIGINT SQL ``row_number`` twin reproduces every sketch row
    bit-for-bit.

    Emits (group, rank 1..k, h) — the k smallest distinct hash values
    per group (all of them when a group has fewer). Scale shape:
    per-block distinct + per-group bottom-k prune (lexsort run
    offsets) caps the exchange at blocks·groups·k rows; ONE bucketed
    exchange merges partials. Estimator: ``(k−1)·2^32 / h_k`` when
    saturated, exact distinct count when not."""
    if k < 1:
        raise ValueError("kmv_sketch: k must be >= 1")

    def _bottom_k(g: np.ndarray, h: np.ndarray):
        ug, gi = np.unique(g, return_inverse=True)
        order = np.lexsort((h, gi))
        gi, h = gi[order], h[order]
        keep = np.r_[True, (gi[1:] != gi[:-1]) | (h[1:] != h[:-1])]
        gi, h = gi[keep], h[keep]
        starts = np.flatnonzero(np.r_[True, gi[1:] != gi[:-1]])
        cnt = np.diff(np.r_[starts, len(gi)])
        pos = np.arange(len(gi)) - np.repeat(starts, cnt)
        m = pos < k
        return ug[gi[m]], h[m], pos[m]

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "h": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        c = t[key_col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        keys = c.to_numpy(zero_copy_only=False)
        keys = keys[valid].astype(np.int64)
        if len(keys) and (keys.min() < 0 or keys.max() >= (1 << 31)):
            raise ValueError("kmv_sketch: keys must be in "
                             "[0, 2^31) for BIGINT twin safety")
        g = t[group_col].to_numpy(zero_copy_only=False)[valid]
        if len(keys) == 0:
            return empty
        h = (keys.astype(np.uint64) * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        gg, hh, _ = _bottom_k(g, h.astype(np.int64))
        return pa.table({group_col: pa.array(gg),
                         "h": pa.array(hh)})

    from .window import bucketed_apply
    parts = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "rank": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        g = t[group_col].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        gg, hh, pos = _bottom_k(g, h)
        return pa.table({group_col: pa.array(gg),
                         "rank": pa.array(pos + 1),
                         "h": pa.array(hh)})

    return bucketed_apply(parts, group_col, per_bucket, num_buckets,
                          drop_bucket=False)


def kmv_jaccard(sketch: pa.Table, group_col: str,
                k: int) -> pa.Table:
    """Pairwise group Jaccard estimates from KMV sketches: for each
    group pair, take the union's kk = min(k, |union|) smallest hashes
    and count how many live in BOTH sketches —
    ``jaccard = inter / kk`` (ONE division of exact ints; the standard
    bottom-k overlap estimator). Runs driver-side over the
    groups·k-bounded sketch table (never the corpus)."""
    if isinstance(sketch, Dataset):
        sketch = pa.Table.from_pandas(sketch.to_pandas())
    g = sketch[group_col].to_numpy(zero_copy_only=False)
    h = sketch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    groups = np.unique(g)
    sets = {gr: set(h[g == gr].tolist()) for gr in groups}
    rows = []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            a, b = groups[i], groups[j]
            union = sorted(sets[a] | sets[b])
            kk = min(k, len(union))
            dk = set(union[:kk])
            inter = len(dk & sets[a] & sets[b])
            rows.append((a, b, kk, inter,
                         inter / float(kk) if kk else None))
    return pa.table({
        "g_a": pa.array([r[0] for r in rows]),
        "g_b": pa.array([r[1] for r in rows]),
        "kk": pa.array([r[2] for r in rows], pa.int64()),
        "inter": pa.array([r[3] for r in rows], pa.int64()),
        "jaccard": pa.array([r[4] for r in rows], pa.float64())})
