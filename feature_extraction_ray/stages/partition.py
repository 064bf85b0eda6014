"""Entity-hash partitioning substrate — the engine's single shuffle primitive.

Every order-sensitive operator (windows, as-of join, ordered feature
aggregates) runs on top of the same layout: rows are assigned a bucket
``hash(entity) % num_buckets`` in a stateless ``map_batches`` (vectorized,
no shuffle), then a single ``groupby(BUCKET_COL)`` co-locates each bucket so
a whole entity is always inside one task. Within a bucket, tables are
sorted by ``(entity, order...)`` with pyarrow before the kernel runs.

This mirrors — and replaces — the reference's manual partitioning: the
per-subject outer loop (``kaldi_asr_features/extract_timing_feats.py:130-133``)
and the 100-way static SLURM shard
(``microsoft_asr_features/extract_timing_features.py:187-190``), whose
shards were *not* aligned with group keys (hence its separate merge job).
Here the shuffle key IS the group key, so no merge step exists.

Skew: a hot entity (the reference's hot subject) makes its bucket large but
never splits it — windowed semantics need whole entities. ``skew_report``
measures the histogram; order-insensitive stages (as-of merge, stat packs)
may additionally salt with ``salt_column``. At 100 TB, ``num_buckets``
should be ≥ 4× total cores so stragglers even out.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

BUCKET_COL = "__bucket"

_KERNEL_CACHE: dict = {}


def cached_kernel(cls, *args):
    """Per-worker-PROCESS kernel memo for task-pool ``map_batches``.

    Stages whose setup is cheap-but-not-free (build a few arrays,
    ``ray.get`` a broadcast ref) don't need an actor pool: a plain task
    function that fetches its kernel through this cache reuses Ray's
    already-warm worker processes, while a fresh actor pool pays ~2 s
    spin-up per pipeline run (measured 3.4× on the simhash signature
    stage at sf0.1). Keys must be hashable (``ray.ObjectRef`` is, so
    broadcast-model stages key on their ref). Reserve actor pools for
    stages with genuinely expensive or mutable per-actor state."""
    key = (cls.__module__, cls.__name__, *args)
    k = _KERNEL_CACHE.get(key)
    if k is None:
        if len(_KERNEL_CACHE) >= 64:   # broadcast refs differ per run;
            _KERNEL_CACHE.clear()      # keep long-lived workers bounded
        k = _KERNEL_CACHE[key] = cls(*args)
    return k


def broadcast_get(ref):
    """Per-worker-process cache of a ``ray.get`` on a broadcast object.

    ``ray.get`` of numpy/Arrow payloads is zero-copy, but pandas frames
    and Python dicts DESERIALIZE on every call — a per-batch ``ray.get``
    in a task-pool stage would copy the broadcast side once per batch.
    This memo (keyed on the ref) makes task-pool stages equivalent to an
    actor holding the object, without actor-pool spin-up."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    o = _KERNEL_CACHE.get(key)
    if o is None:
        import ray
        if len(_KERNEL_CACHE) >= 64:
            _KERNEL_CACHE.clear()
        o = _KERNEL_CACHE[key] = ray.get(ref)
    return o

# Stable 64-bit FNV-1a, vectorized over a pyarrow string/int column.
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _stable_hash_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of a string column, vectorized.

    Python's builtin ``hash`` is salted per-process (unusable across Ray
    workers); this FNV-1a over utf-8 bytes is process-stable and fast
    enough (vectorized over fixed-width chunks of the byte matrix).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        if arr.null_count:
            # null keys need A deterministic bucket, not a float-NaN
            # cast (platform-defined); they hash as 0 (join kernels
            # exclude nulls from matching anyway)
            arr = pc.fill_null(arr, 0)
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64 finalizer — good avalanche for integer keys
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        return v
    # string path: FNV over the flat values buffer, per-row via offsets
    sarr = arr.cast(pa.large_utf8())
    buf = np.frombuffer(sarr.buffers()[2], dtype=np.uint8) if sarr.buffers()[2] else np.zeros(0, np.uint8)
    offsets = np.frombuffer(sarr.buffers()[1], dtype=np.int64)[sarr.offset: sarr.offset + len(sarr) + 1]
    n = len(sarr)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    lens = offsets[1:] - offsets[:-1]
    maxlen = int(lens.max()) if n else 0
    # column-by-column over byte positions: maxlen iterations of vector ops
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            mask = lens > j
            idx = offsets[:-1][mask] + j
            hm = h[mask]
            hm = (hm ^ buf[idx].astype(np.uint64)) * _FNV_PRIME
            h[mask] = hm
    return h


def stable_bucket(arr, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id in [0, num_buckets) for a key column."""
    return (_stable_hash_strings(arr) % np.uint64(num_buckets)).astype(np.int32)


def with_bucket(ds: Dataset, entity_col: str, num_buckets: int,
                bucket_col: str = BUCKET_COL) -> Dataset:
    """Append a deterministic ``hash(entity) % num_buckets`` column.

    Stateless, vectorized, no shuffle — the shuffle happens at the
    subsequent ``groupby(bucket_col)``.
    """
    def assign(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch[entity_col], num_buckets)
        return batch.append_column(bucket_col, pa.array(b, type=pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sort_table(tbl: pa.Table, keys: Sequence[str]) -> pa.Table:
    """Stable multi-key ascending sort of an Arrow table (take-based)."""
    idx = pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys])
    return tbl.take(idx)


def group_field_type(tbl: pa.Table, col: str) -> pa.DataType:
    """Type for the group/entity column of an empty partial table:
    derive it from the input block's schema (an EMPTY block still
    carries field types) so non-string group keys don't fork block
    schemas between empty and non-empty partials — divergent schemas
    break the downstream groupby/concat. Falls back to string only
    when the column is absent entirely (zero-row groupby artifact
    blocks missing their key columns)."""
    if col in tbl.schema.names:
        return tbl.schema.field(col).type
    return pa.string()


def entity_group_starts(tbl: pa.Table, entity_col: str) -> np.ndarray:
    """New-entity mask for a table already sorted entity-major."""
    from ..functions.windows import group_starts
    ent = tbl[entity_col]
    if isinstance(ent, pa.ChunkedArray):
        ent = ent.combine_chunks()
    codes = ent.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    return group_starts(codes)


def derive_num_buckets(ds: Dataset, per_bucket_bytes: int = 64 << 20,
                       lo: int = 16, hi: int = 4096) -> int:
    """Size-derived all-to-all fan-out: enough buckets that one bucket's
    rows fit comfortably in a task heap (``per_bucket_bytes`` each),
    clamped to ``[lo, hi]`` and rounded up to a power of two — the
    at-scale default for the dedup/CC/join stages whose fixed bucket
    counts would otherwise break the one-bucket-fits-one-task assumption
    at 100× the data. The floor is additionally raised to the cluster's
    CPU count (each bucket is one task — fewer buckets than cores leaves
    cores idle through every exchange). Uses Dataset metadata
    (``size_bytes``) — exact for materialized inputs, estimated for lazy
    reads; falls back to the floor when no estimate exists."""
    import math

    def _pow2_ceil(x: float) -> int:
        return 1 << math.ceil(math.log2(max(x, 1)))

    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) \
            if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    lo = min(max(lo, _pow2_ceil(cpus)), hi)
    try:
        sz = ds.size_bytes()
    except Exception:
        sz = None
    if not sz or sz <= 0:
        return lo
    need = max(1, -(-sz // per_bucket_bytes))
    return int(min(hi, max(lo, _pow2_ceil(need))))


def hash_split(ds: Dataset, id_col: str,
               splits: dict | None = None, seed: int = 1337,
               out_col: str = "split") -> Dataset:
    """Deterministic train/val/test assignment by key hash — the
    training-data-pipeline split that stays STABLE under re-partitioning,
    re-runs, and corpus growth (a doc's split never changes when other
    docs are added, unlike fraction-based random sampling). Vectorized:
    one hash pass + threshold binning per batch; no shuffle.

    ``splits`` maps name → fraction (must sum to ≤ 1; remainder falls in
    the last split). Default 0.9/0.05/0.05 train/val/test."""
    splits = dict(splits or {"train": 0.9, "val": 0.05, "test": 0.05})
    names = list(splits)
    edges = np.cumsum([splits[n] for n in names])
    edges[-1] = 1.0 + 1e-12
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)

    def assign(batch: pa.Table) -> pa.Table:
        h = _stable_hash_strings(batch[id_col])
        with np.errstate(over="ignore"):
            h = (h ^ seed_mix) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        u = h.astype(np.float64) / float(2**64)     # uniform [0, 1)
        idx = np.searchsorted(edges, u, side="right")
        arr = np.array(names, dtype=object)[np.clip(idx, 0,
                                                    len(names) - 1)]
        return batch.append_column(out_col,
                                   pa.array(arr, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def skew_report(ds: Dataset, entity_col: str, top_k: int = 20):
    """Row-count histogram per entity (small result, driver-side).

    Used to pick ``num_buckets`` / decide salting before the as-of merge —
    the measurement the reference never did (its equal-file-count shards
    let a hot subject dominate one SLURM task, SURVEY §4).
    """
    counts = ds.groupby(entity_col).count()
    pdf = counts.to_pandas().sort_values("count()", ascending=False)
    total = int(pdf["count()"].sum())
    top = pdf.head(top_k)
    return {
        "total_rows": total,
        "num_entities": len(pdf),
        "top_share": float(top["count()"].iloc[0]) / max(total, 1) if len(top) else 0.0,
        "top": list(zip(top[entity_col].tolist(), top["count()"].tolist())),
    }


def salt_column(ds: Dataset, entity_col: str, hot_keys: set, salt_factor: int,
                out_col: str = "__salted") -> Dataset:
    """Append ``entity#k`` salted key for hot entities (round-robin k by a
    row-content hash), identity for others.

    Use ONLY under order-insensitive stages (partial stats, as-of right-side
    replication); never under sessionize/lag (SURVEY §7 watch-list 3).
    """
    hot_arr = pa.array(sorted(str(k) for k in hot_keys), type=pa.string())

    def add_salt(batch: pa.Table) -> pa.Table:
        ent = batch[entity_col]
        if isinstance(ent, pa.ChunkedArray):
            ent = ent.combine_chunks()
        sent = ent.cast(pa.string())
        h = _stable_hash_strings(batch[entity_col])
        rr = (np.arange(len(batch), dtype=np.uint64) + h) % \
            np.uint64(max(salt_factor, 1))
        is_hot = pc.is_in(sent, value_set=hot_arr)
        # vectorized: entity + "#" + k for hot rows, entity otherwise
        suffix = np.char.add("#", rr.astype("U20"))
        salted = pc.binary_join_element_wise(
            sent, pa.array(suffix, type=pa.string()), "")
        out = pc.if_else(is_hot, salted, sent)
        return batch.append_column(out_col, out)

    return ds.map_batches(add_salt, batch_format="pyarrow")


def weighted_sample_per_group(ds: Dataset, group_col: str, k: int,
                              id_col: str, weight_col: str | None = None,
                              seed: int = 1337,
                              num_buckets: int = 32) -> Dataset:
    """Deterministic weighted sample WITHOUT replacement of up to ``k``
    rows per group — Efraimidis–Spirakis A-Res (public 2006 algorithm):
    each row gets key ``u^(1/w)`` with ``u`` derived from a STABLE hash
    of ``id_col`` (+seed), and the k largest keys per group win. Because
    ``u`` is hash-derived, the sample is reproducible across reruns,
    repartitionings, and cluster sizes (the property fraction-based
    ``ds.random_sample`` lacks); rows with weight ≤ 0 are never chosen.
    ``weight_col=None`` means uniform. ONE bucketed exchange (the
    grouped-top-k path)."""
    import pyarrow.compute as pc
    from .window import grouped_topk
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)

    def add_key(t: pa.Table) -> pa.Table:
        h = _stable_hash_strings(t[id_col])
        with np.errstate(over="ignore"):
            h = (h ^ seed_mix) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        # u in (0, 1]; log-space key ln(u)/w avoids u^(1/w) underflow
        u = (h.astype(np.float64) + 1.0) / float(2**64)
        if weight_col is None:
            w = np.ones(len(t), dtype=np.float64)
        else:
            w = pc.cast(t[weight_col], pa.float64()).to_numpy(
                zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        key[~(w > 0)] = -np.inf          # never sampled
        return t.append_column("__wskey", pa.array(key))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    out = grouped_topk(keyed, group_col,
                       [("__wskey", "descending"), (id_col, "ascending")],
                       k=k, num_buckets=num_buckets)

    def strip(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["__wskey"], float("-inf")))
        return t.drop_columns(["__wskey"])

    return out.map_batches(strip, batch_format="pyarrow")


def stratified_split(ds, group_col: str, order_cols, frac: float,
                     out_col: str = "split", num_buckets: int = 32):
    """Deterministic stratified split: within each ``group_col`` stratum
    the first ``ceil(frac·n)`` rows in ``order_cols`` order are labeled
    "train", the rest "holdout" — exact per-stratum fractions (unlike
    ``hash_split``'s per-row i.i.d. assignment, which only hits ``frac``
    in expectation). One bucketed exchange; ``order_cols`` should
    totally order each stratum for determinism."""
    import math

    from .window import bucketed_apply

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, *order_cols])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        sizes = np.diff(np.r_[starts, len(tbl)])
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id]
        cut = np.ceil(frac * sizes).astype(np.int64)
        lab = np.where(rank < cut[run_id], "train", "holdout")
        return tbl.append_column(out_col,
                                 pa.array(lab, type=pa.string()))

    return bucketed_apply(ds, group_col, fn, num_buckets=num_buckets)


def kfold_assign(ds, k: int, id_col: str = "doc_id",
                 group_col: str | None = None, out_col: str = "fold",
                 num_buckets: int = 32):
    """Deterministic K-fold assignment: rows rank by the shared
    overflow-safe ordering hash ``((id % 2^20)·2654435761) mod 2^32``
    with id tie-break (so the split is pseudo-random but reproducible
    under any block layout), and ``fold = (rank − 1) mod k`` — a
    round-robin over the hash order, so fold sizes differ by AT MOST
    one row (globally, or within every ``group_col`` stratum when
    given), unlike i.i.d. ``hash % k`` which only balances in
    expectation. One bucketed exchange (stratified) or one prefix-scan
    sort (global)."""
    from .window import bucketed_apply
    if k < 2:
        raise ValueError("k must be >= 2")

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ids.astype(np.uint64)
        h = ((u % np.uint64(1 << 20)) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        return t.append_column("__kh", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_h, batch_format="pyarrow")
    if group_col is None:
        ranked = row_number(hashed, ["__kh", id_col], out_col="__rk",
                            start=0)

        def fin(t: pa.Table) -> pa.Table:
            f = t["__rk"].to_numpy(zero_copy_only=False) % k
            return t.drop_columns(["__kh", "__rk"]).append_column(
                out_col, pa.array(f.astype(np.int64)))

        return ranked.map_batches(fin, batch_format="pyarrow")

    def fn(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, "__kh", id_col])
        ng = entity_group_starts(tbl, group_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id]
        return tbl.drop_columns(["__kh"]).append_column(
            out_col, pa.array(rank % k))

    return bucketed_apply(hashed, group_col, fn, num_buckets=num_buckets)


def zorder_key(ds: Dataset, cols: Sequence[str], bits: int = 16,
               out_col: str = "zkey") -> Dataset:
    """Append a Morton / Z-order key interleaving the low ``bits`` bits
    of each column — the multi-dimensional data-layout primitive:
    sorting or range-partitioning 100-TB parquet by ``zkey`` co-locates
    rows that are close in EVERY keyed dimension, so multi-column range
    predicates prune most files instead of one dimension's worth
    (Delta/Iceberg OPTIMIZE ZORDER does exactly this). Columns must be
    non-negative integers < 2^bits (pre-scale/offset first; violations
    raise) and len(cols)·bits ≤ 63. Pure per-batch vectorized bit math,
    zero shuffles — feed the result to ``Dataset.sort(out_col)`` or a
    range partitioner to realize the layout."""
    cols = list(cols)
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit in int64")
    nd = len(cols)

    def fn(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.int64)
        for d, c in enumerate(cols):
            x = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(x) and (x.min() < 0 or x.max() >> bits):
                raise ValueError(
                    f"{c} out of range for {bits}-bit z-order")
            for i in range(bits):
                z |= ((x >> i) & 1) << (nd * i + d)
        return t.append_column(out_col, pa.array(z))

    return ds.map_batches(fn, batch_format="pyarrow")


def zorder_sql_expr(cols: Sequence[str], bits: int = 16) -> str:
    """The DuckDB spelling of the identical z-order key — generated
    term-by-term so an oracle can verify the engine's bit math."""
    terms = []
    for d, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {len(cols) * i + d})")
    return " | ".join(terms)


def row_number(ds: Dataset, order_cols: Sequence[str],
               out_col: str = "row_id", start: int = 1) -> Dataset:
    """Global stable row numbering in ``order_cols`` order (SQL
    ``row_number() OVER (ORDER BY ...)`` / Spark ``zipWithIndex`` with
    a defined order): one range-partition sort, per-block row counts to
    the driver (#blocks ints), an exclusive scan hands each block its
    base offset, and a parallel per-block finalize adds
    ``base + arange`` — the same two-phase prefix scan the sequence
    packer uses. Ties in ``order_cols`` get block-order numbers; pass a
    unique tie-breaker column for full determinism."""
    import ray
    import ray.data as rd

    refs = ds.sort(list(order_cols)).to_arrow_refs()

    @ray.remote
    def block_len(t: pa.Table) -> int:
        return len(t)

    @ray.remote
    def finalize(t: pa.Table, base: int) -> pa.Table:
        return t.append_column(out_col, pa.array(
            base + np.arange(len(t), dtype=np.int64)))

    lens = np.array(ray.get([block_len.remote(r) for r in refs]),
                    dtype=np.int64)
    bases = np.full(len(lens), start, dtype=np.int64)
    if len(lens) > 1:
        bases[1:] += np.cumsum(lens[:-1])
    out = [finalize.remote(r, int(b)) for r, b in zip(refs, bases)]
    return rd.from_arrow_refs(out)


def rendezvous_shard(ds: Dataset, key_col: str, n_shards: int,
                     out_col: str = "shard",
                     seed: int = 9) -> Dataset:
    """Rendezvous (highest-random-weight) consistent sharding — the
    data-placement primitive for stable 100-TB layouts: each row goes
    to ``argmax_s h(key, s)``, so growing the fleet from S to S+1
    moves only ~1/(S+1) of the keys and EVERY mover lands on the new
    shard (pinned: 11.0% moved at 8→9, balance ratio 1.05) — the
    property hash-mod sharding lacks (a resize there reshuffles >80%,
    also pinned). Weights need genuine per-(key, shard) avalanche:
    the repo's multiplicative family makes the S weights of one key
    an ARITHMETIC PROGRESSION mod 2^32, whose argmax is
    endpoint-biased (measured ±30% shard skew) — instead the packed
    slot ``x = (key mod 2^20)·64 + s + seed·2^26`` runs the classic
    BIGINT-safe 32-bit double mix (multiplier 0x45d9f3b < 2^27, so
    every product < 2^59):

        x = ((x >> 16) XOR x) · 0x45d9f3b  mod 2^32   (twice)
        h = (x >> 16) XOR x

    ties → lowest shard. A BIGINT SQL argmax twin reproduces each
    assignment bit-for-bit. Zero shuffles; ``n_shards ≤ 64`` (the
    packed slot width — loud reject beyond)."""
    if n_shards < 1 or n_shards > 64:
        raise ValueError("rendezvous_shard: n_shards must be in "
                         "1..64 (packed-slot width)")

    M = np.uint64(1 << 32)
    C = np.uint64(73244475)
    sidx = np.arange(n_shards, dtype=np.uint64)
    base = np.uint64(seed) * np.uint64(67108864)

    def fn(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64) % np.uint64(1 << 20)
        x = (ids[:, None] * np.uint64(64) + sidx[None, :] + base) % M
        x = ((x >> np.uint64(16)) ^ x) * C % M
        x = ((x >> np.uint64(16)) ^ x) * C % M
        h = (x >> np.uint64(16)) ^ x
        # argmax returns the FIRST maximal index = lowest-shard ties
        shard = np.argmax(h, axis=1).astype(np.int64)
        return t.append_column(out_col, pa.array(shard))

    return ds.map_batches(fn, batch_format="pyarrow")
