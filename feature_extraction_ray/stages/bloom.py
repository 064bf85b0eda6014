"""Bloom-filter semi-join — the large×large key-membership filter.

The broadcast ``semi_join`` (``stages/relational.py``) materializes the
build side's distinct keys on the driver, which is right when they fit.
When the build side is itself huge (the 100-TB join case), ship an
m-bit Bloom filter instead:

1. **Distributed build** — every build-side block sets its keys' bits
   into a private ``m/8``-byte bitmap (``map_batches``, one binary row
   per block); the driver OR-merges the bitmaps STREAMING via
   ``iter_batches`` (holds one bitmap at a time, never the block list).
2. **Broadcast probe** — the merged bitmap is ``ray.put`` once and every
   probe-side batch tests membership vectorized (double hashing,
   ``k`` probes of numpy bit arithmetic). No false negatives.
3. **Exact verification** — Bloom false positives are removed by a
   bucketed tagged-union semi-join over the SURVIVORS only, so the
   all-to-all exchange sees ``|match| + fpp·|left|`` rows instead of
   all of ``left``. The final result is EXACT.

Reference parity: the reference's only membership filter is the
driver-side ``isin`` (``microsoft_asr_features/group_audio_files.py:
42-44``, M13); this is its at-scale twin. Sizing uses the standard
Bloom dimensioning ``m = -n·ln(fpp)/ln(2)²``, ``k = (m/n)·ln 2``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .partition import _stable_hash_strings, broadcast_get
from .window import DEFAULT_NUM_BUCKETS

_SIDE = "__bloom_side"
_KEY = "__bloom_key"


def _hash_pair(arr) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (double hashing: probe i
    uses ``h1 + i·h2``). ``h2`` is forced odd so the probe sequence
    never degenerates for power-of-two ``num_bits``."""
    h1 = _stable_hash_strings(arr)
    with np.errstate(over="ignore"):
        v = h1 ^ np.uint64(0xA24BAED4963EE407)
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
    return h1, v | np.uint64(1)


class BloomFilter(NamedTuple):
    bits: np.ndarray          # uint8[num_bits // 8]
    num_bits: int             # power of two
    num_hashes: int

    def contains(self, arr) -> np.ndarray:
        """Vectorized membership test for an Arrow key column.
        Null keys test False (SQL ``IN`` semantics)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = None
        if arr.null_count:
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            fillv = "" if (pa.types.is_string(arr.type) or
                           pa.types.is_large_string(arr.type)) else 0
            arr = arr.fill_null(fillv)
        h1, h2 = _hash_pair(arr)
        mask = np.ones(len(h1), dtype=bool)
        mod = np.uint64(self.num_bits - 1)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                idx = (h1 + np.uint64(i) * h2) & mod
                byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                mask &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) \
                    & np.uint8(1) != 0
        if valid is not None:
            mask &= valid
        return mask


def dimension_bloom(n: int, fpp: float) -> tuple[int, int]:
    """(num_bits rounded up to a power of two, num_hashes) for an
    expected ``n`` distinct keys at false-positive rate ``fpp``."""
    n = max(int(n), 1)
    m = max(1024, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = 1 << (m - 1).bit_length()
    k = max(1, round(num_bits / n * math.log(2)))
    return num_bits, min(k, 16)


def build_bloom(ds: Dataset, key_col: str, *, num_bits: int | None = None,
                num_hashes: int | None = None, fpp: float = 0.01,
                count_estimate: int | None = None) -> BloomFilter:
    """Distributed Bloom build over ``ds[key_col]``.

    Per-block bitmaps are OR-merged on the driver one at a time
    (``iter_batches`` streaming) — driver peak memory is 2 bitmaps, and
    the object store holds blocks-many ``m/8``-byte rows, never the
    keys themselves."""
    if num_bits is None:
        n = count_estimate if count_estimate is not None else ds.count()
        num_bits, k = dimension_bloom(n, fpp)
        num_hashes = num_hashes or k
    num_hashes = num_hashes or 7
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    nbytes = num_bits // 8
    mod = np.uint64(num_bits - 1)
    k = num_hashes

    def block_bits(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.drop_null()
        bits = np.zeros(nbytes, dtype=np.uint8)
        if len(col):
            h1, h2 = _hash_pair(col)
            with np.errstate(over="ignore"):
                for i in range(k):
                    idx = (h1 + np.uint64(i) * h2) & mod
                    np.bitwise_or.at(
                        bits, (idx >> np.uint64(3)).astype(np.int64),
                        (np.uint8(1) << (idx & np.uint64(7))
                         .astype(np.uint8)))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          type=pa.binary())})

    agg = np.zeros(nbytes, dtype=np.uint8)
    parts = ds.map_batches(block_bits, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b["bits"]:
            np.bitwise_or(agg, np.frombuffer(buf.as_py(), dtype=np.uint8),
                          out=agg)
    return BloomFilter(agg, num_bits, num_hashes)


def bloom_filter_rows(left: Dataset, bloom: BloomFilter,
                      key_col: str) -> Dataset:
    """Keep only rows whose key MAY be in the filter (no false
    negatives; ~fpp false positives survive)."""
    ref = ray.put(bloom)

    def fn(batch: pa.Table) -> pa.Table:
        bf: BloomFilter = broadcast_get(ref)
        return batch.filter(pa.array(bf.contains(batch[key_col])))

    return left.map_batches(fn, batch_format="pyarrow")


def bucketed_semi_join(left: Dataset, right: Dataset, *, left_key: str,
                       right_key: str, anti: bool = False,
                       num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """Exact large×large semi/anti join: ONE tagged-union all-to-all.

    Left rows (tag 0, full payload) and right distinct-per-block keys
    (tag 1, null payload) are unioned under left's schema + a key
    column, hash-bucketed by key, and each bucket keeps the left rows
    whose key is (not, if ``anti``) present among its right keys.
    Payload list columns should be variable lists (see
    ``interval._transport_type`` for the fixed-size-list caveat)."""
    lschema = left.schema().base_schema
    left_names = list(lschema.names)
    ltypes = {c: lschema.field(c).type for c in left_names}

    def tag_left(tbl: pa.Table) -> pa.Table:
        tbl = tbl.append_column(_KEY, tbl[left_key])
        return tbl.append_column(
            _SIDE, pa.array(np.zeros(len(tbl), dtype=np.int8)))

    def tag_right(tbl: pa.Table) -> pa.Table:
        keys = tbl[right_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = pc.unique(keys.drop_null())  # shrink transport per block
        out = {c: pa.nulls(len(keys), type=ltypes[c]) for c in left_names}
        out[_KEY] = keys.cast(ltypes[left_key])
        out[_SIDE] = pa.array(np.ones(len(keys), dtype=np.int8))
        return pa.table(out)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def filter_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl[_SIDE].to_numpy(zero_copy_only=False)
        lt = tbl.filter(pa.array(side == 0))
        rkeys = tbl.filter(pa.array(side == 1))[_KEY]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        mask = pc.is_in(lt[_KEY], value_set=pc.unique(rkeys))
        mask = pc.fill_null(mask, False)
        if anti:
            mask = pc.invert(mask)
        return lt.filter(mask).select(left_names)

    from .window import bucketed_apply
    return bucketed_apply(tagged, _KEY, filter_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def bloom_semi_join(left: Dataset, right: Dataset, *, left_key: str,
                    right_key: str, fpp: float = 0.01,
                    num_bits: int | None = None,
                    count_estimate: int | None = None,
                    exact: str = "bucketed",
                    num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """EXACT semi-join with a Bloom pre-shuffle prune.

    ``exact``: "bucketed" (default) re-verifies survivors through the
    tagged-union exchange; "broadcast" verifies against a driver key
    set (only when right's distinct keys fit); "none" returns the raw
    Bloom survivors (≤ fpp·|left| extra rows, documented approximate).
    """
    bloom = build_bloom(right, right_key, num_bits=num_bits, fpp=fpp,
                        count_estimate=count_estimate)
    survivors = bloom_filter_rows(left, bloom, left_key)
    if exact == "none":
        return survivors
    if exact == "broadcast":
        from .relational import semi_join
        return semi_join(survivors, right, left_key=left_key,
                         right_key=right_key)
    return bucketed_semi_join(survivors, right, left_key=left_key,
                              right_key=right_key, num_buckets=num_buckets)
