"""32-bit SQL-twinnable HLL (sketches.hll32_registers): naive per-row
parity, layout invariance (mergeability), estimate accuracy bands,
rejects."""
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.sketches import (hll32_estimate,
                                                    hll32_registers)


def _naive(keys, p, seed):
    m = 1 << p
    w = 32 - p
    regs = {}
    for k in keys:
        if k is None:
            continue
        h = (k * 2654435761 + seed * 1315423911) % (1 << 32)
        r = h >> w
        v = h & ((1 << w) - 1)
        rho = w - v.bit_length() + 1
        regs[r] = max(regs.get(r, 0), rho)
    return regs


def _run(keys, p=6, seed=7, blocks=3):
    tbl = pa.table({"k": pa.array(keys, type=pa.int64())})
    parts = [tbl.slice(i * len(tbl) // blocks,
                       (i + 1) * len(tbl) // blocks
                       - i * len(tbl) // blocks) for i in range(blocks)]
    out = hll32_registers(rd.from_arrow(parts), "k", p=p, seed=seed) \
        .to_pandas()
    return dict(zip(out.register, out.rho_max))


def test_naive_parity_and_layout_invariance():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 31, size=5000).tolist() + [0, 1, (1 << 31) - 1]
    want = _naive(keys, 6, 7)
    assert _run(keys, blocks=1) == want
    assert _run(keys, blocks=11) == want


def test_null_keys_dropped():
    got = _run([5, None, 5, None], blocks=1)
    assert got == _naive([5, 5], 6, 7)


def test_estimate_accuracy():
    rng = np.random.default_rng(9)
    true = 50_000
    keys = np.unique(rng.integers(0, 1 << 31, size=true * 2))[:true]
    out = hll32_registers(rd.from_arrow(
        pa.table({"k": pa.array(keys, type=pa.int64())})), "k", p=10)
    est = hll32_estimate(out.to_pandas(), p=10)
    assert abs(est - true) / true < 0.12     # ~3.3σ at p=10 (σ≈3.25%)


def test_estimate_linear_counting_small():
    keys = list(range(40))
    out = hll32_registers(rd.from_arrow(
        pa.table({"k": pa.array(keys, type=pa.int64())})), "k", p=10)
    est = hll32_estimate(out.to_pandas(), p=10)
    assert abs(est - 40) / 40 < 0.15


def test_rejects():
    ds = rd.from_arrow(pa.table({"k": pa.array([1 << 31], pa.int64())}))
    with pytest.raises(Exception):
        hll32_registers(ds, "k").materialize()
    with pytest.raises(ValueError):
        hll32_registers(ds, "k", p=2)
