"""Goldens for similarity.procrustes_crosscov / procrustes_align."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.similarity import (procrustes_align,
                                                      procrustes_crosscov)


def _mk(a, b):
    n, d = a.shape
    off = pa.array((np.arange(n + 1) * d).astype(np.int32))
    off2 = pa.array((np.arange(n + 1) * b.shape[1]).astype(np.int32))
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.ListArray.from_arrays(off, pa.array(
            a.ravel().astype(np.float64))),
        "b": pa.ListArray.from_arrays(off2, pa.array(
            b.ravel().astype(np.float64)))})


def test_crosscov_exact_parity(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(-50, 50, size=(200, 5)).astype(np.float64)
    b = rng.integers(-50, 50, size=(200, 4)).astype(np.float64)
    out = procrustes_crosscov(rd.from_arrow(_mk(a, b)).repartition(4),
                              "a", "b").to_pandas()
    M = a.astype(np.int64).T @ b.astype(np.int64)
    got = np.zeros_like(M)
    for r in out.itertuples():
        got[r.i, r.j] = r.m
    assert (got == M).all()


def test_planted_rotation_recovered(ray_session):
    rng = np.random.default_rng(7)
    a = rng.normal(size=(300, 6))
    # random orthogonal matrix via QR
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    b = a @ q
    aligned, R = procrustes_align(rd.from_arrow(_mk(a, b)), "a", "b")
    assert np.allclose(R, q, atol=1e-8)
    out = aligned.to_pandas().sort_values("id")
    got = np.stack([np.asarray(v) for v in out["aligned"]])
    assert np.allclose(got, b, atol=1e-8)
    # R is orthogonal
    assert np.allclose(R @ R.T, np.eye(6), atol=1e-10)


def test_rejects(ray_session):
    a = np.array([[0.5, 1.0]])
    t = _mk(a, a)
    with pytest.raises(Exception, match="integer-valued"):
        procrustes_crosscov(rd.from_arrow(t), "a", "b")
    big = np.array([[2.0 ** 62]])
    with pytest.raises(Exception, match="2\\^62"):
        procrustes_crosscov(rd.from_arrow(_mk(big, big)), "a", "b")


def test_crosscov_global_overflow_rejected(ray_session):
    # each block passes the per-block bound, but the GLOBAL n*maxa*maxb
    # exceeds 2^62 — the driver sum would silently wrap int64 (round-4
    # advice): must reject loudly
    maxv = 2.0 ** 21
    n_per = 1 << 11
    blocks = 512
    # don't materialize the real thing — construct a tiny ds but spoof
    # the bound via many small blocks of max-magnitude values
    n = 4096
    a = np.full((n, 2), maxv)
    b = np.full((n, 2), maxv)
    # per block (n=512 rows): 512 * 2^21 * 2^21 = 2^51 < 2^62 -> passes
    # global: 4096 * 2^21 * 2^21 = 2^54 < 2^62 -> fine; scale up maxv
    a *= 2 ** 4          # 2^25: global 2^12 * 2^50 = 2^62 -> reject
    b *= 2 ** 4
    ds = rd.from_arrow(_mk(a, b)).repartition(8)
    with pytest.raises(Exception, match="GLOBAL|2\\^62"):
        procrustes_crosscov(ds, "a", "b")


def test_crosscov_per_block_ok_global_checked(ray_session):
    # sanity: just below the global bound still computes exactly
    rng = np.random.default_rng(9)
    a = rng.integers(-3, 4, size=(100, 3)).astype(np.float64)
    b = rng.integers(-3, 4, size=(100, 3)).astype(np.float64)
    out = procrustes_crosscov(rd.from_arrow(_mk(a, b)).repartition(5),
                              "a", "b").to_pandas()
    M = a.astype(np.int64).T @ b.astype(np.int64)
    for r in out.itertuples():
        assert M[int(r.i), int(r.j)] == int(r.m)
