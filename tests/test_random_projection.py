"""Goldens for similarity.random_projection (signed JL transform)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.similarity import (_rp_signs,
                                                      random_projection)


def _mk(ids, m):
    n, d = m.shape
    off = pa.array((np.arange(n + 1) * d).astype(np.int32))
    v = pa.ListArray.from_arrays(off, pa.array(m.ravel().astype(
        np.float64)))
    return pa.table({"vec_id": pa.array(np.asarray(ids, np.int64)),
                     "v": v})


def test_exact_long_parity_naive(ray_session):
    rng = np.random.default_rng(2)
    m = rng.integers(-1000, 1000, size=(40, 12)).astype(np.float64)
    ids = np.arange(40) * 3
    out = random_projection(rd.from_arrow(_mk(ids, m)).repartition(4),
                            6, vec_col="v", id_col="vec_id", seed=9,
                            exact=True, layout="long").to_pandas() \
        .sort_values(["vec_id", "j"]).reset_index(drop=True)
    S = _rp_signs(12, 6, 9)
    exp = m.astype(np.int64) @ S
    got = out["y"].to_numpy().reshape(40, 6)
    order = np.argsort(ids)
    assert (got == exp[order]).all()
    assert out["y"].dtype == np.int64


def test_sign_matrix_hash_family():
    # spot-check the bilinear popcount form at a few coordinates
    S = _rp_signs(5, 4, 7)
    for i in (0, 3, 4):
        for j in (0, 2, 3):
            a = ((i + 1) * 2654435761 + 7 * 1315423911) % (1 << 32)
            b = ((j + 1) * 2246822519) % (1 << 32)
            par = bin(a & b).count("1") % 2
            assert S[i, j] == (-1 if par else 1)
    # signs are balanced-ish, and distinct columns decorrelated
    S = _rp_signs(256, 32, 5).astype(float)
    assert 0.35 < (S > 0).mean() < 0.65
    C = np.corrcoef(S.T)
    assert np.abs(C[np.triu_indices(32, 1)]).max() < 0.35


def test_list_layout_and_float_mode(ray_session):
    rng = np.random.default_rng(5)
    m = rng.normal(size=(30, 10))
    ids = np.arange(30)
    out = random_projection(rd.from_arrow(_mk(ids, m)), 4,
                            vec_col="v", id_col="vec_id",
                            seed=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    S = _rp_signs(10, 4, 1).astype(np.float64)
    exp = m @ S
    got = np.stack([np.asarray(v) for v in out["y"]])
    assert np.allclose(got, exp, atol=1e-12)


def test_jl_distance_preservation(ray_session):
    rng = np.random.default_rng(13)
    m = rng.normal(size=(60, 128))
    ids = np.arange(60)
    out = random_projection(rd.from_arrow(_mk(ids, m)), 64,
                            vec_col="v", id_col="vec_id",
                            seed=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    y = np.stack([np.asarray(v) for v in out["y"]]) / np.sqrt(64)
    d_in = np.linalg.norm(m[:, None] - m[None], axis=2)[
        np.triu_indices(60, 1)]
    d_out = np.linalg.norm(y[:, None] - y[None], axis=2)[
        np.triu_indices(60, 1)]
    # pairwise distances preserved within the JL bound, on average
    # iid-±1 baseline on this data measures r ≈ 0.53 (JL noise at
    # out_dim=64); the bilinear family measures 0.62
    r = np.corrcoef(d_in, d_out)[0, 1]
    assert r > 0.45
    assert 0.85 < np.median(d_out / d_in) < 1.2


def test_rejects(ray_session):
    m = np.array([[0.5, 1.0]])
    ds = rd.from_arrow(_mk([1], m))
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(ds, 0, vec_col="v", id_col="vec_id")
    with pytest.raises(ValueError, match="unknown layout"):
        random_projection(ds, 2, vec_col="v", id_col="vec_id",
                          layout="bad")
    with pytest.raises(Exception, match="integer-valued"):
        random_projection(ds, 2, vec_col="v", id_col="vec_id",
                          exact=True).materialize()
    big = np.array([[2.0 ** 62, 0.0]])
    with pytest.raises(Exception, match="2\\^62"):
        random_projection(rd.from_arrow(_mk([1], big)), 2,
                          vec_col="v", id_col="vec_id",
                          exact=True).materialize()
