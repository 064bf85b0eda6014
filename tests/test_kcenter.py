"""Goldens for similarity.kcenter_select (greedy k-center coreset)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.similarity import kcenter_select


def _mk(ids, m):
    n, d = m.shape
    off = pa.array((np.arange(n + 1) * d).astype(np.int32))
    v = pa.ListArray.from_arrays(off, pa.array(m.ravel().astype(
        np.float64)))
    return pa.table({"vec_id": pa.array(np.asarray(ids, np.int64)),
                     "v": v})


def _naive(ids, m, k):
    """Sequential greedy k-center, int64-exact when m is integer."""
    ids = np.asarray(ids)
    order = np.argsort(ids, kind="stable")
    ids, m = ids[order], m[order]
    exact = np.all(m == np.floor(m))
    mm = m.astype(np.int64) if exact else m.astype(np.float64)
    picks = [(1, int(ids[0]), None)]
    mind = ((mm - mm[0]) ** 2).sum(axis=1)
    live = np.ones(len(ids), bool)
    live[0] = False
    for r in range(2, min(k, len(ids)) + 1):
        mx = mind[live].max()
        cand = np.flatnonzero(live & (mind == mx))
        j = cand[np.argmin(ids[cand])]
        picks.append((r, int(ids[j]),
                      int(mind[j]) if exact else float(mind[j])))
        mind = np.minimum(mind, ((mm - mm[j]) ** 2).sum(axis=1))
        live[j] = False
    return picks


def test_exact_parity_int_layout_invariant(ray_session):
    rng = np.random.default_rng(7)
    ids = rng.permutation(4000)[:90]
    m = rng.integers(-50, 50, size=(90, 6)).astype(np.float64)
    m[17] = m[3]          # exact duplicate pair
    exp = _naive(ids, m, 9)
    for nb in (1, 5):
        ds = rd.from_arrow(_mk(ids, m))
        if nb > 1:
            ds = ds.repartition(nb)
        out = kcenter_select(ds, 9, vec_col="v", id_col="vec_id") \
            .to_pandas().sort_values("rank")
        got = [(int(r), int(i), None if n == 1 else int(d))
               for n, (r, i, d) in enumerate(
                   zip(out["rank"], out["vec_id"], out["mind"]),
                   start=1)]
        assert got == exp


def test_float_mode_parity(ray_session):
    rng = np.random.default_rng(11)
    ids = np.arange(60)
    m = rng.normal(size=(60, 5))
    exp = _naive(ids, m, 6)
    out = kcenter_select(rd.from_arrow(_mk(ids, m)).repartition(4),
                         6, vec_col="v", id_col="vec_id") \
        .to_pandas().sort_values("rank")
    for n, (r, i, d) in enumerate(zip(out["rank"], out["vec_id"],
                                      out["mind"]), start=1):
        er, ei, ed = exp[n - 1]
        assert (int(r), int(i)) == (er, ei)
        if n > 1:
            assert abs(float(d) - ed) < 1e-9


def test_k_exceeds_n_stops_early(ray_session):
    ids = [5, 2, 9]
    m = np.array([[0.0, 0], [3, 0], [0, 4]])
    out = kcenter_select(rd.from_arrow(_mk(ids, m)), 10,
                         vec_col="v", id_col="vec_id").to_pandas()
    assert len(out) == 3
    assert sorted(out["vec_id"]) == [2, 5, 9]


def test_merge_plan_recovers_planted_clusters(ray_session):
    rng = np.random.default_rng(3)
    centers = np.array([[0, 0], [1000, 0], [0, 1000], [1000, 1000],
                        [500, 2000]], dtype=np.float64)
    pts = np.concatenate([c + rng.integers(-3, 4, size=(40, 2))
                          for c in centers])
    ids = np.arange(len(pts))
    ds = rd.from_arrow(_mk(ids, pts.astype(np.float64))).repartition(6)
    out = kcenter_select(ds, 5, vec_col="v", id_col="vec_id",
                         plan="merge").to_pandas()
    picked = pts[np.asarray(out["vec_id"], int)]
    # one pick per planted cluster
    owner = np.argmin(((picked[:, None, :] - centers[None]) ** 2)
                      .sum(axis=2), axis=1)
    assert sorted(owner) == [0, 1, 2, 3, 4]


def test_merge_equals_exact_on_single_block(ray_session):
    rng = np.random.default_rng(19)
    ids = np.arange(50)
    m = rng.integers(0, 100, size=(50, 4)).astype(np.float64)
    ds = rd.from_arrow(_mk(ids, m))
    a = kcenter_select(ds, 7, vec_col="v", id_col="vec_id") \
        .to_pandas()
    b = kcenter_select(ds, 7, vec_col="v", id_col="vec_id",
                       plan="merge").to_pandas()
    assert list(a["vec_id"]) == list(b["vec_id"])


def test_rejects(ray_session):
    ids = [1, 2]
    m = np.array([[0.0], [1.0]])
    ds = rd.from_arrow(_mk(ids, m))
    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(ds, 0, vec_col="v", id_col="vec_id")
    with pytest.raises(ValueError, match="unknown plan"):
        kcenter_select(ds, 2, vec_col="v", id_col="vec_id", plan="x")
    big = np.array([[3.1e9], [-3.1e9]])  # 1*(2*3.1e9)^2 > 2^63
    with pytest.raises(ValueError, match="exact-int64"):
        kcenter_select(rd.from_arrow(_mk(ids, big)), 2,
                       vec_col="v", id_col="vec_id")
    empty = _mk([], np.zeros((0, 1)))
    with pytest.raises(ValueError, match="empty input"):
        kcenter_select(rd.from_arrow(empty), 2, vec_col="v",
                       id_col="vec_id")
