"""Goldens for graphrank.degree_assortativity / attribute_modularity."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.graphrank import (
    attribute_modularity, degree_assortativity)


def _mk(edges):
    return pa.table({
        "a": pa.array([f"n{u}" for u, v in edges]),
        "b": pa.array([f"n{v}" for u, v in edges])})


def _naive_assort(edges):
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.array(xs, float), np.array(ys, float)
    return np.corrcoef(x, y)[0, 1]


def test_assortativity_matches_corrcoef(ray_session):
    rng = np.random.default_rng(7)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 40, size=(150, 2)) if a < b})
    out = degree_assortativity(rd.from_arrow(_mk(edges)), "a",
                               "b").to_pandas().iloc[0]
    assert out["m"] == 2 * len(edges)
    exp = _naive_assort(edges)
    assert abs(out["r"] - exp) < 1e-10


def test_assortativity_star_is_minus_one(ray_session):
    edges = [(0, i) for i in range(1, 8)]
    out = degree_assortativity(rd.from_arrow(_mk(edges)), "a",
                               "b").to_pandas().iloc[0]
    assert abs(out["r"] - (-1.0)) < 1e-12


def test_assortativity_regular_graph_null_r(ray_session):
    # a cycle: every degree equal -> zero variance -> null r
    edges = [(i, (i + 1) % 6) for i in range(6)]
    out = degree_assortativity(rd.from_arrow(_mk(edges)), "a",
                               "b").to_pandas().iloc[0]
    assert np.isnan(out["r"])


def test_modularity_two_cliques(ray_session):
    # two K4 cliques + one bridge; attribute = clique id
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    edges += [(i, j) for i in range(4, 8) for j in range(i + 1, 8)]
    edges += [(3, 4)]
    attr = pa.table({
        "node": pa.array([f"n{i}" for i in range(8)]),
        "grp": pa.array(["x"] * 4 + ["y"] * 4)})
    out = attribute_modularity(
        rd.from_arrow(_mk(edges)), "a", "b",
        rd.from_arrow(attr), "node", "grp").to_pandas() \
        .sort_values("attr").reset_index(drop=True)
    m = 13
    assert (out["m"] == m).all()
    # each clique: 6 intra edges; degree sums: x = 6*2+1=13, y = 13
    assert list(out["e_c"]) == [6, 6]
    assert list(out["d_c"]) == [13, 13]
    q = 6 / float(m) - (13 / (2.0 * m)) ** 2
    assert np.allclose(out["q_c"], q)
    # strong community structure: total modularity well above 0
    assert out["q_c"].sum() > 0.4


def test_modularity_missing_attr_rejects(ray_session):
    edges = [(0, 1)]
    attr = pa.table({"node": pa.array(["n0"]),
                     "grp": pa.array(["x"])})
    with pytest.raises(Exception, match="no attribute"):
        attribute_modularity(rd.from_arrow(_mk(edges)), "a", "b",
                             rd.from_arrow(attr), "node", "grp") \
            .materialize()
