"""Goldens for graphrank.core_numbers (k-core decomposition)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.graphrank import core_numbers


def _naive_core(edges, n):
    """Textbook peeling."""
    adj = [set() for _ in range(n)]
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = np.array([len(a) for a in adj])
    core = np.zeros(n, int)
    alive = set(range(n))
    k = 0
    while alive:
        k += 1
        while True:
            drop = [v for v in alive if deg[v] < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                alive.discard(v)
                for u in adj[v]:
                    if u in alive:
                        deg[u] -= 1
    return core


def _mk(edges):
    return pa.table({
        "a": pa.array([f"n{u}" for u, v in edges]),
        "b": pa.array([f"n{v}" for u, v in edges])})


def test_planted_clique_plus_tail(ray_session):
    # K5 clique (core 4) with a path hanging off (core 1)
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(4, 5), (5, 6), (6, 7)]
    out = core_numbers(rd.from_arrow(_mk(edges)), "a",
                       "b").to_pandas().set_index("node")["core"]
    for i in range(5):
        assert out[f"n{i}"] == 4
    for i in (5, 6, 7):
        assert out[f"n{i}"] == 1


def test_naive_peeling_parity_fuzz(ray_session):
    rng = np.random.default_rng(13)
    n = 60
    edges = {(int(a), int(b)) for a, b in
             rng.integers(0, n, size=(400, 2)) if a != b}
    edges = sorted(edges)
    exp = _naive_core(edges, n)
    touched = sorted({u for e in edges for u in e})
    out = core_numbers(rd.from_arrow(_mk(edges)).repartition(4),
                       "a", "b").to_pandas().set_index("node")["core"]
    for v in touched:
        assert out[f"n{v}"] == exp[v], v


def test_duplicate_and_self_edges_ignored(ray_session):
    edges = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)]
    out = core_numbers(rd.from_arrow(_mk(edges)), "a",
                       "b").to_pandas().set_index("node")["core"]
    assert out["n0"] == 1 and out["n1"] == 1 and out["n2"] == 1


def test_empty_graph(ray_session):
    out = core_numbers(rd.from_arrow(_mk([(0, 0)])), "a",
                       "b").to_pandas()
    assert len(out) == 0
