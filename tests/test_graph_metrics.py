"""G7 speech-graph metric tests: hand-computed small cases + invariants.

Reference semantics: text_features/extract_graph.py (see functions/graph.py
docstring for the derivations)."""
import numpy as np
import pytest

from feature_extraction_ray.functions.graph import graph_metrics


def test_simple_chain():
    # one segment a->b->c : 3 nodes, 2 edges, no loops
    f = graph_metrics([[1, 2, 3]])
    assert f["num_nodes_naive"] == 3
    assert f["num_edges_naive"] == 2
    assert f["ave_degree_naive"] == pytest.approx(4 / 3)
    assert f["lcc_naive"] == 3
    assert f["lsc_naive"] == 1          # no cycles -> singleton SCCs
    assert f["num_p_edges_naive"] == 0
    assert f["l1_naive"] == 0
    assert f["d_naive"] == pytest.approx(2 / 9)
    assert f["di_naive"] == 2           # a..c
    assert f["asp_naive"] == pytest.approx((1 + 1 + 2) / 3)
    assert f["num_nodes_naive_norm"] == pytest.approx(1.0)  # 3 nodes/3 words


def test_cycle_and_parallel_and_selfloop():
    # segment a->b->a->a : edges (a,b),(b,a),(a,a)
    f = graph_metrics([[1, 2, 1, 1]])
    assert f["num_nodes_naive"] == 2
    assert f["num_edges_naive"] == 3
    assert f["l1_naive"] == 1
    assert f["num_p_edges_naive"] == 0
    assert f["lsc_naive"] == 2          # a<->b cycle
    assert f["lcc_naive"] == 2
    # E' = 3 - (1 + 0 - 0) = 2; d = 2/4
    assert f["d_naive"] == pytest.approx(0.5)
    assert f["di_naive"] == 1


def test_parallel_edges_counted_once_each_repeat():
    # a->b twice, b->c once
    f = graph_metrics([[1, 2], [1, 2], [2, 3]])
    assert f["num_edges_naive"] == 3
    assert f["num_p_edges_naive"] == 1
    # E' = 3 - (0 + 1 - 0) = 2 ; d = 2/9
    assert f["d_naive"] == pytest.approx(2 / 9)


def test_isolated_single_word_segment():
    # single-word segment adds an isolated node (extract_graph.py:39-40)
    f = graph_metrics([[5], [1, 2]])
    assert f["num_nodes_naive"] == 3
    assert f["num_edges_naive"] == 1
    assert f["lcc_naive"] == 2
    assert f["asp_naive"] == pytest.approx(1.0)  # only the connected pair


def test_empty_group():
    f = graph_metrics([])
    assert f["num_nodes_naive"] == 0
    assert np.isnan(f["ave_degree_naive"])
    assert np.isnan(f["d_naive"])
    assert f["di_naive"] == 0
    assert np.isnan(f["num_nodes_naive_norm"])


@pytest.mark.parametrize("seed", range(4))
def test_invariants_random(seed):
    rng = np.random.default_rng(seed)
    segments = [rng.integers(0, 12, size=rng.integers(1, 30)).tolist()
                for _ in range(5)]
    f = graph_metrics(segments)
    n, e = f["num_nodes_naive"], f["num_edges_naive"]
    assert f["ave_degree_naive"] == pytest.approx(2 * e / n)
    assert f["lcc_naive"] <= n
    assert f["lsc_naive"] <= f["lcc_naive"]
    assert 0 <= f["num_p_edges_naive"] <= e
    assert f["di_naive"] <= n
    wc = sum(len(s) for s in segments)
    assert f["num_edges_naive_norm"] == pytest.approx(e / wc)


# ---------------------------------------------------------------------------
# Distributed triangle counting (graphrank.triangle_counts)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_buckets,closure",
                         [(3, "broadcast"), (9, "attach")])
def test_triangle_counts_matches_naive(ray_session, num_buckets, closure):
    from itertools import combinations

    import pyarrow as pa
    import ray
    import ray.data as rd

    from feature_extraction_ray.stages.graphrank import triangle_counts

    rng = np.random.default_rng(41)
    m = 500
    # raw stream with duplicates, both directions, and self-loops
    s = rng.integers(0, 50, m)
    d = rng.integers(0, 50, m)
    ds = rd.from_arrow(pa.table({"s": pa.array(s), "d": pa.array(d)}))
    out = triangle_counts(ds, "s", "d", num_buckets=num_buckets,
                          closure=closure)
    parts = [p for p in (ray.get(r) for r in out.to_arrow_refs())
             if p.num_rows]
    got = {r["node"]: r for t in parts for r in t.to_pylist()}

    edges = {(min(a, b), max(a, b)) for a, b in zip(s, d) if a != b}
    adj = {}
    for a, b in edges:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    assert set(got) == set(adj)
    for n, nbrs in adj.items():
        t = sum((x, y) in edges
                for x, y in combinations(sorted(nbrs), 2))
        assert got[n]["degree"] == len(nbrs)
        assert got[n]["n_tri"] == t
        if len(nbrs) < 2:
            assert got[n]["clustering"] is None
        else:
            assert got[n]["clustering"] == np.float64(2 * t) / np.float64(
                len(nbrs) * (len(nbrs) - 1))


def test_triangle_counts_empty_and_triangle_free(ray_session):
    import pyarrow as pa
    import ray
    import ray.data as rd

    from feature_extraction_ray.stages.graphrank import triangle_counts

    # pure self-loops -> empty node set
    ds = rd.from_arrow(pa.table({"s": [1, 2], "d": [1, 2]}))
    out = triangle_counts(ds, "s", "d")
    assert sum(p.num_rows for p in
               (ray.get(r) for r in out.to_arrow_refs())) == 0
    # a path graph has zero triangles but well-defined clustering
    ds = rd.from_arrow(pa.table({"s": [1, 2, 3], "d": [2, 3, 4]}))
    parts = [p for p in (ray.get(r) for r in triangle_counts(
        ds, "s", "d").to_arrow_refs()) if p.num_rows]
    rows = {r["node"]: r for t in parts for r in t.to_pylist()}
    assert all(r["n_tri"] == 0 for r in rows.values())
    assert rows[2]["clustering"] == 0.0 and rows[1]["clustering"] is None


def test_label_propagation_cliques_and_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.graphrank import label_propagation

    def clique(names):
        return [(a, b) for a in names for b in names if a != b]
    A = [f"A{i}" for i in range(5)]
    B = [f"B{i}" for i in range(5)]
    edges = clique(A) + clique(B) + [("A0", "B0"), ("B0", "A0")]
    src, dst = zip(*edges)
    ds = rd.from_arrow(pa.table({"s": pa.array(list(src)),
                                 "d": pa.array(list(dst))}))
    comm = label_propagation(ds, "s", "d", iters=5).to_pandas() \
        .set_index("node")["community"]
    assert len({comm[a] for a in A}) == 1
    assert len({comm[b] for b in B}) == 1
    assert comm["A1"] != comm["B1"]
    # sync-update reference equivalence on a fuzz digraph
    rng = np.random.default_rng(7)
    s = rng.integers(0, 40, 400)
    d = rng.integers(0, 40, 400)
    keep = s != d
    s, d = s[keep], d[keep]
    names = np.array([f"n{i:02d}" for i in range(40)])
    ds2 = rd.from_arrow(pa.table({"s": pa.array(names[s]),
                                  "d": pa.array(names[d])}))
    got = label_propagation(ds2, "s", "d", iters=4).to_pandas() \
        .set_index("node")["community"].to_dict()
    nodes = np.sort(np.unique(np.r_[names[s], names[d]]))
    idx = {nm: i for i, nm in enumerate(nodes)}
    si = np.array([idx[nm] for nm in names[s]])
    di = np.array([idx[nm] for nm in names[d]])
    lab = np.arange(len(nodes))
    for _ in range(4):
        new = lab.copy()
        for v in range(len(nodes)):
            nb = lab[si[di == v]]
            if len(nb):
                vals, cnts = np.unique(nb, return_counts=True)
                new[v] = vals[cnts == cnts.max()].min()
        lab = new
    assert got == {nodes[i]: nodes[lab[i]] for i in range(len(nodes))}
