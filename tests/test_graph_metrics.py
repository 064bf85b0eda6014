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
