"""Speech-graph metrics (G7) — reference parity without networkx.

Reimplements ``text_features/extract_graph.py`` (build ``:25-40``, metrics
``:72-132,135-186,189-226``; cited for parity, code original): a directed
multigraph per group whose nodes are distinct tokens and whose edges link
consecutive tokens *within a segment*; single-token segments contribute an
isolated node. Features (exact reference names, ``{t}`` = graph type):

``num_nodes num_edges ave_degree lcc lsc num_p_edges l1 d di asp`` plus
``_norm`` variants (value / word count).

Derivations used instead of graph-library calls (all equivalent to the
reference's networkx formulation):

* ``ave_degree`` — MultiDiGraph total degree sums to 2·E ⇒ ATD = 2E/N.
* ``num_p_edges`` — Σ_{distinct e}(count−1) = E − #distinct directed edges.
* ``lcc`` — union-find over undirected unique edges + isolated nodes.
* ``lsc`` — iterative Kosaraju over unique directed edges.
* ``d`` — E′ = E − (L1 + PE − PE∩L1); d = E′/N² (NaN when N = 0).
* ``di``/``asp`` — BFS all-pairs over each undirected component
  (self-loops and multiplicities don't change shortest paths).

Graphs here are per-(entity, session) token graphs — tiny (vocab-bounded)
— so O(N·(N+E)) BFS per group is cheap even at corpus scale because the
work parallelizes over groups in the bucketed stage.
"""

from __future__ import annotations

from collections import deque

import numpy as np

FEATURE_NAMES = ["num_nodes", "num_edges", "ave_degree", "lcc", "lsc",
                 "num_p_edges", "l1", "d", "di", "asp"]


def _edges_from_segments(segments) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(src, dst) edge arrays + node ids from token segments."""
    srcs, dsts, nodes = [], [], []
    for seg in segments:
        seg = np.asarray(seg)
        if len(seg) == 0:
            continue
        nodes.append(seg)
        if len(seg) >= 2:
            srcs.append(seg[:-1])
            dsts.append(seg[1:])
    if not nodes:
        return (np.zeros(0, np.int64),) * 3
    nodes = np.unique(np.concatenate(nodes))
    src = np.concatenate(srcs) if srcs else np.zeros(0, nodes.dtype)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, nodes.dtype)
    return src, dst, nodes


class _UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def _largest_scc(n: int, adj: list) -> int:
    """Iterative Kosaraju: size of the largest strongly connected comp."""
    if n == 0:
        return 0
    radj = [[] for _ in range(n)]
    for u in range(n):
        for v in adj[u]:
            radj[v].append(u)
    visited = [False] * n
    order = []
    for s in range(n):
        if visited[s]:
            continue
        stack = [(s, 0)]
        visited[s] = True
        while stack:
            u, i = stack[-1]
            if i < len(adj[u]):
                stack[-1] = (u, i + 1)
                v = adj[u][i]
                if not visited[v]:
                    visited[v] = True
                    stack.append((v, 0))
            else:
                order.append(u)
                stack.pop()
    comp = [-1] * n
    best = 0
    for s in reversed(order):
        if comp[s] != -1:
            continue
        size = 0
        stack = [s]
        comp[s] = s
        while stack:
            u = stack.pop()
            size += 1
            for v in radj[u]:
                if comp[v] == -1:
                    comp[v] = s
                    stack.append(v)
        best = max(best, size)
    return best


def graph_metrics(segments, word_count: int | None = None,
                  graph_type: str = "naive") -> dict:
    """All G7 metrics for one group of token segments (+ ``_norm``)."""
    src, dst, nodes = _edges_from_segments(segments)
    n = len(nodes)
    e = len(src)
    feats: dict = {}
    t = graph_type

    feats[f"num_nodes_{t}"] = float(n)
    feats[f"num_edges_{t}"] = float(e)
    feats[f"ave_degree_{t}"] = (2.0 * e / n) if n else float("nan")

    # compress node ids
    s = np.searchsorted(nodes, src)
    d_ = np.searchsorted(nodes, dst)

    # distinct directed edges and parallel-edge counts
    if e:
        key = s.astype(np.int64) * max(n, 1) + d_
        uk, counts = np.unique(key, return_counts=True)
        pe = int(e - len(uk))
        self_mask_unique = (uk // max(n, 1)) == (uk % max(n, 1))
        l1 = int((s == d_).sum())
        pe_l1 = int(l1 - self_mask_unique.sum())
        us, ud = (uk // max(n, 1)).astype(int), (uk % max(n, 1)).astype(int)
    else:
        pe = l1 = pe_l1 = 0
        us = ud = np.zeros(0, int)
    feats[f"num_p_edges_{t}"] = float(pe)
    feats[f"l1_{t}"] = float(l1)

    # LCC via union-find on undirected unique edges
    uf = _UnionFind(n)
    for a, b in zip(us, ud):
        uf.union(a, b)
    if n:
        roots = np.array([uf.find(i) for i in range(n)])
        _, csizes = np.unique(roots, return_counts=True)
        feats[f"lcc_{t}"] = float(csizes.max())
    else:
        feats[f"lcc_{t}"] = 0.0

    # LSC via Kosaraju on unique directed edges
    adj = [[] for _ in range(n)]
    for a, b in zip(us, ud):
        adj[a].append(b)
    feats[f"lsc_{t}"] = float(_largest_scc(n, adj))

    # density on the simple-graph edge count
    e_prime = e - (l1 + pe - pe_l1)
    if e_prime < 0 or n == 0:
        feats[f"d_{t}"] = float("nan")
    else:
        feats[f"d_{t}"] = e_prime / float(n * n)

    # diameter + ASP: BFS all-pairs on the undirected simple graph
    uadj = [set() for _ in range(n)]
    for a, b in zip(us, ud):
        if a != b:
            uadj[a].add(b)
            uadj[b].add(a)
    longest = 0
    total = 0.0
    for start in range(n):
        dist = {start: 0}
        q = deque([start])
        while q:
            u = q.popleft()
            for v in uadj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for node, dd in dist.items():
            if node > start:       # each unordered pair once
                total += dd
                longest = max(longest, dd)
    feats[f"di_{t}"] = float(longest)
    # reference averages over Σ n_c·(n_c−1)/2 pairs per component
    if n:
        roots = np.array([uf.find(i) for i in range(n)])
        _, csizes = np.unique(roots, return_counts=True)
        num_pairs = float((csizes * (csizes - 1) // 2).sum())
    else:
        num_pairs = 0.0
    feats[f"asp_{t}"] = (total / num_pairs) if num_pairs else 0.0

    if word_count is None:
        word_count = int(sum(len(sg) for sg in segments))
    for k in list(feats):
        feats[f"{k}_norm"] = (feats[k] / word_count) if word_count \
            else float("nan")
    return feats
