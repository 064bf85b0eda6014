"""Naive-oracle goldens for stages/mining.py (association_pairs,
pareto_frontier)."""
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from feature_extraction_ray.stages.mining import (association_pairs,
                                                  pareto_frontier)


def _table(ds):
    import ray
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else None


@pytest.mark.parametrize("num_buckets", [3, 11])
def test_association_pairs_matches_naive(ray_session, num_buckets):
    rng = np.random.default_rng(17)
    rows_b, rows_i = [], []
    baskets = {}
    for b in range(120):
        items = rng.choice(25, size=rng.integers(1, 7), replace=True)
        baskets[b] = set(int(i) for i in items)
        for i in items:                     # duplicates in the raw rows
            rows_b.append(b)
            rows_i.append(int(i))
    ds = rd.from_arrow(pa.table({"b": pa.array(rows_b, type=pa.int64()),
                                 "i": pa.array(rows_i, type=pa.int64())}))
    out = _table(association_pairs(ds, "b", "i", min_pair_count=2,
                                   num_buckets=num_buckets))
    # naive
    pair_n, item_n = {}, {}
    for b, items in baskets.items():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
        for a, c in combinations(sorted(items), 2):
            pair_n[(a, c)] = pair_n.get((a, c), 0) + 1
    N = len(baskets)
    exp = {k: v for k, v in pair_n.items() if v >= 2}
    got = {(r["item_a"], r["item_b"]): r for r in out.to_pylist()}
    assert set(got) == set(exp)
    for (a, c), n_both in exp.items():
        r = got[(a, c)]
        assert r["n_both"] == n_both
        assert r["support"] == np.float64(n_both) / np.float64(N)
        assert r["lift"] == (np.float64(n_both) * np.float64(N)) / (
            np.float64(item_n[a]) * np.float64(item_n[c]))


def test_association_pairs_no_qualifying_pairs(ray_session):
    ds = rd.from_arrow(pa.table({"b": [1, 2, 3], "i": [1, 2, 3]}))
    out = _table(association_pairs(ds, "b", "i", min_pair_count=2))
    assert out is None or out.num_rows == 0


def test_pareto_frontier_matches_naive_with_duplicates(ray_session):
    rng = np.random.default_rng(9)
    n = 500
    x = rng.integers(0, 40, n).astype(np.float64)
    y = rng.integers(0, 40, n).astype(np.int64)
    # plant exact duplicates of an extreme point: both must survive
    x[0] = x[1] = x.max() + 5
    y[0] = y[1] = y.min() - 5
    tbl = pa.table({"id": pa.array(np.arange(n)), "x": pa.array(x),
                    "y": pa.array(y)})
    out = _table(pareto_frontier(rd.from_arrow(tbl), "x", "y"))
    got = sorted(out["id"].to_pylist())
    exp = [i for i in range(n)
           if not any((x[j] >= x[i]) and (y[j] <= y[i])
                      and (x[j] > x[i] or y[j] < y[i]) for j in range(n))]
    assert got == exp
    assert 0 in got and 1 in got          # duplicated extreme point


def test_pareto_frontier_temporal_min_column(ray_session):
    ts = pa.array([1000, 2000, 3000, 500], type=pa.timestamp("us"))
    tbl = pa.table({"id": [0, 1, 2, 3],
                    "price": pa.array([10.0, 20.0, 20.0, 5.0]),
                    "ts": ts})
    out = _table(pareto_frontier(rd.from_arrow(tbl), "price", "ts"))
    ids = sorted(out["id"].to_pylist())
    # id1 dominates id2 (same price, earlier ts); id0 and id3 are on the
    # staircase (each cheaper but earlier than every higher-price order)
    assert ids == [0, 1, 3]
    assert out.schema.field("ts").type == pa.timestamp("us")
