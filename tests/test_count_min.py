"""Count-Min sketch (stages/sketches.count_min_sketch)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.sketches import (cms_estimate,
                                                    count_min_sketch)


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def _col(tk, r, width, seed=1):
    return ((tk % (1 << 20)) * 2654435761
            + (r + 1) * 40503 + seed * 1315423911) % (1 << 32) % width


def test_cms_cells_naive_parity():
    rng = np.random.default_rng(23)
    docs = [rng.integers(0, 5000, size=int(rng.integers(0, 60)))
            .tolist() for _ in range(50)]
    W, R = 64, 3
    sk = count_min_sketch(_ds(docs), width=W, depth=R, seed=2)
    exp = {}
    for d in docs:
        for tk in d:
            for r in range(R):
                k = (r, _col(tk, r, W, seed=2))
                exp[k] = exp.get(k, 0) + 1
    got = {(r, c): n for r, c, n in zip(sk["row"].to_pylist(),
                                        sk["col"].to_pylist(),
                                        sk["cnt"].to_pylist())}
    assert got == exp
    # sorted output, zero cells omitted
    pairs = list(zip(sk["row"].to_pylist(), sk["col"].to_pylist()))
    assert pairs == sorted(pairs)
    assert all(n > 0 for n in sk["cnt"].to_pylist())


def test_cms_estimate_upper_bound_and_exactness():
    rng = np.random.default_rng(7)
    stream = rng.integers(0, 200, size=3000).tolist()
    true = {}
    for tk in stream:
        true[tk] = true.get(tk, 0) + 1
    sk = count_min_sketch(_ds([stream]), width=512, depth=4)
    qs = sorted(true)
    est = cms_estimate(sk, qs, width=512, depth=4)
    tv = np.array([true[q] for q in qs])
    assert (est >= tv).all()          # CMS never underestimates
    # wide sketch, few tokens → mostly exact
    assert (est == tv).mean() > 0.9
    # absent token: estimate bounded by collisions, usually 0 for a
    # token whose cells are all empty in a wide sketch
    est0 = cms_estimate(sk, [999999], width=512, depth=4)
    assert est0[0] >= 0


def test_cms_mergeability_and_rejects():
    # sketch(A ∪ B) == cellwise sum of sketch(A), sketch(B) — verified
    # implicitly by block-partial construction; pin it across layouts
    docs = [[1, 2, 3] * 5, [2, 3, 4] * 7, [], [9]]
    a = count_min_sketch(_ds(docs), width=32, depth=2)
    b = count_min_sketch(_ds(docs).repartition(4), width=32, depth=2)
    assert a.to_pydict() == b.to_pydict()
    with pytest.raises(ValueError, match=">= 1"):
        count_min_sketch(_ds([[1]]), width=0)
