"""Goldens for editdist.sorted_neighborhood_pairs."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.editdist import \
    sorted_neighborhood_pairs


def _naive(keys, ids, w):
    order = sorted(range(len(keys)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for p in range(len(order)):
        for q in range(p + 1, min(p + w + 1, len(order))):
            out.add((ids[order[p]], ids[order[q]], q - p))
    return out


def test_naive_parity_layouts(ray_session):
    rng = np.random.default_rng(3)
    n = 300
    keys = [f"k{v:03d}" for v in rng.integers(0, 120, n)]
    ids = rng.permutation(10 ** 5)[:n].astype(np.int64)
    exp = _naive(keys, ids.tolist(), 4)
    for nb in (1, 5):
        t = pa.table({"key": pa.array(keys), "id": pa.array(ids)})
        ds = rd.from_arrow(t)
        if nb > 1:
            ds = ds.repartition(nb)
        out = sorted_neighborhood_pairs(ds, "key", "id",
                                        window=4).to_pandas()
        got = set(zip(out["id_a"], out["id_b"], out["gap"]))
        assert got == exp
        assert len(out) == len(exp)  # no duplicate pairs


def test_pair_count_formula(ray_session):
    # n sorted records, window w: pairs = sum_{g=1..w} (n-g)
    n, w = 50, 3
    t = pa.table({"key": pa.array([f"{i:02d}" for i in range(n)]),
                  "id": pa.array(np.arange(n, dtype=np.int64))})
    out = sorted_neighborhood_pairs(rd.from_arrow(t), "key", "id",
                                    window=w).to_pandas()
    assert len(out) == sum(n - g for g in range(1, w + 1))


def test_reject(ray_session):
    t = pa.table({"key": ["a"], "id": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(rd.from_arrow(t), "key", "id", 0)
