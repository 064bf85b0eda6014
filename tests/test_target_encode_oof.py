"""Out-of-fold K-fold target encoding (stages/groupstats)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import target_encode_oof


def _fold(i, k, seed=1):
    return ((i % (1 << 20)) * 2654435761
            + seed * 1315423911) % (1 << 32) % k


def _ds(keys, vals, ids):
    return rd.from_arrow(pa.table({
        "key": pa.array(keys),
        "v": pa.array(vals, type=pa.int64()),
        "did": pa.array(ids, type=pa.int64())}))


def _naive(keys, vals, ids, k, m, seed=1):
    prior = sum(vals) / len(vals)
    out = []
    for key, v, i in zip(keys, vals, ids):
        f = _fold(i, k, seed)
        s = sum(x for kk, x, _ in zip(keys, vals, ids) if kk == key)
        n = sum(1 for kk in keys if kk == key)
        sf = sum(x for kk, x, j in zip(keys, vals, ids)
                 if kk == key and _fold(j, k, seed) == f)
        nf = sum(1 for kk, j in zip(keys, ids)
                 if kk == key and _fold(j, k, seed) == f)
        den = float(n - nf) + m
        te = None if den == 0.0 else (float(s - sf) + m * prior) / den
        out.append((f, te))
    return out


def test_oof_hand_and_parity():
    keys = ["a", "a", "a", "a", "b", "b"]
    vals = [2, 4, 6, 10, 3, 9]
    ids = [0, 1, 2, 3, 4, 5]
    out = target_encode_oof(_ds(keys, vals, ids), "key", "v", "did",
                            k=2, m=0.0, num_buckets=4).to_pandas()
    out = out.sort_values("did").reset_index(drop=True)
    exp = _naive(keys, vals, ids, 2, 0.0)
    for i, (f, te) in enumerate(exp):
        assert out.loc[i, "fold"] == f
        if te is None:
            assert np.isnan(out.loc[i, "te"])
        else:
            assert out.loc[i, "te"] == te


def test_oof_fuzz_naive_parity_bitexact():
    rng = np.random.default_rng(5)
    for k, m in [(2, 0.0), (5, 3.5), (3, 10.0)]:
        n = 200
        keys = [f"k{int(x)}" for x in rng.integers(0, 12, n)]
        vals = rng.integers(-40, 120, n).tolist()
        ids = rng.integers(0, 1 << 40, n).tolist()
        out = target_encode_oof(_ds(keys, vals, ids), "key", "v",
                                "did", k=k, m=m,
                                num_buckets=4).to_pandas()
        out = out.sort_values("did").reset_index(drop=True)
        order = np.argsort(ids, kind="stable")
        exp = _naive(keys, vals, ids, k, m)
        for row, j in zip(range(n), order):
            f, te = exp[j]
            assert out.loc[row, "fold"] == f
            if te is None:
                assert np.isnan(out.loc[row, "te"])
            else:
                assert out.loc[row, "te"] == te


def test_oof_singleton_and_rejects():
    # a key entirely inside ONE fold: te null at m=0, finite at m>0
    keys, vals, ids = ["x"], [5], [7]
    out = target_encode_oof(_ds(keys, vals, ids), "key", "v", "did",
                            k=2, m=0.0, num_buckets=2).to_pandas()
    assert np.isnan(out["te"].iloc[0])
    out = target_encode_oof(_ds(keys, vals, ids), "key", "v", "did",
                            k=2, m=2.0, num_buckets=2).to_pandas()
    assert out["te"].iloc[0] == (0.0 + 2.0 * 5.0) / (0.0 + 2.0)
    with pytest.raises(ValueError):
        target_encode_oof(_ds(["a"], [1], [0]), "key", "v", "did", k=1)
    with pytest.raises(Exception):
        target_encode_oof(rd.from_arrow(pa.table(
            {"key": ["a"], "v": pa.array([0.5]),
             "did": pa.array([1], type=pa.int64())})),
            "key", "v", "did", k=2).to_pandas()
