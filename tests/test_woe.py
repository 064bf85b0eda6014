"""Weight-of-evidence encoding (stages/groupstats.woe_encode)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import woe_encode


def _ds(keys, labels):
    return rd.from_arrow(pa.table({
        "rid": pa.array(range(len(keys)), type=pa.int64()),
        "k": pa.array(keys),
        "y": pa.array(labels, type=pa.int64())}))


def test_woe_hand_case():
    # key a: pos=2 neg=1; key b: pos=0 neg=2; P=2 Q=3, s=0.5
    keys = ["a", "a", "a", "b", "b"]
    labels = [1, 1, 0, 0, 0]
    out = woe_encode(_ds(keys, labels), "k", "y", smoothing=0.5,
                     num_buckets=4).to_pandas()
    # expected via the identical vectorized expression the engine runs
    pos = np.array([2, 0], dtype=np.int64)
    neg = np.array([1, 2], dtype=np.int64)
    exp = np.log(((pos.astype(np.float64) + 0.5) / 2.0)
                 / ((neg.astype(np.float64) + 0.5) / 3.0))
    m = out.set_index("rid").sort_index()
    assert list(m["woe"]) == [exp[0], exp[0], exp[0], exp[1], exp[1]]


def test_woe_naive_parity_exact():
    rng = np.random.default_rng(11)
    n = 500
    keys = [int(v) for v in rng.integers(0, 40, size=n)]
    labels = [int(v) for v in rng.integers(0, 2, size=n)]
    out = woe_encode(_ds(keys, labels), "k", "y", smoothing=2.0,
                     num_buckets=8).to_pandas()
    P = sum(labels)
    Q = n - P
    pos, neg = {}, {}
    for k, y in zip(keys, labels):
        pos[k] = pos.get(k, 0) + y
        neg[k] = neg.get(k, 0) + (1 - y)
    uk = sorted(pos)
    pa_ = np.array([pos[k] for k in uk], dtype=np.int64)
    na_ = np.array([neg[k] for k in uk], dtype=np.int64)
    woe = np.log(((pa_.astype(np.float64) + 2.0) / float(P))
                 / ((na_.astype(np.float64) + 2.0) / float(Q)))
    exp = {k: w for k, w in zip(uk, woe)}
    got = out.set_index("rid").sort_index()
    for rid in range(n):
        # same vectorized np.log → identical doubles
        assert got["woe"].iloc[rid] == exp[keys[rid]]


def test_woe_rejects():
    with pytest.raises(ValueError, match="smoothing"):
        woe_encode(_ds(["a"], [1]), "k", "y", smoothing=0.0)
    with pytest.raises(ValueError, match="single-class"):
        woe_encode(_ds(["a", "b"], [1, 1]), "k", "y")
    with pytest.raises(Exception, match="0/1"):
        woe_encode(_ds(["a", "b"], [1, 2]), "k", "y").to_pandas()
