"""Goldens for stages/curation.weighted_sample — Efraimidis–Spirakis
weighted sampling without replacement."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import weighted_sample


def _naive(ids, w, k, seed=7):
    u64 = ids.astype(np.uint64)
    h = ((u64 % np.uint64(1 << 20)) * np.uint64(2654435761)
         + np.uint64(seed) * np.uint64(1315423911)) % np.uint64(1 << 32)
    key = np.log((h + np.uint64(1)).astype(np.float64)
                 / 4294967297.0) / w
    order = np.lexsort((ids, -key))
    return ids[order[:k]]


def test_naive_parity_and_layout_invariance():
    rng = np.random.default_rng(3)
    ids = rng.permutation(np.arange(1, 2001))
    w = rng.uniform(0.01, 20, 2000)
    t = pa.table({"doc_id": ids, "wt": w})
    exp = _naive(ids, w, 25)
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = weighted_sample(ds, k=25, weight_col="wt") \
            .to_pandas().sort_values("sample_rank")
        assert got["doc_id"].tolist() == exp.tolist()
        assert got["sample_rank"].tolist() == list(range(1, 26))


def test_weight_bias_and_seed_independence():
    # item with 50x the weight of the rest appears in far more
    # seed-samples than a baseline item
    ids = np.arange(1, 301)
    w = np.ones(300)
    w[0] = 50.0
    t = pa.table({"doc_id": ids, "wt": w})
    heavy = light = 0
    for seed in range(12):
        got = weighted_sample(rd.from_arrow(t), k=30, weight_col="wt",
                              seed=seed).to_pandas()
        sel = set(got["doc_id"])
        heavy += 1 in sel
        light += 2 in sel
    assert heavy >= 10
    assert light <= 6


def test_k_exceeds_n_and_rejects():
    t = pa.table({"doc_id": [1, 2, 3], "wt": [1.0, 2.0, 3.0]})
    got = weighted_sample(rd.from_arrow(t), k=10, weight_col="wt") \
        .to_pandas()
    assert sorted(got["doc_id"]) == [1, 2, 3]
    assert sorted(got["sample_rank"]) == [1, 2, 3]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(rd.from_arrow(t), k=0, weight_col="wt")
    bad = pa.table({"doc_id": [1, 2], "wt": [1.0, 0.0]})
    with pytest.raises(Exception, match="strictly positive"):
        weighted_sample(rd.from_arrow(bad), k=1,
                        weight_col="wt").to_pandas()
