"""Stratified ES sampling (stages/curation.weighted_sample_grouped)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import weighted_sample_grouped


def _key(i, w, seed=7):
    h = ((i % (1 << 20)) * 2654435761 + seed * 1315423911) % (1 << 32)
    return np.log(np.float64(h + 1) / 4294967297.0) / w


def _ds(ids, grp, w):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "g": pa.array(grp),
        "w": pa.array(w, type=pa.float64())}))


def test_grouped_sample_naive_parity_across_layouts():
    rng = np.random.default_rng(47)
    n = 600
    ids = rng.choice(1 << 19, size=n, replace=False).astype(int).tolist()
    grp = [f"g{v}" for v in rng.integers(0, 6, size=n)]
    w = (rng.random(n) * 9 + 1).tolist()
    exp = {}
    for i, g, ww in zip(ids, grp, w):
        exp.setdefault(g, []).append((-_key(i, ww), i))
    expected = {}
    for g, lst in exp.items():
        lst.sort()
        for r, (_, i) in enumerate(lst[:25], 1):
            expected[i] = (g, r)
    for nb in (1, 4):
        out = weighted_sample_grouped(
            _ds(ids, grp, w).repartition(nb), "g", k=25,
            weight_col="w", id_col="doc_id", num_buckets=4) \
            .to_pandas()
        got = {r.doc_id: (r.g, r.sample_rank) for r in out.itertuples()}
        assert got == expected


def test_grouped_sample_small_groups_and_rejects():
    out = weighted_sample_grouped(
        _ds([1, 2, 3], ["a", "a", "b"], [1.0, 2.0, 3.0]), "g", k=5,
        weight_col="w", id_col="doc_id").to_pandas()
    assert len(out) == 3          # groups smaller than k keep all
    assert set(out[out["g"] == "a"]["sample_rank"]) == {1, 2}
    assert list(out[out["g"] == "b"]["sample_rank"]) == [1]
    with pytest.raises(ValueError, match="k must"):
        weighted_sample_grouped(_ds([1], ["a"], [1.0]), "g", k=0,
                                weight_col="w")
    with pytest.raises(Exception, match="positive"):
        weighted_sample_grouped(_ds([1], ["a"], [0.0]), "g", k=1,
                                weight_col="w").to_pandas()
