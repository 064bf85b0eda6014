import numpy as np
import pyarrow as pa




def test_rrf_fuse_hand_computed_and_one_sided():
    import ray.data as rd

    from feature_extraction_ray.stages.similarity import rrf_fuse
    # list A ranks: 1→r1 (9.0), 2→r2 (5.0), 3→r3 (5.0 tie, id asc)
    a = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "sa": pa.array([9.0, 5.0, 5.0])})
    # list B ranks: 3→r1 (0.9), 2→r2 (0.2); 4 only in B → r3
    b = pa.table({"vec_id": pa.array([3, 2, 4], type=pa.int64()),
                  "sb": pa.array([0.9, 0.2, 0.1])})
    out = rrf_fuse(rd.from_arrow(a), rd.from_arrow(b),
                   id_a="doc_id", id_b="vec_id",
                   score_a="sa", score_b="sb", k=60, num_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["r_a"].tolist()[:3] == [1, 2, 3]
    assert np.isnan(out["r_a"][3])          # 4 absent from A
    assert out["r_b"].tolist()[1:] == [2, 1, 3]
    assert np.isnan(out["r_b"][0])          # 1 absent from B
    exp = [1.0 / 61, 1.0 / 62 + 1.0 / 62, 1.0 / 63 + 1.0 / 61,
           1.0 / 63]
    assert out["rrf"].tolist() == exp       # strict IEEE equality


def test_fuzz_rrf_vs_naive():
    """Random overlapping ranked lists with score ties through
    rrf_fuse, compared against a naive reference (exact IEEE sums)."""
    import ray.data as rd

    from feature_extraction_ray.stages.similarity import rrf_fuse
    rng = np.random.default_rng(912)
    ids = np.arange(200, dtype=np.int64)
    a_ids = rng.choice(ids, size=120, replace=False)
    b_ids = rng.choice(ids, size=90, replace=False)
    a_sc = np.round(rng.random(120) * 10, 2)      # coarse → many ties
    b_sc = np.round(rng.random(90), 1)
    a = pa.table({"doc_id": pa.array(np.sort(a_ids)), "sa": pa.array(a_sc)})
    b = pa.table({"vec_id": pa.array(np.sort(b_ids)), "sb": pa.array(b_sc)})
    out = rrf_fuse(rd.from_arrow(a), rd.from_arrow(b),
                   id_a="doc_id", id_b="vec_id",
                   score_a="sa", score_b="sb", k=60, num_buckets=4) \
        .to_pandas()

    def ranks(idv, sc):
        order = sorted(range(len(idv)), key=lambda i: (-sc[i], idv[i]))
        return {idv[j]: r + 1 for r, j in enumerate(order)}

    ra = ranks(np.sort(a_ids), a_sc)
    rb = ranks(np.sort(b_ids), b_sc)
    assert len(out) == len(set(a_ids) | set(b_ids))
    for _, row in out.iterrows():
        i = row["doc_id"]
        ta = 1.0 / (60 + ra[i]) if i in ra else 0.0
        tb = 1.0 / (60 + rb[i]) if i in rb else 0.0
        assert row["rrf"] == ta + tb
        if i in ra:
            assert row["r_a"] == ra[i]
        else:
            assert np.isnan(row["r_a"])
