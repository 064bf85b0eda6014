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
