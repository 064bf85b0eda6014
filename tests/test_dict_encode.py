"""Goldens for relational.dict_encode_column."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.relational import dict_encode_column


def test_codes_sorted_dense_and_roundtrip(ray_session):
    rng = np.random.default_rng(3)
    vals = np.array(["pear", "apple", "fig", "apple", "fig", "pear",
                     "apple"])[rng.integers(0, 7, 300)]
    t = pa.table({"id": pa.array(np.arange(300, dtype=np.int64)),
                  "s": pa.array(vals)})
    enc, cb = dict_encode_column(rd.from_arrow(t).repartition(4), "s")
    cbd = cb.to_pandas()
    assert list(cbd["value"]) == sorted(set(vals))
    assert list(cbd["code"]) == list(range(len(cbd)))
    out = enc.to_pandas().sort_values("id")
    m = dict(zip(cbd["value"], cbd["code"]))
    assert [m[v] for v in out["s"]] == list(out["s_code"])


def test_nulls_stay_null(ray_session):
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["b", None, "a"])})
    enc, cb = dict_encode_column(rd.from_arrow(t), "s")
    out = enc.to_pandas().sort_values("id")
    assert list(cb.to_pandas()["value"]) == ["a", "b"]
    assert out["s_code"].tolist()[0] == 1
    assert np.isnan(out["s_code"].tolist()[1])
    assert out["s_code"].tolist()[2] == 0
