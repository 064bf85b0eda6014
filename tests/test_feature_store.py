"""Goldens for pipelines/feature_store.point_in_time_enrich — the
multi-history feature-store lookup: chaining, per-spec knobs, leakage,
collision validation."""
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.pipelines.feature_store import (
    FeatureSpec, point_in_time_enrich)


def _ds(d):
    return rd.from_arrow(pa.table(d))


def test_two_histories_and_zero_leakage():
    facts = _ds({"fid": [1, 2, 3], "ent": ["a", "a", "b"],
                 "t": [10, 20, 15]})
    h1 = _ds({"e": ["a", "a", "b"], "t1": [10, 18, 99],
              "price": [1.0, 2.0, 9.0]})
    h2 = _ds({"e": ["a", "b"], "t2": [20, 10], "prev": [7.0, 8.0]})
    out = point_in_time_enrich(
        facts, "ent", "t",
        [FeatureSpec(h1, "e", "t1", ["price"], broadcast=True),
         FeatureSpec(h2, "e", "t2", ["prev"],
                     allow_exact_matches=False, num_buckets=4)],
    ).to_pandas().sort_values("fid").reset_index(drop=True)
    # h1 backward incl. exact: fid1 t=10 -> price 1.0; fid2 t=20 ->
    # 2.0; fid3 t=15 < 99 -> null (no leakage from the future)
    assert out["price"].tolist()[:2] == [1.0, 2.0]
    assert out["price"].isna().tolist() == [False, False, True]
    # h2 strictly earlier: fid2 t=20 must NOT see the t2=20 row
    assert out["prev"].isna().tolist() == [True, True, False]
    assert out["prev"].tolist()[2] == 8.0
    # facts columns preserved
    assert out["fid"].tolist() == [1, 2, 3]


def test_per_spec_entity_override_and_tolerance():
    import datetime as dt
    facts = _ds({"fid": [1], "ent": ["a"], "other": ["z"],
                 "t": [pa.scalar(1_000_000_000,
                                 type=pa.int64()).as_py()]})
    # spec joins on a DIFFERENT fact column (left_by override)
    h = _ds({"e": ["z"], "ht": [999_000_000], "v": [5.0]})
    out = point_in_time_enrich(
        facts, "ent", "t",
        [FeatureSpec(h, "e", "ht", ["v"], left_by="other",
                     num_buckets=2)]).to_pandas()
    assert out["v"].tolist() == [5.0]
    # tolerance: same join but staleness cap excludes the match
    out2 = point_in_time_enrich(
        facts, "ent", "t",
        [FeatureSpec(h, "e", "ht", ["v"], left_by="other",
                     tolerance=500, num_buckets=2)]).to_pandas()
    assert out2["v"].isna().tolist() == [True]


def test_value_column_collision_raises():
    facts = _ds({"fid": [1], "ent": ["a"], "t": [1]})
    h = _ds({"e": ["a"], "ht": [1], "fid": [9]})
    with pytest.raises(ValueError, match="collide"):
        point_in_time_enrich(facts, "ent", "t",
                             [FeatureSpec(h, "e", "ht", ["fid"])])
