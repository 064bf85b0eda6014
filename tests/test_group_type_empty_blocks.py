"""Regression: empty-block partial tables must derive the group/entity
column type from the INPUT schema, not hardcode string — with an int64
group key and any empty block, block schemas otherwise diverge and the
downstream groupby/concat fails or miscasts (round-4 advice)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.partition import group_field_type


def _int_group_ds(n_rows=40, n_groups=4):
    """Dataset with an int64 group column and a guaranteed-empty block."""
    t = pa.table({
        "g": pa.array((np.arange(n_rows) % n_groups).astype(np.int64)),
        "v": pa.array((np.arange(n_rows) % 7).astype(np.int64)),
        "x": pa.array((np.arange(n_rows) % 5).astype(np.int64)),
        "arm": pa.array((np.arange(n_rows) % 2).astype(np.int64)),
        "id": pa.array(np.arange(n_rows).astype(np.int64)),
    })
    empty = t.slice(0, 0)
    return rd.from_arrow([t.slice(0, 20), empty, t.slice(20)])


def test_group_field_type_helper():
    t = pa.table({"g": pa.array([], pa.int64())})
    assert group_field_type(t, "g") == pa.int64()
    assert group_field_type(t, "missing") == pa.string()


def test_poisson_bootstrap_int_group_with_empty_block(ray_session):
    from feature_extraction_ray.stages.groupstats import poisson_bootstrap
    out = poisson_bootstrap(_int_group_ds(), "g", "v", "id",
                            n_boot=4).to_pandas()
    assert len(out) == 16
    assert out["g"].dtype.kind == "i"


def test_ks_test_int_group_with_empty_block(ray_session):
    from feature_extraction_ray.stages.groupstats import ks_test_by_group
    out = ks_test_by_group(_int_group_ds(), "g", "v", "arm",
                           num_buckets=4).to_pandas()
    assert len(out) == 4
    assert out["g"].dtype.kind == "i"


def test_theil_sen_int_group_with_empty_block(ray_session):
    from feature_extraction_ray.stages.groupstats import theil_sen_by_group
    out = theil_sen_by_group(_int_group_ds(), "g", "x", "v",
                             "id").to_pandas()
    assert len(out) == 4
    assert out["g"].dtype.kind == "i"


def test_kmv_sketch_int_group_with_empty_block(ray_session):
    from feature_extraction_ray.stages.sketches import kmv_sketch
    out = kmv_sketch(_int_group_ds(), "g", "id", k=8,
                     num_buckets=4).to_pandas()
    assert len(out) > 0
    assert out["g"].dtype.kind == "i"


def test_trimmed_mean_int_group_with_empty_block(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        trimmed_mean_by_group)
    out = trimmed_mean_by_group(_int_group_ds(), "g", "v", "id",
                                trim=0.1).to_pandas()
    assert len(out) == 4
    assert out["g"].dtype.kind == "i"
