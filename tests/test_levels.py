"""M11–M13 level derivation + metadata attach tests (group_audio_files
semantics)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages.levels import add_feature_id


@pytest.fixture(scope="module")
def data():
    rec = FX.gen_recognizer(n_calls=6, segs_per_call=4, seed=9)
    meta = FX.gen_metadata(n_calls=6, n_subjects=3, seed=45)
    return rec, meta


def test_level_keys(data):
    rec, meta = data
    ds = rd.from_arrow(rec.select(["audio_file_id", "segment_number"]))
    for level, expect in [
        ("call", lambda m: m["call_id"]),
        ("subject", lambda m: m["subject_id"]),
    ]:
        out = add_feature_id(ds, meta, level=level).to_pandas()
        assert len(out) == 24
        lk = dict(zip(meta["call_id"], expect(meta)))
        assert all(out["feature_id"] == out["audio_file_id"].map(lk))
    day = add_feature_id(ds, meta, level="day").to_pandas()
    # day_id = subject + '_' + YYYY-MM-DD
    assert day["feature_id"].str.match(r"s\d+_\d{4}-\d{2}-\d{2}").all()
    week = add_feature_id(ds, meta, level="week").to_pandas()
    assert week["feature_id"].str.match(r"s\d+_w\d+").all()


def test_call_type_filter_semi_join(data):
    rec, meta = data
    ds = rd.from_arrow(rec.select(["audio_file_id", "segment_number"]))
    t_calls = set(meta[meta["is_assessment"]]["call_id"])
    out = add_feature_id(ds, meta, level="call", call_type="t").to_pandas()
    assert set(out["audio_file_id"]) == t_calls
    out_f = add_feature_id(ds, meta, level="call", call_type="f").to_pandas()
    assert set(out_f["audio_file_id"]) == \
        set(meta["call_id"]) - t_calls
    assert len(out) + len(out_f) == 24
