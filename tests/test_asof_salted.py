"""Salted as-of merge: identical results to the unsalted plan on a skewed
corpus, with the hot entity's rows actually spread across shards."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages.asof import asof_join, asof_prepare


@pytest.fixture(scope="module")
def skewed_sides():
    # F1 fixture: source column is Zipf-skewed (~50% in one source)
    left = FX.gen_tokens(n_rows=500, n_entities=4, seed=61)
    right = FX.gen_feature_updates(left, seed=62)
    # re-key updates by source for a source-keyed join
    lf = left.to_pandas()
    hot = lf["source"].value_counts().idxmax()
    return left, right, hot


def _sorted(df):
    return df.sort_values(["entity", "ts", "doc_id"],
                          kind="stable").reset_index(drop=True)


def test_salted_equals_unsalted(skewed_sides):
    left, right, _ = skewed_sides
    hotent = left.to_pandas()["entity"].value_counts().idxmax()
    base = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_by="entity", right_by="entity",
                     left_on="ts", right_on="ts",
                     right_value_cols=["attr_val"],
                     right_order_cols=["attr_val"],
                     num_buckets=4).to_pandas()
    salted = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                       left_by="entity", right_by="entity",
                       left_on="ts", right_on="ts",
                       right_value_cols=["attr_val"],
                       right_order_cols=["attr_val"],
                       num_buckets=4,
                       salt_hot={hotent: 4}).to_pandas()
    b, s = _sorted(base), _sorted(salted)
    assert len(b) == len(s)
    np.testing.assert_allclose(s["attr_val"].to_numpy(dtype=float),
                               b["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)


def test_salt_actually_spreads_hot_entity(skewed_sides):
    left, right, _ = skewed_sides
    hotent = left.to_pandas()["entity"].value_counts().idxmax()
    unioned, _, ent_col = asof_prepare(
        rd.from_arrow(left), rd.from_arrow(right),
        left_by="entity", right_by="entity", left_on="ts", right_on="ts",
        right_value_cols=["attr_val"], salt_hot={hotent: 4})
    ents = unioned.select_columns([ent_col]).to_pandas()[ent_col]
    shards = sorted(set(e for e in ents if e.startswith(f"{hotent}#")))
    assert len(shards) >= 3          # hot entity split into several shards
    assert not any(e == hotent for e in ents)  # no unsalted hot rows left


def test_salt_with_post_fn_rejected(skewed_sides):
    left, right, _ = skewed_sides
    with pytest.raises(ValueError, match="salt_hot"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right),
                  left_by="entity", right_by="entity",
                  left_on="ts", right_on="ts",
                  right_value_cols=["attr_val"],
                  salt_hot={"e0000": 2}, post_fn=lambda t: t)


def test_autosalt_detects_and_matches(skewed_sides):
    from feature_extraction_ray.stages.asof import asof_join_autosalt
    left, right, _ = skewed_sides
    base = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_by="entity", right_by="entity",
                     left_on="ts", right_on="ts",
                     right_value_cols=["attr_val"],
                     right_order_cols=["attr_val"],
                     num_buckets=4).to_pandas()
    auto = asof_join_autosalt(rd.from_arrow(left), rd.from_arrow(right),
                              left_by="entity", right_by="entity",
                              left_on="ts", right_on="ts",
                              right_value_cols=["attr_val"],
                              right_order_cols=["attr_val"],
                              hot_share=0.2, num_buckets=4).to_pandas()
    b, a = _sorted(base), _sorted(auto)
    np.testing.assert_allclose(a["attr_val"].to_numpy(dtype=float),
                               b["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)
