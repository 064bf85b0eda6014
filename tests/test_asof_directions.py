"""As-of join directions (forward/nearest), tolerance, and exact-match
exclusion vs pandas merge_asof oracles."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages.asof import asof_join


@pytest.fixture(scope="module")
def sides():
    left = FX.gen_tokens(n_rows=300, n_entities=5, seed=51)
    right = FX.gen_feature_updates(left, seed=52)
    return left, right


def _oracle(left, right, **kw):
    lf = left.to_pandas().sort_values("ts", kind="stable")
    rf = (right.to_pandas().sort_values(["ts", "attr_val"], kind="stable"))
    out = pd.merge_asof(lf, rf[["entity", "ts", "attr_val"]],
                        on="ts", by="entity", **kw)
    return out.sort_values(["entity", "ts", "doc_id"],
                           kind="stable").reset_index(drop=True)


def _run(left, right, broadcast, **kw):
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_by="entity", right_by="entity",
                    left_on="ts", right_on="ts",
                    right_value_cols=["attr_val"],
                    right_order_cols=["attr_val"],
                    broadcast=broadcast, num_buckets=4, **kw)
    return out.to_pandas().sort_values(
        ["entity", "ts", "doc_id"], kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("broadcast", [True, False])
@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_directions(sides, broadcast, direction):
    left, right = sides
    got = _run(left, right, broadcast, direction=direction)
    exp = _oracle(left, right, direction=direction)
    np.testing.assert_allclose(got["attr_val"].to_numpy(dtype=float),
                               exp["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)


@pytest.mark.parametrize("broadcast", [True, False])
def test_tolerance_and_no_exact(sides, broadcast):
    left, right = sides
    tol = pd.Timedelta(minutes=10)
    got = _run(left, right, broadcast, tolerance=tol)
    exp = _oracle(left, right, direction="backward", tolerance=tol)
    np.testing.assert_allclose(got["attr_val"].to_numpy(dtype=float),
                               exp["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)
    got2 = _run(left, right, broadcast, allow_exact_matches=False)
    exp2 = _oracle(left, right, direction="backward",
                   allow_exact_matches=False)
    np.testing.assert_allclose(got2["attr_val"].to_numpy(dtype=float),
                               exp2["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)
