"""As-of join tests: broadcast vs partitioned plans vs pandas merge_asof
oracle, plus the zero-temporal-leakage property (north rule)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages.asof import asof_join


@pytest.fixture(scope="module")
def sides():
    left = FX.gen_tokens(n_rows=400, n_entities=6, seed=21)
    right = FX.gen_feature_updates(left, seed=22)
    return left, right


def _oracle(left_tbl, right_tbl, direction="backward", tolerance=None):
    lf = left_tbl.to_pandas().sort_values("ts", kind="stable")
    rf = (right_tbl.to_pandas()
          .sort_values(["ts", "attr_val"], kind="stable"))
    out = pd.merge_asof(lf, rf[["entity", "ts", "attr_val"]],
                        on="ts", by="entity", direction=direction,
                        tolerance=tolerance)
    return out.sort_values(["entity", "ts", "doc_id"],
                           kind="stable").reset_index(drop=True)


def _sorted(df):
    return df.sort_values(["entity", "ts", "doc_id"],
                          kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("broadcast", [True, False])
def test_asof_matches_oracle(sides, broadcast):
    left, right = sides
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_by="entity", right_by="entity",
                    left_on="ts", right_on="ts",
                    right_value_cols=["attr_val"],
                    right_order_cols=["attr_val"],
                    broadcast=broadcast, num_buckets=4)
    got = _sorted(out.to_pandas())
    exp = _oracle(left, right)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["attr_val"].to_numpy(dtype=float),
                               exp["attr_val"].to_numpy(dtype=float),
                               equal_nan=True)


@pytest.mark.parametrize("broadcast", [True, False])
def test_asof_token_payload_equality(sides, broadcast):
    """Token-array payloads carried by the join must match the oracle
    bit-exactly (BASELINE per-row invariant)."""
    left, right = sides
    import pyarrow as pa
    rf = right.to_pandas()
    # make (entity, ts) unique so the matched row is unambiguous; take the
    # surviving rows from the Arrow table so tokens stay list<int32>
    rf = rf.drop_duplicates(["entity", "ts"], keep="last")
    rt = right.take(pa.array(rf.index.to_numpy()))
    rds = rd.from_arrow(rt)
    out = asof_join(rd.from_arrow(left), rds,
                    left_by="entity", right_by="entity",
                    left_on="ts", right_on="ts",
                    right_value_cols=["attr_tokens"],
                    broadcast=broadcast, num_buckets=4)
    got = _sorted(out.to_pandas())
    lf = left.to_pandas().sort_values("ts", kind="stable")
    rfs = rf.sort_values("ts", kind="stable")
    exp = pd.merge_asof(lf, rfs[["entity", "ts", "attr_tokens"]],
                        on="ts", by="entity", direction="backward")
    exp = _sorted(exp)
    for a, b in zip(got["attr_tokens"], exp["attr_tokens"]):
        if b is None or (isinstance(b, float) and pd.isna(b)):
            assert a is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_asof_zero_leakage(sides):
    """Truncating all right rows with ts' > t must not change any left
    output row at or before t (FIXTURES.md golden-oracle rule)."""
    left, right = sides
    cutoff = int(np.quantile(
        left["ts"].cast("int64").to_numpy(zero_copy_only=False), 0.5))
    full = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     left_by="entity", right_by="entity",
                     left_on="ts", right_on="ts",
                     right_value_cols=["attr_val"],
                     right_order_cols=["attr_val"],
                     num_buckets=4).to_pandas()
    import pyarrow.compute as pc
    import pyarrow as pa
    rt = right.filter(pc.less_equal(right["ts"].cast(pa.int64()),
                                    pa.scalar(cutoff)))
    trunc = asof_join(rd.from_arrow(left), rd.from_arrow(rt),
                      left_by="entity", right_by="entity",
                      left_on="ts", right_on="ts",
                      right_value_cols=["attr_val"],
                      right_order_cols=["attr_val"],
                      num_buckets=4).to_pandas()
    full = _sorted(full)
    trunc = _sorted(trunc)
    mask = full["ts"].astype("int64") <= cutoff
    np.testing.assert_allclose(
        full.loc[mask, "attr_val"].to_numpy(dtype=float),
        trunc.loc[mask, "attr_val"].to_numpy(dtype=float),
        equal_nan=True)


def test_asof_entity_without_updates_gets_nulls(sides):
    left, right = sides
    # fixture drops the last entity from updates entirely
    missing = sorted(set(left["entity"].to_pylist()))[-1]
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    left_by="entity", right_by="entity",
                    left_on="ts", right_on="ts",
                    right_value_cols=["attr_val"],
                    right_order_cols=["attr_val"],
                    num_buckets=4).to_pandas()
    sub = out[out["entity"] == missing]
    assert len(sub) > 0 and sub["attr_val"].isna().all()
