"""Streaming (chained-task) windowed ops must equal the bucketed
(whole-group) implementations on the same input — including with tiny
max_rows_per_block forcing many chained slices per bucket."""
import datetime

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages import window as SW
from feature_extraction_ray.stages.stream_window import streaming_window


@pytest.fixture(scope="module")
def toks():
    return FX.gen_tokens(n_rows=500, n_entities=6, seed=71)


def _sorted(df):
    return df.sort_values(["entity", "ts", "doc_id"],
                          kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("max_rows", [17, 100000])
def test_streaming_lag_matches_bucketed(toks, max_rows):
    ds = rd.from_arrow(toks)
    got = streaming_window(ds, "lag1", entity_col="entity",
                           order_cols=["ts", "doc_id"], num_buckets=4,
                           max_rows_per_block=max_rows,
                           value_col="n_tok", out_col="n_tok_lag1")
    exp = SW.shift(rd.from_arrow(toks), "entity", ["ts", "doc_id"],
                   ["n_tok"], periods=1, num_buckets=4)
    g = _sorted(got.to_pandas())
    e = _sorted(exp.to_pandas())
    np.testing.assert_allclose(g["n_tok_lag1"].to_numpy(dtype=float),
                               e["n_tok_lag1"].to_numpy(dtype=float),
                               equal_nan=True)


@pytest.mark.parametrize("max_rows", [13, 100000])
def test_streaming_ffill_matches_bucketed(toks, max_rows):
    pdf = toks.to_pandas()
    rng = np.random.default_rng(5)
    v = rng.normal(size=len(pdf))
    v[rng.random(len(pdf)) < 0.55] = np.nan     # long null runs
    pdf["val"] = v
    import pyarrow as pa
    tbl = toks.append_column("val", pa.array(v, from_pandas=True))
    got = streaming_window(rd.from_arrow(tbl), "ffill",
                           entity_col="entity",
                           order_cols=["ts", "doc_id"], num_buckets=4,
                           max_rows_per_block=max_rows,
                           value_col="val", out_col="val_ffill")
    exp = SW.fill(rd.from_arrow(tbl), "entity", ["ts", "doc_id"],
                  ["val"], method="ffill", num_buckets=4)
    g = _sorted(got.to_pandas())
    e = _sorted(exp.to_pandas())
    np.testing.assert_allclose(g["val_ffill"].to_numpy(dtype=float),
                               e["val_ffill"].to_numpy(dtype=float),
                               equal_nan=True)


@pytest.mark.parametrize("max_rows", [11, 100000])
def test_streaming_sessionize_matches_bucketed(toks, max_rows):
    ds = rd.from_arrow(toks)
    got = streaming_window(ds, "sessionize", entity_col="entity",
                           order_cols=["ts", "doc_id"], num_buckets=4,
                           max_rows_per_block=max_rows,
                           ts_col="ts", gap_us=3_600_000_000,
                           out_col="session_id")
    exp = SW.sessionize(rd.from_arrow(toks), "entity", "ts",
                        datetime.timedelta(hours=1),
                        order_cols=["doc_id"], num_buckets=4)
    g = _sorted(got.to_pandas())
    e = _sorted(exp.to_pandas())
    np.testing.assert_array_equal(g["session_id"].to_numpy(),
                                  e["session_id"].to_numpy())


@pytest.mark.parametrize("max_rows", [13, 100000])
def test_streaming_bfill_matches_bucketed(toks, max_rows):
    import pyarrow as pa
    rng = np.random.default_rng(8)
    v = rng.normal(size=len(toks))
    v[rng.random(len(toks)) < 0.55] = np.nan
    tbl = toks.append_column("val", pa.array(v, from_pandas=True))
    got = streaming_window(rd.from_arrow(tbl), "bfill",
                           entity_col="entity",
                           order_cols=["ts", "doc_id"], num_buckets=4,
                           max_rows_per_block=max_rows,
                           value_col="val", out_col="val_bfill")
    exp = SW.fill(rd.from_arrow(tbl), "entity", ["ts", "doc_id"],
                  ["val"], method="bfill", num_buckets=4)
    g = _sorted(got.to_pandas())
    e = _sorted(exp.to_pandas())
    np.testing.assert_allclose(g["val_bfill"].to_numpy(dtype=float),
                               e["val_bfill"].to_numpy(dtype=float),
                               equal_nan=True)


@pytest.mark.parametrize("max_rows", [11, 100000])
def test_streaming_cumsum_matches_bucketed(toks, max_rows):
    import pyarrow as pa
    # inject NaNs to exercise skip-NaN semantics across slice boundaries
    tbl = toks
    vals = tbl["n_tok"].to_numpy(zero_copy_only=False).astype(np.float64)
    vals[::37] = np.nan
    tbl = tbl.set_column(tbl.column_names.index("n_tok"),
                         pa.field("n_tok", pa.float64()),
                         pa.array(vals, from_pandas=True))
    got = streaming_window(rd.from_arrow(tbl), "cumsum",
                           entity_col="entity",
                           order_cols=["ts", "doc_id"], num_buckets=4,
                           max_rows_per_block=max_rows,
                           value_col="n_tok", out_col="n_tok_cumsum")
    exp = SW.cumulative(rd.from_arrow(tbl), "entity", ["ts", "doc_id"],
                        ["n_tok"], agg="sum", num_buckets=4)
    g = _sorted(got.to_pandas())
    e = _sorted(exp.to_pandas())
    np.testing.assert_allclose(g["n_tok_cumsum"].to_numpy(dtype=float),
                               e["n_tok_cumsum"].to_numpy(dtype=float),
                               rtol=1e-12, atol=1e-9, equal_nan=True)
