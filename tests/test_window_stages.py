"""Dataset-level windowed operator tests vs pandas oracles on the F1 fixture."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages import window as SW


@pytest.fixture(scope="module")
def tok_tbl():
    return FX.gen_tokens(n_rows=400, n_entities=6, seed=11)


def _pdf(tbl):
    return tbl.to_pandas()


def test_shift_lag_tokens_and_floats(tok_tbl):
    ds = rd.from_arrow(tok_tbl)
    out = SW.shift(ds, "entity", ["ts", "doc_id"], ["n_tok", "tokens"],
                   periods=1, num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "ts", "doc_id"],
                                      kind="stable").reset_index(drop=True)
    exp = _pdf(tok_tbl).sort_values(["entity", "ts", "doc_id"],
                                    kind="stable").reset_index(drop=True)
    g = exp.groupby("entity")
    exp["n_tok_lag1"] = g["n_tok"].shift(1)
    np.testing.assert_allclose(got["n_tok_lag1"].to_numpy(dtype=float),
                               exp["n_tok_lag1"].to_numpy(dtype=float),
                               equal_nan=True)
    # token-array equality: shifted lists must match exactly (north rule)
    exp_tok = g["tokens"].shift(1)
    for a, b in zip(got["tokens_lag1"], exp_tok):
        if b is None or (isinstance(b, float) and np.isnan(b)):
            assert a is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sessionize_dataset(tok_tbl):
    import datetime
    ds = rd.from_arrow(tok_tbl)
    gap = datetime.timedelta(hours=1)
    out = SW.sessionize(ds, "entity", "ts", gap,
                        order_cols=["doc_id"], num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "ts", "doc_id"],
                                      kind="stable").reset_index(drop=True)
    exp = _pdf(tok_tbl).sort_values(["entity", "ts", "doc_id"],
                                    kind="stable").reset_index(drop=True)

    def naive(g):
        brk = (g["ts"].diff() > gap).fillna(False)
        return brk.cumsum()

    sid = (exp.groupby("entity", group_keys=False)[["ts"]]
           .apply(lambda g: (g["ts"].diff() > gap).fillna(False).cumsum()))
    np.testing.assert_array_equal(got["session_id"].to_numpy(),
                                  sid.to_numpy())
    assert got["session_id"].max() >= 1  # fixture guarantees >1 session


def test_sliding_mean_dataset(tok_tbl):
    ds = rd.from_arrow(tok_tbl)
    out = SW.sliding_agg(ds, "entity", ["ts", "doc_id"], "n_tok", 5,
                         aggs=("mean", "sum", "count"), num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "ts", "doc_id"],
                                      kind="stable").reset_index(drop=True)
    exp = _pdf(tok_tbl).sort_values(["entity", "ts", "doc_id"],
                                    kind="stable").reset_index(drop=True)
    r = exp.groupby("entity")["n_tok"].rolling(5, min_periods=1)
    exp_mean = r.mean().reset_index(level=0, drop=True).sort_index()
    np.testing.assert_allclose(got["n_tok_w5_mean"], exp_mean, atol=1e-9)


def test_fill_dataset(tok_tbl):
    # inject nulls into a float column, then ffill/bfill
    pdf = _pdf(tok_tbl)
    rng = np.random.default_rng(3)
    v = rng.normal(size=len(pdf))
    v[rng.random(len(pdf)) < 0.4] = np.nan
    pdf["val"] = v
    ds = rd.from_pandas(pdf)
    out = SW.fill(ds, "entity", ["ts", "doc_id"], ["val"], method="ffill",
                  num_buckets=4)
    out = SW.fill(out, "entity", ["ts", "doc_id"], ["val"], method="bfill",
                  num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "ts", "doc_id"],
                                      kind="stable").reset_index(drop=True)
    exp = pdf.sort_values(["entity", "ts", "doc_id"],
                          kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(got["val_ffill"],
                               exp.groupby("entity")["val"].ffill(),
                               equal_nan=True)
    np.testing.assert_allclose(got["val_bfill"],
                               exp.groupby("entity")["val"].bfill(),
                               equal_nan=True)


def test_cumulative_and_row_number(tok_tbl):
    pdf = _pdf(tok_tbl)
    ds = rd.from_pandas(pdf)
    out = SW.cumulative(ds, "entity", ["ts", "doc_id"], ["n_tok"],
                        agg="sum", num_buckets=4)
    out = SW.cumulative(out, "entity", ["ts", "doc_id"], ["n_tok"],
                        agg="max", num_buckets=4)
    out = SW.row_number(out, "entity", ["ts", "doc_id"], num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "ts", "doc_id"],
                                      kind="stable").reset_index(drop=True)
    exp = pdf.sort_values(["entity", "ts", "doc_id"],
                          kind="stable").reset_index(drop=True)
    g = exp.groupby("entity")["n_tok"]
    np.testing.assert_array_equal(got["n_tok_cumsum"], g.cumsum())
    np.testing.assert_array_equal(got["n_tok_cummax"], g.cummax())
    np.testing.assert_array_equal(got["row_num"],
                                  exp.groupby("entity").cumcount() + 1)


def test_rank_features_vs_pandas():
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame({
        "entity": rng.integers(0, 7, n).astype(str),
        "v": rng.integers(0, 5, n),          # heavy ties
        "rid": np.arange(n),
    })
    ds = rd.from_pandas(pdf)
    out = SW.rank_features(ds, "entity", ["v", "rid"], tie_cols=["v"],
                           ntile=4, num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "v", "rid"],
                                      kind="stable").reset_index(drop=True)
    exp = pdf.sort_values(["entity", "v", "rid"],
                          kind="stable").reset_index(drop=True)
    g = exp.groupby("entity")["v"]
    rnk = g.rank(method="min").astype(int)
    drnk = g.rank(method="dense").astype(int)
    sizes = exp.groupby("entity")["v"].transform("size")
    prnk = np.where(sizes > 1, (rnk - 1) / (sizes - 1), 0.0)
    cdist = g.rank(method="max") / sizes
    np.testing.assert_array_equal(got["rnk"], rnk)
    np.testing.assert_array_equal(got["drnk"], drnk)
    np.testing.assert_allclose(got["prnk"], prnk)
    np.testing.assert_allclose(got["cdist"], cdist)
    # NTILE: first (n % k) tiles get the extra row, split in row order
    pos = exp.groupby("entity").cumcount().to_numpy()
    sz = sizes.to_numpy()
    q, r = sz // 4, sz % 4
    cut = r * (q + 1)
    tile = np.where(pos < cut, pos // np.maximum(q + 1, 1),
                    r + (pos - cut) // np.maximum(q, 1)) + 1
    np.testing.assert_array_equal(got["tile4"], tile)


def test_rank_features_null_ties_and_tiny_partitions():
    # nulls compare EQUAL for tie grouping; singleton partition has
    # percent_rank 0.0; partition smaller than ntile gets tile=pos+1
    pdf = pd.DataFrame({
        "entity": ["a"] * 4 + ["b"],
        "v": [None, None, 1.0, 1.0, 9.0],
        "rid": [0, 1, 2, 3, 4],
    })
    ds = rd.from_pandas(pdf)
    out = SW.rank_features(ds, "entity", ["v", "rid"], tie_cols=["v"],
                           ntile=3, num_buckets=2)
    got = out.to_pandas().sort_values("rid").reset_index(drop=True)
    # sort places nulls last: order within 'a' is rid 2,3 (v=1) then 0,1
    assert got["rnk"].tolist() == [3, 3, 1, 1, 1]
    assert got["drnk"].tolist() == [2, 2, 1, 1, 1]
    assert got["prnk"].tolist() == [2 / 3, 2 / 3, 0.0, 0.0, 0.0]
    assert got["cdist"].tolist() == [1.0, 1.0, 0.5, 0.5, 1.0]
    assert got["tile3"].tolist() == [2, 3, 1, 1, 1]


def test_grouped_topk(tok_tbl):
    pdf = _pdf(tok_tbl)
    ds = rd.from_pandas(pdf)
    out = SW.grouped_topk(ds, "entity",
                          [("n_tok", "descending"), ("doc_id", "ascending")],
                          k=3, num_buckets=4)
    got = out.to_pandas().sort_values(["entity", "n_tok", "doc_id"],
                                      ascending=[True, False, True],
                                      kind="stable").reset_index(drop=True)
    exp = (pdf.sort_values(["entity", "n_tok", "doc_id"],
                           ascending=[True, False, True], kind="stable")
           .groupby("entity", group_keys=False).head(3)
           .reset_index(drop=True))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
