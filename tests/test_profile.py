"""One-pass column profiler (stages/profile.py) vs pandas ground truth
on a mixed-type table with nulls, plus HLL accuracy and low-cardinality
top-k exactness on real testdata."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.profile import profile_columns


def test_profile_mixed_types_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    n = 1000
    ints = rng.integers(0, 50, n).astype(object)
    ints[rng.random(n) < 0.1] = None
    floats = rng.normal(10, 3, n)
    floats[rng.random(n) < 0.05] = np.nan
    cats = np.array([f"cat{i % 7}" for i in range(n)], dtype=object)
    ts = pd.Timestamp("2020-01-01") + pd.to_timedelta(
        rng.integers(0, 86400, n), unit="s")
    tbl = pa.table({
        "i": pa.array([None if v is None else int(v) for v in ints],
                      pa.int64()),
        "f": pa.array(floats, pa.float64()),
        "s": pa.array(cats),
        "t": pa.array(ts.astype("datetime64[us]")),
        "lst": pa.array([[1, 2]] * n, pa.list_(pa.int64())),
    })
    prof = profile_columns(rd.from_arrow(tbl).repartition(6)) \
        .to_pandas().set_index("column")
    pdf = tbl.to_pandas()

    assert (prof["n"] == n).all()
    assert prof.loc["i", "nulls"] == pdf["i"].isna().sum()
    assert prof.loc["f", "nulls"] == int(np.isnan(floats).sum())
    assert prof.loc["s", "nulls"] == 0
    # numeric stats
    assert prof.loc["i", "min"] == str(int(pdf["i"].min()))
    assert prof.loc["i", "max"] == str(int(pdf["i"].max()))
    assert abs(prof.loc["f", "mean"] - np.nanmean(floats)) < 1e-9
    assert abs(prof.loc["f", "std"] - np.nanstd(floats)) < 1e-9
    # lexicographic string bounds
    assert prof.loc["s", "min"] == "cat0" and prof.loc["s", "max"] == "cat6"
    # timestamp bounds format back to microsecond datetimes
    assert prof.loc["t", "min"] == str(np.datetime64(
        pdf["t"].min().to_datetime64(), "us"))
    # HLL distinct estimates within 5% on known cardinalities
    assert abs(prof.loc["s", "n_distinct_est"] - 7) < 0.4
    true_i = pdf["i"].nunique()
    assert abs(prof.loc["i", "n_distinct_est"] - true_i) / true_i < 0.05
    # low-cardinality top-k counts are exact
    vc = pdf["s"].value_counts()
    assert prof.loc["s", "top_values"][0] == vc.index[0]
    assert list(prof.loc["s", "top_counts"]) == vc.head(5).tolist()
    # nested column: counts only
    assert prof.loc["lst", "min"] is None
    assert np.isnan(prof.loc["lst", "mean"])


def test_profile_real_events(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    prof = profile_columns(ds).to_pandas().set_index("column")
    assert prof.loc["event_type", "n_distinct_est"] == \
        pytest_approx_distinct(5)
    assert prof.loc["event_id", "nulls"] == 0
    assert set(prof.loc["event_type", "top_values"]) <= {
        "click", "error", "purchase", "signup", "view"}


def pytest_approx_distinct(k):
    import pytest
    return pytest.approx(k, rel=0.05)


def test_global_quantiles_and_qcut(ray_session):
    import duckdb
    from feature_extraction_ray.stages.groupstats import (
        global_quantiles_disc, quantile_bucket)
    rng = np.random.default_rng(2)
    vals = rng.normal(50, 20, 3000)
    miss = np.zeros(3000, dtype=bool)
    miss[rng.integers(0, 3000, 40)] = True
    # Arrow NULLS, not NaN values: DuckDB quantile_disc IGNORES null but
    # sorts NaN as the largest value — the engine's clean() drops both,
    # so parity tests must plant real nulls
    tbl = pa.table({"rid": pa.array(range(3000), pa.int64()),
                    "v": pa.array(vals, pa.float64(), mask=miss)})
    ds = rd.from_arrow(tbl).repartition(7)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    thr = global_quantiles_disc(ds, "v", qs)
    exp = duckdb.connect().execute(
        "SELECT " + ", ".join(f"quantile_disc(v, {q})" for q in qs)
        + " FROM tbl").fetchone()
    assert thr.tolist() == list(exp)         # bit-exact data values
    out = quantile_bucket(ds, "v", n_buckets=4).to_pandas() \
        .sort_values("rid")
    ok = out[out["v"].notna()]
    # equal-frequency quartiles within one of exact split + null pass
    counts = ok["v_qbucket"].value_counts()
    n = len(ok)
    assert set(counts.index) == {0, 1, 2, 3}
    assert all(abs(c - n / 4) <= 1 for c in counts)
    assert out[out["v"].isna()]["v_qbucket"].isna().all()


def test_quantile_boundaries_and_constant_column(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        global_quantiles_disc, quantile_bucket)
    vals = np.arange(1, 101, dtype=np.float64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)
    # quantile_disc index max(1, ceil(q*n)): q→first / median / last
    thr = global_quantiles_disc(ds, "v", [0.001, 0.5, 1.0])
    assert thr.tolist() == [1.0, 50.0, 100.0]
    # constant column: every row lands in ONE bucket (ties are
    # value-based; both engines yield #thresholds <= v = n_buckets-1)
    cds = rd.from_arrow(pa.table({"v": pa.array(np.full(50, 7.0))}))
    out = quantile_bucket(cds, "v", n_buckets=4).to_pandas()
    assert out["v_qbucket"].unique().tolist() == [3]
