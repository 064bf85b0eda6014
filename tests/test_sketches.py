"""HLL sketch: accuracy vs exact distinct, mergeability, determinism."""
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.partition import _stable_hash_strings
from feature_extraction_ray.stages.sketches import HyperLogLog, approx_distinct


@pytest.mark.parametrize("true_n", [100, 5000, 50000])
def test_hll_accuracy(true_n):
    vals = pa.array([f"item{i}" for i in range(true_n)])
    h = _stable_hash_strings(vals)
    hll = HyperLogLog(p=12)
    hll.add_hashes(h)
    est = hll.estimate()
    assert abs(est - true_n) / true_n < 0.06, (true_n, est)


def test_hll_merge_equals_union():
    a_vals = pa.array([f"a{i}" for i in range(3000)])
    b_vals = pa.array([f"a{i}" for i in range(1500, 4500)])  # overlap
    ha, hb = HyperLogLog(12), HyperLogLog(12)
    ha.add_hashes(_stable_hash_strings(a_vals))
    hb.add_hashes(_stable_hash_strings(b_vals))
    merged = ha.merge(hb)
    both = HyperLogLog(12)
    both.add_hashes(_stable_hash_strings(pa.concat_arrays(
        [a_vals, b_vals])))
    np.testing.assert_array_equal(merged.registers, both.registers)
    assert abs(merged.estimate() - 4500) / 4500 < 0.06


def test_approx_distinct_dataset():
    n = 20000
    df = pd.DataFrame({"k": [f"key{i % 7000}" for i in range(n)]})
    ds = rd.from_pandas(df)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 7000) / 7000 < 0.06
    # deterministic across runs
    assert approx_distinct(rd.from_pandas(df), "k", p=12) == est


def test_approx_quantiles_accuracy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.sketches import approx_quantiles
    rng = np.random.default_rng(5)
    v = rng.normal(size=20000) * 10 + 3
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(8)
    est = approx_quantiles(ds, "value", [0.1, 0.5, 0.9])
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(v, q)
        # rank error bound: compare by achieved rank, not value
        achieved = (v <= est[q]).mean()
        assert abs(achieved - q) < 0.02, (q, est[q], exact)


def test_heavy_hitters_exact_when_k_covers_distinct():
    from feature_extraction_ray.stages.sketches import heavy_hitters
    rng = np.random.default_rng(5)
    vals = rng.choice([f"t{i}" for i in range(12)], 5000,
                      p=np.r_[0.4, np.full(11, 0.6 / 11)])
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    df, err = heavy_hitters(ds, "v", k=64)
    assert err == 0
    exp = pd.Series(vals).value_counts()
    assert dict(zip(df["value"], df["count"])) == exp.to_dict()


def test_heavy_hitters_null_group_is_exact():
    from feature_extraction_ray.stages.sketches import heavy_hitters
    vals = ["a"] * 5 + [None] * 3 + ["b"] * 2
    ds = rd.from_arrow(pa.table(
        {"v": pa.array(vals, type=pa.string())})).repartition(3)
    df, err = heavy_hitters(ds, "v", k=4)
    assert err == 0
    got = {(v if v is not None and v == v else None): c
           for v, c in zip(df["value"], df["count"])}
    assert got == {"a": 5, None: 3, "b": 2}


def test_heavy_hitters_guarantee_small_k():
    from feature_extraction_ray.stages.sketches import heavy_hitters
    rng = np.random.default_rng(9)
    # zipf-ish: a few heavy values among many light ones
    heavy = rng.choice(["a", "b", "c"], 3000, p=[0.5, 0.3, 0.2])
    light = np.array([f"x{i}" for i in rng.integers(0, 500, 2000)])
    vals = np.r_[heavy, light]
    rng.shuffle(vals)
    n, k = len(vals), 8
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
    df, err = heavy_hitters(ds, "v", k=k)
    true = pd.Series(vals).value_counts()
    got = dict(zip(df["value"], df["count"]))
    assert len(df) <= k and err > 0
    for v, c in true.items():
        if c > n / (k + 1):                 # MG guarantee: must appear
            assert v in got, v
    for v, c in got.items():                # underestimate, bounded err
        assert c <= true[v] <= c + err


def test_grouped_approx_distinct_accuracy_and_merge(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.sketches import (
        grouped_approx_distinct)
    rng = np.random.default_rng(0)
    # three groups with known distinct cardinalities 50 / 700 / 5000
    groups, vals = [], []
    for g, k, n in (("a", 50, 2000), ("b", 700, 3000), ("c", 5000, 8000)):
        groups += [g] * n
        vals += [f"{g}-v{i}" for i in rng.integers(0, k, n)]
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals)})
    truth = {g: len({v for gg, v in zip(groups, vals) if gg == g})
             for g in "abc"}
    out = grouped_approx_distinct(
        rd.from_arrow(t).repartition(9), "g", "v",
        p=10, num_buckets=4).to_pandas().set_index("g")
    for g in "abc":
        est = out.loc[g, "n_distinct_est"]
        assert abs(est - truth[g]) / truth[g] < 0.12, (g, est, truth[g])
    # block-layout invariance: registers max-merge, so a different
    # partitioning gives the IDENTICAL estimate
    out2 = grouped_approx_distinct(
        rd.from_arrow(t).repartition(2), "g", "v",
        p=10, num_buckets=4).to_pandas().set_index("g")
    assert np.allclose(out.loc[list("abc"), "n_distinct_est"],
                       out2.loc[list("abc"), "n_distinct_est"])



def test_target_encode_m_hand_computed():
    import ray.data as rd

    from feature_extraction_ray.stages.groupstats import target_encode_m_estimate
    # key a: values 2, 4, 6 (sum 12); key b: value 10 (singleton)
    tbl = pa.table({
        "rid": pa.array([0, 1, 2, 3], type=pa.int64()),
        "k": pa.array(["a", "a", "a", "b"]),
        "v": pa.array([2.0, 4.0, 6.0, 10.0])})
    # m=0: LOO mean; singleton → 0/0 → null
    out = target_encode_m_estimate(rd.from_arrow(tbl), "k", "v", m=0.0,
                            num_buckets=4).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    assert out["te"].tolist()[:3] == [5.0, 4.0, 3.0]
    assert np.isnan(out.loc[3, "te"])
    # m=2: prior = 22/4 = 5.5 → a-row0: (10 + 11)/(2+2) = 5.25;
    # singleton b: (0 + 11)/(0+2) = 5.5
    out2 = target_encode_m_estimate(rd.from_arrow(tbl), "k", "v", m=2.0,
                             num_buckets=4).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    assert out2["te"].tolist() == [5.25, (8 + 11) / 4, (6 + 11) / 4, 5.5]


def test_target_encode_m_estimate_rejects_fractional_target():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.groupstats import target_encode_m_estimate
    tbl = pa.table({"k": ["a", "a"], "v": [1.5, 2.0]})
    with pytest.raises(Exception):
        target_encode_m_estimate(rd.from_arrow(tbl), "k", "v") \
            .materialize()


def test_fuzz_target_encode_m_vs_naive():
    """Random integer targets over random keys through
    target_encode_m_estimate at m=0 and m=3.5, compared strictly against the
    identical-expression numpy reference."""
    import ray.data as rd

    from feature_extraction_ray.stages.groupstats import target_encode_m_estimate
    rng = np.random.default_rng(913)
    n = 600
    keys = np.array(["k%d" % i for i in rng.integers(0, 50, n)])
    vals = rng.integers(-5, 100, n).astype(np.float64)
    tbl = pa.table({"rid": pa.array(np.arange(n, dtype=np.int64)),
                    "k": pa.array(keys), "v": pa.array(vals)})
    sums = {}
    for k, v in zip(keys, vals):
        s, c = sums.get(k, (0, 0))
        sums[k] = (s + int(v), c + 1)
    prior = float(sum(s for s, _ in sums.values())) \
        / float(sum(c for _, c in sums.values()))
    for m in (0.0, 3.5):
        out = target_encode_m_estimate(rd.from_arrow(tbl), "k", "v", m=m,
                                num_buckets=4).to_pandas() \
            .sort_values("rid").reset_index(drop=True)
        v64 = out["v"].to_numpy().astype(np.int64)
        s = np.array([sums[k][0] for k in out["k"]], dtype=np.int64)
        c = np.array([sums[k][1] for k in out["k"]], dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            exp = ((s - v64).astype(np.float64) + m * prior) \
                / ((c - 1).astype(np.float64) + m)
        got = out["te"].to_numpy()
        same = (got == exp) | (np.isnan(got) & np.isnan(exp))
        assert same.all()


def test_calibration_bins_hand_computed():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.sketches import calibration_bins
    # range [0, 10), 5 bins of width 2
    tbl = pa.table({
        "s": pa.array([0, 1, 2, 9, 9, 5], type=pa.int64()),
        "lab": pa.array([1, 0, 1, 1, 1, 0], type=pa.int64())})
    out = calibration_bins(rd.from_arrow(tbl), "s", "lab",
                           n_bins=5, lo=0, hi=10).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert out["bin"].tolist() == [0, 1, 2, 4]    # empty bin 3 absent
    assert out["n"].tolist() == [2, 1, 1, 2]
    assert out["sum_label"].tolist() == [1, 1, 0, 2]
    assert out["sum_score"].tolist() == [1, 2, 5, 18]
    assert out["mean_label"].tolist() == [0.5, 1.0, 0.0, 1.0]
    assert out["mean_score"].tolist() == [0.5, 2.0, 5.0, 9.0]
    # out-of-range clips into the edge bins
    t2 = pa.table({"s": pa.array([-7, 99], type=pa.int64()),
                   "lab": pa.array([1, 0], type=pa.int64())})
    o2 = calibration_bins(rd.from_arrow(t2), "s", "lab",
                          n_bins=5, lo=0, hi=10).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert o2["bin"].tolist() == [0, 4]
    with pytest.raises(ValueError):
        calibration_bins(rd.from_arrow(tbl), "s", "lab",
                         n_bins=0, lo=0, hi=10)
