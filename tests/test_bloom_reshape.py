"""Bloom semi-join, grouped_concat, unpivot, equi-width histogram."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from feature_extraction_ray.stages.bloom import (
    BloomFilter, bloom_semi_join, bucketed_semi_join, build_bloom,
    dimension_bloom, _hash_pair)
from feature_extraction_ray.stages.relational import semi_join, unpivot
from feature_extraction_ray.stages.sketches import equi_width_histogram
from feature_extraction_ray.stages.window import grouped_concat


def _mk(tbl: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(tbl))


# ---------------------------------------------------------------- bloom --

def test_bloom_no_false_negatives_and_low_fpp():
    rng = np.random.default_rng(7)
    members = rng.choice(1_000_000, size=5_000, replace=False)
    ds = _mk({"k": members.astype(np.int64)})
    bloom = build_bloom(ds, "k", fpp=0.01)
    # every member tests positive
    assert bloom.contains(pa.array(members)).all()
    # non-members: observed fpp stays within ~5x of the target
    non = np.setdiff1d(rng.choice(2_000_000, size=30_000), members)[:20_000]
    hits = bloom.contains(pa.array(non + 2_000_000)).mean()
    assert hits < 0.05, hits


def test_bloom_string_keys_and_nulls():
    ds = _mk({"k": pa.array(["a", "b", "c", None])})
    bloom = build_bloom(ds, "k", num_bits=1 << 12, num_hashes=4)
    got = bloom.contains(pa.array(["a", "zz", None, "c"]))
    assert got.tolist() == [True, False, False, True]


def test_dimension_bloom_power_of_two():
    m, k = dimension_bloom(10_000, 0.01)
    assert m & (m - 1) == 0 and 1 <= k <= 16


def test_hash_pair_h2_odd():
    _, h2 = _hash_pair(pa.array([1, 2, 3], type=pa.int64()))
    assert (h2 & np.uint64(1)).all()


def test_bucketed_semi_join_matches_broadcast():
    rng = np.random.default_rng(3)
    left = _mk({"k": rng.integers(0, 50, 400).astype(np.int64),
                "v": rng.normal(size=400)})
    right = _mk({"rk": np.arange(0, 50, 3).astype(np.int64)})
    exp = semi_join(left, right, left_key="k", right_key="rk") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    got = bucketed_semi_join(left, right, left_key="k", right_key="rk",
                             num_buckets=8).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # anti
    expa = semi_join(left, right, left_key="k", right_key="rk",
                     anti=True).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    gota = bucketed_semi_join(left, right, left_key="k", right_key="rk",
                              anti=True, num_buckets=8).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gota, expa)


@pytest.mark.parametrize("exact", ["bucketed", "broadcast"])
def test_bloom_semi_join_exact(exact):
    rng = np.random.default_rng(11)
    left = _mk({"k": rng.integers(0, 1000, 2000).astype(np.int64),
                "p": np.arange(2000, dtype=np.int64)})
    right = _mk({"k2": rng.choice(1000, 120, replace=False)
                .astype(np.int64)})
    exp = semi_join(left, right, left_key="k", right_key="k2") \
        .to_pandas().sort_values("p").reset_index(drop=True)
    got = bloom_semi_join(left, right, left_key="k", right_key="k2",
                          fpp=0.2, exact=exact, num_buckets=8) \
        .to_pandas().sort_values("p").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_bloom_semi_join_none_superset():
    """exact='none' keeps all true matches (no false negatives)."""
    rng = np.random.default_rng(5)
    left = _mk({"k": rng.integers(0, 300, 1000).astype(np.int64)})
    right = _mk({"k2": np.arange(0, 300, 7).astype(np.int64)})
    exp = set(semi_join(left, right, left_key="k", right_key="k2")
              .to_pandas()["k"])
    got = set(bloom_semi_join(left, right, left_key="k", right_key="k2",
                              fpp=0.01, exact="none").to_pandas()["k"])
    assert exp <= got


# -------------------------------------------------------- grouped_concat --

def test_grouped_concat_matches_pandas():
    rng = np.random.default_rng(2)
    n = 500
    df = pd.DataFrame({
        "ent": rng.integers(0, 40, n),
        "ord": rng.permutation(n),
        "val": [f"w{i % 13}" for i in range(n)]})
    ds = _mk({c: pa.array(df[c]) for c in df})
    got = grouped_concat(ds, "ent", ["ord"], "val", sep="|",
                         out_col="seq", num_buckets=4).to_pandas() \
        .sort_values("ent").reset_index(drop=True)
    exp = (df.sort_values(["ent", "ord"])
           .groupby("ent")["val"].agg("|".join)
           .reset_index().rename(columns={"val": "seq"}))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------- unpivot --

def test_unpivot_matches_melt():
    df = pd.DataFrame({"id": [1, 2, 3], "a": [1.0, 2.0, 3.0],
                       "b": [4.0, 5.0, 6.0]})
    ds = _mk({c: pa.array(df[c]) for c in df})
    got = unpivot(ds, ["id"], ["a", "b"], var_name="var",
                  value_name="val").to_pandas() \
        .sort_values(["id", "var"]).reset_index(drop=True)
    exp = df.melt(id_vars="id", value_vars=["a", "b"], var_name="var",
                  value_name="val") \
        .sort_values(["id", "var"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_unpivot_mixed_types_promote_float():
    ds = _mk({"id": pa.array([1]), "i": pa.array([2], type=pa.int64()),
              "f": pa.array([0.5], type=pa.float64())})
    out = unpivot(ds, ["id"], ["i", "f"]).to_pandas()
    assert out["value"].dtype == np.float64
    assert sorted(out["value"]) == [0.5, 2.0]


# -------------------------------------------------------------- histogram --

def test_histogram_matches_bincount():
    rng = np.random.default_rng(4)
    v = rng.uniform(-5, 105, 5000)  # out-of-range values clip
    ds = _mk({"x": pa.array(v)})
    got = equi_width_histogram(ds, "x", 0.0, 100.0, 10).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    b = np.clip(np.floor(v / 10.0), 0, 9).astype(np.int64)
    cnt = np.bincount(b, minlength=10)
    assert got["bin"].tolist() == list(range(10))
    assert got["n"].tolist() == cnt.tolist()
    np.testing.assert_allclose(got["bin_lo"], np.arange(10) * 10.0)


# ------------------------------------------------------------------- ewma --

def test_ewma_matches_pandas_per_row():
    from feature_extraction_ray.stages.window import ewma
    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({
        "ent": rng.integers(0, 7, n),
        "ord": np.arange(n),
        "v": rng.normal(size=n) * 50})
    ds = rd.from_arrow(pa.table({c: pa.array(df[c]) for c in df}))
    for alpha in (0.1, 0.5, 1.0):
        got = ewma(ds, "ent", ["ord"], ["v"], alpha=alpha,
                   num_buckets=4).to_pandas()
        ref = df.sort_values(["ent", "ord"]).copy()
        ref["exp"] = ref.groupby("ent")["v"].transform(
            lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        m = got.merge(ref[["ord", "exp"]], on="ord")
        np.testing.assert_allclose(m["v_ewma"].to_numpy(),
                                   m["exp"].to_numpy(),
                                   rtol=1e-10, atol=1e-10)


# -------------------------------------------------------- stratified split --

def test_stratified_split_exact_fractions():
    from feature_extraction_ray.stages.partition import stratified_split
    rng = np.random.default_rng(1)
    n = 1000
    df = pd.DataFrame({"g": rng.integers(0, 9, n),
                       "id": rng.permutation(n)})
    ds = rd.from_arrow(pa.table({c: pa.array(df[c]) for c in df}))
    got = stratified_split(ds, "g", ["id"], 0.8,
                           num_buckets=4).to_pandas()
    for g, grp in got.groupby("g"):
        nn = len(grp)
        n_train = (grp["split"] == "train").sum()
        assert n_train == int(np.ceil(0.8 * nn))
        # the train rows are exactly the smallest ids of the stratum
        cut = sorted(grp["id"])[: n_train]
        assert sorted(grp.loc[grp["split"] == "train", "id"]) == cut


# ----------------------------------------------------------- group_entropy --

def test_group_entropy_matches_manual():
    from feature_extraction_ray.stages.relational import group_entropy
    rng = np.random.default_rng(6)
    df = pd.DataFrame({"g": rng.integers(0, 12, 800),
                       "lab": rng.choice(list("abcde"), 800)})
    ds = rd.from_arrow(pa.table({c: pa.array(df[c]) for c in df}))
    got = group_entropy(ds, "g", "lab", num_buckets=4).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        p = sub["lab"].value_counts(normalize=True).to_numpy()
        np.testing.assert_allclose(row["entropy"], -(p * np.log(p)).sum(),
                                   rtol=1e-12)
        assert row["n_rows"] == len(sub)


# ------------------------------------------------------------ snapshot_diff --

def test_snapshot_diff_matches_naive():
    from feature_extraction_ray.stages.relational import snapshot_diff
    rng = np.random.default_rng(8)
    old_keys = rng.choice(500, 300, replace=False)
    new_keys = rng.choice(500, 300, replace=False)
    old = pd.DataFrame({"k": old_keys.astype(np.int64),
                        "v": (old_keys % 13).astype(np.int64)})
    new = pd.DataFrame({"k": new_keys.astype(np.int64),
                        "v": (new_keys % 13 + (new_keys % 11 == 0))
                        .astype(np.int64)})
    got = snapshot_diff(
        rd.from_arrow(pa.table({c: pa.array(old[c]) for c in old})),
        rd.from_arrow(pa.table({c: pa.array(new[c]) for c in new})),
        "k", ["v"], num_buckets=4).to_pandas()
    m = old.merge(new, on="k", how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    exp = {}
    for _, r in m.iterrows():
        if r["_merge"] == "left_only":
            exp[r["k"]] = "removed"
        elif r["_merge"] == "right_only":
            exp[r["k"]] = "added"
        elif r["v_o"] != r["v_n"]:
            exp[r["k"]] = "changed"
    assert dict(zip(got["k"], got["change"])) == exp
    assert len(got) == len(exp)


def test_snapshot_diff_null_values_equal():
    from feature_extraction_ray.stages.relational import snapshot_diff
    old = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                    "v": pa.array([None, 5, None], type=pa.int64())})
    new = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                    "v": pa.array([None, None, 7], type=pa.int64())})
    got = snapshot_diff(rd.from_arrow(old), rd.from_arrow(new),
                        "k", ["v"], num_buckets=2).to_pandas()
    # k=1: null == null (unchanged); k=2: 5→null; k=3: null→7
    assert dict(zip(got["k"], got["change"])) == {2: "changed",
                                                  3: "changed"}


# ----------------------------------------------------- bloom-indexed layout

def test_bloom_indexed_point_lookup(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.sources.writers import (
        read_bloom_indexed, write_bloom_indexed)
    n = 4000
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array((np.arange(n) * 7 % 101).astype(np.int64))})
    out = str(tmp_path / "bl")
    man = write_bloom_indexed(rd.from_arrow(tbl).repartition(8), out, "k")
    assert len(man["files"]) == 8
    ds, n_read, n_total = read_bloom_indexed(out, [3, 1999, 3555])
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [3, 1999, 3555]
    assert got["v"].tolist() == [(3*7) % 101, (1999*7) % 101,
                                 (3555*7) % 101]
    # the point of the index: strictly fewer files than a full scan
    assert n_read < n_total == 8
    # absent key: bloom may admit a file or two (fpp), result is empty
    ds2, n2, _ = read_bloom_indexed(out, [10**9])
    assert ds2.count() == 0 and n2 <= 2
    # exact=False returns the superset the blooms admit (no residual)
    ds3, _, _ = read_bloom_indexed(out, [3], exact=False)
    assert 3 in ds3.to_pandas()["k"].tolist()


def test_bloom_indexed_rewrite_cleans_stale(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.sources.writers import (
        read_bloom_indexed, write_bloom_indexed)
    out = str(tmp_path / "bl")
    big = rd.from_arrow(pa.table({"k": pa.array(
        np.arange(100, dtype=np.int64))})).repartition(4)
    write_bloom_indexed(big, out, "k")
    small = rd.from_arrow(pa.table({"k": pa.array(
        np.arange(10, dtype=np.int64))})).repartition(2)
    write_bloom_indexed(small, out, "k")
    import os
    live = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(live) == 2          # the 4-file layout's leftovers gone
    ds, _, tot = read_bloom_indexed(out, [5])
    assert tot == 2 and ds.count() == 1
