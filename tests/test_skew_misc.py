"""Skew handling (salting, report) + G2/G8 feature pack tests."""
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages.features import (non_verbal_features,
                                                    syllable_count,
                                                    syllable_features)
from feature_extraction_ray.stages.partition import (salt_column,
                                                     skew_report,
                                                     stable_bucket)


def test_syllable_counter_heuristic():
    assert syllable_count("cat") == 1
    assert syllable_count("hello") == 2
    assert syllable_count("beautiful") >= 3
    assert syllable_count("make") == 1          # silent e
    assert syllable_count("little") == 2        # -le keeps its syllable
    assert syllable_count("") == 0


def test_syllable_and_nonverbal_packs():
    segs = [["hello", "world"], ["[noise]", "ok", "<unk>"]]
    s = syllable_features(segs)
    assert s["syll_min"] >= 1 and s["syll_max"] >= s["syll_min"]
    nv = non_verbal_features(segs)
    assert nv["noise"] == pytest.approx(1 / 5)
    assert nv["unk"] == pytest.approx(1 / 5)
    assert nv["laughter"] == 0.0
    assert all(np.isnan(v) for v in non_verbal_features([]).values())


def test_skew_report_flags_hot_entity():
    tbl = FX.gen_tokens(n_rows=400, n_entities=6, seed=3)
    rep = skew_report(rd.from_arrow(tbl), "source")
    assert rep["total_rows"] == 400
    # fixture gives ~50% of rows to one source
    assert rep["top_share"] > 0.3
    assert rep["top"][0][1] >= rep["top"][-1][1]


def test_salting_preserves_aggregates_and_spreads_load():
    tbl = FX.gen_tokens(n_rows=400, n_entities=6, seed=3)
    ds = rd.from_arrow(tbl)
    rep = skew_report(ds, "source")
    hot = {rep["top"][0][0]}
    salted = salt_column(ds, "source", hot, salt_factor=4)
    out = salted.groupby("__salted").aggregate(
        Count(alias_name="n"), Sum("n_tok", alias_name="s")).to_pandas()
    # order-insensitive totals are preserved after stripping the salt
    base = out["__salted"].str.split("#").str[0]
    merged = out.groupby(base).agg(n=("n", "sum"), s=("s", "sum"))
    exp = (tbl.to_pandas().groupby("source")
           .agg(n=("n_tok", "size"), s=("n_tok", "sum")))
    pd.testing.assert_frame_equal(
        merged.sort_index(), exp.sort_index(), check_names=False,
        check_dtype=False)
    # the hot key actually split into multiple salted keys
    hot_rows = out[out["__salted"].str.startswith(next(iter(hot)) + "#")]
    assert len(hot_rows) >= 2


def test_stable_bucket_deterministic_across_dtypes():
    a = pa.array(["x", "y", "z", "x"])
    b1 = stable_bucket(a, 16)
    b2 = stable_bucket(a, 16)
    np.testing.assert_array_equal(b1, b2)
    assert b1[0] == b1[3]
    ints = pa.array([1, 2, 3, 1], type=pa.int64())
    bi = stable_bucket(ints, 16)
    assert bi[0] == bi[3]


def test_hash_split_deterministic_disjoint_ratios():
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.partition import hash_split
    import numpy as np
    ids = pa.table({"doc_id": pa.array(np.arange(4000, dtype=np.int64))})
    a = hash_split(rd.from_arrow(ids), "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = hash_split(rd.from_arrow(ids).repartition(7), "doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # stable under re-partitioning / re-runs
    assert a["split"].tolist() == b["split"].tolist()
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.02
    assert abs(frac["test"] - 0.05) < 0.02
    # growth-stability: a doc's split is unchanged when the corpus grows
    bigger = pa.table({"doc_id": pa.array(np.arange(8000, dtype=np.int64))})
    c = hash_split(rd.from_arrow(bigger), "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert c["split"].tolist()[:4000] == a["split"].tolist()
    # different seed reshuffles
    d = hash_split(rd.from_arrow(ids), "doc_id", seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert d["split"].tolist() != a["split"].tolist()


def test_normalize_by_group_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from feature_extraction_ray.stages.relational import normalize_by_group
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "id": np.arange(400, dtype=np.int64),
        "g": rng.integers(0, 12, 400),
        "v": np.round(rng.normal(50, 20, 400), 3)})
    # degenerate groups: one singleton, one constant
    df.loc[df["g"] == 11, "g"] = 10
    df = pd.concat([df, pd.DataFrame(
        {"id": [400, 401, 402], "g": [99, 98, 98],
         "v": [7.0, 5.5, 5.5]})]).reset_index(drop=True)
    ds = rd.from_pandas(df)
    out = normalize_by_group(ds, "g", ["v"], "zscore", num_buckets=4)
    out = normalize_by_group(out, "g", ["v"], "minmax", num_buckets=4) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    gb = df.groupby("g")["v"]
    exp_z = (df["v"] - gb.transform("mean")) / gb.transform("std")
    exp_mm = (df["v"] - gb.transform("min")) / \
        (gb.transform("max") - gb.transform("min"))
    np.testing.assert_allclose(out["v_z"].to_numpy(),
                               exp_z.to_numpy(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(out["v_mm"].to_numpy(),
                               exp_mm.to_numpy(), rtol=1e-12, atol=1e-12)
    # singleton group 99 -> null z; constant group 98 -> null z and mm
    byid = out.set_index("id")
    assert np.isnan(byid.loc[400, "v_z"])
    assert np.isnan(byid.loc[401, "v_z"]) and np.isnan(byid.loc[401, "v_mm"])


def test_pivot_counts_and_sum():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from feature_extraction_ray.stages.relational import pivot_counts
    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3],
        "k": ["a", "b", "a", "b", "b", "c"],
        "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]})
    out = pivot_counts(rd.from_pandas(df), "g", "k").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out.columns) == ["g", "k_a", "k_b", "k_c"]
    assert out[["k_a", "k_b", "k_c"]].values.tolist() == \
        [[2, 1, 0], [0, 2, 0], [0, 0, 1]]
    out2 = pivot_counts(rd.from_pandas(df), "g", "k",
                        value_col="v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out2[["k_a", "k_b", "k_c"]].values.tolist() == \
        [[5.0, 2.0, 0.0], [0.0, 24.0, 0.0], [0.0, 0.0, 32.0]]
    with pytest.raises(ValueError, match="max_pivot"):
        pivot_counts(rd.from_pandas(df), "g", "k", max_pivot=2).to_pandas()


def test_explode_column_with_ordinality():
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.relational import explode_column
    t = pa.table({
        "id": pa.array([10, 20, 30, 40], type=pa.int64()),
        "xs": pa.array([[1, 2, 3], [], None, [7]],
                       type=pa.list_(pa.int32()))})
    out = explode_column(rd.from_arrow(t), "xs", out_col="x") \
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    assert out["id"].tolist() == [10, 10, 10, 40]
    assert out["x"].tolist() == [1, 2, 3, 7]
    assert out["pos"].tolist() == [1, 2, 3, 1]


def test_weighted_sample_per_group():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from feature_extraction_ray.stages.partition import (
        weighted_sample_per_group)
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "g": np.repeat(np.arange(3), 1000),
        "w": np.where(np.arange(3000) % 10 == 0, 0.0,
                      rng.uniform(0.1, 10.0, 3000))})
    ds = rd.from_pandas(df)
    out = weighted_sample_per_group(ds, "g", k=50, id_col="id",
                                    weight_col="w", num_buckets=4) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 150 and out.groupby("g").size().tolist() == [50] * 3
    # zero-weight rows never sampled
    assert (out.merge(df, on="id")["w_x"] > 0).all()
    # deterministic across reruns AND repartitioning
    out2 = weighted_sample_per_group(ds.repartition(13), "g", k=50,
                                     id_col="id", weight_col="w",
                                     num_buckets=8).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == out2["id"].tolist()
    # heavier rows win more: inclusion ~ proportional to weight, so the
    # top-weight decile (mean w ~9.7 vs corpus mean ~5.05) should hold
    # ~19% of the sample; uniform sampling would give ~10%
    heavy = df.nlargest(300, "w")["id"]
    share = out["id"].isin(heavy).mean()
    assert share > 0.15
    # different seed -> different sample
    out3 = weighted_sample_per_group(ds, "g", k=50, id_col="id",
                                     weight_col="w", seed=7).to_pandas()
    assert sorted(out3["id"]) != out["id"].tolist()


def test_splitmix_fmix_sql_parity():
    """The HUGEINT wrap-arithmetic CTE chain embedded in the
    weighted_sample_docs / split_counts_docs oracles reproduces
    partition._stable_hash_strings (splitmix64) + the (seed, fmix64)
    mix BIT-FOR-BIT over integer ids."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    from feature_extraction_ray.pipelines.queries import (
        _splitmix_fmix_ctes)
    from feature_extraction_ray.stages.partition import (
        _stable_hash_strings)
    rng = np.random.default_rng(17)
    ids = np.unique(rng.integers(0, 2 ** 62, size=2000)
                    .astype(np.uint64))
    seed = 1337
    h = _stable_hash_strings(pa.array(ids.astype(np.int64)))
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15)
                         & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        h = (h ^ seed_mix) * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(["
                + ",".join(map(str, ids)) + "]) AS id")
    chain = _splitmix_fmix_ctes("id", "id", "t", seed)
    got = dict(con.execute(
        f"WITH {chain} SELECT id, hh FROM hm").fetchall())
    assert all(int(got[int(i)]) == int(x) for i, x in zip(ids, h))
