"""General M:N partitioned hash join (stages/relational.hash_join):
DuckDB-semantics fuzz over all four join modes (null keys never match),
column renaming/collision rules, hot-key salting equivalence, and the
empty/disjoint edge cases. The TPC-H-style driver oracles live in
test_queries_oracle (q3_shipping_priority / q10_returned_items)."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.relational import hash_join

SQLHOW = {"inner": "JOIN", "left": "LEFT JOIN",
          "right": "RIGHT JOIN", "full": "FULL OUTER JOIN"}


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "fi":
            df[c] = df[c].astype("Float64")
        else:
            df[c] = df[c].astype(object).where(df[c].notna(), None)
    return df.sort_values(list(df.columns),
                          na_position="last").reset_index(drop=True)


def _tables(seed: int, nl: int = 400, nr: int = 300, lo_l=0, hi_l=60,
            lo_r=20, hi_r=80, null_frac: float = 0.05):
    rng = np.random.default_rng(seed)
    lk = rng.integers(lo_l, hi_l, nl).astype(float)
    rk = rng.integers(lo_r, hi_r, nr).astype(float)
    lk[rng.random(nl) < null_frac] = np.nan
    rk[rng.random(nr) < null_frac] = np.nan
    L = pa.table({
        "k": pa.array([None if np.isnan(x) else int(x) for x in lk],
                      pa.int64()),
        "lv": pa.array(rng.integers(0, 1000, nl), pa.int64()),
        "tag": pa.array([f"s{i % 7}" for i in range(nl)])})
    R = pa.table({
        "rk": pa.array([None if np.isnan(x) else int(x) for x in rk],
                       pa.int64()),
        "rv": pa.array(rng.integers(0, 1000, nr), pa.int64()),
        "tag": pa.array([f"t{i % 5}" for i in range(nr)])})
    return L, R


def _expected(L: pa.Table, R: pa.Table, how: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("L", L.to_pandas())
    con.register("R", R.to_pandas())
    return con.execute(
        f"SELECT COALESCE(L.k, R.rk) AS k, L.lv, L.tag, R.rv,"
        f" R.tag AS tag_r FROM L {SQLHOW[how]} R ON L.k = R.rk").df()


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_modes_match_duckdb(ray_session, how):
    L, R = _tables(1)
    out = hash_join(rd.from_arrow(L).repartition(6),
                    rd.from_arrow(R).repartition(4),
                    left_key="k", right_key="rk", how=how,
                    num_buckets=8).to_pandas()
    exp = _expected(L, R, how)
    assert len(out) == len(exp)
    assert _norm(out).equals(_norm(exp))


def test_fanout_mxn_fuzz(ray_session):
    # heavy duplication both sides: every common key emits |L|x|R| rows
    for seed in (2, 3):
        L, R = _tables(seed, nl=300, nr=300, lo_l=0, hi_l=12,
                       lo_r=4, hi_r=16, null_frac=0.1)
        for how in ("inner", "full"):
            out = hash_join(rd.from_arrow(L), rd.from_arrow(R),
                            left_key="k", right_key="rk", how=how,
                            num_buckets=4).to_pandas()
            exp = _expected(L, R, how)
            assert _norm(out).equals(_norm(exp)), (seed, how)


def test_salting_preserves_row_multiset(ray_session):
    L, R = _tables(4, nl=500, nr=400, lo_l=0, hi_l=30, lo_r=0, hi_r=30)
    for how in ("inner", "left"):
        plain = hash_join(rd.from_arrow(L), rd.from_arrow(R),
                          left_key="k", right_key="rk", how=how,
                          num_buckets=8).to_pandas()
        salted = hash_join(rd.from_arrow(L).repartition(5),
                           rd.from_arrow(R).repartition(3),
                           left_key="k", right_key="rk", how=how,
                           num_buckets=8, hot_keys={3, 17, 29},
                           salt_factor=4).to_pandas()
        assert _norm(plain).equals(_norm(salted)), how
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                  right_key="rk", how="full", hot_keys={3})


def test_right_cols_and_rename(ray_session):
    L, R = _tables(5)
    out = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                    right_key="rk", how="inner", right_cols=["rv"],
                    rename={"rv": "other_value"},
                    num_buckets=4).to_pandas()
    assert sorted(out.columns) == ["k", "lv", "other_value", "tag"]
    # auto-suffix on collision
    out2 = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                     right_key="rk", how="inner", right_cols=["tag"],
                     num_buckets=4).to_pandas()
    assert "tag_r" in out2.columns
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                  right_key="rk", rename={"rv": "lv"})


def test_disjoint_and_empty_sides(ray_session):
    L, R = _tables(6, lo_l=0, hi_l=10, lo_r=100, hi_r=110,
                   null_frac=0.0)
    assert hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                     right_key="rk", how="inner",
                     num_buckets=4).count() == 0
    full = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                     right_key="rk", how="full",
                     num_buckets=4).to_pandas()
    assert len(full) == len(L) + len(R)
    assert full["rv"].isna().sum() == len(L)
    assert full["lv"].isna().sum() == len(R)
    empty = rd.from_arrow(R.slice(0, 0))
    lonly = hash_join(rd.from_arrow(L), empty, left_key="k",
                      right_key="rk", how="left",
                      num_buckets=4).to_pandas()
    assert len(lonly) == len(L) and lonly["rv"].isna().all()


def test_string_keys(ray_session):
    rng = np.random.default_rng(7)
    L = pa.table({"k": pa.array([f"key{i}" for i in
                                 rng.integers(0, 20, 200)]),
                  "lv": pa.array(np.arange(200), pa.int64())})
    R = pa.table({"rk": pa.array([f"key{i}" for i in
                                  rng.integers(10, 30, 150)]),
                  "rv": pa.array(np.arange(150), pa.int64())})
    out = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                    right_key="rk", how="full", num_buckets=8).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT COALESCE(L.k, R.rk) AS k, lv, rv FROM L FULL OUTER JOIN"
        " R ON L.k = R.rk").df()
    assert _norm(out).equals(_norm(exp))


def test_auto_salt_detects_and_preserves(ray_session):
    # one key carries ~50% of probe rows -> detected hot; result
    # multiset identical to the unsalted plan
    from feature_extraction_ray.stages.relational import detect_hot_keys
    rng = np.random.default_rng(8)
    n = 2000
    k = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 100, n))
    L = pa.table({"k": pa.array(k, pa.int64()),
                  "lv": pa.array(np.arange(n), pa.int64())})
    R = pa.table({"rk": pa.array(np.arange(100), pa.int64()),
                  "rv": pa.array(np.arange(100) * 10, pa.int64())})
    hot = detect_hot_keys(rd.from_arrow(L), "k", num_buckets=16)
    assert 7 in hot and len(hot) <= 3
    assert detect_hot_keys(rd.from_arrow(R), "rk", num_buckets=4) == set()
    auto = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                     right_key="rk", how="inner", num_buckets=16,
                     hot_keys="auto", salt_factor=4).to_pandas()
    plain = hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                      right_key="rk", how="inner",
                      num_buckets=16).to_pandas()
    assert _norm(auto).equals(_norm(plain))
    with pytest.raises(ValueError):
        hash_join(rd.from_arrow(L), rd.from_arrow(R), left_key="k",
                  right_key="rk", hot_keys="bogus")


def test_scd2_history_semantics(ray_session):
    from feature_extraction_ray.stages.relational import scd2_history
    # key 1: U@1 U@3 D@5 U@9  -> v1 [1,3), v2 [3,5) closed by delete,
    #                            v3 [9,null) current
    # key 2: D@1 U@4          -> delete first closes nothing; v1 current
    # key 3: U@2              -> single current version
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([1, 3, 5, 9, 1, 4, 2], pa.int64()),
        "op": ["U", "U", "D", "U", "D", "U", "U"],
        "val": pa.array([10, 11, 0, 12, 0, 20, 30], pa.int64())})
    out = scd2_history(rd.from_arrow(tbl).repartition(3), "k", "ts",
                       ["val"], op_col="op", num_buckets=4) \
        .to_pandas().sort_values(["k", "version"]).reset_index(drop=True)
    assert out[["k", "val", "valid_from", "version"]].values.tolist() == [
        [1, 10, 1, 1], [1, 11, 3, 2], [1, 12, 9, 3],
        [2, 20, 4, 1], [3, 30, 2, 1]]
    vt = out["valid_to"].tolist()
    assert vt[0] == 3 and vt[1] == 5           # delete closes v2 at 5
    assert all(pd.isna(v) for v in (vt[2], vt[3], vt[4]))
    assert out["is_current"].tolist() == [False, False, True, True, True]
    # no op column: every change survives
    out2 = scd2_history(rd.from_arrow(tbl), "k", "ts", ["val"],
                        num_buckets=2).to_pandas()
    assert len(out2) == 7
    # duplicate (key, ts) raises
    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "ts": pa.array([5, 5], pa.int64()),
                    "val": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception):
        scd2_history(rd.from_arrow(dup), "k", "ts", ["val"],
                     num_buckets=2).to_pandas()


def test_scd2_lookup_gap_semantics(ray_session):
    from feature_extraction_ray.stages.relational import (scd2_history,
                                                          scd2_lookup)
    # key 1: v=10 [1,5) closed by delete@5, v=12 [9,open)
    chg = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([1, 5, 9], pa.int64()),
        "op": ["U", "D", "U"],
        "val": pa.array([10, 0, 12], pa.int64())})
    hist = scd2_history(rd.from_arrow(chg), "k", "ts", ["val"],
                        op_col="op", num_buckets=2)
    facts = pa.table({
        "fid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "t": pa.array([0, 3, 6, 20, 3], pa.int64())})
    out = scd2_lookup(rd.from_arrow(facts), hist, fact_key="k",
                      fact_ts="t", hist_key="k", value_cols=["val"],
                      num_buckets=2).to_pandas().sort_values("fid")
    # before first version -> null; in v1 -> 10; in the DELETED gap
    # [5,9) -> null; after re-insert -> 12; unknown key -> null
    vals = out["val"].tolist()
    assert pd.isna(vals[0]) and vals[1] == 10
    assert pd.isna(vals[2]) and vals[3] == 12 and pd.isna(vals[4])
    assert "valid_to" not in out.columns
