"""Interval join + rollup aggregate vs naive pandas oracles (adversarial
shapes: nested/overlapping/degenerate intervals, entities on one side
only, sentinel-colliding "" group keys)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.interval import interval_join
from feature_extraction_ray.stages.relational import rollup_agg


def _naive_pairs(pts, ivs):
    m = pts.merge(ivs, left_on="ent", right_on="ent")
    m = m[(m["t"] >= m["start"]) & (m["t"] <= m["end"])]
    return set(zip(m["pid"], m["iid"]))


@pytest.mark.parametrize("seed", [3, 17])
def test_interval_join_vs_naive(seed):
    rng = np.random.default_rng(seed)
    n_pts, n_iv = 400, 150
    pts = pd.DataFrame({
        "pid": np.arange(n_pts),
        "ent": rng.integers(0, 9, n_pts),       # ent 8 absent from ivs
        "t": rng.integers(0, 1000, n_pts),
    })
    start = rng.integers(0, 1000, n_iv)
    length = np.where(rng.random(n_iv) < 0.05,
                      rng.integers(500, 900, n_iv),     # pathological long
                      rng.integers(0, 40, n_iv))        # incl. zero-length
    ivs = pd.DataFrame({
        "iid": np.arange(n_iv),
        "ent": rng.integers(0, 8, n_iv),
        "start": start,
        "end": start + length,
    })
    out = interval_join(
        rd.from_arrow(pa.Table.from_pandas(pts)),
        rd.from_arrow(pa.Table.from_pandas(ivs)),
        left_by="ent", right_by="ent", left_on="t",
        right_start="start", right_end="end",
        right_value_cols=["iid"], num_buckets=4)
    got = out.to_pandas()
    assert set(zip(got["pid"], got["iid"])) == _naive_pairs(pts, ivs)
    assert len(got) == len(set(zip(got["pid"], got["iid"])))  # no dups


@pytest.mark.parametrize("seed", [5])
def test_interval_join_broadcast_equals_partitioned(seed):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame({
        "pid": np.arange(300),
        "ent": rng.integers(0, 9, 300),
        "t": rng.integers(0, 1000, 300),
    })
    start = rng.integers(0, 1000, 120)
    ivs = pd.DataFrame({
        "iid": np.arange(120),
        "ent": rng.integers(0, 8, 120),
        "start": start,
        "end": start + rng.integers(0, 60, 120),
    })
    kw = dict(left_by="ent", right_by="ent", left_on="t",
              right_start="start", right_end="end",
              right_value_cols=["iid"])
    a = interval_join(rd.from_arrow(pa.Table.from_pandas(pts)),
                      rd.from_arrow(pa.Table.from_pandas(ivs)),
                      num_buckets=4, **kw).to_pandas()
    b = interval_join(rd.from_arrow(pa.Table.from_pandas(pts)),
                      rd.from_arrow(pa.Table.from_pandas(ivs)),
                      broadcast=True, **kw).to_pandas()
    key = ["pid", "iid"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))
    assert set(zip(b["pid"], b["iid"])) == _naive_pairs(pts, ivs)


def test_interval_join_fixed_size_list_payload_roundtrip():
    # fixed-size-list columns must travel the tagged union as VARIABLE
    # lists (pa.nulls of a fixed-size list materializes n×list_size
    # child values — CLAUDE.md gotcha) and come back with their
    # original type on both sides
    emb = np.arange(12, dtype=np.float32).reshape(4, 3)
    pts = pa.table({
        "pid": pa.array([0, 1, 2, 3]),
        "ent": pa.array(["x"] * 4),
        "t": pa.array([5, 8, 20, 7]),
        "feat": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), 3),
    })
    ivs = pa.table({
        "iid": pa.array([0, 1]),
        "ent": pa.array(["x", "x"]),
        "start": pa.array([4, 100]),
        "end": pa.array([9, 200]),
        "ivec": pa.FixedSizeListArray.from_arrays(
            pa.array(np.arange(6, dtype=np.float32)), 3),
    })
    out = interval_join(rd.from_arrow(pts), rd.from_arrow(ivs),
                        left_by="ent", right_by="ent", left_on="t",
                        right_start="start", right_end="end",
                        right_value_cols=["iid", "ivec"], num_buckets=2)
    got = out.to_pandas().sort_values("pid").reset_index(drop=True)
    assert got["pid"].tolist() == [0, 1, 3]
    # payload vectors survive the transport round-trip intact
    for v in got["ivec"]:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.arange(3, dtype=np.float32))
    for pid, f in zip(got["pid"], got["feat"]):
        np.testing.assert_array_equal(np.asarray(f), emb[pid])


def test_rollup_counts_all_rows_when_value_has_nulls():
    # SQL count(*) semantics: null value cells count at EVERY level
    pdf = pd.DataFrame({
        "a": ["x", "x", "y"],
        "b": ["p", "p", "q"],
        "v": [1.0, None, 3.0],
    })
    out = rollup_agg(rd.from_pandas(pdf), ["a", "b"], "v",
                     out_count="n", out_sum="s")
    got = out.to_pandas().set_index("grouping")
    assert got.loc[3, "n"] == 3                       # grand total
    lvl0 = out.to_pandas().query("grouping == 0").set_index(["a", "b"])
    assert lvl0.loc[("x", "p"), "n"] == 2             # null row counted
    assert lvl0.loc[("x", "p"), "s"] == 1.0           # sum skips nulls


def test_interval_join_boundaries_and_empty_side():
    pts = pd.DataFrame({"pid": [0, 1, 2, 3], "ent": ["x"] * 4,
                        "t": [5, 10, 11, 4]})
    ivs = pd.DataFrame({"iid": [0, 1], "ent": ["x", "y"],
                        "start": [5, 0], "end": [10, 100]})
    out = interval_join(
        rd.from_arrow(pa.Table.from_pandas(pts)),
        rd.from_arrow(pa.Table.from_pandas(ivs)),
        left_by="ent", right_by="ent", left_on="t",
        right_start="start", right_end="end",
        right_value_cols=["iid"], num_buckets=2)
    got = out.to_pandas()
    # inclusive both ends: t=5 and t=10 match, t=11 and t=4 don't;
    # interval of entity y never pairs with entity x points
    assert sorted(zip(got["pid"], got["iid"])) == [(0, 0), (1, 0)]


@pytest.mark.parametrize("seed", range(40))
def test_match_interval_pairs_kernel_vs_brute(seed):
    # pure-kernel fuzz (no Ray): random codes/times incl. unmatched
    # codes (-1), duplicate starts, zero/negative/huge interval lengths
    rng = np.random.default_rng(seed)
    nl, nr = rng.integers(0, 60), rng.integers(0, 40)
    lcode = rng.integers(-1, 6, nl)
    lts = rng.integers(0, 50, nl)
    rcode = rng.integers(0, 6, nr)
    rstart = rng.integers(0, 50, nr)
    rlen = rng.integers(-5, 60, nr)          # negative = invalid interval
    rend = rstart + rlen
    order = np.lexsort((rstart, rcode))
    rcode, rstart, rend = rcode[order], rstart[order], rend[order]
    from feature_extraction_ray.stages.interval import match_interval_pairs
    lidx, ridx = match_interval_pairs(lcode, lts, rcode, rstart, rend)
    got = set(zip(lidx.tolist(), ridx.tolist()))
    exp = {(i, j) for i in range(nl) for j in range(nr)
           if lcode[i] == rcode[j] and rstart[j] <= lts[i] <= rend[j]}
    assert got == exp
    assert len(lidx) == len(got)             # no duplicate pairs


def test_cube_mode_adds_all_marginals():
    pdf = pd.DataFrame({
        "a": ["x", "x", "y", "y"],
        "b": ["p", "q", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    out = rollup_agg(rd.from_pandas(pdf), ["a", "b"], "v",
                     out_count="n", out_sum="s", mode="cube")
    got = out.to_pandas()
    assert sorted(got["grouping"].unique()) == [0, 1, 2, 3]
    # the CUBE-only marginal (a rolled up, group by b): grouping == 2
    m = got[got["grouping"] == 2].sort_values("b")
    assert m["a"].isna().all()
    assert m["b"].tolist() == ["p", "q"]
    assert m["s"].tolist() == [4.0, 6.0] and m["n"].tolist() == [2, 2]


def test_rollup_agg_vs_pandas_with_sentinel_collision():
    rng = np.random.default_rng(23)
    n = 500
    # "" is the internal sentinel for rolled-up string cells — real ""
    # values must still aggregate correctly (grouping bitmask keeps
    # levels apart)
    pdf = pd.DataFrame({
        "a": rng.choice(["x", "y", ""], n),
        "b": rng.choice(["p", "q", "r", ""], n),
        "v": rng.integers(0, 100, n).astype(float),
    })
    out = rollup_agg(rd.from_pandas(pdf), ["a", "b"], "v",
                     out_count="n", out_sum="s")
    got = out.to_pandas().sort_values(
        ["grouping", "a", "b"], na_position="last").reset_index(drop=True)
    lvl0 = pdf.groupby(["a", "b"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum"))
    lvl0["grouping"] = 0
    lvl1 = pdf.groupby(["a"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum"))
    lvl1["b"] = None
    lvl1["grouping"] = 1
    lvl2 = pd.DataFrame({"a": [None], "b": [None], "n": [n],
                         "s": [pdf["v"].sum()], "grouping": [3]})
    exp = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)[
        ["a", "b", "grouping", "n", "s"]].sort_values(
        ["grouping", "a", "b"], na_position="last").reset_index(drop=True)
    assert got["grouping"].tolist() == exp["grouping"].tolist()
    assert got["a"].where(got["a"].notna(), None).tolist() == \
        exp["a"].where(exp["a"].notna(), None).tolist()
    assert got["b"].where(got["b"].notna(), None).tolist() == \
        exp["b"].where(exp["b"].notna(), None).tolist()
    np.testing.assert_array_equal(got["n"], exp["n"])
    np.testing.assert_allclose(got["s"], exp["s"])


# ---------------------------------------------------------------------------
# Self overlap join (interval.overlapping_intervals)
# ---------------------------------------------------------------------------

def test_overlap_pairs_sorted_fuzz_vs_quadratic():
    from feature_extraction_ray.stages.interval import overlap_pairs_sorted
    rng = np.random.default_rng(31)
    for _ in range(40):
        n = int(rng.integers(0, 60))
        code = np.sort(rng.integers(0, 5, n)).astype(np.int64)
        s = rng.integers(0, 50, n).astype(np.int64)
        ln = rng.integers(-3, 12, n).astype(np.int64)   # some degenerate
        # sort by (code, s) as the kernel requires
        order = np.lexsort((s, code))
        code, s = code[order], s[order]
        e = s + ln[order]
        ii, jj = overlap_pairs_sorted(code, s, e)
        got = set(zip(ii.tolist(), jj.tolist()))
        exp = {(i, j) for i in range(n) for j in range(i + 1, n)
               if code[i] == code[j] and s[j] <= e[i] and s[i] <= e[j]}
        assert got == exp


@pytest.mark.parametrize("num_buckets", [3, 8])
def test_overlapping_intervals_matches_naive(ray_session, num_buckets):
    import ray
    import ray.data as rd

    from feature_extraction_ray.stages.interval import overlapping_intervals

    rng = np.random.default_rng(13)
    n = 400
    ent = rng.integers(0, 12, n)
    s = rng.integers(0, 1000, n)
    e = s + rng.integers(0, 40, n)
    key = rng.permutation(n)
    tbl = pa.table({"ent": pa.array(ent), "k": pa.array(key),
                    "s": pa.array(s), "e": pa.array(e)})
    out = overlapping_intervals(rd.from_arrow(tbl), "ent", "k", "s", "e",
                                num_buckets=num_buckets)
    parts = [p for p in (ray.get(r) for r in out.to_arrow_refs())
             if p.num_rows]
    got = sorted((r["ent"], r["key_a"], r["key_b"])
                 for t in parts for r in t.to_pylist())
    exp = sorted((int(ent[i]), int(min(key[i], key[j])),
                  int(max(key[i], key[j])))
                 for i in range(n) for j in range(i + 1, n)
                 if ent[i] == ent[j] and s[j] <= e[i] and s[i] <= e[j])
    assert got == exp


def test_rollup_agg_grouping_sets_guards(ray_session):
    from feature_extraction_ray.stages.relational import rollup_agg
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y"]),
        "b": pa.array(["1", "2", "1"]),
        "v": pa.array([1.0, 2.0, 4.0])}))
    out = rollup_agg(ds, ["a", "b"], "v", mode="sets",
                     sets=[("a",), ()]).to_pandas()
    # only the (a) level and the grand total — no (a,b) detail rows
    assert sorted(out["grouping"].unique()) == [1, 3]
    tot = out[out["grouping"] == 3]
    assert len(tot) == 1 and tot["n_rows"].iloc[0] == 3 \
        and tot["v_sum"].iloc[0] == 7.0
    lvl = out[out["grouping"] == 1].set_index("a")
    assert lvl.loc["x", "v_sum"] == 3.0 and lvl.loc["y", "v_sum"] == 4.0
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a", "b"], "v", mode="sets",
                   sets=[("a",), ("a",)])
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a", "b"], "v", mode="sets", sets=[("zzz",)])
    with pytest.raises(ValueError):
        rollup_agg(ds, ["a", "b"], "v", mode="sets")


def test_interval_coverage_union_semantics(ray_session):
    from feature_extraction_ray.stages.interval import interval_coverage
    # entity 1: [0,10) + [5,12) merge -> covered 12, 1 segment;
    # [20,25) disjoint -> +5, 2 segments; contained [21,23) adds 0.
    # entity 2: single degenerate [3,3) -> covered 0, 1 segment.
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2]),
        "s": pa.array([0, 5, 20, 21, 3]),
        "e": pa.array([10, 12, 25, 23, 3])}))
    out = {r["k"]: r for r in
           interval_coverage(ds, "k", "s", "e",
                             num_buckets=2).take_all()}
    assert out[1]["covered"] == 17 and out[1]["n_segments"] == 2
    assert out[1]["n_intervals"] == 4
    assert out[2]["covered"] == 0 and out[2]["n_segments"] == 1
    # fuzz vs brute union
    rng = np.random.default_rng(13)
    n = 600
    k = rng.integers(0, 9, n)
    s = rng.integers(0, 1000, n)
    ln = rng.integers(0, 60, n)
    ds2 = rd.from_arrow(pa.table({"k": pa.array(k), "s": pa.array(s),
                                  "e": pa.array(s + ln)}))
    out2 = {r["k"]: r["covered"] for r in
            interval_coverage(ds2, "k", "s", "e",
                              num_buckets=4).take_all()}
    for kk in range(9):
        pts = set()
        for ss, ee in zip(s[k == kk], (s + ln)[k == kk]):
            pts.update(range(ss, ee))
        assert out2[kk] == len(pts), kk
