"""Goldens/properties for groupstats (quantiles/argmax/funnel/resample),
relational.set_ops, and the SymSpell edit-distance-1 join."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from feature_extraction_ray.stages.editdist import distance1_join
from feature_extraction_ray.stages.groupstats import (
    funnel_counts, grouped_argmax, grouped_quantiles, resample_time_series)
from feature_extraction_ray.stages.relational import set_ops


def _table(ds):
    import ray
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else None


def _naive_quantile(vals, q):
    vals = sorted(vals)
    n = len(vals)
    idx = max(1, int(np.ceil(q * n))) - 1
    return vals[idx]


@pytest.mark.parametrize("num_buckets", [4, 17])
def test_grouped_quantiles_matches_naive(ray_session, num_buckets):
    rng = np.random.default_rng(7)
    n = 2000
    grp = rng.integers(0, 9, n)
    # ties + negatives + a null + a NaN to exercise the drop path
    val = np.round(rng.normal(0, 10, n), 1)
    tbl = pa.table({"g": pa.array(grp), "v": pa.array(val)})
    tbl = pa.concat_tables([
        tbl, pa.table({"g": pa.array([0, 1]),
                       "v": pa.array([None, float("nan")],
                                     type=pa.float64())})])
    out = _table(grouped_quantiles(rd.from_arrow(tbl), "g", "v",
                                   num_buckets=num_buckets))
    got = {r["g"]: r for r in out.to_pylist()}
    assert set(got) == set(range(9))
    for g in range(9):
        vs = val[grp == g]
        assert got[g]["n_values"] == len(vs)
        for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            assert got[g][name] == _naive_quantile(vs, q), (g, name)
        q25, q75 = got[g]["q25"], got[g]["q75"]
        lo, hi = q25 - 1.5 * (q75 - q25), q75 + 1.5 * (q75 - q25)
        assert got[g]["n_outliers"] == int(((vs < lo) | (vs > hi)).sum())


def test_grouped_argmax_ties_go_to_smallest_label(ray_session):
    tbl = pa.table({
        "g": [1, 1, 1, 1, 2, 2, 2, 3],
        "lab": ["b", "b", "a", "a", "z", "y", "z", "q"],
    })
    out = _table(grouped_argmax(rd.from_arrow(tbl), "g", "lab",
                                num_buckets=3))
    got = {r["g"]: (r["top_lab"], r["n"]) for r in out.to_pylist()}
    assert got == {1: ("a", 2), 2: ("z", 2), 3: ("q", 1)}


def test_funnel_counts_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    n = 1500
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 10_000, n).astype("datetime64[us]")
    types = rng.choice(["a", "b", "c", "x"], n)
    tbl = pa.table({"u": pa.array(users), "ty": pa.array(types),
                    "ts": pa.array(ts)})
    steps, gap = ["a", "b", "c"], 2_000
    out = _table(funnel_counts(rd.from_arrow(tbl), "u", "ty", "ts",
                               steps, max_gap_us=gap, num_buckets=5))
    got = {r["step"]: r["n_users"] for r in out.to_pylist()}
    assert [r["event_type"] for r in
            sorted(out.to_pylist(), key=lambda r: r["step"])] == steps

    # brute force per user
    ts_i = ts.astype(np.int64)
    expect = {k: 0 for k in (1, 2, 3)}
    for u in np.unique(users):
        m = users == u
        evs = sorted(zip(ts_i[m], types[m]))
        t_prev, k = None, 0
        for step in steps:
            cands = [t for t, ty in evs if ty == step and
                     (t_prev is None or
                      (t > t_prev and t - t_prev <= gap))]
            if not cands:
                break
            t_prev = min(cands)
            k += 1
            expect[k] += 1
    assert got == expect


def test_resample_dense_grid_and_gap_zeros(ray_session):
    h = 3_600_000_000
    base = np.datetime64("2024-01-01T00:30:00", "us").astype(np.int64)
    rows = {
        "u": [1, 1, 1, 2],
        "ts": pa.array((base + np.array([0, 3 * h, 3 * h + 5, 0]))
                       .astype("datetime64[us]")),
        "v": [1.0, 2.0, 3.0, 9.0],
    }
    out = _table(resample_time_series(rd.from_arrow(pa.table(rows)),
                                      "u", "ts", "v", freq_us=h,
                                      num_buckets=3))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["period_ts"]))
    u1 = [r for r in rows if r["u"] == 1]
    assert len(u1) == 4  # hours 0..3 inclusive, gaps filled
    assert [r["n_events"] for r in u1] == [1, 0, 0, 2]
    assert [r["sum_value"] for r in u1] == [1.0, 0.0, 0.0, 5.0]
    u2 = [r for r in rows if r["u"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1
    # period starts are hour-aligned
    assert all(r["period_ts"].minute == 0 and r["period_ts"].second == 0
               for r in rows)


def test_set_ops_matches_python_sets(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 300)
    b = rng.integers(25, 75, 300)
    dsa = rd.from_arrow(pa.table({"k": pa.array(a)}))
    dsb = rd.from_arrow(pa.table({"k": pa.array(b)}))
    out = _table(set_ops(dsa, dsb, ["k"]))
    got = {(r["op"], r["k"]) for r in out.to_pylist()}
    sa, sb = set(a.tolist()), set(b.tolist())
    expect = ({("intersect", k) for k in sa & sb} |
              {("except_a", k) for k in sa - sb} |
              {("except_b", k) for k in sb - sa})
    assert got == expect
    assert len(out) == len(got)  # distinct


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [0, 1])
def test_distance1_join_matches_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    # tiny alphabet + short strings → dense collisions incl. indels
    words = set()
    while len(words) < 120:
        L = rng.integers(1, 6)
        words.add("".join(rng.choice(list("abcé"), L)))
    words = sorted(words)
    ds = rd.from_arrow(pa.table({"w": pa.array(words)}))
    out = _table(distance1_join(ds, "w", num_buckets=7))
    got = {(r["w_a"], r["w_b"]) for r in out.to_pylist()} if out is not None \
        else set()
    expect = {(a, b) for i, a in enumerate(words)
              for b in words[i + 1:] if _lev(a, b) == 1}
    assert got == expect
    if out is not None:
        assert len(out) == len(got)  # globally distinct


def test_distance1_join_customer_shape(ray_session):
    names = [f"Customer#{i:09d}" for i in range(40)]
    ds = rd.from_arrow(pa.table({"c_name": pa.array(names)}))
    out = _table(distance1_join(ds, "c_name", num_buckets=4))
    got = {(r["c_name_a"], r["c_name_b"]) for r in out.to_pylist()}
    expect = {(a, b) for i, a in enumerate(names)
              for b in names[i + 1:] if _lev(a, b) == 1}
    assert got == expect


def test_sliding_quantile_matches_naive(ray_session):
    from feature_extraction_ray.stages.window import sliding_quantile
    rng = np.random.default_rng(5)
    n = 800
    tbl = pa.table({
        "u": pa.array(rng.integers(0, 12, n)),
        "o": pa.array(np.arange(n)),
        "v": pa.array(np.round(rng.normal(0, 5, n), 2)),
    })
    out = _table(sliding_quantile(rd.from_arrow(tbl), "u", ["o"], "v",
                                  window=5, q=0.5, num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    by_u = {}
    for r in rows:
        by_u.setdefault(r["u"], []).append(r)
    for u, rs in by_u.items():
        hist = []
        for r in rs:
            hist.append(r["v"])
            win = sorted(hist[-5:])
            m = len(win)
            exp = win[max(1, int(np.ceil(0.5 * m))) - 1]
            assert r["v_q50w5"] == exp, (u, r)


def test_robust_scale_matches_naive(ray_session):
    from feature_extraction_ray.stages.groupstats import robust_scale
    rng = np.random.default_rng(9)
    n = 600
    grp = rng.integers(0, 8, n)
    val = np.round(rng.normal(0, 5, n), 2)
    # one constant group → MAD 0 → nulls
    grp = np.r_[grp, [99, 99, 99]]
    val = np.r_[val, [7.0, 7.0, 7.0]]
    ids = np.arange(len(grp))
    tbl = pa.table({"id": pa.array(ids), "g": pa.array(grp),
                    "v": pa.array(val)})
    out = _table(robust_scale(rd.from_arrow(tbl), "g", "v",
                              keep_cols=["id"], num_buckets=3))
    got = {r["id"]: r["v_robust"] for r in out.to_pylist()}

    def dmed(xs):
        xs = sorted(xs)
        return xs[max(1, int(np.ceil(0.5 * len(xs)))) - 1]

    for g in np.unique(grp):
        vs = val[grp == g]
        med = dmed(vs)
        mad = dmed(np.abs(vs - med))
        for i in ids[grp == g]:
            if mad == 0:
                assert got[i] is None
            else:
                assert got[i] == pytest.approx((val[i] - med) / mad,
                                               abs=1e-12)


def test_profile_columns(ray_session):
    tbl = pa.table({
        "a": pa.array([1, 2, 2, None, 5], type=pa.int64()),
        "b": pa.array(["x", None, "y", "x", None]),
    })
    from feature_extraction_ray.stages.groupstats import profile_columns
    out = _table(profile_columns(rd.from_arrow(tbl), ["a", "b"]))
    got = {r["column"]: r for r in out.to_pylist()}
    assert got["a"]["n_nulls"] == 1 and got["a"]["n_distinct"] == 3
    assert got["a"]["min_value"] == "1" and got["a"]["max_value"] == "5"
    assert got["b"]["n_nulls"] == 2 and got["b"]["n_distinct"] == 2
    assert got["b"]["min_value"] == "x" and got["b"]["max_value"] == "y"


@pytest.mark.parametrize("plan", ["broadcast", "partitioned"])
def test_pagerank_matches_dense_power_iteration(ray_session, plan):
    from feature_extraction_ray.stages.graphrank import pagerank
    rng = np.random.default_rng(2)
    n_nodes, n_edges = 25, 120
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    names = np.array([f"n{i:02d}" for i in range(n_nodes)])
    ds = rd.from_arrow(pa.table({"s": pa.array(names[src]),
                                 "d": pa.array(names[dst])}))
    out = _table(pagerank(ds, "s", "d", damping=0.85, iters=4,
                          num_buckets=4, plan=plan))
    got = {r["node"]: r["rank"] for r in out.to_pylist()}

    # dense power iteration over the SAME node set (nodes appearing in
    # any edge), multiplicity-weighted, no dangling redistribution
    nodes = sorted(set(names[src]) | set(names[dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    M = np.zeros((N, N))
    for s, d in zip(names[src], names[dst]):
        M[idx[d], idx[s]] += 1.0
    deg = M.sum(axis=0)
    W = np.divide(M, deg, out=np.zeros_like(M), where=deg > 0)
    r = np.full(N, 1.0 / N)
    for _ in range(4):
        r = 0.15 / N + 0.85 * (W @ r)
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-12), v


def test_grouped_linreg_matches_polyfit(ray_session):
    from feature_extraction_ray.stages.groupstats import grouped_linreg
    rng = np.random.default_rng(13)
    n = 900
    g = rng.integers(0, 6, n)
    x = rng.uniform(0, 30, n)
    y = 2.5 * x + rng.normal(0, 3, n)
    # degenerate group: constant x → null slope
    g = np.r_[g, [9, 9]]
    x = np.r_[x, [5.0, 5.0]]
    y = np.r_[y, [1.0, 2.0]]
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "x": pa.array(x),
                                 "y": pa.array(y)}))
    out = _table(grouped_linreg(ds, "g", "x", "y"))
    got = {r["g"]: r for r in out.to_pylist()}
    assert got[9]["slope"] is None and got[9]["intercept"] is None
    for gg in range(6):
        m = g == gg
        slope, intercept = np.polyfit(x[m], y[m], 1)
        assert got[gg]["n"] == int(m.sum())
        assert got[gg]["slope"] == pytest.approx(slope, rel=1e-9)
        assert got[gg]["intercept"] == pytest.approx(intercept, rel=1e-9)


def test_extract_json_field_types_and_nulls(ray_session):
    from feature_extraction_ray.stages.relational import extract_json_field
    import pyarrow as _pa
    rows = ['{"k": 87, "s": "hi"}', '{"k": -3}', '{"x": 1}',
            '{"k": null}', '{"s": ""}', None, '{"k": 0}']
    ds = rd.from_arrow(pa.table({"id": pa.array(range(len(rows))),
                                 "j": pa.array(rows)}))
    ints = _table(extract_json_field(ds, "j", "k", out_col="k",
                                     out_type=_pa.int64()))
    got = {r["id"]: r["k"] for r in ints.to_pylist()}
    assert got == {0: 87, 1: -3, 2: None, 3: None, 4: None, 5: None, 6: 0}
    strs = _table(extract_json_field(ds, "j", "s"))
    got = {r["id"]: r["s"] for r in strs.to_pylist()}
    assert got[0] == "hi" and got[4] == "" and got[1] is None


def test_running_distinct_matches_bruteforce(ray_session):
    from feature_extraction_ray.stages.window import running_distinct
    rng = np.random.default_rng(21)
    n = 700
    u = rng.integers(0, 15, n)
    o = rng.permutation(n)
    v = rng.choice(list("abcdefg"), n)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "o": pa.array(o),
                                 "v": pa.array(v)}))
    out = _table(running_distinct(ds, "u", ["o"], "v", num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    by_u = {}
    for r in rows:
        by_u.setdefault(r["u"], []).append(r)
    for uu, rs in by_u.items():
        seen = set()
        for r in rs:
            seen.add(r["v"])
            assert r["n_distinct_v"] == len(seen)


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        grouped_quantiles_cont)
    rng = np.random.default_rng(4)
    n = 1200
    g = rng.integers(0, 7, n)
    v = rng.normal(0, 10, n)
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)}))
    out = _table(grouped_quantiles_cont(ds, "g", "v", num_buckets=5))
    got = {r["g"]: r for r in out.to_pylist()}
    for gg in range(7):
        vs = v[g == gg]
        for q, name in ((0.25, "q25c"), (0.5, "q50c"), (0.75, "q75c")):
            # numpy 'linear' interpolation is the same definition
            assert got[gg][name] == pytest.approx(
                np.quantile(vs, q), rel=1e-12), (gg, name)


@pytest.mark.parametrize("seed,num_buckets", [(0, 5), (3, 5), (0, 17)])
def test_distance_le2_join_matches_bruteforce(ray_session, seed,
                                              num_buckets):
    from feature_extraction_ray.stages.editdist import distance_le2_join
    rng = np.random.default_rng(seed)
    words = set()
    while len(words) < 90:
        L = rng.integers(1, 7)
        words.add("".join(rng.choice(list("abcé"), L)))
    words = sorted(words)
    ds = rd.from_arrow(pa.table({"w": pa.array(words)}))
    out = _table(distance_le2_join(ds, "w", num_buckets=num_buckets))
    got = {(r["w_a"], r["w_b"]): r["dist"] for r in out.to_pylist()} \
        if out is not None else {}
    expect = {}
    for i, x in enumerate(words):
        for y in words[i + 1:]:
            d = _lev(x, y)
            if d <= 2:
                expect[(x, y)] = d
    assert got == expect


def test_lev_le2_kernel_clips_above_two(ray_session):
    from feature_extraction_ray.stages.editdist import _lev_le2_batch
    a = np.array(["abc", "abc", "abc", "", "abcdef"], dtype=object)
    b = np.array(["abc", "abd", "xyd", "ab", "abc"], dtype=object)
    assert _lev_le2_batch(a, b).tolist() == [0, 1, 3, 2, 3]


# ---------------------------------------------------------------------------
# grouped_corr / grouped_autocorr / winsorize / anti_join
# ---------------------------------------------------------------------------

def test_grouped_corr_matches_numpy(ray_session):
    from feature_extraction_ray.stages.groupstats import grouped_corr
    rng = np.random.default_rng(11)
    n = 3000
    grp = rng.integers(0, 6, n)
    x = rng.integers(-50, 50, n)
    y = (2 * x + rng.integers(-30, 30, n))     # correlated, integer
    tbl = pa.table({"g": pa.array(grp), "x": pa.array(x),
                    "y": pa.array(y)})
    out = _table(grouped_corr(rd.from_arrow(tbl), "g", "x", "y"))
    got = {r["g"]: r for r in out.to_pylist()}
    assert set(got) == set(range(6))
    for g in range(6):
        xs, ys = x[grp == g], y[grp == g]
        assert got[g]["n"] == len(xs)
        exp = np.corrcoef(xs.astype(float), ys.astype(float))[0, 1]
        assert abs(got[g]["corr_xy"] - exp) < 1e-12


def test_grouped_corr_degenerate_groups_null(ray_session):
    from feature_extraction_ray.stages.groupstats import grouped_corr
    tbl = pa.table({"g": [1, 1, 1, 2], "x": [5, 5, 5, 1],
                    "y": [1, 2, 3, 9]})
    out = _table(grouped_corr(rd.from_arrow(tbl), "g", "x", "y"))
    got = {r["g"]: r for r in out.to_pylist()}
    assert got[1]["corr_xy"] is None        # zero x-variance
    assert got[2]["corr_xy"] is None        # single row


@pytest.mark.parametrize("lag,num_buckets", [(1, 4), (2, 9)])
def test_grouped_autocorr_matches_numpy(ray_session, lag, num_buckets):
    from feature_extraction_ray.stages.groupstats import grouped_autocorr
    rng = np.random.default_rng(23)
    n = 1200
    ent = rng.integers(0, 15, n)
    ts = rng.permutation(n).astype(np.int64)
    val = rng.integers(0, 1000, n)
    tbl = pa.table({"e": pa.array(ent), "ts": pa.array(ts),
                    "v": pa.array(val)})
    out = _table(grouped_autocorr(rd.from_arrow(tbl), "e", ["ts"], "v",
                                  lag=lag, num_buckets=num_buckets))
    got = {r["e"]: r for r in out.to_pylist()}
    assert set(got) == set(np.unique(ent).tolist())
    for e in np.unique(ent):
        vs = val[ent == e][np.argsort(ts[ent == e], kind="stable")]
        m = max(len(vs) - lag, 0)
        assert got[e]["n_pairs"] == m
        if m < 2:
            assert got[e]["autocorr"] is None
            continue
        xs, ys = vs[:-lag].astype(float), vs[lag:].astype(float)
        if xs.std() == 0 or ys.std() == 0:
            assert got[e]["autocorr"] is None
        else:
            exp = np.corrcoef(xs, ys)[0, 1]
            assert abs(got[e]["autocorr"] - exp) < 1e-12


def test_winsorize_matches_naive(ray_session):
    from feature_extraction_ray.stages.groupstats import winsorize
    rng = np.random.default_rng(5)
    n = 800
    grp = rng.integers(0, 4, n)
    val = np.round(rng.normal(0, 100, n), 2)
    ids = np.arange(n)
    tbl = pa.table({"id": pa.array(ids), "g": pa.array(grp),
                    "v": pa.array(val)})
    out = _table(winsorize(rd.from_arrow(tbl), "g", "v", 0.1, 0.9,
                           num_buckets=5))
    assert out.num_rows == n
    got = {r["id"]: r["v_w"] for r in out.to_pylist()}
    for g in range(4):
        vs = val[grp == g]
        lo, hi = _naive_quantile(vs, 0.1), _naive_quantile(vs, 0.9)
        for i in ids[grp == g]:
            assert got[i] == min(max(val[i], lo), hi)


def test_anti_join_matches_broadcast_and_python(ray_session):
    from feature_extraction_ray.stages.relational import anti_join, semi_join
    rng = np.random.default_rng(3)
    left = pa.table({"k": pa.array(rng.integers(0, 500, 900)),
                     "payload": pa.array(rng.integers(0, 10, 900))})
    right = pa.table({"rk": pa.array(
        np.repeat(rng.integers(0, 500, 200), 2))})  # dup right keys
    got = _table(anti_join(rd.from_arrow(left), rd.from_arrow(right),
                           left_key="k", right_key="rk", num_buckets=7))
    bcast = _table(semi_join(rd.from_arrow(left), rd.from_arrow(right),
                             left_key="k", right_key="rk", anti=True))
    rset = set(right["rk"].to_pylist())
    exp = left.filter(pa.array([k not in rset
                                for k in left["k"].to_pylist()]))
    for res in (got, bcast):
        assert res.num_rows == exp.num_rows
        assert sorted(zip(res["k"].to_pylist(),
                          res["payload"].to_pylist())) == \
            sorted(zip(exp["k"].to_pylist(), exp["payload"].to_pylist()))


def test_target_encode_loo_matches_naive(ray_session):
    from feature_extraction_ray.stages.groupstats import target_encode_loo
    rng = np.random.default_rng(29)
    n = 1000
    g = rng.integers(0, 40, n)          # some singleton groups likely
    x = rng.integers(0, 10000, n)
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x)})
    out = _table(target_encode_loo(rd.from_arrow(tbl), "g", "x",
                                   out_col="loo"))
    assert out.num_rows == n
    rows = out.to_pylist()
    sums = {gg: x[g == gg].sum() for gg in np.unique(g)}
    cnts = {gg: int((g == gg).sum()) for gg in np.unique(g)}
    for r in rows:
        gg, xx = r["g"], r["x"]
        if cnts[gg] == 1:
            assert r["loo"] is None
        else:
            assert r["loo"] == np.float64(int(sums[gg]) - xx) / np.float64(
                cnts[gg] - 1)


def test_contingency_chi2_matches_naive(ray_session):
    from feature_extraction_ray.stages.groupstats import contingency_chi2
    rng = np.random.default_rng(7)
    a = rng.choice(list("xyz"), 600, p=[0.5, 0.3, 0.2])
    b = rng.choice(list("pq"), 600, p=[0.6, 0.4])
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b)})
    out = _table(contingency_chi2(rd.from_arrow(tbl), "a", "b"))
    got = {(r["a"], r["b"]): r for r in out.to_pylist()}
    import collections
    obs = collections.Counter(zip(a, b))
    ra = collections.Counter(a)
    cb = collections.Counter(b)
    assert set(got) == set(obs)
    for (aa, bb), o in obs.items():
        e = (np.float64(ra[aa]) * np.float64(cb[bb])) / np.float64(600)
        d = np.float64(o) - e
        assert got[(aa, bb)]["observed"] == o
        assert got[(aa, bb)]["expected"] == e
        assert got[(aa, bb)]["chi2_contrib"] == d * d / e


@pytest.mark.parametrize("strategy", ["median", "mode"])
def test_impute_by_group_matches_naive(ray_session, strategy):
    from feature_extraction_ray.stages.groupstats import impute_by_group
    rng = np.random.default_rng(3)
    n = 600
    g = rng.integers(0, 8, n)
    v = np.round(rng.normal(0, 5, n), 1)
    null = rng.random(n) < 0.25
    g = np.r_[g, [99, 99]]              # an all-null group stays null
    v = np.r_[v, [0.0, 0.0]]
    null = np.r_[null, [True, True]]
    ids = np.arange(len(g))
    tbl = pa.table({"id": pa.array(ids), "g": pa.array(g),
                    "v": pa.array(np.where(null, np.nan, v),
                                  from_pandas=False)})
    # build with real nulls (NaN sentinel -> null)
    vcol = pa.array([None if nu else float(vv)
                     for vv, nu in zip(v, null)], type=pa.float64())
    tbl = pa.table({"id": pa.array(ids), "g": pa.array(g), "v": vcol})
    out = _table(impute_by_group(rd.from_arrow(tbl), "g", "v",
                                 strategy=strategy, num_buckets=4))
    got = {r["id"]: r["v_filled"] for r in out.to_pylist()}
    for gg in np.unique(g):
        vals = sorted(v[(g == gg) & ~null])
        if strategy == "median":
            fill = vals[max(1, int(np.ceil(0.5 * len(vals)))) - 1] \
                if vals else None
        else:
            from collections import Counter
            c = Counter(vals)
            fill = min(c, key=lambda k: (-c[k], k)) if vals else None
        for i in ids[g == gg]:
            exp = fill if null[i] else v[i]
            if exp is None:
                assert got[i] is None
            else:
                assert got[i] == exp, (strategy, gg, i)


def test_cusum_matches_recursive_definition(ray_session):
    from feature_extraction_ray.stages.window import cusum
    rng = np.random.default_rng(31)
    n = 900
    u = rng.integers(0, 13, n)
    o = rng.permutation(n)
    v = rng.integers(-40, 90, n)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "o": pa.array(o),
                                 "v": pa.array(v)}))
    out = _table(cusum(ds, "u", ["o"], "v", k=20, h=150, num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    state = {}
    for r in rows:
        s = max(0, state.get(r["u"], 0) + (r["v"] - 20))
        state[r["u"]] = s
        assert r["cusum"] == s, r
        assert r["drift_flag"] == (s > 150)


def test_cusum_single_row_runs_and_negatives(ray_session):
    from feature_extraction_ray.stages.window import cusum
    # one-row runs (doubling scan must handle max_pos == 0) and a run
    # that dives negative then recovers
    ds = rd.from_arrow(pa.table({
        "u": pa.array([1, 2, 2, 2, 2]),
        "o": pa.array([0, 0, 1, 2, 3]),
        "v": pa.array([100, -50, -50, 200, 10])}))
    out = _table(cusum(ds, "u", ["o"], "v", k=0, h=120, num_buckets=2))
    got = {(r["u"], r["o"]): (r["cusum"], r["drift_flag"])
           for r in out.to_pylist()}
    assert got == {(1, 0): (100, False), (2, 0): (0, False),
                   (2, 1): (0, False), (2, 2): (200, True),
                   (2, 3): (210, True)}


def test_interpolate_linear_matches_bruteforce(ray_session):
    from feature_extraction_ray.stages.window import interpolate_linear
    rng = np.random.default_rng(5)
    n = 1500
    e = rng.integers(0, 19, n)
    x = rng.integers(0, 10**6, n)
    v = rng.uniform(-10, 10, n)
    null = rng.random(n) < 0.35
    varr = pa.array(np.where(null, 0.0, v), mask=null)
    ds = rd.from_arrow(pa.table({"e": pa.array(e), "x": pa.array(x),
                                 "v": varr,
                                 "rid": pa.array(np.arange(n))}))
    out = _table(interpolate_linear(ds, "e", ["x", "rid"], "v", "x",
                                    num_buckets=4)).to_pandas()
    out = out.sort_values(["e", "x", "rid"]).reset_index(drop=True)
    import pandas as pd
    df = pd.DataFrame({"e": e, "x": x, "v": np.where(null, np.nan, v),
                       "rid": np.arange(n)})
    df = df.sort_values(["e", "x", "rid"]).reset_index(drop=True)
    exp = []
    for _, g in df.groupby("e", sort=True):
        vv, xx = g["v"].values, g["x"].values
        res = vv.copy()
        for i in range(len(vv)):
            if np.isnan(vv[i]):
                p = next((j for j in range(i - 1, -1, -1)
                          if not np.isnan(vv[j])), None)
                q = next((j for j in range(i + 1, len(vv))
                          if not np.isnan(vv[j])), None)
                if p is not None and q is not None:
                    xd = xx[q] - xx[p]
                    res[i] = vv[p] if xd == 0 else vv[p] + \
                        (vv[q] - vv[p]) * (float(xx[i] - xx[p]) / float(xd))
        exp.extend(res)
    exp = np.array(exp)
    got = out["value_interp"].values
    both_nan = np.isnan(got) & np.isnan(exp)
    assert ((got == exp) | both_nan).all()


def test_interpolate_linear_edges(ray_session):
    from feature_extraction_ray.stages.window import interpolate_linear
    # leading/trailing nulls stay null; tied-x degenerate span -> v_prev;
    # all-null entity stays all-null
    v = pa.array([None, 1.0, None, 3.0, None,   None, None],
                 type=pa.float64())
    ds = rd.from_arrow(pa.table({
        "e": pa.array([1, 1, 1, 1, 1, 2, 2]),
        "x": pa.array([0, 10, 10, 10, 30, 0, 5]),
        "rid": pa.array([0, 1, 2, 3, 4, 5, 6]), "v": v}))
    out = _table(interpolate_linear(ds, "e", ["x", "rid"], "v", "x",
                                    num_buckets=2))
    got = {r["rid"]: r["value_interp"] for r in out.to_pylist()}
    assert got[0] is None and got[4] is None          # boundary nulls
    assert got[2] == 1.0                               # tied-x -> v_prev
    assert got[1] == 1.0 and got[3] == 3.0             # pass-through
    assert got[5] is None and got[6] is None           # all-null entity


def test_rle_runs_matches_bruteforce(ray_session):
    from feature_extraction_ray.stages.window import rle_runs
    rng = np.random.default_rng(11)
    n = 1200
    e = rng.integers(0, 9, n)
    o = rng.permutation(n)
    v = rng.choice(["a", "b", None], n, p=[0.45, 0.45, 0.1])
    ds = rd.from_arrow(pa.table({
        "e": pa.array(e), "o": pa.array(o), "v": pa.array(v),
        "id": pa.array(np.arange(n))}))
    out = rle_runs(ds, "e", ["o"], "v", "id",
                   num_buckets=4).to_pandas()
    import pandas as pd
    df = pd.DataFrame({"e": e, "o": o, "v": v,
                       "id": np.arange(n)}).sort_values(["e", "o"])
    exp = []
    for ee, g in df.groupby("e"):
        runs = []
        for _, r in g.iterrows():
            same = runs and ((runs[-1]["v"] == r["v"]) or
                             (runs[-1]["v"] is None and r["v"] is None))
            if same:
                runs[-1]["len"] += 1
                runs[-1]["end"] = r["id"]
            else:
                runs.append({"v": r["v"], "len": 1,
                             "start": r["id"], "end": r["id"]})
        for i, rr in enumerate(runs):
            exp.append((ee, rr["v"], i + 1, rr["len"],
                        rr["start"], rr["end"]))
    expdf = pd.DataFrame(exp, columns=["e", "v", "run_idx", "run_len",
                                       "start_id", "end_id"])
    got = out.sort_values(["e", "run_idx"]).reset_index(drop=True)
    expdf = expdf.sort_values(["e", "run_idx"]).reset_index(drop=True)
    assert len(got) == len(expdf)
    for c in ["e", "run_idx", "run_len", "start_id", "end_id"]:
        assert (got[c].values == expdf[c].values).all(), c
    gv = got["v"].where(got["v"].notna(), None)
    ev = expdf["v"].where(expdf["v"].notna(), None)
    assert (gv.values == ev.values).all()


def test_cohort_retention_hand_computed(ray_session):
    from feature_extraction_ray.stages.relational import cohort_retention
    import datetime as dt
    # u1 first active 2024-01 (months 01,02,04); u2 2024-02 (02,02,03);
    # u3 2024-01 only
    ts = [dt.datetime(2024, 1, 5), dt.datetime(2024, 2, 10),
          dt.datetime(2024, 4, 1),
          dt.datetime(2024, 2, 2), dt.datetime(2024, 2, 20),
          dt.datetime(2024, 3, 3),
          dt.datetime(2024, 1, 31)]
    u = [1, 1, 1, 2, 2, 2, 3]
    ds = rd.from_arrow(pa.table({
        "u": pa.array(u),
        "ts": pa.array(ts, type=pa.timestamp("us"))}))
    out = cohort_retention(ds, "u", "ts", freq="month", num_buckets=2)
    got = {(r["cohort_ym"], r["month_offset"]): r["n_users"]
           for r in out.take_all()}
    assert got == {(202401, 0): 2, (202401, 1): 1, (202401, 3): 1,
                   (202402, 0): 1, (202402, 1): 1}
    # day granularity: u1 days 0,1 ; u2 day 1 only
    ts2 = [dt.datetime(1970, 1, 1, 5), dt.datetime(1970, 1, 2, 23),
           dt.datetime(1970, 1, 2, 1), dt.datetime(1970, 1, 2, 2)]
    ds2 = rd.from_arrow(pa.table({
        "u": pa.array([1, 1, 2, 2]),
        "ts": pa.array(ts2, type=pa.timestamp("us"))}))
    out2 = cohort_retention(ds2, "u", "ts", freq="day", num_buckets=2)
    got2 = {(r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in out2.take_all()}
    assert got2 == {(0, 0): 1, (0, 1): 1, (1, 0): 1}
    with pytest.raises(ValueError):
        cohort_retention(ds2, "u", "ts", freq="week")


def test_apply_changes_merge_semantics(ray_session):
    from feature_extraction_ray.stages.relational import apply_changes
    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5]),
        "v": pa.array(["a", "b", "c", "d", "e"]),
        "x": pa.array([1.5, 2.5, 3.5, 4.5, 5.5])}))
    ch = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 6]),
        "v": pa.array(["B", "d", "f"]),
        "x": pa.array([-2.0, 4.5, 6.5]),
        "op": pa.array(["U", "D", "I"])}))
    out = apply_changes(base, ch, "k", num_buckets=3).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 5, 6]
    assert out["v"].tolist() == ["a", "B", "c", "e", "f"]
    assert out["x"].tolist() == [1.5, -2.0, 3.5, 5.5, 6.5]
    # inverse property: applying snapshot_diff's changes recovers `new`
    # (U for changed, D for removed, I for added)
    dup = rd.from_arrow(pa.table({
        "k": pa.array([2, 2]), "v": pa.array(["x", "y"]),
        "x": pa.array([0.0, 0.0]), "op": pa.array(["U", "U"])}))
    with pytest.raises(Exception):
        apply_changes(base, dup, "k", num_buckets=1).materialize()


def test_update_grouped_sums_delta_equals_recompute(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        update_grouped_sums)
    state = rd.from_arrow(pa.table({
        "g": pa.array(["a", "b", "c"]),
        "sum_v": pa.array([10, 7, 3], type=pa.int64()),
        "n": pa.array([2, 3, 1], type=pa.int64())}))
    # retract c entirely (group vanishes), retract 4 from a, insert
    # into b and a brand-new group d
    ch = rd.from_arrow(pa.table({
        "g": pa.array(["c", "a", "b", "d"]),
        "v": pa.array([3, 4, 5, 9], type=pa.int64()),
        "op": pa.array(["D", "D", "I", "I"])}))
    out = update_grouped_sums(state, ch, "g", "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == ["a", "b", "d"]
    assert out["sum_v"].tolist() == [6, 12, 9]
    assert out["n"].tolist() == [1, 4, 1]


def test_drawdown_matches_recursive_definition(ray_session):
    from feature_extraction_ray.stages.window import drawdown
    rng = np.random.default_rng(41)
    n = 800
    u = rng.integers(0, 11, n)
    o = rng.permutation(n)
    v = rng.integers(-60, 60, n)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "o": pa.array(o),
                                 "v": pa.array(v)}))
    out = _table(drawdown(ds, "u", ["o"], "v", num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    bal, peak = {}, {}
    for r in rows:
        b = bal.get(r["u"], 0) + r["v"]
        bal[r["u"]] = b
        p = max(peak.get(r["u"], -10**18), b)
        peak[r["u"]] = p
        assert r["drawdown"] == p - b, r


def test_zorder_key_interleave_and_locality(ray_session):
    from feature_extraction_ray.stages.partition import (zorder_key,
                                                         zorder_sql_expr)
    # hand-checked interleave: x=0b101, y=0b011 -> z = x bits at even
    # positions, y at odd: 0b010111? compute: x0=1@0,y0=1@1,x1=0@2,
    # y1=1@3,x2=1@4,y2=0@5 -> 0b011011 = 27... verify both engines
    ds = rd.from_arrow(pa.table({"x": pa.array([5, 0, 7]),
                                 "y": pa.array([3, 0, 7])}))
    out = zorder_key(ds, ["x", "y"], bits=3).to_pandas()
    assert out["zkey"].tolist() == [0b011011, 0, 0b111111]
    import duckdb
    expr = zorder_sql_expr(["x", "y"], 3)
    exp = duckdb.sql(
        f"SELECT {expr} AS z FROM (VALUES (5,3),(0,0),(7,7)) t(x,y)"
    ).df()["z"].tolist()
    assert out["zkey"].tolist() == exp
    # out-of-range raises
    bad = rd.from_arrow(pa.table({"x": pa.array([8]), "y": pa.array([0])}))
    with pytest.raises(Exception):
        zorder_key(bad, ["x", "y"], bits=3).materialize()
    with pytest.raises(ValueError):
        zorder_key(ds, ["x", "y", "x", "y"], bits=16)
    # locality: z-sorted chunks have tighter 2-D bounding boxes
    rng = np.random.default_rng(3)
    n = 4000
    xy = pa.table({"x": pa.array(rng.integers(0, 1 << 10, n)),
                   "y": pa.array(rng.integers(0, 1 << 10, n))})
    z = zorder_key(rd.from_arrow(xy), ["x", "y"], bits=10).to_pandas()

    def area(df):
        tot = 0
        for i in range(0, len(df), 100):
            c = df.iloc[i:i + 100]
            tot += (c["x"].max() - c["x"].min()) * \
                (c["y"].max() - c["y"].min())
        return tot
    assert area(z.sort_values("zkey").reset_index(drop=True)) < \
        area(z) / 5


def test_welch_ttest_matches_scipy_formula(ray_session):
    from feature_extraction_ray.stages.groupstats import welch_ttest
    rng = np.random.default_rng(17)
    n = 1000
    g = rng.integers(0, 4, n)
    arm = rng.integers(0, 2, n)
    v = rng.integers(0, 500, n) + arm * (g == 2) * 50  # planted effect
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "arm": pa.array(arm),
                                 "v": pa.array(v)}))
    out = {r["g"]: r for r in
           welch_ttest(ds, "g", "v", "arm").take_all()}
    for gg in range(4):
        a = v[(g == gg) & (arm == 0)].astype(float)
        b = v[(g == gg) & (arm == 1)].astype(float)
        m0, m1 = a.mean(), b.mean()
        v0, v1 = a.var(ddof=1), b.var(ddof=1)
        se = v0 / len(a) + v1 / len(b)
        t_ref = (m1 - m0) / np.sqrt(se)
        df_ref = se * se / ((v0 / len(a)) ** 2 / (len(a) - 1)
                            + (v1 / len(b)) ** 2 / (len(b) - 1))
        r = out[gg]
        assert r["n0"] == len(a) and r["n1"] == len(b)
        assert r["t_stat"] == pytest.approx(t_ref, abs=1e-9)
        assert r["df"] == pytest.approx(df_ref, rel=1e-9)
    # planted effect detected in group 2, absent elsewhere
    assert abs(out[2]["t_stat"]) > 3
    # degenerate arm -> null stats
    ds2 = rd.from_arrow(pa.table({"g": pa.array([0, 0, 0]),
                                  "arm": pa.array([0, 0, 1]),
                                  "v": pa.array([1, 2, 3])}))
    r2 = welch_ttest(ds2, "g", "v", "arm").take_all()[0]
    assert r2["t_stat"] is None and r2["df"] is None


def test_grouped_distinct_count_matches_bruteforce(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        grouped_distinct_count)
    rng = np.random.default_rng(19)
    n = 1500
    g = rng.integers(0, 12, n)
    v = rng.choice([f"u{i}" for i in range(40)], n)
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)}))
    out = {r["g"]: r["n_distinct"] for r in
           grouped_distinct_count(ds, "g", "v",
                                  num_buckets=4).take_all()}
    import pandas as pd
    exp = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    assert out == exp.to_dict()


def test_sliding_slope_matches_polyfit(ray_session):
    from feature_extraction_ray.stages.window import sliding_slope
    rng = np.random.default_rng(23)
    n = 600
    u = rng.integers(0, 7, n)
    o = rng.permutation(n)
    v = rng.integers(-100, 100, n)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "o": pa.array(o),
                                 "v": pa.array(v)}))
    out = _table(sliding_slope(ds, "u", ["o"], "v", window=5,
                               num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    hist = {}
    for r in rows:
        hist.setdefault(r["u"], []).append(r["v"])
        ys = hist[r["u"]][-5:]
        if len(ys) == 1:
            assert r["slope"] is None
        else:
            xs = np.arange(len(hist[r["u"]]) - len(ys),
                           len(hist[r["u"]])) + 1.0
            ref = np.polyfit(xs, np.array(ys, dtype=float), 1)[0]
            assert r["slope"] == pytest.approx(ref, abs=1e-9), r


def test_snapshot_at_reconstruction(ray_session):
    from feature_extraction_ray.stages.relational import snapshot_at
    # key 1: I@1 v=10, U@5 v=20, D@9 ; key 2: I@3 v=30 ; key 3: D@2
    log = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3]),
        "seq": pa.array([1, 5, 9, 3, 2]),
        "v": pa.array([10, 20, 0, 30, 0]),
        "op": pa.array(["I", "U", "D", "I", "D"])}))

    def snap(t):
        out = snapshot_at(log, "k", "seq", t, num_buckets=2).to_pandas()
        return {r.k: r.v for r in out.itertuples()}

    assert snap(0) == {}
    assert snap(1) == {1: 10}
    assert snap(4) == {1: 10, 2: 30}          # key 3 deleted at 2
    assert snap(6) == {1: 20, 2: 30}          # update wins
    assert snap(9) == {2: 30}                 # key 1 deleted at 9


def test_sliding_corr_matches_numpy(ray_session):
    from feature_extraction_ray.stages.window import sliding_corr
    rng = np.random.default_rng(29)
    n = 500
    u = rng.integers(0, 6, n)
    o = rng.permutation(n)
    x = rng.integers(0, 1000, n)
    y = x // 2 + rng.integers(-100, 100, n)   # correlated with noise
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "o": pa.array(o),
                                 "x": pa.array(x), "y": pa.array(y)}))
    out = _table(sliding_corr(ds, "u", ["o"], "x", "y", window=6,
                              num_buckets=4))
    rows = sorted(out.to_pylist(), key=lambda r: (r["u"], r["o"]))
    hist = {}
    for r in rows:
        hist.setdefault(r["u"], []).append((r["x"], r["y"]))
        w = hist[r["u"]][-6:]
        xs = np.array([a for a, _ in w], dtype=float)
        ys = np.array([b for _, b in w], dtype=float)
        if len(w) < 2 or xs.std() == 0 or ys.std() == 0:
            assert r["corr"] is None, r
        else:
            ref = np.corrcoef(xs, ys)[0, 1]
            assert r["corr"] == pytest.approx(ref, abs=1e-9), r
    # constant-side windows emit null
    ds2 = rd.from_arrow(pa.table({
        "u": pa.array([1, 1, 1]), "o": pa.array([0, 1, 2]),
        "x": pa.array([5, 5, 5]), "y": pa.array([1, 2, 3])}))
    out2 = _table(sliding_corr(ds2, "u", ["o"], "x", "y", window=3,
                               num_buckets=2))
    assert all(r["corr"] is None for r in out2.to_pylist())


def test_churn_labels_hand_computed(ray_session):
    import datetime as dt
    from feature_extraction_ray.stages.groupstats import churn_labels
    # u1 active days 0, 1, 5 (gap 4 > 2 -> day1 churned; day5 last ->
    # churned); u2 active days 0, 2 (gap 2 <= 2 -> retained)
    ts = [dt.datetime(1970, 1, 1, 3), dt.datetime(1970, 1, 1, 9),
          dt.datetime(1970, 1, 2), dt.datetime(1970, 1, 6),
          dt.datetime(1970, 1, 1), dt.datetime(1970, 1, 3)]
    u = [1, 1, 1, 1, 2, 2]
    ds = rd.from_arrow(pa.table({
        "u": pa.array(u), "ts": pa.array(ts, type=pa.timestamp("us"))}))
    out = {(r["u"], r["day"]): r["churned"]
           for r in churn_labels(ds, "u", "ts", horizon_days=2,
                                 num_buckets=2).take_all()}
    assert out == {(1, 0): False, (1, 1): True, (1, 5): True,
                   (2, 0): False, (2, 2): True}


def test_kaplan_meier_hand_computed(ray_session):
    import datetime as dt
    from feature_extraction_ray.stages.groupstats import kaplan_meier
    # lifetimes (days): u1=0, u2=0, u3=2, u4=5  ->
    # t=0: n=4 d=2 S=1/2 ; t=2: n=2 d=1 S=1/4 ; t=5: n=1 d=1 S=0
    base = dt.datetime(1970, 1, 1)
    rows = [(1, 0), (1, 0), (2, 0), (2, 0), (3, 0), (3, 2),
            (4, 0), (4, 5)]
    ds = rd.from_arrow(pa.table({
        "u": pa.array([u for u, _ in rows]),
        "ts": pa.array([base + dt.timedelta(days=d) for _, d in rows],
                       type=pa.timestamp("us"))}))
    out = {r["dur"]: r for r in
           kaplan_meier(ds, "u", "ts").take_all()}
    assert out[0]["n"] == 4 and out[0]["d"] == 2
    assert out[0]["survival"] == pytest.approx(0.5, abs=1e-12)
    assert out[2]["n"] == 2 and out[2]["d"] == 1
    assert out[2]["survival"] == pytest.approx(0.25, abs=1e-12)
    assert out[5]["n"] == 1 and out[5]["d"] == 1
    assert out[5]["survival"] == 0.0


def test_prorate_by_group_exact_and_proportional(ray_session):
    from feature_extraction_ray.stages.groupstats import prorate_by_group
    rng = np.random.default_rng(3)
    n = 1000
    g = rng.integers(0, 30, n)
    w = rng.integers(1, 50, n)
    tot = {k: int(rng.integers(100, 100000)) for k in range(30)}
    total = np.array([tot[k] for k in g])
    ds = rd.from_arrow(pa.table({
        "g": pa.array(g), "w": pa.array(w),
        "total": pa.array(total), "ln": pa.array(np.arange(n))}))
    out = prorate_by_group(ds, "g", "w", "total", ["ln"],
                           num_buckets=4).to_pandas()
    sums = out.groupby("g")["alloc"].sum()
    for k in range(30):
        assert sums[k] == tot[k]                    # EXACT totals
        sub = out[out["g"] == k]
        ideal = tot[k] * sub["w"].values / sub["w"].sum()
        assert (np.abs(sub["alloc"].values - ideal) < 1.0).all()
    # hand case incl. largest-remainder tie -> first line wins
    ds2 = rd.from_arrow(pa.table({
        "g": pa.array([1, 1, 1]), "w": pa.array([1, 1, 1]),
        "total": pa.array([100, 100, 100]),
        "ln": pa.array([0, 1, 2])}))
    out2 = prorate_by_group(ds2, "g", "w", "total", ["ln"],
                            num_buckets=2).to_pandas() \
        .sort_values("ln")
    assert out2["alloc"].tolist() == [34, 33, 33]


def test_psi_by_group_detects_planted_drift(ray_session):
    from feature_extraction_ray.stages.groupstats import psi_by_group
    rng = np.random.default_rng(7)
    n = 4000
    g = np.where(np.arange(n) % 2 == 0, "stable", "drifted")
    arm = rng.integers(0, 2, n)
    v = rng.integers(0, 1000, n)
    # plant a big shift in the drifted group's comparison arm
    v = np.where((g == "drifted") & (arm == 1), v + 700, v)
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v),
                                 "arm": pa.array(arm)}))
    out = {r["g"]: r for r in
           psi_by_group(ds, "g", "v", "arm").take_all()}
    assert out["stable"]["psi"] < 0.1          # industry "no drift" bar
    assert out["drifted"]["psi"] > 0.5         # strong drift flagged
    assert out["stable"]["n_ref"] + out["stable"]["n_cmp"] == \
        int((g == "stable").sum())


def test_gini_by_group_known_values(ray_session):
    from feature_extraction_ray.stages.groupstats import gini_by_group
    # perfect equality -> 0 ; extreme concentration -> (n-1)/n
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["eq"] * 4 + ["conc"] * 4 + ["mix"] * 4
                      + ["solo"]),
        "v": pa.array([5, 5, 5, 5, 0, 0, 0, 100, 1, 2, 3, 4, 9])}))
    out = {r["g"]: r for r in gini_by_group(ds, "g", "v",
                                            num_buckets=2).take_all()}
    assert out["eq"]["gini"] == 0.0
    assert out["conc"]["gini"] == pytest.approx(3 / 4, abs=1e-15)
    # hand: sorted 1,2,3,4 -> num = (2-5)*1+(4-5)*2+(6-5)*3+(8-5)*4=10
    # den = 4*10=40 -> 0.25
    assert out["mix"]["gini"] == 0.25
    assert out["solo"]["gini"] is None          # n < 2 -> null


def test_benford_test_detects_conformance(ray_session):
    from feature_extraction_ray.stages.groupstats import benford_test
    rng = np.random.default_rng(5)
    # log-uniform values follow Benford; uniform values violate it
    benford_v = np.exp(rng.uniform(np.log(10), np.log(10**6),
                                   4000)).astype(np.int64)
    uniform_v = rng.integers(10**5, 2 * 10**5, 4000)
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["benford"] * 4000 + ["uniform"] * 4000),
        "v": pa.array(np.r_[benford_v, uniform_v])}))
    out = {r["g"]: r for r in benford_test(ds, "g", "v").take_all()}
    # chi2 critical value at 8 df / p=0.001 is 26.1
    assert out["benford"]["chi2"] < 26.1
    assert out["uniform"]["chi2"] > 1000
    assert out["benford"]["n"] == 4000


def test_golden_record_survivorship(ray_session):
    from feature_extraction_ray.stages.relational import golden_record
    # key 1: a's last non-null at t=3, b's last non-null at t=2
    # (columns survive from DIFFERENT rows); key 2 all-null b
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2]),
        "t": pa.array([1, 2, 3, 1]),
        "a": pa.array(["x", "y", "z", "q"]),
        "b": pa.array([10.0, 20.0, None, None])}))
    out = {r["k"]: r for r in
           golden_record(ds, "k", ["t"], ["a", "b"],
                         num_buckets=2).take_all()}
    assert out[1]["a"] == "z" and out[1]["b"] == 20.0
    assert out[2]["a"] == "q" and out[2]["b"] is None


def test_weighted_median_by_group_convention(ray_session):
    from feature_extraction_ray.stages.groupstats import (
        weighted_median_by_group)
    # g1: values 1(w5) 2(w1) 3(w1): W=7, 2*5 >= 7 at v=1 -> median 1
    # g2: values 1(w1) 2(w1): W=2, 2*1 >= 2 at v=1 -> lower median 1
    # g3: all-zero weights -> null
    ds = rd.from_arrow(pa.table({
        "g": pa.array(["g1", "g1", "g1", "g2", "g2", "g3"]),
        "v": pa.array([1, 2, 3, 1, 2, 9]),
        "w": pa.array([5, 1, 1, 1, 1, 0])}))
    out = {r["g"]: r for r in
           weighted_median_by_group(ds, "g", "v", "w",
                                    num_buckets=2).take_all()}
    assert out["g1"]["w_median"] == 1 and out["g1"]["w_total"] == 7
    assert out["g2"]["w_median"] == 1
    assert out["g3"]["w_median"] is None
    # fuzz vs brute force
    rng = np.random.default_rng(37)
    n = 800
    g = rng.integers(0, 8, n)
    v = rng.integers(0, 100, n)
    w = rng.integers(1, 20, n)
    ds2 = rd.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v),
                                  "w": pa.array(w)}))
    out2 = {r["g"]: r["w_median"] for r in
            weighted_median_by_group(ds2, "g", "v", "w",
                                     num_buckets=4).take_all()}
    for k in range(8):
        vs, ws = v[g == k], w[g == k]
        order = np.argsort(vs, kind="stable")
        cw = np.cumsum(ws[order])
        ref = vs[order][np.flatnonzero(2 * cw >= cw[-1])[0]]
        assert out2[k] == ref, k


def test_update_grouped_sums_exact_past_2_53(ray_session):
    """ADVICE round-3: float64 bincount weights silently rounded sums
    beyond 2^53; int64 np.add.at accumulation must stay exact."""
    from feature_extraction_ray.stages.groupstats import update_grouped_sums
    big = (1 << 53) + 1           # not representable in float64
    state = rd.from_arrow(pa.table({
        "g": pa.array(["a"]),
        "sum_v": pa.array([0], type=pa.int64()),
        "n": pa.array([0], type=pa.int64())}))
    ch = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a"]),
        "v": pa.array([big, 2], type=pa.int64()),
        "op": pa.array(["I", "I"])}))
    out = update_grouped_sums(state, ch, "g", "v").to_pandas()
    assert out["sum_v"].tolist() == [big + 2]     # float64 would give big+2±1
