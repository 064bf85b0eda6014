"""Distributed PCA (similarity.pca_fit/pca_transform) vs a single-
process numpy reference, and the broadcast range-lookup join."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.relational import range_lookup_join
from feature_extraction_ray.stages.similarity import pca_fit, pca_transform


def _vec_ds(m: np.ndarray, nparts: int = 5):
    t = pa.table({"vec_id": pa.array(np.arange(len(m)), pa.int64()),
                  "embedding": pa.array(list(m.astype(np.float32)))})
    return rd.from_arrow(t).repartition(nparts)


def test_pca_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(0)
    # anisotropic cloud: variance concentrated on two known axes
    base = rng.normal(size=(400, 6)) * np.array([10, 5, 1, .5, .1, .05])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = (base @ rot + rng.normal(size=6) * 3).astype(np.float32)
    model = pca_fit(_vec_ds(x), k=3)
    xf = x.astype(np.float64)
    mu = xf.mean(axis=0)
    cov = (xf - mu).T @ (xf - mu) / len(xf)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert np.allclose(model["mean"], mu, atol=1e-6)
    assert np.allclose(model["explained_var"], evals[order], rtol=1e-6)
    for i in range(3):       # components match up to sign
        got, exp = model["components"][i], evecs[:, order[i]]
        assert (np.allclose(got, exp, atol=1e-6)
                or np.allclose(got, -exp, atol=1e-6)), i
    # variance ordering + the planted spectrum dominates
    ev = model["explained_var"]
    assert ev[0] > ev[1] > ev[2] > 0
    assert ev[0] / model["total_var"] > 0.7


def test_pca_transform_and_whiten(ray_session):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 5)).astype(np.float32) * \
        np.array([8, 4, 2, 1, .5], dtype=np.float32)
    ds = _vec_ds(x)
    model = pca_fit(ds, k=5)
    out = pca_transform(ds, model, out_col="pca").to_pandas() \
        .sort_values("vec_id")
    y = np.stack(out["pca"].to_numpy())
    exp = (x.astype(np.float64) - model["mean"]) @ model["components"].T
    assert np.allclose(y, exp, atol=1e-9)
    # projected covariance is diagonal with the eigenvalues
    pcov = y.T @ y / len(y) - np.outer(y.mean(0), y.mean(0))
    assert np.allclose(np.diag(pcov), model["explained_var"], rtol=1e-6)
    assert np.allclose(pcov - np.diag(np.diag(pcov)), 0, atol=1e-6)
    # whitening gives unit variance per component
    w = pca_transform(ds, model, out_col="pca", whiten=True) \
        .to_pandas().sort_values("vec_id")
    yw = np.stack(w["pca"].to_numpy())
    assert np.allclose(yw.var(axis=0, ddof=0), 1.0, rtol=1e-5)


def test_pca_real_embeddings_sign_deterministic(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    m1 = pca_fit(ds, k=4)
    m2 = pca_fit(ds, k=4)
    # refit agrees to reduction-order tolerance incl. signs
    assert np.allclose(m1["components"], m2["components"], atol=1e-9)
    assert np.allclose(m1["explained_var"], m2["explained_var"],
                       rtol=1e-9)


def _ranges():
    return rd.from_arrow(pa.table({
        "lo": pa.array([0.0, 10.0, 25.0, 70.0], pa.float64()),
        "hi": pa.array([10.0, 25.0, 70.0, 200.0], pa.float64()),
        "tier_id": pa.array([0, 1, 2, 3], pa.int64()),
        "tier": pa.array(["a", "b", "c", "d"])}))


def test_range_lookup_left_and_inner(ray_session):
    vals = [5.0, 10.0, 24.999, 25.0, 199.999, 200.0, -1.0, 300.0]
    facts = rd.from_arrow(pa.table({
        "fid": pa.array(range(len(vals)), pa.int64()),
        "v": pa.array(vals, pa.float64())}))
    out = range_lookup_join(facts, _ranges(), value_col="v",
                            lo_col="lo", hi_col="hi",
                            range_value_cols=["tier_id", "tier"],
                            how="left").to_pandas().sort_values("fid")
    # half-open [lo, hi): 10 -> tier b, 25 -> tier c, 200/-1/300 -> null
    assert out["tier"].tolist()[:6] == ["a", "b", "b", "c", "d", None]
    assert out["tier"].isna().tolist() == [False] * 5 + [True] * 3
    inner = range_lookup_join(facts, _ranges(), value_col="v",
                              lo_col="lo", hi_col="hi",
                              range_value_cols=["tier"],
                              how="inner").to_pandas()
    assert len(inner) == 5 and inner["tier"].notna().all()


def test_range_lookup_rejects_overlap(ray_session):
    bad = rd.from_arrow(pa.table({
        "lo": pa.array([0.0, 5.0], pa.float64()),
        "hi": pa.array([10.0, 15.0], pa.float64()),
        "t": pa.array(["x", "y"])}))
    facts = rd.from_arrow(pa.table({"v": pa.array([1.0], pa.float64())}))
    with pytest.raises(ValueError):
        range_lookup_join(facts, bad, value_col="v", lo_col="lo",
                          hi_col="hi", range_value_cols=["t"])


def test_zonemapped_write_prune_roundtrip(ray_session, tmp_path):
    import duckdb
    from feature_extraction_ray.sources.writers import (read_zonemapped,
                                                        write_zonemapped)
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "ts", "value"])
    out = str(tmp_path / "zm")
    man = write_zonemapped(ev, out, "value")
    assert man["sort_col"] == "value" and len(man["files"]) > 3
    # zones are disjoint-ish (sorted layout): mins are nondecreasing
    mins = [f["min"] for f in man["files"]]
    assert mins == sorted(mins)
    assert sum(f["rows"] for f in man["files"]) == ev.count()
    # pruned read: narrow range touches a strict subset of files and
    # returns exactly the filtered rows
    lo, hi = 10.0, 20.0
    ds, n_read, n_total = read_zonemapped(out, lo=lo, hi=hi)
    assert 0 < n_read < n_total
    got = ds.to_pandas()
    got = got[(got["value"] >= lo) & (got["value"] <= hi)]
    exp = duckdb.sql(
        f"SELECT event_id FROM '{sf}/events.parquet' "
        f"WHERE value BETWEEN {lo} AND {hi}").df()
    assert sorted(got["event_id"]) == sorted(exp["event_id"])
    # no-bound read returns everything from all files
    full, n_read2, _ = read_zonemapped(out)
    assert n_read2 == n_total and full.count() == ev.count()
    # empty-range read prunes everything
    nothing, n0, _ = read_zonemapped(out, lo=1e17, hi=2e17)
    assert n0 == 0 and nothing.count() == 0


def test_zonemapped_merge_join_equals_hash_join(ray_session, tmp_path):
    from feature_extraction_ray.sources.writers import (
        write_zonemapped, zonemapped_merge_join)
    from feature_extraction_ray.stages.relational import hash_join
    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    line = rd.read_parquet(f"{sf}/lineitem.parquet",
                           columns=["l_orderkey", "l_linenumber",
                                    "l_quantity"])
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    write_zonemapped(line, ldir, "l_orderkey")
    write_zonemapped(orders, rdir, "o_orderkey")
    smb = zonemapped_merge_join(ldir, rdir).to_pandas()
    exp = hash_join(line, orders, left_key="l_orderkey",
                    right_key="o_orderkey", how="inner",
                    num_buckets=16).to_pandas()
    cols = sorted(smb.columns)
    assert cols == sorted(exp.columns)
    a = smb[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # projected right side
    smb2 = zonemapped_merge_join(ldir, rdir,
                                 right_cols=["o_totalprice"]).to_pandas()
    assert sorted(smb2.columns) == ["l_linenumber", "l_orderkey",
                                    "l_quantity", "o_totalprice"]
    # mismatched sort key rejected
    with pytest.raises(ValueError):
        zonemapped_merge_join(ldir, rdir, right_key="o_custkey")


def test_zonemap_secondary_column_pruning(ray_session, tmp_path):
    import duckdb
    from feature_extraction_ray.sources.writers import (read_zonemapped,
                                                        write_zonemapped)
    sf = "/root/testdata/sf0.001"
    # sort by ts: event_id correlates with ts in the fixture, so
    # event_id zones also prune; value does not correlate -> no pruning
    # but still-correct results
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "ts", "value"])
    out = str(tmp_path / "zm2")
    man = write_zonemapped(ev, out, "ts")
    assert all("zones" in f and "value" in f["zones"]
               for f in man["files"])
    ds, n_read, n_total = read_zonemapped(out, lo=0, hi=100,
                                          pred_col="event_id")
    got = ds.to_pandas()
    got = got[(got["event_id"] >= 0) & (got["event_id"] <= 100)]
    exp = duckdb.sql(f"SELECT event_id FROM '{sf}/events.parquet' "
                     "WHERE event_id BETWEEN 0 AND 100").df()
    assert sorted(got["event_id"]) == sorted(exp["event_id"])
    # uncorrelated column: no pruning, still exact after residual filter
    ds2, n2, _ = read_zonemapped(out, lo=10.0, hi=11.0,
                                 pred_col="value")
    g2 = ds2.to_pandas()
    g2 = g2[(g2["value"] >= 10.0) & (g2["value"] <= 11.0)]
    e2 = duckdb.sql(f"SELECT event_id FROM '{sf}/events.parquet' "
                    "WHERE value BETWEEN 10.0 AND 11.0").df()
    assert sorted(g2["event_id"]) == sorted(e2["event_id"])
    import pytest as _pt
    with _pt.raises(KeyError):
        read_zonemapped(out, lo=0, hi=1, pred_col="no_such_col")


def test_scan_zonemapped_exact(ray_session, tmp_path):
    import duckdb
    from feature_extraction_ray.sources.writers import (scan_zonemapped,
                                                        write_zonemapped)
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "value"])
    out = str(tmp_path / "zm3")
    write_zonemapped(ev, out, "value")
    ds, n_read, n_total = scan_zonemapped(out, "value", 10.0, 20.0,
                                          columns=["event_id"])
    got = ds.to_pandas()
    assert list(got.columns) == ["event_id"]
    assert 0 < n_read < n_total
    exp = duckdb.sql(f"SELECT event_id FROM '{sf}/events.parquet' "
                     "WHERE value BETWEEN 10.0 AND 20.0").df()
    assert sorted(got["event_id"]) == sorted(exp["event_id"])


def test_zorder_zonemap_two_dimensional_pruning(ray_session, tmp_path):
    # the lakehouse OPTIMIZE ZORDER pattern: zonemapped layout sorted by
    # the Morton key makes BOTH raw dimensions' secondary zones tight,
    # so range predicates on EITHER column prune files
    import pyarrow.compute as pc2
    from feature_extraction_ray.sources.writers import (read_zonemapped,
                                                        write_zonemapped)
    from feature_extraction_ray.stages.partition import zorder_key
    ev = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["event_id", "user_id", "value"])

    def dims(t):
        # integerize both dims into the FULL [0, 1024) Morton domain:
        # sf0.01 has only 150 users, so unscaled user_id leaves its top
        # bits constant and the curve degenerates to one dimension
        vb = np.clip((t["value"].to_numpy(zero_copy_only=False)
                      * 10.0), 0, 1023).astype(np.int64)
        ub = t["user_id"].to_numpy(zero_copy_only=False) * 6
        return t.append_column("vbucket", pa.array(vb))                 .append_column("ubucket", pa.array(ub.astype(np.int64)))

    ds = zorder_key(ev.map_batches(dims, batch_format="pyarrow"),
                    ["ubucket", "vbucket"], bits=10)
    out = str(tmp_path / "zz")
    man = write_zonemapped(ds, out, "zkey")
    n_total = len(man["files"])
    assert n_total >= 8
    # prune on EACH raw dimension alone: both must skip files
    for col, lo, hi in (("ubucket", 0, 240), ("vbucket", 0, 240)):
        _, n_read, _ = read_zonemapped(out, lo=lo, hi=hi, pred_col=col)
        assert n_read < n_total, (col, n_read, n_total)
    # and results stay exact after the residual filter
    dsr, _, _ = read_zonemapped(out, lo=0, hi=240, pred_col="ubucket")
    got = dsr.to_pandas()
    got = got[(got["user_id"] >= 0) & (got["user_id"] <= 40)]
    import duckdb
    exp = duckdb.sql(
        "SELECT event_id FROM '/root/testdata/sf0.01/events.parquet' "
        "WHERE user_id BETWEEN 0 AND 40").df()
    assert sorted(got["event_id"]) == sorted(exp["event_id"])
