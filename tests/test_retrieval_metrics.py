"""Goldens for evalmetrics.retrieval_metrics (MRR/P@k/DCG/NDCG)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.evalmetrics import retrieval_metrics


def _mk(qid, did, s, rel):
    return pa.table({"qid": pa.array(np.asarray(qid, np.int64)),
                     "did": pa.array(np.asarray(did, np.int64)),
                     "s": pa.array(np.asarray(s, np.int64)),
                     "rel": pa.array(np.asarray(rel, np.int64))})


def _naive(df, k):
    rows = []
    for q, g in df.groupby("qid"):
        g = g.sort_values(["s", "did"],
                          ascending=[False, True]).reset_index(drop=True)
        rel = g["rel"].to_numpy()
        rk = np.arange(1, len(g) + 1)
        n_rel = int(rel.sum())
        first = int(rk[rel == 1][0]) if n_rel else None
        hits = int(rel[:k].sum())
        dcg = float((1.0 / np.log2(rk[:k] + 1))[rel[:k] == 1].sum())
        idcg = float((1.0 / np.log2(
            np.arange(1, min(k, n_rel) + 1) + 1)).sum()) if n_rel \
            else None
        rows.append({
            "qid": q, "n_cand": len(g), "n_rel": n_rel,
            "first_rel": first,
            "rr": 1.0 / first if first else None,
            "hits_k": hits, "p_at_k": hits / float(k),
            "r_at_k": hits / n_rel if n_rel else None,
            "dcg_k": dcg,
            "ndcg_k": dcg / idcg if n_rel else None})
    return pd.DataFrame(rows).sort_values("qid").reset_index(drop=True)


def test_hand_case(ray_session):
    # one query: ranked rel pattern [0,1,0,1,1] at k=3
    t = _mk([7] * 5, [1, 2, 3, 4, 5], [50, 40, 30, 20, 10],
            [0, 1, 0, 1, 1])
    out = retrieval_metrics(rd.from_arrow(t), "qid", "did", "s",
                            "rel", k=3).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_cand"], r["n_rel"], r["first_rel"],
            r["hits_k"]) == (5, 3, 2, 1)
    assert r["rr"] == 0.5
    assert r["p_at_k"] == 1.0 / 3.0
    assert r["r_at_k"] == 1.0 / 3.0
    assert abs(r["dcg_k"] - 1.0 / np.log2(3)) < 1e-12
    idcg = (1 / np.log2(2) + 1 / np.log2(3) + 1 / np.log2(4))
    assert abs(r["ndcg_k"] - (1.0 / np.log2(3)) / idcg) < 1e-12


def test_naive_parity_fuzz_layout_invariant(ray_session):
    rng = np.random.default_rng(23)
    n = 1200
    qid = rng.integers(0, 25, n)
    did = rng.permutation(n)
    s = rng.integers(-100, 100, n)
    rel = rng.integers(0, 2, n) * (rng.random(n) < 0.6)
    df = pd.DataFrame({"qid": qid, "did": did, "s": s,
                       "rel": rel.astype(int)})
    exp = _naive(df, 10)
    for nb in (1, 7):
        ds = rd.from_arrow(_mk(qid, did, s, rel.astype(int)))
        if nb > 1:
            ds = ds.repartition(nb)
        out = retrieval_metrics(ds, "qid", "did", "s", "rel",
                                k=10).to_pandas() \
            .sort_values("qid").reset_index(drop=True)
        for c in ("n_cand", "n_rel", "hits_k"):
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c
        for c in ("first_rel", "rr", "p_at_k", "r_at_k"):
            assert out[c].fillna(-1).eq(exp[c].fillna(-1)).all(), c
        for c in ("dcg_k", "ndcg_k"):
            a = out[c].fillna(-1).to_numpy()
            b = exp[c].fillna(-1).to_numpy()
            assert np.allclose(a, b, atol=1e-12), c


def test_no_relevant_query_nulls(ray_session):
    t = _mk([1, 1, 2, 2], [1, 2, 1, 2], [9, 8, 9, 8], [0, 0, 1, 0])
    out = retrieval_metrics(rd.from_arrow(t), "qid", "did", "s",
                            "rel", k=2).to_pandas() \
        .sort_values("qid").reset_index(drop=True)
    r1 = out.iloc[0]
    assert r1["n_rel"] == 0
    assert pd.isna(r1["first_rel"]) and pd.isna(r1["rr"])
    assert pd.isna(r1["r_at_k"]) and pd.isna(r1["ndcg_k"])
    assert r1["dcg_k"] == 0.0 and r1["p_at_k"] == 0.0


def test_rejects(ray_session):
    t = pa.table({"qid": [1], "did": [1], "s": [0.5], "rel": [1]})
    with pytest.raises(Exception, match="integer-valued"):
        retrieval_metrics(rd.from_arrow(t), "qid", "did", "s",
                          "rel").materialize()
    t2 = pa.table({"qid": [1], "did": [1], "s": [5], "rel": [2]})
    with pytest.raises(Exception, match="0/1"):
        retrieval_metrics(rd.from_arrow(t2), "qid", "did", "s",
                          "rel").materialize()
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(rd.from_arrow(t2), "qid", "did", "s",
                          "rel", k=0)
