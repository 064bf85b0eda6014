"""DSIR (importance resampling) goldens: hand-computed model parity vs
an independent pure-Python reference, OOV/cap behavior, Gumbel-top-k
determinism. The DuckDB oracle parity for the query entries lives in
test_queries_oracle (dsir_scores_docs / dsir_sampled_docs)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages import dsir as D

SEP = "\x1f"


def _py_feats(text: str) -> list[str]:
    ws = text.split()
    return ([f"U{SEP}{w}" for w in ws]
            + [f"B{SEP}{a}{SEP}{b}" for a, b in zip(ws, ws[1:])])


def _py_fit(target_texts, raw_texts, top_v=None, alpha=1.0):
    from collections import Counter
    ct, cr = Counter(), Counter()
    for t in target_texts:
        ct.update(_py_feats(t))
    for t in raw_texts:
        cr.update(_py_feats(t))
    feats = sorted(set(ct) | set(cr))
    if top_v is not None and len(feats) > top_v:
        feats = sorted(feats, key=lambda f: (-(ct[f] + cr[f]), f))[:top_v]
    n_t, n_r = sum(ct.values()), sum(cr.values())
    v = len(feats)
    dent, denr = n_t + alpha * (v + 1), n_r + alpha * (v + 1)
    lam = {f: np.log((ct[f] + alpha) / dent)
           - np.log((cr[f] + alpha) / denr) for f in feats}
    ct_o = n_t - sum(ct[f] for f in feats)
    cr_o = n_r - sum(cr[f] for f in feats)
    lam_oov = (np.log((ct_o + alpha) / dent)
               - np.log((cr_o + alpha) / denr))
    return lam, lam_oov


def _ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts)}))


TARGET = ["alpha beta gamma", "alpha beta", "gamma gamma alpha"]
RAW = ["delta epsilon zeta", "alpha delta delta", "beta beta zeta eta",
       "theta", "alpha beta gamma delta"]


def test_fit_matches_pure_python_reference(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    lam, lam_oov = _py_fit(TARGET, RAW)
    assert model["v"] == len(lam)
    assert set(model["lam"]) == set(lam)
    for f, val in lam.items():
        assert model["lam"][f] == pytest.approx(val, abs=0, rel=0), f
    assert model["lam_oov"] == lam_oov


def test_scores_match_pure_python_and_no_oov_uncapped(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    got = D.dsir_scores(_ds(RAW), model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    lam, lam_oov = _py_fit(TARGET, RAW)
    for i, text in enumerate(RAW):
        feats = _py_feats(text)
        row = got[got.doc_id == i].iloc[0]
        assert row.n_feats == len(feats)
        assert row.n_oov == 0           # raw ⊆ shared vocab when uncapped
        assert row.logw == pytest.approx(
            sum(lam.get(f, lam_oov) for f in feats), abs=1e-12)


def test_cap_folds_tail_into_oov_bucket(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW), top_v=3)
    lam, lam_oov = _py_fit(TARGET, RAW, top_v=3)
    assert model["v"] == 3 and set(model["lam"]) == set(lam)
    for f, val in lam.items():
        assert model["lam"][f] == val
    assert model["lam_oov"] == lam_oov
    got = D.dsir_scores(_ds(RAW), model).to_pandas()
    assert (got["n_oov"] > 0).any()     # the fold is actually exercised
    for _, row in got.iterrows():
        feats = _py_feats(RAW[int(row.doc_id)])
        assert row.n_oov == sum(f not in lam for f in feats)
        assert row.logw == pytest.approx(
            sum(lam.get(f, lam_oov) for f in feats), abs=1e-12)


def test_target_like_docs_outscore_raw_like(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    probe = _ds(["alpha beta gamma", "delta epsilon zeta"], ids=[0, 1])
    got = D.dsir_scores(probe, model).to_pandas() \
        .sort_values("doc_id")
    assert got.iloc[0].logw > got.iloc[1].logw


def test_empty_and_single_word_docs(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    probe = _ds(["", "   ", "alpha"], ids=[0, 1, 2])
    got = D.dsir_scores(probe, model).to_pandas()
    assert got.doc_id.tolist() == [2]   # featureless docs drop
    assert got.iloc[0].n_feats == 1     # one unigram, no bigram


def test_gumbel_select_deterministic_and_seeded(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    scores = D.dsir_scores(_ds(RAW), model).materialize()
    a = D.dsir_select(scores, 3, seed=1, temperature=50.0)
    b = D.dsir_select(scores, 3, seed=1, temperature=50.0)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    # at high temperature the noise dominates → some seed flips it
    picks = {tuple(D.dsir_select(scores, 3, seed=s,
                                 temperature=50.0)["doc_id"].to_pylist())
             for s in range(8)}
    assert len(picks) > 1
    # k ≥ n returns the whole pool
    assert D.dsir_select(scores, 99, seed=1).num_rows == scores.count()


def test_topk_mode_equals_argmax_logw(ray_session):
    model = D.fit_dsir(_ds(TARGET), _ds(RAW))
    scores = D.dsir_scores(_ds(RAW), model).materialize()
    sel = D.dsir_select(scores, 2, temperature=None)
    pdf = scores.to_pandas().sort_values(
        ["logw", "doc_id"], ascending=[False, True])
    assert sel["doc_id"].to_pylist() == pdf.doc_id.tolist()[:2]


def test_gumbel_key_matches_duckdb_hugeint_twin(ray_session):
    import duckdb
    ids = np.array([0, 1, 7, 12345, 2**31 - 1, 2**32 - 8], dtype=np.int64)
    got = D.gumbel_key(ids, seed=7)
    con = duckdb.connect()
    exp = con.sql(
        "SELECT -ln(-ln(((((CAST(i AS HUGEINT) + 7) * 2654435761)"
        " % 4294967296) + 0.5) / 4294967296.0)) AS g FROM (SELECT"
        " unnest([0, 1, 7, 12345, 2147483647, 4294967288]) AS i)"
    ).df()["g"].to_numpy()
    con.close()
    # the hash and u stages are bit-identical; numpy's and DuckDB's
    # libm ln() differ by 1 ulp on some inputs, so the composed key
    # agrees to ~1e-15 and the query layer's round-6 absorbs it
    np.testing.assert_allclose(got, exp, rtol=0, atol=5e-15)
