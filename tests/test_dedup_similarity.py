"""Dedup + similarity tests: planted near-dups must cluster; unrelated
docs must survive; brute-force knn must match a numpy oracle; LSH recall
measured against brute force."""
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages import dedup as DD
from feature_extraction_ray.stages import similarity as SIM


def _docs_with_dups(n=60, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(400)]
    texts, ids = [], []
    for i in range(n):
        words = rng.choice(vocab, size=60).tolist()
        texts.append(" ".join(words))
        ids.append(i)
    # plant near-dups: copies of doc 0/1/2 with 2 words changed
    for j, src in enumerate([0, 1, 2]):
        words = texts[src].split()
        words[5] = "CHANGED"
        words[30] = f"ALT{j}"
        texts.append(" ".join(words))
        ids.append(n + j)
    # and one exact duplicate of doc 3
    texts.append(texts[3])
    ids.append(n + 3)
    return pd.DataFrame({"doc_id": ids, "text": texts})


@pytest.fixture(scope="module")
def docs():
    return _docs_with_dups()


def test_exact_dedup(docs):
    ds = rd.from_pandas(docs)
    out = DD.exact_dedup(ds).to_pandas()
    assert len(out) == len(docs) - 1          # one exact dup removed
    dup_row = out[out["n_dups"] > 1]
    assert len(dup_row) == 1 and dup_row.iloc[0]["doc_id"] == 3
    assert dup_row.iloc[0]["n_dups"] == 2


def test_minhash_lsh_dedup_finds_planted(docs):
    ds = rd.from_pandas(docs)
    res = DD.minhash_lsh_dedup(ds, threshold=0.5, shingle_k=3)
    n = 60
    clustered = res.set_index("doc_id")["cluster_id"]
    for j, src in enumerate([0, 1, 2]):
        assert clustered[n + j] == src, f"near-dup {n+j} not clustered"
    assert clustered[n + 3] == 3             # exact dup clusters too
    # unrelated docs must NOT be merged
    originals = res[res["doc_id"] < n]
    assert (originals["cluster_id"] == originals["doc_id"]).all()


def test_minhash_estimate_close_to_exact_jaccard(docs):
    ds = rd.from_pandas(docs)
    sig = DD.minhash_signatures(ds, shingle_k=3).materialize()
    pairs = pd.DataFrame({"a": [0], "b": [60]})
    est = DD.verify_pairs_by_signature(pairs, sig, threshold=0.0)
    exact = DD.ngram_jaccard(docs.iloc[0]["text"], docs.iloc[60]["text"], 3)
    assert abs(est["est_jaccard"].iloc[0] - exact) < 0.15


def test_simhash_dedup_finds_planted(docs):
    ds = rd.from_pandas(docs)
    res = DD.simhash_dedup(ds, max_hamming=6)
    clustered = res.set_index("doc_id")["cluster_id"]
    assert clustered[63] == 3                # exact dup: hamming 0
    # near dups have small edits → usually within 6 bits; require ≥2 of 3
    hits = sum(clustered[60 + j] == s for j, s in enumerate([0, 1, 2]))
    assert hits >= 2


def _embeddings(n=200, dim=16, seed=9):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1).astype(np.float32)), dim),
    })
    return m, tbl


def test_knn_bruteforce_matches_numpy():
    m, tbl = _embeddings()
    q = m[:3] + 0.01
    got = SIM.knn_bruteforce(rd.from_arrow(tbl), q, k=5)
    qs = q / np.linalg.norm(q, axis=1, keepdims=True)
    ms = m / np.linalg.norm(m, axis=1, keepdims=True)
    scores = qs.astype(np.float32) @ ms.astype(np.float32).T
    for qi in range(3):
        exp = np.argsort(-scores[qi], kind="stable")[:5]
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == exp.tolist()


def test_knn_lsh_recall_vs_bruteforce():
    # clustered corpus (the regime ANN is for): 20 centers, 25 points each
    rng = np.random.default_rng(13)
    centers = rng.standard_normal((20, 16)).astype(np.float32) * 3
    pts = np.repeat(centers, 25, axis=0) + \
        rng.standard_normal((500, 16)).astype(np.float32) * 0.3
    ids = np.arange(len(pts), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), 16)})
    ds = rd.from_arrow(tbl)
    q = pts[::100][:5]
    exact = SIM.knn_bruteforce(ds, q, k=10)
    approx = SIM.knn_lsh(ds, q, k=10, bits=6, probes=16)
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_knn_ivf_recall_vs_bruteforce():
    rng = np.random.default_rng(29)
    centers = rng.standard_normal((20, 16)).astype(np.float32) * 3
    pts = np.repeat(centers, 25, axis=0) + \
        rng.standard_normal((500, 16)).astype(np.float32) * 0.3
    ids = np.arange(len(pts), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), 16)})
    ds = rd.from_arrow(tbl)
    q = pts[::100][:5]
    exact = SIM.knn_bruteforce(ds, q, k=10)
    approx = SIM.knn_ivf(ds, q, k=10, n_centroids=16, n_probe=4)
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_embedding_dedup_finds_planted():
    m, _ = _embeddings(n=100)
    # plant 3 near-identical copies of vector 0
    m2 = np.vstack([m, m[0:1] * 1.001 + 1e-4, m[1:2] * 0.999])
    ids = np.arange(len(m2), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m2.reshape(-1).astype(np.float32)), m2.shape[1]),
    })
    res = SIM.embedding_dedup(rd.from_arrow(tbl), threshold=0.999)
    c = res.set_index("vec_id")["cluster_id"]
    assert c[100] == 0 and c[101] == 1
    assert not res[res["vec_id"] < 100]["is_duplicate"].any()


def test_semdedup_exhaustive_equals_brute():
    # n_clusters=1 degenerates to exact all-pairs — must match the
    # hyperplane path's bits=0 exact mode (same pair set, same CC tail)
    m, tbl = _embeddings(n=240)
    a = SIM.semdedup(rd.from_arrow(tbl), threshold=0.5, n_clusters=1,
                     max_bucket=10**6)
    b = SIM.embedding_dedup(rd.from_arrow(tbl), threshold=0.5, bits=0,
                            max_bucket=10**6)
    assert a["cluster_id"].tolist() == b["cluster_id"].tolist()
    assert a["is_duplicate"].tolist() == b["is_duplicate"].tolist()


def test_semdedup_finds_planted_in_cells():
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 16)).astype(np.float32) * 4
    pts = np.repeat(centers, 40, axis=0) + \
        rng.standard_normal((240, 16)).astype(np.float32) * 0.2
    # plant near-copies of members of two different natural clusters
    m2 = np.vstack([pts, pts[0:1] * 1.001, pts[200:201] * 0.999])
    ids = np.arange(len(m2), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m2.reshape(-1).astype(np.float32)), 16)})
    res = SIM.semdedup(rd.from_arrow(tbl), threshold=0.9999,
                       n_clusters=6, sample_size=240)
    c = res.set_index("vec_id")
    # a near-copy lands in its source's k-means cell → caught
    assert c.loc[240, "cluster_id"] == 0 and bool(c.loc[240, "is_duplicate"])
    assert c.loc[241, "cluster_id"] == 200 and bool(c.loc[241, "is_duplicate"])


def test_knn_distributed_merge_equals_driver_merge():
    m, tbl = _embeddings(n=300)
    ds = rd.from_arrow(tbl)
    q = m[:4]
    a = SIM.knn_bruteforce(ds, q, k=7, merge="driver")
    b = SIM.knn_bruteforce(rd.from_arrow(tbl), q, k=7, merge="distributed")
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_allclose(a["score"], b["score"])


def test_knn_lsh_distributed_equals_driver_and_batch_queries():
    # many queries: candidates are scored inside map_batches; the driver
    # only sees top-k partials (and only nq x k rows on distributed merge)
    rng = np.random.default_rng(31)
    pts = rng.standard_normal((400, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), 16)})
    ds = rd.from_arrow(tbl)
    q = pts[:64] + 0.01
    a = SIM.knn_lsh(ds, q, k=5, bits=6, probes=8, merge="driver")
    b = SIM.knn_lsh(rd.from_arrow(tbl), q, k=5, bits=6, probes=8,
                    merge="distributed")
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)


def test_knn_ivf_distributed_merge_and_dataset_output():
    rng = np.random.default_rng(37)
    pts = rng.standard_normal((300, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), 8)})
    q = pts[:32]
    a = SIM.knn_ivf(rd.from_arrow(tbl), q, k=5, n_centroids=8, n_probe=3,
                    merge="driver")
    b = SIM.knn_ivf(rd.from_arrow(tbl), q, k=5, n_centroids=8, n_probe=3,
                    merge="distributed")
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    ds_out = SIM.knn_ivf(rd.from_arrow(tbl), q, k=5, n_centroids=8,
                         n_probe=3, merge="dataset")
    assert not isinstance(ds_out, pd.DataFrame)
    c = ds_out.to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert c["vec_id"].tolist() == a["vec_id"].tolist()


def test_incremental_minhash_equals_full_recompute():
    from feature_extraction_ray.stages.dedup import (
        minhash_lsh_dedup_incremental, minhash_signatures)
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    texts_a = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    df_a = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": texts_a})
    # new batch: near-dups of old docs 2 and 5, an internal dup pair, and
    # a doc that BRIDGES old docs 7 and 8 (forcing a cluster merge)
    def tweak(t, tag):
        ws = t.split(); ws[3] = tag; return " ".join(ws)
    bridge = texts_a[7].split()[:20] + texts_a[8].split()[:20]
    texts_b = [tweak(texts_a[2], "NEW0"), tweak(texts_a[5], "NEW1"),
               " ".join(rng.choice(vocab, size=40))]
    texts_b.append(tweak(texts_b[2], "NEWDUP"))
    texts_b.append(" ".join(bridge))
    df_b = pd.DataFrame({"doc_id": np.arange(30, 30 + len(texts_b),
                                             dtype=np.int64),
                         "text": texts_b})
    both = pd.concat([df_a, df_b]).reset_index(drop=True)
    full = DD.minhash_lsh_dedup(rd.from_pandas(both), threshold=0.35,
                                shingle_k=3)
    prior_sig = minhash_signatures(rd.from_pandas(df_a),
                                   shingle_k=3).materialize()
    prior_assign = DD.minhash_lsh_dedup(rd.from_pandas(df_a),
                                        threshold=0.35, shingle_k=3,
                                        output="dataset")
    inc, sig_all = minhash_lsh_dedup_incremental(
        rd.from_pandas(df_b), prior_sig, prior_assign,
        new_from=30, shingle_k=3, threshold=0.35, output="pandas")
    f = full.sort_values("doc_id").reset_index(drop=True)
    i = inc.sort_values("doc_id").reset_index(drop=True)
    assert f["doc_id"].tolist() == i["doc_id"].tolist()
    assert f["cluster_id"].tolist() == i["cluster_id"].tolist()
    assert f["is_duplicate"].tolist() == i["is_duplicate"].tolist()
    # sanity: the planted near-dups actually clustered
    c = i.set_index("doc_id")["cluster_id"]
    assert c[30] == 2 and c[31] == 5 and c[33] == c[32]


def test_minhash_dedup_all_unique_corpus():
    # zero candidate pairs: every doc must be its own cluster (exercises
    # the empty-pairs guard through verification + clustering)
    rng = np.random.default_rng(23)
    vocab = [f"u{i}" for i in range(500)]
    df = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=50, replace=False))
                 for _ in range(20)]})
    res = DD.minhash_lsh_dedup(rd.from_pandas(df), threshold=0.9,
                               shingle_k=5)
    assert (res["cluster_id"] == res["doc_id"]).all()
    assert not res["is_duplicate"].any()


def test_persistent_ivf_index_roundtrip(tmp_path):
    from feature_extraction_ray.stages.similarity import (
        build_ivf_index, query_ivf_index)
    rng = np.random.default_rng(41)
    centers = rng.standard_normal((10, 12)).astype(np.float32) * 3
    pts = np.repeat(centers, 30, axis=0) + \
        rng.standard_normal((300, 12)).astype(np.float32) * 0.3
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float32)), 12)})
    path = str(tmp_path / "ivf")
    info = build_ivf_index(rd.from_arrow(tbl), path, n_centroids=8)
    assert info["n_centroids"] == 8 and info["dim"] == 12
    q = pts[::60][:4]
    got = query_ivf_index(path, q, k=5, n_probe=8)   # exhaustive probe
    exact = SIM.knn_bruteforce(rd.from_arrow(tbl), q, k=5)
    for qi in range(4):
        g = got[got["query_id"] == qi].sort_values("rank")["vec_id"]
        e = exact[exact["query_id"] == qi].sort_values("rank")["vec_id"]
        assert g.tolist() == e.tolist(), qi
    # partial probe still finds the query's own neighborhood
    got2 = query_ivf_index(path, q, k=5, n_probe=2)
    for qi in range(4):
        g2 = set(got2[got2["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        assert len(g2 & e) >= 3, qi


def test_incremental_simhash_equals_full_recompute():
    from feature_extraction_ray.stages.dedup import (
        simhash_dedup_incremental, simhash_signatures)
    rng = np.random.default_rng(19)
    vocab = [f"s{i}" for i in range(250)]
    texts_a = [" ".join(rng.choice(vocab, size=45)) for _ in range(25)]
    df_a = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64),
                         "text": texts_a})
    def tweak(t, tag):
        ws = t.split(); ws[1] = tag; return " ".join(ws)
    texts_b = [tweak(texts_a[3], "Z0"), texts_a[9],
               " ".join(rng.choice(vocab, size=45))]
    df_b = pd.DataFrame({"doc_id": np.arange(25, 28, dtype=np.int64),
                         "text": texts_b})
    both = pd.concat([df_a, df_b]).reset_index(drop=True)
    full = DD.simhash_dedup(rd.from_pandas(both), max_hamming=6)
    prior_sig = simhash_signatures(rd.from_pandas(df_a)).materialize()
    prior_assign = DD.simhash_dedup(rd.from_pandas(df_a), max_hamming=6,
                                    output="dataset")
    inc, _sig = simhash_dedup_incremental(
        rd.from_pandas(df_b), prior_sig, prior_assign, new_from=25,
        max_hamming=6, output="pandas")
    f = full.sort_values("doc_id").reset_index(drop=True)
    i = inc.sort_values("doc_id").reset_index(drop=True)
    assert f["cluster_id"].tolist() == i["cluster_id"].tolist()
    assert f["is_duplicate"].tolist() == i["is_duplicate"].tolist()
    # the exact copy must cluster with its source
    assert i.set_index("doc_id")["cluster_id"][26] == 9


def test_ngram_jaccard_pairs_matches_naive(docs):
    """Distributed exact-Jaccard pair finder == per-pair python oracle."""
    ds = rd.from_pandas(docs)
    got = DD.ngram_jaccard_pairs(ds, k=3, threshold=(2, 5),
                                 num_buckets=8).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    # naive oracle over all pairs
    texts = dict(zip(docs["doc_id"], docs["text"]))
    exp_rows = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        sa = set(DD._shingle_hashes(texts[a].split(), 3).tolist())
        for b in ids[i + 1:]:
            sb = set(DD._shingle_hashes(texts[b].split(), 3).tolist())
            inter, union = len(sa & sb), len(sa | sb)
            if union and inter * 5 >= union * 2:
                exp_rows.append((a, b, inter, union))
    exp = pd.DataFrame(exp_rows,
                       columns=["doc_a", "doc_b", "inter_n", "union_n"])
    assert got.values.tolist() == exp.values.tolist()
    # the planted near-dups and the exact dup must be present
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert {(0, 60), (1, 61), (2, 62), (3, 63)} <= pairs


def test_ngram_jaccard_pairs_max_df_drops_hot_grams():
    """A stopword gram shared by every doc is pruned under max_df, so
    unrelated docs produce no pairs; the exact path keeps them."""
    base = [f"u{i}" for i in range(40)]
    texts = [" ".join([base[i], base[(i + 7) % 40], "the common tail",
                       base[(i + 13) % 40]]) for i in range(12)]
    df = pd.DataFrame({"doc_id": np.arange(12, dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df)
    exact = DD.ngram_jaccard_pairs(ds, k=3, threshold=(1, 100),
                                   num_buckets=4).to_pandas()
    capped = DD.ngram_jaccard_pairs(ds, k=3, threshold=(1, 100),
                                    num_buckets=4, max_df=2).to_pandas()
    assert len(exact) > 0                   # shared gram links everything
    assert len(capped) < len(exact)


def test_knn_lsh_exhaustive_probe_equals_bruteforce():
    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((300, 16)).astype(np.float64)
    q = vecs[:4]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array(list(vecs))}))
    brute = SIM.knn_bruteforce(ds, q, k=8, dtype=np.float64)
    full = SIM.knn_lsh(ds, q, k=8, bits=5, probes="all",
                       dtype=np.float64, merge="distributed")
    b = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert b["vec_id"].tolist() == f["vec_id"].tolist()
    assert np.allclose(b["score"], f["score"], atol=1e-12)


def test_derive_num_buckets_scales_with_size():
    from feature_extraction_ray.stages.partition import derive_num_buckets
    big = rd.from_arrow(pa.table({
        "x": pa.array(np.zeros(200_000, dtype=np.int64))})).materialize()
    assert derive_num_buckets(big, per_bucket_bytes=64 << 10,
                              lo=4, hi=1024) == 32      # 1.6MB/64KB -> 25 -> 32
    small = rd.from_arrow(pa.table({"x": pa.array([1, 2])})).materialize()
    assert derive_num_buckets(small, lo=16) == 16       # floor
    assert derive_num_buckets(big, per_bucket_bytes=1, hi=64) == 64  # cap


def test_minhash_dedup_num_buckets_invariant(docs):
    """Same clusters at the size-derived default and at num_buckets=256
    (the bucket count is a physical knob, never a semantic one)."""
    base = DD.minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5,
                                shingle_k=3)            # derived default
    wide = DD.minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5,
                                shingle_k=3, num_buckets=256)
    b = base.sort_values("doc_id").reset_index(drop=True)
    w = wide.sort_values("doc_id").reset_index(drop=True)
    assert b["cluster_id"].tolist() == w["cluster_id"].tolist()
    assert b["is_duplicate"].tolist() == w["is_duplicate"].tolist()


def test_truncation_stats_reported(docs):
    """max_bucket caps must be counted, not silent (no-silent-caps rule)."""
    DD.truncation_report(reset=True)
    # max_bucket=2 forces truncation on every >2-doc LSH bucket: the
    # 4 planted dup groups all collide with their sources
    sig = DD.minhash_signatures(rd.from_pandas(docs),
                                shingle_k=3).materialize()
    DD.candidate_pairs_ds(sig, max_bucket=2, num_buckets=4).materialize()
    rep = DD.truncation_report(reset=True)
    assert "lsh_candidate_pairs" in rep or rep == {}, rep
    # the planted corpus has no >2 unique-doc band bucket guarantee; use
    # an explicit hot corpus instead for a deterministic assertion
    hot = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                        "text": ["same text body here okay"] * 6})
    sig2 = DD.minhash_signatures(rd.from_pandas(hot),
                                 shingle_k=3).materialize()
    DD.candidate_pairs_ds(sig2, max_bucket=2, num_buckets=4).materialize()
    rep2 = DD.truncation_report(reset=True)
    assert rep2["lsh_candidate_pairs"]["truncated_buckets"] > 0
    assert rep2["lsh_candidate_pairs"]["dropped_rows"] > 0
    # ngram max_df cap is also counted
    DD.ngram_jaccard_pairs(rd.from_pandas(hot), k=3, threshold=(1, 100),
                           num_buckets=4, max_df=2).to_pandas()
    rep3 = DD.truncation_report(reset=True)
    assert rep3["ngram_jaccard_pairs"]["truncated_buckets"] > 0


def test_fused_verified_pairs_equal_join_plan(docs):
    """candidate_verified_pairs_ds (one fused exchange) emits exactly the
    pairs of the older candidates -> two-signature-join plan."""
    sig = DD.minhash_signatures(rd.from_pandas(docs),
                                shingle_k=3).materialize()
    fused = DD.candidate_verified_pairs_ds(sig, threshold=0.5,
                                           num_buckets=4).to_pandas()
    pairs = DD.candidate_pairs_ds(sig, num_buckets=4).materialize()
    joined = DD.verify_pairs_distributed(pairs, sig, 0.5,
                                         num_buckets=4).to_pandas()
    f = set(zip(fused["a"], fused["b"]))
    j = set(zip(joined["a"], joined["b"]))
    assert f == j and len(f) > 0


def test_star_pairing_clusters_planted_dups(docs):
    """pairing="star" (O(n) pairs per collision run) finds the same
    planted clusters as all-pairs on a near-transitive corpus."""
    allp = DD.minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5,
                                shingle_k=3, pairing="all")
    star = DD.minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5,
                                shingle_k=3, pairing="star")
    a = allp.sort_values("doc_id").reset_index(drop=True)
    s = star.sort_values("doc_id").reset_index(drop=True)
    assert a["cluster_id"].tolist() == s["cluster_id"].tolist()
    # star emits strictly fewer (or equal) pair rows on a hot corpus
    hot = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                        "text": ["hot boilerplate row body here"] * 30})
    sig = DD.minhash_signatures(rd.from_pandas(hot),
                                shingle_k=3).materialize()
    n_all = DD.candidate_verified_pairs_ds(sig, 0.5, num_buckets=4,
                                           pairing="all").count()
    n_star = DD.candidate_verified_pairs_ds(sig, 0.5, num_buckets=4,
                                            pairing="star").count()
    assert n_star < n_all
    assert n_star <= 29 * 4        # <= (n-1) per shard it appears in


def test_kmeans_distributed_deterministic_and_matches_reference(ray_session):
    import ray.data as rd
    from feature_extraction_ray.stages.similarity import (
        kmeans_fit, kmeans_assign, _kmeans_lite, _norm_rows)
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    m1 = kmeans_fit(ds, k=5, iters=4)
    m2 = kmeans_fit(ds, k=5, iters=4)
    # deterministic init/sample; float sums may reorder across block
    # boundaries (~1e-15)
    assert np.abs(m1["centroids"] - m2["centroids"]).max() < 1e-12
    df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = _norm_rows(np.stack([np.asarray(v, dtype=np.float64)
                             for v in df["embedding"]]))
    cent = _kmeans_lite(X[:2048].astype(np.float32), 5,
                        iters=0, seed=23).astype(np.float64)
    for _ in range(4):
        a = np.argmax(X @ cent.T, axis=1)
        for j in range(5):
            if (a == j).any():
                cent[j] = X[a == j].mean(axis=0)
        cent = _norm_rows(cent)
    assert np.abs(cent - m1["centroids"]).max() < 1e-12
    asg = kmeans_assign(ds, m1).to_pandas().sort_values("vec_id")
    order = np.argsort(df["vec_id"].values, kind="stable")
    ref_a = np.argmax(X @ m1["centroids"].T, axis=1)[order]
    assert (asg["cluster"].values == ref_a).all()
    assert len(np.unique(asg["cluster"])) >= 2


def test_knn_mmr_diversifies_and_degenerates(ray_session):
    import ray.data as rd
    from feature_extraction_ray.stages.similarity import (knn_mmr,
                                                          knn_bruteforce)
    # corpus: two tight clusters near the query + one moderately
    # relevant outlier; plain top-3 takes the near-duplicates, MMR at
    # lam=0.5 swaps one duplicate for the diverse outlier
    vecs = [[0.9, 0.3], [0.89, 0.31], [0.91, 0.29],     # cluster A
            [0.8, -0.6]]                                 # diverse
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3]),
        "embedding": pa.array(vecs)}))
    q = np.array([[1.0, 0.0]])
    plain = knn_bruteforce(ds, q, k=3, dtype=np.float64)
    assert sorted(plain["vec_id"].tolist()) == [0, 1, 2]
    mmr = knn_mmr(ds, q, k=3, fetch_k=4, lam=0.5, dtype=np.float64)
    assert 3 in mmr["vec_id"].tolist()          # outlier selected
    assert mmr["rank"].tolist() == [1, 2, 3]
    assert mmr["vec_id"].iloc[0] == 2           # most relevant first
    assert mmr["vec_id"].iloc[1] == 3           # diversity beats dups
    # lam=1 == plain top-k order
    mmr1 = knn_mmr(ds, q, k=3, fetch_k=4, lam=1.0, dtype=np.float64)
    assert mmr1["vec_id"].tolist() == plain.sort_values("rank")[
        "vec_id"].tolist()
    # determinism on real data
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = np.stack([np.asarray(v, dtype=np.float64) for v in
                   emb.limit(3).to_pandas()["embedding"]])
    a = knn_mmr(emb, qv, k=5, fetch_k=20, lam=0.7)
    b = knn_mmr(emb, qv, k=5, fetch_k=20, lam=0.7)
    assert a.equals(b)
    assert (a.groupby("query_id").size() == 5).all()


def test_incremental_rejects_mismatched_signature_scheme(ray_session):
    """ADVICE round-3: a hash-family/param change must fail LOUDLY on a
    persisted signature store, not silently miss cross-batch dups."""
    import pytest
    from feature_extraction_ray.stages.dedup import (
        minhash_lsh_dedup_incremental, minhash_signatures,
        simhash_dedup_incremental, simhash_signatures)
    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "text": [f"alpha beta gamma delta w{i} x{i} y{i}"
                                for i in range(6)]})
    ds = rd.from_pandas(df)
    sig = minhash_signatures(ds, shingle_k=3).materialize()
    assert "sig_scheme" in sig.schema().names
    # different params => different scheme id => loud failure
    with pytest.raises(ValueError, match="scheme"):
        minhash_lsh_dedup_incremental(ds, sig, new_from=6,
                                      shingle_k=4, threshold=0.5)
    # unversioned (pre-round-4) store => loud failure
    legacy = sig.drop_columns(["sig_scheme"]).materialize()
    with pytest.raises(ValueError, match="sig_scheme"):
        minhash_lsh_dedup_incremental(ds, legacy, new_from=6,
                                      shingle_k=3, threshold=0.5)
    # matching scheme still works end-to-end
    df_new = pd.DataFrame({"doc_id": np.arange(6, 9, dtype=np.int64),
                           "text": [f"new doc number {i} quite unique"
                                    for i in range(3)]})
    out, _ = minhash_lsh_dedup_incremental(
        rd.from_pandas(df_new), sig, new_from=6, shingle_k=3,
        threshold=0.5, output="pandas")
    assert len(out) == 9
    ssig = simhash_signatures(ds).materialize()
    with pytest.raises(ValueError, match="sig_scheme"):
        simhash_dedup_incremental(
            ds, ssig.drop_columns(["sig_scheme"]).materialize())


def test_kmeans_fit_zero_iters_returns_init(ray_session):
    """ADVICE round-3: kmeans_fit(iters=0) raised NameError on 'sim'."""
    import ray.data as rd
    from feature_extraction_ray.stages.similarity import kmeans_fit
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = kmeans_fit(ds, k=4, iters=0)
    assert m["iters"] == 0 and m["inertia"] == 0.0
    assert m["centroids"].shape[0] == 4


# ---------------------------------------------------------------------------
# Product quantization (round 4)
# ---------------------------------------------------------------------------

def _pq_corpus(n=300, dim=8, seed=41):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((12, dim)) * 4.0
    pts = np.repeat(centers, n // 12, axis=0) + \
        rng.standard_normal((n, dim)) * 0.4
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1).astype(np.float64)), dim)})
    return pts, tbl


def test_pq_encode_matches_numpy_oracle():
    """Planted integer codebooks: encode must pick the nearest
    subcentroid per subspace, ties -> lowest code index."""
    cb = [[[0, 0], [6, 6], [12, 3]], [[0, 6], [6, 0], [9, 9]]]
    rng = np.random.default_rng(3)
    x = rng.integers(0, 13, size=(120, 4)).astype(np.float64)
    ids = np.arange(120, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(x.reshape(-1)), 4)})
    model = SIM.fit_pq(rd.from_arrow(tbl), codebooks=cb)
    codes = SIM.pq_encode(rd.from_arrow(tbl), model).to_pandas() \
        .sort_values("vec_id")
    got = np.stack([np.asarray(c) for c in codes["pq_code"]])
    cba = np.asarray(cb, dtype=np.float64)
    for j in range(2):
        d2 = ((x[:, None, 2 * j:2 * j + 2] - cba[j][None]) ** 2).sum(axis=2)
        np.testing.assert_array_equal(got[:, j], np.argmin(d2, axis=1))


def test_pq_search_matches_numpy_adc_both_merges():
    """pq_search == the numpy ADC oracle exactly (same codes, same LUT,
    ties -> lower vec_id), under driver AND distributed merges — ties are
    REAL here (every vector in a PQ cell shares one distance)."""
    pts, tbl = _pq_corpus()
    ds = rd.from_arrow(tbl)
    model = SIM.fit_pq(ds, m=4, ksub=8, sample_size=256)
    codes_ds = SIM.pq_encode(ds, model).materialize()
    q = pts[::60][:5]
    k = 7
    # numpy oracle: encode + LUT + stable (dist, vec_id) top-k
    cb = model["codebooks"]
    m, ksub, dsub = cb.shape
    codes = np.empty((len(pts), m), dtype=np.int64)
    for j in range(m):
        d2 = ((pts[:, None, j * dsub:(j + 1) * dsub]
               - cb[j][None]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    lut = np.stack([((q[:, None, j * dsub:(j + 1) * dsub]
                      - cb[j][None]) ** 2).sum(axis=2)
                    for j in range(m)], axis=1)      # (nq, m, ksub)
    adc = np.zeros((len(q), len(pts)))
    for j in range(m):
        adc += lut[:, j, :][:, codes[:, j]]
    for merge in ("driver", "distributed"):
        got = SIM.pq_search(codes_ds, model, q, k=k, merge=merge)
        for qi in range(len(q)):
            order = np.lexsort((np.arange(len(pts)), adc[qi]))[:k]
            sub = got[got["query_id"] == qi].sort_values("rank")
            assert sub["vec_id"].tolist() == order.tolist(), \
                f"{merge} q{qi}"
            np.testing.assert_allclose(-sub["score"].to_numpy(),
                                       adc[qi][order], rtol=1e-12)


def test_pq_fit_deterministic_and_cluster_recall():
    """fit_pq is layout-independent (id-hash-stride sample): two fits on
    differently-blocked copies give identical codebooks. Recall is
    checked at CLUSTER level: PQ collapses a tight cluster into one cell
    (within-cell order is lost to quantized-distance ties by design), so
    the honest lossy-quantizer property is that retrieved neighbors come
    from the query's true cluster — not that exact top-10 ranks survive."""
    pts, tbl = _pq_corpus()                   # 12 clusters × 25 points
    ds1 = rd.from_arrow(tbl)
    ds2 = rd.from_arrow(tbl).repartition(7)
    m1 = SIM.fit_pq(ds1, m=2, ksub=16, sample_size=128)
    m2 = SIM.fit_pq(ds2, m=2, ksub=16, sample_size=128)
    np.testing.assert_array_equal(m1["codebooks"], m2["codebooks"])
    codes = SIM.pq_encode(ds1, m1).materialize()
    q_idx = np.arange(0, 300, 60)[:5]
    approx = SIM.pq_search(codes, m1, pts[q_idx], k=10)
    hits = []
    for qi, src in enumerate(q_idx):
        got = approx[approx["query_id"] == qi]["vec_id"].to_numpy()
        hits.append(np.mean(got // 25 == src // 25))
    assert np.mean(hits) >= 0.9, hits


def test_topk_partial_tie_inclusive():
    """Round-4 fix: duplicate vectors split across blocks must not lose
    the lower-vec_id copy to argpartition's arbitrary tie choice."""
    base = np.eye(4, dtype=np.float32)
    # vec 0..3 in block A; vec 4 duplicates vec 1, alone in block B
    tbl_a = pa.table({"vec_id": pa.array(np.arange(4, dtype=np.int64)),
                      "embedding": pa.FixedSizeListArray.from_arrays(
                          pa.array(base.reshape(-1)), 4)})
    dup = np.stack([base[1], base[1], base[1]])
    tbl_b = pa.table({"vec_id": pa.array(np.array([4, 5, 6], dtype=np.int64)),
                      "embedding": pa.FixedSizeListArray.from_arrays(
                          pa.array(dup.reshape(-1)), 4)})
    ds = rd.from_arrow(tbl_a).union(rd.from_arrow(tbl_b))
    got = SIM.knn_bruteforce(ds, base[1][None], k=3)
    # four vectors tie at score 1.0 -> keep the three LOWEST vec_ids
    assert got.sort_values("rank")["vec_id"].tolist() == [1, 4, 5]


def test_ivfpq_single_cell_equals_flat_pq(tmp_path):
    """IVF-PQ with one coarse centroid at the origin (residual = raw
    vector) and planted codebooks must equal flat pq_search exactly —
    the composed index degenerates to PQ."""
    rng = np.random.default_rng(17)
    x = rng.integers(-6, 13, size=(150, 4)).astype(np.float64)
    ids = np.arange(150, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(x.reshape(-1)), 4)})
    ds = rd.from_arrow(tbl)
    cb = [[[0, 0], [6, 6], [12, 3]], [[0, 6], [6, 0], [9, 9]]]
    path = str(tmp_path / "ivfpq")
    SIM.build_ivfpq_index(ds, path, normalize=False,
                          coarse_centroids=[[0, 0, 0, 0]], codebooks=cb)
    q = np.array([[1, 2, 3, 4], [5, 5, 5, 5]], dtype=np.float64)
    got = SIM.query_ivfpq_index(path, q, k=6, n_probe="all")
    flat_model = SIM.fit_pq(ds, codebooks=cb)
    codes = SIM.pq_encode(ds, flat_model)
    exp = SIM.pq_search(codes, flat_model, q, k=6)
    for qi in range(2):
        g = got[got["query_id"] == qi].sort_values("rank")
        e = exp[exp["query_id"] == qi].sort_values("rank")
        assert g["vec_id"].tolist() == e["vec_id"].tolist()
        np.testing.assert_allclose(g["score"].to_numpy(),
                                   e["score"].to_numpy(), rtol=1e-12)


def test_ivfpq_fitted_cluster_recall_and_probe_pruning(tmp_path):
    """Fitted IVF-PQ on a clustered corpus: probed retrieval stays in
    the query's true cluster, and a low-n_probe query must NOT read
    every cell's files (the bytes-on-disk pruning claim)."""
    import os
    pts, tbl = _pq_corpus()                   # 12 clusters × 25 points
    ds = rd.from_arrow(tbl)
    path = str(tmp_path / "ivfpq")
    model = SIM.build_ivfpq_index(ds, path, n_centroids=12, m=2,
                                  ksub=16, sample_size=256)
    assert model["n_centroids"] == 12
    cells = [d for d in os.listdir(path) if d.startswith("__ivf_cell=")]
    assert len(cells) >= 8                    # clusters landed in cells
    q_idx = np.arange(0, 300, 60)[:5]
    got = SIM.query_ivfpq_index(path, pts[q_idx], k=10, n_probe=2)
    hits = []
    for qi, src in enumerate(q_idx):
        g = got[got["query_id"] == qi]["vec_id"].to_numpy()
        assert len(g) == 10
        hits.append(np.mean(g // 25 == src // 25))
    assert np.mean(hits) >= 0.9, hits


def test_incremental_exact_dedup_equals_full_recompute(ray_session):
    from feature_extraction_ray.stages.dedup import (
        exact_dedup, exact_dedup_incremental, exact_dedup_store)
    old = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["alpha", "beta", "alpha", "gamma", "delta", "beta"],
    })
    # new batch: known content (alpha), new content duplicated inside
    # the batch (epsilon x2), fresh unique (zeta), another known (gamma)
    new = pd.DataFrame({
        "doc_id": np.arange(10, 15, dtype=np.int64),
        "text": ["alpha", "epsilon", "zeta", "epsilon", "gamma"],
    })
    store = exact_dedup_store(rd.from_pandas(old), num_buckets=4) \
        .materialize()
    assign, store_all = exact_dedup_incremental(
        rd.from_pandas(new), store, num_buckets=4)
    a = assign.to_pandas().set_index("text")
    assert a.loc["alpha", "doc_id"] == 0 and bool(a.loc["alpha", "had_prior"])
    assert a.loc["gamma", "doc_id"] == 3 and bool(a.loc["gamma", "had_prior"])
    assert a.loc["epsilon", "doc_id"] == 11 and a.loc["epsilon", "n_new"] == 2
    assert a.loc["zeta", "doc_id"] == 12 and not bool(a.loc["zeta", "had_prior"])
    assert sorted(a.index) == ["alpha", "epsilon", "gamma", "zeta"]
    # updated store == full recompute over old ∪ new (same keepers)
    both = pd.concat([old, new]).reset_index(drop=True)
    full = exact_dedup(rd.from_pandas(both), num_buckets=4) \
        .to_pandas().set_index("text")["doc_id"].sort_index()
    got = store_all.to_pandas().set_index("text")["doc_id"].sort_index()
    assert got.index.tolist() == full.index.tolist()
    assert got.tolist() == full.tolist()


def test_incremental_exact_dedup_rejects_bad_store(ray_session):
    from feature_extraction_ray.stages.dedup import exact_dedup_incremental
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64), "text": ["x"]}))
    unversioned = rd.from_pandas(pd.DataFrame({
        "__chash": np.array([5], dtype=np.int64),
        "text": ["y"], "doc_id": np.array([0], dtype=np.int64)})) \
        .materialize()
    with pytest.raises(ValueError, match="sig_scheme"):
        exact_dedup_incremental(new, unversioned)
    wrong = rd.from_pandas(pd.DataFrame({
        "__chash": np.array([5], dtype=np.int64),
        "text": ["y"], "doc_id": np.array([0], dtype=np.int64),
        "sig_scheme": np.array([123], dtype=np.int64)})).materialize()
    with pytest.raises(ValueError, match="scheme"):
        exact_dedup_incremental(new, wrong)


# ------------------------------------------------------- select_canonical

def test_select_canonical_prefer_and_ties():
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.dedup import select_canonical
    assign = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 4, 4], type=pa.int64())}))
    quality = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "quality": pa.array([10, 30, 30, 7, 7], type=pa.int64())}))
    out = select_canonical(assign, quality, num_buckets=2) \
        .to_pandas().set_index("doc_id").sort_index()
    # max quality wins; quality tie -> min id (doc 2 over doc 3; 4 over 5)
    assert list(out["is_canonical"]) == [False, True, False, True, False]
    assert len(out) == 5  # no row dropped
    # prefer="min": lowest quality wins (doc 1), tie rule unchanged
    out2 = select_canonical(assign, quality, prefer="min",
                            num_buckets=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out2["is_canonical"]) == [True, False, False, True, False]
    import pytest
    with pytest.raises(ValueError):
        select_canonical(assign, quality, prefer="best")


def test_select_canonical_over_exact_clusters():
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.dedup import (
        exact_dedup, select_canonical)
    # singleton clusters: every row canonical
    assign = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "cluster_id": pa.array([7, 8], type=pa.int64())}))
    quality = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 8], type=pa.int64()),
        "quality": pa.array([1.5, -2.0], type=pa.float64())}))
    out = select_canonical(assign, quality, num_buckets=2).to_pandas()
    assert out["is_canonical"].all()


# -------------------------------------------------------- hard negatives

def test_hard_negatives_label_exclusion():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from feature_extraction_ray.stages.similarity import hard_negatives
    # two tight same-label clusters + one far other-label point: the
    # nearest DIFFERENT-label vector must win even though same-label
    # twins are closer
    vecs = np.array([
        [1.0, 0.0], [0.999, 0.01],      # label 0 cluster
        [0.0, 1.0], [0.01, 0.999],      # label 1 cluster
        [0.7, 0.7],                     # label 2 bridge
    ], dtype=np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(5), type=pa.int64()),
        "embedding": pa.array(vecs.tolist(),
                              type=pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1, 2], type=pa.int32())}))
    out = hard_negatives(ds, k=2).sort_values(
        ["anchor_id", "rank"]).reset_index(drop=True)
    # every anchor gets negatives only from OTHER labels, never itself
    assert (out["anchor_id"] != out["neg_id"]).all()
    lbl = {i: l for i, l in enumerate([0, 0, 1, 1, 2])}
    assert all(lbl[a] != lbl[n]
               for a, n in zip(out["anchor_id"], out["neg_id"]))
    # anchor 0's hardest negative is the bridge (cos .7,.7) not its twin
    assert out[out["anchor_id"] == 0].iloc[0]["neg_id"] == 4
    # naive float64 parity
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    S = vn @ vn.T
    for a in range(5):
        cand = [(S[a, b], -b) for b in range(5)
                if lbl[b] != lbl[a]]
        want = [-b for _, b in sorted(cand, reverse=True)][:2]
        got = out[out["anchor_id"] == a]["neg_id"].tolist()
        assert got == want
    with pytest.raises(ValueError, match="max_anchors"):
        hard_negatives(ds, k=2, max_anchors=2)


# ------------------------------------------------------ int8 quantization

def test_quantize_embeddings_int8_golden():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.similarity import (
        quantize_embeddings_int8)
    vecs = [[1.0, -0.5, 0.25, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [-2.0, 2.0, 1.0, -1.0]]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(3), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))}))
    out = quantize_embeddings_int8(ds).to_pandas() \
        .set_index("vec_id").sort_index()
    assert list(out.loc[0, "codes"]) == [127, -64, 32, 0]
    assert out.loc[0, "scale"] == 1.0
    # zero vector -> zero codes, scale 0
    assert list(out.loc[1, "codes"]) == [0, 0, 0, 0]
    assert out.loc[1, "scale"] == 0.0
    assert list(out.loc[2, "codes"]) == [-127, 127, 64, -64]
    # dequantization error bound: |v - code*s/127| <= s/254 per dim
    for i, v in enumerate(vecs):
        s = out.loc[i, "scale"]
        deq = np.array(out.loc[i, "codes"], dtype=np.float64) * s / 127
        assert np.abs(np.array(v) - deq).max() <= s / 254 + 1e-12
