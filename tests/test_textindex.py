"""Persistent inverted text index (stages/textindex.py): build layout,
bucket-pruned BM25 queries vs the brute scorer, multi-query top-k,
and the empty/missing-term edges."""
import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.text import bm25_scores
from feature_extraction_ray.stages.textindex import (build_text_index,
                                                     query_text_index)

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_build_layout_and_stats(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    man = build_text_index(_docs(), d, num_buckets=8)
    files = [f for f in os.listdir(d) if f.startswith("postings-")]
    assert len(files) == len(man["buckets"]) <= 8
    assert man["n_docs"] == 500
    with open(os.path.join(d, "stats.json")) as f:
        assert json.load(f)["n_postings"] == man["n_postings"]
    # a term's postings live in exactly one bucket, sorted by term
    import pyarrow.parquet as pq
    seen = {}
    for fn in files:
        t = pq.read_table(os.path.join(d, fn))
        terms = set(t["term"].to_pylist())
        for term in terms:
            assert term not in seen, (term, fn, seen[term])
            seen[term] = fn
        tl = t["term"].to_pylist()
        assert tl == sorted(tl)


def test_query_matches_brute_bm25(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    build_text_index(_docs(), d, num_buckets=8)
    qs = ["query join stream hash", "table scan sort", "zzz-absent"]
    res = query_text_index(d, qs, k=7).to_pandas()
    for qi, q in enumerate(qs[:2]):
        brute = bm25_scores(_docs(), sorted(set(q.split()))).to_pandas()
        brute = brute[brute["bm25"] > 0].sort_values(
            ["bm25", "doc_id"], ascending=[False, True]).head(7)
        got = res[res["query_id"] == qi]
        assert got["doc_id"].tolist() == brute["doc_id"].tolist(), q
        assert np.allclose(got["score"].to_numpy(),
                           brute["bm25"].to_numpy(), atol=1e-9)
    # absent-term query returns no rows (no zero-score padding)
    assert (res["query_id"] == 2).sum() == 0
    # duplicate terms in a query count once
    r1 = query_text_index(d, ["join join join"], k=5).to_pandas()
    r2 = query_text_index(d, ["join"], k=5).to_pandas()
    assert r1["doc_id"].tolist() == r2["doc_id"].tolist()
    assert np.allclose(r1["score"], r2["score"])


def test_query_reads_only_touched_buckets(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    build_text_index(_docs(), d, num_buckets=16)
    # delete every bucket the query terms do NOT hash into; the query
    # must still succeed — proof it never opens untouched buckets
    from feature_extraction_ray.stages.partition import \
        _stable_hash_strings
    terms = ["join", "stream"]
    # array-form modulo: a np.uint64 SCALAR % python-int promotes to
    # float64 in numpy 1.x and garbles the bucket id
    keep = set((_stable_hash_strings(pa.array(terms))
                % np.uint64(16)).astype(np.int64).tolist())
    for fn in list(os.listdir(d)):
        if fn.startswith("postings-") and \
                int(fn.split("-")[1].split(".")[0]) not in keep:
            os.remove(os.path.join(d, fn))
    res = query_text_index(d, ["join stream"], k=5).to_pandas()
    assert len(res) == 5 and (res["score"] > 0).all()


def test_incremental_update_equals_full_rebuild(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from feature_extraction_ray.stages.textindex import update_text_index
    full = _docs()
    half_a = full.filter(expr="doc_id < 250")
    half_b = full.filter(expr="doc_id >= 250")
    d_inc = str(tmp_path / "inc")
    d_all = str(tmp_path / "all")
    build_text_index(half_a, d_inc, num_buckets=8)
    stats = update_text_index(half_b, d_inc)
    man = build_text_index(full, d_all, num_buckets=8)
    assert stats["n_docs"] == man["n_docs"]
    assert stats["total_tokens"] == man["total_tokens"]
    assert stats["n_postings"] == man["n_postings"]
    # bucket files byte-agree after sort (same postings, same order)
    for fn in sorted(os.listdir(d_all)):
        if not fn.startswith("postings-"):
            continue
        a = pq.read_table(os.path.join(d_all, fn))
        b = pq.read_table(os.path.join(d_inc, fn))
        assert a.equals(b), fn
    # queries agree exactly
    r1 = query_text_index(d_inc, ["join stream"], k=5).to_pandas()
    r2 = query_text_index(d_all, ["join stream"], k=5).to_pandas()
    assert r1["doc_id"].tolist() == r2["doc_id"].tolist()
    assert np.allclose(r1["score"], r2["score"])


def test_trigram_index_exact_and_subset_read(tmp_path):
    import ray.data as rd

    from feature_extraction_ray.stages.textindex import (
        build_trigram_index, query_trigram_index)
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(["the streaming engine", "no match here",
                          "stream at the end: stream",
                          "st re am split up", ""])})
    man = build_trigram_index(rd.from_arrow(tbl), str(tmp_path),
                              num_buckets=4, num_doc_buckets=4)
    assert man["n_docs"] == 5
    opened = []
    out = query_trigram_index(str(tmp_path), "stream", _opened=opened)
    assert out["doc_id"].to_pylist() == [1, 3]
    # subset read: posting buckets of the 4 distinct trigrams + only
    # candidate doc buckets — never all files
    tri_files = [f for f in opened if f.startswith("trigrams-")]
    doc_files = [f for f in opened if f.startswith("docs-")]
    assert len(set(tri_files)) <= 4 and len(set(doc_files)) <= 2
    # absent pattern → empty, and the doc store is never opened
    opened2 = []
    out2 = query_trigram_index(str(tmp_path), "zzqx9",
                               _opened=opened2)
    assert len(out2) == 0
    assert not [f for f in opened2 if f.startswith("docs-")]
    # multibyte + prefilter-false-positive safety: byte trigrams may
    # admit candidates, residual verify must reject them
    out3 = query_trigram_index(str(tmp_path), "streaming x")
    assert len(out3) == 0
    import pytest
    with pytest.raises(ValueError):
        query_trigram_index(str(tmp_path), "ab")
