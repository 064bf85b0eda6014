"""Persistent inverted text index — the BM25 retrieval twin of the
persistent IVF-PQ index (`similarity.build_ivfpq_index`): pay one
bucketed exchange at BUILD time, then every query reads only the
posting buckets its terms hash into.

Layout (``build_text_index``): posting rows ``(term, doc_id, tf, dl)``
— dl denormalized onto every posting so scoring never joins a doc
table — hash-bucketed BY TERM into one parquet file per bucket (sorted
``(term, doc_id)``), plus ``stats.json`` with ``n_docs`` /
``total_tokens`` / ``num_buckets``. Because a term's postings live in
exactly one bucket, its document frequency is computable INSIDE that
bucket's task — queries need no global exchange for df.

Query (``query_text_index``): tokenize the query strings, open only
the touched bucket files (columns pruned to the posting schema), one
task per bucket emits final per-(query, doc) partial BM25
contributions for its terms (Robertson–Spärck Jones idf, identical
IEEE sequence to ``text.bm25_scores``); cross-bucket partials sum
through ONE doc-hash bucketed exchange (in-task lexsort/reduceat —
never a many-group Dataset aggregate) and a local-top-k + bounded
merge finishes.
Docs containing no query term never appear (score-0 candidates are
not retrieval results).

No reference counterpart (the reference has no retrieval); part of
the beyond-reference engine surface.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .partition import BUCKET_COL, _stable_hash_strings
from .text import _split_flat


def _postings_of_batch(t: pa.Table, text_col: str, id_col: str):
    """(term, doc_id, tf, dl) posting rows for one batch — dictionary
    encode + packed-pair unique, no Python word loops."""
    flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
    if real is not None:
        flat = flat.filter(pa.array(real))
        offs = np.zeros(len(n_real) + 1, dtype=np.int64)
        np.cumsum(n_real, out=offs[1:])
    else:
        offs = offsets
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    empty = pa.table({"term": pa.array([], type=pa.string()),
                      "doc_id": ids.slice(0, 0),
                      "tf": pa.array([], type=pa.int64()),
                      "dl": pa.array([], type=pa.int64())})
    if not len(flat):
        return empty, int((n_real > 0).sum()), int(n_real.sum())
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(len(n_real)), np.diff(offs))
    packed = doc_of * len(de.dictionary) + codes
    order = np.argsort(packed, kind="stable")
    sp = packed[order]
    starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
    tf = np.diff(np.r_[starts, len(sp)])
    pdoc = (sp[starts] // len(de.dictionary)).astype(np.int64)
    pterm = (sp[starts] % len(de.dictionary)).astype(np.int64)
    tbl = pa.table({
        "term": de.dictionary.take(pa.array(pterm)).cast(pa.string()),
        "doc_id": ids.take(pa.array(pdoc)),
        "tf": pa.array(tf.astype(np.int64)),
        "dl": pa.array(n_real[pdoc].astype(np.int64)),
    })
    return tbl, int((n_real > 0).sum()), int(n_real.sum())


def build_text_index(ds: Dataset, out_dir: str, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     num_buckets: int = 16) -> dict:
    """Build the on-disk index (see module docstring). One bucketed
    exchange; posting files are written INSIDE the bucket tasks."""
    os.makedirs(out_dir, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        tbl, nd, tt = _postings_of_batch(t, text_col, id_col)
        # corpus counters ride as one reserved null-term meta row
        meta = pa.table({"term": pa.array([None], type=pa.string()),
                         "doc_id": pa.array([nd], type=tbl["doc_id"].type)
                         if len(tbl) else pa.array([nd], type=pa.int64()),
                         "tf": pa.array([tt], type=pa.int64()),
                         "dl": pa.array([0], type=pa.int64())})
        return pa.concat_tables([tbl, meta.cast(tbl.schema)])

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = (_stable_hash_strings(pc.fill_null(t["term"], ""))
             % np.uint64(num_buckets)).astype(np.int32)
        # meta rows go to bucket 0
        isnull = pc.is_null(t["term"]).to_numpy(zero_copy_only=False)
        b[np.asarray(isnull, dtype=bool)] = 0
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    bucketed = posts.map_batches(assign, batch_format="pyarrow")

    def write_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        bid = int(tbl[BUCKET_COL][0].as_py())
        meta_mask = pc.is_null(tbl["term"])
        meta = tbl.filter(meta_mask)
        body = tbl.filter(pc.invert(meta_mask)).drop_columns([BUCKET_COL])
        idx = pc.sort_indices(body, sort_keys=[("term", "ascending"),
                                               ("doc_id", "ascending")])
        pq.write_table(body.take(idx),
                       os.path.join(out_dir, f"postings-{bid:04d}.parquet"))
        nd = int(pc.sum(meta["doc_id"]).as_py() or 0)
        tt = int(pc.sum(meta["tf"]).as_py() or 0)
        return pa.table({"bucket": pa.array([bid], pa.int64()),
                         "n_docs": pa.array([nd], pa.int64()),
                         "total_tokens": pa.array([tt], pa.int64()),
                         "n_postings": pa.array([len(body)], pa.int64())})

    stats = bucketed.groupby(BUCKET_COL).map_groups(
        write_bucket, batch_format="pyarrow").to_pandas()
    manifest = {
        "num_buckets": num_buckets,
        "n_docs": int(stats["n_docs"].sum()),
        "total_tokens": int(stats["total_tokens"].sum()),
        "n_postings": int(stats["n_postings"].sum()),
        "buckets": sorted(int(b) for b in stats["bucket"]),
    }
    tmp = os.path.join(out_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "stats.json"))
    return manifest


def query_text_index(out_dir: str, queries, *, k: int = 10,
                     k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """BM25 top-``k`` per query string against a built index, reading
    ONLY the posting buckets the query terms hash into. Returns
    ``(query_id, doc_id, score)`` ordered (query_id, score desc,
    doc_id)."""
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    n = float(stats["n_docs"])
    avgdl = stats["total_tokens"] / max(n, 1.0)
    nb = stats["num_buckets"]
    qterms = [sorted(set(q.split())) for q in queries]
    all_terms = sorted({t for ts in qterms for t in ts})
    if not all_terms:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    tarr = pa.array(all_terms)
    tb = (_stable_hash_strings(tarr) % np.uint64(nb)).astype(np.int64)
    by_bucket: dict[int, list[str]] = {}
    for t, bb in zip(all_terms, tb):
        by_bucket.setdefault(int(bb), []).append(t)
    term_queries = {t: [qi for qi, ts in enumerate(qterms) if t in ts]
                    for t in all_terms}
    k1p1, omb = k1 + 1.0, 1.0 - b

    @ray.remote
    def scan_bucket(bid: int, terms: list) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        path = os.path.join(out_dir, f"postings-{bid:04d}.parquet")
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "part": pa.array([], pa.float64())})
        if not os.path.exists(path):
            return empty
        tbl = pq.read_table(path)
        tbl = tbl.filter(pc.is_in(tbl["term"], value_set=pa.array(terms)))
        if len(tbl) == 0:
            return empty
        term = tbl["term"].to_numpy(zero_copy_only=False)
        tf = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = tbl["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
        # df per term: postings are unique (term, doc) rows
        uniq, inv, cnt = np.unique(term, return_inverse=True,
                                   return_counts=True)
        df = cnt[inv].astype(np.float64)
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        contrib = idf * (tf * k1p1) / (tf + k1 * (omb + b * (dl / avgdl)))
        out_q, out_d, out_c = [], [], []
        for t_i, t_name in enumerate(uniq):
            rows = np.flatnonzero(inv == t_i)
            for qi in term_queries[str(t_name)]:
                out_q.append(np.full(len(rows), qi, dtype=np.int64))
                out_d.append(doc[rows])
                out_c.append(contrib[rows])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "part": pa.array(np.concatenate(out_c))})

    import pyarrow.compute as pc
    import ray.data as rd
    from .window import bucketed_apply
    refs = [scan_bucket.remote(bid, terms)
            for bid, terms in by_bucket.items()]
    parts = rd.from_arrow_refs(refs)
    keys = [("query_id", "ascending"), ("score", "descending"),
            ("doc_id", "ascending")]

    # cross-bucket (query, doc) sums: ONE doc-hash bucketed exchange
    # (few groups → cheap) with vectorized in-task lexsort/reduceat —
    # NOT a Dataset 2-key aggregate, whose million-group sort path
    # measured 80+ s on 6M partial rows
    def sum_and_top(t: pa.Table) -> pa.Table:
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        part = t["part"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, qid))
        q, dd, p = qid[order], doc[order], part[order]
        new = np.r_[True, (q[1:] != q[:-1]) | (dd[1:] != dd[:-1])]
        starts = np.flatnonzero(new)
        score = np.add.reduceat(p, starts)
        out = pa.table({"query_id": pa.array(q[starts]),
                        "doc_id": pa.array(dd[starts]),
                        "score": pa.array(score)})
        out = out.take(pc.sort_indices(out, sort_keys=keys))
        oq = out["query_id"].to_numpy(zero_copy_only=False)
        newq = np.r_[True, oq[1:] != oq[:-1]]
        sq = np.flatnonzero(newq)
        pos = np.arange(len(oq)) - sq[np.cumsum(newq) - 1]
        return out.filter(pa.array(pos < k))

    tops = bucketed_apply(parts, "doc_id", sum_and_top,
                          num_buckets=64, drop_bucket=False) \
        .to_arrow_refs()
    tabs = [t for t in (ray.get(r) for r in tops)
            if len(t) and "query_id" in t.column_names]
    if not tabs:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    tbl = pa.concat_tables(tabs)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=keys))
    qid = tbl["query_id"].to_numpy(zero_copy_only=False)
    if len(qid):
        newq = np.r_[True, qid[1:] != qid[:-1]]
        starts = np.flatnonzero(newq)
        gid = np.cumsum(newq) - 1
        pos = np.arange(len(qid)) - starts[gid]
        tbl = tbl.filter(pa.array(pos < k))
    return tbl


def update_text_index(ds: Dataset, out_dir: str, *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """Incrementally add documents to an existing index: new posting
    partials shuffle through the SAME term-bucket assignment, and each
    touched bucket task merges its new postings into the existing file
    (read + concat + re-sort + atomic replace); corpus counters in
    ``stats.json`` advance. Duplicate doc_ids are the caller's contract
    (same as the minhash incremental store — re-adding a doc double
    counts it; dedup first).

    Cost: one exchange over the NEW postings only, plus a rewrite of
    the touched bucket files — the classic LSM-free amend path for
    append-mostly corpora (for high-churn use, collect several updates
    and rebuild)."""
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    nb = stats["num_buckets"]

    def postings(t: pa.Table) -> pa.Table:
        tbl, nd, tt = _postings_of_batch(t, text_col, id_col)
        meta = pa.table({"term": pa.array([None], type=pa.string()),
                         "doc_id": pa.array([nd], type=tbl["doc_id"].type)
                         if len(tbl) else pa.array([nd], type=pa.int64()),
                         "tf": pa.array([tt], type=pa.int64()),
                         "dl": pa.array([0], type=pa.int64())})
        return pa.concat_tables([tbl, meta.cast(tbl.schema)])

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = (_stable_hash_strings(pc.fill_null(t["term"], ""))
             % np.uint64(nb)).astype(np.int32)
        isnull = pc.is_null(t["term"]).to_numpy(zero_copy_only=False)
        b[np.asarray(isnull, dtype=bool)] = 0
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    bucketed = posts.map_batches(assign, batch_format="pyarrow")

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        bid = int(tbl[BUCKET_COL][0].as_py())
        meta_mask = pc.is_null(tbl["term"])
        meta = tbl.filter(meta_mask)
        body = tbl.filter(pc.invert(meta_mask)).drop_columns([BUCKET_COL])
        path = os.path.join(out_dir, f"postings-{bid:04d}.parquet")
        if os.path.exists(path):
            body = pa.concat_tables([pq.read_table(path),
                                     body.cast(pq.read_schema(path))])
        idx = pc.sort_indices(body, sort_keys=[("term", "ascending"),
                                               ("doc_id", "ascending")])
        tmp = path + ".tmp"
        pq.write_table(body.take(idx), tmp)
        os.replace(tmp, path)
        nd = int(pc.sum(meta["doc_id"]).as_py() or 0)
        tt = int(pc.sum(meta["tf"]).as_py() or 0)
        return pa.table({"n_docs": pa.array([nd], pa.int64()),
                         "total_tokens": pa.array([tt], pa.int64()),
                         "n_postings": pa.array([len(body)], pa.int64()),
                         "bucket": pa.array([bid], pa.int64())})

    upd = bucketed.groupby(BUCKET_COL).map_groups(
        merge_bucket, batch_format="pyarrow").to_pandas()
    stats["n_docs"] += int(upd["n_docs"].sum())
    stats["total_tokens"] += int(upd["total_tokens"].sum())
    touched = set(int(b) for b in upd["bucket"])
    # recount postings exactly via per-file parquet metadata (row
    # counts only — touched buckets report post-merge totals, so a sum
    # of deltas would double-count their old rows)
    import pyarrow.parquet as pq
    total = 0
    for fn in os.listdir(out_dir):
        if fn.startswith("postings-") and fn.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(out_dir, fn)).num_rows
    stats["n_postings"] = total
    stats["buckets"] = sorted(set(stats["buckets"]) | touched)
    tmp = os.path.join(out_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(out_dir, "stats.json"))
    return stats


# ---------------------------------------------------------------------------
# trigram substring index (pg_trgm-shaped infix search)
# ---------------------------------------------------------------------------

def _byte_trigram_keys(col):
    """All byte-level 3-gram keys of every string, fully vectorized:
    key = b0·2^16 + b1·2^8 + b2 over the raw UTF-8 buffer (byte
    trigrams, not codepoints — the index is a PREFILTER, the residual
    substring verify keeps results exact, so multibyte boundaries
    cannot cause wrong answers, only harmless extra candidates).
    Returns (doc_of, keys)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "").cast(pa.string())
    buf = np.frombuffer(col.buffers()[2], dtype=np.uint8) \
        if col.buffers()[2] is not None else np.zeros(0, np.uint8)
    offs_all = np.frombuffer(col.buffers()[1], dtype=np.int32)
    offs = offs_all[col.offset:col.offset + len(col) + 1].astype(np.int64)
    lens = np.diff(offs)
    ntri = np.maximum(lens - 2, 0)
    total = int(ntri.sum())
    doc_of = np.repeat(np.arange(len(col), dtype=np.int64), ntri)
    if total == 0:
        return doc_of, np.zeros(0, dtype=np.int64)
    first = np.zeros(len(col) + 1, dtype=np.int64)
    np.cumsum(ntri, out=first[1:])
    w = np.arange(total, dtype=np.int64) - np.repeat(first[:-1], ntri)
    p = np.repeat(offs[:-1], ntri) + w
    keys = (buf[p].astype(np.int64) << 16) \
        | (buf[p + 1].astype(np.int64) << 8) | buf[p + 2].astype(np.int64)
    return doc_of, keys


def build_trigram_index(ds: Dataset, out_dir: str, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_buckets: int = 16,
                        num_doc_buckets: int = 16) -> dict:
    """Persistent trigram SUBSTRING index (the pg_trgm shape — the
    infix-search complement of the word-level BM25 index): distinct
    (byte-trigram, doc) postings bucket by ``trigram mod num_buckets``
    into sorted parquet posting files, and the corpus itself lands in a
    doc store bucketed by ``id mod num_doc_buckets`` — so a
    ``%substring%`` lookup on an unsorted 100-TB corpus opens ONLY the
    query trigrams' posting buckets plus the candidate ids' doc-store
    files, never scanning the text. One bucketed exchange per layout;
    files written inside the bucket tasks."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        doc_of, keys = _byte_trigram_keys(t[text_col])
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(keys) == 0:
            return pa.table({"tri": pa.array([], type=pa.int64()),
                             id_col: ids.slice(0, 0)})
        packed = doc_of * np.int64(1 << 24) + keys
        u = np.unique(packed)
        return pa.table({
            "tri": pa.array(u % np.int64(1 << 24)),
            id_col: ids.take(pa.array(u // np.int64(1 << 24)))})

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        b = (t["tri"].to_numpy(zero_copy_only=False)
             % num_buckets).astype(np.int32)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    def write_bucket(tbl: pa.Table) -> pa.Table:
        bid = int(tbl[BUCKET_COL][0].as_py())
        body = tbl.drop_columns([BUCKET_COL])
        idx = pc.sort_indices(body, sort_keys=[
            ("tri", "ascending"), (id_col, "ascending")])
        pq.write_table(body.take(idx), os.path.join(
            out_dir, f"trigrams-{bid:04d}.parquet"))
        return pa.table({"bucket": pa.array([bid], pa.int64()),
                         "n_postings": pa.array([len(body)], pa.int64())})

    stats = posts.map_batches(assign, batch_format="pyarrow") \
        .groupby(BUCKET_COL).map_groups(write_bucket,
                                        batch_format="pyarrow") \
        .to_pandas()

    def assign_doc(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ids % num_doc_buckets).astype(np.int32)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    def write_doc_bucket(tbl: pa.Table) -> pa.Table:
        bid = int(tbl[BUCKET_COL][0].as_py())
        body = tbl.drop_columns([BUCKET_COL]).sort_by([(id_col,
                                                        "ascending")])
        pq.write_table(body, os.path.join(
            out_dir, f"docs-{bid:04d}.parquet"))
        return pa.table({"bucket": pa.array([bid], pa.int64()),
                         "n_docs": pa.array([len(body)], pa.int64())})

    dstats = ds.select_columns([id_col, text_col]) \
        .map_batches(assign_doc, batch_format="pyarrow") \
        .groupby(BUCKET_COL).map_groups(write_doc_bucket,
                                        batch_format="pyarrow") \
        .to_pandas()
    manifest = {"num_buckets": num_buckets,
                "num_doc_buckets": num_doc_buckets,
                "n_postings": int(stats["n_postings"].sum()),
                "n_docs": int(dstats["n_docs"].sum())}
    tmp = os.path.join(out_dir, "trigram-stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "trigram-stats.json"))
    return manifest


def query_trigram_index(out_dir: str, pattern: str, *,
                        id_col: str = "doc_id",
                        _opened=None) -> pa.Table:
    """Exact ``%pattern%`` substring lookup against a
    :func:`build_trigram_index` layout: the pattern's byte trigrams
    select posting buckets (read-pruned), candidate ids = the
    INTERSECTION of the trigrams' posting lists (a doc lacking any
    pattern trigram cannot contain the pattern), then ONLY the
    candidates' doc-store buckets are opened and
    ``pc.match_substring`` verifies exactly. Patterns shorter than 3
    bytes raise (no trigram prefilter exists — scan the corpus
    directly for those). ``_opened``: test hook, collects opened file
    names."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    pb = pattern.encode("utf-8")
    if len(pb) < 3:
        raise ValueError("pattern must be >= 3 bytes for the trigram "
                         "prefilter")
    with open(os.path.join(out_dir, "trigram-stats.json")) as f:
        man = json.load(f)
    keys = sorted({(pb[i] << 16) | (pb[i + 1] << 8) | pb[i + 2]
                   for i in range(len(pb) - 2)})
    by_bucket: dict = {}
    for k in keys:
        by_bucket.setdefault(k % man["num_buckets"], []).append(k)
    cand = None
    for b, ks in sorted(by_bucket.items()):
        fn = os.path.join(out_dir, f"trigrams-{b:04d}.parquet")
        if _opened is not None:
            _opened.append(os.path.basename(fn))
        if not os.path.exists(fn):
            return pa.table({id_col: pa.array([], type=pa.int64())})
        tbl = pq.read_table(fn, filters=[("tri", "in", ks)])
        tri = tbl["tri"].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        for k in ks:
            s = ids[tri == k]
            cand = s if cand is None else \
                np.intersect1d(cand, s, assume_unique=True)
            if cand is not None and len(cand) == 0:
                return pa.table({id_col: pa.array([], type=pa.int64())})
    matched = []
    for b in sorted({int(i) % man["num_doc_buckets"] for i in cand}):
        fn = os.path.join(out_dir, f"docs-{b:04d}.parquet")
        if _opened is not None:
            _opened.append(os.path.basename(fn))
        sub = pq.read_table(fn, filters=[(id_col, "in",
                                          cand.tolist())])
        hit = pc.match_substring(sub["text"], pattern)
        matched.append(sub.filter(hit).select([id_col]))
    out = pa.concat_tables(matched) if matched else \
        pa.table({id_col: pa.array([], type=pa.int64())})
    return out.sort_by([(id_col, "ascending")])


def build_positional_index(ds: Dataset, out_dir: str, *,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           num_buckets: int = 16) -> dict:
    """Positional inverted index — the phrase-query extension of
    :func:`build_text_index`: posting rows ``(term, doc_id, pos)``
    with ``pos`` the 1-based whitespace-token position (Python
    ``str.split`` semantics, the engine-wide convention), hash-
    bucketed BY TERM (one parquet per bucket, sorted
    (term, doc_id, pos)) + ``stats.json``. One bucketed exchange;
    files written inside the bucket tasks."""
    from .text import _split_flat
    os.makedirs(out_dir, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_of = np.repeat(np.arange(len(n_real)), n_real)
        pos = (np.arange(len(doc_of))
               - np.repeat(np.cumsum(n_real) - n_real, n_real) + 1)
        if not len(doc_of):
            return empty
        return pa.table({"term": flat.cast(pa.string()),
                         "doc_id": pa.array(ids[doc_of]),
                         "pos": pa.array(pos.astype(np.int64))})

    posts = ds.map_batches(postings, batch_format="pyarrow")

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = (_stable_hash_strings(t["term"])
             % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    bucketed = posts.map_batches(assign, batch_format="pyarrow")

    def write_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        bid = int(tbl[BUCKET_COL][0].as_py())
        body = tbl.drop_columns([BUCKET_COL])
        idx = pc.sort_indices(body, sort_keys=[
            ("term", "ascending"), ("doc_id", "ascending"),
            ("pos", "ascending")])
        pq.write_table(body.take(idx), os.path.join(
            out_dir, f"positions-{bid:04d}.parquet"))
        return pa.table({"bucket": pa.array([bid], pa.int64()),
                         "n_postings": pa.array([len(body)],
                                                pa.int64())})

    stats = bucketed.groupby(BUCKET_COL).map_groups(
        write_bucket, batch_format="pyarrow").to_pandas()
    manifest = {"num_buckets": num_buckets,
                "n_postings": int(stats["n_postings"].sum()),
                "buckets": sorted(int(b) for b in stats["bucket"])}
    tmp = os.path.join(out_dir, "pstats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "pstats.json"))
    return manifest


def phrase_search(out_dir: str, phrase: str, *,
                  num_buckets_out: int = 16) -> Dataset:
    """Exact phrase query against a :func:`build_positional_index`
    layout: docs where the phrase's tokens occur CONSECUTIVELY.
    Reads ONLY the posting buckets the phrase terms hash into,
    shifts each term's positions by its phrase offset, and
    intersects per (doc, start) across term slots (repeated phrase
    terms get one slot each — "b b" needs two adjacent b's) via a
    bitmask over the union's cells inside ONE doc-bucketed exchange
    of the FILTERED postings (bounded by the phrase terms' document
    frequency, never the corpus). Returns (doc_id, n_matches,
    first_pos) — 1-based, overlapping matches counted."""
    import pyarrow.compute as pc

    import ray.data as rd

    from .window import bucketed_apply
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    if len(terms) > 62:
        raise ValueError("phrase_search: phrase longer than 62 terms")
    with open(os.path.join(out_dir, "pstats.json")) as f:
        manifest = json.load(f)
    nb = int(manifest["num_buckets"])
    tset = sorted(set(terms))
    touched = sorted({int(_stable_hash_strings(pa.array([t]))[0]
                          % np.uint64(nb)) for t in tset})
    files = [os.path.join(out_dir, f"positions-{b:04d}.parquet")
             for b in touched
             if os.path.exists(os.path.join(
                 out_dir, f"positions-{b:04d}.parquet"))]
    if not files:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64())}))
    posts = rd.read_parquet(files, columns=["term", "doc_id", "pos"])

    def slots(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["term"], value_set=pa.array(tset))
        t = t.filter(keep)
        outs = []
        for si, term in enumerate(terms):
            m = t.filter(pc.equal(t["term"], term))
            adj = pc.subtract(m["pos"], pa.scalar(si, pa.int64()))
            outs.append(pa.table({
                "doc_id": m["doc_id"],
                "adj": pc.cast(adj, pa.int64()),
                "slot": pa.array(np.full(len(m), si, np.int64))}))
        return pa.concat_tables(outs) if outs else pa.table({
            "doc_id": pa.array([], pa.int64()),
            "adj": pa.array([], pa.int64()),
            "slot": pa.array([], pa.int64())})

    tagged = posts.map_batches(slots, batch_format="pyarrow")
    full = (np.uint64(1) << np.uint64(len(terms))) - np.uint64(1)

    def per_doc_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64()),
                          "first_pos": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        adj = t["adj"].to_numpy(zero_copy_only=False)
        slot = t["slot"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        order = np.lexsort((slot, adj, d))
        d, adj, slot = d[order], adj[order], slot[order]
        starts = np.flatnonzero(
            np.r_[True, (d[1:] != d[:-1]) | (adj[1:] != adj[:-1])])
        # OR the slot bits per (doc, adj) cell
        bits = np.uint64(1) << slot
        cell = np.zeros(len(starts), np.uint64)
        cidx = np.cumsum(np.r_[True, (d[1:] != d[:-1])
                               | (adj[1:] != adj[:-1])]) - 1
        np.bitwise_or.at(cell, cidx, bits)
        ok = (cell == full) & (adj[starts] >= 1)
        if not ok.any():
            return empty
        md = d[starts[ok]]
        mp = adj[starts[ok]]
        ds_ = np.flatnonzero(np.r_[True, md[1:] != md[:-1]])
        n = np.diff(np.r_[ds_, len(md)])
        return pa.table({
            "doc_id": pa.array(md[ds_].astype(np.int64)),
            "n_matches": pa.array(n.astype(np.int64)),
            "first_pos": pa.array(
                np.minimum.reduceat(mp, ds_).astype(np.int64))})

    return bucketed_apply(tagged, "doc_id", per_doc_bucket,
                          num_buckets_out, drop_bucket=False)
