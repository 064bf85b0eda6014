"""Exact set-similarity join — AllPairs/PPJoin-style prefix filtering.

The EXACT complement of the MinHash-LSH near-dup path (`stages/dedup.py`):
instead of banded signatures that admit false negatives, this join returns
EVERY pair of documents whose distinct word-``k``-gram sets have Jaccard
similarity ≥ threshold, with exact intersection/union counts — the
RJ/PPJoin family (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
Search"; Xiao et al., WWW'08 PPJoin), re-expressed as Ray Data exchanges.

Plan
----
1. Distinct ``(doc, gram)`` rows (vectorized flat-stream shingler, no
   per-row Python) → ONE ``groupby(gram).count()`` exchange gives global
   document frequencies (vocab-bounded output).
2. A global total order over grams by ``(df asc, gram asc)`` assigns each
   gram an injective integer rank — rare grams first, the order that
   minimizes candidates. Two plans:
   - ``plan="broadcast"`` (default): the ranked vocab is collected once,
     ``ray.put`` once, and mapped per batch with ``pc.index_in``
     (zero-copy worker cache). Right whenever the distinct-gram table
     fits the driver (Heaps-law vocabularies).
   - ``plan="partitioned"``: ranks come from a distributed
     ``row_number`` over the vocab table and are attached back to the
     gram rows through one ``attach_values`` exchange, then docs
     re-assemble through one ``bucketed_apply`` — nothing vocab-sized
     ever lands on the driver (the 100-TB path; 3 extra exchanges).
3. Each doc's set is its sorted rank array; its PREFIX is the first
   ``p = n − ceil(t·n) + 1`` ranks. Prefix-filter theorem: two sets with
   Jaccard ≥ t share at least one prefix token, so candidate generation
   explodes only prefixes. Carry rows are deduplicated map-side per
   (doc, bucket) — a doc's full array ships at most ``min(p, buckets)``
   times, never once per prefix token.
4. ONE bucketed exchange on the prefix-token hash. Inside each bucket
   task, every token run verifies ALL its candidate pairs at once with
   one boolean-membership matmul (``A @ A.T`` over the run's union
   vocabulary — no per-pair Python in the verify), and a pair is emitted
   ONLY in the run of its globally-smallest shared prefix token, so the
   output is globally distinct with no extra exchange.

Thresholds are exact rationals (``Fraction(str(t))``): the gate is the
integer cross-multiplication ``inter·den ≥ num·(n_a+n_b−inter)``, so no
float boundary ever decides membership, and the reported ``jaccard`` is
ONE float64 division of exact ints (strict SQL-oracle parity).

Reference anchor: the reference engine has no similarity join; its
nearest analogue is the per-file pandas dedup-by-exact-text. This module
is the scale-correct exact generalization the brief's dedup family needs.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .partition import stable_bucket, sort_table

__all__ = ["setsim_join", "doc_gram_sets"]


def _distinct_doc_grams(batch: pa.Table, id_col: str, text_col: str,
                        k: int) -> pa.Table:
    """Distinct ``(doc_id, gram)`` rows for one batch — vectorized:
    whitespace split, k-wide join over the flat word stream with
    doc-boundary masking, per-doc distinct via one packed np.unique."""
    words = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(batch[text_col]))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    row_len = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_docs = len(row_len)
    flat = words.flatten()
    nf = len(flat)
    doc_of = np.repeat(np.arange(n_docs), row_len)
    valid_n = max(nf - k + 1, 0)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if not valid_n:
        return pa.table({"doc_id": ids.slice(0, 0),
                         "gram": pa.array([], type=pa.large_utf8())})
    parts = [flat.slice(j, valid_n) for j in range(k)]
    grams = pc.binary_join_element_wise(
        *[p.cast(pa.large_utf8()) for p in parts],
        pa.scalar(" ", type=pa.large_utf8()))
    in_doc = doc_of[:valid_n] == doc_of[k - 1:]
    gdoc = doc_of[:valid_n][in_doc]
    grams = grams.filter(pa.array(in_doc))
    if not len(grams):
        return pa.table({"doc_id": ids.slice(0, 0),
                         "gram": pa.array([], type=pa.large_utf8())})
    # distinct (doc, gram): dictionary-encode grams, pack with doc index
    codes = grams.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    packed = gdoc * (codes.max() + 1) + codes
    _, first = np.unique(packed, return_index=True)
    return pa.table({"doc_id": ids.take(pa.array(gdoc[first])),
                     "gram": grams.take(pa.array(first))})


def doc_gram_sets(ds: Dataset, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> Dataset:
    """Distinct word-``k``-gram rows ``(doc_id, gram)`` per document.
    Docs with fewer than ``k`` words emit nothing (no short-doc
    fallback — mirrors the SQL twin's full-window gram definition)."""
    return ds.map_batches(
        lambda t: _distinct_doc_grams(t, id_col, text_col, k),
        batch_format="pyarrow")


def _prefix_len(n: np.ndarray, num: int, den: int) -> np.ndarray:
    """p = n − ceil(t·n) + 1 with t = num/den, exact integer math."""
    ceil_tn = -(-(num * n) // den)
    return n - ceil_tn + 1


class _RankMapper:
    """Per-worker cached broadcast vocab: gram string → global rank."""

    def __init__(self, vocab_ref):
        from .partition import broadcast_get
        self.vocab = broadcast_get(vocab_ref)   # pa large_utf8 array,
        #                                         position == rank

    def __call__(self, grams: pa.Array) -> np.ndarray:
        idx = pc.index_in(grams, value_set=self.vocab)
        return idx.to_numpy(zero_copy_only=False).astype(np.int64)


def _carry_rows_from_ranks(ids: pa.Array, ranks: np.ndarray,
                           doc_of: np.ndarray, n_docs: int,
                           num: int, den: int,
                           num_buckets: int) -> pa.Table:
    """Build candidate carry rows from per-doc rank multirows.

    ``ranks``/``doc_of`` are parallel arrays (already DISTINCT per doc).
    Emits one row per (doc, bucket-with-a-prefix-token): bucket, doc id,
    set size, the prefix ranks hitting that bucket, the full sorted rank
    array (rides once per bucket, not once per prefix token)."""
    order = np.lexsort((ranks, doc_of))
    ranks = ranks[order]
    doc_of = doc_of[order]
    counts = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    p = _prefix_len(counts, num, den)
    p = np.clip(p, 0, counts)
    # positions within each doc's sorted run
    pos = np.arange(len(ranks), dtype=np.int64) - starts[doc_of]
    is_prefix = pos < p[doc_of]
    pr = ranks[is_prefix]
    pdoc = doc_of[is_prefix]
    if not len(pr):
        empty_list = pa.array([], type=pa.large_list(pa.int64()))
        return pa.table({
            "__ssb": pa.array([], type=pa.int32()),
            "doc_id": ids.slice(0, 0),
            "n": pa.array([], type=pa.int64()),
            "ptoks": empty_list, "toks": empty_list})
    pb = stable_bucket(pa.array(pr), num_buckets).astype(np.int64)
    # distinct (doc, bucket) rows, prefix tokens grouped under each
    key = pdoc * num_buckets + pb
    korder = np.lexsort((pr, key))
    key_s, pr_s = key[korder], pr[korder]
    row_of = np.unique(key_s, return_inverse=True)[1]
    n_rows = int(row_of[-1]) + 1
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(row_of, minlength=n_rows), out=row_starts[1:])
    row_doc = key_s[row_starts[:-1]] // num_buckets
    row_b = (key_s[row_starts[:-1]] % num_buckets).astype(np.int32)
    ptoks = pa.LargeListArray.from_arrays(row_starts, pa.array(pr_s))
    # full arrays: offsets into the doc-sorted rank stream per row
    toks_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts[row_doc], out=toks_off[1:])
    total = int(toks_off[-1])
    within = np.arange(total, dtype=np.int64) - \
        np.repeat(toks_off[:-1], counts[row_doc])
    toks_idx = np.repeat(starts[row_doc], counts[row_doc]) + within
    toks = pa.LargeListArray.from_arrays(toks_off,
                                         pa.array(ranks[toks_idx]))
    return pa.table({
        "__ssb": pa.array(row_b),
        "doc_id": ids.take(pa.array(row_doc)),
        "n": pa.array(counts[row_doc]),
        "ptoks": ptoks, "toks": toks})


def _verify_bucket(tbl: pa.Table, num: int, den: int) -> pa.Table:
    """Verify one bucket: per prefix-token run, all-pairs exact
    intersections via one boolean matmul; emit a pair only at its
    globally-smallest shared prefix token."""
    id_t = tbl["doc_id"].combine_chunks() if isinstance(
        tbl["doc_id"], pa.ChunkedArray) else tbl["doc_id"]
    n = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ptoks = tbl["ptoks"]
    toks = tbl["toks"]
    if isinstance(ptoks, pa.ChunkedArray):
        ptoks = ptoks.combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    p_off = ptoks.offsets.to_numpy(zero_copy_only=False)
    p_val = ptoks.values.to_numpy(zero_copy_only=False)
    t_off = toks.offsets.to_numpy(zero_copy_only=False)
    t_val = toks.values.to_numpy(zero_copy_only=False)
    # ids as a sortable numpy view for i<j ordering (int or string)
    ids_np = id_t.to_numpy(zero_copy_only=False)
    # explode prefix tokens → (token, row) sorted by token
    row_of = np.repeat(np.arange(len(tbl)), p_off[1:] - p_off[:-1])
    order = np.lexsort((row_of, p_val))
    tok_s, row_s = p_val[order], row_of[order]
    run_starts = np.flatnonzero(np.r_[True, tok_s[1:] != tok_s[:-1]])
    run_ends = np.r_[run_starts[1:], len(tok_s)]
    out_a, out_b = [], []
    out_na, out_nb, out_int = [], [], []
    pn = _prefix_len(n, num, den)
    for s, e in zip(run_starts, run_ends):
        g = e - s
        if g < 2:
            continue
        w = tok_s[s]
        rows = row_s[s:e]
        # union vocabulary of the run's full arrays
        segs = [t_val[t_off[r]:t_off[r + 1]] for r in rows]
        uni = np.unique(np.concatenate(segs))
        A = np.zeros((g, len(uni)), dtype=np.float32)
        for i, seg in enumerate(segs):
            A[i, np.searchsorted(uni, seg)] = 1.0
        inter = (A @ A.T).astype(np.int64)
        ni = n[rows]
        iu, ju = np.triu_indices(g, 1)
        iv = inter[iu, ju]
        un = ni[iu] + ni[ju] - iv
        ok = np.flatnonzero(iv * den >= num * un)
        # emit-once: only the run of the smallest shared PREFIX token
        # emits a pair (cheap per-PASSING-pair check, not per-candidate)
        for q in ok:
            ra, rb = rows[iu[q]], rows[ju[q]]
            pa_i = t_val[t_off[ra]:t_off[ra] + pn[ra]]
            pa_j = t_val[t_off[rb]:t_off[rb] + pn[rb]]
            common = np.intersect1d(pa_i, pa_j, assume_unique=True)
            if common[0] != w:
                continue
            if ids_np[ra] > ids_np[rb]:
                ra, rb = rb, ra
            out_a.append(ra)
            out_b.append(rb)
            out_na.append(n[ra])
            out_nb.append(n[rb])
            out_int.append(int(iv[q]))
    if not out_a:
        return pa.table({
            "id_a": id_t.slice(0, 0), "id_b": id_t.slice(0, 0),
            "n_a": pa.array([], type=pa.int64()),
            "n_b": pa.array([], type=pa.int64()),
            "n_inter": pa.array([], type=pa.int64()),
            "n_union": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())})
    na = np.array(out_na, dtype=np.int64)
    nb = np.array(out_nb, dtype=np.int64)
    iv = np.array(out_int, dtype=np.int64)
    un = na + nb - iv
    return pa.table({
        "id_a": id_t.take(pa.array(np.array(out_a, dtype=np.int64))),
        "id_b": id_t.take(pa.array(np.array(out_b, dtype=np.int64))),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "n_inter": pa.array(iv), "n_union": pa.array(un),
        "jaccard": pa.array(iv.astype(np.float64) / un.astype(np.float64)),
    })


def setsim_join(ds: Dataset, id_col: str = "doc_id",
                text_col: str = "text", k: int = 3,
                threshold: float = 0.5, num_buckets: int = 32,
                plan: str = "broadcast") -> Dataset:
    """All pairs of docs with word-``k``-gram-set Jaccard ≥ threshold,
    EXACT (no false positives or negatives). Output: one row per
    unordered pair ``(id_a < id_b, n_a, n_b, n_inter, n_union,
    jaccard)``. See module docstring for the two plans."""
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    if not (0 < frac <= 1):
        raise ValueError("threshold must be in (0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    grams = doc_gram_sets(ds, id_col, text_col, k)
    df = grams.groupby("gram").count()          # exchange 1 (vocab-sized)

    if plan == "broadcast":
        import ray
        bts = [b for b in df.iter_batches(batch_format="pyarrow")
               if b.num_rows and "gram" in b.schema.names]
        if bts:
            vt = pa.concat_tables([pa.table(
                {"gram": b["gram"], "df": b["count()"]}) for b in bts])
        else:
            vt = pa.table({"gram": pa.array([], type=pa.large_utf8()),
                           "df": pa.array([], type=pa.int64())})
        vt = sort_table(vt, ["df", "gram"])
        vocab = vt["gram"].combine_chunks().cast(pa.large_utf8())
        vocab_ref = ray.put(vocab)

        def to_carry(batch: pa.Table) -> pa.Table:
            from .partition import cached_kernel
            g = _distinct_doc_grams(batch, id_col, text_col, k)
            mapper = cached_kernel(_RankMapper, vocab_ref)
            garr = g["gram"]
            if isinstance(garr, pa.ChunkedArray):
                garr = garr.combine_chunks()
            ranks = mapper(garr)
            # doc_of: map distinct-gram rows back to batch rows via ids
            ids = batch[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            doc_idx = pc.index_in(g["doc_id"], value_set=ids) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _carry_rows_from_ranks(ids, ranks, doc_idx,
                                          len(batch), num, den,
                                          num_buckets)

        carry = ds.map_batches(to_carry, batch_format="pyarrow")
    elif plan == "partitioned":
        carry = _carry_partitioned(ds, grams, df, id_col, text_col,
                                   num, den, num_buckets)
    else:
        raise ValueError(f"unknown plan: {plan!r}")

    out = carry.groupby("__ssb").map_groups(
        lambda t: _verify_bucket(t, num, den), batch_format="pyarrow")
    return out


def _carry_partitioned(ds: Dataset, grams: Dataset, df: Dataset,
                       id_col: str, text_col: str,
                       num: int, den: int, num_buckets: int) -> Dataset:
    """The nothing-on-the-driver plan: distributed row_number over the
    vocab gives ranks, one attach_values puts them on the gram rows, one
    bucketed_apply re-assembles docs into carry rows."""
    from .cc import attach_values
    from .partition import row_number
    from .window import bucketed_apply

    def _rn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "gram" not in t.schema.names:
            return pa.table({"gram": pa.array([], type=pa.large_utf8()),
                             "df": pa.array([], type=pa.int64())})
        return pa.table({"gram": t["gram"].cast(pa.large_utf8()),
                         "df": t["count()"]})

    vocab_ranked = row_number(
        df.map_batches(_rn, batch_format="pyarrow"),
        ["df", "gram"], out_col="rank", start=0)
    ranked = attach_values(grams, "gram", vocab_ranked, "gram",
                           ["rank"], how="inner",
                           num_buckets=num_buckets)

    def assemble(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [id_col, "rank"])
        ids = tbl[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        codes = ids.dictionary_encode()
        doc_of = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq_ids = codes.dictionary
        ranks = tbl["rank"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return _carry_rows_from_ranks(uniq_ids, ranks, doc_of,
                                      len(uniq_ids), num, den,
                                      num_buckets)

    return bucketed_apply(ranked, id_col, assemble,
                          num_buckets=num_buckets, drop_bucket=False)
