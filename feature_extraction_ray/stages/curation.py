"""Training-data curation operators: benchmark decontamination,
token-budget quota sampling, repetition statistics (Gopher-style), and
concat-and-chunk sequence packing.

These are the corpus-curation steps a pretraining data pipeline runs
AFTER dedup (`stages/dedup.py`) and quality scoring (`stages/text.py`):

- :func:`decontaminate` — drop/flag corpus docs that share any word
  k-gram with an evaluation/benchmark set (the published n-gram-overlap
  decontamination procedure, e.g. GPT-3 appendix C / PaLM app. 10.1:
  hash the eval set's n-grams once, broadcast, filter the corpus
  stream). The eval side is SMALL by construction (benchmark suites are
  MBs, the corpus is TBs), so the gram set is collected to the driver
  once, ``ray.put`` once, and read zero-copy by every task via
  ``broadcast_get`` — no shuffle, no per-batch reship.
- :func:`token_budget_sample` — per-group (source/domain) quota
  sampling: keep documents in a deterministic order until the group's
  running token total exceeds a budget. This is the domain-mixture
  step ("x billion tokens of source A, y of source B"); deterministic
  (hash-free order column), so re-runs and repartitionings pick the
  same documents. One bucketed exchange (the engine's cumsum path).
- :func:`repetition_stats` — per-document n-gram occurrence counts
  (total / distinct / max-count) feeding the Gopher repetition filters
  ("fraction of duplicated n-grams"); integer outputs so the oracle
  comparison is bit-exact. Zero shuffles: one vectorized pass.
- :func:`pack_chunks` — GPT-style sequence packing: concatenate all
  documents in a global deterministic order and cut the token stream
  into fixed-size chunks; emits each document's chunk span. The global
  prefix sum is the textbook two-phase scan: parallel per-block sums →
  O(num_blocks) driver-side exclusive scan → parallel per-block
  finalize. No all-to-all beyond the range-partition sort; the driver
  holds one integer per block.

Reference repo has no corpus-curation stage (it is a feature extractor);
these operators extend the engine per the driver brief's
training-data-pipeline mandate. Partitioning assumptions are documented
per function.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .dedup import _shingles_of_batch
from .partition import broadcast_get, cached_kernel
from .text import ws_token_count

# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def eval_gram_hashes(eval_ds: Dataset, text_col: str = "text",
                     k: int = 5) -> np.ndarray:
    """Sorted uint64 hashes of every distinct word ``k``-gram in the eval
    set (docs shorter than ``k`` words contribute their whole text as one
    gram — same convention as the MinHash shingler, so the two stages
    share one kernel). The result is driver-side BY DESIGN: benchmark
    suites are small; the corpus never lands on the driver."""
    def grams(batch: pa.Table) -> pa.Table:
        sh, _ = _shingles_of_batch(batch, text_col, k)
        return pa.table({"g": pa.array(np.unique(sh), type=pa.uint64())})

    rows = eval_ds.map_batches(grams, batch_format="pyarrow").take_all()
    if not rows:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.array([r["g"] for r in rows], dtype=np.uint64))


class _DecontamScorer:
    """Per-worker kernel: broadcast eval-gram membership via one
    ``searchsorted`` per batch (grams array fetched zero-copy once per
    worker process through ``broadcast_get``)."""

    def __init__(self, grams_ref, text_col: str, k: int):
        self.grams_ref = grams_ref
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams = broadcast_get(self.grams_ref)
        sh, offsets = _shingles_of_batch(batch, self.text_col, self.k)
        n_overlap = np.zeros(len(batch), dtype=np.int64)
        if len(sh) and len(grams):
            idx = np.searchsorted(grams, sh)
            idx[idx == len(grams)] = 0
            hit = grams[idx] == sh
            seg_len = offsets[1:] - offsets[:-1]
            doc_of = np.repeat(np.arange(len(batch)), seg_len)
            n_overlap += np.bincount(doc_of[hit], minlength=len(batch)
                                     ).astype(np.int64)
        batch = batch.append_column(
            "n_overlap", pa.array(n_overlap, type=pa.int64()))
        return batch.append_column(
            "keep", pa.array(n_overlap == 0, type=pa.bool_()))


def decontaminate(ds: Dataset, eval_ds: Dataset, text_col: str = "text",
                  k: int = 5, drop: bool = False) -> Dataset:
    """Flag (or drop, ``drop=True``) corpus documents sharing any word
    ``k``-gram with ``eval_ds``. Appends ``n_overlap`` (count of the
    document's DISTINCT grams found in the eval set) and ``keep``.

    Scale shape: eval grams = one ``ray.put`` broadcast (uint64 array,
    zero-copy reads), corpus = streamed ``map_batches`` with no shuffle.
    For an eval side too large to broadcast (not the normal regime),
    explode grams and use `stages/relational.semi_join` instead."""
    grams = eval_gram_hashes(eval_ds, text_col, k)
    ref = ray.put(grams)

    def score(batch: pa.Table) -> pa.Table:
        kern = cached_kernel(_DecontamScorer, ref, text_col, k)
        return kern(batch)

    out = ds.map_batches(score, batch_format="pyarrow")
    if drop:
        out = out.filter(expr="n_overlap == 0")
    return out


def eval_gram_table(eval_ds: Dataset, text_col: str = "text", k: int = 5,
                    id_col: str = "doc_id") -> dict:
    """Per-eval-doc distinct gram-hash table for fuzzy decontamination:
    ``g_sorted`` (uint64, sorted), ``eid_of`` (aligned index into
    ``eval_ids``), ``esize`` (distinct-gram count per eval doc),
    ``eval_ids``. Driver-side by design (benchmark suites are small) —
    one broadcast, never the corpus."""
    def grams(batch: pa.Table) -> pa.Table:
        sh, offsets = _shingles_of_batch(batch, text_col, k)
        seg = offsets[1:] - offsets[:-1]
        doc_of = np.repeat(np.arange(len(batch)), seg)
        order = np.lexsort((sh, doc_of))
        shs, ds_ = sh[order], doc_of[order]
        head = np.r_[True, (ds_[1:] != ds_[:-1]) | (shs[1:] != shs[:-1])] \
            if len(shs) else np.zeros(0, dtype=bool)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(shs[head], type=pa.uint64()),
            "eid": pa.array(ids[ds_[head]].astype(np.int64))})

    rows = eval_ds.map_batches(grams, batch_format="pyarrow").to_pandas()
    eval_ids, eidx = np.unique(rows["eid"].to_numpy(), return_inverse=True)
    g = rows["g"].to_numpy().astype(np.uint64)
    order = np.argsort(g, kind="stable")
    return {"g_sorted": g[order],
            "eid_of": eidx[order].astype(np.int64),
            "esize": np.bincount(eidx, minlength=len(eval_ids))
            .astype(np.int64),
            "eval_ids": eval_ids.astype(np.int64)}


class _FuzzyDecontamScorer:
    """Per-worker kernel: exact per-(corpus doc, eval doc) Jaccard over
    distinct word-k-gram hashes against the broadcast eval table. One
    searchsorted range-lookup per batch finds every (doc shingle, eval
    doc) hit; a packed-key unique turns hits into intersection counts;
    Jaccard = inter / (|doc| + |eval| − inter) as ONE float64 division
    (exact-comparable against the SQL twin). Zero shuffles."""

    def __init__(self, ref, text_col: str, k: int, threshold: float):
        self.ref = ref
        self.text_col = text_col
        self.k = k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        tab = broadcast_get(self.ref)
        g_sorted, eid_of = tab["g_sorted"], tab["eid_of"]
        esize, eval_ids = tab["esize"], tab["eval_ids"]
        n = len(batch)
        sh, offsets = _shingles_of_batch(batch, self.text_col, self.k)
        seg = offsets[1:] - offsets[:-1]
        doc_of = np.repeat(np.arange(n), seg)
        order = np.lexsort((sh, doc_of))
        shs, ds_ = sh[order], doc_of[order]
        head = np.r_[True, (ds_[1:] != ds_[:-1]) | (shs[1:] != shs[:-1])] \
            if len(shs) else np.zeros(0, dtype=bool)
        shd, dd = shs[head], ds_[head]
        doc_sizes = np.bincount(dd, minlength=n).astype(np.int64)
        max_jac = np.zeros(n, dtype=np.float64)
        best_eid = np.zeros(n, dtype=np.int64)
        best_inter = np.zeros(n, dtype=np.int64)
        best_uni = np.zeros(n, dtype=np.int64)
        has = np.zeros(n, dtype=bool)
        if len(shd) and len(g_sorted):
            lo = np.searchsorted(g_sorted, shd, side="left")
            hi = np.searchsorted(g_sorted, shd, side="right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot:
                rep_doc = np.repeat(dd, cnt)
                base = np.repeat(np.cumsum(cnt) - cnt, cnt)
                idx = np.repeat(lo, cnt) + (np.arange(tot) - base)
                rep_e = eid_of[idx]
                ne = len(eval_ids)
                packed = rep_doc * ne + rep_e
                u, inter = np.unique(packed, return_counts=True)
                pd_doc = (u // ne).astype(np.int64)
                pd_e = (u % ne).astype(np.int64)
                inter = inter.astype(np.int64)
                uni = doc_sizes[pd_doc] + esize[pd_e] - inter
                jac = inter.astype(np.float64) / uni.astype(np.float64)
                # per doc: max jaccard, ties -> lowest eval doc id
                o2 = np.lexsort((eval_ids[pd_e], -jac, pd_doc))
                h2 = np.r_[True, pd_doc[o2][1:] != pd_doc[o2][:-1]]
                top = o2[h2]
                max_jac[pd_doc[top]] = jac[top]
                best_eid[pd_doc[top]] = eval_ids[pd_e[top]]
                best_inter[pd_doc[top]] = inter[top]
                best_uni[pd_doc[top]] = uni[top]
                has[pd_doc[top]] = True
        batch = batch.append_column(
            "max_jaccard", pa.array(max_jac))
        batch = batch.append_column(
            "best_eval_id", pa.array(best_eid, mask=~has))
        batch = batch.append_column(
            "n_inter", pa.array(best_inter, type=pa.int64()))
        batch = batch.append_column(
            "n_union", pa.array(best_uni, type=pa.int64()))
        return batch.append_column(
            "keep", pa.array(max_jac < self.threshold, type=pa.bool_()))


def fuzzy_decontaminate(ds: Dataset, eval_ds: Dataset,
                        text_col: str = "text", k: int = 5,
                        threshold: float = 0.8, drop: bool = False,
                        id_col: str = "doc_id") -> Dataset:
    """Near-duplicate benchmark decontamination: flag (or drop) corpus
    documents whose distinct word-``k``-gram Jaccard similarity with ANY
    eval document reaches ``threshold`` — the fuzzy complement of
    :func:`decontaminate` (exact contamination survives paraphrase-level
    edits that break every shared gram only rarely; FineWeb/GPT-3-style
    pipelines run both). Appends ``max_jaccard``, ``best_eval_id``
    (null when no gram is shared), exact integer witnesses ``n_inter`` /
    ``n_union`` for the best pair, and ``keep``.

    Scale shape: identical to :func:`decontaminate` — eval gram table
    broadcast once (``ray.put`` + ``broadcast_get``), corpus streamed
    through one vectorized ``map_batches`` pass, ZERO shuffles. The
    per-(doc, eval) Jaccard is exact (not MinHash-estimated): the eval
    side is small, so exactness costs one searchsorted per batch."""
    tab = eval_gram_table(eval_ds, text_col, k, id_col)
    ref = ray.put(tab)

    def score(batch: pa.Table) -> pa.Table:
        kern = cached_kernel(_FuzzyDecontamScorer, ref, text_col, k,
                             threshold)
        return kern(batch)

    out = ds.map_batches(score, batch_format="pyarrow")
    if drop:
        out = out.filter(expr="keep")
    return out


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (name, RE2 pattern, replacement) applied IN ORDER, each pass global.
#: Order matters: URLs are scrubbed before bare IPs so an address inside
#: a URL is attributed to the URL rule; emails go first (an email never
#: contains whitespace, so later rules can't split one). RE2 only — the
#: same dialect pyarrow (replace_substring_regex) and DuckDB
#: (regexp_replace 'g') both compile, so oracle parity is exact.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii(ds: Dataset, text_col: str = "text",
              patterns: Sequence[tuple[str, str, str]] | None = None,
              counts: bool = True) -> Dataset:
    """Redact PII-shaped spans (emails, URLs, IPv4s, phone numbers by
    default) from ``text_col`` in place. With ``counts=True`` appends one
    ``n_<name>`` int64 column per rule — the count is taken on the text
    AS EACH RULE SEES IT (after the previous rules' replacements), so
    counts sum to the number of replacements actually made.

    Zero shuffles, no Python-level row loop: each rule is one vectorized
    RE2 count + one vectorized RE2 replace over the batch
    (`pyarrow.compute.count_substring_regex` /
    `replace_substring_regex`). Patterns must stay in RE2 syntax so the
    DuckDB oracle (`regexp_replace(..., 'g')`) matches byte-for-byte."""
    pats = list(PII_PATTERNS if patterns is None else patterns)

    def scrub(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch[text_col], pa.string())
        new_cols = []
        for name, pat, repl in pats:
            if counts:
                n = pc.cast(pc.count_substring_regex(txt, pattern=pat),
                            pa.int64())
                new_cols.append((f"n_{name}", n))
            txt = pc.replace_substring_regex(
                txt, pattern=pat, replacement=repl)
        batch = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, txt)
        for cname, arr in new_cols:
            batch = batch.append_column(cname, arr)
        return batch

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# temperature-based domain mixture weights
# ---------------------------------------------------------------------------

def mixture_weights(ds: Dataset, group_col: str = "source",
                    text_col: str = "text", alpha: float = 0.3,
                    token_budget: int = 1_000_000,
                    token_col: str | None = None):
    """Temperature-based domain mixing (the GPT-3/PaLM multinomial
    data-mixture step): weight each domain ``∝ n_tokensᵅ`` — ``α = 1``
    is proportional sampling, ``α = 0`` uniform, intermediate values
    upsample small domains. Returns one row per domain (pandas —
    domain count is bounded by construction) with ``n_docs``,
    ``n_tokens`` (exact int64), ``weight`` (normalized), and
    ``sampled_tokens`` / ``epochs`` for the given ``token_budget``
    (epochs > 1 flags domains the mixture would repeat).

    Scale shape: per-batch token counts (vectorized
    :func:`~feature_extraction_ray.stages.text.ws_token_count`, or a
    precomputed ``token_col``) ride ONE tiny groupby on the domain key;
    the driver sees #domains rows. The power sum is accumulated in
    ``group_col``-sorted order, deterministically."""
    from ray.data.aggregate import Count, Sum

    if token_col is None:
        def count(t: pa.Table) -> pa.Table:
            return pa.table({group_col: t[group_col],
                             "__n_tok": ws_token_count(t[text_col])})
        counted = ds.map_batches(count, batch_format="pyarrow")
        token_col = "__n_tok"
    else:
        counted = ds
    pdf = counted.groupby(group_col).aggregate(
        Count(alias_name="n_docs"),
        Sum(token_col, alias_name="n_tokens")).to_pandas()
    if group_col not in pdf.columns:     # empty input: no groups at all
        import pandas as _pd
        return _pd.DataFrame({group_col: [], "n_docs": [], "n_tokens": [],
                              "weight": [], "sampled_tokens": [],
                              "epochs": []})
    pdf = pdf.sort_values(group_col,
                          kind="stable").reset_index(drop=True)
    pdf["n_docs"] = pdf["n_docs"].astype("int64")
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    n = pdf["n_tokens"].to_numpy().astype(np.float64)
    p = np.power(n, float(alpha))
    s = float(p.sum())
    w = p / s
    pdf["weight"] = w
    pdf["sampled_tokens"] = w * float(token_budget)
    pdf["epochs"] = w * float(token_budget) / n
    return pdf


# ---------------------------------------------------------------------------
# token-budget quota sampling
# ---------------------------------------------------------------------------

def token_budget_sample(ds: Dataset, group_col: str, budget,
                        order_cols: Sequence[str],
                        token_col: str | None = None,
                        text_col: str = "text",
                        num_buckets: int = 64) -> Dataset:
    """Per-group token quota: keep rows in ``order_cols`` order while the
    group's running token total (INCLUDING the current row) stays ≤
    ``budget``. Appends ``n_tok`` (if derived from ``text_col``) and
    ``cum_tok``. Deterministic — the cut is a pure function of the
    ordered group, so re-runs/repartitions keep identical documents.

    ``budget`` is one int for every group, or a ``{group_value:
    budget}`` mapping (groups not in the mapping are dropped) — the
    mixture-sampling shape: feed it ``mixture_weights(...)``'s
    ``sampled_tokens`` column to realize a temperature-based mix. The
    mapping is bounded by domain count (broadcast in the task closure).

    One bucketed exchange (`window.cumulative`); groups must each fit a
    task (same invariant as every windowed operator here)."""
    from .window import cumulative

    if token_col is None:
        token_col = "n_tok"

        def add_tok(t: pa.Table) -> pa.Table:
            return t.append_column("n_tok", ws_token_count(t[text_col]))

        ds = ds.map_batches(add_tok, batch_format="pyarrow")

    budget_map = None
    if isinstance(budget, dict):
        keys = sorted(budget)
        budget_map = (pa.array(keys),
                      np.array([int(budget[k]) for k in keys],
                               dtype=np.int64))

    out = cumulative(ds, group_col, list(order_cols), [token_col],
                     agg="sum", suffix="__cum", num_buckets=num_buckets)

    def cut(t: pa.Table) -> pa.Table:
        cum = t[f"{token_col}__cum"]
        if budget_map is None:
            keep = pc.less_equal(cum, budget)
        else:
            idx = pc.index_in(t[group_col], value_set=budget_map[0])
            pos = idx.to_numpy(zero_copy_only=False)
            miss = np.array(pc.is_null(idx).to_numpy(
                zero_copy_only=False))
            lim = np.where(miss, np.int64(-1),
                           budget_map[1][np.where(miss, 0, pos)
                                         .astype(np.int64)])
            keep = pc.less_equal(cum, pa.array(lim))
        t = t.filter(keep)
        cum = pc.cast(t[f"{token_col}__cum"], pa.int64())
        return t.drop_columns([f"{token_col}__cum"]).append_column(
            "cum_tok", cum)

    return out.map_batches(cut, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# classifier-based quality sampling (the GPT-3/WebText filter)
# ---------------------------------------------------------------------------

def quality_classifier_sample(raw: Dataset, target: Dataset, *,
                              seed: int = 0, pareto_alpha: float = 9.0,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              nb_alpha: float = 1.0) -> Dataset:
    """GPT-3/WebText-style quality filtering (Brown et al. 2020,
    App. A): fit a target-vs-pool document classifier, score every pool
    doc, and keep a doc iff its Pareto draw exceeds ``1 − quality`` —
    the paper's ``np.random.pareto(9) > 1 − score`` acceptance, made
    fully deterministic: the draw is the inverse-CDF ``u^(−1/α) − 1``
    with ``u = (knuth_hash(doc_id + seed) + 0.5) / 2³²`` (same seeded
    hash family the DSIR Gumbel uses, so the SQL twin reproduces it in
    HUGEINT arithmetic). The classifier is the engine's multinomial NB
    (`text.fit_naive_bayes` — the public replacement for the paper's
    logistic regression over hashed features); ``quality =
    P(target|doc) = σ(nb_T − nb_R)`` from the two log-posteriors.

    Ray plan: fit = ONE (label, word) count exchange over the tagged
    union; score + sample = one broadcast zero-shuffle pass that
    appends ``quality`` / ``pareto`` and filters — the pool streams
    through once, nothing corpus-sized lands anywhere. Returns the
    sampled pool rows (original columns + ``nb_T``/``nb_R``/
    ``quality``/``pareto``)."""
    from .text import fit_naive_bayes, naive_bayes_scores

    def lab(v: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({text_col: t[text_col],
                             "__qlab": pa.array([v] * len(t))})
        return fn

    train = target.map_batches(lab("T"), batch_format="pyarrow") \
        .union(raw.map_batches(lab("R"), batch_format="pyarrow"))
    model = fit_naive_bayes(train, "__qlab", text_col, alpha=nb_alpha)
    wide = naive_bayes_scores(raw, model, text_col, id_col,
                              output="wide")

    def sample(t: pa.Table) -> pa.Table:
        st = t["nb_T"].to_numpy(zero_copy_only=False)
        sr = t["nb_R"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            q = 1.0 / (1.0 + np.exp(-(st - sr)))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = ((ids.astype(np.uint64) + np.uint64(seed))
             * np.uint64(2654435761)) % np.uint64(4294967296)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        par = np.power(u, -1.0 / pareto_alpha) - 1.0
        keep = par > 1.0 - q
        t = t.append_column("quality", pa.array(q))
        t = t.append_column("pareto", pa.array(par))
        return t.filter(pa.array(keep))

    return wide.map_batches(sample, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style duplicated-n-gram signals)
# ---------------------------------------------------------------------------

def _gram_run_stats(sh: np.ndarray, n_grams: np.ndarray):
    """Per-doc (n_distinct, max_count) from ``(doc, gram)``-sorted gram
    hashes (``unique=False`` shingle output). Run-length counting:
    segmented twice — gram runs within docs, then doc runs within the
    run list — all ``reduceat``-free and loop-free."""
    n_docs = len(n_grams)
    n_distinct = np.zeros(n_docs, dtype=np.int64)
    max_count = np.zeros(n_docs, dtype=np.int64)
    if len(sh):
        doc_of = np.repeat(np.arange(n_docs), n_grams)
        new_run = np.r_[True, (sh[1:] != sh[:-1]) |
                        (doc_of[1:] != doc_of[:-1])]
        run_starts = np.flatnonzero(new_run)
        run_doc = doc_of[run_starts]
        run_len = np.diff(np.r_[run_starts, len(sh)])
        n_distinct += np.bincount(run_doc, minlength=n_docs)
        # runs are doc-sorted: per-doc max run length via one more
        # segmented pass (every present doc has ≥1 run, so no empty
        # reduceat segments)
        doc_run_starts = np.flatnonzero(
            np.r_[True, run_doc[1:] != run_doc[:-1]])
        seg_max = np.maximum.reduceat(run_len, doc_run_starts)
        max_count[run_doc[doc_run_starts]] = seg_max
    return n_distinct, max_count


def repetition_stats(ds: Dataset, text_col: str = "text",
                     id_cols: Sequence[str] = ("doc_id",),
                     k: int = 2) -> Dataset:
    """Per-document word ``k``-gram occurrence counts: ``n_grams`` (with
    repeats), ``n_distinct``, ``max_count`` (the most-repeated gram) —
    the integer numerators/denominators of the Gopher repetition
    filters (duplicated-n-gram fraction = ``1 - n_distinct/n_grams``,
    top-gram fraction = ``max_count/n_grams``). Integers only, so the
    oracle comparison is exact. Zero shuffles; empty documents yield no
    row (they have no grams)."""
    def stats(batch: pa.Table) -> pa.Table:
        sh, offsets = _shingles_of_batch(batch, text_col, k, unique=False)
        n_grams = offsets[1:] - offsets[:-1]
        n_distinct, max_count = _gram_run_stats(sh, n_grams)
        keep = n_grams > 0
        cols = {c: batch[c].filter(pa.array(keep)) for c in id_cols}
        cols["n_grams"] = pa.array(n_grams[keep], type=pa.int64())
        cols["n_distinct"] = pa.array(n_distinct[keep], type=pa.int64())
        cols["max_count"] = pa.array(max_count[keep], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow")


def repetition_filter(ds: Dataset, text_col: str = "text", k: int = 2,
                      max_dup_pct: int = 30,
                      max_top_pct: int = 20) -> Dataset:
    """Gopher-style gate over :func:`repetition_stats` signals, done in
    exact integer arithmetic inline with the corpus stream (no join):
    keep docs where duplicated-gram fraction ≤ ``max_dup_pct``% AND the
    top gram's share ≤ ``max_top_pct``%."""
    def gate(batch: pa.Table) -> pa.Table:
        sh, offsets = _shingles_of_batch(batch, text_col, k, unique=False)
        n_grams = offsets[1:] - offsets[:-1]
        n_distinct, max_count = _gram_run_stats(sh, n_grams)
        ok = ((n_grams - n_distinct) * 100 <= max_dup_pct * n_grams) & \
             (max_count * 100 <= max_top_pct * n_grams) & (n_grams > 0)
        return batch.filter(pa.array(ok))

    return ds.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# whole-document sequence packing (best-fit decreasing)
# ---------------------------------------------------------------------------

def pack_sequences_bfd(ds: Dataset, token_col: str = "n_tok",
                       id_col: str = "doc_id", seq_len: int = 2048,
                       num_buckets: int = 32) -> Dataset:
    """Pack WHOLE documents into ≤ ``seq_len``-token bins — the
    SFT-style sample packing that never splits a document (contrast
    :func:`pack_chunks`, the GPT concat-and-chunk path that does).
    Best-Fit-Decreasing per bucket: docs sorted by descending length
    (id tie-break), each placed into the open bin with the smallest
    remaining capacity that fits, else a new bin — the classic 11/9·OPT
    heuristic, and within a bucket at most ONE bin ends ≤ half full.
    Oversized docs (``n_tok > seq_len``) get their own bin, flagged.

    Emits one row per doc: ``id_col``, ``token_col``, ``bin_id``
    (globally unique int64: ``bucket · 2³² + local bin``), ``bin_fill``
    (the bin's FINAL token total, repeated on each member) and
    ``oversize``. Deterministic — a pure function of the bucket's doc
    multiset, stable across reruns/repartitions (hash bucketing).

    Scale shape: ONE bucketed exchange; packing is per-bucket with
    cross-bucket waste bounded by one under-half bin per bucket. The
    in-task loop is a bisect over the sorted open-bin capacities
    (O(docs · bins) memmove worst case — size buckets so one bucket's
    bins stay ≈ thousands; every other op here is loop-free, this one
    is inherently sequential)."""
    import bisect

    from .window import bucketed_apply

    def pack(tbl: pa.Table) -> pa.Table:
        from .partition import BUCKET_COL
        n = len(tbl)
        if n == 0:
            return pa.table({
                id_col: tbl[id_col],
                token_col: pa.array([], type=pa.int64()),
                "bin_id": pa.array([], type=pa.int64()),
                "bin_fill": pa.array([], type=pa.int64()),
                "oversize": pa.array([], type=pa.bool_())})
        bucket = int(tbl[BUCKET_COL][0].as_py())
        lens = tbl[token_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -lens))
        bin_of = np.empty(n, dtype=np.int64)
        oversize = lens > seq_len
        # open bins: remaining capacities kept sorted (parallel bin ids)
        caps: list = []
        cap_bin: list = []
        fills: list = []
        next_bin = 0
        for i in order:
            L = int(lens[i])
            if L > seq_len:
                bin_of[i] = next_bin
                fills.append(L)
                next_bin += 1
                continue
            j = bisect.bisect_left(caps, L)
            if j < len(caps):
                b = cap_bin.pop(j)
                r = caps.pop(j) - L
            else:
                b = next_bin
                fills.append(0)
                next_bin += 1
                r = seq_len - L
            fills[b] += L
            bin_of[i] = b
            if r > 0:
                j2 = bisect.bisect_left(caps, r)
                caps.insert(j2, r)
                cap_bin.insert(j2, b)
        fills_arr = np.asarray(fills, dtype=np.int64)
        base = np.int64(bucket) << np.int64(32)
        return pa.table({
            id_col: tbl[id_col],
            token_col: pa.array(lens),
            "bin_id": pa.array(base + bin_of),
            "bin_fill": pa.array(fills_arr[bin_of]),
            "oversize": pa.array(oversize),
        })

    return bucketed_apply(ds.select_columns([id_col, token_col]),
                          id_col, pack, num_buckets=num_buckets,
                          drop_bucket=False)


# ---------------------------------------------------------------------------
# cross-split leakage audit
# ---------------------------------------------------------------------------

def cluster_safe_split(assign: Dataset, ratios: Sequence[float],
                       names: Sequence[str],
                       cluster_col: str = "cluster_id",
                       out_col: str = "split") -> Dataset:
    """Leakage-free train/val/test assignment — the FIX for what
    :func:`split_leakage_report` detects: the split is decided by a
    deterministic hash of the CLUSTER id (any dedup assignment from
    `stages/dedup.py`), so every member of a near-dup cluster lands in
    the SAME split by construction and no verified near-dup pair can
    straddle splits. ``ratios`` weight clusters (large clusters skew
    realized row fractions — that is the price of zero leakage).

    Zero additional shuffles: one map-side pass over the assignment
    appending ``out_col``; thresholds are exact integers
    (``floor(cum_ratio · 2³²)`` against the 32-bit ordering hash), so
    a SQL twin reproduces the assignment bit-for-bit."""
    ratios = np.asarray(list(ratios), dtype=np.float64)
    if len(ratios) != len(names) or len(ratios) == 0:
        raise ValueError("ratios and names must align and be non-empty")
    if not np.isclose(ratios.sum(), 1.0):
        raise ValueError(f"ratios must sum to 1, got {ratios.sum()}")
    thr = np.floor(np.cumsum(ratios) * float(1 << 32)).astype(np.int64)
    thr[-1] = 1 << 32
    names = list(names)

    def tag(t: pa.Table) -> pa.Table:
        cid = t[cluster_col].to_numpy(zero_copy_only=False)
        h = _cap_hash(cid)
        sel = np.searchsorted(thr, h, side="right")
        lab = pa.array(np.asarray(names, dtype=object)[sel],
                       type=pa.string())
        return t.append_column(out_col, lab)

    return assign.map_batches(tag, batch_format="pyarrow")


def split_leakage_report(ds: Dataset, split_col: str,
                         id_col: str = "doc_id", *,
                         text_col: str = "text",
                         sig_ds: Dataset | None = None,
                         threshold: float = 0.8, num_perm: int = 128,
                         bands: int = 16, shingle_k: int = 5,
                         num_buckets: int = 32):
    """Split-hygiene audit: count verified near-duplicate pairs that
    STRADDLE dataset splits (train/val/test) — the leakage a random
    split of a duplicated corpus silently creates, and the reason dedup
    must run before splitting. Returns a small pandas frame
    ``(split_a, split_b, n_pairs, cross)`` with the split pair
    normalized ``split_a <= split_b``; any ``cross=True`` row with
    ``n_pairs > 0`` is test-set contamination.

    Plan: MinHash signatures (or pass ``sig_ds`` — e.g. the token-gram
    family from ``tokengrams.token_minhash_signatures``) → the fused
    banded candidate+verify exchange → TWO distributed hash-joins
    attach each endpoint's split label → per-block partial counts; the
    driver sees at most #splits² rows. ``id_col`` must be
    int64-castable (pair-kernel contract)."""
    import pandas as _pd

    from .dedup import candidate_verified_pairs_ds, minhash_signatures
    from .relational import hash_join

    if sig_ds is None:
        sig_ds = minhash_signatures(ds, text_col, id_col, num_perm,
                                    bands, shingle_k).materialize()
    pairs = candidate_verified_pairs_ds(sig_ds, threshold,
                                        num_buckets=num_buckets)

    # a pair verifies once per colliding band — dedupe before counting
    # (bucketed by the left endpoint, so duplicates colocate)
    def distinct_pairs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        head = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])] \
            if len(a) else np.zeros(0, dtype=bool)
        return pa.table({"a": pa.array(a[head]), "b": pa.array(b[head])})

    from .window import bucketed_apply
    pairs = bucketed_apply(pairs, "a", distinct_pairs,
                           num_buckets=num_buckets,
                           drop_bucket=False).materialize()
    if pairs.count() == 0:      # empty materialized ds: schema() is None
        return _pd.DataFrame({"split_a": [], "split_b": [],
                              "n_pairs": [], "cross": []})

    def labels(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: pc.cast(t[id_col], pa.int64()),
                name: pc.cast(t[split_col], pa.string())})
        return ds.map_batches(fn, batch_format="pyarrow")

    j1 = hash_join(pairs, labels("split_a"), left_key="a",
                   right_key=id_col, how="inner",
                   num_buckets=num_buckets)
    j2 = hash_join(j1, labels("split_b"), left_key="b",
                   right_key=id_col, how="inner",
                   num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        a = t["split_a"].to_numpy(zero_copy_only=False)
        b = t["split_b"].to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        key = np.char.add(np.char.add(lo.astype(str), "\x1f"),
                          hi.astype(str))
        u, c = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    rows = j2.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(rows) == 0:
        return _pd.DataFrame({"split_a": [], "split_b": [],
                              "n_pairs": [], "cross": []})
    agg = rows.groupby("key")["n"].sum().reset_index()
    parts = agg["key"].str.split("\x1f", expand=True)
    out = _pd.DataFrame({
        "split_a": parts[0], "split_b": parts[1],
        "n_pairs": agg["n"].astype("int64"),
    })
    out["cross"] = out["split_a"] != out["split_b"]
    return out.sort_values(["split_a", "split_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# repeated-substring detection (substring-level dedup signals)
# ---------------------------------------------------------------------------

def _gram_positions(batch: pa.Table, text_col: str, k: int):
    """Every full-window word ``k``-gram with its token position:
    ``(gram_hash uint64, doc_index, pos)`` in document order. Same flat
    Horner-rolling kernel as the shingler (`dedup._shingles_of_batch`)
    but position-preserving (no sort/unique) and with NO short-doc
    fallback — a doc with < k words has no k-gram span."""
    from .partition import _stable_hash_strings
    words = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(batch[text_col]))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    row_len = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_docs = len(row_len)
    flat_words = words.flatten()
    wh = _stable_hash_strings(flat_words) if len(flat_words) else \
        np.zeros(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(n_docs), row_len)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(row_len, out=starts[1:])
    valid_n = max(len(wh) - k + 1, 0)
    if not valid_n:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros(0, dtype=np.uint64), z, z
    with np.errstate(over="ignore"):
        sh = wh[:valid_n].copy()
        for j in range(1, k):
            sh = sh * np.uint64(1099511628211) + wh[j:valid_n + j]
    in_doc = doc_of[:valid_n] == doc_of[k - 1:]
    doc = doc_of[:valid_n][in_doc]
    pos = np.arange(valid_n, dtype=np.int64)[in_doc] - starts[doc]
    return sh[in_doc], doc, pos


def duplicate_spans(ds: Dataset, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 8,
                    min_docs: int = 2,
                    num_buckets: int = 32) -> Dataset:
    """Substring-level duplication signals (the exact-substring dedup
    procedure of "Deduplicating Training Data Makes Language Models
    Better", approximated at gram granularity): find word ``k``-grams
    occurring in ≥ ``min_docs`` DISTINCT documents, then report, per
    document containing any, ``n_dup_occ`` (its occurrences of such
    grams) and ``n_dup_tokens`` (distinct token positions covered by
    them — the numerator of the duplicated-text fraction). Only
    documents with ≥ 1 duplicated gram emit a row.

    Scale shape: gram stream is a stateless vectorized ``map_batches``
    (no Python row loop); cross-doc gram frequencies and per-doc
    coverage are TWO bucketed exchanges (gram-hash, then doc) via
    `window.bucketed_apply` — no all-pairs, no driver materialization.
    Gram identity is the 64-bit rolling hash (cross-doc equality by
    hash; collision odds ~n²/2⁶⁴ — the same transport argument the
    MinHash verifier documents)."""
    from .window import bucketed_apply

    def explode(batch: pa.Table) -> pa.Table:
        sh, doc, pos = _gram_positions(batch, text_col, k)
        ids = batch[id_col].take(pa.array(doc))
        return pa.table({"gram": pa.array(sh, type=pa.uint64()),
                         id_col: ids, "pos": pa.array(pos)})

    grams = ds.map_batches(explode, batch_format="pyarrow")

    def keep_cross_doc(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.drop_columns(["gram"])
        g = tbl["gram"].to_numpy(zero_copy_only=False)
        d = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        # distinct docs per gram: count (gram, doc) run starts per gram run
        pair_start = np.r_[True, (g[1:] != g[:-1]) | (d[1:] != d[:-1])]
        gram_start = np.r_[True, g[1:] != g[:-1]]
        gram_id = np.cumsum(gram_start) - 1
        ndocs = np.bincount(gram_id[pair_start])
        keep = ndocs[gram_id] >= min_docs
        out = np.zeros(len(tbl), dtype=bool)
        out[order] = keep
        return tbl.filter(pa.array(out)).drop_columns(["gram"])

    occ = bucketed_apply(grams, "gram", keep_cross_doc,
                         num_buckets=num_buckets)

    def coverage(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({
                id_col: tbl[id_col],
                "n_dup_occ": pa.array([], type=pa.int64()),
                "n_dup_tokens": pa.array([], type=pa.int64())})
        d = tbl[id_col].to_numpy(zero_copy_only=False)
        p = tbl["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        doc_start = np.r_[True, d[1:] != d[:-1]]
        run_id = np.cumsum(doc_start) - 1
        n_occ = np.bincount(run_id)
        # covered tokens: each occurrence spans [pos, pos+k); with
        # positions sorted per doc, union size = Σ min(k, next−pos),
        # last occurrence of a doc contributing k
        gap = np.minimum(np.diff(p, append=0), k)
        last = np.r_[doc_start[1:], True]
        gap[last] = k
        cov = np.bincount(run_id, weights=gap).astype(np.int64)
        ids = tbl[id_col].take(pa.array(order[np.flatnonzero(doc_start)]))
        return pa.table({id_col: ids,
                         "n_dup_occ": pa.array(n_occ.astype(np.int64)),
                         "n_dup_tokens": pa.array(cov)})

    # coverage() builds a fresh 3-column table (bucket col not carried),
    # so skip bucketed_apply's drop
    return bucketed_apply(occ, id_col, coverage, num_buckets=num_buckets,
                          drop_bucket=False)


class _SpanScrubber:
    """Per-worker kernel for :func:`decontaminate_spans`: broadcast
    eval-gram membership (one ``searchsorted`` per batch, grams fetched
    zero-copy once per worker), covered word positions painted with a
    delta+cumsum interval pass, survivors re-joined per doc. Zero
    shuffles."""

    def __init__(self, grams_ref, text_col: str, k: int):
        self.grams_ref = grams_ref
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .partition import _stable_hash_strings
        grams = broadcast_get(self.grams_ref)
        k = self.k
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(col)
        words = pc.utf8_split_whitespace(trimmed)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_docs = len(batch)
        raw_len = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        raw_len = np.nan_to_num(raw_len.astype(np.float64)
                                ).astype(np.int64)
        # empty-text docs split to [""] — zero their length and drop
        # the empty token from the flat stream (shared convention)
        empty_doc = pc.coalesce(
            pc.equal(pc.utf8_length(trimmed), pa.scalar(0)),
            pa.scalar(True)).to_numpy(zero_copy_only=False)
        row_len = np.where(empty_doc, 0, raw_len)
        flat_all = words.flatten()
        flat = flat_all.filter(pc.not_equal(flat_all, pa.scalar(""))) \
            if len(flat_all) else flat_all
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), row_len)
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(row_len, out=starts[1:])
        N = int(starts[-1])
        wh = _stable_hash_strings(flat) if N else \
            np.zeros(0, dtype=np.uint64)
        delta = np.zeros(N + 1, dtype=np.int64)
        if N and len(grams):
            valid_n = max(N - k + 1, 0)
            with np.errstate(over="ignore"):
                if valid_n:
                    sh = wh[:valid_n].copy()
                    for j in range(1, k):
                        sh = sh * np.uint64(1099511628211) \
                            + wh[j:valid_n + j]
                    in_doc = doc_of[:valid_n] == doc_of[k - 1:]
                    pos = np.flatnonzero(in_doc)
                    sh = sh[in_doc]
                    idx = np.searchsorted(grams, sh)
                    idx[idx == len(grams)] = 0
                    hit_pos = pos[grams[idx] == sh]
                    np.add.at(delta, hit_pos, 1)
                    np.add.at(delta, hit_pos + k, -1)
                # short docs (< k words): whole text is ONE gram — a
                # hit empties the doc (same convention as the shingler
                # / decontaminate); vectorized per distinct length
                for L in np.unique(row_len[(row_len > 0)
                                           & (row_len < k)]):
                    ds_ = np.flatnonzero(row_len == L)
                    s0 = starts[ds_]
                    with np.errstate(over="ignore"):
                        g = wh[s0].copy()
                        for j in range(1, int(L)):
                            g = g * np.uint64(1099511628211) + wh[s0 + j]
                    idx = np.searchsorted(grams, g)
                    idx[idx == len(grams)] = 0
                    hd = ds_[grams[idx] == g]
                    np.add.at(delta, starts[hd], 1)
                    np.add.at(delta, starts[hd] + int(L), -1)
        cov = np.cumsum(delta[:N]) > 0
        removed = np.bincount(doc_of[cov], minlength=n_docs) \
            .astype(np.int64) if N else np.zeros(n_docs, dtype=np.int64)
        new_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(row_len - removed, out=new_offs[1:])
        kept = flat.filter(pa.array(~cov)) if N else flat
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept)
        rebuilt = pc.binary_join(lst, pa.scalar(" ", type=kept.type))
        # untouched docs keep their ORIGINAL text byte-identically
        # (rebuild normalizes whitespace, only scrubbed docs pay that)
        text_out = pc.if_else(pa.array(removed == 0), col,
                              pc.cast(rebuilt, col.type))
        i = batch.schema.get_field_index(self.text_col)
        batch = batch.set_column(i, self.text_col, text_out)
        batch = batch.append_column(
            "n_words", pa.array(row_len, type=pa.int64()))
        return batch.append_column(
            "n_removed_words", pa.array(removed, type=pa.int64()))


def decontaminate_spans(ds: Dataset, eval_ds: Dataset,
                        text_col: str = "text", k: int = 5) -> Dataset:
    """Surgical benchmark decontamination — remove only the
    CONTAMINATED SPANS instead of dropping whole documents (the
    OLMo-style complement to :func:`decontaminate`): every word
    ``k``-gram of the corpus that appears in ``eval_ds`` marks its k
    covered word positions; covered words are cut and survivors
    re-joined with single spaces (docs shorter than ``k`` words match
    as one whole-text gram and come back empty). Documents with NO
    contamination keep their original text byte-identically. Appends
    ``n_words`` / ``n_removed_words``.

    Scale shape: identical to :func:`decontaminate` — eval grams are
    one ``ray.put`` broadcast (benchmark suites are small by
    construction), the corpus streams through ``map_batches`` with
    ZERO shuffles; the paint is one delta+cumsum interval pass over
    the batch's flat word buffer, no per-row Python."""
    grams = eval_gram_hashes(eval_ds, text_col, k)
    ref = ray.put(grams)

    def scrub(batch: pa.Table) -> pa.Table:
        kern = cached_kernel(_SpanScrubber, ref, text_col, k)
        return kern(batch)

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# line-level boilerplate removal (CCNet / C4-style)
# ---------------------------------------------------------------------------

_LINE_TRIM = " \t\r"


def _split_lines(col) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.split_pattern(col, pattern="\n")


def _dict_codes(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)


def boilerplate_line_hashes(ds: Dataset, text_col: str = "text",
                            id_col: str = "doc_id", min_docs: int = 2,
                            num_buckets: int = 32, salt: int = 8,
                            max_lines: int = 2_000_000) -> np.ndarray:
    """Sorted uint64 hashes of every trimmed non-blank line occurring
    in ≥ ``min_docs`` DISTINCT documents — the EXACT distinct-doc
    count computed skew-immune: per-block distinct ``(line_hash,
    id_hash)`` pairs bucket by a SALTED key (line bucket × id-hash
    slice), each task deduplicates its doc-disjoint slice and counts
    per line, and the disjoint-by-construction partials SUM exactly
    through one small ``groupby(line).sum`` — a nav-bar line repeated
    in 100M documents spreads over ``salt`` tasks instead of
    concentrating in one. Raises if more than ``max_lines`` qualify
    (broadcast would not be the right plan; use the partitioned
    mode)."""
    from ray.data.aggregate import Sum

    from .partition import _stable_hash_strings
    from .window import bucketed_apply

    nb = np.uint64(max(num_buckets, 1))
    sl = np.uint64(max(salt, 1))

    def pairs(t: pa.Table) -> pa.Table:
        la = _split_lines(t[text_col])
        offs = la.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        flat = la.flatten()
        norm = pc.utf8_trim(flat, characters=_LINE_TRIM)
        keepm = pc.not_equal(norm, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        lh = _stable_hash_strings(norm.filter(pa.array(keepm))) \
            if keepm.any() else np.zeros(0, dtype=np.uint64)
        parent = np.repeat(np.arange(len(t), dtype=np.int64),
                           counts)[keepm]
        idc = t[id_col]
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        ih_doc = _stable_hash_strings(idc)
        ih = ih_doc[parent]
        order = np.lexsort((ih, lh))
        lh_s, ih_s = lh[order], ih[order]
        head = np.r_[True, (lh_s[1:] != lh_s[:-1]) |
                     (ih_s[1:] != ih_s[:-1])] if len(lh_s) else \
            np.zeros(0, dtype=bool)
        lh_u, ih_u = lh_s[head], ih_s[head]
        skey = ((lh_u % nb) * sl + ih_u % sl).astype(np.int64)
        return pa.table({
            "lh": pa.array(lh_u.view(np.int64)),
            "ih": pa.array(ih_u.view(np.int64)),
            "skey": pa.array(skey)})

    def slice_counts(tbl: pa.Table) -> pa.Table:
        lh = tbl["lh"].to_numpy(zero_copy_only=False)
        ih = tbl["ih"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ih, lh))
        lh_s, ih_s = lh[order], ih[order]
        head = np.r_[True, (lh_s[1:] != lh_s[:-1]) |
                     (ih_s[1:] != ih_s[:-1])] if len(lh_s) else \
            np.zeros(0, dtype=bool)
        lh_u = lh_s[head]
        line_head = np.r_[True, lh_u[1:] != lh_u[:-1]] \
            if len(lh_u) else np.zeros(0, dtype=bool)
        starts = np.flatnonzero(line_head)
        cnt = np.diff(np.r_[starts, len(lh_u)])
        return pa.table({"lh": pa.array(lh_u[line_head]),
                         "cnt": pa.array(cnt.astype(np.int64))})

    counts = bucketed_apply(
        ds.select_columns([id_col, text_col]).map_batches(
            pairs, batch_format="pyarrow"),
        "skey", slice_counts, num_buckets=num_buckets,
        drop_bucket=False) \
        .groupby("lh").aggregate(Sum("cnt", alias_name="n_docs"))
    hot = counts.filter(expr=f"n_docs >= {int(min_docs)}")
    n_hot = hot.count()
    if n_hot > max_lines:
        raise ValueError(
            f"{n_hot} boilerplate lines exceed max_lines={max_lines}; "
            "the broadcast set would not fit — use mode='partitioned'")
    if n_hot == 0:
        return np.zeros(0, dtype=np.uint64)
    vals = hot.select_columns(["lh"]).to_pandas()["lh"] \
        .to_numpy(dtype=np.int64).view(np.uint64)
    return np.sort(vals)


class _BoilerplateScrubber:
    """Per-worker broadcast-mode kernel: one searchsorted membership
    test per batch against the sorted boilerplate-line hash set, then
    the same cut-and-rejoin rebuild — fully map-side, zero further
    shuffles."""

    def __init__(self, set_ref, text_col: str, id_col: str):
        self.set_ref = set_ref
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .partition import _stable_hash_strings
        hot = broadcast_get(self.set_ref)
        la = _split_lines(t[self.text_col])
        offs = la.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        flat = la.flatten()
        N = len(flat)
        keep = np.ones(N, dtype=bool)
        if N and len(hot):
            norm = pc.utf8_trim(flat, characters=_LINE_TRIM)
            blank = pc.equal(norm, pa.scalar("")).to_numpy(
                zero_copy_only=False)
            lh = _stable_hash_strings(norm)
            idx = np.searchsorted(hot, lh)
            idx[idx == len(hot)] = 0
            keep = ~((hot[idx] == lh) & ~blank)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        removed = np.bincount(parent[~keep], minlength=len(t)) \
            .astype(np.int64)
        new_offs = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(counts - removed, out=new_offs[1:])
        kept = flat.filter(pa.array(keep)) if N else flat
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept)
        clean = pc.binary_join(lst, pa.scalar("\n", type=kept.type))
        i = t.schema.get_field_index(self.text_col)
        t = t.set_column(i, self.text_col,
                         pc.cast(clean, t[self.text_col].type))
        t = t.append_column("n_lines", pa.array(counts))
        return t.append_column("n_removed", pa.array(removed))


def remove_boilerplate_lines(ds: Dataset, text_col: str = "text",
                             id_col: str = "doc_id", min_docs: int = 2,
                             num_buckets: int = 32,
                             keep_cols: Sequence[str] = (),
                             mode: str = "partitioned",
                             salt: int = 8,
                             max_broadcast_lines: int = 2_000_000
                             ) -> Dataset:
    """Cross-document line-level boilerplate removal — the CCNet / C4
    paragraph-hash dedup step: a LINE (``\\n``-delimited, compared
    after trimming ``" \\t\\r"``) that occurs in ≥ ``min_docs``
    DISTINCT documents is a nav-bar / cookie-notice / footer
    candidate; every occurrence is cut and each document's survivors
    are rejoined in order. Emits one row per input document:
    ``id_col``, cleaned ``text_col``, ``n_lines`` (original line
    count), ``n_removed``. Blank lines keep document structure: they
    never count toward duplication and are never removed. Within-doc
    repetition alone never triggers removal (distinct-doc counting),
    and a fully-boilerplate document comes back with empty text, not
    dropped — the caller decides.

    Scale shape (mirrors :func:`duplicate_spans` / token-span removal):
    a stateless vectorized explode, then TWO bucketed exchanges — line
    buckets (keyed on the trimmed line STRING itself, so no
    hash-collision false merges) decide each line's document frequency
    wholly inside one task; drop markers + the corpus union-bucket by
    document for a vectorized filter-and-rejoin rebuild. Only
    ``(id, line_idx)`` markers ride the second exchange alongside the
    corpus — never exploded line text twice.

    ``keep_cols``: additional columns carried through from each doc row
    (lets pipelines clean in place without a join back).

    ``mode="broadcast"`` is the HOT-LINE scale path: the partitioned
    plan keys its line exchange on the trimmed line STRING, so a
    nav-bar line occurring in 100M documents lands every occurrence in
    ONE task. Broadcast mode instead computes the exact distinct-doc
    counts skew-immune (:func:`boilerplate_line_hashes` — salted
    doc-hash slices whose disjoint partials sum exactly), broadcasts
    the qualifying lines' sorted uint64 hash set (capped at
    ``max_broadcast_lines``, loud error beyond), and scrubs fully
    map-side — zero further shuffles, no union, no rebuild exchange.
    Membership there is by 64-bit line hash (a collision could remove
    an innocent line at ~2⁻⁶⁴ per distinct-line pair); the partitioned
    mode stays lexically exact."""
    from .window import bucketed_apply

    if mode == "broadcast":
        hot = boilerplate_line_hashes(ds, text_col, id_col, min_docs,
                                      num_buckets, salt,
                                      max_broadcast_lines)
        ref = ray.put(hot)
        cols = [id_col, text_col, *keep_cols]

        def scrub(batch: pa.Table) -> pa.Table:
            kern = cached_kernel(_BoilerplateScrubber, ref, text_col,
                                 id_col)
            return kern(batch)

        return ds.select_columns(cols).map_batches(
            scrub, batch_format="pyarrow")
    if mode != "partitioned":
        raise ValueError(
            f"mode must be 'partitioned' or 'broadcast', got {mode!r}")

    keep_cols = list(keep_cols)
    if keep_cols:
        ks = dict(zip(ds.schema().names, ds.schema().types))
        keep_types = {c: ks[c] for c in keep_cols}

    def explode(t: pa.Table) -> pa.Table:
        la = _split_lines(t[text_col])
        offs = la.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        flat = la.flatten()
        norm = pc.utf8_trim(flat, characters=_LINE_TRIM)
        line_idx = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(offs[:-1], counts)
        keep = pc.not_equal(norm, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        ids = t[id_col].take(pa.array(parent[keep]))
        return pa.table({id_col: ids,
                         "line_idx": pa.array(line_idx[keep]),
                         "norm": norm.filter(pa.array(keep))})

    lines = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")

    def dup_markers(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.drop_columns(["norm"])
        codes = _dict_codes(tbl["norm"])
        idc = _dict_codes(tbl[id_col])
        order = np.lexsort((idc, codes))
        c_s, d_s = codes[order], idc[order]
        pair_start = np.r_[True, (c_s[1:] != c_s[:-1]) |
                           (d_s[1:] != d_s[:-1])]
        line_start = np.r_[True, c_s[1:] != c_s[:-1]]
        gid = np.cumsum(line_start) - 1
        ndocs = np.bincount(gid[pair_start])
        dup_sorted = ndocs[gid] >= min_docs
        out = np.zeros(len(tbl), dtype=bool)
        out[order] = dup_sorted
        return tbl.filter(pa.array(out)).drop_columns(["norm"])

    drops = bucketed_apply(lines, "norm", dup_markers,
                           num_buckets=num_buckets)

    def tag_docs(t: pa.Table) -> pa.Table:
        cols = {
            id_col: t[id_col],
            text_col: pc.cast(t[text_col], pa.string()),
            "line_idx": pa.array(np.full(len(t), -1, dtype=np.int64))}
        for c in keep_cols:
            cols[c] = t[c]
        return pa.table(cols)

    def tag_drop(t: pa.Table) -> pa.Table:
        cols = {
            id_col: t[id_col],
            text_col: pa.nulls(len(t), type=pa.string()),
            "line_idx": t["line_idx"]}
        for c in keep_cols:
            cols[c] = pa.nulls(len(t), type=keep_types[c])
        return pa.table(cols)

    tagged = ds.select_columns([id_col, text_col, *keep_cols]).map_batches(
        tag_docs, batch_format="pyarrow").union(
        drops.map_batches(tag_drop, batch_format="pyarrow"))

    def rebuild(tbl: pa.Table) -> pa.Table:
        li = tbl["line_idx"].to_numpy(zero_copy_only=False)
        is_doc = li < 0
        docs_t = tbl.filter(pa.array(is_doc))
        n_docs = len(docs_t)
        if n_docs == 0:
            cols = {
                id_col: docs_t[id_col],
                text_col: pa.array([], type=pa.string()),
                "n_lines": pa.array([], type=pa.int64()),
                "n_removed": pa.array([], type=pa.int64())}
            for c in keep_cols:
                cols[c] = docs_t[c]
            return pa.table(cols)
        docs_t = docs_t.take(pc.sort_indices(docs_t[id_col]))
        la = _split_lines(docs_t[text_col])
        offs = la.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        flat = la.flatten()
        keep = np.ones(len(flat), dtype=bool)
        removed = np.zeros(n_docs, dtype=np.int64)
        drop_t = tbl.filter(pa.array(~is_doc))
        if len(drop_t):
            base = docs_t[id_col].to_numpy(zero_copy_only=False)
            row = np.searchsorted(
                base, drop_t[id_col].to_numpy(zero_copy_only=False))
            pos = offs[row] + drop_t["line_idx"].to_numpy(
                zero_copy_only=False)
            keep[pos] = False
            removed = np.bincount(row, minlength=n_docs).astype(np.int64)
        new_offs = np.r_[0, np.cumsum(counts - removed)]
        kept = flat.filter(pa.array(keep))
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept)
        clean = pc.binary_join(lst, pa.scalar("\n", type=kept.type))
        cols = {id_col: docs_t[id_col], text_col: clean,
                "n_lines": pa.array(counts),
                "n_removed": pa.array(removed)}
        for c in keep_cols:
            cols[c] = docs_t[c]
        return pa.table(cols)

    return bucketed_apply(tagged, id_col, rebuild,
                          num_buckets=num_buckets, drop_bucket=False)


def dedup_lines_within_doc(ds: Dataset, text_col: str = "text",
                           id_col: str = "doc_id") -> Dataset:
    """WITHIN-document repeated-line removal — the C4 "deduplicate
    lines within a page" hygiene step, the intra-doc sibling of
    :func:`remove_boilerplate_lines`: within each document, only the
    FIRST occurrence of every trimmed non-blank line survives; later
    repeats are cut, survivors rejoined in order, blank lines always
    kept (structure, never counted as repeats). Appends ``n_lines`` /
    ``n_removed``. Purely per-document → ZERO shuffles, one vectorized
    explode/lexsort/rebuild pass per batch."""

    def fn(t: pa.Table) -> pa.Table:
        n_docs = len(t)
        la = _split_lines(t[text_col])
        offs = la.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        flat = la.flatten()
        N = len(flat)
        if N == 0:
            t = t.append_column("n_lines", pa.array(counts))
            return t.append_column(
                "n_removed", pa.array(np.zeros(n_docs, dtype=np.int64)))
        parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        norm = pc.utf8_trim(flat, characters=_LINE_TRIM)
        codes = _dict_codes(norm)
        blank = pc.equal(norm, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        idx = np.arange(N, dtype=np.int64)
        order = np.lexsort((idx, codes, parent))
        p_s, c_s = parent[order], codes[order]
        first = np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])]
        keep = np.zeros(N, dtype=bool)
        keep[order] = first
        keep |= blank
        removed = np.bincount(parent[~keep], minlength=n_docs) \
            .astype(np.int64)
        new_offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts - removed, out=new_offs[1:])
        kept = flat.filter(pa.array(keep))
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), kept)
        clean = pc.binary_join(lst, pa.scalar("\n", type=kept.type))
        i = t.schema.get_field_index(text_col)
        t = t.set_column(i, text_col, pc.cast(clean, t[text_col].type))
        t = t.append_column("n_lines", pa.array(counts))
        return t.append_column("n_removed", pa.array(removed))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-domain document cap
# ---------------------------------------------------------------------------

_CAP_H = "__cap_h"


def _cap_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-doc ordering hash, overflow-safe in BOTH
    engines: ``((id % 2^20) * 2654435761) % 2^32``. The 2^20 reduction
    keeps the SQL twin's BIGINT product under 2^52 for ANY id (DuckDB
    raises on int64 overflow); hash collisions beyond 1M ids only tie
    the ordering — the id tie-break keeps selection deterministic.
    ARRAY-form uint64 modulo throughout (scalar uint64 % python-int
    promotes to float64 and garbles the hash)."""
    u = ids.astype(np.uint64)
    h = ((u % np.uint64(1 << 20)) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)
    return h.astype(np.int64)


def cap_per_source(ds: Dataset, cap: int, by_col: str = "source",
                   id_col: str = "doc_id",
                   num_buckets: int = 32) -> Dataset:
    """Per-domain document cap — the C4 / RefinedWeb domain-balancing
    step: keep at most ``cap`` documents per ``by_col`` value, chosen
    deterministically (smallest ordering hash of ``id_col``, id
    tie-break) so re-runs and different block layouts select the SAME
    documents, without favoring crawl order. Appends ``src_rank``
    (1-based rank within the domain, == SQL ``row_number() OVER
    (PARTITION BY source ORDER BY hash, id)``).

    Scale shape: top-k per group is a monotone partial — the global
    top-``cap`` of a domain is a subset of the union of per-block
    top-``cap``s — so each block pre-prunes to ``cap`` rows per domain
    present BEFORE the exchange; a 10M-page domain ships
    ``cap × blocks`` candidate rows, not 10M, through the single
    bucketed exchange that ranks survivors."""
    from .partition import entity_group_starts
    from .window import bucketed_apply

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column(_CAP_H, pa.array(_cap_hash(ids)))

    def topk(tbl: pa.Table, final: bool) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            (by_col, "ascending"), (_CAP_H, "ascending"),
            (id_col, "ascending")])
        tbl = tbl.take(idx)
        ng = entity_group_starts(tbl, by_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id]
        tbl = tbl.filter(pa.array(rank < cap))
        if final:
            tbl = tbl.append_column(
                "src_rank", pa.array(rank[rank < cap] + 1))
            tbl = tbl.drop_columns([_CAP_H])
        return tbl

    pruned = ds.map_batches(add_h, batch_format="pyarrow").map_batches(
        lambda t: topk(t, False), batch_format="pyarrow")
    return bucketed_apply(pruned, by_col, lambda t: topk(t, True),
                          num_buckets=num_buckets)


def sample_negatives(ds: Dataset, id_col: str = "doc_id", k: int = 4,
                     num_buckets: int = 32) -> Dataset:
    """Deterministic contrastive negative sampling: every anchor row
    gets ``k`` pseudo-random OTHER rows, chosen by modular strides
    over the global id rank — ``stride_j = 1 + ((j+1)·2654435761) mod
    (n−1)`` lies in ``[1, n−1]``, so a candidate NEVER equals its
    anchor, coverage is uniform-ish, and the pairing is reproducible
    under any partitioning (the requirement for resumable contrastive/
    NCE training data). Emits ``(anchor_id, neg_slot, neg_id)``.

    Scale shape: the two-phase prefix scan assigns dense ranks, a
    stateless map expands each row into ``k`` candidate-rank rows, and
    ONE distributed hash join maps candidate ranks back to ids — no
    all-pairs, no driver-side id table."""
    from .partition import row_number
    from .relational import hash_join

    ranked = row_number(ds.select_columns([id_col]), [id_col],
                        out_col="__rk", start=0).materialize()
    n = ranked.count()
    if n < 2:
        raise ValueError("need at least 2 rows to sample negatives")
    strides = np.array(
        [1 + ((j + 1) * 2654435761) % (n - 1) for j in range(k)],
        dtype=np.int64)

    def expand(t: pa.Table) -> pa.Table:
        r = t["__rk"].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        m = len(t)
        anchor = ids.take(pa.array(np.repeat(np.arange(m), k)))
        slot = np.tile(np.arange(k, dtype=np.int64), m)
        ck = (np.repeat(r, k) + strides[slot]) % n
        return pa.table({"anchor_id": anchor,
                         "neg_slot": pa.array(slot),
                         "__ck": pa.array(ck)})

    cand = ranked.map_batches(expand, batch_format="pyarrow")
    neg = hash_join(cand,
                    ranked.map_batches(
                        lambda t: t.rename_columns(["neg_id", "__rk"]),
                        batch_format="pyarrow"),
                    left_key="__ck", right_key="__rk", how="inner",
                    num_buckets=num_buckets)
    return neg.drop_columns(["__ck"])


def quality_quantile_gate(ds: Dataset, score_col: str,
                          by_col: str = "source", q: float = 0.7,
                          num_buckets: int = 32) -> Dataset:
    """Per-domain PERCENTILE quality gate — real quality filters keep
    "the top X% per source", not a fixed threshold (a fixed cut
    over-prunes clean domains and under-prunes noisy ones): within
    each ``by_col`` group compute the ``q``-th discrete quantile of
    ``score_col`` (DuckDB ``quantile_disc`` convention — the sorted
    value at 1-based index ``max(1, ceil(q·n))``, verified in the
    grouped-quantile family) and keep rows with ``score ≥ threshold``
    (ties kept). Appends the group's ``thr`` so survivors are
    auditable. ONE bucketed exchange; threshold and filter happen
    inside the same group pass — no join back."""
    import math

    from .partition import entity_group_starts
    from .window import bucketed_apply

    def gate(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            (by_col, "ascending"), (score_col, "ascending")])
        tbl = tbl.take(idx)
        ng = entity_group_starts(tbl, by_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        cnt = np.diff(np.r_[starts, len(tbl)])
        sc = tbl[score_col].to_numpy(zero_copy_only=False)
        k = np.maximum(1, np.ceil(q * cnt).astype(np.int64))
        thr = sc[starts + k - 1]
        thr_rows = thr[run_id]
        keep = sc >= thr_rows
        tbl = tbl.append_column("thr", pa.array(thr_rows))
        return tbl.filter(pa.array(keep))

    return bucketed_apply(ds, by_col, gate, num_buckets=num_buckets)


def interleave_by_domain(ds: Dataset, by_col: str = "source",
                         id_col: str = "doc_id",
                         num_buckets: int = 32) -> Dataset:
    """Domain-balanced training ORDER — round-robin interleave across
    domains so consecutive training examples cycle through sources
    instead of streaming one domain at a time (the batch-diversity
    complement to the mixture-weight ops, which decide HOW MUCH of
    each domain, not WHERE it lands): each doc gets a deterministic
    ``domain_rank`` within its domain (ordering hash of the id, id
    tie-break — the same stable order :func:`cap_per_source` uses),
    and the global ``train_pos`` orders by ``(domain_rank, domain,
    id)`` — rank-0 docs of every domain first, then rank-1, … so
    every window of ~#domains consecutive positions touches each
    still-live domain once.

    Scale shape: ONE bucketed exchange on the domain assigns ranks,
    then the two-phase prefix scan (``partition.row_number``) assigns
    global positions — no all-pairs, nothing driver-side but block
    counts."""
    from .partition import entity_group_starts, row_number
    from .window import bucketed_apply

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.append_column(_CAP_H, pa.array(_cap_hash(ids)))

    def ranks(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            (by_col, "ascending"), (_CAP_H, "ascending"),
            (id_col, "ascending")])
        tbl = tbl.take(idx)
        ng = entity_group_starts(tbl, by_col)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        rank = np.arange(len(tbl), dtype=np.int64) - starts[run_id]
        tbl = tbl.append_column("domain_rank", pa.array(rank))
        return tbl.drop_columns([_CAP_H])

    ranked = bucketed_apply(
        ds.map_batches(add_h, batch_format="pyarrow"), by_col, ranks,
        num_buckets=num_buckets)
    return row_number(ranked, ["domain_rank", by_col, id_col],
                      out_col="train_pos", start=0)


def length_bucketed_batches(ds: Dataset, length_col: str = "n_tok",
                            id_col: str = "doc_id",
                            batch_size: int = 32,
                            num_buckets: int = 32) -> Dataset:
    """Padding-efficient inference batching: order documents by
    DESCENDING ``length_col`` (``id_col`` tie-break — the order is
    total, so assignment is deterministic under any partitioning) and
    cut the sequence into fixed-count batches of ``batch_size`` — near-
    equal-length docs land in the same batch, so per-batch padding
    ``rows × max_len − Σ len`` (what a rectangular inference tensor
    wastes) is near-minimal. Appends ``batch_id`` / ``pos_in_batch``
    (both 0-based) plus per-batch ``batch_max_len`` and ``pad_waste``
    repeated on every member row.

    Scale shape: one range-partition sort + the two-phase prefix scan
    (``partition.row_number``) assigns global positions, then ONE
    bucketed exchange on ``batch_id`` computes the per-batch stats —
    batches are ``batch_size``-row groups, so no task ever holds more
    than a bucket of tiny groups."""
    from .partition import row_number
    from .window import bucketed_apply

    def neg(t: pa.Table) -> pa.Table:
        v = t[length_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__neg_len", pa.array(-v))

    rn = row_number(ds.map_batches(neg, batch_format="pyarrow"),
                    ["__neg_len", id_col], out_col="__rn", start=0)

    def assign(t: pa.Table) -> pa.Table:
        r = t["__rn"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["__neg_len", "__rn"])
        t = t.append_column("batch_id", pa.array(r // batch_size))
        return t.append_column("pos_in_batch", pa.array(r % batch_size))

    assigned = rn.map_batches(assign, batch_format="pyarrow")

    def stats(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("batch_id", "ascending"), ("pos_in_batch", "ascending")])
        tbl = tbl.take(idx)
        bid = tbl["batch_id"].to_numpy(zero_copy_only=False)
        ln = tbl[length_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ng = np.r_[True, bid[1:] != bid[:-1]] if len(tbl) else \
            np.zeros(0, dtype=bool)
        starts = np.flatnonzero(ng)
        run_id = np.cumsum(ng) - 1
        if len(tbl):
            mx = np.maximum.reduceat(ln, starts)
            sm = np.add.reduceat(ln, starts)
            cnt = np.diff(np.r_[starts, len(tbl)])
            waste = cnt * mx - sm
            tbl = tbl.append_column("batch_max_len",
                                    pa.array(mx[run_id]))
            tbl = tbl.append_column("pad_waste",
                                    pa.array(waste[run_id]))
        else:
            tbl = tbl.append_column("batch_max_len",
                                    pa.array([], type=pa.int64()))
            tbl = tbl.append_column("pad_waste",
                                    pa.array([], type=pa.int64()))
        return tbl

    return bucketed_apply(assigned, "batch_id", stats,
                          num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

@ray.remote
def _block_tok_sum(tbl: pa.Table, token_col: str, order_col: str):
    n = len(tbl)
    if n == 0:
        return 0, None, None
    s = int(pc.sum(tbl[token_col]).as_py() or 0)
    return s, tbl[order_col][0].as_py(), tbl[order_col][n - 1].as_py()


@ray.remote
def _pack_block(tbl: pa.Table, token_col: str, base: int,
                chunk_tokens: int) -> pa.Table:
    n_tok = tbl[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(n_tok) + base
    starts = ends - n_tok
    first = starts // chunk_tokens
    last = (ends - 1) // chunk_tokens
    return (tbl.append_column("tok_start", pa.array(starts))
               .append_column("chunk_first", pa.array(first))
               .append_column("chunk_last", pa.array(last))
               .append_column("n_chunks", pa.array(last - first + 1)))


def pack_chunks(ds: Dataset, order_col: str, chunk_tokens: int,
                token_col: str | None = None,
                text_col: str = "text") -> Dataset:
    """GPT-pretraining sequence packing: documents are concatenated in
    global ``order_col`` order and the token stream is cut into
    ``chunk_tokens``-sized training sequences. Emits per doc:
    ``tok_start`` (offset in the concatenated stream), ``chunk_first`` /
    ``chunk_last`` (the training-sequence ids the doc lands in) and
    ``n_chunks`` — all int64, a bit-exact contract.

    Distributed global prefix sum, textbook two-phase scan: one
    range-partition ``sort(order_col)``, then (a) parallel per-block
    token sums (tiny scalars to the driver), (b) an O(num_blocks)
    exclusive scan on the driver, (c) parallel per-block finalize with
    the block's base offset. Driver state = one int per block; blocks
    never move after the sort. Zero-token rows are dropped first (they
    occupy no stream positions). Block order after a Ray range-partition
    sort IS the sorted order (same invariant `stream_window` relies on);
    a per-block min/max assertion guards it."""
    if token_col is None:
        token_col = "n_tok"

        def add_tok(t: pa.Table) -> pa.Table:
            return t.append_column("n_tok", ws_token_count(t[text_col]))

        ds = ds.map_batches(add_tok, batch_format="pyarrow")
    ds = ds.filter(expr=f"{token_col} > 0")

    refs = ds.sort(order_col).to_arrow_refs()
    infos = ray.get([_block_tok_sum.remote(r, token_col, order_col)
                     for r in refs])
    prev_last = None
    for s, lo, hi in infos:
        if lo is None:
            continue
        if prev_last is not None and lo < prev_last:
            raise AssertionError(
                "sorted blocks out of order — range partition violated")
        prev_last = hi
    sums = np.array([s for s, _, _ in infos], dtype=np.int64)
    bases = np.zeros(len(sums), dtype=np.int64)
    if len(sums) > 1:
        np.cumsum(sums[:-1], out=bases[1:])

    import ray.data as rd
    out_refs = [_pack_block.remote(r, token_col, int(b), chunk_tokens)
                for r, b, s in zip(refs, bases, sums) if s > 0]
    if not out_refs:
        return ds  # empty input: nothing to pack
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------------
# URL canonicalization + URL-keyed dedup
# ---------------------------------------------------------------------------

#: query parameters stripped by :func:`canonicalize_url` — the common
#: click-tracking families; extend per deployment.
URL_TRACKING_PARAMS = r"utm_[a-z]+|fbclid|gclid"


def _canon_url_array(u: pa.Array) -> pa.Array:
    """The canonicalization sequence, vectorized RE2 end-to-end. Every
    step is a GLOBAL regex replace with an exact DuckDB twin
    (``regexp_replace(..., 'g')`` — both engines run RE2, so the
    rewrites agree byte-for-byte; RE2 has no lookahead, hence the
    capture-group forms). Strings without a ``scheme://host`` head
    pass through the case fold unchanged (extract misses → coalesce)
    but still get the suffix cleanups."""
    ex = pc.extract_regex(u, r"^(?P<head>[^:]+://[^/?#]*)(?P<rest>.*)$")
    head = pc.utf8_lower(pc.struct_field(ex, "head"))
    rest = pc.struct_field(ex, "rest")
    out = pc.coalesce(pc.binary_join_element_wise(head, rest, ""), u)
    # 1. fragment never reaches the server — drop it
    out = pc.replace_substring_regex(out, r"#.*$", "")
    # 2. default https port is noise
    out = pc.replace_substring_regex(
        out, r"^(https://[^/?#:]*):443([/?#].*)?$", r"\1\2")
    # 3. tracking params (keep the separator so real params survive)
    out = pc.replace_substring_regex(
        out, r"([?&])(" + URL_TRACKING_PARAMS + r")=[^&#]*", r"\1")
    # 4-6. repair the seams step 3 left behind: adjacent stripped
    # params leave '&&' runs, a stripped first param leaves '?&'
    out = pc.replace_substring_regex(out, r"&&+", "&")
    out = pc.replace_substring_regex(out, r"\?&", "?")
    out = pc.replace_substring_regex(out, r"[?&]+$", "")
    # 7. trailing slash after a path segment
    out = pc.replace_substring_regex(out, r"([^/])/$", r"\1")
    return out


def canonicalize_url(ds: Dataset, url_col: str = "url",
                     out_col: str = "url_canon") -> Dataset:
    """Append ``out_col`` = canonical form of ``url_col``: lowercase
    scheme+host, drop the fragment, drop the default ``:443`` port,
    strip tracking query params (:data:`URL_TRACKING_PARAMS`) while
    KEEPING real ones, and trim a trailing path slash — the
    CommonCrawl-style URL normalization run before URL-keyed dedup.
    Zero shuffles; one vectorized RE2 pass per batch."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[url_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.append_column(out_col, _canon_url_array(col))

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_by_url(ds: Dataset, url_col: str = "url",
                 id_col: str = "doc_id",
                 num_buckets: int | None = None,
                 keep_cols=None) -> Dataset:
    """URL-keyed exact dedup: canonicalize ``url_col`` then keep the
    min-``id_col`` row per canonical URL (re-crawls, tracking-param
    copies and fragment variants of one page collapse). Rides
    :func:`~feature_extraction_ray.stages.dedup.exact_dedup` — ONE
    hash-bucketed exchange, run-head keeper selection, ``n_dups``
    multiplicity on survivors; the original ``url_col`` is carried
    through via ``keep_cols``."""
    from .dedup import exact_dedup
    kc = [url_col] + [c for c in (keep_cols or []) if c != url_col]
    return exact_dedup(canonicalize_url(ds, url_col),
                       content_col="url_canon", id_col=id_col,
                       num_buckets=num_buckets, keep_cols=kc)


def epoch_order(ds: Dataset, epochs: int, id_col: str = "doc_id") -> Dataset:
    """Deterministic per-epoch training order: every (epoch, row) pair
    gets ``train_pos`` — the row's 1-based position in that epoch's
    pseudo-random permutation, defined by the overflow-safe hash
    ``((id % 2^20)·(2654435761 + 2630847822·epoch)) mod 2^32`` with id
    tie-break. The epoch term MULTIPLIES with the id and the per-epoch
    multiplier delta is LARGE mod 2^32 (an additive epoch constant is
    order-preserving, and a small multiplier delta barely perturbs
    sparse id sets — both measured as identical permutations); the
    multiplier stays odd for every epoch so low bits keep mixing.
    Different epochs give independent-looking orders of the SAME
    corpus, and the
    permutation depends only on (id, epoch) — reproducible under any
    partitioning or block layout, so a resumed training run sees the
    identical sample order.

    Scale shape: one stateless ``epochs``-way expand, then ONE
    range-partition sort feeding the two-phase prefix scan
    (``partition.row_number``); per-epoch positions derive from the
    global row number arithmetically (each epoch holds exactly ``n``
    rows), so all epochs ride a single exchange. At petabyte scale run
    one epoch per call — the shape is unchanged."""
    from .partition import row_number
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    n = ds.count()

    def expand(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(t)
        rep = np.repeat(ids, epochs)
        ep = np.tile(np.arange(epochs, dtype=np.int64), m)
        u = rep.astype(np.uint64)
        mult = np.uint64(2654435761) + ep.astype(np.uint64) \
            * np.uint64(2630847822)
        h = ((u % np.uint64(1 << 20)) * mult) % np.uint64(1 << 32)
        return pa.table({"epoch": pa.array(ep),
                         id_col: pa.array(rep),
                         "__h": pa.array(h.astype(np.int64))})

    ranked = row_number(ds.select_columns([id_col])
                        .map_batches(expand, batch_format="pyarrow"),
                        ["epoch", "__h", id_col], out_col="__rid",
                        start=1)

    def finalize(t: pa.Table) -> pa.Table:
        rid = t["__rid"].to_numpy(zero_copy_only=False)
        pos = (rid - 1) % n + 1
        return pa.table({"epoch": t["epoch"], id_col: t[id_col],
                         "train_pos": pa.array(pos)})

    return ranked.map_batches(finalize, batch_format="pyarrow")


def _extract_html_text_array(h: pa.Array):
    """The tag-strip / entity-decode sequence, vectorized RE2
    end-to-end. Every step is a GLOBAL regex (or plain-substring)
    replace with an exact DuckDB twin — both engines run RE2 for the
    regex legs and byte substring replace for the entity legs, so the
    rewrites agree byte-for-byte. Returns ``(title, text)`` arrays.

    Order matters twice: comments/script/style blocks drop BEFORE the
    generic tag strip (their bodies must not survive as text), and
    ``&amp;`` decodes LAST so pre-escaped entities (``&amp;lt;``)
    decode exactly one level, the single-pass HTML semantic."""
    def decode_entities(a):
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " ")):
            a = pc.replace_substring(a, ent, ch)
        return pc.replace_substring(a, "&amp;", "&")

    ti = pc.extract_regex(h, r"(?s)<title[^>]*>(?P<t>[^<]*)</title>")
    title = decode_entities(pc.coalesce(pc.struct_field(ti, "t"), ""))
    out = pc.replace_substring_regex(
        h, r"(?s)<title[^>]*>.*?</title>", " ")
    out = pc.replace_substring_regex(
        out, r"(?s)<script[^>]*>.*?</script>", " ")
    out = pc.replace_substring_regex(
        out, r"(?s)<style[^>]*>.*?</style>", " ")
    out = pc.replace_substring_regex(out, r"(?s)<!--.*?-->", " ")
    out = pc.replace_substring_regex(out, r"<[^>]*>", " ")
    out = decode_entities(out)
    out = pc.replace_substring_regex(out, r"[ \t\r\n]+", " ")
    out = pc.utf8_trim(out, " ")
    return title, out


def extract_html_text(ds: Dataset, html_col: str = "html",
                      text_col: str = "text",
                      title_col: str = "title") -> Dataset:
    """Extract readable text (and the ``<title>``) from raw HTML pages —
    the CommonCrawl-style WET step run before any text curation:
    title/script/style/comment blocks drop whole (the title lands in
    its own column instead), remaining tags become
    whitespace, the five standard entities plus ``&amp;`` decode
    exactly one level, and whitespace collapses to single spaces.
    Zero shuffles; one vectorized RE2 pass per batch (no per-row
    Python parser). Documented limits: entity decode covers the six
    named forms (numeric ``&#x``/decimal beyond ``&#39;`` pass
    through untouched), and block-level structure is flattened to
    spaces, not newlines — the downstream line-level ops
    (:func:`remove_boilerplate_lines`) should run on pages whose
    builder preserves ``\\n``."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[html_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        title, text = _extract_html_text_array(col)
        t = t.append_column(title_col, title)
        return t.append_column(text_col, text)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_links(ds: Dataset, html_col: str = "html",
                  id_col: str = "doc_id") -> Dataset:
    """Extract outbound links from raw HTML — the crawl link-graph
    builder whose edge list feeds PageRank / hub scoring
    (``stages/graphrank.py``) and URL frontier dedup
    (:func:`canonicalize_url` + :func:`dedup_by_url`). Emits one row
    per ``href="…"`` occurrence: ``(id, link_no, href)`` with
    ``link_no`` the 1-based position among the document's extracted
    links.

    Semantics contract (shared with the SQL twin's
    ``regexp_extract_all(html, 'href="([^"]*)"', 1)``): the value is
    everything between the quote after ``href=`` and the NEXT double
    quote; an occurrence with no closing quote (truncated page) is
    dropped. Well-formed attribute quoting — which the twin certifies
    on the oracle corpus — makes the two scans identical; a page whose
    href VALUE itself contains ``href="`` diverges (documented, absurd
    input).

    Scale shape: zero shuffles, fully vectorized — one
    ``split_pattern`` per batch, numpy masks for the per-doc first
    segment, one anchored ``extract_regex`` over the flattened
    segments; no per-row Python."""

    def links(t: pa.Table) -> pa.Table:
        col = t[html_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        segs = pc.split_pattern(col, 'href="')
        L = pc.fill_null(pc.list_value_length(segs), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = segs.flatten()
        n = len(t)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), L)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(L, out=starts[1:])
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_of]
        keep = pos >= 1
        ids_t = t[id_col]
        if isinstance(ids_t, pa.ChunkedArray):
            ids_t = ids_t.combine_chunks()
        if not keep.any():
            return pa.table({id_col: pa.array([], ids_t.type),
                             "link_no": pa.array([], pa.int64()),
                             "href": pa.array([], pa.string())})
        seg_kept = flat.filter(pa.array(keep))
        dk = doc_of[keep]
        ex = pc.extract_regex(seg_kept, '^(?P<h>[^"]*)"')
        href = pc.struct_field(ex, "h")
        valid = pc.is_valid(href).to_numpy(zero_copy_only=False)
        dv = dk[valid]
        href = href.filter(pa.array(valid))
        # 1-based rank within each doc's valid links (docs contiguous)
        first = np.r_[True, dv[1:] != dv[:-1]]
        idx = np.arange(len(dv), dtype=np.int64)
        link_no = idx - np.maximum.accumulate(
            np.where(first, idx, 0)) + 1 if len(dv) else idx
        return pa.table({id_col: ids_t.take(pa.array(dv)),
                         "link_no": pa.array(link_no),
                         "href": href})

    return ds.map_batches(links, batch_format="pyarrow")


def weighted_sample(ds: Dataset, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: int = 7) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis exponential-key top-k): row ``i`` gets key
    ``ln(u_i) / w_i`` with ``u_i ∈ (0,1)`` derived from the shared
    overflow-safe (id, seed) hash family, and the ``k`` largest keys
    are the sample — exactly equivalent to sequential
    probability-proportional-to-weight draws without replacement, but
    embarrassingly parallel and reproducible under any partitioning
    (the resumable-training-data requirement; a new ``seed`` gives an
    independent sample of the same corpus). Emits the selected rows
    with ``sample_rank`` (1 = first draw).

    SQL-parity contract: ``u = (h+1)/(2^32+1)`` and ``key = ln(u)/w``
    are each ONE fixed IEEE expression over exact integers and the
    raw weight, so both engines order identically bit-for-bit (id
    tie-break for the measure-zero equal-key case). Weights must be
    strictly positive — zero/negative/null raise loudly.

    Scale shape: keys map-side; every block pre-prunes to its own
    top-``k`` (vectorized argpartition, no sort of the full block),
    so at most ``blocks × k`` rows reach the ONE final ranking task.
    ``k`` is bounded by contract (a sample that doesn't fit one task
    isn't a sample)."""
    from .window import bucketed_apply
    if k < 1:
        raise ValueError("k must be >= 1")
    kk = int(k)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(w) and (not np.all(np.isfinite(w)) or (w <= 0).any()):
            raise ValueError("weighted_sample: weights must be "
                             "strictly positive and finite")
        u = ids.astype(np.uint64)
        h = ((u % np.uint64(1 << 20)) * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        uni = (h + np.uint64(1)).astype(np.float64) / 4294967297.0
        key = np.log(uni) / w
        t = t.append_column("__wsk", pa.array(key))
        if len(t) > kk:
            part = np.argpartition(key, len(key) - kk)[len(key) - kk:]
            t = t.take(pa.array(np.sort(part)))
        return t.append_column("__one", pa.array(
            np.zeros(len(t), dtype=np.int64)))

    def final(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("__wsk", "descending"), (id_col, "ascending")])
        tbl = tbl.take(idx[:kk])
        tbl = tbl.append_column(
            "sample_rank", pa.array(np.arange(1, len(tbl) + 1)))
        return tbl.drop_columns(["__wsk", "__one"])

    pruned = ds.map_batches(add_key, batch_format="pyarrow")
    return bucketed_apply(pruned, "__one", final, num_buckets=1)


def weighted_sample_grouped(ds: Dataset, group_col: str, k: int,
                            weight_col: str, id_col: str = "doc_id",
                            seed: int = 7,
                            num_buckets: int = 32) -> Dataset:
    """Per-group deterministic weighted sampling without replacement —
    the stratified sibling of :func:`weighted_sample`: within EVERY
    ``group_col`` value, the ``k`` largest Efraimidis–Spirakis
    exponential keys (``ln(u)/w``, u from the shared (id, seed) hash
    family — the identical ONE-expression key, so the SQL twin orders
    bit-for-bit with id tie-break) are that group's
    probability-proportional-to-weight draws; groups smaller than
    ``k`` keep all rows. The per-domain quota sampler for mixture
    curation — reproducible under any partitioning, a new seed is an
    independent sample. Emits selected rows with ``sample_rank``
    (1 = the group's first draw).

    Scale shape: keys map-side, per-block per-group top-``k``
    pre-prune (lexsort run-bounded, no Python loops) caps the
    exchange at ``blocks × groups × k`` rows, then ONE bucketed
    exchange on the group ranks each group's survivors."""
    from .window import bucketed_apply
    if k < 1:
        raise ValueError("k must be >= 1")
    kk = int(k)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(w) and (not np.all(np.isfinite(w)) or (w <= 0).any()):
            raise ValueError("weighted_sample_grouped: weights must "
                             "be strictly positive and finite")
        u = ids.astype(np.uint64)
        h = ((u % np.uint64(1 << 20)) * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        uni = (h + np.uint64(1)).astype(np.float64) / 4294967297.0
        key = np.log(uni) / w
        t = t.append_column("__wsk", pa.array(key))
        if len(t) > kk:
            # per-group top-k pre-prune: group rows by dictionary
            # code, keep each run's k largest keys
            codes = pc.dictionary_encode(
                t[group_col].combine_chunks()
                if isinstance(t[group_col], pa.ChunkedArray)
                else t[group_col]).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            order = np.lexsort((-key, codes))
            g_sorted = codes[order]
            starts = np.concatenate(
                [[0], np.flatnonzero(g_sorted[1:] != g_sorted[:-1])
                 + 1])
            run_of = np.repeat(np.arange(len(starts)),
                               np.diff(np.concatenate(
                                   [starts, [len(g_sorted)]])))
            pos_in_run = np.arange(len(g_sorted)) - starts[run_of]
            keep = order[pos_in_run < kk]
            t = t.take(pa.array(np.sort(keep)))
        return t

    def final(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            (group_col, "ascending"), ("__wsk", "descending"),
            (id_col, "ascending")])
        tbl = tbl.take(idx)
        g = tbl[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = pc.dictionary_encode(g).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]) \
            if len(codes) else np.zeros(0, dtype=np.int64)
        run_of = np.repeat(np.arange(len(starts)),
                           np.diff(np.concatenate(
                               [starts, [len(codes)]]))) \
            if len(codes) else np.zeros(0, dtype=np.int64)
        rank = np.arange(len(codes)) - starts[run_of] + 1 \
            if len(codes) else np.zeros(0, dtype=np.int64)
        mask = rank <= kk
        tbl = tbl.append_column("sample_rank", pa.array(rank))
        return tbl.filter(pa.array(mask)).drop_columns(["__wsk"])

    pruned = ds.map_batches(add_key, batch_format="pyarrow")
    return bucketed_apply(pruned, group_col, final,
                          num_buckets=num_buckets)


def blocklist_stats(ds: Dataset, terms: Sequence[str],
                    text_col: str = "text",
                    whole_word: bool = True) -> Dataset:
    """C4-style blocklist screen: for each doc, how many DISTINCT
    blocked terms occur (``n_blocked_terms``) and whether any does
    (``blocked``) — the "bad words" filter of C4 (Raffel et al. 2020,
    public list) / RefinedWeb, as a zero-shuffle vectorized scan.

    Each term matches as an RE2 word-boundary regex (``\\bterm\\b``,
    multi-word phrases allowed), one ``pc.match_substring_regex`` pass
    per term over the whole batch — never a per-row loop. DuckDB's
    ``regexp_matches`` is RE2 too, so a SQL twin running the identical
    pattern strings compares exactly. Case-sensitive by design (fold
    upstream with ``pc.utf8_lower`` when needed). The term list is a
    small constant (dozens to hundreds) — it ships inside the closure,
    never a join."""
    if not terms:
        raise ValueError("terms must be non-empty")
    pats = [(r"\b" + re.escape(t) + r"\b") if whole_word
            else re.escape(t) for t in terms]

    def scan(t: pa.Table) -> pa.Table:
        n = np.zeros(len(t), dtype=np.int64)
        col = t[text_col]
        for p in pats:
            hit = pc.match_substring_regex(col, p)
            n += pc.fill_null(hit, False).to_numpy(
                zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "n_blocked_terms", pa.array(n)).append_column(
            "blocked", pa.array(n > 0))

    return ds.map_batches(scan, batch_format="pyarrow")


def blocklist_filter(ds: Dataset, terms: Sequence[str],
                     text_col: str = "text",
                     whole_word: bool = True) -> Dataset:
    """Drop docs hit by any blocklist term (see ``blocklist_stats``)."""
    out = blocklist_stats(ds, terms, text_col, whole_word)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["blocked"], False)) \
            .drop_columns(["n_blocked_terms", "blocked"])

    return out.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# UniMax epoch-capped uniform mixing
# ---------------------------------------------------------------------------

def unimax_weights(ds: Dataset, group_col: str = "source",
                   text_col: str = "text", token_budget: int = 1_000_000,
                   max_epochs: int = 1, token_col: str | None = None):
    """UniMax language/domain sampling (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling"): allocate the token
    budget as UNIFORMLY as possible across domains, subject to a
    per-domain repetition cap of ``n_tokens × max_epochs`` — the
    epoch-capped alternative to temperature mixing
    (:func:`mixture_weights`) that never over-samples a tiny domain
    past ``max_epochs`` repeats.

    Exact integer water-filling (the sequential definition BOTH engines
    execute, so a SQL recursive-CTE twin reproduces it bit-for-bit):
    domains sort by (cap asc, group asc); with ``R`` the remaining
    budget and ``m`` the domains not yet allocated, each domain gets
    ``min(cap, R // m)`` — floor-division remainders roll forward to
    the larger domains, and budget left after every domain hits its cap
    stays unallocated (reported via the ``alloc`` column summing short
    of ``token_budget``). ``epochs = alloc / n_tokens`` is ONE float64
    division of exact ints — correctly rounded identically in numpy and
    DuckDB, so twins compare STRICTLY.

    Scale shape: identical to :func:`mixture_weights` — per-batch
    vectorized token counts ride ONE tiny groupby on the domain key;
    the water-filling loop runs on the driver over #domains rows."""
    from ray.data.aggregate import Count, Sum
    import pandas as _pd

    if int(max_epochs) != max_epochs or max_epochs < 1:
        raise ValueError("max_epochs must be a positive integer")
    if token_budget < 0:
        raise ValueError("token_budget must be non-negative")
    max_epochs = int(max_epochs)

    if token_col is None:
        def count(t: pa.Table) -> pa.Table:
            return pa.table({group_col: t[group_col],
                             "__n_tok": ws_token_count(t[text_col])})
        counted = ds.map_batches(count, batch_format="pyarrow")
        token_col = "__n_tok"
    else:
        counted = ds
    pdf = counted.groupby(group_col).aggregate(
        Count(alias_name="n_docs"),
        Sum(token_col, alias_name="n_tokens")).to_pandas()
    if group_col not in pdf.columns:     # empty input: no groups at all
        return _pd.DataFrame({group_col: [], "n_docs": [], "n_tokens": [],
                              "cap": [], "alloc": [], "epochs": []})
    pdf["n_docs"] = pdf["n_docs"].astype("int64")
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    pdf["cap"] = pdf["n_tokens"] * max_epochs
    pdf = pdf.sort_values(["cap", group_col],
                          kind="stable").reset_index(drop=True)
    caps = pdf["cap"].to_numpy()
    alloc = np.zeros(len(pdf), dtype=np.int64)
    remaining = int(token_budget)
    for i in range(len(pdf)):
        m = len(pdf) - i
        a = min(int(caps[i]), remaining // m)
        alloc[i] = a
        remaining -= a
    pdf["alloc"] = alloc
    n = pdf["n_tokens"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ep = alloc.astype(np.float64) / n
    pdf["epochs"] = np.where(n > 0, ep, np.nan)
    return pdf


def secret_scan(ds: Dataset, text_col: str = "text",
                id_col: str = "doc_id", min_len: int = 16,
                entropy_threshold: float = 3.5) -> Dataset:
    """High-entropy token screen — the secret/credential detector of
    code- and web-curation pipelines (truffleHog-style): whitespace
    tokens matching the base64-ish candidate class
    ``^[A-Za-z0-9+/=_-]{min_len,}$`` are scored by Shannon byte
    entropy

        H = log2(L) − (Σ_c n_c·log2(n_c)) / L

    and flagged when ``H ≥ entropy_threshold`` (random keys ≈ 5–6
    bits/char, English ≈ 2–3, repeated filler ≈ 0). Candidates are
    ASCII by the class regex, so the char histogram is one
    ``np.frombuffer`` + packed-key ``np.unique`` over the flattened
    candidate bytes — zero per-row Python, zero shuffles. Per
    distinct (doc, token): ``tok_len``, ``n_occ``, ``entropy``
    (round-6 — log2 terms are irrational or binary-rational, both
    rounding-boundary-safe) and ``is_secret`` 0/1."""
    pat = "^[A-Za-z0-9+/=_-]{%d,}$" % min_len

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "tok_len": pa.array([], pa.int64()),
                          "n_occ": pa.array([], pa.int64()),
                          "entropy": pa.array([], pa.float64()),
                          "is_secret": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        from .text import _split_flat
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_of = np.repeat(np.arange(len(n_real)), n_real)
        cand = pc.match_substring_regex(flat, pat) \
            .to_numpy(zero_copy_only=False)
        if not cand.any():
            return empty
        toks = flat.filter(pa.array(cand))
        docs = ids[doc_of[cand]]
        # distinct (doc, token) + occurrence counts
        tnp = toks.to_numpy(zero_copy_only=False)
        order = np.lexsort((tnp, docs))
        docs, tnp = docs[order], tnp[order]
        new = np.r_[True, (docs[1:] != docs[:-1])
                    | (tnp[1:] != tnp[:-1])]
        starts = np.flatnonzero(new)
        n_occ = np.diff(np.r_[starts, len(docs)]).astype(np.int64)
        docs_u, toks_u = docs[starts], tnp[starts]
        # byte histogram over the distinct tokens, flattened
        joined = "".join(toks_u)
        b = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        lens = np.array([len(s) for s in toks_u], np.int64)
        tok_of = np.repeat(np.arange(len(toks_u)), lens)
        packed = tok_of.astype(np.int64) * 256 + b.astype(np.int64)
        up, ucnt = np.unique(packed, return_counts=True)
        seg = up // 256
        cc = ucnt.astype(np.float64)
        term = cc * np.log2(cc)
        seg_starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
        seg_sum = np.add.reduceat(term, seg_starts)
        ssum = np.zeros(len(toks_u), np.float64)
        ssum[seg[seg_starts]] = seg_sum
        ent = np.log2(lens.astype(np.float64)) \
            - ssum / lens.astype(np.float64)
        is_sec = (ent >= entropy_threshold).astype(np.int64)
        return pa.table({
            id_col: pa.array(docs_u),
            "token": pa.array(toks_u.astype(object)),
            "tok_len": pa.array(lens),
            "n_occ": pa.array(n_occ),
            "entropy": pa.array(ent),
            "is_secret": pa.array(is_sec)})

    return ds.map_batches(fn, batch_format="pyarrow")


def k_anonymity(ds: Dataset, qi_cols: Sequence[str],
                sensitive_col: str, k: int = 5,
                num_buckets: int = 32) -> Dataset:
    """k-anonymity / l-diversity audit — the privacy-governance
    companion to the PII scrub: group rows by the quasi-identifier
    combination and report, per equivalence class,

    * ``n`` — class size (re-identification risk when ``n < k``),
    * ``l_div`` — DISTINCT sensitive values in the class (attribute-
      disclosure risk when 1: everyone in the class shares the
      sensitive value even if n ≥ k),
    * ``at_risk`` — 0/1 flag: ``n < k OR l_div < 2``.

    All exact int64 — the SQL GROUP BY twin compares STRICTLY. Scale
    shape: per-block packed distinct partials (class × sensitive)
    collapse block rows to their distinct combinations, ONE bucketed
    exchange on the class key merges (a class lives in one bucket, so
    n and l_div are exact there). Suppression = join the flagged
    classes back (semi-join on the class key) — left to the caller so
    the audit table stays inspectable."""
    if k < 1:
        raise ValueError("k_anonymity: k must be >= 1")
    if not qi_cols:
        raise ValueError("k_anonymity: need at least one QI column")
    SEP = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"qi": pa.array([], pa.string()),
                          "sv": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        key = pc.binary_join_element_wise(
            *[pc.cast(t[c], pa.string()) for c in qi_cols],
            pa.scalar(SEP))
        sv = pc.cast(t[sensitive_col], pa.string())
        kk = key.to_numpy(zero_copy_only=False)
        ss = sv.to_numpy(zero_copy_only=False)
        order = np.lexsort((ss, kk))
        kk, ss = kk[order], ss[order]
        new = np.r_[True, (kk[1:] != kk[:-1]) | (ss[1:] != ss[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(kk)]).astype(np.int64)
        return pa.table({"qi": pa.array(kk[starts]),
                         "sv": pa.array(ss[starts]),
                         "cnt": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    from .window import bucketed_apply

    def per_class_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"qi": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "l_div": pa.array([], pa.int64()),
                          "at_risk": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        kk = t["qi"].to_numpy(zero_copy_only=False)
        ss = t["sv"].to_numpy(zero_copy_only=False)
        cc = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ss, kk))
        kk, ss, cc = kk[order], ss[order], cc[order]
        newp = np.r_[True, (kk[1:] != kk[:-1]) | (ss[1:] != ss[:-1])]
        pst = np.flatnonzero(newp)
        cc = np.add.reduceat(cc, pst)
        kk, ss = kk[pst], ss[pst]
        cst = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        n = np.add.reduceat(cc, cst)
        l_div = np.diff(np.r_[cst, len(kk)]).astype(np.int64)
        at_risk = ((n < k) | (l_div < 2)).astype(np.int64)
        return pa.table({"qi": pa.array(kk[cst]),
                         "n": pa.array(n.astype(np.int64)),
                         "l_div": pa.array(l_div),
                         "at_risk": pa.array(at_risk)})

    return bucketed_apply(parts, "qi", per_class_bucket, num_buckets,
                          drop_bucket=False)


def balance_classes(ds: Dataset, class_col: str, id_col: str,
                    seed: int = 13,
                    num_buckets: int = 32) -> Dataset:
    """Deterministic class balancing — downsample every class to the
    SMALLEST class's size (the classic imbalanced-training fix,
    reproducible under any partitioning): each row gets
    ``h = ((id mod 2^20)·2654435761 + seed·1315423911) mod 2^32`` and
    a class keeps its ``k_min`` smallest (h, id) rows. Integer-exact
    and deterministic — the SQL ``row_number`` twin reproduces the
    exact surviving set.

    Scale shape: class sizes via ONE tiny groupby; map-side per-block
    per-class bottom-k prune (lexsort run offsets — nothing beyond
    blocks·classes·k_min rows moves) + ONE class-bucketed exchange
    for the global bottom-k. The (h, id) tie-break makes survivors
    unique even under hash collisions."""
    from .window import bucketed_apply
    sizes = ds.groupby(class_col).count().to_pandas()
    if sizes.empty:
        raise ValueError("balance_classes: empty input")
    k_min = int(sizes["count()"].min())

    def with_h(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = ((ids % np.uint64(1 << 20)) * np.uint64(2654435761)
             + np.uint64(seed) * np.uint64(1315423911)) \
            % np.uint64(1 << 32)
        return t.append_column("__h", pa.array(h.astype(np.int64)))

    def prune(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        g = t[class_col].to_numpy(zero_copy_only=False)
        h = t["__h"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, g))
        gs = g[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        cnt = np.diff(np.r_[starts, len(gs)])
        pos = np.arange(len(gs)) - np.repeat(starts, cnt)
        keep = order[pos < k_min]
        return t.take(pa.array(np.sort(keep)))

    tagged = ds.map_batches(with_h, batch_format="pyarrow") \
        .map_batches(prune, batch_format="pyarrow")
    out = bucketed_apply(tagged, class_col, prune, num_buckets,
                         drop_bucket=True)
    return out.map_batches(lambda t: t.drop_columns(["__h"]),
                           batch_format="pyarrow")


def majority_vote_labels(ds: Dataset, lf_cols: Sequence[str],
                         id_col: str, abstain: int = -1) -> Dataset:
    """Weak-supervision label aggregation (Snorkel-lite majority
    vote): K noisy labeling-function columns vote per row — abstains
    (``abstain`` value) are ignored, the modal label wins, ties and
    all-abstain rows emit ``abstain``. Emits per row: ``vote``,
    ``n_votes`` (non-abstain count) and ``n_agree`` (votes matching
    the winner; 0 on abstention) — all exact int64, zero shuffles,
    one vectorized pass (labels are small non-negative ints;
    per-(row, label) counts via one bincount scatter). The classic
    programmatic-labeling first step before a learned label model."""
    if not lf_cols:
        raise ValueError("majority_vote_labels: need >= 1 labeling "
                         "function column")

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "vote": pa.array([], pa.int64()),
                             "n_votes": pa.array([], pa.int64()),
                             "n_agree": pa.array([], pa.int64())})
        L = np.stack([t[c].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for c in lf_cols], axis=1)
        valid = L != abstain
        if valid.any() and L[valid].min() < 0:
            raise ValueError("majority_vote_labels: labels must be "
                             "non-negative (abstain excepted)")
        n_lab = int(L[valid].max()) + 1 if valid.any() else 1
        counts = np.zeros((n, n_lab), np.int64)
        rows = np.repeat(np.arange(n), len(lf_cols)) \
            .reshape(n, len(lf_cols))
        np.add.at(counts, (rows[valid], L[valid]), 1)
        n_votes = counts.sum(axis=1)
        best = counts.max(axis=1)
        # winner = smallest label achieving the max; tie (two labels
        # at max) or all-abstain -> abstain
        arg = np.argmax(counts, axis=1)
        n_at_max = (counts == best[:, None]).sum(axis=1)
        tie = (n_at_max > 1) | (n_votes == 0)
        vote = np.where(tie, abstain, arg)
        n_agree = np.where(tie, 0, best)
        return pa.table({id_col: t[id_col],
                         "vote": pa.array(vote.astype(np.int64)),
                         "n_votes": pa.array(n_votes),
                         "n_agree": pa.array(n_agree
                                             .astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Resumable web-curation chain (round-4 verdict item 6)
# ---------------------------------------------------------------------------

def web_curate_checkpointed(
        input_paths, ckpt_dir: str, *, text_col: str = "text",
        id_col: str = "doc_id", source_col: str = "source",
        min_docs: int = 2, min_chars: int = 60, cap: int = 5,
        boiler_buckets: int = 16, clean_buckets: int = 8,
        dedup_buckets: int = 16, cap_buckets: int = 8) -> dict:
    """Resumable web-curation chain — the checkpointed sibling of the
    ``web_curated_docs`` composition (boilerplate-line removal →
    char-length gate → exact dedup on the cleaned text → per-domain
    cap), mirroring ``dedup.minhash_lsh_dedup_checkpointed``: each of
    the chain's three exchange boundaries lands in its own
    per-partition checkpoint directory with lineage manifests
    (``state/checkpoint.py``), so a killed 100-TB curation run resumes
    at the granularity of one stage — and, within the stage being
    redone, already-verified output buckets are pruned before the
    write exchange.

    Layout under ``ckpt_dir``::

        clean/  part-{hash(doc_id) % clean_buckets}.parquet
        dedup/  part-{hash(doc_id) % dedup_buckets}.parquet
        capped/ part-{hash(source) % cap_buckets}.parquet

    Unlike per-doc stages, the boilerplate line-frequency statistic is
    CROSS-document, so the input is never pruned on resume (pruned
    input would change the distinct-doc counts); a stage whose output
    partitions all verify is skipped entirely, which bounds wasted
    work on a crash to one stage's exchanges. Fingerprints chain the
    upstream stage's fingerprint with every parameter that changes its
    output, so a parameter change invalidates exactly the stages it
    affects.

    The final table (doc_id, source, text, n_removed, n_dups,
    src_rank) is ``checkpoint.read_result(ckpt_dir + "/capped")``;
    every stage kernel is deterministic, so a resumed run
    byte-compares equal to an uninterrupted one after a doc_id sort
    (tested in ``tests/test_web_curate_checkpoint.py``)."""
    import glob as _glob
    import os as _os

    import ray.data as rd

    from ..state import checkpoint as CP
    from .dedup import _fp16, exact_dedup

    if isinstance(input_paths, str):
        files = sorted(_glob.glob(_os.path.join(input_paths,
                                                "*.parquet"))) \
            if _os.path.isdir(input_paths) else [input_paths]
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError("web_curate_checkpointed: no input files")
    fp_in = CP.input_fingerprint_of(files)
    fp_clean = _fp16(fp_in, "clean", min_docs, min_chars,
                     boiler_buckets, clean_buckets)
    fp_dedup = _fp16(fp_clean, "dedup", dedup_buckets)
    fp_cap = _fp16(fp_dedup, "cap", cap, cap_buckets)
    clean_dir = _os.path.join(ckpt_dir, "clean")
    dedup_dir = _os.path.join(ckpt_dir, "dedup")
    cap_dir = _os.path.join(ckpt_dir, "capped")

    # Stage 1: boilerplate removal + length gate, partitioned by doc
    if CP.missing_partitions(clean_dir, fp_clean, clean_buckets):
        docs = rd.read_parquet(files,
                               columns=[id_col, text_col, source_col])
        clean = remove_boilerplate_lines(
            docs, text_col=text_col, id_col=id_col, min_docs=min_docs,
            num_buckets=boiler_buckets, keep_cols=[source_col])

        def gate(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(
                pc.utf8_length(t[text_col]), pa.scalar(min_chars)))

        s_clean = CP.run_partitioned(
            clean.map_batches(gate, batch_format="pyarrow"),
            clean_dir, entity_col=id_col, num_buckets=clean_buckets,
            input_fingerprint=fp_clean)
    else:
        s_clean = {"written": [], "skipped": list(range(clean_buckets)),
                   "rows": 0}
    clean_files = CP.verified_files(clean_dir, fp_clean)
    if not clean_files:
        # every page was scrubbed/gated away (e.g. a fully-duplicated
        # corpus where ALL lines cross the min_docs boilerplate bar):
        # the direct chain returns an EMPTY dataset here — match it by
        # short-circuiting with a loud flag instead of handing
        # read_parquet an empty path list
        empty_stats = {"written": [], "skipped": [], "rows": 0}
        return {"clean": s_clean, "dedup": empty_stats,
                "capped": empty_stats, "empty": True,
                "fingerprints": {"input": fp_in, "clean": fp_clean,
                                 "dedup": fp_dedup, "cap": fp_cap}}

    # Stage 2: exact dedup on the CLEANED text, partitioned by doc
    if CP.missing_partitions(dedup_dir, fp_dedup, dedup_buckets):
        cleaned = rd.read_parquet(
            clean_files,
            columns=[id_col, text_col, source_col, "n_removed"])
        dd = exact_dedup(cleaned, text_col, id_col,
                         num_buckets=dedup_buckets,
                         keep_cols=[source_col, "n_removed"])
        s_dedup = CP.run_partitioned(
            dd, dedup_dir, entity_col=id_col,
            num_buckets=dedup_buckets, input_fingerprint=fp_dedup)
    else:
        s_dedup = {"written": [], "skipped": list(range(dedup_buckets)),
                   "rows": 0}
    dedup_files = CP.verified_files(dedup_dir, fp_dedup)

    # Stage 3: per-domain cap, partitioned by source
    if CP.missing_partitions(cap_dir, fp_cap, cap_buckets):
        surv = rd.read_parquet(dedup_files)
        capped = cap_per_source(surv, cap=cap, by_col=source_col,
                                id_col=id_col, num_buckets=cap_buckets)
        s_cap = CP.run_partitioned(
            capped, cap_dir, entity_col=source_col,
            num_buckets=cap_buckets, input_fingerprint=fp_cap)
    else:
        s_cap = {"written": [], "skipped": list(range(cap_buckets)),
                 "rows": 0}
    return {"clean": s_clean, "dedup": s_dedup, "capped": s_cap,
            "fingerprints": {"input": fp_in, "clean": fp_clean,
                             "dedup": fp_dedup, "cap": fp_cap}}
