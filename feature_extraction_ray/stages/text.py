"""Text-analysis stages over a documents table (training-data pipeline ops).

Large-scale-pipeline operators the reference doesn't have but a 100 TB
training-data engine needs (driver brief): language-ID (stopword/charset
n-gram heuristic), quality scoring (length/punct/stopword ratios), token
counting (whitespace + BPE-ish regex), and document fingerprinting
(rolling polynomial hash). Reference analogs for the primitives:
punctuation strip ``text_features/text_util.py:104-109`` (M1), stopword
removal ``archived/preprocess_text.py:7-17`` (M8), verbosity counts
``text_features/extract_verbosity_stats.py:10-36`` (G1).

All stages are stateful actor-pool ``map_batches`` classes: regexes are
compiled and stopword tables built ONCE per actor in ``__init__``, batches
processed vectorized (pandas .str / numpy), per the actor-pool rule for
stateful stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from typing import Sequence

from .partition import group_field_type

# minimal per-language stopword profiles (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "an", "be", "this"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
           "nicht", "ein", "eine", "auf", "für", "im", "dem"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que",
           "pour", "dans", "qui", "sur", "pas", "au"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "del", "no"},
}




FP_BASE = np.uint64(1099511628211)
FP_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(word_hashes: np.ndarray) -> np.uint64:
    """Order-sensitive polynomial rolling hash of a word-hash sequence."""
    h = FP_OFFSET
    with np.errstate(over="ignore"):
        for w in word_hashes:
            h = h * FP_BASE + np.uint64(w)
    return h


def hash_words_array(flat: pa.Array) -> np.ndarray:
    """FNV-1a hash (``hash_word``-identical) of a word column, hashing
    each UNIQUE word once via dictionary-encode + gather — corpus word
    streams repeat a small vocabulary, so this is ~5-10× cheaper than
    hashing every occurrence."""
    from .partition import _stable_hash_strings
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64)
    de = flat.dictionary_encode()
    uh = _stable_hash_strings(de.dictionary)
    return uh[de.indices.to_numpy(zero_copy_only=False)]


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc sums over flat values; zero (not repeated-neighbor) for
    empty segments — the reduceat empty-segment fix in one place."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=values.dtype)
    if len(values) == 0:
        return out
    lens = np.diff(offsets)
    nonempty = lens > 0
    with np.errstate(over="ignore"):
        out[nonempty] = np.add.reduceat(values, offsets[:-1][nonempty])
    return out


def _split_flat(txt: pa.ChunkedArray | pa.Array):
    """Python-``str.split()``-equivalent whitespace tokenization for a
    whole column at once: trim → split → mask the lone empty token a
    trimmed-empty doc produces (that is the ONLY way split-after-trim
    emits an empty word, so real-word accounting is an O(#empty-docs)
    fixup, not a full-stream pass). Returns (flat_words, flat word
    lengths (int32), doc offsets, real-word mask, per-doc real counts)."""
    import pyarrow.compute as pc
    words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(txt))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        if len(flat) else np.zeros(0, dtype=np.int32)
    row_len = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(row_len) + 1, dtype=np.int64)
    np.cumsum(row_len, out=offsets[1:])
    n_real = row_len.copy()
    lone = np.flatnonzero(row_len == 1)
    empty_docs = lone[flat_len[offsets[:-1][lone]] == 0] if len(lone) \
        else lone
    real = None
    if len(empty_docs):
        n_real[empty_docs] = 0
        real = np.ones(len(flat), dtype=bool)
        real[offsets[:-1][empty_docs]] = False
    return flat, flat_len, offsets, real, n_real


def ws_token_count(txt: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Python-``str.split()``-equivalent whitespace token count, fully
    Arrow-native (trim → split → list length, with the trimmed-empty-doc
    ``[""] → 0`` fixup). The vectorized replacement for the per-column
    pandas pass ``TokenCount`` does."""
    import pyarrow.compute as pc
    trimmed = pc.utf8_trim_whitespace(txt)
    n = pc.cast(pc.list_value_length(pc.utf8_split_whitespace(trimmed)),
                pa.int64())
    return pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                      pa.scalar(0, type=pa.int64()), n)


def _rolling_fp_batch(word_hashes: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Vectorized per-doc rolling fingerprint: the sequential
    ``h = h*B + w`` recurrence expands to ``OFFSET·Bᴸ + Σ wᵢ·B^(L-1-i)``
    (mod 2⁶⁴), so one power-table lookup + segmented sum replaces the
    per-word Python loop. Bit-identical to :func:`rolling_fingerprint`."""
    n_docs = len(counts)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    max_l = int(counts.max()) if n_docs else 0
    pows = np.empty(max_l + 1, dtype=np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for e in range(1, max_l + 1):
            pows[e] = pows[e - 1] * FP_BASE
        # exponent of word i = (doc_end - 1) - i, one repeat + one arange
        exp = np.repeat(offsets[1:] - 1, counts) - \
            np.arange(len(word_hashes), dtype=np.int64)
        terms = word_hashes * pows[exp]
        out = FP_OFFSET * pows[counts]
        out += _segment_sum(terms, offsets)
    return out


class Fingerprint:
    """64-bit order-sensitive document fingerprint (rolling hash over word
    hashes) — identical normalized content ⇒ identical fingerprint.
    Vectorized: Arrow split → one flat FNV pass → power-table polynomial
    per doc (no per-word Python loop)."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, flat_len, offsets, real, n_real = _split_flat(
            batch[self.text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        wh = hash_words_array(flat)
        out = _rolling_fp_batch(wh, n_real)
        return batch.append_column(self.out_col,
                                   pa.array(out.astype(np.int64)))


def hash_word(w: str) -> int:
    """Stable FNV-1a of a word (process-independent, unlike builtin hash)."""
    h = 14695981039346656037
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class TextAnalyzer:
    """Fused single-pass analyzer: langid + quality + token counts +
    fingerprint in ONE stage — and ONE Arrow/numpy pass: the text
    column is split once (Arrow `utf8_split_whitespace`), word hashes /
    lengths / stopword hits are computed over the FLAT word array, and
    every per-doc statistic is a segmented sum (`np.add.reduceat`) —
    no `.map(lambda)` row loops anywhere (this is the most CPU-heavy
    non-shuffle stage of a corpus pass). Values match the single-purpose
    `LangId`/`QualityScore`/`TokenCount` twins — which live in
    `stages/reference_impls.py` as NON-production test oracles — and the
    `Fingerprint` stage here (regex char-class caveat:
    counts use RE2 — ASCII `\\w`/`\\d`/`\\s` — matching the DuckDB
    oracle; identical to Python `re` on ASCII text).

    Chaining four separate pools starves small clusters (each pool
    reserves ≥1 CPU) and re-parses the text four times; state for all
    four analyses loads once here.
    """

    _LANG_TOKEN_CLEAN = r"[^a-zA-ZäöüßéèêàâçñáíóúÀ-ÿ']+"
    _PUNCT = r"[^\w\s]"
    _DIGIT = r"\d"
    _BPE = r"\d|[^\w\s]|\w{1,4}"

    def __init__(self, text_col: str = "text", min_score: float = 0.02):
        self.text_col = text_col
        self.min_score = min_score
        self.langs = list(_STOPWORDS)
        self.lang_sets = {lang: pa.array(sorted(ws))
                          for lang, ws in _STOPWORDS.items()}
        self.en_stop = pa.array(sorted(_STOPWORDS["en"]))

    def _call_table(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from .partition import _stable_hash_strings
        txt = batch[self.text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_docs = len(txt)

        # ---- langid over regex-token stream (lowercased) ----
        low = pc.utf8_lower(txt)
        cleaned = pc.replace_substring_regex(
            low, pattern=self._LANG_TOKEN_CLEAN, replacement=" ")
        tflat, _tlen, toff, treal, tn = _split_flat(cleaned)
        scores = np.zeros((len(self.langs), n_docs), dtype=np.float64)
        denom = np.maximum(tn, 1).astype(np.float64)
        if len(tflat):
            tde = tflat.dictionary_encode()       # hash each unique token
            tcodes = tde.indices.to_numpy(zero_copy_only=False)
            for li, lang in enumerate(self.langs):
                hu = pc.is_in(tde.dictionary,
                              value_set=self.lang_sets[lang]) \
                    .to_numpy(zero_copy_only=False).astype(np.int32)
                scores[li] = _segment_sum(hu[tcodes], toff) / denom
        best = scores.argmax(axis=0)
        best_score = scores.max(axis=0)
        lang_arr = np.array(self.langs, dtype=object)[best]
        lang_arr[(best_score <= self.min_score) | (tn == 0)] = "und"

        # ---- quality + token counts over the whitespace word stream ----
        flat, flat_len, offsets, real, n_words = _split_flat(txt)
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sum_len = _segment_sum(flat_len, offsets)
        has_words = n_words > 0
        fdenom = np.maximum(n_words, 1).astype(np.float64)
        mean_word_len = sum_len / fdenom
        if len(flat):
            fde = flat.dictionary_encode()        # unique-word lookups
            fcodes = fde.indices.to_numpy(zero_copy_only=False)
            su = pc.is_in(fde.dictionary, value_set=self.en_stop) \
                .to_numpy(zero_copy_only=False).astype(np.int32)
            stop_flat = su[fcodes]
        else:
            stop_flat = np.zeros(0, dtype=np.int32)
        stop_ratio = _segment_sum(stop_flat, offsets) / fdenom
        long_frac = _segment_sum((flat_len > 6).astype(np.int32),
                                 offsets) / fdenom
        punct = pc.count_substring_regex(txt, pattern=self._PUNCT) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        digit = pc.count_substring_regex(txt, pattern=self._DIGIT) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        char_denom = np.maximum(n_chars, 1).astype(np.float64)
        bpe = pc.count_substring_regex(txt, pattern=self._BPE) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        # ---- fingerprint over real words (reuse the word dictionary) ----
        if len(flat):
            uh = _stable_hash_strings(fde.dictionary)
            wh = uh[fcodes] if real is None else uh[fcodes[real]]
        else:
            wh = np.zeros(0, dtype=np.uint64)
        fp = _rolling_fp_batch(wh, n_words)

        nan_mask = ~has_words
        batch = batch.append_column("lang_pred",
                                    pa.array(lang_arr, type=pa.string()))
        batch = batch.append_column("q_n_chars", pa.array(n_chars))
        batch = batch.append_column("q_n_words", pa.array(n_words))
        for name, vals in (("q_mean_word_len", mean_word_len),
                           ("q_stopword_ratio", stop_ratio)):
            batch = batch.append_column(name, pa.array(vals, mask=nan_mask))
        batch = batch.append_column("q_punct_ratio",
                                    pa.array(punct / char_denom))
        batch = batch.append_column("q_digit_ratio",
                                    pa.array(digit / char_denom))
        batch = batch.append_column("q_long_word_frac",
                                    pa.array(long_frac, mask=nan_mask))
        batch = batch.append_column("n_tok_ws", pa.array(n_words))
        batch = batch.append_column("n_tok_bpe", pa.array(bpe))
        batch = batch.append_column("fingerprint",
                                    pa.array(fp.astype(np.int64)))
        return batch

    def __call__(self, batch):
        if isinstance(batch, pd.DataFrame):      # unit-test convenience
            return self._call_table(
                pa.Table.from_pandas(batch, preserve_index=False)
            ).to_pandas()
        return self._call_table(batch)


def analyze_text(ds: Dataset, text_col: str = "text",
                 concurrency=None, batch_size: int = 2048) -> Dataset:
    """Full text-analysis pass (one fused task-pool stage, one text
    parse, zero-copy Arrow batches; the analyzer kernel is memoized per
    worker process — see :func:`partition.cached_kernel`)."""
    from .partition import cached_kernel

    def analyze(batch: pa.Table) -> pa.Table:
        return cached_kernel(TextAnalyzer, text_col)(batch)

    return ds.map_batches(analyze, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity-style quality scoring — the CCNet /
# Gopher LLM-data filter shape: fit an LM on the corpus, score each doc,
# filter the tails). Unigram MLE keeps it exactly SQL-checkable; the
# fit-then-broadcast-then-score structure is identical to what a real
# KenLM-style scorer needs.
# ---------------------------------------------------------------------------

def fit_unigram_lm(ds: Dataset, text_col: str = "text",
                   top_k: int | None = None) -> dict:
    """Distributed unigram LM fit: per-batch partial word counts (Arrow
    dictionary-encode + bincount — no Python loop over words) → one
    small ``groupby(word).sum()`` exchange → driver-side log-prob table.

    Returns ``{"logprob": {word: ln(count/total)}, "total": N}``.
    ``top_k`` caps the vocabulary to the most frequent words (at corpus
    scale the full vocab may not fit the driver); capped-out words score
    as OOV with floor probability ``1/total``. Leave ``None`` for the
    exact oracle-checked path.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(t[text_col]))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        if len(flat) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(de.dictionary))
        return pa.table({"word": de.dictionary.cast(pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    counts = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    total = int(counts["cnt"].sum())
    if top_k is not None and len(counts) > top_k:
        counts = counts.nlargest(top_k, "cnt")
    lp = dict(zip(counts["word"],
                  np.log(counts["cnt"].to_numpy(dtype=np.float64) / total)))
    return {"logprob": lp, "total": total}


class SurprisalScorer:
    """Scoring kernel (task-pool, memoized per worker process): per-doc
    total/mean unigram log-probability under a broadcast LM
    (``ray.put`` once, fetched once per worker). Vectorized: one
    split per batch, the LM lookup runs over the batch's UNIQUE words
    only (dictionary-encode), per-doc sums are segmented adds."""

    def __init__(self, lm_ref, text_col: str = "text"):
        lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self.lp = lm["logprob"]
        self.floor = -np.log(max(lm["total"], 1))   # OOV: count 1
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(batch[self.text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            counts = n_real
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            counts = n_real
            offs = offsets
        if len(flat):
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False)
            uniq_lp = np.array([self.lp.get(w, self.floor)
                                for w in de.dictionary.to_pylist()],
                               dtype=np.float64)
            sums = _segment_sum(uniq_lp[codes], offs)
        else:
            sums = np.zeros(len(batch), dtype=np.float64)
        keep = counts > 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(counts.astype(np.int64)),
            "sum_logprob": pa.array(sums),
        }).filter(pa.array(keep))


def surprisal_scores(ds: Dataset, lm: dict | None = None,
                     text_col: str = "text",
                     concurrency=(1, 8)) -> Dataset:
    """Fit (if no ``lm`` given) + score: per-doc ``(doc_id, n_words,
    sum_logprob)`` under the corpus unigram LM. Docs with zero words are
    dropped (they have no distribution). Filter the low tail of
    ``sum_logprob / n_words`` to drop gibberish, the high tail to drop
    boilerplate — the standard perplexity-filter recipe."""
    if lm is None:
        lm = fit_unigram_lm(ds, text_col)
    ref = ray.put(lm)
    from .partition import cached_kernel

    def score(batch: pa.Table) -> pa.Table:
        # keyed on the broadcast ref: each worker process ray.gets the
        # LM once, later tasks hit the memo (actor-pool reuse without
        # actor-pool spin-up)
        return cached_kernel(SurprisalScorer, ref, text_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF (two-pass fit-then-score, the classic text-vectorization op)
# ---------------------------------------------------------------------------

def fit_document_frequencies(ds: Dataset, text_col: str = "text",
                             top_k: int | None = None) -> dict:
    """Distributed document-frequency fit: per-batch DISTINCT (doc, word)
    pairs (dictionary-encode + segmented unique — no Python word loops)
    → one small ``groupby(word)`` exchange. Returns ``{"df": {word: df},
    "n_docs": N}`` with raw-count idf ``ln(N/df)`` left to the scorer.
    ``top_k`` caps the vocabulary (most-frequent words) for corpus scale;
    capped-out words score idf 0 (treated as ubiquitous)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def distinct_pairs(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        n_docs_batch = int((n_real > 0).sum())
        if len(flat) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "__docs": pa.array([], type=pa.int64())})
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(n_real)), np.diff(offs))
        # distinct (doc, word): sort by (code, doc), drop repeats
        order = np.lexsort((doc_of, codes))
        c, d = codes[order], doc_of[order]
        keep = np.r_[True, (c[1:] != c[:-1]) | (d[1:] != d[:-1])]
        df_per_code = np.bincount(c[keep], minlength=len(de.dictionary))
        out = pa.table({"word": de.dictionary.cast(pa.string()),
                        "cnt": pa.array(df_per_code.astype(np.int64))})
        # smuggle the batch's doc count through the same aggregate via a
        # reserved row (words can't be empty strings after the split)
        marker = pa.table({"word": pa.array([""]),
                           "cnt": pa.array([n_docs_batch],
                                           type=pa.int64())})
        return pa.concat_tables([out, marker])

    counts = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    n_docs = int(counts.loc[counts["word"] == "", "cnt"].sum())
    counts = counts[counts["word"] != ""]
    if top_k is not None and len(counts) > top_k:
        counts = counts.nlargest(top_k, "cnt")
    return {"df": dict(zip(counts["word"], counts["cnt"].astype(int))),
            "n_docs": n_docs}


class TfIdfScorer:
    """Scoring kernel (task-pool, memoized per worker process):
    per-(doc, word) rows with tf, df and
    ``tfidf = tf · ln(N/df)`` under a broadcast DF table. Vectorized:
    one split per batch, per-doc term counts via segmented unique runs,
    DF lookup over the batch's unique words only."""

    def __init__(self, df_ref, text_col: str = "text"):
        m = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
        self.df = m["df"]
        self.n_docs = m["n_docs"]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(
            batch[self.text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        empty = pa.table({
            "doc_id": pa.array([], type=batch["doc_id"].type),
            "word": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "df": pa.array([], type=pa.int64()),
            "tfidf": pa.array([], type=pa.float64())})
        if len(flat) == 0:
            return empty
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(n_real)), np.diff(offs))
        order = np.lexsort((codes, doc_of))
        c, d = codes[order], doc_of[order]
        new = np.r_[True, (c[1:] != c[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.r_[starts, len(c)]).astype(np.int64)
        uniq_words = de.dictionary.to_pylist()
        dfs = np.array([self.df.get(w, 0) for w in uniq_words],
                       dtype=np.int64)
        with np.errstate(divide="ignore"):
            idf = np.where(dfs > 0, np.log(self.n_docs / np.maximum(
                dfs.astype(np.float64), 1.0)), 0.0)
        doc_col = batch["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        cw = c[starts]
        return pa.table({
            "doc_id": doc_col.take(pa.array(d[starts].astype(np.int64))),
            "word": pa.array(np.array(uniq_words, dtype=object)[cw],
                             type=pa.string()),
            "tf": pa.array(tf),
            "df": pa.array(dfs[cw]),
            "tfidf": pa.array(tf * idf[cw]),
        })


def tfidf_scores(ds: Dataset, model: dict | None = None,
                 text_col: str = "text", concurrency=(1, 8)) -> Dataset:
    """Fit (if no ``model``) + score: per-(doc, word) tf/df/tfidf rows —
    the long-form TF-IDF table a vectorizer or top-k-terms stage
    consumes. Empty docs emit no rows."""
    if model is None:
        model = fit_document_frequencies(ds, text_col)
    ref = ray.put(model)
    from .partition import cached_kernel

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(TfIdfScorer, ref, text_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bigram LM surprisal (the next rung of the perplexity-filter ladder)
# ---------------------------------------------------------------------------

def fit_bigram_lm(ds: Dataset, text_col: str = "text",
                  top_k: int | None = None) -> dict:
    """Distributed bigram LM fit: per-batch partial counts of
    consecutive in-doc word pairs AND of context occurrences (w1 of a
    pair), smuggled through ONE ``groupby.sum`` exchange with a "P"/"C"
    key prefix (a word cannot start with the prefix's following
    separator, so the key spaces cannot collide). Driver builds
    ``{"pair_logprob": {"w1\\x1fw2": ln(n12 / nctx(w1))}, "total":
    total_pairs}`` — conditional MLE, exactly SQL-checkable.

    ``top_k`` caps the PAIR table to the most frequent pairs for corpus
    scale (context counts stay exact — they are vocab-sized); capped-out
    pairs score the OOV floor ``-ln(total_pairs)``. Leave ``None`` for
    the exact oracle-checked path."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    SEP = "\x1f"

    def partials(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        empty = pa.table({"key": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        m = np.maximum(np.diff(offs), 0)
        m = np.maximum(m - 1, 0)                 # pairs per doc
        tot = int(m.sum())
        if tot == 0:
            return empty
        i1 = (np.arange(tot, dtype=np.int64)
              - np.repeat(np.cumsum(m) - m, m)
              + np.repeat(offs[:-1], m))
        w1 = flat.take(pa.array(i1))
        w2 = flat.take(pa.array(i1 + 1))
        pair_key = pc.binary_join_element_wise(
            pa.scalar("P"), w1, w2, SEP)
        ctx_key = pc.binary_join_element_wise(pa.scalar("C"), w1, SEP)
        out = []
        for keys in (pair_key, ctx_key):
            de = keys.dictionary_encode()
            cnt = np.bincount(de.indices.to_numpy(zero_copy_only=False),
                              minlength=len(de.dictionary))
            out.append(pa.table({
                "key": de.dictionary.cast(pa.string()),
                "cnt": pa.array(cnt.astype(np.int64))}))
        return pa.concat_tables(out)

    counts = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    is_pair = counts["key"].str.startswith("P")
    pairs = counts[is_pair]
    ctx = counts[~is_pair]
    ctx_n = {k[2:]: int(v) for k, v in zip(ctx["key"], ctx["cnt"])}
    total = int(pairs["cnt"].sum())
    if top_k is not None and len(pairs) > top_k:
        pairs = pairs.nlargest(top_k, "cnt")
    keys = [k[2:] for k in pairs["key"]]          # "w1\x1fw2"
    n12 = pairs["cnt"].to_numpy(dtype=np.float64)
    nc = np.array([ctx_n[k.split(SEP, 1)[0]] for k in keys],
                  dtype=np.float64)
    lp = np.log(n12 / nc)
    return {"pair_logprob": dict(zip(keys, lp)), "total": total}


class BigramSurprisalScorer:
    """Scoring kernel (task-pool, memoized per worker): per-doc total
    bigram conditional log-probability under a broadcast bigram LM —
    same vectorization shape as :class:`SurprisalScorer` (one split,
    unique-pair dictionary lookup, segmented sums)."""

    def __init__(self, lm_ref, text_col: str = "text"):
        lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self.lp = lm["pair_logprob"]
        self.floor = -np.log(max(lm["total"], 1))
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        flat, _fl, offsets, real, n_real = _split_flat(batch[self.text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        m = np.maximum(np.diff(offs) - 1, 0)
        tot = int(m.sum())
        sums = np.zeros(len(batch), dtype=np.float64)
        if tot:
            i1 = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(m) - m, m)
                  + np.repeat(offs[:-1], m))
            keys = pc.binary_join_element_wise(
                flat.take(pa.array(i1)), flat.take(pa.array(i1 + 1)),
                "\x1f")
            de = keys.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False)
            uniq_lp = np.array([self.lp.get(k, self.floor)
                                for k in de.dictionary.to_pylist()],
                               dtype=np.float64)
            poffs = np.zeros(len(m) + 1, dtype=np.int64)
            np.cumsum(m, out=poffs[1:])
            sums = _segment_sum(uniq_lp[codes], poffs)
        keep = m > 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_pairs": pa.array(m.astype(np.int64)),
            "sum_logprob": pa.array(sums),
        }).filter(pa.array(keep))


def bigram_surprisal_scores(ds: Dataset, lm: dict | None = None,
                            text_col: str = "text") -> Dataset:
    """Fit (if no ``lm``) + score: per-doc ``(doc_id, n_pairs,
    sum_logprob)`` under the corpus bigram LM — a sharper
    perplexity-style gibberish/boilerplate filter than the unigram
    scorer (word-order-aware). Docs with fewer than two words are
    dropped (no bigram distribution)."""
    if lm is None:
        lm = fit_bigram_lm(ds, text_col)
    ref = ray.put(lm)
    from .partition import cached_kernel

    def score(batch: pa.Table) -> pa.Table:
        return cached_kernel(BigramSurprisalScorer, ref, text_col)(batch)

    return ds.map_batches(score, batch_format="pyarrow")

# ---------------------------------------------------------------------------
# BM25 relevance scoring against a fixed query-term set
# ---------------------------------------------------------------------------

def fit_bm25_stats(ds: Dataset, query_terms, text_col: str = "text") -> dict:
    """Corpus statistics BM25 needs for a FIXED query: per-term document
    frequency, corpus doc count and average doc length — computed as one
    zero-shuffle reduction (each batch emits a single partial row of
    ``len(terms) + 2`` counters; ``Dataset.sum`` folds them). No
    vocabulary-wide exchange: unlike ``fit_document_frequencies`` this
    only tracks the handful of query terms."""
    terms = list(query_terms)

    def partial(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        row = {"n_docs": [int((n_real > 0).sum())],
               "total_tokens": [int(n_real.sum())]}
        word_to_code = {}
        codes = doc_of = None
        if len(flat):
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False)
            doc_of = np.repeat(np.arange(len(n_real)), np.diff(offs))
            word_to_code = {w: i for i, w in
                            enumerate(de.dictionary.to_pylist())}
        for j, term in enumerate(terms):
            code = word_to_code.get(term)
            row[f"df_{j}"] = [0 if code is None else
                              int(len(np.unique(doc_of[codes == code])))]
        return pa.table(row)

    cols = ["n_docs", "total_tokens"] + \
        [f"df_{j}" for j in range(len(terms))]
    sums = ds.map_batches(partial, batch_format="pyarrow").sum(cols)
    n = float(sums["sum(n_docs)"])
    total = float(sums["sum(total_tokens)"])
    dfs = np.array([float(sums[f"sum(df_{j})"])
                    for j in range(len(terms))])
    # Robertson–Spärck Jones idf, the BM25+Lucene convention
    idf = np.log(1.0 + (n - dfs + 0.5) / (dfs + 0.5))
    return {"terms": terms, "idf": idf, "avgdl": total / n, "n_docs": n}


def bm25_scores(ds: Dataset, query_terms, k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id",
                stats: dict | None = None) -> Dataset:
    """Okapi BM25 score of every document against a fixed query-term
    set: ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` — the
    classic retrieval / quality-ranking primitive. Fit is one
    zero-shuffle counter reduction; scoring is a broadcast-free
    stateless pass (the model is a handful of floats captured in the
    task closure). Empty docs emit no rows; docs containing no query
    term score exactly 0.0. IEEE expression order matches the SQL
    twin term-for-term (see ``BM25_DOCS_SQL``)."""
    if stats is None:
        stats = fit_bm25_stats(ds, query_terms, text_col)
    terms = stats["terms"]
    idf = stats["idf"]
    avgdl = stats["avgdl"]
    k1p1 = k1 + 1.0
    omb = 1.0 - b

    def score(tbl: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(tbl[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        keep = n_real > 0
        ids = tbl[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.filter(pa.array(keep))
        dl = n_real[keep].astype(np.float64)
        if len(dl) == 0:
            return pa.table({id_col: ids,
                             "dl": pa.array([], type=pa.int64()),
                             "bm25": pa.array([], type=pa.float64())})
        # per-doc k1·(1−b+b·dl/avgdl), shared across terms
        denom_base = k1 * (omb + b * (dl / avgdl))
        nb = len(n_real)
        total = np.zeros(len(dl))
        if len(flat):
            de = flat.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False)
            doc_of = np.repeat(np.arange(nb), np.diff(offs))
            word_to_code = {w: i for i, w in
                            enumerate(de.dictionary.to_pylist())}
            for j, term in enumerate(terms):
                code = word_to_code.get(term)
                if code is None:
                    continue
                tf = np.bincount(doc_of[codes == code],
                                 minlength=nb)[keep].astype(np.float64)
                total += idf[j] * (tf * k1p1) / (tf + denom_base)
        return pa.table({id_col: ids,
                         "dl": pa.array(n_real[keep].astype(np.int64)),
                         "bm25": pa.array(total)})

    return ds.map_batches(score, batch_format="pyarrow")

# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (Laplace-smoothed) text classification
# ---------------------------------------------------------------------------

def fit_naive_bayes(ds: Dataset, label_col: str, text_col: str = "text",
                    alpha: float = 1.0,
                    top_k: int | None = None) -> dict:
    """Fit a Laplace-smoothed multinomial Naive Bayes model: per-(label,
    word) token counts + per-label doc counts ride ONE two-key groupby
    exchange (per-batch partials are dictionary-encode + bincount, the
    doc-count marker smuggled as the reserved empty-word row, exactly
    the ``fit_document_frequencies`` trick). The driver materializes
    the (labels × vocab) log-probability table — pass ``top_k`` at
    corpus scale to cap the vocabulary to the ``top_k``
    highest-total-count words (ties broken lexicographically; selected
    DISTRIBUTED via a word-total groupby + sort/limit, so the driver
    only ever sees ``top_k × labels`` rows — the same self-bounding
    contract as the surprisal/TF-IDF/PPMI fits). Words outside the cap
    fall into the model's OOV mass; ``V`` in the smoothing denominator
    is the CAPPED vocabulary size.

    Returns ``{"labels", "word_index", "logp" (V × L), "oov" (L),
    "prior" (L), "alpha"}`` with ``logp[w, l] = ln((cnt + α) /
    (total_l + α·V))`` and ``prior[l] = ln(docs_l / N)``."""
    from ray.data.aggregate import Sum

    if top_k is not None and top_k < 1:
        raise ValueError("fit_naive_bayes: top_k must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        lab = t[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab = lab.cast(pa.string())
        has = n_real > 0
        out_lab, out_word, out_cnt = [], [], []
        if len(flat):
            word_of = flat.dictionary_encode()
            wcodes = word_of.indices.to_numpy(zero_copy_only=False)
            lab_rep = lab.take(pa.array(np.repeat(
                np.arange(len(n_real)), np.diff(offs))))
            lde = lab_rep.dictionary_encode()
            lcodes = lde.indices.to_numpy(zero_copy_only=False)
            nw = len(word_of.dictionary)
            packed = lcodes.astype(np.int64) * nw + wcodes
            uniq, cnt = np.unique(packed, return_counts=True)
            out_lab.append(lde.dictionary.take(
                pa.array(uniq // nw)).cast(pa.string()))
            out_word.append(word_of.dictionary.take(
                pa.array(uniq % nw)).cast(pa.string()))
            out_cnt.append(pa.array(cnt.astype(np.int64)))
        # reserved empty-word marker: per-label doc counts
        if has.any():
            mlab = lab.filter(pa.array(has))
            mde = mlab.dictionary_encode()
            mc = np.bincount(mde.indices.to_numpy(zero_copy_only=False),
                             minlength=len(mde.dictionary))
            out_lab.append(mde.dictionary.cast(pa.string()))
            out_word.append(pa.array([""] * len(mde.dictionary)))
            out_cnt.append(pa.array(mc.astype(np.int64)))
        if not out_lab:
            return pa.table({label_col: pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({
            label_col: pa.concat_arrays([a.combine_chunks()
                                         if isinstance(a, pa.ChunkedArray)
                                         else a for a in out_lab]),
            "word": pa.concat_arrays([a.combine_chunks()
                                      if isinstance(a, pa.ChunkedArray)
                                      else a for a in out_word]),
            "cnt": pa.concat_arrays([a.combine_chunks()
                                     if isinstance(a, pa.ChunkedArray)
                                     else a for a in out_cnt])})

    counts_ds = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([label_col, "word"]) \
        .aggregate(Sum("cnt", alias_name="cnt"))
    if top_k is not None:
        from .partition import broadcast_get
        counts_ds = counts_ds.materialize()   # consumed twice below

        def word_partial(t: pa.Table) -> pa.Table:
            # groupby emits zero-row blocks MISSING key columns — guard
            if len(t) == 0 or "word" not in t.column_names:
                return pa.table({"word": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            t = t.filter(pc.not_equal(t["word"], ""))
            return t.select(["word", "cnt"])

        top = counts_ds \
            .map_batches(word_partial, batch_format="pyarrow") \
            .groupby("word").aggregate(Sum("cnt", alias_name="cnt")) \
            .sort(["cnt", "word"], descending=[True, False]) \
            .limit(top_k).to_pandas()
        keep_ref = ray.put(pa.array(
            sorted(set(top["word"]) | {""})))   # "" = doc-count marker

        def filt(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "word" not in t.column_names:
                return pa.table({label_col: pa.array([], pa.string()),
                                 "word": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            return t.filter(pc.is_in(t["word"],
                                     value_set=broadcast_get(keep_ref)))

        counts_ds = counts_ds.map_batches(filt, batch_format="pyarrow")
    counts = counts_ds.to_pandas()
    markers = counts[counts["word"] == ""]
    counts = counts[counts["word"] != ""]
    labels = sorted(markers[label_col])
    lidx = {l: i for i, l in enumerate(labels)}
    docs_l = np.zeros(len(labels))
    for _, r in markers.iterrows():
        docs_l[lidx[r[label_col]]] = float(r["cnt"])
    n_docs = float(docs_l.sum())
    vocab = sorted(counts["word"].unique())
    widx = {w: i for i, w in enumerate(vocab)}
    V = float(len(vocab))
    cnt_wl = np.zeros((len(vocab), len(labels)))
    cnt_wl[[widx[w] for w in counts["word"]],
           [lidx[l] for l in counts[label_col]]] = \
        counts["cnt"].to_numpy(dtype=np.float64)
    total_l = cnt_wl.sum(axis=0)
    logp = np.log((cnt_wl + alpha) / (total_l + alpha * V))
    oov = np.log(alpha / (total_l + alpha * V))
    prior = np.log(docs_l / n_docs)
    return {"labels": labels, "word_index": widx, "logp": logp,
            "oov": oov, "prior": prior, "alpha": alpha}


def naive_bayes_scores(ds: Dataset, model: dict,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       output: str = "long") -> Dataset:
    """Score every document against every label under a fitted NB
    model: one long-form row per (doc, label) with the Laplace
    log-posterior ``prior_l + Σ_w tf_w · ln P(w|l)`` (OOV words hit the
    smoothed floor). Broadcast model, vectorized per batch: tf per
    (doc, unique-word) via the sorted-runs trick, per-label scores are
    one ``bincount(doc, weights=tf·logp)`` each. Empty docs emit no
    rows.

    ``output="wide"`` keeps the INPUT batch (empty docs dropped) and
    appends one ``nb_{label}`` column per label — the shape downstream
    filters compose with (no join back; used by the quality-classifier
    sampler)."""
    if output not in ("long", "wide"):
        raise ValueError(f"unknown output {output!r}")
    ref = ray.put(model)
    from .partition import broadcast_get

    def score(tbl: pa.Table) -> pa.Table:
        m = broadcast_get(ref)
        labels, widx = m["labels"], m["word_index"]
        logp, oov, prior = m["logp"], m["oov"], m["prior"]
        flat, _fl, offsets, real, n_real = _split_flat(tbl[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        keep = n_real > 0
        ids = tbl[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        L = len(labels)
        if output == "wide":
            empty = tbl.slice(0, 0)
            for lbl in labels:
                empty = empty.append_column(
                    f"nb_{lbl}", pa.array([], type=pa.float64()))
        else:
            empty = pa.table({
                id_col: ids.slice(0, 0),
                "label": pa.array([], type=pa.string()),
                "nb_score": pa.array([], type=pa.float64())})
        if not keep.any() or len(flat) == 0:
            return empty
        nb = len(n_real)
        de = flat.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(nb), np.diff(offs))
        order = np.lexsort((codes, doc_of))
        c, d = codes[order], doc_of[order]
        new = np.r_[True, (c[1:] != c[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.r_[starts, len(c)]).astype(np.float64)
        uw = de.dictionary.to_pylist()
        rowidx = np.array([widx.get(w, -1) for w in uw], dtype=np.int64)
        pair_w = rowidx[c[starts]]          # vocab row (or -1 OOV)
        pair_d = d[starts]
        scores = np.empty((nb, L))
        for j in range(L):
            lp = np.where(pair_w >= 0,
                          logp[np.maximum(pair_w, 0), j], oov[j])
            scores[:, j] = prior[j] + np.bincount(
                pair_d, weights=tf * lp, minlength=nb)
        kidx = np.flatnonzero(keep)
        if output == "wide":
            out = tbl.take(pa.array(kidx.astype(np.int64)))
            for j, lbl in enumerate(labels):
                out = out.append_column(
                    f"nb_{lbl}", pa.array(scores[kidx, j]))
            return out
        out_ids = ids.take(pa.array(np.repeat(kidx, L)))
        return pa.table({
            id_col: out_ids,
            "label": pa.array(np.tile(np.array(labels, dtype=object),
                                      len(kidx)), type=pa.string()),
            "nb_score": pa.array(scores[kidx].ravel())})

    return ds.map_batches(score, batch_format="pyarrow")

# ---------------------------------------------------------------------------
# PPMI co-occurrence (skip-gram window) — distributional semantics
# ---------------------------------------------------------------------------

def ppmi_cooccurrence(ds: Dataset, window: int = 2,
                      text_col: str = "text") -> Dataset:
    """Positive pointwise mutual information over directed skip-gram
    co-occurrences: count ordered pairs ``(w_i, w_j)`` with ``1 ≤ j−i ≤
    window`` (positions over REAL words, empties dropped), then
    ``ppmi = max(0, ln(n(a,b)·N / (n_fwd(a)·n_bwd(b))))`` with forward/
    backward marginals and the total pair count — the count table
    word2vec-era embeddings factorize. Per-batch partials pack pair
    codes into one int64 ``np.unique`` per offset; ONE two-key groupby
    exchange aggregates; marginals + PPMI are computed over the
    already-aggregated (≤ vocab²-row) table (cap the vocabulary
    upstream at corpus scale, as the TF-IDF/bigram fits do). Returns
    (w1, w2, cooc, ppmi)."""
    from ray.data.aggregate import Sum
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        de = flat.dictionary_encode()
        c = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(n_real)), np.diff(offs))
        nw = len(de.dictionary)
        packs = []
        for d in range(1, window + 1):
            if len(c) <= d:
                break
            same = doc_of[d:] == doc_of[:-d]
            packs.append(c[:-d][same] * nw + c[d:][same])
        if not packs:
            return empty
        uniq, cnt = np.unique(np.concatenate(packs), return_counts=True)
        return pa.table({
            "w1": de.dictionary.take(pa.array(uniq // nw)).cast(
                pa.string()),
            "w2": de.dictionary.take(pa.array(uniq % nw)).cast(
                pa.string()),
            "cnt": pa.array(cnt.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("cnt", alias_name="cooc")) \
        .to_pandas()
    cooc = agg["cooc"].to_numpy(dtype=np.float64)
    N = float(cooc.sum())
    fwd = agg.groupby("w1")["cooc"].sum()
    bwd = agg.groupby("w2")["cooc"].sum()
    na = fwd[agg["w1"]].to_numpy(dtype=np.float64)
    nb = bwd[agg["w2"]].to_numpy(dtype=np.float64)
    ppmi = np.maximum(0.0, np.log((cooc * N) / (na * nb)))
    return rd.from_arrow(pa.table({
        "w1": pa.array(agg["w1"], type=pa.string()),
        "w2": pa.array(agg["w2"], type=pa.string()),
        "cooc": pa.array(agg["cooc"].to_numpy(dtype=np.int64)),
        "ppmi": pa.array(ppmi)}))

# ---------------------------------------------------------------------------
# Discriminative keywords per label (2×2 chi-square keyword extraction)
# ---------------------------------------------------------------------------

def discriminative_terms(ds: Dataset, label_col: str,
                         text_col: str = "text",
                         top_k: int = 5) -> Dataset:
    """Keyword extraction: the ``top_k`` most label-discriminative
    words per label by the 2×2 χ² statistic
    ``N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`` over token counts
    (a = tokens of w in l, b = w elsewhere, c/d = the complements) —
    every input is an exact int64 from ONE two-key groupby exchange
    (the Naive-Bayes partial machinery), so both engines derive
    identical χ² doubles and identical (χ² desc, word asc) rankings.
    The finishing pass runs over the aggregated labels×vocab table
    (cap the vocabulary upstream at corpus scale). Returns
    (label, word, n_lw, chi2, rnk)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        if len(flat) == 0:
            return pa.table({label_col: pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        lab = t[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab_rep = lab.cast(pa.string()).take(pa.array(np.repeat(
            np.arange(len(n_real)), np.diff(offs))))
        wde = flat.dictionary_encode()
        lde = lab_rep.dictionary_encode()
        nw = len(wde.dictionary)
        packed = lde.indices.to_numpy(zero_copy_only=False).astype(
            np.int64) * nw + wde.indices.to_numpy(zero_copy_only=False)
        u, c = np.unique(packed, return_counts=True)
        return pa.table({
            label_col: lde.dictionary.take(pa.array(u // nw)).cast(
                pa.string()),
            "word": wde.dictionary.take(pa.array(u % nw)).cast(
                pa.string()),
            "cnt": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([label_col, "word"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    labels = sorted(agg[label_col].unique())
    words = sorted(agg["word"].unique())
    lidx = {l: i for i, l in enumerate(labels)}
    widx = {w: i for i, w in enumerate(words)}
    m = np.zeros((len(words), len(labels)), dtype=np.int64)
    m[[widx[w] for w in agg["word"]],
      [lidx[l] for l in agg[label_col]]] = agg["cnt"].to_numpy()
    tot_l = m.sum(axis=0)
    tot_w = m.sum(axis=1)
    N = float(m.sum())
    out_rows = []
    for j, l in enumerate(labels):
        a = m[:, j].astype(np.float64)
        b = (tot_w - m[:, j]).astype(np.float64)
        c = float(tot_l[j]) - a
        d = (N - tot_l[j]) - b
        with np.errstate(invalid="ignore", divide="ignore"):
            chi2 = (N * (a * d - b * c) * (a * d - b * c)
                    / ((a + b) * (c + d) * (a + c) * (b + d)))
        chi2 = np.where(np.isfinite(chi2), chi2, 0.0)
        order = np.lexsort((np.array(words, dtype=object), -chi2))
        for r, wi in enumerate(order[:top_k]):
            out_rows.append((l, words[wi], int(m[wi, j]),
                             float(chi2[wi]), r + 1))
    return rd.from_arrow(pa.table({
        label_col: pa.array([o[0] for o in out_rows]),
        "word": pa.array([o[1] for o in out_rows]),
        "n_lw": pa.array([o[2] for o in out_rows], type=pa.int64()),
        "chi2": pa.array([o[3] for o in out_rows]),
        "rnk": pa.array([o[4] for o in out_rows], type=pa.int64())}))


def group_kl_divergence(ds: Dataset, group_col: str = "source",
                        text_col: str = "text") -> Dataset:
    """Per-group KL divergence between the group's unigram word
    distribution and the whole-corpus distribution — the domain-
    distinctiveness score a mixture-design pass reads next to
    :func:`~feature_extraction_ray.stages.curation.mixture_weights`
    (a near-zero KL domain is redundant with the corpus; a high-KL
    domain carries unique vocabulary).

    ``KL(p_g ‖ q) = Σ_w (cnt/tg) · ln((cnt·N)/(tg·tw))`` over the
    group's observed words (p_g > 0 everywhere it is evaluated, and
    q ≥ p_g·tg/N > 0 since every group word is a corpus word — no
    smoothing needed, unlike PSI's two-sample form).

    Exactness contract: the exchange moves only exact int64 counts;
    every double derives from ONE fixed IEEE expression over
    (cnt, tg, tw, N) — products in float64, so no 2^63 overflow at
    any corpus size — and the per-group sum is rounded to 6 (irrational
    log terms are rounding-boundary-safe). Output: group, ``n_tokens``
    (tg), ``n_types`` (distinct words), ``kl`` (round-6).

    Scale shape: per-block dictionary-encode+bincount partials → ONE
    (group, word) groupby exchange → word totals via a second
    vocab-bounded groupby re-attached with ``attach_values`` → per-group
    sums through a final tiny groupby. Group totals (#groups rows)
    reduce on the driver and broadcast. Nothing driver-side scales
    with corpus size; vocabulary-bounded tables cap the exchanges."""
    from ray.data.aggregate import Count, Sum

    from .cc import attach_values

    def partial(t: pa.Table) -> pa.Table:
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
            offs = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=offs[1:])
        else:
            offs = offsets
        if len(flat) == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        grp = grp.cast(pa.string())
        word_of = flat.dictionary_encode()
        wcodes = word_of.indices.to_numpy(zero_copy_only=False)
        grp_rep = grp.take(pa.array(np.repeat(
            np.arange(len(n_real)), np.diff(offs))))
        gde = grp_rep.dictionary_encode()
        gcodes = gde.indices.to_numpy(zero_copy_only=False)
        nw = len(word_of.dictionary)
        packed = gcodes.astype(np.int64) * nw + wcodes
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            group_col: gde.dictionary.take(
                pa.array(uniq // nw)).cast(pa.string()),
            "word": word_of.dictionary.take(
                pa.array(uniq % nw)).cast(pa.string()),
            "cnt": pa.array(cnt.astype(np.int64))})

    pairs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "word"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            group_col: pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
            "n_types": pa.array([], type=pa.int64()),
            "kl": pa.array([], type=pa.float64())}))
    tw = pairs.groupby("word").aggregate(Sum("cnt", alias_name="tw"))
    withw = attach_values(pairs, "word", tw, "word", ["tw"])
    # group totals: #groups rows — driver-reduced, broadcast into tasks
    tg_rows = pairs.groupby(group_col) \
        .aggregate(Sum("cnt", alias_name="tg")).take_all()
    tg_map = {r[group_col]: int(r["tg"]) for r in tg_rows}
    n_total = float(sum(tg_map.values()))
    tg_ref = ray.put(tg_map)

    def term(t: pa.Table) -> pa.Table:
        m = ray.get(tg_ref)
        g = t[group_col].to_pylist()
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        twv = t["tw"].to_numpy(zero_copy_only=False).astype(np.float64)
        tg = np.asarray([m[x] for x in g], dtype=np.float64)
        val = (cnt / tg) * np.log((cnt * n_total) / (tg * twv))
        return pa.table({group_col: t[group_col],
                         "cnt": t["cnt"],
                         "term": pa.array(val)})

    out = withw.map_batches(term, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Sum("cnt", alias_name="n_tokens"),
            Count(alias_name="n_types"),
            Sum("term", alias_name="kl"))
    return out


def readability_scores(ds: Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> Dataset:
    """Flesch reading-ease + Flesch–Kincaid grade per document — the
    classic readability quality signal (Kincaid et al. 1975, public
    formulas) over exact integer witnesses: ``n_words`` (whitespace
    tokens, ``str.split()`` semantics), ``n_sents`` (maximal ``[.!?]+``
    runs, floored at 1), ``n_syllables`` (the same public vowel-group
    heuristic as :func:`..features.syllable_count`, vectorized: count
    ``[aeiouy]+`` runs over the lowercased ``[a-z]``-only word, minus a
    final ``e``, plus a consonant-``le`` ending, floor 1; non-alpha
    tokens count 0).

    ``fre = (206.835 - 1.015·(w/s)) - 84.6·(syl/w)`` and
    ``fk = (0.39·(w/s) + 11.8·(syl/w)) - 15.59`` are FIXED left-
    associated IEEE expressions over the exact ints — a SQL twin
    spelling the identical expression (constants embedded bit-exactly)
    compares STRICTLY. Docs with zero words yield null scores.

    Zero shuffles: one vectorized Arrow pass per batch (split, three
    RE2 kernels, one ``np.add.reduceat`` segment sum) — no per-row
    Python. ASCII rule by design: letters outside ``[a-z]`` after
    lowercasing are stripped before syllable counting."""
    C1, C2, C3 = 206.835, 1.015, 84.6
    C4, C5, C6 = 0.39, 11.8, 15.59

    def score(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(txt)
        n_words = ws_token_count(trimmed).to_numpy(zero_copy_only=False)
        n_sents = np.maximum(
            pc.count_substring_regex(txt, r"[.!?]+").to_numpy(
                zero_copy_only=False).astype(np.int64), 1)
        lst = pc.utf8_split_whitespace(trimmed)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        words = pc.list_flatten(lst)
        lens = pc.list_value_length(lst).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(lens)
        w = pc.replace_substring_regex(
            pc.utf8_lower(words), "[^a-z]", "")
        runs = pc.count_substring_regex(w, "[aeiouy]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ends_e = pc.ends_with(w, "e").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cle = pc.match_substring_regex(w, "[^aeiouy]le$").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonempty = (pc.utf8_length(w).to_numpy(
            zero_copy_only=False) > 0).astype(np.int64)
        syl = np.maximum(runs - ends_e + cle, 1) * nonempty
        # segment-sum per doc (empty docs: their [""] slot sums to 0)
        padded = np.zeros(len(syl) + 1, dtype=np.int64)
        padded[1:] = np.cumsum(syl)
        n_syl = padded[offs[1:]] - padded[offs[:-1]]
        wf = n_words.astype(np.float64)
        sf = n_sents.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            wps = wf / sf
            spw = n_syl.astype(np.float64) / wf
            fre = (C1 - C2 * wps) - C3 * spw
            fk = (C4 * wps + C5 * spw) - C6
        mask = n_words == 0
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words.astype(np.int64)),
            "n_sents": pa.array(n_sents),
            "n_syllables": pa.array(n_syl.astype(np.int64)),
            "fre": pa.array(fre, mask=mask),
            "fk_grade": pa.array(fk, mask=mask)})

    return ds.map_batches(score, batch_format="pyarrow")


def compression_ratio(ds: Dataset, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6,
                      keep_cols: Sequence[str] = ()) -> Dataset:
    """zlib compression-ratio quality signal — the classic redundancy
    heuristic of web-scale curation (a Gopher/C4-family complement to
    the repetition stats): highly repetitive or templated text
    compresses far below natural prose, near-random strings barely
    compress. Emits, per document,

    * ``raw_bytes`` — UTF-8 byte length (exact int),
    * ``comp_bytes`` — ``zlib.compress(text, level)`` byte length at
      the FIXED level (deterministic for a given zlib build; pinned by
      goldens, not SQL-expressible — rows-only correctness class),
    * ``ratio`` — ONE float64 division ``comp_bytes / raw_bytes``
      (null for empty docs).

    Zero shuffles, one streaming pass. The per-doc ``zlib.compress``
    call runs C-side; the Python loop only dispatches (same contract
    as the BPE encode path). Scale: CPU-bound and embarrassingly
    parallel."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        raw = pc.binary_length(pc.cast(col, pa.large_binary())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.fromiter(
            (len(zlib.compress(s.as_py().encode("utf-8"), level))
             if s.is_valid else 0 for s in col),
            dtype=np.int64, count=len(col))
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        nonzero = valid & (raw > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(nonzero, comp / np.maximum(raw, 1),
                             np.nan)
        cols = {id_col: t[id_col]}
        for c in keep_cols:
            cols[c] = t[c]
        cols["raw_bytes"] = pa.array(raw, mask=~valid)
        cols["comp_bytes"] = pa.array(comp, mask=~valid)
        cols["ratio"] = pa.array(ratio, mask=~nonzero)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def zipf_alpha_by_group(ds: Dataset, group_col: str,
                        text_col: str = "text",
                        num_buckets: int = 32) -> Dataset:
    """Power-law (Zipf) exponent MLE per group over the word-frequency
    distribution — the Clauset-et-al continuous MLE at x_min = 1:

        α = 1 + W / Σ_w ln(count_w)

    (W = distinct word types; heavier tails → smaller Σln → larger α
    deviation; Σln = 0, i.e. every word a hapax, yields null). The
    classic corpus-health diagnostic next to Heaps' law.

    Scale shape: per-block (group, word, cnt) partials (packed
    ``np.unique``) ride ONE word-hash bucketed exchange; a word lives
    in exactly one bucket, so each bucket emits exact per-group
    partials (W_part int64, Σln_part float64) and a tiny
    ``groupby(group)`` finishes. Σln terms are irrational (or exact
    0) — round-6 both sides is boundary-safe."""
    from ray.data.aggregate import Sum

    from .window import bucketed_apply

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "word": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        g = t[group_col].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(n_real)), n_real)
        gw = g[doc_of]
        w = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((w, gw))
        gw, w = gw[order], w[order]
        new = np.r_[True, (gw[1:] != gw[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(w)]).astype(np.int64)
        return pa.table({group_col: pa.array(gw[starts]),
                         "word": pa.array(w[starts]),
                         "cnt": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def per_word_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "n_types": pa.array([], pa.int64()),
                          "s_ln": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        g = t[group_col].to_numpy(zero_copy_only=False)
        w = t["word"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w, g))
        g, w, c = g[order], w[order], c[order]
        new = np.r_[True, (g[1:] != g[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new)
        cc = np.add.reduceat(c, starts)
        gg = g[starts]
        gs = np.flatnonzero(np.r_[True, gg[1:] != gg[:-1]])
        n_types = np.diff(np.r_[gs, len(gg)]).astype(np.int64)
        s_ln = np.add.reduceat(np.log(cc.astype(np.float64)), gs)
        return pa.table({group_col: pa.array(gg[gs]),
                         "n_types": pa.array(n_types),
                         "s_ln": pa.array(s_ln)})

    agg = bucketed_apply(parts, "word", per_word_bucket, num_buckets,
                         drop_bucket=False) \
        .groupby(group_col).aggregate(
            Sum("n_types", alias_name="n_types"),
            Sum("s_ln", alias_name="s_ln"))

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or group_col not in t.column_names:
            return pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                             "n_types": pa.array([], pa.int64()),
                             "s_ln": pa.array([], pa.float64()),
                             "alpha": pa.array([], pa.float64())})
        nt = t["n_types"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t["s_ln"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = np.where(s > 0.0,
                             1.0 + nt.astype(np.float64) / s, np.nan)
        return pa.table({group_col: t[group_col],
                         "n_types": pa.array(nt),
                         "s_ln": pa.array(s),
                         "alpha": pa.array(alpha, mask=~(s > 0.0))})

    return agg.map_batches(finish, batch_format="pyarrow")


def simpson_diversity_by_group(ds: Dataset, group_col: str,
                               text_col: str = "text",
                               num_buckets: int = 32) -> Dataset:
    """Simpson diversity per group over word frequencies — the
    EXACT-RATIONAL member of the lexical-diversity family (Shannon
    entropy needs logs and rounding; Simpson doesn't):

        D = Σ_w n_w(n_w − 1) / (N(N − 1))     (repeat probability)
        gini_simpson = 1 − D                   (diversity)

    Integer witnesses ``n_types, n_tokens, num = Σ n_w(n_w−1)`` ride
    the same word-bucketed exchange as :func:`zipf_alpha_by_group`;
    ``d``/``gini_simpson`` are single fixed expressions over exact
    ints — the SQL twin compares STRICTLY (groups with N < 2 null).
    Bound ``Σ n_w² < 2^62`` implied by N < 2^31 (checked)."""
    from ray.data.aggregate import Sum

    from .window import bucketed_apply

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "word": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        flat, _fl, offsets, real, n_real = _split_flat(t[text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        g = t[group_col].to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(n_real)), n_real)
        gw = g[doc_of]
        w = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((w, gw))
        gw, w = gw[order], w[order]
        new = np.r_[True, (gw[1:] != gw[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(w)]).astype(np.int64)
        return pa.table({group_col: pa.array(gw[starts]),
                         "word": pa.array(w[starts]),
                         "cnt": pa.array(cnt)})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def per_word_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                          "n_types": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "num": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        g = t[group_col].to_numpy(zero_copy_only=False)
        w = t["word"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((w, g))
        g, w, c = g[order], w[order], c[order]
        new = np.r_[True, (g[1:] != g[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new)
        cc = np.add.reduceat(c, starts)
        if len(cc) and cc.max() >= (1 << 31):
            raise ValueError("simpson_diversity_by_group: a word "
                             "count exceeds 2^31 — n_w^2 would "
                             "overflow int64")
        gg = g[starts]
        gs = np.flatnonzero(np.r_[True, gg[1:] != gg[:-1]])
        n_types = np.diff(np.r_[gs, len(gg)]).astype(np.int64)
        n_tok = np.add.reduceat(cc, gs)
        num = np.add.reduceat(cc * (cc - 1), gs)
        return pa.table({group_col: pa.array(gg[gs]),
                         "n_types": pa.array(n_types),
                         "n_tokens": pa.array(n_tok),
                         "num": pa.array(num)})

    agg = bucketed_apply(parts, "word", per_word_bucket, num_buckets,
                         drop_bucket=False) \
        .groupby(group_col).aggregate(
            Sum("n_types", alias_name="n_types"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("num", alias_name="num"))

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or group_col not in t.column_names:
            return pa.table({group_col: pa.array([], group_field_type(t, group_col)),
                             "n_types": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "num": pa.array([], pa.int64()),
                             "d": pa.array([], pa.float64()),
                             "gini_simpson": pa.array([],
                                                      pa.float64())})
        nt = t["n_types"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        num = t["num"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(n) and n.max() >= (1 << 31):
            raise ValueError("simpson_diversity_by_group: n_tokens "
                             ">= 2^31 — N(N-1) would overflow int64")
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.where(n > 1, num / np.maximum(
                n * (n - 1), 1).astype(np.float64), np.nan)
        return pa.table({group_col: t[group_col],
                         "n_types": pa.array(nt),
                         "n_tokens": pa.array(n),
                         "num": pa.array(num),
                         "d": pa.array(d, mask=~(n > 1)),
                         "gini_simpson": pa.array(
                             np.where(n > 1, 1.0 - d, np.nan),
                             mask=~(n > 1))})

    return agg.map_batches(finish, batch_format="pyarrow")
