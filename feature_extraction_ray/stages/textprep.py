"""Text preprocessing operators (M1–M9, M14/A5) over word-segment columns.

Reference parity (cites; fresh implementations):

* M1 punctuation strip: regex ``[^\\w\\d'\\s]+`` → ''
  (``text_features/text_util.py:104-109``).
* M2 sentence split: the reference uses NLTK punkt (``text_util.py:14-16,
  96-101``) — not in this container; a regex splitter on sentence-final
  punctuation stands in (same shape: string → list of sentence strings).
* M5/M6 lemmatize / POS-tag: WordNet + nltk taggers are stubbed with a
  deterministic rule-based lemmatizer and a hash-seeded Penn-tag fake
  (real actor-pool plumbing, swap the model in ``__init__`` when the
  dependency exists — see class docstrings).
* M7 empty-token scrub (``extract_pos.py:92-93``), M8 stopword removal
  (``archived/preprocess_text.py:7-17``), M9 non-verbal token removal
  (``preprocess_text.py:20-32``: drop ``[noise] [laughter] <unk>``, drop
  emptied segments).
* M14/A5 bigram/trigram phrase rewrite: gensim-Phrases semantics
  (``text_util.py:50-93``) rebuilt as an explicit TWO-PASS pipeline —
  pass 1: distributed partial counts of unigrams+bigrams → driver builds
  the phrase table with gensim's original scorer
  ``(c_ab − min_count)/(c_a·c_b)·V ≥ threshold``; pass 2: broadcast table,
  vectorized rewrite joining matched pairs with ``_``.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

PUNCT_RE = re.compile(r"[^\w\d'\s]+")
SENT_RE = re.compile(r"(?<=[.!?])\s+")
NON_VERBAL = frozenset(["[noise]", "[laughter]", "<unk>"])

# common English abbreviations a period does NOT end a sentence after
# (rule-based punkt stand-in; the abbreviation list is public knowledge)
_ABBREVS = frozenset([
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc", "al",
    "e.g", "i.e", "fig", "no", "vol", "inc", "ltd", "co", "corp",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
    "oct", "nov", "dec", "mon", "tue", "wed", "thu", "fri", "sat", "sun",
    "u.s", "u.k", "a.m", "p.m",
])


def strip_punctuation(text: str) -> str:
    """M1: the reference's exact pattern."""
    return PUNCT_RE.sub("", text)


def split_sentences(text: str) -> list[str]:
    """M2 (punkt stand-in): split on sentence-final punctuation + space,
    except after known abbreviations, single-letter initials ("J. Smith")
    and decimal numbers — the rule-based subset of what the reference's
    trained punkt model does (``text_util.py:14-16,96-101``)."""
    parts = SENT_RE.split(text.strip())
    out: list[str] = []
    for p in parts:
        if not p:
            continue
        if out:
            prev = out[-1]
            last = prev.rsplit(None, 1)[-1] if prev.split() else prev
            if last.endswith("."):
                stem = last[:-1].lower()
                if (stem in _ABBREVS or len(stem) == 1 and stem.isalpha()
                        or stem.replace(".", "").isdigit()):
                    out[-1] = prev + " " + p
                    continue
        out.append(p)
    return out


_SUFFIX_RULES = [("sses", "ss"), ("ies", "y"), ("ing", ""), ("ed", ""),
                 ("s", "")]


def lemmatize_word(w: str) -> str:
    """M5 stub: deterministic suffix-rule lemmatizer (WordNet stand-in).
    Keeps words ≤3 chars untouched; never empties a word."""
    lw = w.lower()
    if len(lw) <= 3:
        return lw
    for suf, rep in _SUFFIX_RULES:
        if lw.endswith(suf) and len(lw) - len(suf) + len(rep) >= 2:
            return lw[:-len(suf)] + rep
    return lw


_PENN_TAGS = ["NN", "VB", "JJ", "RB", "DT", "IN", "CC", "PRP", "PRP$",
              "UH", "WDT", "WRB", "WP", "TO"]


def fake_pos_tag(word: str) -> str:
    """M6 stub: deterministic hash-seeded Penn tag (nltk.pos_tag stand-in).
    A few closed-class words get their true tags so ratio features are
    non-degenerate; everything else hashes into the open-class tags."""
    closed = {"the": "DT", "a": "DT", "an": "DT", "and": "CC", "or": "CC",
              "but": "CC", "in": "IN", "on": "IN", "of": "IN", "to": "TO",
              "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP",
              "it": "PRP", "my": "PRP$", "your": "PRP$", "which": "WDT",
              "where": "WRB", "who": "WP", "oh": "UH", "uh": "UH"}
    lw = word.lower()
    if lw in closed:
        return closed[lw]
    from .text import hash_word
    return ["NN", "VB", "JJ", "RB"][hash_word(lw) % 4]


def scrub_empty(words: Sequence[str]) -> list[str]:
    """M7: drop '' tokens (post-split artifact, ``extract_pos.py:92-93``)."""
    return [w for w in words if w != ""]


def remove_stopwords(words: Sequence[str], stopset: frozenset) -> list[str]:
    return [w for w in words if w not in stopset]


def remove_nonverbal_segments(segments: list[list[str]]) -> list[list[str]]:
    """M9: strip non-verbal tokens; drop segments emptied by it."""
    out = []
    for seg in segments:
        kept = [w for w in seg if w not in NON_VERBAL]
        if kept:
            out.append(kept)
    return out


# ---------------------------------------------------------------------------
# M14 / A5 — two-pass phrase (collocation) model
# ---------------------------------------------------------------------------

def _pair_counts_batch(tbl: pa.Table, text_col: str) -> pa.Table:
    """Partial unigram + bigram counts for one batch (one output row per
    distinct gram; shuffled pre-aggregated). Vectorized: Arrow split →
    flat word stream → adjacent-pair join with doc-boundary mask →
    C++ group_by count."""
    import numpy as np
    import pyarrow.compute as pc
    words = pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(tbl[text_col]))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table({"gram": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    real = pc.greater(pc.utf8_length(flat), 0)
    doc_of = np.repeat(np.arange(len(tbl), dtype=np.int64), n)
    # bigrams: adjacent flat words within the same doc
    if len(flat) > 1:
        same_doc = doc_of[:-1] == doc_of[1:]
        both_real = pc.and_(real.slice(0, len(flat) - 1),
                            real.slice(1)).to_numpy(zero_copy_only=False)
        keep = pa.array(same_doc & both_real)
        bi = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1).filter(keep),
            flat.slice(1).filter(keep), "\x00")
    else:
        bi = pa.array([], type=pa.string())
    grams = pa.concat_arrays([flat.filter(real).cast(pa.string()),
                              bi.cast(pa.string()) if len(bi)
                              else pa.array([], type=pa.string())])
    out = pa.table({"gram": grams}).group_by("gram").aggregate(
        [([], "count_all")])
    return out.rename_columns(["gram", "cnt"])


def fit_phrases(ds: Dataset, text_col: str = "text",
                min_count: int = 5, threshold: float = 10.0) -> dict:
    """Pass 1: distributed gram counting (partial-agg → one groupby), then
    the gensim original scorer on the driver over bigrams only.

    Returns the phrase table ``{(a, b): score}`` for broadcast."""
    pairs = ds.map_batches(
        lambda t: _pair_counts_batch(t, text_col), batch_format="pyarrow")
    counts = pairs.groupby("gram").aggregate(Sum("cnt", alias_name="cnt"))
    pdf = counts.to_pandas()
    is_bi = pdf["gram"].str.contains("\x00")
    uni = dict(zip(pdf.loc[~is_bi, "gram"], pdf.loc[~is_bi, "cnt"]))
    # gensim-parity detail: original_scorer's len_vocab is the size of
    # the model vocabulary, which counts BIGRAM entries as well as
    # unigrams (gensim Phrases.add_vocab stores both in one dict)
    vocab_size = len(pdf)
    table = {}
    for gram, c_ab in zip(pdf.loc[is_bi, "gram"], pdf.loc[is_bi, "cnt"]):
        a, b = gram.split("\x00")
        c_a, c_b = uni.get(a, 0), uni.get(b, 0)
        if c_ab < min_count or not c_a or not c_b:
            continue
        # gensim original_scorer (Mikolov et al. 2013 phrase score):
        # (c_ab - min_count) / c_a / c_b * len_vocab
        score = (c_ab - min_count) / (c_a * c_b) * vocab_size
        if score > threshold:
            table[(a, b)] = score
    return table


def apply_phrases(ds: Dataset, phrase_table: dict,
                  text_col: str = "text",
                  out_col: str | None = None) -> Dataset:
    """Pass 2: broadcast the table, rewrite each text greedily left-to-right
    joining scored pairs with ``_`` (gensim Phraser semantics)."""
    out_col = out_col or text_col
    # Vectorized over the batch's flattened word stream (round-3 verdict
    # item): gensim's sequential greedy pairing ``merge[i] = eligible[i]
    # and not merge[i-1]`` is exactly "merge at even offsets within each
    # maximal run of eligible pair positions", which one cumulative-max
    # pass computes. Parity with the former per-row loop is pinned in
    # tests/test_textprep_lexicon.py.
    words = sorted({w for pr in phrase_table for w in pr})
    vocab = pd.Index(np.array(words, dtype=object))
    V = np.int64(len(words) + 1)
    pair_keys = np.sort(np.array(
        [vocab.get_loc(a) * V + vocab.get_loc(b) for a, b in phrase_table],
        dtype=np.int64)) if phrase_table else np.zeros(0, np.int64)
    ref = ray.put((vocab, pair_keys))

    from .partition import broadcast_get

    def rewrite_batch(tbl: pa.Table) -> pa.Table:
        voc, pkeys = broadcast_get(ref)    # deserialized once per worker
        s = tbl[text_col]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        lst = pc.utf8_split_whitespace(s)
        la = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = la.offsets.to_numpy().astype(np.int64)
        vals = la.values
        toks = vals.to_numpy(zero_copy_only=False)
        rowid = np.repeat(np.arange(len(la), dtype=np.int64),
                          np.diff(offs))
        nonempty = toks != ""              # str.split() never yields ""
        toks, rowid = toks[nonempty], rowid[nonempty]
        n = len(toks)
        if n and len(pkeys):
            codes = voc.get_indexer(pd.Index(toks)).astype(np.int64)
            e = np.zeros(n, dtype=bool)
            e[:-1] = ((rowid[:-1] == rowid[1:]) & (codes[:-1] >= 0)
                      & (codes[1:] >= 0))
            cand = np.flatnonzero(e)
            if len(cand):
                e[cand] = np.isin(codes[cand] * V + codes[cand + 1], pkeys)
            idx = np.arange(n, dtype=np.int64)
            last_false = np.maximum.accumulate(np.where(~e, idx, -1))
            merge = e & (((idx - last_false) & 1) == 1)
            mi = np.flatnonzero(merge)
            out_toks = toks.copy()
            out_toks[mi] = out_toks[mi] + "_" + toks[mi + 1]
            keep = np.ones(n, dtype=bool)
            keep[mi + 1] = False
            toks, rowid = out_toks[keep], rowid[keep]
        counts = np.bincount(rowid, minlength=len(la))
        out_list = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(counts)], type=pa.int32()),
            pa.array(toks, type=pa.string()))
        joined = pc.binary_join(out_list, pa.scalar(" ", type=pa.string()))
        if s.null_count:
            joined = pc.if_else(pc.is_valid(s), joined,
                                pa.scalar(None, type=pa.string()))
        if out_col in tbl.column_names:
            return tbl.set_column(tbl.column_names.index(out_col),
                                  out_col, joined)
        return tbl.append_column(out_col, joined)

    return ds.map_batches(rewrite_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M4 / A3 — corpus-trained truecaser (two-pass fit-then-map)
# ---------------------------------------------------------------------------

def fit_truecase(ds: Dataset, text_col: str = "text",
                 min_count: int = 1, keep_identity: bool = False) -> dict:
    """A3: fit a Moses-style truecasing model from the corpus itself —
    the reference restores case with the ``truecase`` package
    (``text_features/text_util.py`` imports; model = most frequent surface
    form per word, trained on NON-sentence-initial positions so
    sentence-start capitalization doesn't pollute the statistics; that
    training trick is the standard published recipe).

    Distributed: one ``map_batches`` pass emits pre-aggregated
    (lower, surface, cnt) partials (sentence-initial words skipped), one
    ``groupby`` sums them, and the driver keeps only the argmax surface
    per word (ties broken lexicographically for determinism). Returns
    ``{lower: best_surface}`` restricted to words whose best form differs
    from lowercase — the broadcast model stays vocabulary-sized.
    """
    import numpy as np
    import pyarrow.compute as pc

    def partial(tbl: pa.Table) -> pa.Table:
        sents = pc.split_pattern_regex(tbl[text_col], pattern=r"[.!?]+")
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        flat_sent = pc.utf8_trim_whitespace(sents.flatten())
        words = pc.utf8_split_whitespace(flat_sent)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"lower": pa.array([], type=pa.string()),
                             "surface": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        # mask the first word of every sentence
        starts = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=starts[1:])
        keep = np.ones(len(flat), dtype=bool)
        keep[starts[:-1][n > 0]] = False
        kept = flat.filter(pa.array(keep))
        kept = kept.filter(pc.greater(pc.utf8_length(kept), 0))
        tb = pa.table({"lower": pc.utf8_lower(kept), "surface": kept})
        out = tb.group_by(["lower", "surface"]).aggregate(
            [([], "count_all")])
        return out.rename_columns(["lower", "surface", "cnt"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lower", "surface"]).aggregate(Sum("cnt",
                                                     alias_name="cnt"))
    pdf = counts.to_pandas()
    if len(pdf) == 0:
        return {}
    pdf = pdf[pdf["cnt"] >= min_count]
    pdf = pdf.sort_values(["lower", "cnt", "surface"],
                          ascending=[True, False, True], kind="stable")
    best = pdf.drop_duplicates("lower", keep="first")
    return {lo: s for lo, s in zip(best["lower"], best["surface"])
            if keep_identity or s != lo}


def apply_truecase(ds: Dataset, model: dict, text_col: str = "text",
                   out_col: str | None = None) -> Dataset:
    """M4: broadcast the truecase model once, rewrite every word to its
    most frequent surface form (whitespace-normalized output, single
    spaces — the reference applies this to normalized ASR transcripts).
    Vectorized: unique words mapped once per batch, gathered back, joined
    with ``pc.binary_join``."""
    import numpy as np
    import pyarrow.compute as pc
    out_col = out_col or text_col
    ref = ray.put(model)

    from .partition import broadcast_get

    def truecase_batch(batch: pa.Table) -> pa.Table:
        model_w = broadcast_get(ref)       # deserialized once per worker
        words = pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(batch[text_col]))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        if len(flat):
            de = flat.dictionary_encode()
            uniq = de.dictionary.to_pylist()
            mapped = pa.array(
                [model_w.get(w.lower(), w) for w in uniq],
                type=pa.string())
            codes = de.indices
            new_flat = mapped.take(codes)
        else:
            new_flat = pa.array([], type=pa.string())
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)), new_flat)
        joined = pc.binary_join(lst, " ")
        if out_col in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(out_col),
                pa.field(out_col, pa.string()), joined)
        else:
            batch = batch.append_column(out_col, joined)
        return batch

    return ds.map_batches(truecase_batch, batch_format="pyarrow")


def truecase_rewrite(ds: Dataset, text_col: str = "text",
                     out_col: str | None = None,
                     min_count: int = 1) -> Dataset:
    """Full M4/A3 flow: distributed casing fit → broadcast → rewrite."""
    model = fit_truecase(ds, text_col, min_count)
    return apply_truecase(ds, model, text_col, out_col)


def bigram_trigram_rewrite(ds: Dataset, text_col: str = "text",
                           min_count: int = 5,
                           threshold: float = 10.0) -> Dataset:
    """Full A5 flow: fit bigrams → apply → fit again on rewritten text
    (bigram_model[sentences] → trigram fit, ``text_util.py:63-64``) →
    apply. Two fit passes, two map passes, all distributed."""
    bi = fit_phrases(ds, text_col, min_count, threshold)
    ds2 = apply_phrases(ds, bi, text_col)
    tri = fit_phrases(ds2, text_col, min_count, threshold)
    return apply_phrases(ds2, tri, text_col)


def chunk_text(ds, size: int, stride: int, text_col: str = "text",
               id_col: str = "doc_id", out_col: str = "chunk_text"):
    """Sliding-window chunker with overlap — the RAG-ingestion
    primitive: split each document into word windows of ``size`` every
    ``stride`` words (``stride < size`` ⇒ overlapping chunks; the last
    window is the remainder, never empty, and a doc shorter than
    ``size`` yields exactly one chunk). Emits (id, chunk_idx (1-based),
    start_word (1-based), n_words, chunk). Fully vectorized: one
    whitespace split per batch, chunk membership is pure offset
    arithmetic (repeat + gather), the chunk strings come from ONE
    ``pc.binary_join`` over a rebuilt ListArray — no per-chunk Python.
    Zero shuffles."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ..stages.text import _split_flat
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")

    def fn(t: pa.Table) -> pa.Table:
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
        n = n_real.astype(np.int64)
        # chunks per doc: 1 + ceil(max(0, n - size) / stride); 0 if empty
        extra = np.maximum(0, n - size)
        n_chunks = np.where(n > 0, 1 + (extra + stride - 1) // stride, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: ids.slice(0, 0),
                "chunk_idx": pa.array([], type=pa.int64()),
                "start_word": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                out_col: pa.array([], type=pa.string())})
        doc_of_chunk = np.repeat(np.arange(len(n)), n_chunks)
        # chunk index within doc (0-based)
        cstarts = np.r_[0, np.cumsum(n_chunks)[:-1]]
        cidx = np.arange(total) - cstarts[doc_of_chunk]
        start = cidx * stride                       # word offset in doc
        end = np.minimum(start + size, n[doc_of_chunk])
        lens = end - start
        # gather flat word indices per chunk
        word_idx = np.repeat(offs[:-1][doc_of_chunk] + start,
                             lens) + _ranges(lens)
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(lens)].astype(np.int32)),
            flat.take(pa.array(word_idx)))
        joined = pc.binary_join(
            lists, pa.scalar(" ", type=flat.type))
        return pa.table({
            id_col: ids.take(pa.array(doc_of_chunk)),
            "chunk_idx": pa.array(cidx + 1),
            "start_word": pa.array(start + 1),
            "n_words": pa.array(lens),
            out_col: pc.cast(joined, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _ranges(lens: "np.ndarray"):
    """Concatenated [0..l) ranges: arange(total) − repeat(starts)."""
    import numpy as np
    total = int(lens.sum())
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    return np.arange(total) - np.repeat(starts, lens)


def canonicalize_text(ds: Dataset, text_col: str = "text",
                      form: str | None = "NFD", lower: bool = False,
                      collapse_ws: bool = True,
                      out_col: str | None = None) -> Dataset:
    """Unicode + whitespace canonicalization ahead of exact/near dedup —
    catches trivially-variant duplicates an exact hash misses
    (combining-character encodings of the same glyph, runs of
    whitespace, case): trim → Unicode-normalize (``form`` ∈ NFD/NFKD,
    None to skip) → collapse ``\\s+`` runs to one space → optional
    lowercase. Zero shuffles, pure Arrow kernels (utf8_normalize +
    RE2); ``out_col=None`` rewrites ``text_col`` in place.

    The canonical target is a DECOMPOSED form by design: equal NFD
    strings ⇔ canonically-equivalent text, which is all dedup needs —
    and pyarrow's ``utf8_normalize`` (≤16.x, measured) decomposes but
    never RE-composes, so requesting NFC/NFKC there silently yields
    NFD/NFKD; this function rejects the composed forms rather than
    mislabel its output."""
    if form is not None and form not in ("NFD", "NFKD"):
        raise ValueError(
            f"form must be 'NFD', 'NFKD' or None, got {form!r} — "
            "pyarrow's utf8_normalize cannot COMPOSE (NFC/NFKC output "
            "would silently stay decomposed)")

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        x = pc.utf8_trim_whitespace(col)
        if form is not None:
            x = pc.utf8_normalize(x, form=form)
        if collapse_ws:
            x = pc.replace_substring_regex(x, pattern=r"\s+",
                                           replacement=" ")
        if lower:
            x = pc.utf8_lower(x)
        if out_col is None:
            return t.set_column(t.schema.get_field_index(text_col),
                                text_col, pc.cast(x, col.type))
        return t.append_column(out_col, x)

    return ds.map_batches(fn, batch_format="pyarrow")
