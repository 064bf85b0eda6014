"""Trained byte-pair-encoding tokenizer: distributed fit, broadcast encode.

The engine's quality-scoring path counts tokens with a BPE-ish regex
(``stages/text.py``); this module trains a REAL subword vocabulary the
way production tokenizers do (Sennrich et al. 2016, the GPT-2 recipe):

* **Fit** — BPE merges are learned from a WORD-FREQUENCY table, not the
  raw corpus. The word counting is fully distributed (per-block partial
  counts via Arrow dictionary-encode + a small groupby-sum over the
  unique words); only the top-``max_words`` (freq, word) rows — a
  vocab-bounded table, same driver-budget argument as the topic model's
  K×V matrix — come back to the driver, where the classic merge loop
  runs over UNIQUE words (cost ∝ vocabulary, not corpus).
* **Encode** — the learned merge ranks are ``ray.put`` once; every map
  task applies them with a per-worker memoized word→pieces cache
  (Zipf's law makes the cache hit rate ≈ 1, so the per-batch cost is a
  dictionary-encode + unique-word encode, not per-token Python).

Deterministic: ties in pair frequency break lexicographically, so the
merge list is stable across runs and cluster shapes.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from .partition import broadcast_get

_END = "</w>"  # end-of-word sentinel (Sennrich-style)


# ------------------------------------------------------------------ fit --

def word_frequencies(ds: Dataset, text_col: str,
                     lowercase: bool = True) -> Dataset:
    """Distributed word-frequency table: per-block partial counts over
    the block's unique words (dictionary-encode + value_counts), then
    one groupby-sum whose key space is the vocabulary, not the corpus."""
    def partial(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if lowercase:
            txt = pc.utf8_lower(txt)
        words = pc.list_flatten(pc.utf8_split_whitespace(txt))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("word").aggregate(Sum("n", alias_name="n"))


def _merge_loop(word_freqs: list[tuple[str, int]],
                num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE over a word-frequency dict. Pair stats are maintained
    incrementally (only words containing the merged pair are rewritten),
    ties break lexicographically for determinism."""
    # each word -> tuple of current symbols
    symed = {w: tuple(w) + (_END,) for w, _ in word_freqs}
    freqs = dict(word_freqs)
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set] = {}
    for w, syms in symed.items():
        f = freqs[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words.setdefault((a, b), set()).add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            syms = symed[w]
            f = freqs[w]
            # remove old pair contributions of this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(w)
                    if not s:
                        del pair_words[(a, b)]
            # rewrite the word with the merge applied
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
            symed[w] = syms
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
                pair_words.setdefault((a, b), set()).add(w)
    return merges


def fit_bpe(ds: Dataset, text_col: str, num_merges: int = 1000,
            max_words: int = 200_000,
            lowercase: bool = True) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a Dataset of text.

    The corpus never leaves the cluster: only the top-``max_words``
    (word, freq) rows reach the driver (most-frequent first, word-
    lexicographic tiebreak — deterministic). Truncation to ``max_words``
    is the standard tokenizer-training bound; words beyond it are rare
    by construction and contribute negligible pair mass."""
    wf = word_frequencies(ds, text_col, lowercase=lowercase)
    top = wf.sort(["n", "word"], descending=[True, False]) \
        .limit(max_words).to_pandas()
    pairs = list(zip(top["word"].tolist(),
                     top["n"].astype(int).tolist()))
    return _merge_loop(pairs, num_merges)


# --------------------------------------------------------------- encode --

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank-first (GPT-2 style)."""
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class _BpeKernel:
    """Per-worker state: merge ranks + a memoized word→pieces cache
    (Zipf makes the hit rate ≈ 1 on natural text)."""

    def __init__(self, ranks_ref):
        self.ranks = broadcast_get(ranks_ref)
        self.cache: dict[str, list[str]] = {}

    def pieces(self, word: str) -> list[str]:
        out = self.cache.get(word)
        if out is None:
            out = encode_word(word, self.ranks)
            self.cache[word] = out
        return out


def apply_bpe(ds: Dataset, text_col: str,
              merges: Sequence[tuple[str, str]],
              lowercase: bool = True, out_col: str = "bpe_tokens",
              count_col: str | None = "n_bpe") -> Dataset:
    """Encode ``text_col`` with a learned merge list. Appends
    ``out_col`` (``list<string>`` pieces) and ``count_col`` (int64
    piece count). Per batch: dictionary-encode the words so each UNIQUE
    word is encoded once, then fan the piece lists back out by index."""
    ranks_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    def fn(batch: pa.Table) -> pa.Table:
        from .partition import cached_kernel
        kern: _BpeKernel = cached_kernel(_BpeKernel, ranks_ref)
        txt = batch[text_col]
        if lowercase:
            txt = pc.utf8_lower(txt)
        words_list = pc.utf8_split_whitespace(txt)
        if isinstance(words_list, pa.ChunkedArray):
            words_list = words_list.combine_chunks()
        flat = words_list.flatten()
        row_lens = pc.list_value_length(words_list) \
            .fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        enc = [kern.pieces(w) if w else [] for w in uniq]
        enc_lens = np.array([len(e) for e in enc], dtype=np.int64)
        # unique-word piece lists → fan out per occurrence with take()
        enc_offsets = np.concatenate([[0], np.cumsum(enc_lens)])
        enc_values = pa.array([p for e in enc for p in e],
                              type=pa.string())
        uniq_pieces = pa.ListArray.from_arrays(
            pa.array(enc_offsets, type=pa.int32()), enc_values)
        word_pieces = uniq_pieces.take(pa.array(codes))
        values = word_pieces.flatten()
        word_pieces_lens = enc_lens[codes] if len(codes) else \
            np.zeros(0, np.int64)
        # offsets: pieces per row = sum of pieces of its words
        row_ends = np.cumsum(row_lens)
        piece_cum = np.concatenate([[0], np.cumsum(word_pieces_lens)])
        row_offsets = piece_cum[np.concatenate([[0], row_ends])]
        lst = pa.ListArray.from_arrays(
            pa.array(row_offsets, type=pa.int32()), values)
        batch = batch.append_column(out_col, lst)
        if count_col:
            n = np.diff(row_offsets).astype(np.int64)
            batch = batch.append_column(count_col, pa.array(n))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
