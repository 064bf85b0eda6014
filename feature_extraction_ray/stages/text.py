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

from ray.data import Dataset

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


class LangId:
    """Heuristic language ID: stopword-hit share per language profile,
    ``und`` (undetermined) when no profile scores above ``min_score``."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred",
                 min_score: float = 0.02):
        import re
        self.text_col = text_col
        self.out_col = out_col
        self.min_score = min_score
        self.word_re = re.compile(r"[a-zA-ZäöüßéèêàâçñáíóúÀ-ÿ']+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.lower().str.findall(self.word_re)

        def score(words):
            if not words:
                return "und"
            best, best_s = "und", self.min_score
            for lang, table in self.tables.items():
                s = sum(1 for w in words if w in table) / len(words)
                if s > best_s:
                    best, best_s = lang, s
            return best

        batch[self.out_col] = toks.map(score)
        return batch


class QualityScore:
    """Per-document quality signals: char/word counts, mean word length,
    stopword ratio, punctuation ratio, digit ratio, long-word fraction
    (the reference's ``lw_count``, ``extract_verbosity_stats.py:26-36``)."""

    def __init__(self, text_col: str = "text"):
        import re
        self.text_col = text_col
        self.punct_re = re.compile(r"[^\w\s]")
        self.digit_re = re.compile(r"\d")
        self.stop = frozenset(_STOPWORDS["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[self.text_col]
        words = txt.str.split()
        n_chars = txt.str.len().astype("int64")
        n_words = words.str.len().fillna(0).astype("int64")
        batch["q_n_chars"] = n_chars
        batch["q_n_words"] = n_words
        batch["q_mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else np.nan)
        batch["q_stopword_ratio"] = words.map(
            lambda ws: sum(w in self.stop for w in ws) / len(ws)
            if ws else np.nan)
        batch["q_punct_ratio"] = txt.str.count(self.punct_re) / \
            n_chars.clip(lower=1)
        batch["q_digit_ratio"] = txt.str.count(self.digit_re) / \
            n_chars.clip(lower=1)
        batch["q_long_word_frac"] = words.map(
            lambda ws: sum(len(w) > 6 for w in ws) / len(ws)
            if ws else np.nan)
        return batch


class TokenCount:
    """Whitespace and BPE-ish token counts (regex splits off punctuation,
    digits, and sub-word chunks of ≤4 chars — a cheap GPT-style proxy)."""

    def __init__(self, text_col: str = "text"):
        import re
        self.text_col = text_col
        self.bpe_re = re.compile(r"\d|[^\w\s]|\w{1,4}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[self.text_col]
        batch["n_tok_ws"] = txt.str.split().str.len().fillna(0).astype("int64")
        batch["n_tok_bpe"] = txt.str.count(self.bpe_re).astype("int64")
        return batch


FP_BASE = np.uint64(1099511628211)


def rolling_fingerprint(word_hashes: np.ndarray) -> np.uint64:
    """Order-sensitive polynomial rolling hash of a word-hash sequence."""
    h = np.uint64(14695981039346656037)
    with np.errstate(over="ignore"):
        for w in word_hashes:
            h = h * FP_BASE + np.uint64(w)
    return h


class Fingerprint:
    """64-bit order-sensitive document fingerprint (rolling hash over word
    hashes) — identical normalized content ⇒ identical fingerprint."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(texts):
                h = np.uint64(14695981039346656037)
                for w in t.split():
                    h = h * FP_BASE + np.uint64(hash_word(w))
                out[i] = h
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
    fingerprint in ONE actor pool. Chaining four separate pools starves
    small clusters (each pool reserves ≥1 CPU) and re-parses the text four
    times; state for all four analyses loads once here."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langid = LangId(text_col)
        self.quality = QualityScore(text_col)
        self.tokens = TokenCount(text_col)
        self.fp = Fingerprint(text_col)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = self.langid(batch)
        batch = self.quality(batch)
        batch = self.tokens(batch)
        texts = batch[self.text_col].tolist()
        out = np.empty(len(texts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(texts):
                h = np.uint64(14695981039346656037)
                for w in t.split():
                    h = h * FP_BASE + np.uint64(hash_word(w))
                out[i] = h
        batch["fingerprint"] = out.astype(np.int64)
        return batch


def analyze_text(ds: Dataset, text_col: str = "text",
                 concurrency=(1, 8), batch_size: int = 2048) -> Dataset:
    """Full text-analysis pass (one fused actor pool, one text parse)."""
    return ds.map_batches(TextAnalyzer,
                          fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)
