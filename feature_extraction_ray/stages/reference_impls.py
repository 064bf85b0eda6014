"""REFERENCE (non-production) single-purpose text analyzers.

Readable A/B twins of the fused :class:`..text.TextAnalyzer` pass, kept
ONLY as test oracles: they use per-row ``.map(lambda)`` loops / pandas
batches, which is exactly the hot-path anti-pattern the fused
Arrow-native analyzer exists to avoid. No pipeline may import from this
module; production code uses ``analyze_text`` / ``TextAnalyzer`` /
``ws_token_count`` from ``stages.text``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .text import _STOPWORDS


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
