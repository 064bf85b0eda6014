"""Vectorized per-group token-stream statistics.

Reimplements the reference's lexical-diversity aggregates
(``text_features/extract_lexical_diversity.py:10-52`` MATTR sliding window,
``:55-69`` Honoré's statistic — cited for parity, code original) as O(n log n)
numpy over a *flattened* token stream with a group id per token, so one call
computes every group in a bucket at once:

* vocab size (distinct tokens) and hapax count (tokens occurring once) via
  one key-sort — replaces the reference's O(n²) ``words.count`` hot spot
  (``extract_lexical_diversity.py:63``).
* MATTR via a difference-array over "last-occurrence-within-window"
  contributions: token position ``j`` adds +1 to every window ending in
  ``[j, min(next_occ(j), j+w) - 1]``; a cumulative sum then yields the
  distinct-count of every sliding window in O(n). Matches the reference's
  incremental dict exactly, including the short-stream fallback
  (window := stream length, i.e. plain TTR).
"""

from __future__ import annotations

import numpy as np

HONORE_EPS = 1e-5  # reference smoothing constant, extract_lexical_diversity.py:68


def group_offsets(gid: np.ndarray) -> np.ndarray:
    """Start offsets of each contiguous group run + final sentinel.

    ``gid`` must be sorted (groups contiguous). Returns int64 array of
    length n_groups+1.
    """
    n = len(gid)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    return np.r_[starts, n].astype(np.int64)


def vocab_hapax(tokens: np.ndarray, gid: np.ndarray, n_groups: int,
                vocab_bits: int = 32):
    """Per-group (vocab_size, hapax_count) in one sort.

    ``gid`` sorted, values in [0, n_groups); ``tokens`` int. Key =
    ``gid << vocab_bits | token`` — one ``np.unique`` over the composite key
    gives per-(group, token) multiplicities.
    """
    if len(tokens) == 0:
        z = np.zeros(n_groups, dtype=np.int64)
        return z, z.copy()
    key = (gid.astype(np.int64) << vocab_bits) | tokens.astype(np.int64)
    uk, counts = np.unique(key, return_counts=True)
    ug = (uk >> vocab_bits).astype(np.int64)
    vocab = np.bincount(ug, minlength=n_groups)
    hapax = np.bincount(ug[counts == 1], minlength=n_groups)
    return vocab.astype(np.int64), hapax.astype(np.int64)


def honore(total: np.ndarray, vocab: np.ndarray,
           hapax: np.ndarray) -> np.ndarray:
    """Honoré's statistic per group: ``100·ln(N / (1 − V1/(V+ε)))``
    (reference formula incl. ε smoothing); NaN where N == 0."""
    total = total.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = 1.0 - hapax / (vocab + HONORE_EPS)
        out = 100.0 * np.log(total / denom)
    out[total == 0] = np.nan
    return out


def _next_occurrence(tokens: np.ndarray, gid: np.ndarray) -> np.ndarray:
    """next_occ[j] = smallest j' > j with same (gid, token), else n."""
    n = len(tokens)
    key = (gid.astype(np.int64) << 32) | tokens.astype(np.int64)
    order = np.argsort(key, kind="stable")  # stable → positions ascending
    nxt = np.full(n, n, dtype=np.int64)
    ok = key[order][1:] == key[order][:-1]
    nxt[order[:-1][ok]] = order[1:][ok]
    return nxt


def mattr_groups(tokens: np.ndarray, gid: np.ndarray, n_groups: int,
                 window: int) -> np.ndarray:
    """MATTR per group over the concatenated token stream, vectorized.

    Reference semantics (``compute_MATTR``): mean of distinct/window over
    all full sliding windows; streams shorter than ``window`` use the whole
    stream as the single window (plain TTR); empty stream → NaN.
    """
    n = len(tokens)
    out = np.full(n_groups, np.nan)
    if n == 0:
        return out
    offs = group_offsets(gid)
    gsizes = np.diff(offs)
    # per-position group start (for window clipping)
    gstart = np.repeat(offs[:-1], gsizes)
    nxt = _next_occurrence(tokens, gid)
    # contribution of position j: +1 to distinct[i] for
    # i ∈ [j, min(next_occ(j), j + w, group_end) - 1]
    gend = np.repeat(offs[1:], gsizes)
    hi = np.minimum(np.minimum(nxt, np.arange(n) + window), gend)
    diff = np.zeros(n + 1, dtype=np.int64)
    diff[:n] += 1
    np.add.at(diff, hi, -1)
    distinct = np.cumsum(diff[:-1])  # distinct count of window ending at i
    # windows are full where i - gstart + 1 >= window
    pos_in_group = np.arange(n) - gstart
    full = pos_in_group >= window - 1
    sums = np.bincount(gid[full], weights=distinct[full].astype(np.float64),
                       minlength=n_groups)
    cnts = np.bincount(gid[full], minlength=n_groups)
    has_full = cnts > 0
    with np.errstate(invalid="ignore"):
        out[has_full] = sums[has_full] / cnts[has_full] / window
    # short streams: plain TTR over the whole stream = distinct at last pos
    run_gids = gid[offs[:-1]]           # one contiguous run per group
    ttr_last = distinct[offs[1:] - 1] / gsizes
    short_runs = ~has_full[run_gids]
    out[run_gids[short_runs]] = ttr_last[short_runs]
    return out
