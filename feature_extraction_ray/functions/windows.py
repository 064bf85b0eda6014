"""Vectorized windowed kernels over entity-sorted arrays.

All kernels take arrays already sorted by ``(entity, order...)`` and a
``new_group`` boolean mask (True at the first row of each entity run) and
are O(n) numpy — no Python loop over rows. They are the compute core of the
engine's windowed operators (lag/lead, ffill/bfill, sessionize, sliding
aggregates); reference semantics they reproduce:

* lag/lead: consecutive-word pairing — silences
  ``microsoft_asr_features/extract_timing_features.py:142-163``, graph edges
  ``text_features/extract_graph.py:36-37``, LIWC n-grams
  ``text_features/extract_liwc_2007.py:33-37`` (reference repo, cited for
  parity only — implementation here is original).
* sessionize: gap detection between word end/start times
  (``extract_timing_features.py:142-163`` analog).
* ffill/bfill: call-level value propagated onto group rows
  (``kaldi_asr_features/extract_timing_feats.py:95-114`` analog).
* sliding window: MATTR moving type-token ratio
  (``text_features/extract_lexical_diversity.py:10-52`` analog).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "group_starts",
    "lag",
    "lead",
    "lag_indices",
    "lead_indices",
    "ffill",
    "bfill",
    "ffill_indices",
    "bfill_indices",
    "sessionize",
    "sliding_sum_count",
    "sliding_mean",
    "sliding_min_max",
    "time_range_sum_count",
    "mattr",
]


def group_starts(entity_codes: np.ndarray) -> np.ndarray:
    """Boolean mask: True at the first row of each entity run.

    ``entity_codes`` must be sorted so that equal entities are contiguous;
    any dtype supporting ``!=`` works (ints from factorize, or numpy object
    strings).
    """
    n = len(entity_codes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    out = np.empty(n, dtype=bool)
    out[0] = True
    out[1:] = entity_codes[1:] != entity_codes[:-1]
    return out


def _shift_indices(n: int, k: int) -> np.ndarray:
    """Row index shifted by k (negative = lag/backward)."""
    return np.arange(n, dtype=np.int64) + k


def lag_indices(new_group: np.ndarray, k: int = 1):
    """Source-row indices for a lag-k shift: ``(src_idx, valid_mask)``.

    Callers gather any payload type (including ``list<int32>`` token
    columns) zero-copy via ``pyarrow.Array.take`` with nulls where invalid.
    """
    n = len(new_group)
    idx = _shift_indices(n, -k)
    valid = idx >= 0
    gid = np.cumsum(new_group)
    src = np.clip(idx, 0, max(n - 1, 0))
    if n:
        valid &= gid[src] == gid
    return src, valid


def lead_indices(new_group: np.ndarray, k: int = 1):
    """Source-row indices for a lead-k shift: ``(src_idx, valid_mask)``."""
    n = len(new_group)
    idx = _shift_indices(n, k)
    valid = idx < n
    gid = np.cumsum(new_group)
    src = np.clip(idx, 0, max(n - 1, 0))
    if n:
        valid &= gid[src] == gid
    return src, valid


def ffill_indices(isnull: np.ndarray, new_group: np.ndarray):
    """Source indices for forward-fill: ``(src_idx, still_null_mask)``."""
    n = len(isnull)
    if n == 0:
        return np.zeros(0, dtype=np.int64), isnull
    pos = np.where(~isnull, np.arange(n, dtype=np.int64), -1)
    src = np.maximum.accumulate(pos)
    gid = np.cumsum(new_group)
    ok = src >= 0
    safe = np.clip(src, 0, n - 1)
    ok &= gid[safe] == gid
    return safe, ~ok


def bfill_indices(isnull: np.ndarray, new_group: np.ndarray):
    """Source indices for backward-fill: ``(src_idx, still_null_mask)``."""
    n = len(isnull)
    if n == 0:
        return np.zeros(0, dtype=np.int64), isnull
    pos = np.where(~isnull, np.arange(n, dtype=np.int64), n)
    rev_min = np.minimum.accumulate(pos[::-1])[::-1]
    gid = np.cumsum(new_group)
    ok = rev_min < n
    safe = np.clip(rev_min, 0, n - 1)
    ok &= gid[safe] == gid
    return safe, ~ok


def lag(values: np.ndarray, new_group: np.ndarray, k: int = 1):
    """``out[i] = values[i-k]`` when row i-k exists in the same group, else null.

    Returns ``(shifted_values, valid_mask)`` so callers can build an Arrow
    array with nulls where ``valid_mask`` is False (the engine's null
    convention mirrors the reference's NaN sentinel, SURVEY §1.2).
    """
    src, valid = lag_indices(new_group, k)
    return (values[src] if len(values) else values), valid


def lead(values: np.ndarray, new_group: np.ndarray, k: int = 1):
    """Forward shift: ``out[i] = values[i+k]`` within the same group."""
    src, valid = lead_indices(new_group, k)
    return (values[src] if len(values) else values), valid


def ffill(values: np.ndarray, isnull: np.ndarray, new_group: np.ndarray):
    """Forward-fill nulls within each group.

    Returns ``(filled_values, still_null_mask)``. ``isnull`` marks missing
    inputs; leading nulls in a group stay null.
    """
    if len(values) == 0:
        return values, isnull
    safe, still = ffill_indices(isnull, new_group)
    return values[safe], still


def bfill(values: np.ndarray, isnull: np.ndarray, new_group: np.ndarray):
    """Backward-fill: mirror of :func:`ffill` (trailing nulls stay null)."""
    if len(values) == 0:
        return values, isnull
    safe, still = bfill_indices(isnull, new_group)
    return values[safe], still


def sessionize(ts: np.ndarray, new_group: np.ndarray, gap) -> np.ndarray:
    """Assign 0-based session ids per entity: new session when the gap from
    the previous row (same entity) exceeds ``gap``.

    ``ts`` must be a numeric/timedelta-comparable array sorted ascending
    within each group; ``gap`` in the same units. The first row of each
    entity starts session 0.
    """
    n = len(ts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    brk = np.zeros(n, dtype=bool)
    brk[1:] = (ts[1:] - ts[:-1]) > gap
    new_session = new_group | brk
    s = np.cumsum(new_session)  # global 1-based session ordinal
    base = np.maximum.accumulate(np.where(new_group, s, 0))
    return (s - base).astype(np.int64)


def sliding_sum_count(values: np.ndarray, isnull: np.ndarray,
                      new_group: np.ndarray, window: int):
    """Rolling sum + valid-count over the trailing ``window`` rows, clipped
    at group starts. Nulls contribute 0 to the sum and 0 to the count.

    Returns ``(sums, counts)`` float64/int64 arrays.
    """
    n = len(values)
    if n == 0:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    v = np.where(isnull, 0.0, values.astype(np.float64))
    c = (~isnull).astype(np.int64)
    cv = np.concatenate([[0.0], np.cumsum(v)])
    cc = np.concatenate([[0], np.cumsum(c)])
    idx = np.arange(n, dtype=np.int64)
    gstart = np.maximum.accumulate(np.where(new_group, idx, 0))
    start = np.maximum(idx - window + 1, gstart)
    sums = cv[idx + 1] - cv[start]
    counts = cc[idx + 1] - cc[start]
    return sums, counts


def sliding_mean(values: np.ndarray, isnull: np.ndarray,
                 new_group: np.ndarray, window: int):
    """Rolling mean over trailing ``window`` rows; null when count == 0."""
    sums, counts = sliding_sum_count(values, isnull, new_group, window)
    out = np.divide(sums, counts, out=np.full(len(sums), np.nan),
                    where=counts > 0)
    return out, counts == 0


def sliding_min_max(values: np.ndarray, new_group: np.ndarray,
                    window: int):
    """Rolling min AND max over the trailing ``window`` rows per group
    (window clipped at group starts). Delegates to pandas' cython rolling
    kernels per group run — the chunked sparse-table trick does not
    survive group-clipped windows, and pandas' deque implementation is
    O(n) and battle-tested."""
    import pandas as pd
    n = len(values)
    if n == 0:
        return values.copy(), values.copy()
    gid = np.cumsum(new_group)
    s = pd.Series(values)
    g = s.groupby(gid)
    mins = g.rolling(window, min_periods=1).min().to_numpy()
    maxs = g.rolling(window, min_periods=1).max().to_numpy()
    return mins, maxs


def time_range_sum_count(ts: np.ndarray, values: np.ndarray,
                         isnull: np.ndarray, new_group: np.ndarray,
                         span):
    """Time-based trailing window: per row, sum/count of same-group values
    with ``ts' ∈ [ts − span, ts]`` — per-run ``searchsorted`` (ts sorted
    within each run) + global prefix sums. No per-row Python work."""
    n = len(ts)
    if n == 0:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    lo = np.empty(n, dtype=np.int64)
    starts = np.flatnonzero(new_group)
    ends = np.r_[starts[1:], n]
    for s, e in zip(starts, ends):
        lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - span,
                                      side="left")
    v = np.where(isnull, 0.0, values.astype(np.float64))
    c = (~isnull).astype(np.int64)
    cv = np.concatenate([[0.0], np.cumsum(v)])
    cc = np.concatenate([[0], np.cumsum(c)])
    sums = cv[idx + 1] - cv[lo]
    counts = cc[idx + 1] - cc[lo]
    return sums, counts


def mattr(tokens: np.ndarray, window: int) -> float:
    """Moving-Average Type-Token Ratio over one ordered token stream.

    Incremental O(n) add/evict pass (the reference's dict-based sliding
    vocabulary, ``text_features/extract_lexical_diversity.py:10-52``,
    reimplemented). Returns NaN for an empty stream; for streams shorter
    than ``window`` returns the plain TTR (reference behavior: single
    window over all words).
    """
    n = len(tokens)
    if n == 0:
        return float("nan")
    if n <= window:
        return len(set(tokens.tolist())) / n
    counts: dict = {}
    distinct = 0
    total = 0.0
    nwin = 0
    toks = tokens.tolist()
    for i, t in enumerate(toks):
        c = counts.get(t, 0)
        if c == 0:
            distinct += 1
        counts[t] = c + 1
        if i >= window:
            old = toks[i - window]
            oc = counts[old] - 1
            counts[old] = oc
            if oc == 0:
                distinct -= 1
        if i >= window - 1:
            total += distinct / window
            nwin += 1
    return total / nwin
