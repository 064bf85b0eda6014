"""ASR timing features (G10–G14): silences via lag over word offsets +
the full timing stat pack, vectorized over Arrow word-timing columns.

Reference parity (cites; fresh implementation):

* nested word timing ``list<struct<Word,Offset,Duration>>`` in 100 ns
  units — parsed ONCE at ingest (vs the reference re-parsing a stringified
  cell per row, ``microsoft_asr_features/extract_timing_features.py:74-100``).
* ``get_times`` semantics ``:102-164``: segment s (×1e-7), word ms
  (×1e-4), silences ms from lag over word offsets, incl. boundary
  silences vs segment offset/end, zero-length dropped (``:163``), wps per
  segment.
* stat pack ``timing_features/extract_word_phone_timing.py:10-46`` (per
  sound type max/min/mean/med/std with np.std population convention) and
  call-level ratios ``:49-71`` (needs the joined total duration, J3/J4).

Engine shape: one ``map_batches`` computes per-SEGMENT partial lists
vectorized (the silences lag is one numpy shift over the flattened word
arrays — no Python loop over words), then the per-group pack reduces the
collected lists. NaN conventions match the reference exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions import tokenstats as TS
from .partition import entity_group_starts, sort_table
from .window import bucketed_apply, DEFAULT_NUM_BUCKETS

HNS_TO_S = 1e-7     # 100 ns → seconds (extract_timing_features.py:129)
HNS_TO_MS = 1e-4    # 100 ns → ms (:135)


def segment_times(seg_offset: np.ndarray, seg_duration: np.ndarray,
                  word_offsets: np.ndarray, word_durations: np.ndarray,
                  word_seg: np.ndarray):
    """Vectorized ``get_times`` over all segments at once.

    ``word_seg`` maps each word to its segment index (sorted, contiguous).
    Returns (segments_s, words_ms, silences_ms, silence_seg, wps) with
    zero-length silences dropped.
    """
    segments_s = seg_duration * HNS_TO_S
    words_ms = word_durations * HNS_TO_MS
    n_w = len(word_offsets)
    new_seg = np.empty(n_w, dtype=bool)
    if n_w:
        new_seg[0] = True
        new_seg[1:] = word_seg[1:] != word_seg[:-1]
    # silence before word i: offset[i] − (prev word end), or vs segment
    # start for the first word of a segment
    prev_end = np.empty(n_w, dtype=np.float64)
    if n_w:
        prev_end[1:] = word_offsets[:-1] + word_durations[:-1]
        prev_end[0] = 0
        seg_start = seg_offset[word_seg]
        prev_end = np.where(new_seg, seg_start, prev_end)
    before = (word_offsets - prev_end) * HNS_TO_MS
    # silence after the LAST word of each segment: segment end − word end
    last_of_seg = np.empty(n_w, dtype=bool)
    if n_w:
        last_of_seg[-1] = True
        last_of_seg[:-1] = word_seg[1:] != word_seg[:-1]
        seg_end = (seg_offset + seg_duration)[word_seg[last_of_seg]]
        after = (seg_end - (word_offsets[last_of_seg] +
                            word_durations[last_of_seg])) * HNS_TO_MS
        after_seg = word_seg[last_of_seg]
    else:
        after = np.zeros(0)
        after_seg = np.zeros(0, dtype=np.int64)
    sil = np.concatenate([before, after])
    sil_seg = np.concatenate([word_seg, after_seg]) if n_w else after_seg
    keep = sil != 0          # reference drops exact zeros only (:163)
    sil, sil_seg = sil[keep], sil_seg[keep]
    wcount = np.bincount(word_seg, minlength=len(seg_offset)) if n_w \
        else np.zeros(len(seg_offset), dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        wps = wcount / segments_s
    return segments_s, words_ms, sil, sil_seg, wps


def _stats(values: np.ndarray, prefix: str) -> dict:
    if len(values) == 0:
        nan = float("nan")
        return {f"{prefix}_{k}": nan
                for k in ("max", "min", "mean", "med", "std")}
    return {
        f"{prefix}_max": float(values.max()),
        f"{prefix}_min": float(values.min()),
        f"{prefix}_mean": float(values.mean()),
        f"{prefix}_med": float(np.median(values)),
        f"{prefix}_std": float(values.std(ddof=0)),  # np.std convention
    }


def timing_feature_pack(segments_s: np.ndarray, words_ms: np.ndarray,
                        silences_ms: np.ndarray, wps: np.ndarray,
                        total_duration_s: float | None = None) -> dict:
    """``get_feats_from_times`` + (optionally) ``get_feats`` call-level
    ratios, bit-matching the reference's formulas and NaN conventions."""
    feats = {}
    for name, vals in (("segments", segments_s), ("silences", silences_ms),
                       ("words", words_ms), ("wps", wps)):
        feats.update(_stats(vals, name))
    sil_duration = float(np.sum(silences_ms)) * 0.001
    spk_duration = float(np.sum(segments_s))
    feats["sil_duration"] = sil_duration
    feats["spk_duration"] = spk_duration
    feats["spk_sil_ratio"] = spk_duration / sil_duration if sil_duration \
        else float("nan")
    feats["sps"] = len(silences_ms) / spk_duration if spk_duration \
        else float("nan")
    feats["wps"] = len(words_ms) / spk_duration if spk_duration \
        else float("nan")
    feats["sil_count"] = float(len(silences_ms))
    feats["short_utt_count"] = float((segments_s <= 1).sum())
    feats["segment_count"] = float(len(segments_s))
    feats["word_count"] = float(len(words_ms))
    if total_duration_s is not None:
        td = total_duration_s
        feats["total_duration"] = td
        feats["spk_ratio"] = spk_duration / td if td else float("nan")
        feats["sil_ratio"] = sil_duration / td if td else float("nan")
        feats["segs_per_min"] = (len(segments_s) / (td / 60.0)) if td \
            else float("nan")
        feats["short_utts_per_min"] = (feats["short_utt_count"] /
                                       (td / 60.0)) if td else float("nan")
    return feats


def extract_timing_features(ds: Dataset, *, group_col: str,
                            order_cols=("segment_number",),
                            duration_lookup: dict | None = None,
                            num_buckets: int = DEFAULT_NUM_BUCKETS
                            ) -> Dataset:
    """Per-group timing feature rows from a recognizer table with columns
    ``group_col, order_cols…, duration:int64, offset:int64,
    word_timing:list<struct<Word,Offset,Duration>>`` (F3 fixture schema).

    ``duration_lookup``: group → total call duration ms (the reference's
    duration table join, J3); broadcast into the bucket tasks.
    """
    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, *order_cols])
        ng = entity_group_starts(tbl, group_col)
        gid = np.cumsum(ng) - 1 if len(tbl) else np.zeros(0, np.int64)
        n_groups = int(gid[-1]) + 1 if len(tbl) else 0
        offs = TS.group_offsets(gid)
        seg_off = tbl["offset"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        seg_dur = tbl["duration"].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        wt = tbl["word_timing"]
        if isinstance(wt, pa.ChunkedArray):
            wt = wt.combine_chunks()
        flat = wt.flatten()
        w_off = flat.field("Offset").to_numpy(zero_copy_only=False).astype(
            np.float64)
        w_dur = flat.field("Duration").to_numpy(zero_copy_only=False).astype(
            np.float64)
        per_row = pc.list_value_length(wt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        word_seg = np.repeat(np.arange(len(tbl)), per_row)
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(n_groups):
            lo, hi = int(offs[g]), int(offs[g + 1])
            wmask = (word_seg >= lo) & (word_seg < hi)
            seg_idx = word_seg[wmask] - lo
            s_s, w_ms, sil, _, wps = segment_times(
                seg_off[lo:hi], seg_dur[lo:hi],
                w_off[wmask], w_dur[wmask], seg_idx)
            total = None
            if duration_lookup is not None:
                total = duration_lookup.get(groups[lo], 0) * 1e-3
            row = {"group_id": groups[lo]}
            row.update(timing_feature_pack(s_s, w_ms, sil, wps, total))
            rows.append(row)
        import pandas as pd
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, group_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)
