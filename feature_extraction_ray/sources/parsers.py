"""Raw-text ASR format parsers (S5–S8) — parse ONCE at ingest into typed
Arrow columns, never re-parse downstream.

Reference formats reproduced (cites; fresh implementations):

* S5 Kaldi word-phone timing file: records delimited by ``\\n"``, header
  ``callid_chan_start_end``, phone lines ``start end ? ? [word]`` (5
  fields on word/sil boundary, 4 otherwise), frame = 25 ms
  (``kaldi_asr_features/extract_timing_feats.py:11-27,147-202``).
* S6 Kaldi confidence file: line ``seg_id w x y z conf …`` → per-segment
  score lists (``extract_asr_conf_feats.py:24-47``).
* S7 transcript-hypotheses dir: line ``seg_id w1 w2 …``, one file per
  hypothesis (``archived/extract_transcript_feats.py:23-58``).
* S8 stringified word-timing cell: Python-repr ``[{Word,Offset,Duration}]``
  inside a CSV field (``microsoft_asr_features/
  extract_timing_features.py:74-100``) — the engine stores the parsed
  ``list<struct>`` form; this parser exists for ingesting legacy CSVs.

Each has a pure-python parser (unit-testable) and a Ray wrapper shaping
``read_text``/``read_binary_files`` output into the engine's Arrow schema
via ``map_batches``.
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# S8 — stringified word-timing cell
# ---------------------------------------------------------------------------

def parse_word_timing_cell(cell: str) -> list[dict]:
    """Parse one stringified ``[{'Word':…,'Offset':…,'Duration':…}]`` cell.

    Uses ``ast.literal_eval`` (the payload is a Python repr) instead of the
    reference's hand-rolled strip/split chain — same result, robust to
    commas inside words."""
    if not cell or cell == "[]":
        return []
    out = ast.literal_eval(cell)
    return [{"Word": str(d["Word"]), "Offset": int(d["Offset"]),
             "Duration": int(d["Duration"])} for d in out]


def word_timing_column(cells: list[str]) -> pa.ListArray:
    """Vectorize S8 over a column → ``list<struct<Word,Offset,Duration>>``."""
    words, offs, durs, lens = [], [], [], []
    for c in cells:
        parsed = parse_word_timing_cell(c)
        lens.append(len(parsed))
        for d in parsed:
            words.append(d["Word"])
            offs.append(d["Offset"])
            durs.append(d["Duration"])
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.StructArray.from_arrays(
            [pa.array(words, type=pa.string()),
             pa.array(offs, type=pa.int64()),
             pa.array(durs, type=pa.int64())],
            names=["Word", "Offset", "Duration"]))


# ---------------------------------------------------------------------------
# S5 — Kaldi word-phone timing records
# ---------------------------------------------------------------------------

def parse_kaldi_timing(content: str) -> list[dict]:
    """File content → list of segment dicts ``{segment_id, segment_start,
    segment_end, timing_info:[str]}`` (record delimiter ``\\n"``; header
    id ``call_chan_start_end``)."""
    out = []
    for seg in content.split('\n"'):
        seg = seg.strip().strip('"')
        if not seg:
            continue
        lines = seg.split("\n")
        seg_id = lines[0].strip()
        parts = seg_id.split("_")
        if len(parts) < 4:
            continue
        out.append({
            "segment_id": seg_id,
            "segment_start": int(parts[2]),
            "segment_end": int(parts[3]),
            "timing_info": [ln for ln in lines[1:] if ln.strip()],
        })
    return out


def kaldi_timing_table(contents: list[str],
                       call_ids: list[str] | None = None) -> pa.Table:
    rows = {"call_id": [], "segment_id": [], "segment_start": [],
            "segment_end": [], "timing_info": []}
    for i, c in enumerate(contents):
        cid = call_ids[i] if call_ids else f"call{i}"
        for seg in parse_kaldi_timing(c):
            rows["call_id"].append(cid)
            rows["segment_id"].append(seg["segment_id"])
            rows["segment_start"].append(seg["segment_start"])
            rows["segment_end"].append(seg["segment_end"])
            rows["timing_info"].append(seg["timing_info"])
    return pa.table({
        "call_id": pa.array(rows["call_id"], type=pa.string()),
        "segment_id": pa.array(rows["segment_id"], type=pa.string()),
        "segment_start": pa.array(rows["segment_start"], type=pa.int64()),
        "segment_end": pa.array(rows["segment_end"], type=pa.int64()),
        "timing_info": pa.array(rows["timing_info"],
                                type=pa.list_(pa.string())),
    })


def kaldi_segment_times(timing_info: list[str]):
    """The reference's phone-line state machine for ONE segment
    (``extract_timing_feats.py:147-202`` semantics, 25 ms frames):
    returns (words_ms, silences_ms, phones_ms, word_count, seg_dur_s).
    Empty segments ([noise]-only) return word_count == 0."""
    words, sils, phones = [], [], []
    word_count = 0
    word_start = -1
    items = None
    for line in timing_info:
        items = line.strip().split(" ")
        if len(items) == 5:
            if word_start != -1:
                words.append((int(items[0]) - word_start) * 25)
            w = items[4]
            if w in ("[noise]", "[laughter]"):
                word_start = -1
            elif w == "sil":
                sils.append((int(items[1]) - int(items[0])) * 25)
                word_start = -1
            else:
                word_start = int(items[0])
                word_count += 1
        phones.append((int(items[1]) - int(items[0])) * 25)
    if items is not None and word_start != -1:
        words.append((int(items[1]) - word_start) * 25)
    seg_dur_s = (float(int(items[1])) * 25 * 0.001) if items else 0.0
    return words, sils, phones, word_count, seg_dur_s


# ---------------------------------------------------------------------------
# S6 — Kaldi confidence lines
# ---------------------------------------------------------------------------

def parse_confidence_lines(lines: list[str]) -> pa.Table:
    """Lines ``seg_id w x y z conf …`` → one row per segment with the
    word-confidence list (field 5, ``extract_asr_conf_feats.py:33-34``)."""
    by_seg: dict[str, list[float]] = {}
    order: list[str] = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        parts = line.split(" ")
        seg_id = parts[0]
        if seg_id not in by_seg:
            by_seg[seg_id] = []
            order.append(seg_id)
        by_seg[seg_id].append(float(parts[5]))
    starts = [int(s.split("_")[2]) for s in order]
    ends = [int(s.split("_")[3]) for s in order]
    return pa.table({
        "segment_id": pa.array(order, type=pa.string()),
        "segment_start": pa.array(starts, type=pa.int64()),
        "segment_end": pa.array(ends, type=pa.int64()),
        "conf_scores": pa.array([by_seg[s] for s in order],
                                type=pa.list_(pa.float64())),
    })


# ---------------------------------------------------------------------------
# S7 — transcript hypotheses
# ---------------------------------------------------------------------------

def parse_hypotheses(files: list[tuple[str, str]]) -> pa.Table:
    """``files`` = [(call_id, content)] where each content holds lines
    ``seg_id w1 w2 …`` and multiple files per call are successive
    hypotheses → one row per (call, segment) with ``list<list<string>>``
    hypotheses."""
    seg_hyps: dict[tuple[str, str], list[list[str]]] = {}
    order: list[tuple[str, str]] = []
    for call_id, content in files:
        for line in content.splitlines():
            line = line.strip()
            if not line:
                continue
            parts = line.split(" ")
            key = (call_id, parts[0])
            if key not in seg_hyps:
                seg_hyps[key] = []
                order.append(key)
            seg_hyps[key].append(parts[1:])
    return pa.table({
        "call_id": pa.array([k[0] for k in order], type=pa.string()),
        "segment_id": pa.array([k[1] for k in order], type=pa.string()),
        "segment_start": pa.array(
            [int(k[1].split("_")[2]) for k in order], type=pa.int64()),
        "segment_end": pa.array(
            [int(k[1].split("_")[3]) for k in order], type=pa.int64()),
        "hypotheses": pa.array([seg_hyps[k] for k in order],
                               type=pa.list_(pa.list_(pa.string()))),
    })
