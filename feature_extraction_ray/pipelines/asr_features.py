"""Reference entry-point pipelines (SURVEY §3) rebuilt Ray-Data-first.

Covers, over the F3/F6 fixture schemas:

* :func:`text_features` — §3.1 ``extract_text_features.py``: recognizer
  segments → per-group ordered word segments → verbosity + lexical
  diversity + speech-graph packs, fused in ONE bucketed pass (the
  reference runs 5 separate per-group loops).
* :func:`confidence_features` — G9 ``extract_confidence_features.py:79-86``
  / ``extract_asr_conf_feats.py:11-22``: conf_{max,mean,std,min,med}
  (population std, np conventions).
* :func:`kaldi_timing_features` — §3.3 ``extract_timing_feats.py``: the
  phone-line state machine per segment + the full timing pack with
  phones/pps (25 ms frames).
* :func:`hypotheses_features` — G15 ``archived/
  extract_transcript_feats.py:134-145``: per-hypothesis feature dicts
  mean-reduced across the hypotheses axis.

Grouping level (segment/call/day/week/subject) is a key-derivation
function parameter, mirroring the reference's ``--level`` plug point
(``extract_timing_feats.py:211-212``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions import tokenstats as TS
from ..sources.parsers import kaldi_segment_times
from ..stages.features import (FEATURE_REGISTRY, lexical_diversity_features,
                               verbosity_features)
from ..stages.partition import entity_group_starts, sort_table
from ..stages.timing import timing_feature_pack, _stats
from ..stages.window import bucketed_apply, DEFAULT_NUM_BUCKETS


def _word_segments(texts: list[str]) -> list[np.ndarray]:
    return [np.array(t.split(), dtype=object) if t else
            np.zeros(0, dtype=object) for t in texts]


def _prep_graph(texts, texts_basic):
    """Graph: keep ASR segments & case; strip punctuation except
    apostrophes; drop emptied words (``extract_text_features.py:116-123``,
    ``extract_graph.py:258-271``; truecase restoration stubbed)."""
    from ..stages.textprep import scrub_empty, strip_punctuation
    return [np.array(scrub_empty(strip_punctuation(t).split(" ")),
                     dtype=object) for t in texts]


def _prep_lexical(texts, texts_basic):
    """Lexical diversity: join ALL basic segments into one document,
    split on single spaces (``extract_text_features.py:136-142``,
    ``extract_lexical_diversity.py:79``)."""
    joined = " ".join(str(t) for t in texts_basic)
    return [np.array(joined.split(" "), dtype=object)] if joined else []


def _prep_sentences(texts, texts_basic):
    """LIWC/POS/verbosity: join cased text, re-split into sentences,
    strip punctuation (keep apostrophes), lowercase
    (``extract_text_features.py:156-165,179-188,203-212``)."""
    from ..stages.textprep import (scrub_empty, split_sentences,
                                   strip_punctuation)
    joined = " ".join(str(t) for t in texts)
    sents = split_sentences(joined)
    return [np.array(scrub_empty(strip_punctuation(s).lower().split(" ")),
                     dtype=object) for s in sents]


# per-feature-set preprocessing, mirroring §3.1's per-set variants
_PREP = {
    "graph": _prep_graph,
    "lexical_diversity": _prep_lexical,
    "verbosity": _prep_sentences,
    "liwc": _prep_sentences,
    "pos": _prep_sentences,
    "syllables": _prep_sentences,
    "non_verbal": _prep_sentences,
}


def text_features(ds: Dataset, *, group_col: str = "audio_file_id",
                  order_cols=("segment_number",),
                  text_col: str = "text",
                  basic_col: str = "text_basic",
                  feature_sets=("verbosity", "lexical_diversity", "graph"),
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """One wide feature row per group; each feature set sees the
    reference's OWN preprocessing variant of the ordered segments
    (graph: cased segments; lexical: one joined document; others:
    re-split sentences, lowercased)."""
    fns = [(n, FEATURE_REGISTRY[n]) for n in feature_sets]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, *order_cols])
        ng = entity_group_starts(tbl, group_col)
        gid = np.cumsum(ng) - 1 if len(tbl) else np.zeros(0, np.int64)
        offs = TS.group_offsets(gid)
        texts = tbl[text_col].to_pylist()
        basics = tbl[basic_col].to_pylist() if basic_col in \
            tbl.column_names else texts
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(len(offs) - 1):
            lo, hi = int(offs[g]), int(offs[g + 1])
            seg_cache: dict = {}
            row = {"id": groups[lo]}
            for name, fn in fns:
                prep = _PREP[name]
                key = id(prep)
                if key not in seg_cache:
                    seg_cache[key] = prep(texts[lo:hi], basics[lo:hi])
                row.update(fn(seg_cache[key]))
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, group_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def confidence_features(ds: Dataset, *, group_col: str = "audio_file_id",
                        conf_col: str = "confidence",
                        num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """G9 confidence stat pack per group (np.std = population)."""
    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col])
        ng = entity_group_starts(tbl, group_col)
        gid = np.cumsum(ng) - 1 if len(tbl) else np.zeros(0, np.int64)
        offs = TS.group_offsets(gid)
        conf = tbl[conf_col].cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(len(offs) - 1):
            lo, hi = int(offs[g]), int(offs[g + 1])
            v = conf[lo:hi]
            rows.append({
                "id": groups[lo],
                "conf_max": float(v.max()),
                "conf_mean": float(v.mean()),
                "conf_std": float(v.std(ddof=0)),
                "conf_min": float(v.min()),
                "conf_med": float(np.median(v)),
            })
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, group_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def kaldi_timing_features(ds: Dataset, *, group_col: str = "call_id",
                          order_cols=("segment_start",),
                          duration_lookup: dict | None = None,
                          num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """§3.3: Kaldi phone-line state machine per segment, grouped timing
    pack with phones/pps (``extract_timing_feats.py:147-202`` + G10/G11)."""
    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, *order_cols])
        ng = entity_group_starts(tbl, group_col)
        gid = np.cumsum(ng) - 1 if len(tbl) else np.zeros(0, np.int64)
        offs = TS.group_offsets(gid)
        infos = tbl["timing_info"].to_pylist()
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(len(offs) - 1):
            lo, hi = int(offs[g]), int(offs[g + 1])
            words, sils, phones, wps, pps = [], [], [], [], []
            seg_durs = []
            for ti in infos[lo:hi]:
                w, s, p, wc, dur = kaldi_segment_times(ti)
                words.extend(w)
                sils.extend(s)
                phones.extend(p)
                if wc == 0:
                    continue  # noise-only segment skipped (:196-197)
                wps.append(wc / dur)
                pps.append(len(p) / dur)
                seg_durs.append(dur)
            row = {"id": groups[lo]}
            total = None
            if duration_lookup is not None:
                total = duration_lookup.get(groups[lo], 0) * 1e-3
            row.update(timing_feature_pack(
                np.asarray(seg_durs), np.asarray(words, dtype=float),
                np.asarray(sils, dtype=float), np.asarray(wps, dtype=float),
                total))
            row.update(_stats(np.asarray(phones, dtype=float), "phones"))
            row.update(_stats(np.asarray(pps, dtype=float), "pps"))
            spk = float(np.sum(seg_durs))
            row["pps"] = len(phones) / spk if spk else float("nan")
            row["phone_count"] = float(len(phones))
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, group_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def hypotheses_features(ds: Dataset, *, group_col: str = "call_id",
                        hyp_col: str = "hypotheses",
                        num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """G15: features per hypothesis (verbosity + lexical diversity over the
    group's segments for each hypothesis index), mean-reduced across
    hypotheses (``extract_transcript_feats.py:134-145``)."""
    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [group_col, "segment_start"])
        ng = entity_group_starts(tbl, group_col)
        gid = np.cumsum(ng) - 1 if len(tbl) else np.zeros(0, np.int64)
        offs = TS.group_offsets(gid)
        hyps = tbl[hyp_col].to_pylist()
        groups = tbl[group_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(len(offs) - 1):
            lo, hi = int(offs[g]), int(offs[g + 1])
            n_hyp = max((len(h) for h in hyps[lo:hi]), default=0)
            per_hyp = []
            for k in range(n_hyp):
                segs = [np.array(h[k], dtype=object)
                        for h in hyps[lo:hi] if k < len(h)]
                f = {}
                f.update(verbosity_features(segs))
                f.update(lexical_diversity_features(segs))
                per_hyp.append(f)
            row = {"id": groups[lo]}
            if per_hyp:
                for key in per_hyp[0]:
                    row[key] = float(np.mean([h[key] for h in per_hyp]))
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, group_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)
