"""Per-group feature extraction stages (the reference's feature registry).

The reference dispatches feature sets by name over per-group ordered
segments (``FEATURE_FUNCTION_DICT``,
``archived/extract_transcript_feats.py:16-20``; ``--feature_list``,
``microsoft_asr_features/extract_text_features.py:89-109``). Here that
surface is :data:`FEATURE_REGISTRY`: name → ``fn(segments) -> dict`` where
``segments`` is the group's ordered list of token arrays. Each feature fn
is pure; the engine applies the selected set per (entity, session) group
inside one bucketed pass.
"""

from __future__ import annotations

import datetime
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions import tokenstats as TS
from ..functions import windows as W
from ..functions.graph import graph_metrics
from .partition import entity_group_starts, group_field_type, sort_table
from .window import bucketed_apply, DEFAULT_NUM_BUCKETS


def verbosity_features(segments) -> dict:
    """G1 verbosity stats over per-segment token counts
    (``extract_verbosity_stats.py:10-36`` semantics on token segments)."""
    counts = np.array([len(s) for s in segments], dtype=np.float64)
    if len(counts) == 0:
        nan = float("nan")
        return {"wc_mean": nan, "wc_median": nan, "wc_stdev": nan,
                "wc_min": nan, "wc_max": nan, "total_count": nan}
    return {
        "wc_mean": float(counts.mean()),
        "wc_median": float(np.median(counts)),
        # reference uses np.std → POPULATION std (ddof=0),
        # extract_verbosity_stats.py:28
        "wc_stdev": float(counts.std(ddof=0)),
        "wc_min": float(counts.min()),
        "wc_max": float(counts.max()),
        "total_count": float(counts.sum()),
    }


def lexical_diversity_features(segments) -> dict:
    """G3/G4: MATTR (windows 10/25/50) + Honoré over the joined stream
    (``extract_lexical_diversity.py:72-84`` semantics)."""
    parts = [np.asarray(s) for s in segments if len(s)]
    stream = np.concatenate(parts) if parts else np.zeros(0, np.int64)
    if stream.dtype.kind not in "iu":
        # word strings → dense integer codes (distinctness-preserving)
        _, stream = np.unique(stream, return_inverse=True)
    feats = {}
    for w in (10, 25, 50):
        feats[f"MATTR_{w}"] = W.mattr(stream, w)
    n = len(stream)
    if n == 0:
        feats["HS"] = float("nan")
        return feats
    gid = np.zeros(n, dtype=np.int64)
    vocab, hapax = TS.vocab_hapax(stream.astype(np.int64), gid, 1)
    feats["HS"] = float(TS.honore(np.array([n]), vocab, hapax)[0])
    return feats


def graph_features(segments) -> dict:
    """G7 speech-graph metric pack (naive graph over token segments)."""
    return graph_metrics(segments)


_VOWELS = set("aeiouy")


def syllable_count(word: str) -> int:
    """The classic public-domain English syllable heuristic (the
    algorithm early textstat releases used for
    ``textstat.syllable_count``, G2: ``extract_verbosity_stats.py:39-53``
    — the library itself is absent here, the algorithm is public): count
    vowel-group onsets, subtract a silent final ``e``, add back a
    consonant+``le`` ending, floor at 1."""
    w = "".join(ch for ch in word.lower() if ch.isalpha())
    if not w:
        return 0
    count = 1 if w[0] in _VOWELS else 0
    for i in range(1, len(w)):
        if w[i] in _VOWELS and w[i - 1] not in _VOWELS:
            count += 1
    if w.endswith("e"):
        count -= 1
    if w.endswith("le") and len(w) > 2 and w[-3] not in _VOWELS:
        count += 1
    return max(count, 1)


def syllable_features(segments) -> dict:
    """G2 syllable stat pack (np.std population convention; NaN empty)."""
    counts = np.array([syllable_count(str(w))
                       for seg in segments for w in seg], dtype=np.float64)
    if len(counts) == 0:
        nan = float("nan")
        return {k: nan for k in ("syll_mean", "syll_median", "syll_stdev",
                                 "syll_min", "syll_max")}
    return {
        "syll_mean": float(counts.mean()),
        "syll_median": float(np.median(counts)),
        "syll_stdev": float(counts.std(ddof=0)),
        "syll_min": float(counts.min()),
        "syll_max": float(counts.max()),
    }


def non_verbal_features(segments) -> dict:
    """G8 non-verbal token shares (``kaldi_asr_features/
    extract_non_verbal.py:8-23`` formulas; NaN when empty)."""
    tokens = [str(w) for seg in segments for w in seg]
    total = len(tokens)
    if not total:
        nan = float("nan")
        return {"laughter": nan, "noise": nan, "unk": nan}
    return {
        "laughter": tokens.count("[laughter]") / total,
        "noise": tokens.count("[noise]") / total,
        "unk": tokens.count("<unk>") / total,
    }


def liwc_demo_features(segments) -> dict:
    """G5 category-lexicon pack (DEMO lexicon; word segments only —
    see stages/lexicon.py for plugging a real LIWC dictionary)."""
    from .lexicon import DEMO_CATEGORIES, TokenTrie, liwc_features
    global _DEMO_TRIE
    try:
        trie = _DEMO_TRIE
    except NameError:
        trie = _DEMO_TRIE = TokenTrie(DEMO_CATEGORIES)
    return liwc_features([list(map(str, s)) for s in segments], trie)


def pos_demo_features(segments) -> dict:
    """G6 POS pack over the stub tagger (deterministic test default)."""
    from .lexicon import pos_features
    from .textprep import fake_pos_tag
    tagged = [[(str(w), fake_pos_tag(str(w))) for w in seg]
              for seg in segments]
    return pos_features(tagged)


def pos_real_features(segments) -> dict:
    """G6 POS pack over the self-contained lexicon/suffix/context tagger
    (``stages/tagger.py`` — the real-morphology replacement for the stub;
    sequence-aware, so tags reflect TO/MD and DT contexts like
    ``extract_pos.py:86-94``'s NLTK run would)."""
    from .lexicon import pos_features
    from .tagger import EnglishTagger
    global _EN_TAGGER
    try:
        tagger = _EN_TAGGER
    except NameError:
        tagger = _EN_TAGGER = EnglishTagger()
    tagged = [list(zip(map(str, seg), tagger.tag([str(w) for w in seg])))
              for seg in segments]
    return pos_features(tagged)


FEATURE_REGISTRY: dict[str, Callable] = {
    "verbosity": verbosity_features,
    "lexical_diversity": lexical_diversity_features,
    "graph": graph_features,
    "syllables": syllable_features,      # word segments
    "non_verbal": non_verbal_features,   # word segments
    "liwc": liwc_demo_features,          # word segments
    "pos": pos_demo_features,            # word segments (stub tagger)
    "pos_real": pos_real_features,       # word segments (lexicon tagger)
}


def extract_group_features(ds: Dataset, *, entity_col: str, ts_col: str,
                           tokens_col: str = "tokens",
                           feature_sets: Sequence[str] = ("verbosity",
                                                          "lexical_diversity",
                                                          "graph"),
                           session_gap: datetime.timedelta | None = None,
                           order_cols: Sequence[str] = (),
                           num_buckets: int = DEFAULT_NUM_BUCKETS) -> Dataset:
    """One wide feature row per group.

    Group = entity, or (entity, session) when ``session_gap`` is given.
    Segments = the group's token arrays in ``(ts, order_cols)`` order —
    exactly the reference's per-feature_id ordered segment lists (§3.1).
    """
    fns = [(name, FEATURE_REGISTRY[name]) for name in feature_sets]
    gap_us = int(session_gap.total_seconds() * 1e6) if session_gap else None

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = sort_table(tbl, [entity_col, ts_col, *order_cols])
        ng = entity_group_starts(tbl, entity_col)
        n = len(tbl)
        if n == 0:
            return pa.table({entity_col: pa.array([], group_field_type(tbl, entity_col))})
        if gap_us is not None:
            tsv = tbl[ts_col].cast(pa.timestamp("us")).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            sid = W.sessionize(tsv, ng, gap_us)
            new_grp = ng | np.r_[False, sid[1:] != sid[:-1]]
        else:
            sid = np.zeros(n, dtype=np.int64)
            new_grp = ng
        gid = np.cumsum(new_grp) - 1
        offs = TS.group_offsets(gid)
        toks = tbl[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ent = tbl[entity_col].to_numpy(zero_copy_only=False)
        rows = []
        for g in range(len(offs) - 1):
            lo, hi = int(offs[g]), int(offs[g + 1])
            segs = [np.asarray(toks[i].values) for i in range(lo, hi)]
            row = {entity_col: ent[lo], "session_id": int(sid[lo])}
            for _, fn in fns:
                row.update(fn(segs))
            rows.append(row)
        import pandas as pd
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return bucketed_apply(ds, entity_col, per_bucket,
                          num_buckets=num_buckets, drop_bucket=False)


def hashed_cross_features(ds: Dataset, col_a: str, col_b: str,
                          n_features: int = 4096, seed: int = 1,
                          out_col: str | None = None) -> Dataset:
    """Hashed feature cross of two integer key columns — the
    wide-and-deep ``crossed_column`` shape: each row gets

        ``bucket = ((a % 2²⁰)·2654435761 + (b % 2²⁰)·2246822519
                    + seed·1315423911) mod 2³² mod n_features``

    from the shared overflow-safe integer family (every term < 2⁶³,
    so a BIGINT SQL twin reproduces buckets bit-for-bit; the two
    multipliers are the bucket/sign pair from the feature-hashing op,
    both large and odd so neither key's contribution collapses under
    power-of-two widths). Pure zero-shuffle map; nulls in either key
    yield a null bucket. Appends ``out_col`` (default
    ``{a}_x_{b}``)."""
    import pyarrow.compute as pc

    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    name = out_col or f"{col_a}_x_{col_b}"
    mul_a, mul_b = np.uint64(2654435761), np.uint64(2246822519)
    add = np.uint64((seed * 1315423911) % (1 << 64))
    nf = np.uint64(n_features)

    def fn(t: pa.Table) -> pa.Table:
        a_col = t[col_a]
        b_col = t[col_b]
        if isinstance(a_col, pa.ChunkedArray):
            a_col = a_col.combine_chunks()
        if isinstance(b_col, pa.ChunkedArray):
            b_col = b_col.combine_chunks()
        valid = pc.and_(pc.is_valid(a_col),
                        pc.is_valid(b_col)).to_numpy(
            zero_copy_only=False)
        a = pc.fill_null(a_col, 0).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b = pc.fill_null(b_col, 0).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bucket = ((a % np.uint64(1 << 20)) * mul_a
                  + (b % np.uint64(1 << 20)) * mul_b + add) \
            % np.uint64(1 << 32) % nf
        out = pa.array(bucket.astype(np.int64), mask=~valid)
        return t.append_column(name, out)

    return ds.map_batches(fn, batch_format="pyarrow")
