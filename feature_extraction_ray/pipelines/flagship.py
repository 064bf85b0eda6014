"""Flagship pipeline: the engine's headline end-to-end workload.

``read tokens → as-of join feature updates → sessionize + lag + sliding
window (fused in the join's bucket task) → per-(source, session) ordered
feature aggregation → feature rows``.

This is the reference's whole program shape — read per-call files, attach
point-in-time metadata, group by entity×time level, run ordered feature
extractors, emit one wide row per group (SURVEY §3) — as ONE streaming
Ray Data pipeline with exactly one all-to-all shuffle: the union-bucket
exchange inside the partitioned as-of join. Everything downstream of the
shuffle (windows, sessionization, lexical-diversity feature pack) runs
fused in the same per-bucket task because a bucket contains whole
entities, hence whole sessions.

Feature semantics reproduced (cites for parity; implementations original):
verbosity stats ``text_features/extract_verbosity_stats.py:10-36``; MATTR
``extract_lexical_diversity.py:10-52``; Honoré ``:55-69``; silence/gap lag
``microsoft_asr_features/extract_timing_features.py:142-163``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .. import fixtures as FX
from ..functions import tokenstats as TS
from ..functions import windows as W
from ..stages.asof import asof_join
from ..stages.partition import entity_group_starts, sort_table

GAP_US = 3_600_000_000  # 1 h session gap
MATTR_WINDOW = 50
SLIDE_W = 5


def enrich_bucket(tbl: pa.Table, entity_col: str = "source",
                  ts_col: str = "ts") -> pa.Table:
    """Windowed enrichment of one entity-complete bucket: session ids, lag-1
    token stats, trailing mean, forward-filled as-of attribute."""
    tbl = sort_table(tbl, [entity_col, ts_col, "doc_id"])
    ng = entity_group_starts(tbl, entity_col)
    tsv = tbl[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    sid = W.sessionize(tsv, ng, GAP_US)
    tbl = tbl.append_column("session_id", pa.array(sid, type=pa.int64()))

    src, valid = W.lag_indices(ng, 1)
    ntok_col = tbl["n_tok"].combine_chunks() if isinstance(
        tbl["n_tok"], pa.ChunkedArray) else tbl["n_tok"]
    tbl = tbl.append_column(
        "n_tok_lag1", ntok_col.take(pa.array(src, mask=~valid)))
    # inter-document gap (the reference's silence lag, in seconds)
    prev_ts = np.where(valid, tsv[src], 0)
    gap_s = np.where(valid, (tsv - prev_ts) / 1e6, np.nan)
    tbl = tbl.append_column("gap_s", pa.array(gap_s, mask=~valid))

    ntok = tbl["n_tok"].cast(pa.float64()).to_numpy(zero_copy_only=False)
    isnull = np.zeros(len(ntok), dtype=bool)
    mean, mnull = W.sliding_mean(ntok, isnull, ng, SLIDE_W)
    tbl = tbl.append_column(f"n_tok_w{SLIDE_W}_mean",
                            pa.array(mean, mask=mnull))

    attr = tbl["attr_val"]
    attr_null = pc.is_null(attr).to_numpy(zero_copy_only=False)
    fsrc, still = W.ffill_indices(attr_null, ng)
    attr_arr = attr.combine_chunks() if isinstance(
        attr, pa.ChunkedArray) else attr
    tbl = tbl.append_column(
        "attr_val_ffill", attr_arr.take(pa.array(fsrc, mask=still)))
    return tbl


def session_features_bucket(tbl: pa.Table, entity_col: str = "source",
                            ts_col: str = "ts") -> pa.Table:
    """One wide feature row per (entity, session) — the reference's
    per-group feature vector (SURVEY §2.5), fully vectorized.

    Requires an enriched, (entity, ts)-sorted bucket from
    :func:`enrich_bucket`.
    """
    n = len(tbl)
    ng = entity_group_starts(tbl, entity_col)
    sid = tbl["session_id"].to_numpy(zero_copy_only=False)
    new_sess = ng | np.r_[False, sid[1:] != sid[:-1]]
    row_gid = np.cumsum(new_sess) - 1 if n else np.zeros(0, np.int64)
    n_groups = int(row_gid[-1]) + 1 if n else 0
    offs = TS.group_offsets(row_gid)

    ent = tbl[entity_col].to_numpy(zero_copy_only=False)
    tsv = tbl[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ntok = tbl["n_tok"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    attrf = tbl["attr_val_ffill"].cast(pa.float64()).to_numpy(
        zero_copy_only=False)

    starts = offs[:-1]
    ends = offs[1:] - 1
    n_rows = np.diff(offs)
    sum_tok = np.add.reduceat(ntok, starts)
    min_tok = np.minimum.reduceat(ntok, starts)
    max_tok = np.maximum.reduceat(ntok, starts)
    dur_s = (tsv[ends] - tsv[starts]) / 1e6
    attr_valid = ~np.isnan(attrf)
    attr_cov = np.add.reduceat(attr_valid.astype(np.float64), starts) / n_rows
    attr_sum = np.add.reduceat(np.where(attr_valid, attrf, 0.0), starts)
    attr_cnt = np.add.reduceat(attr_valid.astype(np.int64), starts)
    with np.errstate(invalid="ignore"):
        attr_mean = np.where(attr_cnt > 0, attr_sum / np.maximum(attr_cnt, 1),
                             np.nan)

    # lexical diversity over each session's concatenated token stream
    toks = tbl["tokens"].combine_chunks() if isinstance(
        tbl["tokens"], pa.ChunkedArray) else tbl["tokens"]
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    row_len = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    tok_gid = np.repeat(row_gid, row_len)
    vocab, hapax = TS.vocab_hapax(flat, tok_gid, n_groups)
    total_tok = np.bincount(row_gid, weights=row_len,
                            minlength=n_groups).astype(np.int64)
    hs = TS.honore(total_tok, vocab, hapax)
    mattr = TS.mattr_groups(flat, tok_gid, n_groups, MATTR_WINDOW)
    with np.errstate(invalid="ignore", divide="ignore"):
        ttr = np.where(total_tok > 0, vocab / np.maximum(total_tok, 1),
                       np.nan)

    return pa.table({
        "source": pa.array(ent[starts], type=pa.string()),
        "session_id": pa.array(sid[starts], type=pa.int64()),
        "n_docs": pa.array(n_rows, type=pa.int64()),
        "total_tokens": pa.array(total_tok, type=pa.int64()),
        "sum_n_tok": pa.array(sum_tok, type=pa.int64()),
        "min_n_tok": pa.array(min_tok, type=pa.int64()),
        "max_n_tok": pa.array(max_tok, type=pa.int64()),
        "duration_s": pa.array(dur_s, type=pa.float64()),
        "attr_coverage": pa.array(attr_cov, type=pa.float64()),
        "attr_mean": pa.array(attr_mean, type=pa.float64()),
        "vocab_size": pa.array(vocab, type=pa.int64()),
        "hapax_count": pa.array(hapax, type=pa.int64()),
        "honore_hs": pa.array(hs, type=pa.float64()),
        f"mattr_{MATTR_WINDOW}": pa.array(mattr, type=pa.float64()),
        "ttr": pa.array(ttr, type=pa.float64()),
    })


def flagship(sf_dir: str, num_buckets: int = 16,
             features: bool = True, repeat: int = 1) -> Dataset:
    """Run the headline pipeline over ``{sf_dir}/documents.parquet``.

    ``features=True`` → one feature row per (source, session);
    ``features=False`` → the enriched per-document table (for row-level
    checks). ``repeat`` deterministically amplifies the input corpus
    (bench use). Lazy — consume with ``to_pandas``/``write_parquet``.
    """
    toks = FX.tokens_from_documents(sf_dir, repeat=repeat)
    upds = FX.updates_from_documents(sf_dir, repeat=repeat)

    def post(tbl: pa.Table) -> pa.Table:
        out = enrich_bucket(tbl)
        return session_features_bucket(out) if features else out

    return asof_join(
        toks, upds,
        left_by="source", right_by="source",
        left_on="ts", right_on="ts",
        right_value_cols=["attr_val"],
        num_buckets=num_buckets,
        post_fn=post)


def flagship_checkpointed(sf_dir: str, out_dir: str,
                          num_buckets: int = 32,
                          repeat: int = 1) -> dict:
    """Flagship with resumable per-partition output: the as-of union is
    bucketed by ``state.checkpoint.run_partitioned``, each bucket runs
    merge → windows → session features and writes its own parquet +
    lineage manifest atomically. A rerun verifies finished partitions and
    computes ONLY missing buckets (their rows are pruned before the
    shuffle). Returns the run stats dict."""
    from ..stages.asof import asof_prepare
    from ..state.checkpoint import input_fingerprint_of, run_partitioned

    toks = FX.tokens_from_documents(sf_dir, repeat=repeat)
    upds = FX.updates_from_documents(sf_dir, repeat=repeat)
    unioned, merge_fn, ent = asof_prepare(
        toks, upds, left_by="source", right_by="source",
        left_on="ts", right_on="ts", right_value_cols=["attr_val"])

    def process(tbl: pa.Table) -> pa.Table:
        return session_features_bucket(enrich_bucket(merge_fn(tbl)))

    fp = input_fingerprint_of([f"{sf_dir}/documents.parquet"]) + \
        f":r{repeat}:b{num_buckets}"
    return run_partitioned(unioned, out_dir, entity_col=ent,
                           num_buckets=num_buckets,
                           input_fingerprint=fp, process_fn=process)
