"""End-to-end training-shard builder — the pipeline a 100-TB pretraining
run actually executes, composed from the engine's curation operators:

    quality gates  →  temperature mixture weights  →  per-domain
    token-budget sample  →  GPT-style sequence packing  →  resumable
    range-partitioned shard write

Every stage is an existing first-class operator (`curation.
repetition_filter`, `curation.mixture_weights`, `curation.
token_budget_sample` with the per-domain budget mapping, `curation.
pack_chunks`, `state.checkpoint.run_partitioned`); this module wires
them with the deterministic glue a production run needs:

* the per-domain sample order is a seeded splitmix64 hash of
  ``doc_id`` — a uniform pseudo-random subset that is IDENTICAL on
  every machine, rerun, and resume (no RNG state to checkpoint);
* shards are CONTIGUOUS chunk ranges (``chunk_first //
  chunks_per_shard``), not hash buckets, so shard ``s`` holds the docs
  whose token span STARTS in its range — a reader reconstructing
  training sequence boundaries needs at most the previous shard's tail
  doc (the standard carry-in convention for packed corpora);
* the shard write goes through the checkpoint manifests: a killed run
  re-invoked with the same ``input_fingerprint`` skips verified shards
  before any row shuffles.

Exchange budget (the at-scale shape): one tiny domain groupby
(#domains rows to the driver), one bucketed cumsum for the quota cut,
one range-partition sort for the pack prefix-scan, one bucketed
exchange for the shard write — four all-to-alls for the whole build,
none of which materializes the corpus on the driver.

No counterpart in the reference repo (it has no training-data
assembly); part of the beyond-reference LLM-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..stages.curation import (mixture_weights, pack_chunks,
                               repetition_filter, token_budget_sample)
from ..stages.text import ws_token_count


def _splitmix(v: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 64-bit mix of ``hash(doc_id) + seed`` (same
    finalizer the partitioner uses) — the sample order key."""
    x = (v.astype(np.uint64) + np.uint64(seed)
         + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def make_training_shards(docs: Dataset, out_dir: str, *,
                         input_fingerprint: str,
                         seq_len: int = 256,
                         token_budget: int = 100_000,
                         alpha: float = 0.5,
                         seed: int = 7,
                         chunks_per_shard: int = 64,
                         min_tokens: int = 5,
                         gopher_gate: bool = True,
                         dedup: str | None = None,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         tokens_col: str | None = None,
                         domain_col: str = "source") -> dict:
    """Build packed training shards from a raw document pool.

    ``input_fingerprint`` identifies the INPUT + parameters; reruns with
    the same fingerprint resume (verified shards are pruned before the
    shuffle), reruns with a new fingerprint recompute everything.

    ``dedup``: ``None`` (default), ``"exact"`` (min-id per exact text —
    one hash-bucketed exchange) or ``"minhash"`` (near-dup clustering,
    keep each cluster's representative) — the dedup stage slots between
    the quality gates and the mixture fit, so duplicate mass neither
    skews the domain weights nor wastes the token budget.

    ``tokens_col``: token-native mode — the pool already carries
    pre-tokenized ``list<int32>`` sequences (the north-rule input
    shape); ``n_tok`` is the list length and the token arrays RIDE into
    the shard files bit-exactly, so :func:`read_training_sequences`
    can emit actual ``(n, seq_len)`` int32 training matrices. The
    text-only stages (Gopher gate, dedup) don't apply and raise if
    requested.

    Returns ``{"weights": DataFrame, "n_sampled_docs", "n_tokens",
    "n_chunks", "n_shards", "written": [...], "skipped": [...]}``.
    """
    from ray.data.aggregate import Count, Max, Sum
    from ..state.checkpoint import run_partitioned

    if tokens_col is not None and (gopher_gate or dedup is not None):
        raise ValueError("token-native mode has no text for the Gopher "
                         "gate / dedup stages — gate and dedup the text "
                         "table upstream, or pass gopher_gate=False, "
                         "dedup=None")

    def prep(t: pa.Table) -> pa.Table:
        if tokens_col is not None:
            t = t.select([id_col, tokens_col, domain_col])
            n_tok = pc.cast(pc.list_value_length(t[tokens_col]),
                            pa.int64())
        else:
            t = t.select([id_col, text_col, domain_col])
            n_tok = ws_token_count(t[text_col])
        t = t.append_column("n_tok", n_tok)
        t = t.filter(pc.greater_equal(t["n_tok"], min_tokens))
        # type-agnostic id hash (the north-rule tokens table has
        # STRING doc_ids; documents use int64)
        from ..stages.partition import _stable_hash_strings
        ordk = _splitmix(_stable_hash_strings(t[id_col]), seed)
        # int64 view (Arrow/parquet have no uint64-friendly sort here):
        # the signed reinterpretation permutes the order differently
        # than unsigned would, but any FIXED deterministic pseudo-random
        # order is equally valid for sampling — what matters is that
        # every rerun/resume/engine sees the SAME order
        return t.append_column(
            "sample_ord", pa.array(ordk.view(np.int64)))

    pool = docs.map_batches(prep, batch_format="pyarrow")
    if gopher_gate:
        pool = repetition_filter(pool, text_col=text_col)
    if dedup == "exact":
        from ..stages.dedup import exact_dedup
        pool = exact_dedup(pool, content_col=text_col, id_col=id_col,
                           keep_cols=[domain_col, "n_tok", "sample_ord"])
    elif dedup == "minhash":
        # keep each near-dup cluster's representative: the duplicate id
        # set is cluster-bounded (≪ corpus); anti-join it off the pool
        from ..stages.dedup import minhash_lsh_dedup
        from ..stages.relational import anti_join
        assign = minhash_lsh_dedup(pool.map_batches(
            lambda t: t.select([id_col, text_col]),
            batch_format="pyarrow"), text_col=text_col,
            output="dataset")
        dups = assign.filter(expr="is_duplicate == True")
        pool = anti_join(pool, dups, left_key=id_col, right_key=id_col)
    elif dedup is not None:
        raise ValueError(f"unknown dedup mode {dedup!r}")

    weights = mixture_weights(pool, group_col=domain_col,
                              token_col="n_tok", alpha=alpha,
                              token_budget=token_budget)
    if len(weights) == 0:          # empty pool: no domains at all
        return {"weights": weights, "n_sampled_docs": 0, "n_tokens": 0,
                "n_chunks": 0, "n_shards": 0, "written": [],
                "skipped": []}
    budgets = {d: int(np.floor(s)) for d, s in
               zip(weights[domain_col], weights["sampled_tokens"])}

    sampled = token_budget_sample(pool, domain_col, budgets,
                                  ["sample_ord", id_col],
                                  token_col="n_tok")
    packed = pack_chunks(sampled, order_col=id_col,
                         chunk_tokens=seq_len, token_col="n_tok")
    sch = packed.schema()
    stats = None
    if sch is not None and "chunk_last" in sch.names:
        stats = packed.aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="n_tokens"),
            Max("chunk_last", alias_name="last_chunk"))
    if not stats or stats.get("n_docs", 0) == 0:
        return {"weights": weights, "n_sampled_docs": 0, "n_tokens": 0,
                "n_chunks": 0, "n_shards": 0, "written": [],
                "skipped": []}
    n_chunks = int(stats["last_chunk"]) + 1
    n_shards = (n_chunks + chunks_per_shard - 1) // chunks_per_shard

    def shard_of(t: pa.Table) -> pa.Table:
        s = (t["chunk_first"].to_numpy(zero_copy_only=False)
             // chunks_per_shard)
        return t.append_column("shard_id",
                               pa.array(s.astype(np.int64)))

    sharded = packed.map_batches(shard_of, batch_format="pyarrow")
    res = run_partitioned(sharded, out_dir, entity_col="shard_id",
                          num_buckets=n_shards,
                          input_fingerprint=input_fingerprint,
                          precomputed_bucket=True)
    return {"weights": weights,
            "n_sampled_docs": int(stats["n_docs"]),
            "n_tokens": int(stats["n_tokens"]),
            "n_chunks": n_chunks, "n_shards": n_shards,
            "written": res["written"], "skipped": res["skipped"]}


def read_shards(out_dir: str) -> pa.Table:
    """Read a shard directory back as one Arrow table (checkpoint parts
    are plain parquet; shard id rides in the ``shard_id`` column)."""
    from ..state.checkpoint import read_result
    return read_result(out_dir)


def read_training_sequences(out_dir: str, shard_id: int, *,
                            seq_len: int, chunks_per_shard: int,
                            tokens_col: str = "tokens"):
    """Materialize ONE shard's training sequences from a token-native
    build: returns ``(mat, tail)`` where ``mat`` is an
    ``(n_chunks, seq_len)`` int32 matrix of the shard's COMPLETE
    training sequences and ``tail`` is the trailing partial chunk (the
    corpus end; empty for every shard but the last).

    Reads the shard's own checkpoint file plus (carry-in convention)
    the PREVIOUS shard's straddler — docs are stored in the shard where
    their token span STARTS, so at most the tail docs of shard
    ``s − 1`` spill into ``s``'s token range. Bit-exact: the emitted
    stream is the concatenation of the sampled docs' token arrays in
    pack order, sliced at chunk boundaries."""
    import os

    import pyarrow.parquet as pq
    from ..state.checkpoint import _part_paths

    start_tok = shard_id * chunks_per_shard * seq_len
    end_tok = (shard_id + 1) * chunks_per_shard * seq_len

    def load(pid: int):
        path, _ = _part_paths(out_dir, pid)
        if not os.path.exists(path):
            return None
        return pq.read_table(path, columns=[tokens_col, "tok_start",
                                            "n_tok"])

    parts = [t for t in (load(p) for p in
                         ([shard_id - 1] if shard_id > 0 else [])
                         + [shard_id]) if t is not None]
    if not parts:
        return (np.zeros((0, seq_len), dtype=np.int32),
                np.zeros(0, dtype=np.int32))
    tbl = pa.concat_tables(parts)
    ts = tbl["tok_start"].to_numpy(zero_copy_only=False)
    nt = tbl["n_tok"].to_numpy(zero_copy_only=False)
    keep = (ts + nt > start_tok) & (ts < end_tok)
    tbl = tbl.filter(pa.array(keep))
    order = np.argsort(tbl["tok_start"].to_numpy(zero_copy_only=False),
                       kind="stable")
    tbl = tbl.take(pa.array(order.astype(np.int64)))
    toks = tbl[tokens_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.int32)
    first_start = int(tbl["tok_start"][0].as_py()) if len(tbl) else 0
    lo = start_tok - first_start
    stream = flat[lo:lo + (end_tok - start_tok)]
    n_full = len(stream) // seq_len
    mat = stream[:n_full * seq_len].reshape(n_full, seq_len).copy()
    return mat, stream[n_full * seq_len:].copy()
