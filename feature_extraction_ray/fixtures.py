"""Deterministic fixtures for the canonical engine input tables.

``BASELINE.json:input_hint`` fixes the engine's primary table shape:
``doc_id:string, tokens:list<int32>, n_tok:int32, source:string`` (+ a
derived ``ts:timestamp[us]`` event-time column every as-of/window operator
needs — the reference's ``call_datetime``/``order`` analog,
``group_audio_files.py:26-28``).

Two ways to produce it, both fully deterministic (fixed seed / pure hash of
inputs, no wall clock):

* :func:`gen_tokens` / :func:`gen_feature_updates` — seeded numpy
  generators for pytest golden tests (FIXTURES.md F1/F2): skewed source
  distribution, duplicate timestamps, entities with zero updates, updates
  after left rows (leakage probes).
* :func:`tokens_from_documents` — streaming Ray derivation from the
  driver's ``documents.parquet`` (text → whitespace tokens → stable FNV
  int32 ids; ts from ``doc_id`` spacing) so benches run on driver data at
  any scale factor without synthesizing new inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
VOCAB = 32_000
SOURCES = ["web", "books", "wiki", "news", "code", "forum", "papers", "chat"]
# deliberate skew: first source holds ~50% of rows (FIXTURES.md F1)
SOURCE_P = np.array([0.50, 0.20, 0.10, 0.07, 0.05, 0.04, 0.02, 0.02])

TOKENS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _list_array(flat: np.ndarray, lengths: np.ndarray) -> pa.ListArray:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(flat, type=pa.int32()))


def gen_tokens(n_rows: int = 200, n_entities: int = 4,
               seed: int = 42) -> pa.Table:
    """F1 ``tokens`` fixture: skewed sources, monotone per-entity ts with
    exponential gaps (sessions exist), duplicate-ts pairs (as-of ties)."""
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n_rows,
                         p=SOURCE_P[:len(SOURCES)])
    sources = np.array(SOURCES)[src_idx]
    ent = rng.integers(0, n_entities, size=n_rows)
    lengths = np.clip(rng.lognormal(3.0, 1.0, size=n_rows).astype(np.int64),
                      1, 512)
    flat = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    # per-entity monotone ts: sort rows by entity, cumulative exponential gaps
    order = np.argsort(ent, kind="stable")
    gaps = (rng.exponential(120.0, size=n_rows) * 1e6).astype(np.int64)
    # inject occasional big gaps (> 1h) so sessionize yields >1 session
    big = rng.random(n_rows) < 0.05
    gaps[big] += 2 * 3_600_000_000
    # duplicate-ts pairs: zero every 17th gap
    gaps[::17] = 0
    ts = np.empty(n_rows, dtype=np.int64)
    sorted_ent = ent[order]
    new_ent = np.empty(n_rows, dtype=bool)
    if n_rows:
        new_ent[0] = True
        new_ent[1:] = sorted_ent[1:] != sorted_ent[:-1]
    cum = np.cumsum(np.where(new_ent, 0, gaps))
    ts[order] = EPOCH_US + sorted_ent * 86_400_000_000 + cum
    doc_id = np.array([f"d{e:04d}_{i:06d}" for i, e in enumerate(ent)])
    return pa.table({
        "doc_id": pa.array(doc_id, type=pa.string()),
        "tokens": _list_array(flat, lengths),
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": pa.array(sources, type=pa.string()),
        "entity": pa.array([f"e{e:04d}" for e in ent], type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def gen_feature_updates(tokens: pa.Table, seed: int = 43,
                        every: int = 5) -> pa.Table:
    """F2 ``feature_updates`` fixture: sparse point-in-time attribute rows
    keyed by entity; includes rows after all left rows (leakage probe),
    entities with zero updates, and NaN attr values."""
    rng = np.random.default_rng(seed)
    ent = np.asarray(tokens["entity"].to_pylist())
    ts = tokens["ts"].cast(pa.int64()).to_numpy().astype(np.int64)
    uniq = np.unique(ent)
    keep_entities = uniq[:-1] if len(uniq) > 1 else uniq  # one entity: no updates
    rows_e, rows_ts = [], []
    for e in keep_entities:
        ets = np.sort(ts[ent == e])
        n_upd = max(1, len(ets) // every)
        picks = rng.choice(len(ets), size=n_upd, replace=False)
        offs = (rng.integers(-30, 30, size=n_upd) * 1_000_000)
        rows_e.extend([e] * n_upd)
        rows_ts.extend((ets[picks] + offs).tolist())
        # a future update past everything this entity has (must never match)
        rows_e.append(e)
        rows_ts.append(int(ets[-1]) + 7_200_000_000)
    n = len(rows_e)
    lengths = rng.integers(1, 16, size=n)
    flat = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    vals = rng.normal(size=n)
    vals[rng.random(n) < 0.1] = np.nan
    return pa.table({
        "entity": pa.array(rows_e, type=pa.string()),
        "ts": pa.array(np.array(rows_ts, dtype=np.int64),
                       type=pa.timestamp("us")),
        "attr_tokens": _list_array(flat, lengths),
        "attr_val": pa.array(vals, type=pa.float64()),
    })


def gen_metadata(n_calls: int = 6, n_subjects: int = 3,
                 seed: int = 45):
    """F4 metadata fixture: call → subject / datetime / week /
    is_assessment (pandas frame — small by contract, always broadcast)."""
    import pandas as pd
    rng = np.random.default_rng(seed)
    call_ids = [f"call{c:03d}" for c in range(n_calls)]
    subjects = [f"s{rng.integers(0, n_subjects):02d}" for _ in call_ids]
    base = pd.Timestamp("2020-03-01")
    dts = [base + pd.Timedelta(days=int(rng.integers(0, 21)),
                               hours=int(rng.integers(8, 20)))
           for _ in call_ids]
    return pd.DataFrame({
        "call_id": call_ids,
        "subject_id": subjects,
        "call_datetime": dts,
        "week": [int((d - base).days // 7) for d in dts],
        # alternate so both call types always exist (M12 filter tests)
        "is_assessment": (np.arange(n_calls) % 2 == 0),
    })


def gen_recognizer(n_calls: int = 6, segs_per_call: int = 8,
                   seed: int = 44) -> pa.Table:
    """F3 recognizer fixture: Microsoft-ASR-shaped segment table with
    nested word timings in 100 ns units (parsed list<struct> + the
    reference's stringified CSV form for parser tests).

    Includes zero-length silences (dropped per
    ``extract_timing_features.py:163``) and boundary silences."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("audio_file_id", "segment_number", "text",
                            "text_basic", "confidence", "duration",
                            "offset", "word_timing_str")}
    wt_words, wt_offsets, wt_durations, wt_lengths = [], [], [], []
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "Theta"]
    for c in range(n_calls):
        cursor = int(rng.integers(0, 10_000_000))
        for s in range(segs_per_call):
            k = int(rng.integers(1, 9))
            words = rng.choice(vocab, size=k).tolist()
            seg_offset = cursor
            w_off, w_dur = [], []
            pos = seg_offset + int(rng.integers(0, 3_000_000))
            for i in range(k):
                dur = int(rng.integers(1_000_000, 8_000_000))
                w_off.append(pos)
                w_dur.append(dur)
                gap = int(rng.choice([0, 0, 1_000_000, 4_000_000]))
                pos += dur + gap
            seg_end = pos + int(rng.choice([0, 2_000_000]))
            duration = seg_end - seg_offset
            cursor = seg_end + int(rng.integers(1_000_000, 20_000_000))
            rows["audio_file_id"].append(f"call{c:03d}")
            rows["segment_number"].append(s)
            txt = " ".join(words)
            rows["text"].append(txt + ".")
            rows["text_basic"].append(txt.lower())
            rows["confidence"].append(float(rng.uniform(0.3, 1.0)))
            rows["duration"].append(duration)
            rows["offset"].append(seg_offset)
            rows["word_timing_str"].append(str([
                {"Word": w, "Offset": o, "Duration": d}
                for w, o, d in zip(words, w_off, w_dur)]))
            wt_words.extend(words)
            wt_offsets.extend(w_off)
            wt_durations.extend(w_dur)
            wt_lengths.append(k)
    offsets = np.zeros(len(wt_lengths) + 1, dtype=np.int32)
    np.cumsum(wt_lengths, out=offsets[1:])
    wt = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.StructArray.from_arrays(
            [pa.array(wt_words, type=pa.string()),
             pa.array(wt_offsets, type=pa.int64()),
             pa.array(wt_durations, type=pa.int64())],
            names=["Word", "Offset", "Duration"]))
    return pa.table({
        "audio_file_id": pa.array(rows["audio_file_id"]),
        "segment_number": pa.array(rows["segment_number"],
                                   type=pa.int32()),
        "text": pa.array(rows["text"]),
        "text_basic": pa.array(rows["text_basic"]),
        "confidence": pa.array(rows["confidence"], type=pa.float64()),
        "duration": pa.array(rows["duration"], type=pa.int64()),
        "offset": pa.array(rows["offset"], type=pa.int64()),
        "word_timing": wt,
        "word_timing_str": pa.array(rows["word_timing_str"]),
    })


# ---------------------------------------------------------------------------
# Derivation from driver testdata (documents.parquet) — streaming, Ray-side.
# ---------------------------------------------------------------------------

def _token_ids_arrow(words: pa.Array) -> np.ndarray:
    """Stable FNV-1a of each word (vectorized over the flat byte buffer),
    mod VOCAB → int32 token ids."""
    from .stages.partition import _stable_hash_strings
    if len(words) == 0:
        return np.zeros(0, dtype=np.int32)
    return (_stable_hash_strings(words) % np.uint64(VOCAB)).astype(np.int32)


def doc_ts(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic event time for a doc id: ``EPOCH + id·60 s`` plus a 2 h
    bonus after every 101st global doc — strictly monotone in ``doc_id`` (so
    monotone within every source) with variable inter-document gaps, making
    gap-sessionization non-trivial at any scale factor."""
    d = doc_ids.astype(np.int64)
    return (EPOCH_US + d * 60_000_000 +
            (d // 101 + 1) * 7_200_000_000)


def tokenize_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id:int64, text, source, …) → canonical tokens table.

    Pure function of the row (no RNG); ``ts`` from :func:`doc_ts`. Fully
    vectorized: Arrow whitespace split → flat word array → one vectorized
    FNV pass over the byte buffer (no Python loop over words)."""
    import pyarrow.compute as pc
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    # trim first: Arrow split emits boundary empties, Python .split() not;
    # after trimming the only empty token is the empty-document case
    trimmed = pc.utf8_trim_whitespace(batch["text"])
    words = pc.utf8_split_whitespace(trimmed)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat_all = words.flatten()
    keep = pc.not_equal(flat_all, pa.scalar(""))
    flat_words = flat_all.filter(keep)
    lengths = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    empty_doc = pc.equal(pc.utf8_length(trimmed), pa.scalar(0)).to_numpy(
        zero_copy_only=False)
    lengths = np.where(empty_doc, 0, lengths)
    flat = _token_ids_arrow(flat_words)
    ts = doc_ts(doc_ids)
    return pa.table({
        "doc_id": pa.array([f"d{int(i):08d}" for i in doc_ids],
                           type=pa.string()),
        "tokens": _list_array(flat, lengths),
        "n_tok": pa.array(lengths.astype(np.int32)),
        "source": batch["source"],
        "ts": pa.array(ts.astype(np.int64), type=pa.timestamp("us")),
    })


def tokens_from_documents(sf_dir: str, num_blocks: int = 32,
                          repeat: int = 1):
    """Stream ``{sf_dir}/documents.parquet`` into the canonical tokens table
    (lazy Ray Dataset; no materialization).

    Ray auto-splits even a one-row-group parquet read into ~64 blocks
    (``ReadParquet->SplitBlocks``), so downstream maps parallelize without
    an explicit repartition — an extra all-to-all costs ~3.5 s of fixed
    coordination per run regardless of CPU count (measured; see
    BENCH notes in BASELINE.md).

    ``repeat`` > 1 deterministically amplifies the corpus for benchmarks:
    copy r of doc d gets ``doc_id' = d + r·N`` (N = a fixed stride above
    the corpus size) AND ``source' = source#r`` — each replica is a fresh
    set of entities, so entity-parallelism grows with the data exactly as
    a real sharded corpus's would (R× rows, R× sources, zero RNG)."""
    return amplified_documents(sf_dir, repeat).map_batches(
        tokenize_documents_batch, batch_format="pyarrow")


def amplified_documents(sf_dir: str, repeat: int = 1):
    """The documents table, deterministically amplified ``repeat``× (same
    id-stride / source-suffix scheme as :func:`tokens_from_documents`) —
    shared by the dedup/text-analysis bench entries."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    if repeat > 1:
        n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        stride = 1 << (int(np.ceil(np.log2(max(n_docs, 2)))))

        def amplify(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            parts = []
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            for r in range(repeat):
                src = batch["source"] if r == 0 else \
                    pc.binary_join_element_wise(
                        batch["source"], pa.scalar(f"r{r}"), "#")
                parts.append(pa.table({
                    "doc_id": pa.array(ids + r * stride),
                    "text": batch["text"],
                    "source": src,
                }))
            return pa.concat_tables(parts)

        ds = ds.map_batches(amplify, batch_format="pyarrow")
    return ds


def amplified_embeddings(sf_dir: str, repeat: int = 1):
    """The embeddings table, deterministically amplified ``repeat``×:
    copy ``r`` shifts vec_id by ``r·stride`` and adds a small hash-derived
    per-(copy, vector, dim) offset so copies are DISTINCT vectors — exact
    duplicates would make every quantized top-k a massive tie set, which
    benchmarks the tie handling instead of the scan."""
    import pyarrow.parquet as _pq
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    if repeat <= 1:
        return ds
    n = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    stride = 1 << (int(np.ceil(np.log2(max(n, 2)))))

    def amplify(batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(batch) if len(batch) else 0
        x = flat.reshape(len(batch), dim).astype(np.float32)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        key = (ids[:, None] * np.int64(dim)
               + np.arange(dim, dtype=np.int64)[None])
        parts = []
        for r in range(repeat):
            off = ((key + r * np.int64(2654435761)) % 997) \
                .astype(np.float32) / 997.0 * 0.05
            parts.append(pa.table({
                "vec_id": pa.array(ids + r * stride),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array((x + off).reshape(-1)), dim),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(amplify, batch_format="pyarrow")


def updates_from_documents(sf_dir: str, every: int = 5, repeat: int = 1):
    """Sparse right side for the flagship as-of join, derived from the same
    documents: ~1/``every`` of docs (picked by a multiplicative hash so the
    picks spread over ALL sources, not aliasing with the source round-robin)
    emit one update at ``ts − 30 s`` with a deterministic attr payload.
    ``repeat`` mirrors :func:`tokens_from_documents`."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    if repeat > 1:
        n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        stride = 1 << (int(np.ceil(np.log2(max(n_docs, 2)))))

    def derive(batch: pa.Table) -> pa.Table:
        base_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if repeat > 1:
            ids = np.concatenate([base_ids + r * stride
                                  for r in range(repeat)])
            base_src = np.asarray(batch["source"].to_pylist())
            src = np.concatenate(
                [base_src if r == 0 else
                 np.char.add(base_src, f"#r{r}") for r in range(repeat)])
            batch = pa.table({"doc_id": pa.array(ids),
                              "source": pa.array(src, type=pa.string())})
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = (doc_ids.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        h = h ^ (h >> np.uint64(16))
        keep = h % np.uint64(every) == 0
        doc_ids = doc_ids[keep]
        src = batch["source"].to_numpy(zero_copy_only=False)[keep]
        ts = doc_ts(doc_ids) - 30_000_000
        vals = ((doc_ids * 2654435761) % 1000).astype(np.float64) / 10.0
        return pa.table({
            "source": pa.array(src, type=pa.string()),
            "ts": pa.array(ts.astype(np.int64), type=pa.timestamp("us")),
            "attr_val": pa.array(vals, type=pa.float64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return ds.map_batches(derive, batch_format="pyarrow")
