"""End-to-end training-shard pipeline (pipelines/training_shards.py):
real sf0.001 documents through quality gates → mixture weights →
per-domain token quotas → packing → resumable range-sharded write.
Checks determinism (two fresh builds byte-agree), resume (second run
with the same fingerprint skips every shard), per-domain budget
enforcement, shard-range layout, and the stream-contiguity invariant
of the packed output."""
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.pipelines.training_shards import (
    make_training_shards, read_shards)

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])


@pytest.fixture()
def outdirs(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    yield a, b
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


def test_build_resume_and_determinism(ray_session, outdirs):
    out_a, out_b = outdirs
    kw = dict(input_fingerprint="t1", seq_len=64, token_budget=5000,
              alpha=0.5, seed=7, chunks_per_shard=8)
    r1 = make_training_shards(_docs(), out_a, **kw)
    assert r1["n_sampled_docs"] > 0 and r1["n_chunks"] > 0
    assert r1["n_shards"] == -(-r1["n_chunks"] // 8)
    assert sorted(r1["written"]) == list(range(r1["n_shards"]))
    assert r1["skipped"] == []

    # resume: same fingerprint -> every shard skipped, nothing rewritten
    r2 = make_training_shards(_docs(), out_a, **kw)
    assert r2["written"] == []
    assert sorted(r2["skipped"]) == list(range(r1["n_shards"]))

    # determinism: independent build in a fresh dir agrees row-for-row
    make_training_shards(_docs(), out_b, **kw)
    ta = read_shards(out_a).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    tb = read_shards(out_b).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert ta.equals(tb)

    # packed stream is contiguous: sorted by tok_start, each doc starts
    # where the previous ended, and chunk ids follow from offsets
    s = ta.sort_values("tok_start").reset_index(drop=True)
    ends = s["tok_start"] + s["n_tok"]
    assert (s["tok_start"].iloc[1:].to_numpy()
            == ends.iloc[:-1].to_numpy()).all()
    assert (s["chunk_first"] == s["tok_start"] // 64).all()
    assert (s["chunk_last"] == (ends - 1) // 64).all()
    # shard = contiguous chunk range
    assert (s["shard_id"] == s["chunk_first"] // 8).all()
    assert int(ends.iloc[-1]) == r1["n_tokens"]


def test_budgets_enforced_per_domain(ray_session, outdirs):
    out_a, _ = outdirs
    r = make_training_shards(_docs(), out_a, input_fingerprint="t2",
                             seq_len=32, token_budget=2000, alpha=0.3,
                             seed=1, chunks_per_shard=16)
    t = read_shards(out_a).to_pandas()
    w = r["weights"].set_index("source")
    got = t.groupby("source")["n_tok"].sum()
    for src, tot in got.items():
        assert tot <= int(np.floor(w.loc[src, "sampled_tokens"])), src
    # alpha < 1 upsamples small domains: weights sum to 1
    assert abs(w["weight"].sum() - 1.0) < 1e-12


def test_fingerprint_change_recomputes(ray_session, outdirs):
    out_a, _ = outdirs
    kw = dict(seq_len=64, token_budget=3000, alpha=0.5, seed=7,
              chunks_per_shard=8)
    r1 = make_training_shards(_docs(), out_a, input_fingerprint="v1",
                              **kw)
    r2 = make_training_shards(_docs(), out_a, input_fingerprint="v2",
                              **kw)
    # new fingerprint: all shards rewritten, none credited
    assert sorted(r2["written"]) == list(range(r1["n_shards"]))
    assert r2["skipped"] == []


def test_empty_pool(ray_session, outdirs):
    out_a, _ = outdirs
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string())}))
    r = make_training_shards(empty, out_a, input_fingerprint="e",
                             token_budget=100)
    assert r["n_shards"] == 0 and r["written"] == []


def test_dedup_stage_drops_duplicate_mass(ray_session, outdirs):
    out_a, out_b = outdirs
    # plant exact duplicates: the corpus twice under one source
    base = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    import pyarrow.compute as pc

    def dup(t):
        d2 = pa.table({"doc_id": pc.add(t["doc_id"], 1_000_000),
                       "text": t["text"], "source": t["source"]})
        return pa.concat_tables([t, d2])

    doubled = base.map_batches(dup, batch_format="pyarrow")
    kw = dict(seq_len=64, token_budget=1_000_000_000, alpha=1.0,
              seed=7, chunks_per_shard=64, gopher_gate=False)
    r_plain = make_training_shards(doubled, out_a,
                                   input_fingerprint="dp", **kw)
    r_dedup = make_training_shards(doubled, out_b,
                                   input_fingerprint="dd",
                                   dedup="exact", **kw)
    # exact dedup halves the pool (every doc has exactly one copy)
    assert r_dedup["n_sampled_docs"] * 2 == r_plain["n_sampled_docs"]
    # min-id representative survives: original ids, not the +1M copies
    t = read_shards(out_b).to_pandas()
    assert (t["doc_id"] < 1_000_000).all()
    with pytest.raises(ValueError):
        make_training_shards(doubled, out_a, input_fingerprint="x",
                             dedup="bogus")


def test_token_native_shards_and_sequence_reader(ray_session, outdirs):
    from feature_extraction_ray import fixtures as FX
    from feature_extraction_ray.pipelines.training_shards import (
        read_training_sequences)
    out_a, _ = outdirs
    toks = FX.tokens_from_documents(SF)
    seq_len, cps = 64, 8
    r = make_training_shards(toks, out_a, input_fingerprint="tok1",
                             seq_len=seq_len, token_budget=20_000,
                             alpha=1.0, seed=3, chunks_per_shard=cps,
                             gopher_gate=False, tokens_col="tokens")
    assert r["n_chunks"] > cps            # several shards
    # read every shard; sequences concatenate to the exact token stream
    mats, tail = [], None
    for s in range(r["n_shards"]):
        m, t = read_training_sequences(out_a, s, seq_len=seq_len,
                                       chunks_per_shard=cps)
        mats.append(m)
        tail = t
    stream = np.concatenate([m.reshape(-1) for m in mats] + [tail])
    assert len(stream) == r["n_tokens"]
    # ground truth: the sampled docs' token arrays in pack (doc_id)
    # order — bit-exact int32 equality, the north-rule invariant
    shard_tbl = read_shards(out_a).to_pandas().sort_values("doc_id")
    exp = np.concatenate(
        [np.asarray(v, dtype=np.int32) for v in shard_tbl["tokens"]])
    assert np.array_equal(stream, exp)
    # shard matrices have full rows everywhere, tail < seq_len
    assert all(m.shape[1] == seq_len for m in mats if len(m))
    assert len(tail) < seq_len
    # text-only stages refuse token mode
    with pytest.raises(ValueError):
        make_training_shards(toks, out_a, input_fingerprint="x",
                             tokens_col="tokens")
