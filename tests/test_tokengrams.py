"""Token-native n-gram ops (stages/tokengrams.py) vs exact tuple-based
naives — repetition stats, repetition filter, decontamination; short-doc
and empty-doc conventions; k=2 collision-free packing."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from feature_extraction_ray.stages.tokengrams import (
    token_decontaminate, token_repetition_filter, token_repetition_stats,
    token_shingles_of_batch)


def _naive_grams(toks, k):
    if not toks:
        return []
    if len(toks) < k:
        return [tuple(toks)]
    return [tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _corpus():
    docs = {
        "a": [5, 7] * 40,            # heavy 2-gram repetition
        "b": [3] * 25,               # constant run
        "c": [9],                    # short (len 1)
        "d": [11, 12],               # len 2
        "e": [],                     # empty -> no row
        "f": [1, 2, 3, 4, 5, 1, 2, 3, 9, 1, 2],
        "g": list(range(100, 160)),  # all-distinct grams
    }
    return docs, pa.table({
        "doc_id": pa.array(list(docs), type=pa.string()),
        "tokens": pa.array(list(docs.values()),
                           type=pa.list_(pa.int32())),
    })


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_repetition_stats_matches_naive(ray_session, k):
    docs, tbl = _corpus()
    out = token_repetition_stats(rd.from_arrow(tbl), "tokens",
                                 ("doc_id",), k=k).to_pandas()
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.max_count)
           for r in out.itertuples()}
    exp = {}
    for d, toks in docs.items():
        grams = _naive_grams(toks, k)
        if not grams:
            continue
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        exp[d] = (len(grams), len(counts), max(counts.values()))
    assert got == exp


def test_repetition_filter_gates_planted_docs(ray_session):
    _, tbl = _corpus()
    kept = token_repetition_filter(
        rd.from_arrow(tbl), "tokens", k=2, max_dup_pct=30,
        max_top_pct=30).to_pandas()["doc_id"].tolist()
    # a: dup frac 77/79, top 40/79 -> out. b: dup 23/24 -> out.
    # c, d: single gram => dup 0 but top 100% -> out. e: no grams -> out.
    # f: 10 grams, 7 distinct (dup 30%), top (1,2)x3 = 30% -> kept
    #    (both gates exactly at the boundary — <= semantics pinned).
    # g: all distinct, top 1/59 -> kept.
    assert sorted(kept) == ["f", "g"]


@pytest.mark.parametrize("k", [2, 3])
def test_decontaminate_matches_naive(ray_session, k):
    docs, tbl = _corpus()
    ev = {
        "e0": [5, 7, 5],              # overlaps a (k=3) / a (k=2)
        "e1": [1, 2, 3],              # overlaps f
        "e2": [40001, 40002, 40003],  # out of corpus
        "e3": [9],                    # short eval: matches short doc c
    }
    ev_tbl = pa.table({
        "eval_id": pa.array(list(ev), type=pa.string()),
        "tokens": pa.array(list(ev.values()), type=pa.list_(pa.int32())),
    })
    out = token_decontaminate(rd.from_arrow(tbl), rd.from_arrow(ev_tbl),
                              "tokens", k=k).to_pandas()
    eval_grams = set()
    for toks in ev.values():
        eval_grams |= set(_naive_grams(toks, k))
    got = {r.doc_id: (r.n_overlap, r.keep) for r in out.itertuples()}
    exp = {d: (len(set(_naive_grams(t, k)) & eval_grams),
               len(set(_naive_grams(t, k)) & eval_grams) == 0)
           for d, t in docs.items()}
    assert got == exp
    # the planted hits actually hit
    assert got["a"][0] >= 1 and got["f"][0] >= 1 and got["c"][0] == 1
    assert got["g"] == (0, True)


def test_k2_packing_is_order_sensitive_and_collision_free():
    tbl = pa.table({
        "doc_id": pa.array(["x", "y", "z"], type=pa.string()),
        "tokens": pa.array([[1, 2], [2, 1], [1, 2]],
                           type=pa.list_(pa.int32())),
    })
    sh, offsets = token_shingles_of_batch(tbl, "tokens", 2)
    assert list(offsets) == [0, 1, 2, 3]
    assert sh[0] != sh[1]      # (1,2) != (2,1)
    assert sh[0] == sh[2]      # identical grams pack identically
    # negative ids bias correctly (full int32 domain)
    tbl2 = pa.table({
        "doc_id": pa.array(["n"], type=pa.string()),
        "tokens": pa.array([[-5, -5, 3]], type=pa.list_(pa.int32())),
    })
    sh2, off2 = token_shingles_of_batch(tbl2, "tokens", 2, unique=False)
    assert len(sh2) == 2 and sh2[0] != sh2[1]


def _naive_remove_spans(docs, k, min_docs, keep_canonical=False):
    """Exact tuple-based reference for remove_duplicate_token_spans."""
    occ = {}  # gram -> list[(doc_id, pos)]
    for d, toks in docs.items():
        for i in range(max(len(toks) - k + 1, 0)):
            occ.setdefault(tuple(toks[i:i + k]), []).append((d, i))
    cover = {d: set() for d in docs}
    for g, lst in occ.items():
        if len({d for d, _ in lst}) < min_docs:
            continue
        lst = sorted(lst)
        spare = lst[0] if keep_canonical else None
        for d, i in lst:
            if (d, i) == spare:
                continue
            cover[d].update(range(i, i + k))
    out = {}
    for d, toks in docs.items():
        kept = [t for i, t in enumerate(toks) if i not in cover[d]]
        out[d] = (kept, len(kept), len(toks) - len(kept))
    return out


@pytest.mark.parametrize("min_docs,keep_canonical",
                         [(2, False), (2, True), (3, False)])
def test_remove_duplicate_token_spans_matches_naive(
        ray_session, min_docs, keep_canonical):
    from feature_extraction_ray.stages.tokengrams import (
        remove_duplicate_token_spans)
    A = [500, 501, 502, 503]
    docs = {
        "d1": list(range(101, 115)) + A + list(range(30, 38)),
        "d2": list(range(60, 66)) + A,
        "d3": [7, 8, 9, 7, 8, 9, 7, 8, 9],   # within-doc only
        "d4": A,                              # fully duplicated
        "d5": [900, 901],                     # sub-k
        "d6": A + [777] + A,                  # two occurrences, one doc
        "d7": [],
    }
    tbl = pa.table({
        "doc_id": pa.array(list(docs), type=pa.string()),
        "tokens": pa.array(list(docs.values()),
                           type=pa.list_(pa.int32())),
    })
    out = remove_duplicate_token_spans(
        rd.from_arrow(tbl), "tokens", "doc_id", k=3,
        min_docs=min_docs, keep_canonical=keep_canonical,
        num_buckets=4).to_pandas()
    got = {r.doc_id: (list(r.tokens), r.n_tok_clean, r.n_removed)
           for r in out.itertuples()}
    exp = _naive_remove_spans(docs, 3, min_docs, keep_canonical)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == exp[d], (d, got[d], exp[d])
    if min_docs == 2 and not keep_canonical:
        assert got["d4"][0] == []          # emptied, not dropped
        assert got["d3"] == (docs["d3"], 9, 0)  # within-doc untouched
    if keep_canonical and min_docs == 2:
        # every dup gram's lexicographically-first occurrence is in d1
        # ("d1" sorts first and holds A), so d1 loses nothing
        assert got["d1"][2] == 0
        assert got["d4"][1] == 0  # later copies still emptied


def test_token_surprisal_matches_naive(ray_session):
    import math
    from feature_extraction_ray.stages.tokengrams import (
        fit_token_unigram_lm, token_surprisal_scores)
    docs = {"a": [1, 1, 2], "b": [2, 3], "c": [1], "d": []}
    tbl = pa.table({
        "doc_id": pa.array(list(docs), type=pa.string()),
        "tokens": pa.array(list(docs.values()),
                           type=pa.list_(pa.int32())),
    })
    out = token_surprisal_scores(rd.from_arrow(tbl)).to_pandas()
    # counts: 1->3, 2->2, 3->1 over total 6
    cnt, total = {1: 3, 2: 2, 3: 1}, 6
    exp = {d: (len(t), sum(math.log(cnt[x] / total) for x in t))
           for d, t in docs.items() if t}
    got = {r.doc_id: (r.n_tok, r.sum_logprob) for r in out.itertuples()}
    assert set(got) == set(exp)          # zero-token doc dropped
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert abs(got[d][1] - exp[d][1]) < 1e-12

    # top_k cap: only token 1 in-vocab; others score at floor ln(1/6)
    lm = fit_token_unigram_lm(rd.from_arrow(tbl), top_k=1)
    assert list(lm["tokens"]) == [1]
    out2 = token_surprisal_scores(rd.from_arrow(tbl), lm=lm).to_pandas()
    got2 = {r.doc_id: r.sum_logprob for r in out2.itertuples()}
    floor = math.log(1 / 6)
    assert abs(got2["b"] - 2 * floor) < 1e-12
    assert abs(got2["a"] - (2 * math.log(3 / 6) + floor)) < 1e-12


def test_token_minhash_dedup_finds_planted_near_dups(ray_session):
    from feature_extraction_ray.stages.tokengrams import (
        token_minhash_lsh_dedup, token_minhash_signatures)
    rng = np.random.default_rng(11)
    base = rng.integers(0, 32000, size=(20, 60)).astype(np.int32)
    docs = [list(r) for r in base]
    # near-dups of docs 2 and 7: perturb 3 of 60 positions
    for src in (2, 7):
        t = list(base[src])
        for p in (5, 25, 45):
            t[p] = int(t[p]) ^ 1
        docs.append(t)
    # exact copy of doc 4
    docs.append(list(base[4]))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    out = token_minhash_lsh_dedup(rd.from_arrow(tbl), threshold=0.5,
                                  shingle_k=3, output="pandas")
    c = out.set_index("doc_id")["cluster_id"]
    assert c[20] == 2 and c[21] == 7 and c[22] == 4
    dup = out.set_index("doc_id")["is_duplicate"]
    assert bool(dup[20]) and bool(dup[21]) and bool(dup[22])
    assert not dup[[i for i in range(20) if i not in (2, 4, 7)]].any()
    # token store never mixes with a word-gram store: scheme differs
    from feature_extraction_ray.stages.dedup import (
        MinHasher, _scheme_id)
    sig = token_minhash_signatures(rd.from_arrow(tbl), shingle_k=3)
    row = sig.take(1)[0]
    assert row["sig_scheme"] != _scheme_id(
        MinHasher.SCHEME_FAMILY, 128, 16, 3, 7)


def test_token_simhash_dedup_finds_planted_near_dups(ray_session):
    from feature_extraction_ray.stages.tokengrams import (
        token_simhash_dedup, token_simhash_signatures)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 32000, size=(12, 200)).astype(np.int32)
    docs = [list(r) for r in base]
    docs.append(list(base[3]))                 # exact copy -> hamming 0
    t8 = list(base[8])
    t8[100] = int(t8[100]) ^ 3                 # 1-token edit (ham 2, pinned)
    docs.append(t8)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    out = token_simhash_dedup(rd.from_arrow(tbl), max_hamming=3,
                              output="pandas")
    c = out.set_index("doc_id")
    assert c.loc[12, "cluster_id"] == 3 and bool(c.loc[12, "is_duplicate"])
    assert c.loc[13, "cluster_id"] == 8 and bool(c.loc[13, "is_duplicate"])
    assert not c.loc[:11, "is_duplicate"].drop([3, 8]).any()
    # scheme differs from the word family (loud-mismatch contract)
    from feature_extraction_ray.stages.dedup import SIMHASH_SCHEME
    row = token_simhash_signatures(rd.from_arrow(tbl)).take(1)[0]
    assert row["sig_scheme"] != SIMHASH_SCHEME


def test_token_profile_edge_cases(ray_session):
    from feature_extraction_ray.stages.tokengrams import token_profile
    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "e"], type=pa.string()),
        "tokens": pa.array([[5, 5, 7], [], None, [7, 5], [9]],
                           type=pa.list_(pa.int32())),
    })
    p = token_profile(rd.from_arrow(tbl)).iloc[0]
    assert p["n_docs"] == 5 and p["n_empty_docs"] == 2
    assert p["n_tokens"] == 6
    assert p["min_len"] == 1 and p["max_len"] == 3
    # non-empty lens sorted = [1,2,3], quantile_disc(0.5) -> index
    # ceil(3/2)=2 (1-based) -> 2
    assert p["median_len"] == 2
    assert p["vocab_size"] == 3
    # counts: 5->3, 7->2, 9->1 -> top 5
    assert p["top_token"] == 5 and p["top_count"] == 3
    # tie-break: equal counts -> smallest token id
    tbl2 = pa.table({
        "doc_id": pa.array(["a"], type=pa.string()),
        "tokens": pa.array([[9, 3, 9, 3]], type=pa.list_(pa.int32())),
    })
    p2 = token_profile(rd.from_arrow(tbl2)).iloc[0]
    assert p2["top_token"] == 3 and p2["top_count"] == 2


def test_token_chunks_matches_naive(ray_session):
    from feature_extraction_ray.stages.tokengrams import token_chunks
    docs = {"a": list(range(20)), "b": [1, 2, 3], "c": [], "d": [7] * 8,
            "e": list(range(100, 117))}  # 17 = 2 full + 1 short at w=8,s=8
    tbl = pa.table({
        "doc_id": pa.array(list(docs), type=pa.string()),
        "tokens": pa.array(list(docs.values()),
                           type=pa.list_(pa.int32())),
    })
    for window, stride, drop_last in [(8, 4, False), (8, 8, False),
                                      (8, 8, True), (5, 3, True)]:
        out = token_chunks(rd.from_arrow(tbl), window=window,
                           stride=stride, drop_last=drop_last).to_pandas()
        got = {(r.doc_id, r.chunk_idx): (list(r.tokens), r.n_tok)
               for r in out.itertuples()}
        exp = {}
        for d, toks in docs.items():
            ci = 0
            for s in range(0, max(len(toks), 0), stride):
                w = toks[s:s + window]
                if drop_last and len(w) < window and ci > 0:
                    ci += 1
                    continue
                exp[(d, ci)] = (w, len(w))
                ci += 1
        assert got == exp, (window, stride, drop_last)


def test_remap_token_ids_policies(ray_session):
    from feature_extraction_ray.stages.tokengrams import remap_token_ids
    tbl = pa.table({
        "doc_id": pa.array(["a", "b"], type=pa.string()),
        "tokens": pa.array([[1, 2, 3], [2, 9]], type=pa.list_(pa.int32())),
    })
    m = {1: 10, 2: 20, 3: 30}
    # 9 is unmapped: with neither policy the pipeline must fail loudly
    with pytest.raises(Exception, match="no mapping"):
        remap_token_ids(rd.from_arrow(tbl), m).to_pandas()
    out2 = remap_token_ids(rd.from_arrow(tbl), m, unk_id=-1).to_pandas()
    got2 = {r.doc_id: list(r.tokens) for r in out2.itertuples()}
    assert got2 == {"a": [10, 20, 30], "b": [20, -1]}
    out3 = remap_token_ids(rd.from_arrow(tbl), m,
                           drop_unmapped=True).to_pandas()
    got3 = {r.doc_id: list(r.tokens) for r in out3.itertuples()}
    assert got3 == {"a": [10, 20, 30], "b": [20]}
    # dense-array mapping form
    arr = np.full(16, -5, dtype=np.int64)
    arr[1], arr[2], arr[3], arr[9] = 11, 22, 33, 99
    out4 = remap_token_ids(rd.from_arrow(tbl), arr).to_pandas()
    got4 = {r.doc_id: list(r.tokens) for r in out4.itertuples()}
    assert got4 == {"a": [11, 22, 33], "b": [22, 99]}


def test_null_token_list_counts_as_empty(ray_session):
    tbl = pa.table({
        "doc_id": pa.array(["a", "b"], type=pa.string()),
        "tokens": pa.array([[1, 2, 3], None], type=pa.list_(pa.int32())),
    })
    out = token_repetition_stats(rd.from_arrow(tbl), "tokens",
                                 ("doc_id",), k=2).to_pandas()
    assert out["doc_id"].tolist() == ["a"]
    assert out["n_grams"].tolist() == [2]


def test_span_removal_checkpointed_resume_identical(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from feature_extraction_ray.stages.tokengrams import (
        remove_duplicate_token_spans,
        remove_duplicate_token_spans_checkpointed)
    from feature_extraction_ray.state import checkpoint as CP

    A = [500, 501, 502, 503, 504, 505, 506, 507]
    rng = np.random.default_rng(9)
    docs = {f"d{i:03d}": [int(x) for x in
                          rng.integers(1000, 32000, size=40)]
            for i in range(30)}
    docs["d003"] = docs["d003"][:10] + A + docs["d003"][10:]
    docs["d007"] = A + docs["d007"][:20]
    docs["d011"] = docs["d011"][:5] + A + docs["d011"][5:15] + A
    src = tmp_path / "toks.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), type=pa.string()),
        "tokens": pa.array(list(docs.values()),
                           type=pa.list_(pa.int32())),
    }), src)
    kw = dict(k=8, min_docs=2, occ_buckets=6, rebuild_buckets=4)

    ref_dir = str(tmp_path / "ref")
    s1 = remove_duplicate_token_spans_checkpointed(str(src), ref_dir, **kw)
    assert s1["rebuild"]["rows"] == 30
    ref = CP.read_result(os.path.join(ref_dir, "rebuild")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # parity with the non-checkpointed pipeline
    import ray.data as rd
    direct = remove_duplicate_token_spans(
        rd.read_parquet(str(src)), k=8, min_docs=2,
        num_buckets=4).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert ref["doc_id"].tolist() == direct["doc_id"].tolist()
    assert ref["n_removed"].tolist() == direct["n_removed"].tolist()
    assert [list(t) for t in ref["tokens"]] == \
        [list(t) for t in direct["tokens"]]
    assert ref.set_index("doc_id").loc["d003", "n_removed"] == 8
    assert ref.set_index("doc_id").loc["d011", "n_removed"] == 16

    # crash simulation: kill buckets in both stages
    out_dir = str(tmp_path / "out")
    remove_duplicate_token_spans_checkpointed(str(src), out_dir, **kw)
    for f in sorted(glob.glob(os.path.join(out_dir, "occ",
                                           "part-0000[0-1]*"))):
        os.remove(f)
    for f in glob.glob(os.path.join(out_dir, "rebuild", "*")):
        os.remove(f)
    s2 = remove_duplicate_token_spans_checkpointed(str(src), out_dir, **kw)
    assert s2["occ"]["written"] == [0, 1]
    assert len(s2["rebuild"]["written"]) == 4
    got = CP.read_result(os.path.join(out_dir, "rebuild")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(ref)

    # a third run is a complete no-op in both stages
    s3 = remove_duplicate_token_spans_checkpointed(str(src), out_dir, **kw)
    for stage in ("occ", "rebuild"):
        assert s3[stage]["written"] == [] and s3[stage]["rows"] == 0
    # a parameter change invalidates (fingerprints differ)
    s4 = remove_duplicate_token_spans_checkpointed(
        str(src), out_dir, k=8, min_docs=3, occ_buckets=6,
        rebuild_buckets=4)
    assert len(s4["occ"]["written"]) == 6


# ------------------------------------------------------- bigram surprisal

def _tok_ds(rows):
    import pyarrow as _pa
    import ray.data as _rd
    return _rd.from_arrow(_pa.table({
        "doc_id": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))


def test_token_bigram_surprisal_naive_parity():
    import math
    from collections import Counter
    from feature_extraction_ray.stages.tokengrams import (
        token_bigram_surprisal)
    rows = [(1, [5, 7, 5, 7, 9]), (2, [7, 5, 7]), (3, [9]), (4, [])]
    out = token_bigram_surprisal(_tok_ds(rows)).to_pandas() \
        .set_index("doc_id").sort_index()
    # docs with < 2 tokens dropped
    assert sorted(out.index) == [1, 2]
    pairs = [(a, b) for _, t in rows for a, b in zip(t, t[1:])]
    pc_ = Counter(pairs)
    cc = Counter(a for a, _ in pairs)
    for did, toks in rows[:2]:
        want = sum(math.log(pc_[(a, b)] / cc[a])
                   for a, b in zip(toks, toks[1:]))
        got = out.loc[did]
        assert got["n_pairs"] == len(toks) - 1
        assert abs(got["sum_logprob"] - want) < 1e-12


def test_token_bigram_topk_floor():
    import math
    from feature_extraction_ray.stages.tokengrams import (
        fit_token_bigram_lm, token_bigram_surprisal)
    # (5,7) x3 dominates; top_k=1 keeps only it, (7,5) pairs hit the
    # -ln(total_pairs) floor
    rows = [(1, [5, 7, 5, 7, 5, 7])]
    lm = fit_token_bigram_lm(_tok_ds(rows), top_k=1)
    assert len(lm["keys"]) == 1 and lm["total"] == 5
    out = token_bigram_surprisal(_tok_ds(rows), lm=lm).to_pandas()
    # 3 kept pairs at ln(3/3)=0, 2 floored at -ln(5)
    want = 3 * math.log(3 / 3) + 2 * (-math.log(5))
    assert abs(out.loc[0, "sum_logprob"] - want) < 1e-12


# ------------------------------------------------------- token dropout

def test_augment_token_dropout_properties():
    from feature_extraction_ray.stages.tokengrams import (
        augment_token_dropout)
    rows = [(7, list(range(100, 160))), (8, [5]), (9, [])]
    import pyarrow as _pa
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))
    out = augment_token_dropout(ds, rate_pct=20, seed=1).to_pandas() \
        .set_index("did").sort_index()
    # naive mask parity
    for did, toks in rows:
        want = [tv for p, tv in enumerate(toks)
                if ((did % (1 << 20)) * 2654435761 + (p + 1) * 40503
                    + 1 * 1315423911) % (1 << 32) % 100 >= 20]
        assert list(out.loc[did, "tokens_aug"]) == want
        assert out.loc[did, "n_kept"] == len(want)
    # survivors keep order; empty doc stays empty
    assert out.loc[9, "n_kept"] == 0
    # different seeds give DIFFERENT views (the contrastive-pair use)
    out2 = augment_token_dropout(ds, rate_pct=20, seed=2).to_pandas() \
        .set_index("did").sort_index()
    assert list(out.loc[7, "tokens_aug"]) != list(out2.loc[7, "tokens_aug"])
    # rate 0 keeps everything
    out0 = augment_token_dropout(ds, rate_pct=0).to_pandas() \
        .set_index("did").sort_index()
    assert list(out0.loc[7, "tokens_aug"]) == rows[0][1]


def _naive_t5(did, toks, span_len=3, rate_pm=50, seed=1, base=32000):
    n = len(toks)
    cov = [False] * n
    for p in range(n):
        h = ((did % (1 << 20)) * 2654435761 + (p + 1) * 40503
             + seed * 1315423911) % (1 << 32) % 1000
        if h < rate_pm:
            for q in range(p, min(p + span_len, n)):
                cov[q] = True
    inp, tgt, isl = [], [], -1
    for p in range(n):
        if cov[p] and (p == 0 or not cov[p - 1]):
            isl += 1
            inp.append(base + isl)
            tgt.append(base + isl)
        if cov[p]:
            tgt.append(toks[p])
        else:
            inp.append(toks[p])
    return inp, tgt, isl + 1


def test_corrupt_token_spans_naive_parity():
    import pyarrow as _pa
    from feature_extraction_ray.stages.tokengrams import (
        corrupt_token_spans)
    rows = [(3, list(range(100, 180))), (4, list(range(7))),
            (5, [9]), (6, [])]
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))
    out = corrupt_token_spans(ds, rate_pm=120, span_len=3, seed=1) \
        .to_pandas().set_index("did").sort_index()
    total_spans = 0
    for did, toks in rows:
        inp, tgt, k = _naive_t5(did, toks, rate_pm=120)
        assert list(out.loc[did, "input_tokens"]) == inp, did
        assert list(out.loc[did, "target_tokens"]) == tgt, did
        assert out.loc[did, "n_spans"] == k
        total_spans += k
    assert total_spans > 0          # the rate actually fired
    # reconstruction invariant: merging input's sentinels with target's
    # spans reproduces the original token stream exactly
    for did, toks in rows:
        inp = list(out.loc[did, "input_tokens"])
        tgt = list(out.loc[did, "target_tokens"])
        spans = {}
        cur = None
        for v in tgt:
            if v >= 32000:
                cur = v
                spans[cur] = []
            else:
                spans[cur].append(v)
        rebuilt = []
        for v in inp:
            rebuilt.extend(spans[v] if v >= 32000 else [v])
        assert rebuilt == toks


def test_mask_tokens_mlm_naive_parity():
    import pyarrow as _pa
    from feature_extraction_ray.stages.tokengrams import mask_tokens_mlm
    rows = [(11, list(range(500, 700))), (12, [3]), (13, [])]
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))
    out = mask_tokens_mlm(ds, rate_pm=300, seed=2).to_pandas() \
        .set_index("did").sort_index()
    saw = {"mask": 0, "rand": 0, "keep": 0}
    for did, toks in rows:
        inp, lab = [], []
        for p, tv in enumerate(toks):
            h = ((did % (1 << 20)) * 2654435761 + (p + 1) * 40503
                 + 2 * 1315423911) % (1 << 32)
            if h % 1000 < 300:
                a = (h // 1000) % 10
                if a <= 7:
                    inp.append(32099); saw["mask"] += 1
                elif a == 8:
                    inp.append((h // 10000) % 32000); saw["rand"] += 1
                else:
                    inp.append(tv); saw["keep"] += 1
                lab.append(tv)
            else:
                inp.append(tv)
                lab.append(-100)
        assert list(out.loc[did, "masked_tokens"]) == inp
        assert list(out.loc[did, "labels"]) == lab
        assert out.loc[did, "n_masked"] == sum(v != -100 for v in lab)
    # all three actions exercised at this rate/corpus size
    assert min(saw.values()) > 0
    # input length always equals original length (MLM never drops)
    for did, toks in rows:
        assert len(out.loc[did, "masked_tokens"]) == len(toks)


def test_build_nsp_pairs_naive_parity():
    import pyarrow as _pa
    import pytest
    from feature_extraction_ray.stages.tokengrams import build_nsp_pairs
    rows = [(i, list(range(i * 10, i * 10 + 4 + i % 3)))
            for i in range(1, 9)]
    rows.append((99, [7]))          # 1-token doc: excluded
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))
    out = build_nsp_pairs(ds, neg_rate_pm=500, seed=1).to_pandas() \
        .set_index("did").sort_index()
    elig = [r for r in rows if len(r[1]) >= 2]
    assert sorted(out.index) == sorted(d for d, _ in elig)
    n = len(elig)
    stride = 1 + (1 * 2654435761) % (n - 1)
    by_rank = {i: r for i, r in enumerate(sorted(elig))}
    rank_of = {d: i for i, (d, _) in enumerate(sorted(elig))}
    negs = poss = 0
    for did, toks in elig:
        h = ((did % (1 << 20)) * 2654435761 + 40503
             + 1 * 1315423911) % (1 << 32) % 1000
        neg = h < 500
        mid = len(toks) // 2
        row = out.loc[did]
        assert list(row["tok_a"]) == toks[:mid]
        if neg:
            p_did, p_toks = by_rank[(rank_of[did] + stride) % n]
            assert row["label"] == 0 and p_did != did
            assert list(row["tok_b"]) == p_toks[len(p_toks) // 2:]
            negs += 1
        else:
            assert row["label"] == 1
            assert list(row["tok_b"]) == toks[mid:]
            poss += 1
    assert negs > 0 and poss > 0
    with pytest.raises(ValueError):
        build_nsp_pairs(rd.from_arrow(_pa.table({
            "did": _pa.array([1], type=_pa.int64()),
            "tokens": _pa.array([[1, 2]],
                                type=_pa.list_(_pa.int32()))})))


def test_fim_transform_naive_parity():
    import pyarrow as _pa
    from feature_extraction_ray.stages.tokengrams import fim_transform
    rows = [(21, list(range(900, 930))), (22, [1, 2]), (23, [])]
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "tokens": _pa.array([r[1] for r in rows],
                            type=_pa.list_(_pa.int32()))}))
    out = fim_transform(ds, seed=1).to_pandas() \
        .set_index("did").sort_index()
    for did, toks in rows:
        n = len(toks)
        def h(p):
            return ((did % (1 << 20)) * 2654435761 + p * 40503
                    + 1 * 1315423911) % (1 << 32)
        c1, c2 = h(1) % (n + 1), h(2) % (n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        want = [32001] + toks[:lo] + [32002] + toks[hi:] \
            + [32003] + toks[lo:hi]
        got = list(out.loc[did, "fim_tokens"])
        assert got == want, did
        assert out.loc[did, "n_middle"] == hi - lo
        assert len(got) == n + 3
    # reconstruction: prefix + middle + suffix == original
    for did, toks in rows:
        seq = list(out.loc[did, "fim_tokens"])
        i2, i3 = seq.index(32002), seq.index(32003)
        pre, suf, mid = seq[1:i2], seq[i2 + 1:i3], seq[i3 + 1:]
        assert pre + mid + suf == toks


def test_token_objectives_fuzz_naive_parity():
    """300 random docs (empty / 1-token / long, ids up to 2^40) through
    dropout, MLM and FIM in one Ray call each — bit parity with the
    naive per-doc Python references across every shape."""
    import pyarrow as _pa
    from feature_extraction_ray.stages.tokengrams import (
        augment_token_dropout, fim_transform, mask_tokens_mlm)
    rng = np.random.RandomState(42)
    docs = []
    for i in range(300):
        if i % 17 == 0:
            toks = []
        elif i % 11 == 0:
            toks = [int(rng.randint(0, 32000))]
        else:
            toks = rng.randint(0, 32000,
                               size=rng.randint(2, 120)).tolist()
        did = int(rng.randint(0, 1 << 40))
        docs.append((did * 300 + i, toks))   # unique ids, huge range
    ds = rd.from_arrow(_pa.table({
        "did": _pa.array([d for d, _ in docs], type=_pa.int64()),
        "tokens": _pa.array([t for _, t in docs],
                            type=_pa.list_(_pa.int32()))}))

    def h(did, p, seed):
        return ((did % (1 << 20)) * 2654435761 + p * 40503
                + seed * 1315423911) % (1 << 32)

    drop = augment_token_dropout(ds, rate_pct=25, seed=3).to_pandas() \
        .set_index("did")
    mlm = mask_tokens_mlm(ds, rate_pm=200, seed=4).to_pandas() \
        .set_index("did")
    fim = fim_transform(ds, seed=5).to_pandas().set_index("did")
    for did, toks in docs:
        keep = [tv for p, tv in enumerate(toks)
                if h(did, p + 1, 3) % 100 >= 25]
        assert list(drop.loc[did, "tokens_aug"]) == keep
        inp, lab = [], []
        for p, tv in enumerate(toks):
            hv = h(did, p + 1, 4)
            if hv % 1000 < 200:
                a = (hv // 1000) % 10
                inp.append(32099 if a <= 7 else
                           ((hv // 10000) % 32000 if a == 8 else tv))
                lab.append(tv)
            else:
                inp.append(tv); lab.append(-100)
        assert list(mlm.loc[did, "masked_tokens"]) == inp
        assert list(mlm.loc[did, "labels"]) == lab
        n = len(toks)
        c1, c2 = h(did, 1, 5) % (n + 1), h(did, 2, 5) % (n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        want = [32001] + toks[:lo] + [32002] + toks[hi:] \
            + [32003] + toks[lo:hi]
        assert list(fim.loc[did, "fim_tokens"]) == want


def test_vocab_coverage_hand_computed():
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import vocab_coverage
    # counts: 5→4, 1→3, 9→2, 2→1  (total 10; tie 9 vs none)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "tokens": pa.array([[5, 5, 1, 9], [5, 1, 2, 9], [5, 1]],
                           type=pa.list_(pa.int32()))})
    out = vocab_coverage(rd.from_arrow(docs), ks=(0, 1, 2, 3, 99)) \
        .to_pandas().set_index("k")
    assert out.loc[0].tolist() == [0, 0, 10]
    assert out.loc[1].tolist() == [1, 4, 6]       # top-1 = token 5
    assert out.loc[2].tolist() == [2, 7, 3]       # + token 1
    assert out.loc[3].tolist() == [3, 9, 1]       # + token 9
    assert out.loc[99].tolist() == [4, 10, 0]     # clamped to V=4
    assert list(out.columns) == ["covered_types", "covered_tokens",
                                 "oov_tokens"]


def test_vocab_coverage_tie_break_and_empty():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import vocab_coverage
    # equal counts: rank by token id ascending → top-1 is id 3
    docs = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "tokens": pa.array([[7, 3]], type=pa.list_(pa.int32()))})
    out = vocab_coverage(rd.from_arrow(docs), ks=(1,)).to_pandas()
    assert out["covered_tokens"].tolist() == [1]
    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "tokens": pa.array([], type=pa.list_(pa.int32()))})
    out2 = vocab_coverage(rd.from_arrow(empty), ks=(1, 5)).to_pandas()
    assert out2["covered_tokens"].tolist() == [0, 0]
    assert out2["oov_tokens"].tolist() == [0, 0]
    with pytest.raises(ValueError):
        vocab_coverage(rd.from_arrow(docs), ks=())


def test_token_exact_dedup_planted_copies():
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import token_exact_dedup
    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "e"]),
        "tokens": pa.array([[1, 2, 3], [1, 2, 3], [1, 2], [], []],
                           type=pa.list_(pa.int32()))})
    out = token_exact_dedup(rd.from_arrow(tbl), num_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == ["a", "c", "d"]
    assert out["n_dups"].tolist() == [2, 1, 2]     # [] == [] dedups
    assert out.loc[0, "tokens"].tolist() == [1, 2, 3]
    assert "__tok_key" not in out.columns


def test_token_freq_spectrum_hand_computed():
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import token_freq_spectrum
    # token 5×3, token 1×2, tokens 7,9 ×1 → spectrum {3:1, 2:1, 1:2}
    tbl = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "tokens": pa.array([[5, 5, 1, 7], [5, 1, 9]],
                           type=pa.list_(pa.int32()))})
    out = token_freq_spectrum(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("cnt").reset_index(drop=True)
    assert out["cnt"].tolist() == [1, 2, 3]
    assert out["n_types"].tolist() == [2, 1, 1]
    assert out["n_tokens"].tolist() == [2, 2, 3]
    assert int(out["n_tokens"].sum()) == 7         # total stream mass


def test_fuzz_vocab_ops_vs_counter():
    """Random corpora (empty / 1-token / long docs, ids to int32 max)
    through vocab_coverage, token_freq_spectrum and token_exact_dedup,
    compared against Counter/dict references."""
    from collections import Counter

    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import (
        token_exact_dedup, token_freq_spectrum, vocab_coverage)
    rng = np.random.default_rng(911)
    pool = np.concatenate([rng.integers(0, 50, 150),
                           rng.integers(0, 2**31 - 1, 20)])
    docs, toks = [], []
    for i in range(250):
        n = int(rng.choice([0, 1, 2, 5, 30, 60]))
        docs.append(i)
        toks.append(rng.choice(pool, size=n).astype(np.int32).tolist())
    tbl = pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                    "tokens": pa.array(toks, type=pa.list_(pa.int32()))})
    ds = rd.from_arrow(tbl)
    cnt = Counter(t for ts in toks for t in ts)

    ks = (1, 3, 10, 100, 10**6)
    cov = vocab_coverage(ds, ks=ks).to_pandas().set_index("k")
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for k in ks:
        covered = sum(c for _, c in ranked[:k])
        assert cov.loc[k, "covered_types"] == min(k, len(ranked))
        assert cov.loc[k, "covered_tokens"] == covered
        assert cov.loc[k, "oov_tokens"] == total - covered

    spec = token_freq_spectrum(ds).to_pandas().set_index("cnt")
    spec_ref = Counter(cnt.values())
    assert len(spec) == len(spec_ref)
    for c, nt in spec_ref.items():
        assert spec.loc[c, "n_types"] == nt
        assert spec.loc[c, "n_tokens"] == c * nt

    # exact dedup: re-sample docs WITH replacement from a small pool
    pool_docs = toks[:40]
    dup_toks = [pool_docs[j] for j in rng.integers(0, 40, 160)]
    dtbl = pa.table({
        "doc_id": pa.array(range(160), type=pa.int64()),
        "tokens": pa.array(dup_toks, type=pa.list_(pa.int32()))})
    out = token_exact_dedup(rd.from_arrow(dtbl), num_buckets=4) \
        .to_pandas()
    ref = {}
    for i, ts in enumerate(dup_toks):
        key = tuple(ts)
        kid, n = ref.get(key, (i, 0))
        ref[key] = (min(kid, i), n + 1)
    assert len(out) == len(ref)
    got = {tuple(r["tokens"]): (r["doc_id"], r["n_dups"])
           for _, r in out.iterrows()}
    assert got == {k: v for k, v in ref.items()}


def test_heaps_curve_hand_computed_and_layout():
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import token_heaps_curve
    # stream in doc_id order: 7 7 3 | 3 5 | 7 9  -> first positions
    # 7:0, 3:2, 5:4, 9:6
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "tokens": pa.array([[7, 7, 3], [3, 5], [7, 9]],
                           type=pa.list_(pa.int32()))})
    out = token_heaps_curve(rd.from_arrow(docs),
                            ks=(0, 1, 2, 3, 5, 7, 100)) \
        .to_pandas().set_index("k")
    assert list(out.columns) == ["n_seen_tokens", "n_distinct_tokens"]
    assert out["n_seen_tokens"].tolist() == [0, 1, 2, 3, 5, 7, 7]
    assert out["n_distinct_tokens"].tolist() == [0, 1, 1, 2, 3, 4, 4]

    # layout invariance: ingest order / block count must not matter
    shuffled = pa.table({
        "doc_id": pa.array([3, 1, 2], type=pa.int64()),
        "tokens": pa.array([[7, 9], [7, 7, 3], [3, 5]],
                           type=pa.list_(pa.int32()))})
    alt = token_heaps_curve(
        rd.from_arrow(shuffled).repartition(5),
        ks=(0, 1, 2, 3, 5, 7, 100)).to_pandas().set_index("k")
    assert alt.equals(out)


def test_heaps_curve_naive_parity_fuzz():
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import token_heaps_curve
    rng = np.random.default_rng(11)
    ids, toks = [], []
    for d in range(60):
        n = int(rng.integers(0, 25))
        ids.append(d)
        toks.append(rng.integers(0, 40, size=n).astype(np.int32).tolist())
    docs = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "tokens": pa.array(toks, type=pa.list_(pa.int32()))})
    ks = (0, 1, 5, 17, 100, 250, 10_000)
    out = token_heaps_curve(rd.from_arrow(docs).repartition(7), ks=ks) \
        .to_pandas().set_index("k")
    stream = [t for lst in toks for t in lst]
    for k in ks:
        seen = set(stream[:k])
        assert out.loc[k, "n_seen_tokens"] == min(k, len(stream))
        assert out.loc[k, "n_distinct_tokens"] == len(seen)
    # curve is monotone non-decreasing in k
    nd = out["n_distinct_tokens"].to_numpy()
    assert (np.diff(nd) >= 0).all()


def test_heaps_curve_empty_and_rejects():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.tokengrams import token_heaps_curve
    empty = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "tokens": pa.array([[], []], type=pa.list_(pa.int32()))})
    out = token_heaps_curve(rd.from_arrow(empty), ks=(1, 10)).to_pandas()
    assert out["n_seen_tokens"].tolist() == [0, 0]
    assert out["n_distinct_tokens"].tolist() == [0, 0]
    docs = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                     "tokens": pa.array([[1]], type=pa.list_(pa.int32()))})
    with pytest.raises(ValueError):
        token_heaps_curve(rd.from_arrow(docs), ks=())
    with pytest.raises(ValueError):
        token_heaps_curve(rd.from_arrow(docs), ks=(1, -2))
