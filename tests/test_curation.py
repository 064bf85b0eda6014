"""Unit tests for stages/curation.py: decontamination, token-budget
quota sampling, repetition statistics, and sequence packing — edge
cases the sf0.001 oracle sweep (test_queries_oracle) doesn't reach."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import (
    decontaminate, duplicate_spans, eval_gram_hashes, pack_chunks,
    repetition_filter, repetition_stats, scrub_pii, token_budget_sample)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


# ---------------------------------------------------------------- decontam

def test_decontaminate_flags_overlapping_docs():
    corpus = _docs([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated words here appear only once each"),
        (3, "quick brown fox jumps over something else entirely now"),
    ])
    ev = _docs([(100, "a quick brown fox jumps over fences daily")])
    out = decontaminate(corpus, ev, k=5).to_pandas().set_index("doc_id")
    # doc 1 and 3 share the 5-gram "quick brown fox jumps over"
    assert out.loc[1, "n_overlap"] == 1 and not out.loc[1, "keep"]
    assert out.loc[3, "n_overlap"] == 1 and not out.loc[3, "keep"]
    assert out.loc[2, "n_overlap"] == 0 and out.loc[2, "keep"]


def test_decontaminate_drop_and_empty_eval():
    corpus = _docs([(1, "alpha beta gamma delta epsilon zeta"),
                    (2, "one two three four five six")])
    ev = _docs([(9, "alpha beta gamma delta epsilon eta")])
    kept = decontaminate(corpus, ev, k=5, drop=True).to_pandas()
    assert kept["doc_id"].tolist() == [2]
    # empty eval set: everything kept, n_overlap 0
    empty_ev = _docs([]) if False else rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = decontaminate(corpus, empty_ev, k=5).to_pandas()
    assert out["keep"].all() and (out["n_overlap"] == 0).all()


def test_eval_gram_hashes_short_doc_whole_text():
    # docs shorter than k words contribute their whole text as one gram
    ev = _docs([(1, "tiny doc")])
    g = eval_gram_hashes(ev, k=5)
    assert len(g) == 1
    corpus = _docs([(7, "tiny doc"), (8, "other words")])
    out = decontaminate(corpus, ev, k=5).to_pandas().set_index("doc_id")
    assert out.loc[7, "n_overlap"] == 1 and out.loc[8, "n_overlap"] == 0


# ---------------------------------------------------------------- pii

def test_scrub_pii_redacts_and_counts():
    ds = _docs([
        (1, "mail a@b.co and c.d-e@sub.example.org now"),
        (2, "visit https://x.org/p?q=1 or http://y.io from 10.0.0.1"),
        (3, "call 555-123-4567 or 800.555.1212 done"),
        (4, "clean text with no pii at all"),
    ])
    out = scrub_pii(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[1, "n_email"] == 2
    assert out.loc[2, "text"] == "visit <URL> or <URL> from <IP>"
    assert out.loc[2, ["n_url", "n_ip"]].tolist() == [2, 1]
    assert out.loc[3, "text"] == "call <PHONE> or <PHONE> done"
    assert out.loc[3, "n_phone"] == 2
    assert out.loc[4, "text"] == "clean text with no pii at all"
    assert out.loc[4, ["n_email", "n_url", "n_ip", "n_phone"]].sum() == 0


def test_scrub_pii_rule_order_url_owns_embedded_ip():
    # an IP inside a URL is consumed by the earlier URL rule
    ds = _docs([(1, "see http://10.1.2.3/path x")])
    out = scrub_pii(ds).to_pandas()
    assert out.loc[0, "text"] == "see <URL> x"
    assert out.loc[0, "n_url"] == 1 and out.loc[0, "n_ip"] == 0


def test_scrub_pii_custom_patterns_no_counts():
    ds = _docs([(1, "id ABC-123 and ABC-999")])
    out = scrub_pii(ds, patterns=[("id", r"ABC-\d+", "<ID>")],
                    counts=False).to_pandas()
    assert out.loc[0, "text"] == "id <ID> and <ID>"
    assert "n_id" not in out.columns


# ---------------------------------------------------------------- budget

def test_token_budget_cut_is_per_group_and_inclusive():
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "source": ["a", "a", "a", "b", "b", "b"],
        "text": ["w " * 4, "w " * 4, "w " * 4, "w " * 9, "w " * 1,
                 "w " * 2],
    })
    out = token_budget_sample(rd.from_arrow(tbl), "source", 10,
                              ["doc_id"], num_buckets=4).to_pandas()
    out = out.sort_values("doc_id")
    # group a: 4,4,4 → cum 4,8,12 → keep doc 1,2; group b: 9,1,2 →
    # cum 9,10,12 → keep doc 4,5 (cut is inclusive of budget)
    assert out["doc_id"].tolist() == [1, 2, 4, 5]
    assert out["cum_tok"].tolist() == [4, 8, 9, 10]


def test_token_budget_per_group_mapping():
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "source": ["a", "a", "b", "b", "c", "c"],
        "toks": pa.array([4, 4, 9, 1, 5, 5], type=pa.int64()),
    })
    # a: budget 4 -> doc 1 only; b: budget 10 -> both; c: absent -> drop
    out = token_budget_sample(rd.from_arrow(tbl), "source",
                              {"a": 4, "b": 10}, ["doc_id"],
                              token_col="toks",
                              num_buckets=4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3, 4]


def test_token_budget_precomputed_token_col():
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": ["a", "a", "a"],
        "toks": pa.array([5, 5, 5], type=pa.int64()),
    })
    out = token_budget_sample(rd.from_arrow(tbl), "source", 10,
                              ["doc_id"], token_col="toks",
                              num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


# ---------------------------------------------------------------- repetition

def test_repetition_stats_counts():
    ds = _docs([(1, "a b a b a b"),      # 2-grams: ab ba ab ba ab
                (2, "x y z w"),          # all distinct
                (3, "q")])               # 1 word < k → whole text gram
    out = repetition_stats(ds, k=2).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [5, 2, 3]   # ab×3, ba×2
    assert out.loc[2].tolist() == [3, 3, 1]
    assert out.loc[3].tolist() == [1, 1, 1]


def test_repetition_filter_gates():
    ds = _docs([(1, "a b a b a b a b"),   # dup frac 5/7, top 4/7 → drop
                (2, "one two three four five six")])  # clean → keep
    kept = repetition_filter(ds, k=2, max_dup_pct=30,
                             max_top_pct=20).to_pandas()
    assert kept["doc_id"].tolist() == [2]


# ---------------------------------------------------------------- spans

def test_duplicate_spans_coverage_and_counts():
    ds = _docs([
        (1, "a b c d e x y z a b c d e"),   # "a b c" at pos 0 and 8
        (2, "q a b c d e r s t u v w"),     # shares grams with doc 1
        (3, "m n o p q r s t u v"),         # overlap "r s t u v" w/ doc2?
    ])
    out = duplicate_spans(ds, k=3, num_buckets=4).to_pandas()
    out = out.set_index("doc_id").sort_index()
    # doc1 vs doc2 share 3-grams of "a b c d e": abc bcd cde (each at two
    # positions in doc 1). doc2 vs doc3 share "r s t","s t u","t u v".
    # doc1: dup occurrences at pos 0,1,2,8,9,10 → 6 occ; coverage
    # tokens 0-4 and 8-12 → 10
    assert out.loc[1].tolist() == [6, 10]
    # doc2: "a b c d e" at pos 1 (occ 1,2,3) + "r s t u v" at pos 6
    # (occ 6,7,8) → 6 occ, coverage tokens 1-5,6-10 → 10
    assert out.loc[2].tolist() == [6, 10]
    # doc3: "r s t u v" at pos 5 → occ 5,6,7 → 3 occ, tokens 5-9 → 5
    assert out.loc[3].tolist() == [3, 5]


def test_duplicate_spans_within_doc_repeats_not_enough():
    # a gram repeated only WITHIN one doc (min_docs=2 needs distinct docs)
    ds = _docs([(1, "p q r s p q r s"), (2, "different words here now")])
    out = duplicate_spans(ds, k=3, num_buckets=4).to_pandas()
    assert len(out) == 0
    # min_docs=1 counts within-doc repeats too
    out1 = duplicate_spans(ds, k=3, min_docs=1, num_buckets=4).to_pandas()
    assert set(out1["doc_id"]) == {1, 2}


def test_duplicate_spans_short_docs_emit_no_grams():
    ds = _docs([(1, "a b"), (2, "a b"), (3, "a b c d e")])
    out = duplicate_spans(ds, k=3, num_buckets=4).to_pandas()
    assert len(out) == 0  # docs 1/2 have <3 words → no k-gram spans


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_spans_matches_naive_oracle(seed):
    """Randomized corpus from a tiny vocab (forces cross-doc gram
    collisions) vs a pure-Python oracle: gram → doc-set map, then
    per-doc interval union of [pos, pos+k) spans."""
    rng = np.random.default_rng(seed)
    k = 3
    vocab = ["a", "b", "c", "d"]
    docs = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 15))))
            for i in range(1, 31)]
    got = duplicate_spans(_docs(docs), k=k, num_buckets=4).to_pandas()
    got = got.set_index("doc_id").sort_index()

    gram_docs: dict = {}
    occs: dict = {}
    for did, text in docs:
        ws = text.split()
        for p in range(len(ws) - k + 1):
            g = tuple(ws[p:p + k])
            gram_docs.setdefault(g, set()).add(did)
            occs.setdefault(did, []).append((g, p))
    exp = {}
    for did, lst in occs.items():
        dup_pos = sorted(p for g, p in lst if len(gram_docs[g]) >= 2)
        if dup_pos:
            cover = set()
            for p in dup_pos:
                cover.update(range(p, p + k))
            exp[did] = (len(dup_pos), len(cover))
    assert dict(zip(got.index, map(tuple, got.to_numpy()))) == exp


# ---------------------------------------------------------------- packing

def test_pack_chunks_spans_and_boundaries():
    rows = [(i, "w " * n) for i, n in
            [(1, 10), (2, 54), (3, 64), (4, 5), (5, 59)]]
    out = pack_chunks(_docs(rows), "doc_id", 64).to_pandas()
    out = out.sort_values("doc_id").set_index("doc_id")
    assert out["tok_start"].tolist() == [0, 10, 64, 128, 133]
    assert out["chunk_first"].tolist() == [0, 0, 1, 2, 2]
    assert out["chunk_last"].tolist() == [0, 0, 1, 2, 2]
    assert out["n_chunks"].tolist() == [1, 1, 1, 1, 1]
    # doc straddling a boundary
    out2 = pack_chunks(_docs([(1, "w " * 60), (2, "w " * 10)]),
                       "doc_id", 64).to_pandas().set_index("doc_id")
    assert out2.loc[2, "chunk_first"] == 0
    assert out2.loc[2, "chunk_last"] == 1
    assert out2.loc[2, "n_chunks"] == 2


def test_pack_chunks_drops_empty_docs():
    out = pack_chunks(_docs([(1, "a b c"), (2, "   "), (3, "d e")]),
                      "doc_id", 4).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]
    out = out.sort_values("doc_id")
    assert out["tok_start"].tolist() == [0, 3]


def test_fuzzy_decontaminate_max_jaccard_and_ties():
    """Near-dup eval contamination: per-doc max exact 5-gram Jaccard
    against a broadcast eval table, integer witnesses, lowest-eval-id
    tie-break, null best_eval_id when nothing is shared."""
    import pandas as pd
    from feature_extraction_ray.stages.curation import fuzzy_decontaminate
    base = [f"w{i}" for i in range(30)]
    near = list(base)
    near[7] = "EDIT"                       # breaks grams covering pos 7
    corpus = _docs([
        (1, " ".join(base)),               # exact copy of eval 100
        (2, " ".join(near)),               # near-dup of eval 100
        (3, "totally different words that never overlap anything here"),
        (4, "alpha beta gamma delta epsilon"),   # one gram, in BOTH evals
    ])
    ev = _docs([(100, " ".join(base)),
                (200, "alpha beta gamma delta epsilon zeta"),
                (104, "alpha beta gamma delta epsilon eta")])
    out = fuzzy_decontaminate(corpus, ev, k=5, threshold=0.5) \
        .to_pandas().set_index("doc_id")
    # doc 1: identical gram set -> jaccard exactly 1.0
    assert out.loc[1, "max_jaccard"] == 1.0
    assert out.loc[1, "best_eval_id"] == 100
    assert not out.loc[1, "keep"]
    # doc 2: 26 grams, 5 broken by the edit -> inter 21, union 31
    assert out.loc[2, "n_inter"] == 21 and out.loc[2, "n_union"] == 31
    assert out.loc[2, "max_jaccard"] == 21.0 / 31.0
    assert not out.loc[2, "keep"]
    # doc 3: no shared gram -> null best, zero witnesses, kept
    assert out.loc[3, "max_jaccard"] == 0.0
    assert pd.isna(out.loc[3, "best_eval_id"])
    assert out.loc[3, "n_inter"] == 0 and out.loc[3, "keep"]
    # doc 4's single gram hits BOTH eval docs at equal jaccard (each has
    # 2 grams): tie must break to the LOWEST eval doc id (104, not 200);
    # jaccard 0.5 sits exactly ON the threshold -> flagged (>= semantics)
    assert out.loc[4, "n_inter"] == 1 and out.loc[4, "n_union"] == 2
    assert out.loc[4, "best_eval_id"] == 104
    assert out.loc[4, "max_jaccard"] == 0.5 and not out.loc[4, "keep"]
    # drop=True keeps only clean docs
    kept = fuzzy_decontaminate(corpus, ev, k=5, threshold=0.5,
                               drop=True).to_pandas()
    assert sorted(kept["doc_id"]) == [3]


def test_mixture_weights_alpha_extremes():
    """α=1 -> proportional weights; α=0 -> uniform; epochs flag
    domains the budget would repeat (weight·budget > n_tokens)."""
    from feature_extraction_ray.stages.curation import mixture_weights
    docs = rd.from_arrow(pa.table({
        "source": pa.array(["a"] * 4 + ["b"] * 1),
        "text": pa.array(["w x y z"] * 4 + ["only two"]),
    }))
    prop = mixture_weights(docs, alpha=1.0, token_budget=18)
    prop = prop.set_index("source")
    assert prop.loc["a", "n_tokens"] == 16 and prop.loc["b", "n_tokens"] == 2
    np.testing.assert_allclose(prop.loc["a", "weight"], 16 / 18)
    np.testing.assert_allclose(prop.loc["a", "epochs"], 1.0)
    np.testing.assert_allclose(prop.loc["b", "epochs"], 1.0)
    unif = mixture_weights(docs, alpha=0.0, token_budget=18)
    np.testing.assert_allclose(unif["weight"].to_numpy(), [0.5, 0.5])
    # uniform split of 18 tokens gives b 9 tokens = 4.5 epochs
    np.testing.assert_allclose(
        unif.set_index("source").loc["b", "epochs"], 4.5)
    # precomputed token column path matches the text path
    import pyarrow.compute as pc
    with_tok = docs.map_batches(
        lambda t: t.append_column(
            "n_tok", pc.cast(pc.list_value_length(
                pc.utf8_split_whitespace(t["text"])), pa.int64())),
        batch_format="pyarrow")
    via_col = mixture_weights(with_tok, alpha=1.0, token_budget=18,
                              token_col="n_tok")
    np.testing.assert_allclose(via_col["weight"].to_numpy(),
                               prop["weight"].to_numpy())


# ------------------------------------------------------- quality sampling

def test_quality_classifier_sample_prefers_target_like_docs(ray_session):
    from feature_extraction_ray.stages.curation import (
        quality_classifier_sample)
    # target vocabulary {alpha beta gamma}; pool has 30 target-like and
    # 30 junk docs — with a heavy tail every target-like doc's q ~ 1
    target = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1020), pa.int64()),
        "text": ["alpha beta gamma alpha beta"] * 20}))
    pool = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": (["alpha beta gamma beta alpha gamma"] * 30
                 + ["zeta eta theta iota kappa mu"] * 30)})
    out = quality_classifier_sample(
        rd.from_arrow(pool), target, seed=3).to_pandas()
    got = set(out["doc_id"])
    # exact independent recomputation of the acceptance rule: fetch the
    # full quality table (a vanishing pareto_alpha keeps everything),
    # then apply pareto(9) draws from the same seeded hash
    full = quality_classifier_sample(
        rd.from_arrow(pool), target, seed=3,
        pareto_alpha=1e-4).to_pandas().set_index("doc_id")
    assert len(full) == 60
    ids = full.index.to_numpy()
    h = ((ids.astype(np.uint64) + np.uint64(3))
         * np.uint64(2654435761)) % np.uint64(4294967296)
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    par9 = np.power(u, -1.0 / 9.0) - 1.0
    expected = set(ids[par9 > 1.0 - full["quality"].to_numpy()])
    assert got == expected
    n_good = sum(1 for d in got if d < 30)
    n_junk = len(got) - n_good
    assert n_good > 10 and n_junk <= 2      # separation under the tail
    assert (out[out["doc_id"] < 30]["quality"] > 0.9).all()
    assert (out[out["doc_id"] >= 30]["quality"] < 0.1).all()
    # deterministic: identical rerun
    out2 = quality_classifier_sample(
        rd.from_arrow(pool), target, seed=3).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])
    # different seed -> different per-doc draws -> a different sample
    out4 = quality_classifier_sample(
        rd.from_arrow(pool), target, seed=4).to_pandas()
    assert set(out4["doc_id"]) != got


def test_nb_wide_output_matches_long(ray_session):
    from feature_extraction_ray.stages.text import (
        fit_naive_bayes, naive_bayes_scores)
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lab": ["a", "a", "b", "b"],
        "text": ["x y x", "y z", "z z w", "w x"]})
    ds = rd.from_arrow(tbl)
    model = fit_naive_bayes(ds, "lab")
    long = naive_bayes_scores(ds, model).to_pandas()
    wide = naive_bayes_scores(ds, model, output="wide").to_pandas()
    assert {"nb_a", "nb_b"} <= set(wide.columns)
    assert "text" in wide.columns           # input columns retained
    for _, r in wide.iterrows():
        for lbl in ("a", "b"):
            exp = long[(long.doc_id == r.doc_id)
                       & (long.label == lbl)]["nb_score"].iloc[0]
            assert r[f"nb_{lbl}"] == exp


def test_split_leakage_report_finds_planted_cross_split_dup(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feature_extraction_ray.stages.curation import split_leakage_report
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(24)]
    # near-dup of doc 2 lands in test; near-dup of doc 5 stays in train;
    # everything else is unique
    def tweak(t, tag):
        ws = t.split(); ws[7] = tag; return " ".join(ws)
    texts.append(tweak(texts[2], "LEAK"))    # doc 24 (test)
    texts.append(tweak(texts[5], "SAFE"))    # doc 25 (train)
    split = ["train"] * 26
    split[20] = split[21] = split[22] = split[23] = "test"
    split[24] = "test"                        # cross-split with doc 2
    # doc 25 stays train -> within-split pair only
    df = pd.DataFrame({"doc_id": np.arange(26, dtype=np.int64),
                       "text": texts, "split": split})
    rep = split_leakage_report(rd.from_pandas(df), "split",
                               threshold=0.5, shingle_k=3)
    rep = rep.set_index(["split_a", "split_b"])
    assert rep.loc[("test", "train"), "n_pairs"] == 1
    assert bool(rep.loc[("test", "train"), "cross"])
    assert rep.loc[("train", "train"), "n_pairs"] == 1
    assert not bool(rep.loc[("train", "train"), "cross"])
    assert ("test", "test") not in rep.index
    # clean corpus -> empty report
    clean = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=40)) for _ in range(10)],
        "split": ["train"] * 8 + ["test"] * 2})
    rep2 = split_leakage_report(rd.from_pandas(clean), "split",
                                threshold=0.5, shingle_k=3)
    assert len(rep2) == 0 or rep2["n_pairs"].sum() == 0


def _naive_bfd(items, seq_len):
    """Reference Best-Fit-Decreasing: items = [(doc_id, n_tok)]."""
    import bisect
    order = sorted(items, key=lambda x: (-x[1], x[0]))
    caps, cap_bin, fills, bin_of = [], [], [], {}
    nxt = 0
    for d, L in order:
        if L > seq_len:
            bin_of[d] = nxt
            fills.append(L)
            nxt += 1
            continue
        j = bisect.bisect_left(caps, L)
        if j < len(caps):
            b = cap_bin.pop(j)
            r = caps.pop(j) - L
        else:
            b, r = nxt, seq_len - L
            fills.append(0)
            nxt += 1
        fills[b] += L
        bin_of[d] = b
        if r > 0:
            j2 = bisect.bisect_left(caps, r)
            caps.insert(j2, r)
            cap_bin.insert(j2, b)
    return bin_of, fills


def test_pack_sequences_bfd_validity_and_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from feature_extraction_ray.stages.curation import pack_sequences_bfd
    rng = np.random.default_rng(41)
    n = 400
    lens = rng.integers(1, 300, size=n).astype(np.int64)
    lens[17] = 700            # oversize (seq_len 512)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "n_tok": lens})
    out = pack_sequences_bfd(rd.from_pandas(df), seq_len=512,
                             num_buckets=4).to_pandas()
    assert len(out) == n
    # validity: no non-oversize bin exceeds capacity; fill sums check out
    g = out.groupby("bin_id").agg(tok=("n_tok", "sum"),
                                  fill=("bin_fill", "first"),
                                  over=("oversize", "any"))
    assert (g["tok"] == g["fill"]).all()
    assert (g.loc[~g["over"], "fill"] <= 512).all()
    assert bool(out.set_index("doc_id").loc[17, "oversize"])
    # BFD guarantee: at most ONE bin <= half-full per bucket
    g2 = g[~g["over"]].reset_index()
    g2["bucket"] = g2["bin_id"] // (1 << 32)
    lax = g2[g2["fill"] * 2 <= 512].groupby("bucket").size()
    assert (lax <= 1).all()
    # per-bucket parity with the reference BFD
    out["bucket"] = out["bin_id"] // (1 << 32)
    for bkt, grp in out.groupby("bucket"):
        exp_bin, exp_fills = _naive_bfd(
            list(zip(grp["doc_id"], grp["n_tok"])), 512)
        got_local = dict(zip(grp["doc_id"],
                             grp["bin_id"] % (1 << 32)))
        assert got_local == exp_bin
        got_fill = dict(zip(grp["doc_id"], grp["bin_fill"]))
        assert got_fill == {d: exp_fills[b] for d, b in exp_bin.items()}
    # determinism across reruns
    out2 = pack_sequences_bfd(rd.from_pandas(df), seq_len=512,
                              num_buckets=4).to_pandas()
    a = out.drop(columns=["bucket"]).sort_values("doc_id") \
        .reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


# ------------------------------------------------- boilerplate line removal

def test_remove_boilerplate_lines_golden():
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    cookie = "COOKIE NOTICE"
    docs = _docs([
        # trailing-space variant of the cookie line trims to the same
        # norm; the ORIGINAL untrimmed line would be removed with it
        (1, "real content one\n" + cookie + "  \nmore text"),
        (2, cookie + "\n\nreal content two"),
        # within-doc repetition alone never triggers removal
        (3, "echo line\necho line\nunique tail"),
        # fully-boilerplate doc -> empty text, not dropped
        (4, cookie),
        # untouched doc
        (5, "plain single line"),
    ])
    out = remove_boilerplate_lines(docs, min_docs=2, num_buckets=4) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "real content one\nmore text"
    assert out.loc[1, "n_lines"] == 3 and out.loc[1, "n_removed"] == 1
    # blank line survives and keeps structure
    assert out.loc[2, "text"] == "\nreal content two"
    assert out.loc[2, "n_removed"] == 1
    # within-doc-only repetition untouched (1 distinct doc)
    assert out.loc[3, "text"] == "echo line\necho line\nunique tail"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[4, "text"] == "" and out.loc[4, "n_removed"] == 1
    assert out.loc[5, "text"] == "plain single line"
    assert out.loc[5, "n_lines"] == 1


def test_remove_boilerplate_lines_min_docs_and_blanks():
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    docs = _docs([
        (1, "shared\nA"),
        (2, "shared\nB"),
        (3, "shared\nC"),
        (4, "pairline\nD"),
        (5, "pairline\nE"),
        # blank lines never count toward duplication even across docs
        (6, "\n\nF"),
        (7, "\n\nG"),
    ])
    out = remove_boilerplate_lines(docs, min_docs=3, num_buckets=4) \
        .to_pandas().set_index("doc_id").sort_index()
    # 'shared' (3 docs) removed; 'pairline' (2 docs) kept at min_docs=3
    assert out.loc[1, "text"] == "A" and out.loc[1, "n_removed"] == 1
    assert out.loc[4, "text"] == "pairline\nD"
    assert out.loc[4, "n_removed"] == 0
    assert out.loc[6, "text"] == "\n\nF" and out.loc[6, "n_removed"] == 0
    assert out.loc[6, "n_lines"] == 3


# --------------------------------------------------------- per-domain cap

def test_cap_per_source_golden_and_determinism():
    from feature_extraction_ray.stages.curation import (
        cap_per_source, _cap_hash)
    rows = [(i, f"src{i % 3}") for i in range(30)]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "source": pa.array([r[1] for r in rows], type=pa.string())})
    out = cap_per_source(rd.from_arrow(tbl), cap=4, num_buckets=4) \
        .to_pandas().sort_values(["source", "src_rank"]) \
        .reset_index(drop=True)
    # every source capped at 4, ranks are 1..4
    g = out.groupby("source")["src_rank"].agg(["count", "min", "max"])
    assert (g["count"] == 4).all()
    assert (g["min"] == 1).all() and (g["max"] == 4).all()
    # selection matches the naive hash order per source
    ids = np.arange(30, dtype=np.int64)
    h = _cap_hash(ids)
    for s in ("src0", "src1", "src2"):
        members = [i for i in range(30) if f"src{i % 3}" == s]
        expect = sorted(members, key=lambda i: (h[i], i))[:4]
        got = out[out["source"] == s]["doc_id"].tolist()
        assert got == expect
    # identical output under a different block layout (pre-prune is a
    # safe superset; final exchange decides)
    out2 = cap_per_source(
        rd.from_arrow(tbl).repartition(7), cap=4, num_buckets=2) \
        .to_pandas().sort_values(["source", "src_rank"]) \
        .reset_index(drop=True)
    assert out.equals(out2)


def test_cap_per_source_small_groups_pass_through():
    from feature_extraction_ray.stages.curation import cap_per_source
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "a", "b"], type=pa.string())})
    out = cap_per_source(rd.from_arrow(tbl), cap=10, num_buckets=2) \
        .to_pandas()
    assert len(out) == 3 and set(out["src_rank"]) <= {1, 2}


def test_remove_boilerplate_lines_keep_cols():
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    tbl = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["shared\nA", "shared\nB"], type=pa.string()),
        "source": pa.array(["s1", "s2"], type=pa.string()),
        "weight": pa.array([0.5, 2.0], type=pa.float64())})
    out = remove_boilerplate_lines(
        rd.from_arrow(tbl), min_docs=2, num_buckets=2,
        keep_cols=["source", "weight"]) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "A" and out.loc[1, "source"] == "s1"
    assert out.loc[2, "source"] == "s2" and out.loc[2, "weight"] == 2.0
    assert list(out["n_removed"]) == [1, 1]


# ------------------------------------------------ contaminated-span removal

def test_decontaminate_spans_surgical():
    from feature_extraction_ray.stages.curation import decontaminate_spans
    ev = _docs([(100, "quick brown fox jumps over")])
    corpus = _docs([
        # contaminated span in the middle: exactly the 5 covered words go
        (1, "intro words then quick brown fox jumps over and a tail"),
        # clean doc: text byte-identical (even odd   spacing preserved)
        (2, "nothing shared here at all with anything else"),
        # two overlapping hits (6-word run shares two 5-grams) -> 6 cut
        (3, "quick brown fox jumps over quick brown fox jumps over"),
    ])
    out = decontaminate_spans(corpus, ev, k=5).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "intro words then and a tail"
    assert out.loc[1, "n_removed_words"] == 5
    assert out.loc[1, "n_words"] == 11
    assert out.loc[2, "text"] == \
        "nothing shared here at all with anything else"
    assert out.loc[2, "n_removed_words"] == 0
    # doc 3: positions 0-4 and 5-9 both hit -> everything removed
    assert out.loc[3, "text"] == "" and out.loc[3, "n_removed_words"] == 10


def test_decontaminate_spans_short_docs_and_whitespace():
    from feature_extraction_ray.stages.curation import decontaminate_spans
    ev = _docs([(100, "tiny doc")])
    corpus = _docs([
        (1, "tiny doc"),           # short-doc whole-text gram -> emptied
        (2, "tiny document"),      # different short doc -> untouched
        (3, ""),                   # empty text: 0 words, unchanged
        (4, "padded   spacing doc here keeps original bytes"),
    ])
    out = decontaminate_spans(corpus, ev, k=5).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "" and out.loc[1, "n_removed_words"] == 2
    assert out.loc[2, "text"] == "tiny document"
    assert out.loc[3, "text"] == "" and out.loc[3, "n_words"] == 0
    # untouched doc keeps ORIGINAL spacing (no normalization)
    assert out.loc[4, "text"] == \
        "padded   spacing doc here keeps original bytes"


def test_decontaminate_spans_empty_eval_noop():
    from feature_extraction_ray.stages.curation import decontaminate_spans
    import pyarrow as _pa
    ev = rd.from_arrow(_pa.table({
        "doc_id": _pa.array([], type=_pa.int64()),
        "text": _pa.array([], type=_pa.string())}))
    corpus = _docs([(1, "alpha beta gamma delta epsilon zeta")])
    out = decontaminate_spans(corpus, ev, k=5).to_pandas()
    assert out.loc[0, "text"] == "alpha beta gamma delta epsilon zeta"
    assert out.loc[0, "n_removed_words"] == 0


# -------------------------------------------------- within-doc line dedup

def test_dedup_lines_within_doc_golden():
    from feature_extraction_ray.stages.curation import (
        dedup_lines_within_doc)
    docs = _docs([
        # repeated line cut on SECOND occurrence; trailing-space variant
        # trims to the same line; blank lines always kept
        (1, "alpha\nbeta\nalpha  \n\nbeta\ngamma"),
        (2, "one\ntwo\nthree"),
        (3, "same\nsame\nsame"),
        (4, ""),
    ])
    out = dedup_lines_within_doc(docs).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "alpha\nbeta\n\ngamma"
    assert out.loc[1, "n_lines"] == 6 and out.loc[1, "n_removed"] == 2
    assert out.loc[2, "text"] == "one\ntwo\nthree"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[3, "text"] == "same" and out.loc[3, "n_removed"] == 2
    assert out.loc[4, "text"] == "" and out.loc[4, "n_lines"] == 1


def test_dedup_lines_cross_doc_untouched():
    from feature_extraction_ray.stages.curation import (
        dedup_lines_within_doc)
    # the same line in DIFFERENT docs is never touched (intra-doc only)
    docs = _docs([(1, "shared\nA"), (2, "shared\nB")])
    out = dedup_lines_within_doc(docs).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "text"] == "shared\nA"
    assert out.loc[2, "text"] == "shared\nB"
    assert (out["n_removed"] == 0).all()


# -------------------------------------------------- length-bucketed batches

def test_length_bucketed_batches_golden():
    import pyarrow as _pa
    from feature_extraction_ray.stages.curation import (
        length_bucketed_batches)
    lens = [10, 10, 9, 7, 7, 7, 3, 1]
    tbl = _pa.table({
        "doc_id": _pa.array(range(len(lens)), type=_pa.int64()),
        "n_tok": _pa.array(lens, type=_pa.int64())})
    out = length_bucketed_batches(rd.from_arrow(tbl), batch_size=3,
                                  num_buckets=2).to_pandas() \
        .sort_values(["batch_id", "pos_in_batch"]).reset_index(drop=True)
    # descending length, id tie-break: [10,10,9],[7,7,7],[3,1]
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert out["batch_id"].tolist() == [0, 0, 0, 1, 1, 1, 2, 2]
    assert out["pos_in_batch"].tolist() == [0, 1, 2, 0, 1, 2, 0, 1]
    g = out.groupby("batch_id").first()
    assert g["batch_max_len"].tolist() == [10, 7, 3]
    # waste: [3*10-29, 3*7-21, 2*3-4] = [1, 0, 2]
    assert g["pad_waste"].tolist() == [1, 0, 2]
    # per-batch stats repeat on every member row
    assert out.groupby("batch_id")["pad_waste"].nunique().max() == 1
    # determinism under a different layout
    out2 = length_bucketed_batches(rd.from_arrow(tbl).repartition(5),
                                   batch_size=3, num_buckets=4) \
        .to_pandas().sort_values(["batch_id", "pos_in_batch"]) \
        .reset_index(drop=True)
    assert out.equals(out2)


# ------------------------------------------------------ domain interleave

def test_interleave_by_domain_round_robin():
    import pyarrow as _pa
    from feature_extraction_ray.stages.curation import interleave_by_domain
    # 3 domains x 4 docs: rank-k docs of every live domain precede any
    # rank-(k+1) doc
    rows = [(i, f"d{i % 3}") for i in range(12)]
    tbl = _pa.table({
        "doc_id": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "source": _pa.array([r[1] for r in rows], type=_pa.string())})
    out = interleave_by_domain(rd.from_arrow(tbl), num_buckets=2) \
        .to_pandas().sort_values("train_pos").reset_index(drop=True)
    assert out["train_pos"].tolist() == list(range(12))
    # positions 0-2 are rank-0 of the three domains, 3-5 rank-1, ...
    assert (out["domain_rank"].to_numpy() == np.repeat(
        np.arange(4), 3)).all()
    for k in range(4):
        assert set(out.loc[3*k:3*k+2, "source"]) == {"d0", "d1", "d2"}
    # uneven domains: exhausted domains drop out of later rounds
    rows2 = [(0, "a"), (1, "a"), (2, "a"), (3, "b")]
    t2 = _pa.table({
        "doc_id": _pa.array([r[0] for r in rows2], type=_pa.int64()),
        "source": _pa.array([r[1] for r in rows2], type=_pa.string())})
    out2 = interleave_by_domain(rd.from_arrow(t2), num_buckets=2) \
        .to_pandas().sort_values("train_pos").reset_index(drop=True)
    # round 0 holds one a and the only b; rounds 1-2 are a alone
    assert set(out2.loc[:1, "source"]) == {"a", "b"}
    assert out2.loc[2:, "source"].tolist() == ["a", "a"]


def test_remove_boilerplate_broadcast_equivalence():
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    cookie = "COOKIE NOTICE"
    # includes a HOT line (cookie in most docs), blanks, within-doc
    # repeats, a fully-boilerplate doc and a trailing-space variant
    docs = _docs([
        (1, "own line one\n" + cookie + "  \nmore"),
        (2, cookie + "\n\nunique two"),
        (3, "echo\necho\ntail"),
        (4, cookie),
        (5, "plain"),
        (6, cookie + "\nshared pair\nx6"),
        (7, "shared pair\nx7"),
    ])
    a = remove_boilerplate_lines(docs, min_docs=2, num_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = remove_boilerplate_lines(docs, min_docs=2, num_buckets=4,
                                 mode="broadcast", salt=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    cols = ["doc_id", "text", "n_lines", "n_removed"]
    assert a[cols].equals(b[cols])
    # keep_cols pass-through in broadcast mode too
    import pyarrow as _pa
    t = _pa.table({
        "doc_id": _pa.array([1, 2], type=_pa.int64()),
        "text": _pa.array(["dup\nA", "dup\nB"]),
        "source": _pa.array(["s1", "s2"])})
    out = remove_boilerplate_lines(
        rd.from_arrow(t), min_docs=2, num_buckets=2, mode="broadcast",
        keep_cols=["source"]).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "A" and out.loc[1, "source"] == "s1"


def test_boilerplate_broadcast_cap_and_bad_mode():
    import pytest
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    docs = _docs([(1, "dup\nA"), (2, "dup\nB")])
    with pytest.raises(ValueError, match="max_lines"):
        remove_boilerplate_lines(docs, min_docs=2, mode="broadcast",
                                 max_broadcast_lines=0)
    with pytest.raises(ValueError, match="mode"):
        remove_boilerplate_lines(docs, mode="salted")


# ------------------------------------------------------ negative sampling

def test_sample_negatives_properties():
    import pyarrow as _pa
    import pytest
    from feature_extraction_ray.stages.curation import sample_negatives
    ids = [3, 8, 11, 20, 21, 40, 55]
    ds = rd.from_arrow(_pa.table({
        "doc_id": _pa.array(ids, type=_pa.int64())}))
    out = sample_negatives(ds, k=3, num_buckets=2).to_pandas()
    # k rows per anchor, never self, all negatives are real ids
    assert len(out) == len(ids) * 3
    assert (out["anchor_id"] != out["neg_id"]).all()
    assert set(out["neg_id"]) <= set(ids)
    g = out.groupby("anchor_id").size()
    assert (g == 3).all()
    # stride arithmetic parity with the naive formula
    n = len(ids)
    rank = {d: i for i, d in enumerate(sorted(ids))}
    for _, row in out.iterrows():
        j = int(row["neg_slot"])
        ck = (rank[row["anchor_id"]] + 1
              + ((j + 1) * 2654435761) % (n - 1)) % n
        assert sorted(ids)[ck] == row["neg_id"]
    # deterministic under a different layout
    out2 = sample_negatives(rd.from_arrow(_pa.table({
        "doc_id": _pa.array(ids, type=_pa.int64())})).repartition(4),
        k=3, num_buckets=4).to_pandas()
    a = out.sort_values(["anchor_id", "neg_slot"]).reset_index(drop=True)
    b = out2.sort_values(["anchor_id", "neg_slot"]).reset_index(drop=True)
    assert a.equals(b)
    with pytest.raises(ValueError):
        sample_negatives(rd.from_arrow(_pa.table({
            "doc_id": _pa.array([1], type=_pa.int64())})))


# ---------------------------------------------------- cluster-safe split

def test_cluster_safe_split_no_leakage():
    import pyarrow as _pa
    import pytest
    from feature_extraction_ray.stages.curation import (
        cluster_safe_split, split_leakage_report)
    from feature_extraction_ray.stages.dedup import minhash_signatures
    # near-identical pair + distinct docs; clusters from exact dedup ids
    docs = [(i, f"totally unique document number {i} with words "
                f"abc{i} def{i}") for i in range(10)]
    docs[1] = (1, docs[0][1])   # 1 duplicates 0's text
    assign = rd.from_arrow(_pa.table({
        "doc_id": _pa.array([d[0] for d in docs], type=_pa.int64()),
        # cluster = min doc id per text: doc 1 joins cluster 0
        "cluster_id": _pa.array([0, 0] + list(range(2, 10)),
                                type=_pa.int64())}))
    out = cluster_safe_split(assign, [0.5, 0.5], ["train", "test"]) \
        .to_pandas()
    # every cluster is wholly in one split
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
    # the duplicate pair shares a split by construction
    s = out.set_index("doc_id")["split"]
    assert s[0] == s[1]
    # and the leakage auditor confirms ZERO cross-split near-dup pairs
    corpus = rd.from_arrow(_pa.table({
        "doc_id": _pa.array([d[0] for d in docs], type=_pa.int64()),
        "text": _pa.array([d[1] for d in docs], type=_pa.string())}))
    labeled = corpus.to_pandas().merge(out[["doc_id", "split"]],
                                       on="doc_id")
    rep = split_leakage_report(
        rd.from_pandas(labeled), "split", threshold=0.8,
        num_buckets=4)
    cross = rep[rep["cross"]] if len(rep) else rep
    assert len(cross) == 0 or (cross["n_pairs"] == 0).all()
    with pytest.raises(ValueError):
        cluster_safe_split(assign, [0.5, 0.4], ["a", "b"])
    with pytest.raises(ValueError):
        cluster_safe_split(assign, [1.0], ["a", "b"])


def test_boilerplate_fuzz_both_modes_vs_naive():
    """Random line corpora (blank lines, trim variants, hot lines,
    within-doc repeats) through BOTH physical plans in one Ray call
    each — exact parity with a naive Python reference."""
    from feature_extraction_ray.stages.curation import (
        remove_boilerplate_lines)
    rng = np.random.RandomState(7)
    pool = [f"line{i}" for i in range(12)] + ["HOT BOILER"] * 3 + [""]
    docs = []
    for i in range(120):
        k = rng.randint(0, 7)
        lines = [pool[rng.randint(0, len(pool))]
                 + ("  " if rng.rand() < 0.3 else "")
                 for _ in range(k)]
        docs.append((i, "\n".join(lines)))

    def naive(min_docs):
        from collections import defaultdict
        seen = defaultdict(set)
        for did, text in docs:
            for ln in text.split("\n"):
                t = ln.strip(" \t\r")
                if t:
                    seen[t].add(did)
        hot = {t for t, s in seen.items() if len(s) >= min_docs}
        out = {}
        for did, text in docs:
            lines = text.split("\n")
            kept = [ln for ln in lines
                    if ln.strip(" \t\r") == "" or
                    ln.strip(" \t\r") not in hot]
            out[did] = ("\n".join(kept), len(lines),
                        len(lines) - len(kept))
        return out

    ds = _docs(docs)
    want = naive(3)
    for mode in ("partitioned", "broadcast"):
        got = remove_boilerplate_lines(ds, min_docs=3, num_buckets=4,
                                       mode=mode).to_pandas() \
            .set_index("doc_id").sort_index()
        for did, (txt, nl, nr) in want.items():
            assert got.loc[did, "text"] == txt, (mode, did)
            assert got.loc[did, "n_lines"] == nl
            assert got.loc[did, "n_removed"] == nr


def test_cap_and_within_dedup_fuzz_vs_naive():
    from feature_extraction_ray.stages.curation import (
        cap_per_source, _cap_hash, dedup_lines_within_doc)
    rng = np.random.RandomState(11)
    ids = np.unique(rng.randint(0, 1 << 30, size=300))[:150] \
        .astype(np.int64)
    srcs = [f"s{rng.randint(0, 9)}" for _ in ids]
    tbl = pa.table({"doc_id": pa.array(ids),
                    "source": pa.array(srcs)})
    out = cap_per_source(rd.from_arrow(tbl), cap=6, num_buckets=4) \
        .to_pandas()
    h = {int(i): int(v) for i, v in zip(ids, _cap_hash(ids))}
    for s in set(srcs):
        members = [int(i) for i, ss in zip(ids, srcs) if ss == s]
        want = sorted(members, key=lambda i: (h[i], i))[:6]
        got = out[out["source"] == s].sort_values("src_rank")
        assert got["doc_id"].tolist() == want
        assert got["src_rank"].tolist() == list(
            range(1, len(want) + 1))
    # within-doc line dedup on random repetitive docs
    pool = ["a", "b  ", "c", "", "a "]
    docs = [(i, "\n".join(pool[rng.randint(0, 5)]
                          for _ in range(rng.randint(0, 8))))
            for i in range(80)]
    got2 = dedup_lines_within_doc(_docs(docs)).to_pandas() \
        .set_index("doc_id")
    for did, text in docs:
        lines = text.split("\n")
        seen, kept = set(), []
        for ln in lines:
            t = ln.strip(" \t\r")
            if t == "" or t not in seen:
                kept.append(ln)
                seen.add(t)
        assert got2.loc[did, "text"] == "\n".join(kept), did
        assert got2.loc[did, "n_removed"] == len(lines) - len(kept)


# ------------------------------------------------- quantile quality gate

def test_quality_quantile_gate_convention():
    import math
    import pyarrow as _pa
    from feature_extraction_ray.stages.curation import (
        quality_quantile_gate)
    scores = {"a": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10], "b": [5, 5, 5],
              "c": [42]}
    rows, i = [], 0
    for s, vals in scores.items():
        for v in vals:
            rows.append((i, s, v)); i += 1
    tbl = _pa.table({
        "doc_id": _pa.array([r[0] for r in rows], type=_pa.int64()),
        "source": _pa.array([r[1] for r in rows], type=_pa.string()),
        "score": _pa.array([r[2] for r in rows], type=_pa.int64())})
    out = quality_quantile_gate(rd.from_arrow(tbl), "score", q=0.7,
                                num_buckets=2).to_pandas()
    for s, vals in scores.items():
        sv = sorted(vals)
        thr = sv[max(1, math.ceil(0.7 * len(sv))) - 1]
        got = out[out["source"] == s]
        assert (got["thr"] == thr).all()
        assert sorted(got["score"]) == sorted(
            v for v in vals if v >= thr)
    # tie group 'b': threshold 5, ALL ties kept
    assert len(out[out["source"] == "b"]) == 3
    # singleton group: its only row survives
    assert len(out[out["source"] == "c"]) == 1


def test_canonicalize_url_golden():
    import ray.data as rd

    from feature_extraction_ray.stages.curation import canonicalize_url
    urls = [
        "HTTPS://WWW.Example.COM/Path/A",          # case folds host only
        "https://a.com/p/1/",                      # trailing slash
        "https://a.com:443/p/1",                   # default port
        "https://a.com/p?utm_source=x&ref=2&utm_campaign=y",
        "https://a.com/p?fbclid=abc",               # only tracking left
        "https://a.com/p#frag",                    # fragment
        "http://a.com:443/p",                      # NOT https — port kept
        "no-scheme-string",                        # passthrough
    ]
    out = canonicalize_url(
        rd.from_arrow(pa.table({"url": pa.array(urls)})))
    got = dict(zip(urls, out.to_pandas()["url_canon"]))
    assert got["HTTPS://WWW.Example.COM/Path/A"] == \
        "https://www.example.com/Path/A"
    assert got["https://a.com/p/1/"] == "https://a.com/p/1"
    assert got["https://a.com:443/p/1"] == "https://a.com/p/1"
    assert got["https://a.com/p?utm_source=x&ref=2&utm_campaign=y"] == \
        "https://a.com/p?ref=2"
    assert got["https://a.com/p?fbclid=abc"] == "https://a.com/p"
    assert got["https://a.com/p#frag"] == "https://a.com/p"
    assert got["http://a.com:443/p"] == "http://a.com:443/p"
    assert got["no-scheme-string"] == "no-scheme-string"


def test_dedup_by_url_collapses_variants():
    import ray.data as rd

    from feature_extraction_ray.stages.curation import dedup_by_url
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 10, 11], type=pa.int64()),
        "url": pa.array([
            "https://a.com/p/7",
            "HTTPS://A.COM/p/7",
            "https://a.com/p/7/",
            "https://a.com:443/p/7#x",
            "https://a.com/p/7?ref=1&utm_source=s",
            "https://a.com/p/7?ref=1",
        ])})
    out = dedup_by_url(rd.from_arrow(tbl), num_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # 1-4 collapse to the bare page (keeper 1); 10/11 share ?ref=1
    assert out["doc_id"].tolist() == [1, 10]
    assert out["n_dups"].tolist() == [4, 2]
    assert out.loc[0, "url_canon"] == "https://a.com/p/7"
    assert out.loc[1, "url_canon"] == "https://a.com/p/7?ref=1"
    # the keeper's ORIGINAL url rides through keep_cols
    assert out.loc[0, "url"] == "https://a.com/p/7"


def test_epoch_order_permutations_and_layout_invariance():
    import ray.data as rd

    from feature_extraction_ray.stages.curation import epoch_order
    ids = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})
    out = epoch_order(rd.from_arrow(ids), epochs=3) \
        .to_pandas().sort_values(["epoch", "doc_id"]) \
        .reset_index(drop=True)
    assert len(out) == 120
    orders = {}
    for e in range(3):
        sub = out[out["epoch"] == e]
        # each epoch is a full 1..n permutation
        assert sorted(sub["train_pos"].tolist()) == list(range(1, 41))
        orders[e] = sub.sort_values("doc_id")["train_pos"].tolist()
    # distinct epochs give distinct permutations
    assert orders[0] != orders[1] and orders[1] != orders[2]
    # block layout does not change positions
    out2 = epoch_order(rd.from_arrow(ids).repartition(7), epochs=3) \
        .to_pandas().sort_values(["epoch", "doc_id"]) \
        .reset_index(drop=True)
    assert out2.equals(out)


def test_epoch_order_rejects_bad_epochs():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.curation import epoch_order
    ids = pa.table({"doc_id": pa.array([1, 2], type=pa.int64())})
    with pytest.raises(ValueError):
        epoch_order(rd.from_arrow(ids), epochs=0)


def test_kfold_assign_balance_and_layout():
    import pytest
    import ray.data as rd

    from feature_extraction_ray.stages.partition import kfold_assign
    tbl = pa.table({
        "doc_id": pa.array(np.arange(53, dtype=np.int64)),
        "source": pa.array(["a"] * 31 + ["b"] * 22)})
    out = kfold_assign(rd.from_arrow(tbl), k=4, group_col="source",
                       num_buckets=4).to_pandas()
    for src, n in (("a", 31), ("b", 22)):
        sizes = out[out["source"] == src]["fold"].value_counts()
        assert sorted(sizes.index.tolist()) == [0, 1, 2, 3]
        assert sizes.max() - sizes.min() <= 1     # exact balance
        assert sizes.sum() == n
    # global (unstratified) path + layout invariance
    g1 = kfold_assign(rd.from_arrow(tbl), k=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    g2 = kfold_assign(rd.from_arrow(tbl).repartition(7), k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert g1["fold"].tolist() == g2["fold"].tolist()
    sizes = g1["fold"].value_counts()
    assert sizes.max() - sizes.min() <= 1
    with pytest.raises(ValueError):
        kfold_assign(rd.from_arrow(tbl), k=1)


def test_fuzz_url_canonicalization_vs_naive():
    """300 randomized URLs (case/port/path/param/fragment combinations
    + junk strings) through canonicalize_url, bit-compared against an
    independent pure-Python re.sub implementation of the same spec."""
    import re as _re

    import ray.data as rd

    from feature_extraction_ray.stages.curation import canonicalize_url
    rng = np.random.default_rng(909)
    schemes = ["https", "HTTPS", "http", "HtTpS"]
    hosts = ["A.Example.COM", "b.org", "WWW.x-Y.net"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/p/1", "/P/Q/", "/x"]
    pool = ["utm_source=x", "utm_campaign=Y2", "fbclid=ZZ", "gclid=1",
            "ref=7", "id=abc", "q=hello"]
    frags = ["", "#f", "#sec-2"]
    urls = []
    for _ in range(300):
        ps = [pool[i] for i in rng.choice(len(pool),
                                          size=rng.integers(0, 5),
                                          replace=False)]
        q = "?" + "&".join(ps) if ps else ""
        urls.append(schemes[rng.integers(0, 4)] + "://"
                    + hosts[rng.integers(0, 3)]
                    + ports[rng.integers(0, 4)]
                    + paths[rng.integers(0, 5)] + q
                    + frags[rng.integers(0, 3)])
    urls += ["", "no-scheme", "weird:///x", "https://", "a//b/"]

    def naive(s: str) -> str:
        m = _re.match(r"^([^:]+://[^/?#]*)(.*)$", s)
        s = m.group(1).lower() + m.group(2) if m else s
        s = _re.sub(r"#.*$", "", s)
        s = _re.sub(r"^(https://[^/?#:]*):443([/?#].*)?$",
                    lambda mm: mm.group(1) + (mm.group(2) or ""), s)
        s = _re.sub(r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*",
                    r"\1", s)
        s = _re.sub(r"&&+", "&", s)
        s = _re.sub(r"\?&", "?", s)
        s = _re.sub(r"[?&]+$", "", s)
        s = _re.sub(r"([^/])/$", r"\1", s)
        return s

    got = canonicalize_url(
        rd.from_arrow(pa.table({"url": pa.array(urls)}))) \
        .to_pandas()["url_canon"].tolist()
    exp = [naive(u) for u in urls]
    assert got == exp


def test_fuzz_epoch_order_and_kfold_vs_naive():
    """Sparse random int64 ids (up to 2^40) through epoch_order and
    kfold_assign, compared against naive pure-Python references."""
    import ray.data as rd

    from feature_extraction_ray.stages.curation import epoch_order
    from feature_extraction_ray.stages.partition import kfold_assign
    rng = np.random.default_rng(910)
    ids = np.unique(rng.integers(0, 1 << 40, size=400))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))

    out = epoch_order(ds, epochs=3).to_pandas()
    for e in range(3):
        mult = 2654435761 + 2630847822 * e
        order = sorted(ids.tolist(),
                       key=lambda i: ((i % (1 << 20)) * mult
                                      % (1 << 32), i))
        exp = {i: p + 1 for p, i in enumerate(order)}
        sub = out[out["epoch"] == e]
        got = dict(zip(sub["doc_id"], sub["train_pos"]))
        assert got == exp

    grp = np.array(["g%d" % (i % 7) for i in range(len(ids))])
    ds2 = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                  "source": pa.array(grp)}))
    outk = kfold_assign(ds2, k=4, group_col="source", num_buckets=4) \
        .to_pandas()
    gotk = dict(zip(outk["doc_id"], outk["fold"]))
    for g in np.unique(grp):
        members = ids[grp == g].tolist()
        members.sort(key=lambda i: ((i % (1 << 20)) * 2654435761
                                    % (1 << 32), i))
        for r, i in enumerate(members):
            assert gotk[i] == r % 4


def test_unimax_water_filling():
    """Sequential min(cap, R // m) water-filling over (cap asc, group)
    order: small domains cap out, floor remainders roll forward, and
    epochs is one exact division."""
    from feature_extraction_ray.stages.curation import unimax_weights
    docs = rd.from_arrow(pa.table({
        "source": pa.array(["a"] * 1 + ["b"] * 2 + ["c"] * 10),
        "text": pa.array(["t u"] * 1 + ["t u v w"] * 2 + ["x " * 9 + "x"] * 10),
    }))
    # tokens: a=2, b=8, c=100; caps (max_epochs=2): a=4, b=16, c=200
    out = unimax_weights(docs, token_budget=100, max_epochs=2)
    assert list(out["source"]) == ["a", "b", "c"]   # cap-asc order
    assert list(out["cap"]) == [4, 16, 200]
    # R=100 m=3: a gets min(4, 33)=4; R=96 m=2: b min(16, 48)=16;
    # R=80 m=1: c min(200, 80)=80
    assert list(out["alloc"]) == [4, 16, 80]
    np.testing.assert_array_equal(
        out["epochs"].to_numpy(),
        np.array([4, 16, 80], dtype=np.float64)
        / np.array([2, 8, 100], dtype=np.float64))
    assert int(out["alloc"].sum()) == 100   # budget fully spent

    # budget above total cap: everyone caps, leftover unallocated
    capped = unimax_weights(docs, token_budget=10_000, max_epochs=1)
    assert list(capped["alloc"]) == list(capped["cap"]) == [2, 8, 100]
    assert int(capped["alloc"].sum()) == 110 < 10_000

    # floor remainder rolls forward: budget=10, m=3 -> a min(4,3)=3,
    # b min(16, 7//2=3)=3, c min(200, 4)=4
    frac = unimax_weights(docs, token_budget=10, max_epochs=2)
    assert list(frac["alloc"]) == [3, 3, 4]
    assert int(frac["alloc"].sum()) == 10

    import pytest as _pt
    with _pt.raises(ValueError):
        unimax_weights(docs, max_epochs=0)
    with _pt.raises(ValueError):
        unimax_weights(docs, max_epochs=1.5)
    with _pt.raises(ValueError):
        unimax_weights(docs, token_budget=-1)


def test_unimax_naive_parity_and_tiebreak():
    """Fuzz vs a pure-Python water-fill; equal caps tie-break by group
    name (deterministic under any layout)."""
    from feature_extraction_ray.stages.curation import unimax_weights
    rng = np.random.default_rng(7)
    sources, texts = [], []
    toks = {}
    for g in range(12):
        name = f"g{g:02d}"
        n = int(rng.integers(1, 6))
        for _ in range(n):
            w = int(rng.integers(1, 30))
            sources.append(name)
            texts.append(" ".join(["w"] * w))
            toks[name] = toks.get(name, 0) + w
    # plant an exact tie on caps
    sources += ["tie_b", "tie_a"]
    texts += ["a b c", "d e f"]
    toks["tie_b"] = toks["tie_a"] = 3
    docs = rd.from_arrow(pa.table({"source": sources, "text": texts}))
    for budget, me in [(0, 1), (17, 1), (100, 3), (10**6, 2)]:
        out = unimax_weights(docs, token_budget=budget, max_epochs=me)
        order = sorted(toks, key=lambda g: (toks[g] * me, g))
        assert list(out["source"]) == order
        R = budget
        exp = []
        for i, g in enumerate(order):
            a = min(toks[g] * me, R // (len(order) - i))
            exp.append(a)
            R -= a
        assert list(out["alloc"]) == exp
