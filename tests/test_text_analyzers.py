"""Unit tests for the text-analysis actor classes (langid, quality,
token counts, fingerprint) on known inputs."""
import numpy as np
import pandas as pd
import pytest

from feature_extraction_ray.stages.reference_impls import (LangId,
                                                            QualityScore,
                                                            TokenCount)
from feature_extraction_ray.stages.text import (Fingerprint, TextAnalyzer,
                                                hash_word)


def test_langid_known_languages():
    df = pd.DataFrame({"text": [
        "the cat sat on the mat and it was a good day for this",
        "der Hund ist mit der Katze und das ist nicht ein Problem",
        "le chat est dans la maison et il est pour le jardin",
        "el perro es de la casa y es por el jardin una vez",
        "zzz qqq xxx",
        "",
    ]})
    out = LangId()(df.copy())
    assert out["lang_pred"].tolist()[:4] == ["en", "de", "fr", "es"]
    assert out["lang_pred"].tolist()[4:] == ["und", "und"]


def test_quality_score_formulas():
    df = pd.DataFrame({"text": ["The cat! 123 excellent"]})
    out = QualityScore()(df.copy())
    r = out.iloc[0]
    assert r["q_n_chars"] == len("The cat! 123 excellent")
    assert r["q_n_words"] == 4
    assert r["q_digit_ratio"] == pytest.approx(3 / r["q_n_chars"])
    assert r["q_long_word_frac"] == pytest.approx(1 / 4)  # 'excellent'
    assert 0 <= r["q_punct_ratio"] < 0.2


def test_token_counts():
    df = pd.DataFrame({"text": ["hello world, extraordinary 42"]})
    out = TokenCount()(df.copy())
    assert out.iloc[0]["n_tok_ws"] == 4
    # bpe-ish: words split into <=4-char chunks + punct + digits
    assert out.iloc[0]["n_tok_bpe"] > 4


def test_fingerprint_order_sensitive_and_stable():
    import pyarrow as pa
    t1 = pa.table({"text": ["a b c", "c b a", "a b c"]})
    out = Fingerprint()(t1)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[2]          # same content → same fingerprint
    assert fp[0] != fp[1]          # order matters
    # process-stable: recompute in a fresh object
    out2 = Fingerprint()(t1)
    assert out2["fingerprint"].to_pylist() == fp


def test_hash_word_stable():
    assert hash_word("hello") == hash_word("hello")
    assert hash_word("hello") != hash_word("hellp")


def test_fused_analyzer_matches_parts():
    df = pd.DataFrame({"text": ["the quick brown fox", "der der der der"]})
    fused = TextAnalyzer()(df.copy())
    assert {"lang_pred", "q_n_words", "n_tok_ws", "fingerprint"} <= \
        set(fused.columns)
    parts = TokenCount()(QualityScore()(LangId()(df.copy())))
    for c in ["lang_pred", "q_n_words", "n_tok_ws"]:
        assert fused[c].tolist() == parts[c].tolist()


def test_stable_hash_matches_hash_word():
    import pyarrow as pa
    from feature_extraction_ray.stages.partition import _stable_hash_strings
    words = ["hello", "a", "", "Straße", "x" * 50, "the"]
    got = _stable_hash_strings(pa.array(words))
    for w, h in zip(words, got):
        assert int(h) == hash_word(w), w


def test_fused_analyzer_full_parity_with_reference_stages():
    """The vectorized fused pass must reproduce every column of the
    single-purpose pandas stages bit-for-bit (ASCII inputs)."""
    texts = [
        "the cat sat on the mat and it was a good day for this",
        "der Hund ist mit der Katze und das ist nicht ein Problem",
        "  leading and trailing   whitespace  ",
        "punct! lots, of; punct? yes... 123 42 7",
        "oneword",
        "supercalifragilistic words exceeding six chars repeatedly",
        "",
        "   ",
        "tabs\tand\nnewlines mixed   in between words",
    ]
    df = pd.DataFrame({"text": texts})
    fused = TextAnalyzer()(df.copy())
    ref = TokenCount()(QualityScore()(LangId()(df.copy())))
    import pyarrow as pa
    fp_ref = Fingerprint()(pa.table({"text": texts}))["fingerprint"] \
        .to_pylist()
    assert fused["lang_pred"].tolist() == ref["lang_pred"].tolist()
    for c in ["q_n_chars", "q_n_words", "n_tok_ws", "n_tok_bpe"]:
        assert fused[c].tolist() == ref[c].tolist(), c
    for c in ["q_mean_word_len", "q_stopword_ratio", "q_punct_ratio",
              "q_digit_ratio", "q_long_word_frac"]:
        np.testing.assert_array_equal(
            fused[c].to_numpy(), ref[c].to_numpy(), err_msg=c)
    assert fused["fingerprint"].tolist() == fp_ref


def test_vectorized_fingerprint_matches_rolling_loop():
    from feature_extraction_ray.stages.text import rolling_fingerprint
    texts = ["a b c", "", "one", "x y z w v u t s"]
    import pyarrow as pa
    got = Fingerprint()(pa.table({"text": texts}))["fingerprint"].to_pylist()
    for t, g in zip(texts, got):
        hs = np.array([hash_word(w) for w in t.split()], dtype=np.uint64)
        exp = int(rolling_fingerprint(hs))
        assert (g & 0xFFFFFFFFFFFFFFFF) == exp or \
            np.int64(np.uint64(exp)) == g


def test_unigram_surprisal_matches_naive():
    import math
    import ray.data as rd
    from feature_extraction_ray.stages.text import (fit_unigram_lm,
                                                    surprisal_scores)
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat", "the the the", "dog", "",
                 "cat dog bird", "   "]})
    out = surprisal_scores(rd.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # naive oracle
    words = [w for t in docs["text"] for w in t.split()]
    total = len(words)
    cnt = {}
    for w in words:
        cnt[w] = cnt.get(w, 0) + 1
    exp = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split()
        if ws:
            exp[d] = (len(ws), sum(math.log(cnt[w] / total) for w in ws))
    assert out["doc_id"].tolist() == sorted(exp)      # empty docs dropped
    for _, row in out.iterrows():
        n, s = exp[row["doc_id"]]
        assert row["n_words"] == n
        assert row["sum_logprob"] == pytest.approx(s, rel=1e-12)


def test_unigram_lm_top_k_oov_floor():
    import ray.data as rd
    from feature_extraction_ray.stages.text import (fit_unigram_lm,
                                                    surprisal_scores)
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a a a a b", "a a b c", "z"]})
    lm = fit_unigram_lm(rd.from_pandas(docs), top_k=2)   # keeps a, b
    assert set(lm["logprob"]) == {"a", "b"} and lm["total"] == 10
    out = surprisal_scores(rd.from_pandas(docs), lm=lm).to_pandas() \
        .set_index("doc_id")
    # doc 2 is a single OOV word: floor prob = 1/total
    assert out.loc[2, "sum_logprob"] == pytest.approx(-np.log(10))


def test_tfidf_matches_naive():
    import math
    import ray.data as rd
    from feature_extraction_ray.stages.text import tfidf_scores
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["cat cat dog", "dog bird", "cat", "", "bird bird bird"]})
    out = tfidf_scores(rd.from_pandas(docs)).to_pandas() \
        .sort_values(["doc_id", "word"]).reset_index(drop=True)
    # naive oracle
    split = {d: t.split() for d, t in zip(docs["doc_id"], docs["text"])}
    n_docs = sum(1 for ws in split.values() if ws)
    df = {}
    for ws in split.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    rows = []
    for d, ws in split.items():
        for w in sorted(set(ws)):
            tf = ws.count(w)
            rows.append((d, w, tf, df[w],
                         tf * math.log(n_docs / df[w])))
    exp = pd.DataFrame(rows, columns=["doc_id", "word", "tf", "df",
                                      "tfidf"])
    assert out[["doc_id", "word", "tf", "df"]].values.tolist() == \
        exp[["doc_id", "word", "tf", "df"]].values.tolist()
    np.testing.assert_allclose(out["tfidf"], exp["tfidf"], rtol=1e-12)


def test_tfidf_top_k_vocab_cap():
    import ray.data as rd
    from feature_extraction_ray.stages.text import (
        fit_document_frequencies, tfidf_scores)
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b", "a b", "a b", "a z"]})
    m = fit_document_frequencies(rd.from_pandas(docs), top_k=2)
    assert set(m["df"]) == {"a", "b"} and m["n_docs"] == 4
    out = tfidf_scores(rd.from_pandas(docs), model=m).to_pandas()
    z = out[out["word"] == "z"].iloc[0]
    assert z["df"] == 0 and z["tfidf"] == 0.0   # capped-out -> idf 0


def test_bigram_lm_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from feature_extraction_ray.stages.text import (
        bigram_surprisal_scores, fit_bigram_lm)

    docs = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x y x y", "x y", "z", "  "]})
    ds = rd.from_arrow(docs)
    lm = fit_bigram_lm(ds, "text")
    # pairs: a: (x,y) (y,x) (x,y); b: (x,y)  -> n12: xy=3, yx=1
    # contexts: x 3 times, y once
    assert lm["total"] == 4
    lp = lm["pair_logprob"]
    assert lp["x\x1fy"] == np.log(np.float64(3) / np.float64(3))
    assert lp["y\x1fx"] == np.log(np.float64(1) / np.float64(1))
    out = bigram_surprisal_scores(ds, lm=lm)
    rows = {r["doc_id"]: r
            for t in (ray.get(x) for x in out.to_arrow_refs())
            for r in t.to_pylist()}
    # single-word and empty docs dropped
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_pairs"] == 3 and rows["b"]["n_pairs"] == 1
    # every observed pair here is deterministic given its context
    # (P(y|x)=3/3, P(x|y)=1/1), so both docs sum to exactly 0.0
    assert rows["a"]["sum_logprob"] == 0.0
    assert rows["b"]["sum_logprob"] == 0.0


def test_bigram_lm_top_k_floor(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from feature_extraction_ray.stages.text import (
        bigram_surprisal_scores, fit_bigram_lm)

    docs = pa.table({
        "doc_id": ["a", "b"],
        "text": ["p q p q p q", "r s"]})
    ds = rd.from_arrow(docs)
    lm = fit_bigram_lm(ds, "text", top_k=2)   # keeps pq(3), qp(2); rs cut
    out = bigram_surprisal_scores(ds, lm=lm)
    rows = {r["doc_id"]: r
            for t in (ray.get(x) for x in out.to_arrow_refs())
            for r in t.to_pylist()}
    assert rows["b"]["sum_logprob"] == -np.log(np.float64(6))  # OOV floor


def test_bm25_hand_computed(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.text import bm25_scores
    # 3 scored docs (one empty doc dropped); query = {"a", "b"}
    # docs: d0 = "a a b", d1 = "c c c c c", d2 = "b"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3]),
        "text": pa.array(["a a b", "c c c c c", "b", "   "])}))
    out = {r["doc_id"]: r for r in
           bm25_scores(ds, ["a", "b"], k1=1.2, b=0.75).take_all()}
    assert set(out) == {0, 1, 2}
    n, avgdl = 3.0, 9.0 / 3.0
    idf_a = math.log(1.0 + (n - 1 + 0.5) / (1 + 0.5))   # df(a)=1
    idf_b = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))   # df(b)=2

    def term(idf, tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))

    assert out[0]["dl"] == 3 and out[1]["dl"] == 5 and out[2]["dl"] == 1
    assert out[0]["bm25"] == pytest.approx(
        term(idf_a, 2, 3) + term(idf_b, 1, 3), abs=1e-12)
    assert out[1]["bm25"] == 0.0          # no query term -> exactly 0
    assert out[2]["bm25"] == pytest.approx(term(idf_b, 1, 1), abs=1e-12)


def test_naive_bayes_hand_computed(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.text import (fit_naive_bayes,
                                                    naive_bayes_scores)
    # label A: "a a b" ; label B: "b b" + empty doc (dropped)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2]),
        "lab": pa.array(["A", "B", "B"]),
        "text": pa.array(["a a b", "b b", "  "])}))
    m = fit_naive_bayes(ds, "lab")
    # V=2, totals: A=3, B=2; priors: A=1/2, B=1/2 (doc 2 empty ->
    # only 2 docs counted)
    assert m["labels"] == ["A", "B"]
    V = 2.0
    lpA = {"a": math.log((2 + 1.0) / (3 + 1.0 * V)),
           "b": math.log((1 + 1.0) / (3 + 1.0 * V))}
    lpB = {"a": math.log((0 + 1.0) / (2 + 1.0 * V)),
           "b": math.log((2 + 1.0) / (2 + 1.0 * V))}
    out = {(r["doc_id"], r["label"]): r["nb_score"]
           for r in naive_bayes_scores(ds, m).take_all()}
    assert len(out) == 4                      # 2 scored docs x 2 labels
    pri = math.log(1.0 / 2.0)
    assert out[(0, "A")] == pytest.approx(
        pri + 2 * lpA["a"] + lpA["b"], abs=1e-12)
    assert out[(0, "B")] == pytest.approx(
        pri + 2 * lpB["a"] + lpB["b"], abs=1e-12)
    assert out[(1, "B")] == pytest.approx(pri + 2 * lpB["b"], abs=1e-12)
    # classification sanity: each doc prefers its own label
    assert out[(0, "A")] > out[(0, "B")]
    assert out[(1, "B")] > out[(1, "A")]
    # OOV floor: scoring a doc with an unseen word uses ln(1/(tot+V))
    ds2 = rd.from_arrow(pa.table({"doc_id": pa.array([9]),
                                  "text": pa.array(["zzz"])}))
    out2 = {r["label"]: r["nb_score"]
            for r in naive_bayes_scores(ds2, m).take_all()}
    assert out2["A"] == pytest.approx(
        pri + math.log(1.0 / (3 + V)), abs=1e-12)


def test_ppmi_hand_computed(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.text import ppmi_cooccurrence
    # "a b a" window 1 -> directed pairs: (a,b), (b,a); N=2
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0]),
                                 "text": pa.array(["a b a"])}))
    out = {(r["w1"], r["w2"]): (r["cooc"], r["ppmi"])
           for r in ppmi_cooccurrence(ds, window=1).take_all()}
    assert out[("a", "b")][0] == 1 and out[("b", "a")][0] == 1
    # n_fwd(a)=1, n_bwd(b)=1 -> ppmi = ln(1*2/(1*1)) = ln 2
    assert out[("a", "b")][1] == pytest.approx(math.log(2), abs=1e-12)
    # window 2 over "a b a": pairs (a,b),(b,a),(a,a); boundaries stay
    # inside docs
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1]),
        "text": pa.array(["a b", "c d"])}))
    out2 = {(r["w1"], r["w2"]) for r in
            ppmi_cooccurrence(ds2, window=2).take_all()}
    assert out2 == {("a", "b"), ("c", "d")}   # no cross-doc (b,c)


def test_discriminative_terms_finds_planted_keyword(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.text import discriminative_terms
    # "zebra" appears only in source A; common words everywhere
    docs = (["the quick fox zebra zebra"] * 5
            + ["the quick fox jumps"] * 5)
    ds = rd.from_arrow(pa.table({
        "source": pa.array(["A"] * 5 + ["B"] * 5),
        "text": pa.array(docs)}))
    out = discriminative_terms(ds, "source", top_k=2).to_pandas()
    top_a = out[(out["source"] == "A") & (out["rnk"] == 1)]
    assert top_a["word"].iloc[0] == "zebra"
    assert top_a["n_lw"].iloc[0] == 10
    # chi2 is two-sided: B's strongest signal is the ABSENCE of
    # "zebra" (n_lw = 0), with its own word "jumps" also in the top-2
    top_b = out[out["source"] == "B"].sort_values("rnk")
    assert top_b["word"].iloc[0] == "zebra"
    assert top_b["n_lw"].iloc[0] == 0
    assert "jumps" in top_b["word"].tolist()
    assert (out.groupby("source").size() == 2).all()


def test_readability_syllable_vectorized_matches_scalar():
    """The vectorized per-word syllable kernel inside readability_scores
    must agree with the scalar features.syllable_count rule on ASCII
    words (the op's documented domain)."""
    import pyarrow as pa
    import ray.data as rd

    from feature_extraction_ray.stages.features import syllable_count
    from feature_extraction_ray.stages.text import readability_scores
    words = ["table", "apple", "cake", "the", "rhythm", "b2b", "le",
             "ale", "bottle", "queue", "idea", "strengths", "a", "eye",
             "people", "simple", "whale", "!!!", "x9", "readability"]
    docs = pa.table({"doc_id": pa.array(range(len(words)), pa.int64()),
                     "text": pa.array(words)})
    out = readability_scores(rd.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    for i, w in enumerate(words):
        assert out.loc[i, "n_syllables"] == syllable_count(w), w


def test_readability_hand_computed_and_nulls():
    import pyarrow as pa
    import ray.data as rd

    from feature_extraction_ray.stages.text import readability_scores
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["The cat sat. The cat ran!", "   ", "wow"])})
    out = readability_scores(rd.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc 0: 6 words, 2 sentences, 6 one-syllable words ("the" has
    # runs e = 1, minus final e, floor 1)
    assert out.loc[0, ["n_words", "n_sents", "n_syllables"]].tolist() \
        == [6, 2, 6]
    wps, spw = 6.0 / 2.0, 6.0 / 6.0
    assert out.loc[0, "fre"] == (206.835 - 1.015 * wps) - 84.6 * spw
    assert out.loc[0, "fk_grade"] == (0.39 * wps + 11.8 * spw) - 15.59
    # whitespace-only doc: 0 words -> null scores, sentence floor 1
    assert out.loc[1, ["n_words", "n_sents", "n_syllables"]].tolist() \
        == [0, 1, 0]
    assert pd.isna(out.loc[1, "fre"]) and pd.isna(out.loc[1, "fk_grade"])
    # no terminal punctuation: n_sents floors at 1
    assert out.loc[2, ["n_words", "n_sents", "n_syllables"]].tolist() \
        == [1, 1, 1]


def test_naive_bayes_top_k_cap(ray_session):
    import math
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.text import fit_naive_bayes
    # word totals: b=4, a=2, c=1 -> top_k=2 keeps {b, a}; c -> OOV
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1]),
        "lab": pa.array(["A", "B"]),
        "text": pa.array(["a a b c", "b b b"])}))
    m = fit_naive_bayes(ds, "lab", top_k=2)
    assert sorted(m["word_index"]) == ["a", "b"]
    # V is the CAPPED vocab size; label A totals drop c: 3 kept tokens
    V = 2.0
    wi = m["word_index"]
    la = m["labels"].index("A")
    assert m["logp"][wi["a"], la] == pytest.approx(
        math.log((2 + 1.0) / (3 + V)), abs=1e-12)
    assert m["oov"][la] == pytest.approx(
        math.log(1.0 / (3 + V)), abs=1e-12)
    # uncapped fit keeps all three words
    assert sorted(fit_naive_bayes(ds, "lab")["word_index"]) == \
        ["a", "b", "c"]
    # tie-break: equal totals keep the lexicographically smallest
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0]), "lab": pa.array(["A"]),
        "text": pa.array(["x y"])}))
    assert sorted(fit_naive_bayes(ds2, "lab",
                                  top_k=1)["word_index"]) == ["x"]
    import pytest as _pt
    with _pt.raises(ValueError):
        fit_naive_bayes(ds, "lab", top_k=0)
