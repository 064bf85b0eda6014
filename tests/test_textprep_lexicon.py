"""M-series preprocessing, A5 phrase model, G5 lexicon, G6 POS tests."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray.stages import lexicon as LX
from feature_extraction_ray.stages import textprep as TP


def test_punct_strip_reference_pattern():
    assert TP.strip_punctuation("don't stop, (ever)!") == "don't stop ever"
    assert TP.strip_punctuation("a-b c_d") == "ab c_d"  # \w keeps _


def test_sentence_split():
    assert TP.split_sentences("One two. Three! Four? five") == \
        ["One two.", "Three!", "Four?", "five"]


def test_nonverbal_removal_drops_emptied_segments():
    segs = [["hello", "[noise]"], ["[laughter]"], ["<unk>", "world"]]
    assert TP.remove_nonverbal_segments(segs) == [["hello"], ["world"]]


def test_lemmatize_and_fake_tagger_deterministic():
    assert TP.lemmatize_word("Running") == "runn"
    assert TP.lemmatize_word("cats") == "cat"
    assert TP.lemmatize_word("is") == "is"
    assert TP.fake_pos_tag("the") == "DT"
    assert TP.fake_pos_tag("and") == "CC"
    assert TP.fake_pos_tag("zebra") == TP.fake_pos_tag("zebra")


def test_phrase_model_two_pass():
    # "new york": always together; "the": common but dispersed over many
    # successors -> low pair score. (gensim scores scale with vocab size
    # — which counts bigram entries too — so the threshold is
    # corpus-dependent; reference used 100 with a ~10^4 vocab, here
    # V≈120 -> 1.2 separates new_york (~1.9) from the_cat (~0.85))
    docs = []
    for i in range(30):
        docs.append("i went to new york yesterday")
        docs.append(f"the cat sat on the mat {i}")
        docs.append(f"the dog ran to the store {i}")
        docs.append("new york is big")
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    table = TP.fit_phrases(ds, min_count=5, threshold=1.2)
    assert ("new", "york") in table
    assert ("the", "cat") not in table
    out = TP.apply_phrases(ds, table).to_pandas()
    joined = " ".join(out["text"])
    assert "new_york" in joined and "new york" not in joined


def test_liwc_style_features_formula():
    trie = LX.TokenTrie(LX.DEMO_CATEGORIES)
    segs = [["i", "love", "you"], ["you", "know", "happiness"]]
    f = LX.liwc_features(segs, trie)
    # words: love(posemo) you(social) you(social) know(cogmech)
    # happiness matches happ* (posemo); bigram "you know" (social+filler)
    n = 6.0
    assert f["posemo_liwc"] == pytest.approx(2 / n)
    assert f["social_liwc"] == pytest.approx((2 + 1) / n)
    assert f["cogmech_liwc"] == pytest.approx(1 / n)
    assert f["filler_liwc"] == pytest.approx(1 / n)
    empty = LX.liwc_features([], trie)
    assert all(np.isnan(v) for v in empty.values())


def test_pos_features_reference_formulas():
    tagged = [[("big", "JJ"), ("dogs", "NNS"), ("run", "VB")],
              [("they", "PRP"), ("ran", "VBD"), ("quickly", "RB")]]
    f = LX.pos_features(tagged)
    # counts: ADJ=1 NOUN=2(dogs + PRP) VERB=2 ADV=1 PNOUN=1
    assert f["adj_ratio"] == pytest.approx(1 / 2)
    assert f["v_ratio"] == pytest.approx(2 / 2)
    assert f["n_ratio"] == pytest.approx(2 / 4)
    assert f["pn_ratio"] == pytest.approx(1 / 2)
    assert np.isnan(f["sc_ratio"])          # no CC
    assert f["ADJ"] == pytest.approx(1 / 6)  # proportions over words
    assert f["NOUN"] == pytest.approx(2 / 6)


def _gensim_original_scorer_table(sentences, min_count, threshold):
    """Pure-python replica of gensim.models.phrases.Phrases with the
    default original_scorer (Mikolov et al. 2013), per the public gensim
    source/docs: vocab holds every unigram AND delimiter-joined bigram
    occurrence; score = (c_ab - min_count) / c_a / c_b * len(vocab);
    a pair is a phrase when score > threshold."""
    vocab = {}
    for s in sentences:
        ws = s.split()
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            g = a + "\x00" + b
            vocab[g] = vocab.get(g, 0) + 1
    table = {}
    for g, c_ab in vocab.items():
        if "\x00" not in g:
            continue
        a, b = g.split("\x00")
        score = (c_ab - min_count) / (vocab[a] * vocab[b]) * len(vocab)
        if score > threshold:
            table[(a, b)] = score
    return table


def test_fit_phrases_matches_gensim_original_scorer():
    rng = np.random.default_rng(41)
    vocab = [f"t{i}" for i in range(30)]
    sentences = [" ".join(rng.choice(vocab, size=12)) for _ in range(80)]
    sentences += ["big apple tastes great", "big apple is my town"] * 10
    ds = rd.from_pandas(pd.DataFrame({"text": sentences}))
    for min_count, threshold in [(5, 10.0), (3, 1.0), (1, 0.1)]:
        got = TP.fit_phrases(ds, min_count=min_count, threshold=threshold)
        exp = _gensim_original_scorer_table(sentences, min_count, threshold)
        assert set(got) == set(exp), (min_count, threshold)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], rel=1e-12), k
    # hand-computed spot value: "big apple" occurs 20x, "big" 20x,
    # "apple" 20x; with min_count=5 score = 15/(20*20)*len(vocab)
    got = TP.fit_phrases(ds, min_count=5, threshold=10.0)
    exp_full = _gensim_original_scorer_table(sentences, 5, 10.0)
    v = len({w for s in sentences for w in s.split()} |
            {a + "\x00" + b for s in sentences
             for a, b in zip(s.split(), s.split()[1:])})
    assert exp_full[("big", "apple")] == pytest.approx(15 / 400 * v)


def test_chunk_text_sliding_windows(ray_session):
    import pyarrow as pa
    from feature_extraction_ray.stages.textprep import chunk_text
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4]),
        "text": pa.array(["a b c d e f g", "x y", "   ", "p q r s"])}))
    out = chunk_text(ds, size=4, stride=2).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    rows = [(r.doc_id, r.chunk_idx, r.start_word, r.n_words,
             r.chunk_text) for r in out.itertuples()]
    assert rows == [
        (1, 1, 1, 4, "a b c d"), (1, 2, 3, 4, "c d e f"),
        (1, 3, 5, 3, "e f g"),                      # remainder tail
        (2, 1, 1, 2, "x y"),                        # short doc: 1 chunk
        (4, 1, 1, 4, "p q r s")]                    # empty doc 3: none
    # exact-fit doc emits no empty tail
    ds2 = rd.from_arrow(pa.table({"doc_id": pa.array([9]),
                                  "text": pa.array(["a b c d"])}))
    out2 = chunk_text(ds2, size=4, stride=2).to_pandas()
    assert len(out2) == 1 and out2["n_words"].iloc[0] == 4
    with pytest.raises(ValueError):
        chunk_text(ds2, size=0, stride=2)


def test_fit_phrases_gensim_original_scorer_parity(ray_session):
    """VERDICT item: pin exact parity with gensim's public
    original_scorer (Mikolov et al.): score = (c_ab - min_count) /
    c_a / c_b * len_vocab, where len_vocab counts BOTH unigram and
    bigram vocabulary entries (gensim stores both in Phrases.vocab)."""
    import pyarrow as pa
    from feature_extraction_ray.stages.textprep import fit_phrases
    docs = ["new york new york city", "new york is big",
            "the city is big", "big city big city"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs))),
        "text": pa.array(docs)}))
    # corpus counts (whitespace tokens, per-doc adjacent bigrams):
    # unigrams: new=3 york=3 city=4 is=2 big=4 the=1
    # bigrams: new_york=3 york_new=1 york_city=1 york_is=1 is_big=2
    #          the_city=1 city_is=1 big_city=2 city_big=1
    # len_vocab = 6 unigrams + 9 bigrams = 15
    uni = {"new": 3, "york": 3, "city": 4, "is": 2, "big": 4, "the": 1}
    bi = {("new", "york"): 3, ("york", "new"): 1, ("york", "city"): 1,
          ("york", "is"): 1, ("is", "big"): 2, ("the", "city"): 1,
          ("city", "is"): 1, ("big", "city"): 2, ("city", "big"): 1}
    len_vocab = len(uni) + len(bi)

    def gensim_original_scorer(a, b):
        # gensim's exact IEEE order: /ca then /cb then *len_vocab
        return (bi[(a, b)] - 2) / uni[a] / uni[b] * len_vocab

    table = fit_phrases(ds, min_count=2, threshold=0.5)
    exp = {}
    for (a, b), c_ab in bi.items():
        if c_ab < 2:
            continue
        s = gensim_original_scorer(a, b)
        if s > 0.5:
            exp[(a, b)] = s
    assert set(table) == set(exp)
    for k in exp:
        assert table[k] == pytest.approx(exp[k], rel=1e-12), k
    # min_count boundary: c_ab == min_count scores 0 -> excluded for
    # any positive threshold (gensim-equivalent)
    t0 = fit_phrases(ds, min_count=3, threshold=0.0)
    assert ("is", "big") not in t0 and ("big", "city") not in t0


def test_apply_phrases_vectorized_matches_greedy_loop(ray_session):
    """The flattened-word-stream rewrite must reproduce gensim's
    sequential greedy pairing exactly (including chained-run parity:
    'a b b b' with (a,b) and (b,b) scored merges a_b then b_b)."""
    import numpy as np
    import ray.data as rd
    from feature_extraction_ray.stages.textprep import apply_phrases

    def greedy(txt, table):
        ws = txt.split()
        out, i = [], 0
        while i < len(ws):
            if i + 1 < len(ws) and (ws[i], ws[i + 1]) in table:
                out.append(f"{ws[i]}_{ws[i + 1]}")
                i += 2
            else:
                out.append(ws[i])
                i += 1
        return " ".join(out)

    table = {("a", "b"): 2.0, ("b", "b"): 1.5, ("b", "a"): 1.1,
             ("new", "york"): 9.0, ("é", "ü"): 3.0}
    rng = np.random.default_rng(42)
    vocab = ["a", "b", "c", "new", "york", "é", "ü"]
    docs = ["", "   ", "a b", "a b b b", "b a b a b",
            "  a   b\tb  b ", "new york new york", "c", "a", "b b b b b"]
    for _ in range(200):
        L = rng.integers(0, 12)
        docs.append(" ".join(rng.choice(vocab, L)))
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    got = apply_phrases(ds, table).to_pandas()["text"].tolist()
    # from_pandas may reorder blocks? compare as aligned lists via take order
    assert got == [greedy(t, table) for t in docs]
    # out_col variant + empty table no-op
    got2 = apply_phrases(ds, {}, out_col="t2").to_pandas()
    assert got2["t2"].tolist() == [" ".join(t.split()) for t in docs]


# --------------------------------------------------- text canonicalization

def test_canonicalize_text_unicode_and_ws():
    import unicodedata
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.textprep import canonicalize_text
    decomposed = "Café  du \t Monde"
    precomposed = "Caf\u00e9 du Monde"  # U+00E9, truly composed
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([decomposed, "  " + precomposed + " \t"])}))
    out = canonicalize_text(ds).to_pandas().set_index("doc_id")
    # both variants land on the SAME canonical (NFD, collapsed) string,
    # matching stdlib unicodedata.normalize exactly
    want = unicodedata.normalize("NFD", "Caf\u00e9 du Monde")
    assert out.loc[1, "text"] == want
    assert out.loc[2, "text"] == want
    # lower + out_col append; original column untouched
    out2 = canonicalize_text(ds, lower=True, out_col="canon") \
        .to_pandas().set_index("doc_id")
    assert out2.loc[1, "canon"] == unicodedata.normalize(
        "NFD", "caf\u00e9 du monde")
    assert out2.loc[1, "text"] == decomposed


def test_canonicalize_text_rejects_composed_forms():
    import pytest
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.textprep import canonicalize_text
    ds = rd.from_arrow(pa.table({"text": pa.array(["x"])}))
    # pyarrow's utf8_normalize cannot COMPOSE (measured: NFC of a
    # decomposed string stays decomposed) — the engine fails loudly
    # instead of mislabeling its output
    with pytest.raises(ValueError):
        canonicalize_text(ds, form="NFC")
    # form=None skips normalization entirely
    out = canonicalize_text(ds, form=None).to_pandas()
    assert out.loc[0, "text"] == "x"
