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
    # successors -> low pair score. (gensim scores scale with vocab size,
    # so the threshold is corpus-dependent; reference used 100 with a
    # ~10^4 vocab, here V≈50 -> use 0.5)
    docs = []
    for i in range(30):
        docs.append("i went to new york yesterday")
        docs.append(f"the cat sat on the mat {i}")
        docs.append(f"the dog ran to the store {i}")
        docs.append("new york is big")
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    table = TP.fit_phrases(ds, min_count=5, threshold=0.5)
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
