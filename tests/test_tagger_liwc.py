"""Real tagger / morphy lemmatizer / LIWC .dic loader / syllable tests."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.tagger import (
    EnglishTagger, MorphyLemmatizer, TagLemmaStage, tag_and_lemmatize)
from feature_extraction_ray.stages.lexicon import (
    TokenTrie, liwc_features, parse_liwc_dic)
from feature_extraction_ray.stages.features import (
    pos_real_features, syllable_count)


def test_english_tagger_lexicon_and_suffix():
    t = EnglishTagger()
    assert t.tag_word("the") == "DT"
    assert t.tag_word("and") == "CC"
    assert t.tag_word("running") == "VBG"
    assert t.tag_word("walked") == "VBD"
    assert t.tag_word("quickly") == "RB"
    assert t.tag_word("beautiful") == "JJ"
    assert t.tag_word("happiness") == "NN"
    assert t.tag_word("cats") == "NNS"
    assert t.tag_word("42") == "CD"
    assert t.tag_word("London") == "NNP"
    assert t.tag_word("table") == "JJ" or t.tag_word("chair") == "NN"


def test_english_tagger_context_rules():
    t = EnglishTagger()
    # 'to walk': walk alone -> NN (no suffix), context fixes to VB
    tags = t.tag(["i", "want", "to", "walk"])
    assert tags[2] == "TO" and tags[3] == "VB"
    tags2 = t.tag(["she", "can", "dance"])
    assert tags2[1] == "MD" and tags2[2] == "VB"


def test_morphy_lemmatizer_rules_and_irregulars():
    m = MorphyLemmatizer()
    assert m.lemmatize("cats", "n") == "cat"
    assert m.lemmatize("churches", "n") == "church"
    assert m.lemmatize("knives", "n") == "knife"
    assert m.lemmatize("went", "v") == "go"
    assert m.lemmatize("children", "n") == "child"
    assert m.lemmatize("better", "a") == "good"
    assert m.lemmatize("bigger", "a") == "bigg"  # no lexicon: first rule
    # with a lexicon: true morphy candidate checking + undoubling
    m2 = MorphyLemmatizer(lexicon={"big", "run", "walk", "stop", "fall"})
    assert m2.lemmatize("bigger", "a") == "big"
    assert m2.lemmatize("running", "v") == "run"
    assert m2.lemmatize("stopped", "v") == "stop"
    assert m2.lemmatize("falling", "v") == "fall"
    assert m2.lemmatize("walked", "v") == "walk"
    assert m2.lemmatize("walk", "v") == "walk"


def test_tag_lemma_stage_matches_sequence_tagger():
    texts = ["i want to walk the dogs", "she can dance and he said yes",
             "", "   ", "The children went quickly"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    out = tag_and_lemmatize(ds, concurrency=(1, 2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    t = EnglishTagger()
    m = MorphyLemmatizer()
    for i, txt in enumerate(texts):
        ws = txt.split()
        exp_tags = t.tag(ws)
        assert list(out["pos"].iloc[i]) == exp_tags, txt
        exp_lem = [m.lemmatize_by_tag(w, tg) for w, tg in zip(ws, exp_tags)]
        assert list(out["lemmas"].iloc[i]) == exp_lem, txt


def test_tag_lemma_stage_stub_plug():
    from feature_extraction_ray.stages.textprep import fake_pos_tag
    ds = rd.from_arrow(pa.table({"text": ["the zebra runs"]}))
    out = tag_and_lemmatize(ds, tagger="stub",
                            concurrency=(1, 2)).to_pandas()
    assert list(out["pos"].iloc[0]) == [fake_pos_tag(w)
                                        for w in "the zebra runs".split()]


def test_pos_real_features_nondegenerate():
    segs = [["i", "want", "to", "walk", "the", "happy", "dogs"],
            ["she", "quickly", "walked", "and", "he", "said", "yes"]]
    f = pos_real_features(segs)
    assert f["VERB"] > 0 and f["NOUN"] > 0 and f["DET"] > 0
    assert f["ADV"] > 0 and f["ADJ"] > 0
    assert 0 < f["n_ratio"] < 1


_DIC = """%
1\tfunct
2\tpronoun
126\tposemo
127\tnegemo
%
happ*\t126
sad\t127
i\t1 2
kind\t126 (1 127)
like\t1 126
"""


def test_parse_liwc_dic_and_trie():
    cats = parse_liwc_dic(_DIC)
    assert set(cats) == {"funct", "pronoun", "posemo", "negemo"}
    assert "happ*" in cats["posemo"]
    assert "sad" in cats["negemo"]
    assert "i" in cats["funct"] and "i" in cats["pronoun"]
    # conditional group ids are ignored, the unconditional id kept
    assert "kind" in cats["posemo"] and "kind" not in cats["negemo"]
    assert "like" in cats["funct"] and "like" in cats["posemo"]
    trie = TokenTrie(cats)
    assert "posemo" in trie.parse("happiness")
    feats = liwc_features([["i", "am", "happy"]], trie)
    assert feats["posemo_liwc"] == 1 / 3
    assert feats["pronoun_liwc"] == 1 / 3


def test_syllable_textstat_algorithm():
    # hand-computed via the published heuristic
    for w, n in [("cat", 1), ("hello", 2), ("make", 1), ("little", 2),
                 ("whale", 1), ("beautiful", 3), ("table", 2),
                 ("queue", 1), ("syllable", 3), ("fire", 1),
                 ("created", 2), ("the", 1), ("rhythm", 1), ("", 0)]:
        assert syllable_count(w) == n, w


def test_truecase_fit_and_apply():
    from feature_extraction_ray.stages.textprep import (
        apply_truecase, fit_truecase, truecase_rewrite)
    texts = [
        "We visited Paris in June. Paris was lovely.",
        "The trip to Paris was long. We still think about Paris.",
        "Back home we told everyone about IBM. The IBM office called.",
        "the lowercase transcript mentions paris and ibm today.",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    model = fit_truecase(ds)
    # mid-sentence statistics learn the cased forms...
    assert model.get("paris") == "Paris"
    assert model.get("ibm") == "IBM"
    # ...but sentence-initial 'The'/'We' must NOT force capitalization
    assert "the" not in model and "we" not in model
    out = apply_truecase(rd.from_arrow(pa.table({
        "doc_id": [0], "text": ["the transcript mentions paris and ibm"]})),
        model, out_col="text_tc").to_pandas()
    assert out["text_tc"].iloc[0] == \
        "the transcript mentions Paris and IBM"
    # end-to-end flow runs and preserves row count
    full = truecase_rewrite(ds, out_col="text_tc").to_pandas()
    assert len(full) == len(texts)
    assert "Paris" in full.sort_values("doc_id")["text_tc"].iloc[3]


def test_sentence_split_abbreviations():
    from feature_extraction_ray.stages.textprep import split_sentences
    assert split_sentences("One two. Three! Four? five") == \
        ["One two.", "Three!", "Four?", "five"]
    assert split_sentences("Dr. Smith arrived. He sat down.") == \
        ["Dr. Smith arrived.", "He sat down."]
    assert split_sentences("See J. Smith et al. for details.") == \
        ["See J. Smith et al. for details."]
    assert split_sentences("Pi is 3. 14 is not pi. Done.") == \
        ["Pi is 3. 14 is not pi.", "Done."]
