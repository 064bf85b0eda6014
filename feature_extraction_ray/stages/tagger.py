"""Self-contained English POS tagger + lemmatizer (M4–M6 / A1 / A3 / A4).

The reference tags with NLTK's averaged-perceptron tagger and lemmatizes
with WordNet (``text_features/extract_pos.py:86-94``,
``text_features/text_util.py:36-47``). Neither model ships in this
container, so the engine provides:

* :class:`EnglishTagger` — a deterministic lexicon + suffix-rule + context
  tagger built entirely from public knowledge: a closed-class function-word
  lexicon (Penn tags), suffix/shape rules in the spirit of NLTK's published
  ``RegexpTagger`` default patterns, and two Brill-style contextual fixups.
  Accuracy is of course below a trained perceptron, but tags are real Penn
  tags driven by real morphology — feature DISTRIBUTIONS (pos ratios,
  graph-POS packs) become meaningful, unlike the hash-seeded stub.
* :class:`MorphyLemmatizer` — WordNet's *morphy* detachment algorithm
  (publicly documented rule list) with an embedded irregular-form
  exception table; pass ``lexicon=`` a base-form vocabulary to get full
  morphy candidate checking, else the first applicable detachment wins.
* :class:`TagLemmaStage` — the actor-pool ``map_batches`` stage: models
  built ONCE per actor in ``__init__`` (the A1/A3/A4 state pattern), each
  batch tagged via dictionary-encode → tag unique words once → gather,
  with the contextual fixups applied vectorized on the flat token stream.

Any tagger object with a ``tag(words: list[str]) -> list[str]`` method can
be plugged into the stage (``tagger=`` factory), including the test stub
(``textprep.fake_pos_tag``) — swap NLTK in the same slot when available.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# ---------------------------------------------------------------------------
# Closed-class lexicon (public, standard English function words; most-common
# Penn tag per word)
# ---------------------------------------------------------------------------

_LEXICON = {
    # determiners / articles
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT", "each": "DT", "every": "DT", "some": "DT",
    "any": "DT", "no": "DT", "all": "DT", "both": "DT", "another": "DT",
    # conjunctions
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC", "yet": "CC",
    "so": "CC", "plus": "CC",
    # prepositions / subordinating conjunctions
    "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN",
    "with": "IN", "about": "IN", "against": "IN", "between": "IN",
    "into": "IN", "through": "IN", "during": "IN", "before": "IN",
    "after": "IN", "above": "IN", "below": "IN", "from": "IN", "up": "IN",
    "down": "IN", "of": "IN", "off": "IN", "over": "IN", "under": "IN",
    "if": "IN", "because": "IN", "while": "IN", "since": "IN",
    "until": "IN", "although": "IN", "though": "IN", "unless": "IN",
    "upon": "IN", "among": "IN", "within": "IN", "without": "IN",
    "like": "IN", "than": "IN", "as": "IN",
    "to": "TO",
    # pronouns
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "me": "PRP", "him": "PRP", "her": "PRP",
    "us": "PRP", "them": "PRP", "myself": "PRP", "yourself": "PRP",
    "himself": "PRP", "herself": "PRP", "itself": "PRP",
    "ourselves": "PRP", "themselves": "PRP", "someone": "PRP",
    "anyone": "PRP", "everyone": "PRP", "nobody": "PRP", "something": "PRP",
    "anything": "PRP", "everything": "PRP", "nothing": "PRP",
    # possessive pronouns
    "my": "PRP$", "your": "PRP$", "his": "PRP$", "its": "PRP$",
    "our": "PRP$", "their": "PRP$", "mine": "PRP$", "yours": "PRP$",
    "hers": "PRP$", "ours": "PRP$", "theirs": "PRP$",
    # wh-words
    "which": "WDT", "whatever": "WDT", "whichever": "WDT",
    "who": "WP", "whom": "WP", "what": "WP",
    "whose": "WP$",
    "where": "WRB", "when": "WRB", "why": "WRB", "how": "WRB",
    # modals
    "can": "MD", "could": "MD", "may": "MD", "might": "MD", "must": "MD",
    "shall": "MD", "should": "MD", "will": "MD", "would": "MD",
    "cannot": "MD",
    # auxiliaries / common verbs (base + inflected, most-common tag)
    "be": "VB", "am": "VBP", "is": "VBZ", "are": "VBP", "was": "VBD",
    "were": "VBD", "been": "VBN", "being": "VBG",
    "have": "VBP", "has": "VBZ", "had": "VBD", "having": "VBG",
    "do": "VBP", "does": "VBZ", "did": "VBD", "doing": "VBG", "done": "VBN",
    "get": "VB", "got": "VBD", "gotten": "VBN",
    "go": "VB", "goes": "VBZ", "went": "VBD", "gone": "VBN",
    "say": "VB", "says": "VBZ", "said": "VBD",
    "know": "VB", "knew": "VBD", "known": "VBN",
    "think": "VB", "thought": "VBD",
    "see": "VB", "saw": "VBD", "seen": "VBN",
    "make": "VB", "made": "VBD",
    "take": "VB", "took": "VBD", "taken": "VBN",
    "come": "VB", "came": "VBD",
    "give": "VB", "gave": "VBD", "given": "VBN",
    "find": "VB", "found": "VBD",
    "tell": "VB", "told": "VBD",
    # adverbs / particles / negation
    "not": "RB", "n't": "RB", "never": "RB", "always": "RB", "often": "RB",
    "very": "RB", "too": "RB", "also": "RB", "just": "RB", "then": "RB",
    "there": "RB", "here": "RB", "now": "RB", "again": "RB", "once": "RB",
    "only": "RB", "quite": "RB", "rather": "RB", "really": "RB",
    "still": "RB", "even": "RB", "maybe": "RB", "perhaps": "RB",
    "more": "RBR", "most": "RBS", "less": "RBR", "least": "RBS",
    # interjections / fillers (reference corpora are conversational)
    "oh": "UH", "uh": "UH", "um": "UH", "uhhuh": "UH", "hmm": "UH",
    "yeah": "UH", "yes": "UH", "okay": "UH", "ok": "UH", "well": "UH",
    "hi": "UH", "hello": "UH", "wow": "UH", "hey": "UH", "mhm": "UH",
    # existential / misc
    "one": "CD", "two": "CD", "three": "CD", "four": "CD", "five": "CD",
    "six": "CD", "seven": "CD", "eight": "CD", "nine": "CD", "ten": "CD",
    "zero": "CD", "hundred": "CD", "thousand": "CD", "million": "CD",
}

# suffix rules, first match wins (shape rules in the spirit of NLTK's
# published RegexpTagger defaults)
_SUFFIX_RULES: list[tuple[Callable[[str], bool], str]] = [
    (re.compile(r"^-?\d+(\.\d+)?$").match, "CD"),
    (lambda w: w.endswith("ing") and len(w) > 4, "VBG"),
    (lambda w: w.endswith("ed") and len(w) > 3, "VBD"),
    (lambda w: w.endswith("ly"), "RB"),
    (lambda w: w.endswith(("able", "ible", "ful", "ous", "ive", "ish",
                           "less", "ic", "ical")), "JJ"),
    (lambda w: w.endswith(("ness", "ment", "tion", "sion", "ship", "ance",
                           "ence", "ity", "ism", "ist", "er", "or",
                           "hood", "dom")), "NN"),
    (lambda w: w.endswith("est") and len(w) > 4, "JJS"),
    (lambda w: w.endswith("y") and len(w) > 3 and
     w[-2] not in "aeiou", "JJ"),
    (lambda w: w.endswith("s") and not w.endswith(("ss", "us", "is")),
     "NNS"),
]


class EnglishTagger:
    """Deterministic lexicon + suffix + context Penn tagger (see module
    docstring). ``tag(words)`` is sequence-aware: two Brill-style fixups
    (after TO/MD: noun-ish → VB; after DT/PRP$/JJ: VBG/VBD kept, bare VB →
    NN) run over the unigram tags."""

    def __init__(self, extra_lexicon: dict | None = None):
        self.lex = dict(_LEXICON)
        if extra_lexicon:
            self.lex.update(extra_lexicon)

    def tag_word(self, word: str) -> str:
        """Context-free most-likely tag for one word."""
        lw = word.lower()
        hit = self.lex.get(lw)
        if hit is not None:
            return hit
        for pred, tag in _SUFFIX_RULES:
            if pred(lw):
                return tag
        if word[:1].isupper():
            return "NNP"
        return "NN"

    def tag(self, words: Sequence[str]) -> list[str]:
        tags = [self.tag_word(w) for w in words]
        return self.fix_context(tags)

    @staticmethod
    def fix_context(tags: list[str]) -> list[str]:
        out = list(tags)
        for i in range(1, len(out)):
            prev = out[i - 1]
            if prev in ("TO", "MD") and out[i] in ("NN", "NNS"):
                out[i] = "VB"
            elif prev in ("DT", "PRP$") and out[i] == "VB":
                out[i] = "NN"
        return out


# ---------------------------------------------------------------------------
# Morphy lemmatizer (WordNet detachment rules — public algorithm)
# ---------------------------------------------------------------------------

_MORPHY_SUBS = {
    "n": [("ses", "s"), ("ves", "f"), ("xes", "x"), ("zes", "z"),
          ("ches", "ch"), ("shes", "sh"), ("men", "man"), ("ies", "y"),
          ("s", "")],
    "v": [("ies", "y"), ("es", "e"), ("es", ""), ("ed", "e"), ("ed", ""),
          ("ing", "e"), ("ing", ""), ("s", "")],
    "a": [("er", ""), ("est", ""), ("er", "e"), ("est", "e")],
}

_IRREGULAR = {
    # verbs
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "went": "go", "gone": "go", "had": "have",
    "has": "have", "did": "do", "done": "do", "said": "say", "made": "make",
    "saw": "see", "seen": "see", "took": "take", "taken": "take",
    "came": "come", "knew": "know", "known": "know", "gave": "give",
    "given": "give", "found": "find", "thought": "think", "told": "tell",
    "became": "become", "left": "leave", "felt": "feel",
    "brought": "bring", "wrote": "write", "written": "write",
    "stood": "stand", "lost": "lose", "paid": "pay", "met": "meet",
    "sat": "sit", "spoken": "speak", "led": "lead",
    "grew": "grow", "grown": "grow", "ran": "run", "got": "get",
    "gotten": "get", "held": "hold", "kept": "keep", "meant": "mean",
    "began": "begin", "begun": "begin", "heard": "hear", "sent": "send",
    "built": "build", "spent": "spend", "fell": "fall", "fallen": "fall",
    "bought": "buy", "caught": "catch", "taught": "teach", "sold": "sell",
    "broke": "break", "broken": "break", "chose": "choose",
    "chosen": "choose", "drove": "drive", "driven": "drive", "ate": "eat",
    "eaten": "eat", "flew": "fly", "flown": "fly", "forgot": "forget",
    "forgotten": "forget", "lay": "lie", "slept": "sleep", "spoke": "speak",
    "threw": "throw", "thrown": "throw", "understood": "understand",
    "woke": "wake", "woken": "wake", "wore": "wear", "worn": "wear",
    "won": "win", "read": "read",
    # nouns
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "people": "person",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "selves": "self", "halves": "half",
    # adjectives
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "further": "far", "furthest": "far",
}


class MorphyLemmatizer:
    """WordNet *morphy* detachment (public rule list) + irregular table.

    With ``lexicon`` (an iterable of known base forms) the behavior is
    true morphy: a word already in the lexicon is returned unchanged, and
    the first detachment whose RESULT is in the lexicon wins. Without a
    lexicon, the first applicable detachment (rules ordered longest-suffix
    first) with a ≥2-char stem wins — deterministic but approximate.
    """

    def __init__(self, lexicon: Iterable[str] | None = None):
        self.lexicon = frozenset(w.lower() for w in lexicon) \
            if lexicon is not None else None

    def lemmatize(self, word: str, pos: str = "n") -> str:
        lw = word.lower()
        hit = _IRREGULAR.get(lw)
        if hit is not None:
            return hit
        if self.lexicon is not None and lw in self.lexicon:
            return lw
        rules = _MORPHY_SUBS.get(pos, _MORPHY_SUBS["n"])
        for suf, rep in rules:
            if lw.endswith(suf) and len(lw) - len(suf) + len(rep) >= 2:
                cand = lw[: len(lw) - len(suf)] + rep
                if self.lexicon is None:
                    return cand
                if cand in self.lexicon:
                    return cand
                # productive consonant doubling (run+ing → running):
                # try the un-doubled stem against the lexicon too
                if len(cand) >= 3 and cand[-1] == cand[-2] and \
                        cand[-1] not in "aeiou" and \
                        cand[:-1] in self.lexicon:
                    return cand[:-1]
        return lw              # true morphy: unknown stays unchanged

    def lemmatize_by_tag(self, word: str, penn_tag: str) -> str:
        """Penn tag → morphy POS class (the reference's
        ``get_wordnet_pos`` mapping, ``text_util.py:26-33``)."""
        t = penn_tag[:1].upper()
        pos = {"J": "a", "V": "v", "R": "n", "N": "n"}.get(t, "n")
        return self.lemmatize(word, pos)


# ---------------------------------------------------------------------------
# Actor-pool stage
# ---------------------------------------------------------------------------

class TagLemmaStage:
    """Actor: tagger + lemmatizer built once per actor (A1/A3/A4 state
    pattern); per batch, unique words are tagged/lemmatized ONCE via
    dictionary-encode and gathered back, then contextual fixups run
    vectorized over the flat token stream (doc boundaries respected).

    Input: ``text_col`` (whitespace-tokenizable string). Output columns:
    ``pos`` (list<string> Penn tags), ``lemmas`` (list<string>), aligned
    with the document's words.
    """

    def __init__(self, text_col: str = "text",
                 tagger: Callable[[], object] | str = "lexicon",
                 lemmatizer: Callable[[], object] | None = None):
        self.text_col = text_col
        if tagger == "lexicon":
            self.tagger = EnglishTagger()
        elif tagger == "stub":
            from .textprep import fake_pos_tag

            class _Stub:
                def tag_word(self, w):
                    return fake_pos_tag(w)

                def tag(self, ws):
                    return [fake_pos_tag(w) for w in ws]
            self.tagger = _Stub()
        else:
            self.tagger = tagger()
        self.lemmatizer = lemmatizer() if lemmatizer else MorphyLemmatizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _split_flat
        flat, _lens, offsets, real, n_real = _split_flat(
            batch[self.text_col])
        if real is not None:
            flat = flat.filter(pa.array(real))
        de = flat.dictionary_encode() if len(flat) else None
        if de is not None:
            uniq = de.dictionary.to_pylist()
            codes = de.indices.to_numpy(zero_copy_only=False)
            utags = np.array([self.tagger.tag_word(w) for w in uniq],
                             dtype=object)
            flat_tags = utags[codes]
            # vectorized context fixups on the flat stream: a doc's first
            # word has no prev (mask via offsets)
            prev = np.roll(flat_tags, 1)
            first = np.zeros(len(flat_tags), dtype=bool)
            starts = np.zeros(len(n_real) + 1, dtype=np.int64)
            np.cumsum(n_real, out=starts[1:])
            first[starts[:-1][n_real > 0]] = True
            prev_ok = ~first
            to_md = prev_ok & np.isin(prev, ("TO", "MD")) & \
                np.isin(flat_tags, ("NN", "NNS"))
            flat_tags = np.where(to_md, "VB", flat_tags)
            prev = np.roll(flat_tags, 1)
            dtv = prev_ok & np.isin(prev, ("DT", "PRP$")) & \
                (flat_tags == "VB")
            flat_tags = np.where(dtv, "NN", flat_tags)
            # lemmas: lemmatize each unique (word, pos-class) pair once
            lem = self.lemmatizer
            cls = np.full(len(flat_tags), 2, dtype=np.int64)   # 2 = noun
            cls[np.isin(flat_tags, ("VB", "VBD", "VBG", "VBN",
                                    "VBP", "VBZ"))] = 1
            cls[np.isin(flat_tags, ("JJ", "JJR", "JJS"))] = 0
            keys = codes.astype(np.int64) * 4 + cls
            ukeys, inv = np.unique(keys, return_inverse=True)
            pos_of = {0: "a", 1: "v", 2: "n"}
            ulem = np.array([lem.lemmatize(uniq[int(k >> 2)],
                                           pos_of[int(k & 3)])
                             for k in ukeys], dtype=object)
            flat_lemmas = ulem[inv]
            off = pa.array(starts, type=pa.int32())
            tags_col = pa.ListArray.from_arrays(
                off, pa.array(flat_tags, type=pa.string()))
            lemmas_col = pa.ListArray.from_arrays(
                off, pa.array(flat_lemmas, type=pa.string()))
        else:
            n = len(batch)
            off = pa.array(np.zeros(n + 1, dtype=np.int32))
            tags_col = pa.ListArray.from_arrays(
                off, pa.array([], type=pa.string()))
            lemmas_col = pa.ListArray.from_arrays(
                off, pa.array([], type=pa.string()))
        batch = batch.append_column("pos", tags_col)
        return batch.append_column("lemmas", lemmas_col)


def tag_and_lemmatize(ds: Dataset, text_col: str = "text",
                      tagger: str | Callable = "lexicon",
                      concurrency=(1, 8),
                      batch_size: int = 2048) -> Dataset:
    """M5/M6/A1/A4 as one pass: append ``pos`` and ``lemmas`` list
    columns aligned with each document's whitespace words. The
    tagger+lemmatizer state builds once per worker process
    (:func:`partition.cached_kernel`) — no actor-pool spin-up."""
    from .partition import cached_kernel

    def tag_batch(batch: pa.Table) -> pa.Table:
        return cached_kernel(TagLemmaStage, text_col, tagger)(batch)

    return ds.map_batches(tag_batch, batch_format="pyarrow",
                          batch_size=batch_size)
