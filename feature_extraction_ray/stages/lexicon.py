"""Category-lexicon (LIWC-style) features — G5, with A2 actor state.

The reference loads the proprietary LIWC 2007 dictionary at import time
(``text_features/extract_liwc_2007.py:15-16``; path in
``text_features/config.py:7-10``) and counts category matches over
unigrams PLUS within-segment bigrams/trigrams, normalized by word count
(``:19-56``). The dictionary itself is licensed and absent here, so the
engine ships the *machinery* — a prefix-trie parser supporting LIWC's
``word*`` wildcard entries, loaded once per actor — and tests use a
synthetic category lexicon. Plug a real LIWC .dic via ``categories=``.
"""

from __future__ import annotations

from typing import Mapping, Sequence


def parse_liwc_dic(text: str) -> dict[str, list[str]]:
    """Parse the standard LIWC ``.dic`` format (the format itself is
    public; the 2007 dictionary CONTENT is licensed and must be supplied
    by the user) into a ``{category: [entries...]}`` mapping ready for
    :class:`TokenTrie`.

    Format: a ``%``-delimited header of ``id<TAB>name`` category rows,
    then ``word[*]<TAB>id id ...`` entry rows (``extract_liwc_2007.py:15``
    loads the same file via ``liwc.load_token_parser``). Conditional
    groups in parentheses / angle brackets (a LIWC2007 quirk on a handful
    of entries) are ignored with their ids, matching common open-source
    loaders' behavior.
    """
    lines = [ln.rstrip("\n") for ln in text.splitlines()]
    cat_by_id: dict[str, str] = {}
    cats: dict[str, list[str]] = {}
    in_header = False
    header_done = False
    for ln in lines:
        s = ln.strip()
        if not s:
            continue
        if s == "%":
            if not in_header and not header_done:
                in_header = True
            else:
                in_header = False
                header_done = True
            continue
        if in_header:
            parts = s.split()
            if len(parts) >= 2 and parts[0].isdigit():
                cat_by_id[parts[0]] = parts[1]
                cats.setdefault(parts[1], [])
            continue
        # entry row: word followed by category ids; drop conditionals
        parts = s.split()
        if not parts:
            continue
        word = parts[0].lower()
        depth = 0
        for tok in parts[1:]:
            depth += tok.count("(") + tok.count("<")
            closing = tok.count(")") + tok.count(">")
            if depth == 0 and tok.isdigit():
                name = cat_by_id.get(tok)
                if name is not None:
                    cats[name].append(word)
            depth = max(depth - closing, 0)
    return cats


def load_liwc_dic(path: str) -> dict[str, list[str]]:
    """Read a LIWC ``.dic`` file from disk → :func:`parse_liwc_dic`."""
    with open(path, encoding="utf-8", errors="replace") as f:
        return parse_liwc_dic(f.read())


class TokenTrie:
    """Prefix trie: exact entries and ``prefix*`` wildcard entries map a
    token (or space-joined n-gram) to its category list."""

    def __init__(self, categories: Mapping[str, Sequence[str]]):
        self.exact: dict[str, list[str]] = {}
        self.wild: list[tuple[str, str]] = []  # (prefix, category)
        for cat, entries in categories.items():
            for e in entries:
                if e.endswith("*"):
                    self.wild.append((e[:-1], cat))
                else:
                    self.exact.setdefault(e, []).append(cat)
        # longest prefixes first so the most specific wildcard wins a scan
        self.wild.sort(key=lambda t: -len(t[0]))
        self.cat_names = sorted(categories.keys())

    def parse(self, token: str) -> list[str]:
        cats = list(self.exact.get(token, ()))
        for prefix, cat in self.wild:
            if token.startswith(prefix):
                cats.append(cat)
        return cats


def liwc_features(segments: list[list[str]], trie: TokenTrie) -> dict:
    """G5: per-category (unigram + within-segment bigram/trigram match
    counts) / word count — exact reference formula
    (``extract_liwc_2007.py:29-56``): n-gram matches weigh the same as
    single words; NaN per category when the group is empty."""
    words = [w for seg in segments for w in seg]
    num_words = float(len(words))
    feats = {}
    if not num_words:
        return {f"{c}_liwc": float("nan") for c in trie.cat_names}
    counts: dict[str, float] = {c: 0.0 for c in trie.cat_names}
    for w in words:
        for c in trie.parse(w):
            counts[c] += 1.0
    for seg in segments:
        for i in range(len(seg) - 1):
            for c in trie.parse(seg[i] + " " + seg[i + 1]):
                counts[c] += 1.0
            if i < len(seg) - 2:
                for c in trie.parse(
                        seg[i] + " " + seg[i + 1] + " " + seg[i + 2]):
                    counts[c] += 1.0
    return {f"{c}_liwc": counts[c] / num_words for c in trie.cat_names}


# A small synthetic lexicon so the pipeline is runnable/testable without
# the licensed LIWC data (structure mirrors LIWC: categories with exact
# words, wildcards, and multiword entries).
DEMO_CATEGORIES = {
    "posemo": ["good", "great", "happ*", "love", "like"],
    "negemo": ["bad", "sad*", "hate", "awful"],
    "social": ["you", "we", "they", "friend*", "you know"],
    "cogmech": ["think*", "know", "because", "i mean"],
    "filler": ["uh", "um", "you know", "i mean", "like"],
}


def pos_features(tagged_segments: list[list[tuple[str, str]]],
                 num_words: int | None = None) -> dict:
    """G6: POS-class proportions + ratios from (word, Penn-tag) segments —
    exact reference mapping and ratio formulas
    (``text_features/extract_pos.py:17-67,70-102``)."""
    keys = ["ADJ", "VERB", "NOUN", "ADV", "DET", "INT", "PREP", "CC",
            "PNOUN", "PSNOUN"]
    d = {k: 0 for k in keys}
    n = 0
    for seg in tagged_segments:
        n += len(seg)
        for _, tag in seg:
            if tag.startswith("J"):
                d["ADJ"] += 1
            elif tag.startswith("V"):
                d["VERB"] += 1
            elif tag.startswith("N"):
                d["NOUN"] += 1
            elif tag.startswith("R"):
                d["ADV"] += 1
            elif tag.startswith("D"):
                d["DET"] += 1
            elif tag.startswith("U"):
                d["INT"] += 1
            elif tag.startswith("I") or tag.startswith("T"):
                d["PREP"] += 1
            elif tag == "CC":
                d["CC"] += 1
            elif tag == "PRP":
                d["NOUN"] += 1
                d["PNOUN"] += 1
            elif tag == "PRP$":
                d["PSNOUN"] += 1
                d["NOUN"] += 1
            elif tag.startswith("W"):
                if tag[1] == "D":
                    d["DET"] += 1
                elif tag[1] == "R":
                    d["ADV"] += 1
                elif tag.endswith("P"):
                    d["PNOUN"] += 1
                    d["NOUN"] += 1
                else:
                    d["PSNOUN"] += 1
    out: dict = dict(d)
    out["adj_ratio"] = d["ADJ"] / d["VERB"] if d["VERB"] else float("nan")
    out["v_ratio"] = d["NOUN"] / d["VERB"] if d["VERB"] else float("nan")
    out["n_ratio"] = (d["NOUN"] / (d["VERB"] + d["NOUN"])
                      if (d["VERB"] + d["NOUN"]) else float("nan"))
    out["pn_ratio"] = d["PNOUN"] / d["NOUN"] if d["NOUN"] else float("nan")
    out["sc_ratio"] = d["PREP"] / d["CC"] if d["CC"] else float("nan")
    nw = num_words if num_words is not None else n
    for k in keys:
        out[k] = (d[k] / float(nw)) if nw else float("nan")
    return out
