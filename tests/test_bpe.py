"""Trained BPE: merge-loop correctness, distributed fit, encode kernel."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from feature_extraction_ray.stages.bpe import (
    _END, _merge_loop, apply_bpe, encode_word, fit_bpe, word_frequencies)


def naive_merge_loop(word_freqs, num_merges):
    """Recount-from-scratch reference for the incremental bookkeeping."""
    symed = {w: tuple(w) + (_END,) for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in symed.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        for w, syms in symed.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symed[w] = tuple(out)
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_merge_loop_sennrich_first_merges():
    merges = _merge_loop(SENNRICH, 4)
    # ties at 9 break lexicographically: ("e","s") first, then the
    # merged pair cascades
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges == naive_merge_loop(SENNRICH, 4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_loop_matches_naive_random(seed):
    rng = np.random.default_rng(seed)
    alphabet = list("abcdef")
    words = {}
    for _ in range(30):
        w = "".join(rng.choice(alphabet, size=rng.integers(1, 7)))
        words[w] = words.get(w, 0) + int(rng.integers(1, 9))
    wf = sorted(words.items())
    assert _merge_loop(wf, 25) == naive_merge_loop(wf, 25)


def test_encode_word_roundtrip_and_ranks():
    merges = _merge_loop(SENNRICH, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w, _ in SENNRICH + [("lowest", 1), ("newer", 1), ("wide", 1)]:
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w + _END  # lossless
    # a fully-merged training word collapses to few pieces
    assert len(encode_word("newest", ranks)) <= 3


def test_word_frequencies_distributed():
    docs = ["the cat sat", "the cat", "THE dog"]
    ds = rd.from_arrow(pa.table({"text": docs}))
    wf = word_frequencies(ds, "text").to_pandas() \
        .set_index("word")["n"].to_dict()
    assert wf == {"the": 3, "cat": 2, "sat": 1, "dog": 1}


def test_fit_and_apply_bpe_end_to_end():
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 +
              ["widest"] * 3)
    ds = rd.from_arrow(pa.table({"text": corpus}))
    merges = fit_bpe(ds, "text", num_merges=6)
    assert merges == _merge_loop(SENNRICH, 6)
    enc = apply_bpe(ds, "text", merges).to_pandas()
    ranks = {m: i for i, m in enumerate(merges)}
    for _, row in enc.iterrows():
        exp = encode_word(row["text"], ranks)
        assert list(row["bpe_tokens"]) == exp
        assert row["n_bpe"] == len(exp)


def test_apply_bpe_multiword_rows_and_empty():
    ds = rd.from_arrow(pa.table({"text": ["aa bb aa", "", "bb"]}))
    merges = [("a", "a"), ("aa", _END), ("b", "b")]
    out = apply_bpe(ds, "text", merges).to_pandas() \
        .sort_values("text").reset_index(drop=True)
    by_text = {r["text"]: (list(r["bpe_tokens"]), r["n_bpe"])
               for _, r in out.iterrows()}
    assert by_text[""] == ([], 0)
    assert by_text["bb"] == (["bb", _END], 2)
    assert by_text["aa bb aa"] == (["aa</w>", "bb", _END, "aa</w>"], 4)
