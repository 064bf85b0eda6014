"""Golden tests: vectorized token-stream stats vs naive reference semantics
(extract_lexical_diversity.py MATTR / Honoré, reimplemented naively here)."""
import numpy as np
import pytest

from feature_extraction_ray.functions import tokenstats as TS
from feature_extraction_ray.functions.windows import mattr as mattr_one


def naive_mattr(words, window):
    if len(words) == 0:
        return float("nan")
    w = min(window, len(words))
    ttrs = [len(set(words[i:i + w])) / w for i in range(len(words) - w + 1)]
    return float(np.mean(ttrs))


def naive_honore(words):
    n = len(words)
    if n == 0:
        return float("nan")
    v = len(set(words))
    v1 = sum(1 for x in words if words.count(x) == 1)
    return 100 * np.log(n / (1 - v1 / (v + 1e-5)))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_group_stats_match_naive(seed):
    rng = np.random.default_rng(seed)
    n_groups = 6
    streams = [rng.integers(0, 12, size=rng.integers(0, 120)).astype(np.int32)
               for _ in range(n_groups)]
    tokens = np.concatenate([s for s in streams if len(s)]) \
        if any(len(s) for s in streams) else np.zeros(0, np.int32)
    gid = np.concatenate([np.full(len(s), g, dtype=np.int64)
                          for g, s in enumerate(streams)]) \
        if any(len(s) for s in streams) else np.zeros(0, np.int64)

    vocab, hapax = TS.vocab_hapax(tokens, gid, n_groups)
    total = np.array([len(s) for s in streams], dtype=np.int64)
    hs = TS.honore(total, vocab, hapax)
    for w in (5, 25, 200):
        got = TS.mattr_groups(tokens, gid, n_groups, w)
        for g, s in enumerate(streams):
            exp = naive_mattr(s.tolist(), w)
            if np.isnan(exp):
                assert np.isnan(got[g])
            else:
                assert abs(got[g] - exp) < 1e-9, (g, w)
            # cross-check the incremental single-stream kernel too
            one = mattr_one(s, w)
            if np.isnan(exp):
                assert np.isnan(one)
            else:
                assert abs(one - exp) < 1e-9

    for g, s in enumerate(streams):
        assert vocab[g] == len(set(s.tolist()))
        exp_h = naive_honore(s.tolist())
        if np.isnan(exp_h):
            assert np.isnan(hs[g])
        else:
            np.testing.assert_allclose(hs[g], exp_h, rtol=1e-9)
