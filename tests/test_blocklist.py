"""Blocklist screen (curation.blocklist_stats/filter): naive re parity,
phrase + substring modes, filter drop, reject."""
import re

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import (blocklist_filter,
                                                    blocklist_stats)

DOCS = pd.DataFrame({
    "doc_id": list(range(8)),
    "text": [
        "the quick brown fox",
        "a slow scan over rows",            # slow
        "slowly is not slow-adjacent",      # 'slowly' must NOT match;
                                            # 'slow-adjacent' DOES (\b at -)
        "prefer a hash join here",          # phrase
        "hash  join with two spaces",       # NOT the phrase
        "broken and slow",                  # two terms
        "BROKEN uppercase untouched",       # case-sensitive
        "",
    ],
})
TERMS = ["slow", "hash join", "broken"]


def test_naive_re_parity():
    out = blocklist_stats(rd.from_pandas(DOCS), TERMS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pats = [re.compile(r"\b" + re.escape(t) + r"\b") for t in TERMS]
    want_n = [sum(bool(p.search(s)) for p in pats) for s in DOCS.text]
    assert out.n_blocked_terms.tolist() == want_n
    assert out.blocked.tolist() == [n > 0 for n in want_n]
    # the hand-reasoned rows
    byid = out.set_index("doc_id")
    assert byid.loc[2, "n_blocked_terms"] == 1      # slow-adjacent
    assert byid.loc[4, "n_blocked_terms"] == 0      # double space
    assert byid.loc[5, "n_blocked_terms"] == 2
    assert not byid.loc[6, "blocked"]


def test_substring_mode():
    out = blocklist_stats(rd.from_pandas(DOCS), ["slow"],
                          whole_word=False).to_pandas() \
        .set_index("doc_id")
    assert out.loc[2, "n_blocked_terms"] == 1        # 'slowly' counts


def test_filter_drops_blocked():
    kept = blocklist_filter(rd.from_pandas(DOCS), TERMS).to_pandas()
    assert sorted(kept.doc_id) == [0, 4, 6, 7]
    assert list(kept.columns) == ["doc_id", "text"]


def test_empty_terms_reject():
    with pytest.raises(ValueError):
        blocklist_stats(rd.from_pandas(DOCS), [])
