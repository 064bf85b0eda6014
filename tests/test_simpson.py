"""Goldens for text.simpson_diversity_by_group."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.text import simpson_diversity_by_group


def test_counter_parity(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    docs, srcs = [], []
    for d in range(30):
        ws = rng.choice(vocab, size=rng.integers(3, 40))
        docs.append(" ".join(ws))
        srcs.append("s" + str(d % 3))
    t = pa.table({"source": pa.array(srcs), "text": pa.array(docs)})
    out = simpson_diversity_by_group(
        rd.from_arrow(t).repartition(4), "source").to_pandas() \
        .set_index("source")
    from collections import Counter
    for s in ("s0", "s1", "s2"):
        c = Counter(w for d, sr in zip(docs, srcs) if sr == s
                    for w in d.split())
        N = sum(c.values())
        num = sum(n * (n - 1) for n in c.values())
        r = out.loc[s]
        assert (r["n_types"], r["n_tokens"], r["num"]) == \
            (len(c), N, num)
        assert r["d"] == num / (N * (N - 1))
        assert r["gini_simpson"] == 1.0 - r["d"]


def test_extremes(ray_session):
    # all-same word -> D = 1; all-distinct -> D = 0
    t = pa.table({"source": ["mono", "uni"],
                  "text": ["x x x x x", "a b c d e"]})
    out = simpson_diversity_by_group(rd.from_arrow(t),
                                     "source").to_pandas() \
        .set_index("source")
    assert out.loc["mono", "d"] == 1.0
    assert out.loc["uni", "d"] == 0.0


def test_single_token_null(ray_session):
    t = pa.table({"source": ["s"], "text": ["lonely"]})
    out = simpson_diversity_by_group(rd.from_arrow(t),
                                     "source").to_pandas()
    assert pd.isna(out.iloc[0]["d"])
