"""Goldens for burstiness_by_entity and zipf_alpha_by_group."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.groupstats import burstiness_by_entity
from feature_extraction_ray.stages.text import zipf_alpha_by_group


def test_burstiness_regimes(ray_session):
    rng = np.random.default_rng(3)
    # periodic (B ~ -1), poisson-ish (B ~ 0), bursty (B -> +)
    per = np.arange(0, 5000, 50)
    poi = np.sort(rng.integers(0, 5000, 100))
    bur = np.sort(np.r_[rng.integers(0, 50, 95),
                        rng.integers(0, 500000, 5)])
    rows = []
    for ent, ts in (("per", per), ("poi", poi), ("bur", bur)):
        for i, t in enumerate(ts):
            rows.append((ent, int(t), i))
    t = pa.table({"ent": pa.array([r[0] for r in rows]),
                  "ts": pa.array([r[1] for r in rows], pa.int64()),
                  "id": pa.array([r[2] for r in rows], pa.int64())})
    out = burstiness_by_entity(rd.from_arrow(t).repartition(3),
                               "ent", "ts", "id").to_pandas() \
        .set_index("ent")
    assert out.loc["per", "b"] == -1.0
    assert abs(out.loc["poi", "b"]) < 0.35
    assert out.loc["bur", "b"] > 0.5
    # exact witnesses
    g = np.diff(per)
    assert out.loc["per", "n_gaps"] == len(g)
    assert out.loc["per", "sum_d"] == int(g.sum())
    assert out.loc["per", "sum_d2"] == int((g * g).sum())


def test_burstiness_short_entity_nulls(ray_session):
    t = pa.table({"ent": ["a"], "ts": pa.array([5], pa.int64()),
                  "id": pa.array([1], pa.int64())})
    out = burstiness_by_entity(rd.from_arrow(t), "ent", "ts",
                               "id").to_pandas()
    assert out.iloc[0]["n_gaps"] == 0 and pd.isna(out.iloc[0]["b"])


def test_zipf_naive_parity(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    # zipf-ish draws
    p = 1.0 / np.arange(1, 51)
    p /= p.sum()
    docs, srcs = [], []
    for d in range(40):
        ws = rng.choice(vocab, size=rng.integers(5, 60), p=p)
        docs.append(" ".join(ws))
        srcs.append("s" + str(d % 2))
    t = pa.table({"source": pa.array(srcs), "text": pa.array(docs)})
    out = zipf_alpha_by_group(rd.from_arrow(t).repartition(4),
                              "source").to_pandas() \
        .set_index("source")
    from collections import Counter
    for s in ("s0", "s1"):
        c = Counter(w for d, src in zip(docs, srcs) if src == s
                    for w in d.split())
        W = len(c)
        S = sum(math.log(n) for n in c.values())
        assert out.loc[s, "n_types"] == W
        assert abs(out.loc[s, "s_ln"] - S) < 1e-9
        assert abs(out.loc[s, "alpha"] - (1 + W / S)) < 1e-9


def test_zipf_all_hapax_null(ray_session):
    t = pa.table({"source": ["s"], "text": ["unique words only here"]})
    out = zipf_alpha_by_group(rd.from_arrow(t), "source").to_pandas()
    assert out.iloc[0]["s_ln"] == 0.0
    assert pd.isna(out.iloc[0]["alpha"])
