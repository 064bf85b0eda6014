"""Goldens for curation.k_anonymity."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.curation import k_anonymity


def test_hand_case(ray_session):
    # class A: 5 rows, 3 sensitive values -> safe at k=5
    # class B: 2 rows -> small-class risk
    # class C: 6 rows, 1 sensitive value -> l-diversity risk
    t = pa.table({
        "zip": ["A"] * 5 + ["B"] * 2 + ["C"] * 6,
        "age": ["x"] * 13,
        "disease": ["d1", "d2", "d3", "d1", "d2",
                    "d1", "d2",
                    "d9", "d9", "d9", "d9", "d9", "d9"]})
    out = k_anonymity(rd.from_arrow(t).repartition(3),
                      ["zip", "age"], "disease", k=5).to_pandas()
    out["cls"] = out["qi"].str.split("\x1f").str[0]
    out = out.set_index("cls")
    assert (out.loc["A", "n"], out.loc["A", "l_div"],
            out.loc["A", "at_risk"]) == (5, 3, 0)
    assert (out.loc["B", "n"], out.loc["B", "at_risk"]) == (2, 1)
    assert (out.loc["C", "n"], out.loc["C", "l_div"],
            out.loc["C", "at_risk"]) == (6, 1, 1)


def test_naive_parity_fuzz(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    q1 = rng.integers(0, 8, n).astype(str)
    q2 = rng.integers(0, 4, n).astype(str)
    sv = rng.integers(0, 30, n).astype(str)
    t = pa.table({"q1": pa.array(q1), "q2": pa.array(q2),
                  "sv": pa.array(sv)})
    out = k_anonymity(rd.from_arrow(t).repartition(5),
                      ["q1", "q2"], "sv", k=90).to_pandas()
    import pandas as pd
    df = pd.DataFrame({"q1": q1, "q2": q2, "sv": sv})
    exp = df.groupby(["q1", "q2"]).agg(
        n=("sv", "size"), l=("sv", "nunique"))
    assert len(out) == len(exp)
    for r in out.itertuples():
        a, b = r.qi.split("\x1f")
        e = exp.loc[(a, b)]
        assert (r.n, r.l_div) == (e["n"], e["l"])
        assert r.at_risk == int(e["n"] < 90 or e["l"] < 2)


def test_rejects(ray_session):
    t = pa.table({"q": ["a"], "s": ["x"]})
    with pytest.raises(ValueError, match="k must"):
        k_anonymity(rd.from_arrow(t), ["q"], "s", k=0)
    with pytest.raises(ValueError, match="QI column"):
        k_anonymity(rd.from_arrow(t), [], "s")
