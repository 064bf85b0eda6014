"""Goldens for stages/text.group_kl_divergence."""
import math

import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.text import group_kl_divergence


def _run(rows):
    t = pa.table({"source": [s for s, _ in rows],
                  "text": [x for _, x in rows]})
    df = group_kl_divergence(rd.from_arrow(t)).to_pandas()
    if df.empty:
        return df
    return df.set_index("source").sort_index()


def test_hand_computed():
    # corpus: a=3 (2 in g1, 1 in g2), b=1 (g1), c=2 (g2); N=6
    out = _run([("g1", "a a b"), ("g2", "a c c")])
    n, tg1, tg2 = 6.0, 3.0, 3.0
    kl1 = (2/tg1)*math.log((2*n)/(tg1*3)) + (1/tg1)*math.log((1*n)/(tg1*1))
    kl2 = (1/tg2)*math.log((1*n)/(tg2*3)) + (2/tg2)*math.log((2*n)/(tg2*2))
    assert out.loc["g1", "n_tokens"] == 3
    assert out.loc["g1", "n_types"] == 2
    assert abs(out.loc["g1", "kl"] - kl1) < 1e-12
    assert abs(out.loc["g2", "kl"] - kl2) < 1e-12
    assert kl1 > 0 and kl2 > 0


def test_identical_distributions_zero_and_disjoint_positive():
    out = _run([("g1", "x y"), ("g2", "x y")])
    assert abs(out.loc["g1", "kl"]) < 1e-15
    assert abs(out.loc["g2", "kl"]) < 1e-15
    out2 = _run([("g1", "x x x"), ("g2", "y y y")])
    # fully disjoint vocabularies: KL = ln(N/tg) = ln 2
    assert abs(out2.loc["g1", "kl"] - math.log(2)) < 1e-12
    assert abs(out2.loc["g2", "kl"] - math.log(2)) < 1e-12


def test_empty_and_blank_docs():
    out = _run([("g1", "  "), ("g2", "w w")])
    # g1 contributes no words at all -> absent from the output
    assert list(out.index) == ["g2"]
    assert out.loc["g2", "kl"] == 0.0
    empty = _run([("g1", " ")])
    assert len(empty) == 0
