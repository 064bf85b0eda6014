"""Chi-square token-class feature selection
(stages/tokengrams.token_class_chi2)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import token_class_chi2


def _ds(docs, classes):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "entity": pa.array(classes),
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def _naive(docs, classes, order):
    K = len(order)
    cmap = {c: i for i, c in enumerate(order)}
    O = {}
    for d, cl in zip(docs, classes):
        for tk in d:
            key = int(tk)
            if key not in O:
                O[key] = [0] * K
            O[key][cmap[cl]] += 1
    C = [0] * K
    for row in O.values():
        for i in range(K):
            C[i] += row[i]
    N = sum(C)
    out = {}
    for tk, row in O.items():
        R = sum(row)
        chi2 = 0.0
        for c in range(K):
            E = (float(R) * float(C[c])) / float(N)
            d = float(row[c]) - E
            chi2 = chi2 + (d * d) / E
        out[tk] = (R, chi2)
    return out


def test_chi2_naive_parity_exact():
    rng = np.random.default_rng(5)
    order = ["a", "b", "c"]
    docs = [rng.integers(0, 300, size=int(rng.integers(1, 30))).tolist()
            for _ in range(120)]
    classes = [order[int(rng.integers(0, 3))] for _ in range(120)]
    got = token_class_chi2(_ds(docs, classes), classes=order,
                           num_buckets=8).to_pandas()
    exp = _naive(docs, classes, order)
    assert len(got) == len(exp)
    for r in got.itertuples():
        R, chi2 = exp[r.token]
        assert r.n == R
        assert r.chi2 == chi2  # identical fixed-order IEEE expression


def test_chi2_hand_case_and_zero():
    # token 1 only in class a, token 2 spread exactly proportionally
    docs = [[1, 2], [1, 2], [2], [2]]
    classes = ["a", "a", "b", "b"]
    got = token_class_chi2(_ds(docs, classes), classes=["a", "b"]) \
        .to_pandas().set_index("token")
    # totals: C_a = 4 (1,2,1,2), C_b = 2 (2,2), N = 6
    # token 1: O = (2, 0), R = 2; E = (2*4/6, 2*2/6) = (4/3, 2/3)
    ea, eb = (2.0 * 4.0) / 6.0, (2.0 * 2.0) / 6.0
    exp1 = ((2.0 - ea) ** 2) / ea + ((0.0 - eb) ** 2) / eb
    assert got.loc[1, "chi2"] == pytest.approx(exp1, rel=1e-15)
    assert got.loc[1, "n"] == 2
    # token 2: O = (2, 2), R = 4; E = (4*4/6, 4*2/6) — not proportional
    # build an exactly proportional case instead: token 9 twice in a,
    # once in b with C ratio 2:1 → O == E exactly → chi2 == 0.0
    docs2 = [[9, 9], [9]]
    classes2 = ["a", "b"]
    z = token_class_chi2(_ds(docs2, classes2), classes=["a", "b"]) \
        .to_pandas()
    assert z["chi2"].iloc[0] == 0.0


def test_chi2_derived_classes_and_rejects():
    docs = [[1], [2]]
    # classes=None derives sorted distinct values
    got = token_class_chi2(_ds(docs, ["b", "a"])).to_pandas()
    assert len(got) == 2
    with pytest.raises(Exception, match="unseen"):
        token_class_chi2(_ds(docs, ["a", "x"]), classes=["a", "b"]) \
            .to_pandas()
    with pytest.raises(ValueError):
        token_class_chi2(_ds(docs, ["a", "a"]), classes=[])
    with pytest.raises(ValueError):
        token_class_chi2(_ds(docs, ["a", "a"]), classes=["a", "a"])
    with pytest.raises(ValueError):
        token_class_chi2(_ds([[], []], ["a", "b"]),
                         classes=["a", "b"]).to_pandas()
