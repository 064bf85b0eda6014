"""Exact set-similarity join (stages/setsim.py): naive all-pairs parity
across block layouts and plans, threshold-boundary inclusion, emit-once
(no duplicate pairs), short docs, rejects."""
import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.setsim import setsim_join


def _gram_set(text: str, k: int = 3):
    ws = text.split()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def _naive(df: pd.DataFrame, threshold: float, k: int = 3):
    from fractions import Fraction
    fr = Fraction(str(threshold))
    sets = {r.doc_id: _gram_set(r.text, k) for r in df.itertuples()}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            iv = len(sa & sb)
            un = len(sa) + len(sb) - iv
            if iv * fr.denominator >= fr.numerator * un:
                rows.append((a, b, len(sa), len(sb), iv, un, iv / un))
    return pd.DataFrame(rows, columns=[
        "id_a", "id_b", "n_a", "n_b", "n_inter", "n_union", "jaccard"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _corpus(n=50, seed=11):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids = [], []
    for i in range(n):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(3, 25))))
        ids.append(i)
    # planted near-dups (high overlap) and an exact copy
    for j, src in enumerate([0, 1, 2]):
        ws = texts[src].split()
        ws[0] = "XCHG"
        texts.append(" ".join(ws))
        ids.append(n + j)
    texts.append(texts[3])
    ids.append(n + 3)
    # a short doc (< k words): must emit nothing
    texts.append("a b")
    ids.append(n + 4)
    return pd.DataFrame({"doc_id": ids, "text": texts})


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def _run(df, layout_blocks, **kw):
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    parts = [tbl.slice(i * len(tbl) // layout_blocks,
                       (i + 1) * len(tbl) // layout_blocks
                       - i * len(tbl) // layout_blocks)
             for i in range(layout_blocks)]
    ds = rd.from_arrow(parts)
    out = setsim_join(ds, **kw).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_naive_parity(corpus, threshold):
    want = _naive(corpus, threshold)
    got = _run(corpus, 3, threshold=threshold)
    pd.testing.assert_frame_equal(
        got.astype({"id_a": "int64", "id_b": "int64"}), want,
        check_dtype=False)


def test_layout_invariance_and_plan_equivalence(corpus):
    a = _run(corpus, 1, threshold=0.4)
    b = _run(corpus, 7, threshold=0.4)
    c = _run(corpus, 4, threshold=0.4, plan="partitioned")
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_emit_once_no_duplicate_pairs(corpus):
    got = _run(corpus, 5, threshold=0.25)
    keys = list(zip(got.id_a, got.id_b))
    assert len(keys) == len(set(keys))


def test_threshold_boundary_inclusive():
    # two docs engineered to land EXACTLY on jaccard == 0.5:
    # grams(a) = {g1..g4}, grams(b) = {g1, g2, x1, x2} -> inter 2, union 6
    # ... build with k=1 (word sets) for exact control
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["p q r", "p q s"],      # k=1: inter 2, union 4 -> 0.5
    })
    out = _run(df, 1, threshold=0.5, k=1)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_inter, r.n_union, r.jaccard) == (2, 4, 0.5)
    # just above the boundary excludes (empty result has no schema —
    # count directly instead of sorting)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out2 = setsim_join(rd.from_arrow(tbl), threshold=0.51, k=1)
    assert out2.count() == 0


def test_exact_copy_is_jaccard_one(corpus):
    got = _run(corpus, 2, threshold=1.0)
    pairs = set(zip(got.id_a, got.id_b))
    assert (3, 53) in pairs                   # the planted exact copy
    assert (got.jaccard == 1.0).all()


def test_short_docs_never_pair(corpus):
    # doc 54 has 2 words -> zero 3-grams -> can never appear in a pair
    got = _run(corpus, 2, threshold=0.1)
    assert 54 not in set(got.id_a).union(set(got.id_b))


def test_rejects():
    df = pd.DataFrame({"doc_id": [1], "text": ["a b c d"]})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        setsim_join(ds, threshold=0.0)
    with pytest.raises(ValueError):
        setsim_join(ds, threshold=1.5)
    with pytest.raises(ValueError):
        setsim_join(ds, k=0)
    with pytest.raises(ValueError):
        setsim_join(ds, plan="nope").materialize()
