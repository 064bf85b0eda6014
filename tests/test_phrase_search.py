"""Goldens for textindex positional index + phrase_search."""
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.textindex import (
    build_positional_index, phrase_search)


def _naive(texts, ids, phrase):
    terms = phrase.split()
    out = {}
    for i, s in zip(ids, texts):
        ws = s.split()
        hits = [p + 1 for p in range(len(ws) - len(terms) + 1)
                if ws[p:p + len(terms)] == terms]
        if hits:
            out[i] = (len(hits), hits[0])
    return out


@pytest.fixture(scope="module")
def idx_dir(ray_session):
    rng = np.random.default_rng(7)
    vocab = np.array(list("abcdefg"))
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
             for _ in range(120)]
    ids = list(range(120))
    d = tempfile.mkdtemp(prefix="postest_")
    build_positional_index(
        rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                "text": texts})), d, num_buckets=8)
    yield d, texts, ids
    shutil.rmtree(d, ignore_errors=True)


def test_naive_parity_fuzz(idx_dir):
    d, texts, ids = idx_dir
    for phrase in ("a b", "c d e", "g"):
        exp = _naive(texts, ids, phrase)
        out = phrase_search(d, phrase).to_pandas()
        got = {int(r.doc_id): (int(r.n_matches), int(r.first_pos))
               for r in out.itertuples()}
        assert got == exp, phrase


def test_repeated_term_needs_adjacency(idx_dir):
    d, texts, ids = idx_dir
    exp = _naive(texts, ids, "a a")
    out = phrase_search(d, "a a").to_pandas()
    got = {int(r.doc_id): (int(r.n_matches), int(r.first_pos))
           for r in out.itertuples()}
    assert got == exp
    assert len(got) > 0  # fixture actually exercises the case


def test_overlapping_matches_counted(ray_session):
    d = tempfile.mkdtemp(prefix="postest2_")
    try:
        build_positional_index(rd.from_arrow(pa.table({
            "doc_id": pa.array([9], pa.int64()),
            "text": ["x x x x"]})), d, num_buckets=4)
        out = phrase_search(d, "x x").to_pandas()
        assert out.iloc[0]["n_matches"] == 3
        assert out.iloc[0]["first_pos"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_miss_and_rejects(idx_dir):
    d, _, _ = idx_dir
    assert len(phrase_search(d, "zz qq").to_pandas()) == 0
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_search(d, "  ")
