"""Flagship bucket-fn edge cases: empty-token docs, single-row entities,
empty buckets."""
import numpy as np
import pyarrow as pa
import pytest

from feature_extraction_ray.pipelines.flagship import (enrich_bucket,
                                                       session_features_bucket)


def _tbl(rows):
    doc_id, src, ts, toks = zip(*rows)
    lens = [len(t) for t in toks]
    flat = [x for t in toks for x in t]
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.table({
        "doc_id": pa.array(doc_id),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, type=pa.int32())),
        "n_tok": pa.array(lens, type=pa.int32()),
        "source": pa.array(src),
        "ts": pa.array(list(ts), type=pa.timestamp("us")),
        "attr_val": pa.array([None] * len(rows), type=pa.float64()),
    })


def test_empty_token_docs_and_single_row_entity():
    rows = [
        ("d1", "a", 1_000_000, [1, 2, 3]),
        ("d2", "a", 2_000_000, []),            # empty doc
        ("d3", "a", 9_000_000_000_000, [4]),   # big gap -> new session
        ("d4", "b", 5_000_000, []),            # single-row entity, empty
    ]
    out = session_features_bucket(enrich_bucket(_tbl(rows)))
    pdf = out.to_pandas().set_index(["source", "session_id"]).sort_index()
    assert len(pdf) == 3                       # a:2 sessions + b:1
    a0 = pdf.loc[("a", 0)]
    assert a0["n_docs"] == 2 and a0["total_tokens"] == 3
    b0 = pdf.loc[("b", 0)]
    assert b0["total_tokens"] == 0
    assert np.isnan(b0["honore_hs"])           # empty stream conventions
    assert np.isnan(b0[[c for c in pdf.columns if c.startswith("mattr")][0]])
    assert np.isnan(b0["ttr"])


def test_empty_bucket_table():
    empty = _tbl([("d", "x", 0, [1])]).slice(0, 0)
    out = session_features_bucket(enrich_bucket(empty))
    assert len(out) == 0
