"""Token-embedding pooling (stages/tokengrams.pool_token_embeddings)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from feature_extraction_ray.stages.tokengrams import pool_token_embeddings


def _rows(ds):
    # to_pandas trips Ray's tensor-extension cast on uniform-length
    # list columns containing nulls; read rows directly instead
    return {r["doc_id"]: r for r in ds.take_all()}


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(len(docs))],
        "tokens": pa.array(docs, type=pa.list_(pa.int32()))}))


def test_pool_mean_exact_int():
    emb = np.array([[1, 2], [10, 20], [100, 200]], dtype=np.int64)
    out = _rows(pool_token_embeddings(_ds([[0, 1], [2], []]), emb))
    assert list(out["d0"]["vec"]) == [11 / 2.0, 22 / 2.0]
    assert list(out["d1"]["vec"]) == [100.0, 200.0]
    assert out["d2"]["vec"] is None
    assert [out[f"d{i}"]["n"] for i in range(3)] == [2, 1, 0]


def test_pool_sum_and_float_parity():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((50, 8))
    docs = [rng.integers(0, 50, size=int(rng.integers(0, 20))).tolist()
            for _ in range(60)]
    out = _rows(pool_token_embeddings(_ds(docs), emb, agg="sum"))
    for i, d in enumerate(docs):
        exp = np.zeros(8) if not d else \
            np.add.reduceat(emb[np.array(d)], [0], axis=0)[0]
        got = np.array(list(out[f"d{i}"]["vec"]))
        np.testing.assert_allclose(got, exp, rtol=1e-12)
        assert out[f"d{i}"]["n"] == len(d)


def test_pool_oov_modes_and_rejects():
    emb = np.eye(3, dtype=np.int64)
    with pytest.raises(Exception, match="outside"):
        pool_token_embeddings(_ds([[5]]), emb).take_all()
    out = _rows(pool_token_embeddings(_ds([[0, 5, 2], [7]]), emb,
                                      oov="skip"))
    assert list(out["d0"]["vec"]) == [0.5, 0.0, 0.5]
    assert out["d0"]["n"] == 2
    assert out["d1"]["vec"] is None and out["d1"]["n"] == 0
    s = pool_token_embeddings(_ds([[]]), emb, agg="sum").take_all()
    assert list(s[0]["vec"]) == [0.0, 0.0, 0.0]
    with pytest.raises(ValueError, match="agg"):
        pool_token_embeddings(_ds([[0]]), emb, agg="max")
    with pytest.raises(ValueError, match="matrix"):
        pool_token_embeddings(_ds([[0]]), np.zeros((0, 4)))
