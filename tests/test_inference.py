"""Goldens for the actor-pool batched-inference stage
(stages/inference.py)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from feature_extraction_ray.stages.inference import (
    EmbeddingModelScorer, linear_probe_model, score_embeddings)


def _emb_ds(vecs):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))}))


def test_score_embeddings_naive_parity():
    rng = np.random.default_rng(7)
    dim, k = 8, 3
    vecs = rng.normal(size=(40, dim)).astype(np.float32).tolist()
    out = score_embeddings(_emb_ds(vecs),
                           lambda: linear_probe_model(dim, k),
                           batch_size=16, max_actors=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    m = linear_probe_model(dim, k)
    x = np.array(vecs, dtype=np.float64) * m["quant_scale"]
    q = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
    want = q @ np.asarray(m["weights"]).T
    got = out[["score_0", "score_1", "score_2"]].to_numpy()
    assert (got == want).all()
    assert (out["pred"].to_numpy() == want.argmax(axis=1)).all()


def test_score_embeddings_zero_vector_tie():
    dim = 4
    out = score_embeddings(_emb_ds([[0.0] * dim]),
                           lambda: linear_probe_model(dim, 3),
                           max_actors=1).to_pandas()
    # all-zero scores tie -> argmax picks the smallest class
    assert out.loc[0, ["score_0", "score_1", "score_2"]].tolist() \
        == [0, 0, 0]
    assert out.loc[0, "pred"] == 0


def test_scorer_kernel_empty_batch():
    k = EmbeddingModelScorer(lambda: linear_probe_model(4, 2))
    empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(
                          pa.float32()))})
    out = k(empty)
    assert len(out) == 0
    assert set(out.column_names) >= {"score_0", "score_1", "pred"}
