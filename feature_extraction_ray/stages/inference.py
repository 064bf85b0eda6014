"""Batched model-inference stage: the canonical actor-pool pattern for
stages whose per-worker SETUP cost (loading model weights, building a
runtime session, pinning buffers) dwarfs per-batch work — the one
regime where an actor pool beats the engine's default task-pool +
``partition.cached_kernel`` recipe (a fresh actor pool costs ~2 s
spin-up per pipeline run, so cheap kernels stay task-pooled; a model
that takes tens of seconds to load amortizes it).

Shape rules baked in (see CLAUDE.md build notes):

- the scorer is a callable CLASS handed to ``map_batches`` — weights
  load ONCE per actor in ``__init__``, ``__call__`` is one vectorized
  matmul per batch;
- ``concurrency`` is ALWAYS an autoscaling ``(1, N)`` tuple — a fixed
  ``concurrency=N`` pool deadlocks when other operators hold all CPUs
  (observed at 4 CPUs);
- batch size is a parameter because model memory × concurrency must
  fit the worker heap — large models want small batches.

``linear_probe_model`` is the deterministic stand-in model (integer
weights derived from class/coordinate indices, inputs quantized with
the DuckDB-exact rounding sequence) so the whole inference path is
covered by an INTEGER-EXACT SQL oracle (`model_scores_embeddings`);
real models plug in through the same ``model_factory`` hook — the
factory runs inside the actor, so weights never ride the task
closure.

Reference repo has no model-inference stage; this extends the engine
per the driver brief's batched-model-inference mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def linear_probe_model(dim: int, n_classes: int = 3) -> dict:
    """Deterministic integer linear probe: ``w[c, j] = ((c * 1315423911
    + (j + 1) * 2654435761) % 2001) - 1000`` (j is the 1-based
    coordinate — matches the SQL twin's ordinality). Inputs are
    quantized to ``round(v * 1000)`` int64 with the DuckDB-exact
    ``floor(|x| + 0.5) * sign`` sequence, so scores are exact int64
    dot products both engines can agree on bit-for-bit."""
    c = np.arange(n_classes, dtype=np.int64)[:, None]
    j = np.arange(1, dim + 1, dtype=np.int64)[None, :]
    w = ((c * np.int64(1315423911) + j * np.int64(2654435761))
         % np.int64(2001)) - np.int64(1000)
    return {"weights": w, "quant_scale": 1000.0}


class EmbeddingModelScorer:
    """Per-ACTOR inference kernel: ``__init__`` materializes the model
    once (the expensive step for a real model), ``__call__`` scores a
    batch with one quantize + one int64 matmul and appends
    ``score_{c}`` columns plus ``pred`` (argmax, smallest class on
    ties)."""

    def __init__(self, model_factory, emb_col: str = "embedding"):
        m = model_factory()
        self.w = np.asarray(m["weights"], dtype=np.int64)
        self.scale = float(m["quant_scale"])
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        dim = self.w.shape[1]
        if n == 0:
            mat = np.zeros((0, dim), dtype=np.float64)
        else:
            flat = col.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            mat = flat.reshape(n, dim)
        x = mat * self.scale
        q = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
        scores = q @ self.w.T                       # (n, n_classes) int64
        for ci in range(self.w.shape[0]):
            batch = batch.append_column(
                f"score_{ci}", pa.array(scores[:, ci]))
        pred = scores.argmax(axis=1).astype(np.int64) if n else \
            np.zeros(0, dtype=np.int64)
        return batch.append_column("pred", pa.array(pred))


def score_embeddings(ds: Dataset, model_factory,
                     emb_col: str = "embedding",
                     batch_size: int = 1024,
                     max_actors: int = 8,
                     num_cpus: float = 1.0) -> Dataset:
    """Run batched model inference over an embedding column with an
    autoscaling ``(1, max_actors)`` actor pool. ``model_factory`` is
    called once per actor inside ``__init__`` — never on the driver,
    never per batch — so a multi-GB model loads ``#actors`` times per
    RUN, not ``#batches`` times; size ``batch_size`` × ``max_actors``
    × model memory to the worker heap."""
    return ds.map_batches(
        EmbeddingModelScorer,
        fn_constructor_kwargs={"model_factory": model_factory,
                               "emb_col": emb_col},
        batch_size=batch_size,
        concurrency=(1, max_actors),
        num_cpus=num_cpus,
        batch_format="pyarrow")
