"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video are treated as opaque ``binary`` columns with typed
metadata columns alongside (driver brief). The Ray-side plumbing — schema,
actor-pool signatures, small-batch sizing for large payloads, output
layout — is real and tested; the *decode kernels themselves* are STUBS
because no image/audio libraries exist in this container:

* ``decode_fn=None`` → a clearly-marked ``NotImplementedError`` explaining
  which library to plug in;
* ``deterministic_fake=True`` → a seeded, content-derived fake decode so
  the full pipeline (including downstream feature stages) is exercisable
  end-to-end in tests.

Batch sizing: payloads are KB–MB scale, so these stages default to SMALL
``batch_size`` (64) and expect the caller to keep
``DataContext.target_max_block_size`` at its default so blocks stay
shippable; never convert the binary column to pandas (stays Arrow).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("width", pa.int32()),            # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),      # audio
    ("duration_ms", pa.int64()),      # audio/video
])


def synth_media_table(n: int = 32, seed: int = 3) -> pa.Table:
    """Deterministic fake media table matching :data:`MEDIA_SCHEMA`."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array([f"m{i:05d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(kinds.tolist()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "sample_rate": pa.array(
            np.where(kinds == "audio", 16_000, 0).astype(np.int32)),
        "duration_ms": pa.array(
            rng.integers(100, 60_000, n).astype(np.int64)),
    })


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-size feature vector.

    ``__init__`` is where a real model would load ONCE per actor (the
    actor-pool rule); ``__call__`` is vectorized over the batch. The stub
    'decode' derives a deterministic 16-dim float vector from a sha256 of
    the payload — stable across processes, so downstream tests are exact.
    """

    DIM = 16

    def __init__(self, decode_fn=None, deterministic_fake: bool = True):
        if decode_fn is None and not deterministic_fake:
            raise NotImplementedError(
                "media decoding requires an image/audio library (e.g. "
                "Pillow / torchvision / torchaudio) not present in this "
                "container; pass decode_fn=... or deterministic_fake=True")
        self.decode_fn = decode_fn

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[:self.DIM * 2], dtype=np.uint16)
        return (raw.astype(np.float32) / 65535.0)[:self.DIM]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fn = self.decode_fn or self._fake_decode
        feats = np.stack([fn(p) for p in payloads]) if payloads else \
            np.zeros((0, self.DIM), dtype=np.float32)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1).astype(np.float32)), self.DIM),
        })


class FrameSampler:
    """Actor-pool stage: 'video' payload → k evenly-spaced 'frames'
    (byte slices in the stub; a real impl would demux + decode). Emits one
    row per frame — the fan-out layout downstream image stages consume."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        mids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        for mid, p, kind in zip(mids, payloads, kinds):
            if kind != "video":
                continue
            step = max(len(p) // self.k, 1)
            for i in range(self.k):
                ids.append(mid)
                fidx.append(i)
                frames.append(p[i * step:(i + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "frame": pa.array(frames, type=pa.binary()),
        })


def extract_media_features(ds: Dataset, decode_fn=None,
                           deterministic_fake: bool = True,
                           concurrency=(1, 8),
                           batch_size: int = 64) -> Dataset:
    """Media feature pipeline: small batches (large payloads), Arrow-only."""
    return ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        fn_constructor_kwargs=dict(decode_fn=decode_fn,
                                   deterministic_fake=deterministic_fake),
        batch_size=batch_size, concurrency=concurrency)


def sample_frames(ds: Dataset, k: int = 4, concurrency=(1, 4),
                  batch_size: int = 64) -> Dataset:
    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(k=k),
                          batch_size=batch_size, concurrency=concurrency)
