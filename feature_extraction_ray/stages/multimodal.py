"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video are treated as opaque ``binary`` columns with typed
metadata columns alongside (driver brief). The Ray-side plumbing — schema,
actor-pool signatures, small-batch sizing for large payloads, output
layout — is the same as any production media pipeline, and the decode
kernels are REAL for the formats a stdlib-only container can parse:

* **BMP** images (24-bit uncompressed): struct header parse → (h, w, 3)
  RGB pixel array → channel stats + luminance histogram features;
* **PNG** images (8-bit grey/RGB/grey-alpha/RGBA, non-interlaced):
  stdlib ``zlib`` inflate + full None/Sub/Up/Average/Paeth scanline
  reconstruction (``decode_png``), same feature tail as BMP;
* **WAV** audio (PCM16, via the stdlib ``wave`` module): frames → RMS /
  peak / zero-cross / spectral-band features (numpy rFFT);
* **video** as a trivial concat-of-BMP-frames container: demuxed by each
  frame's declared BMP file size, frames sampled evenly.

Anything else (JPEG/MP3/MP4...) raises a clearly-marked
``NotImplementedError`` at decode time naming the library to plug in via
``decode_fn`` — the honest boundary of a no-image-libs container. The
seeded content-derived fake decode (``mode="fake"``) remains for
plumbing-only tests.

Batch sizing: payloads are KB–MB scale, so these stages default to SMALL
``batch_size`` (64) and expect the caller to keep
``DataContext.target_max_block_size`` at its default so blocks stay
shippable; never convert the binary column to pandas (stays Arrow).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

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


# ---------------------------------------------------------------------------
# Stdlib codecs (struct/wave only — no image/audio libraries)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up
    rows, 4-byte padded — the classic BITMAPINFOHEADER layout)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):            # bottom-up
        body += pixels[r, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP payload — decoding other image formats requires an "
            "image/audio library (e.g. Pillow) not present in this "
            "container; pass decode_fn=...")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (got bpp={bpp}, "
            f"compression={comp}); pass decode_fn=... for other variants")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()            # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit truecolor PNG bytes (stdlib ``zlib``
    deflate + crc32; filter-0 scanlines, a single IDAT chunk)."""
    import zlib
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)],
        axis=1).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB: stdlib ``zlib`` inflate + the
    full per-scanline filter reconstruction (None/Sub/Up/Average/Paeth
    per the spec). 8-bit greyscale (0), RGB (2), grey+alpha (4) and
    RGBA (6) color types decode (alpha dropped, grey broadcast to 3
    channels); palette / interlaced / 16-bit images raise the documented
    ``NotImplementedError`` naming the ``decode_fn`` hook.

    Sub is vectorized as a mod-256 prefix sum over the scanline (mod
    distributes over addition, so one int32 cumsum + ``& 0xFF`` is
    exact); Up is a vectorized add against the prior reconstructed row;
    Average/Paeth carry a left-pixel dependency so they walk the row
    with per-CHANNEL numpy ops (rows are narrow relative to payloads)."""
    import zlib
    if payload[:8] != _PNG_SIG:
        raise NotImplementedError(
            "not a PNG payload — decoding other image formats requires "
            "an image library (e.g. Pillow) not present in this "
            "container; pass decode_fn=...")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise NotImplementedError("PNG stream has no IHDR chunk")
    w, h, depth, ctype, _comp, _filt, interlace = \
        struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"only 8-bit non-interlaced grey/RGB/grey-alpha/RGBA PNG is "
            f"supported (got depth={depth}, color_type={ctype}, "
            f"interlace={interlace}); pass decode_fn=...")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * ch + 1
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) < stride * h:
        raise NotImplementedError(
            "truncated PNG image data; pass decode_fn=...")
    raw = raw[:stride * h].reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prior = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        ft = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        if ft == 0:                            # None
            rec = line
        elif ft == 1:                          # Sub: prefix sum mod 256
            rec = (line.reshape(w, ch).cumsum(axis=0) & 0xFF).reshape(-1)
        elif ft == 2:                          # Up
            rec = (line + prior) & 0xFF
        elif ft in (3, 4):                     # Average / Paeth
            rec = np.empty(w * ch, dtype=np.int32)
            lr, ll = rec.reshape(w, ch), line.reshape(w, ch)
            pp = prior.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                up = pp[x]
                if ft == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    pa_, pb = np.abs(p - left), np.abs(p - up)
                    pc_ = np.abs(p - upleft)
                    pred = np.where(
                        (pa_ <= pb) & (pa_ <= pc_), left,
                        np.where(pb <= pc_, up, upleft))
                left = (ll[x] + pred) & 0xFF
                lr[x] = left
                upleft = up
        else:
            raise NotImplementedError(
                f"unknown PNG filter type {ft}; pass decode_fn=...")
        out[r] = rec
        prior = rec.astype(np.int32)
    img = out.reshape(h, w, ch)
    if ctype == 2:
        return img.copy()
    if ctype in (0, 4):
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()                # RGBA → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Format-dispatching image decode: BMP (``BM`` magic), PNG (8-byte
    signature), baseline JPEG (SOI ``FFD8``; see ``stages/jpeg.py``) or
    GIF87a/89a (``GIF8`` magic; see ``stages/gif.py`` — first frame)
    → (h, w, 3) uint8 RGB; anything else raises the documented
    ``NotImplementedError`` naming the ``decode_fn`` hook."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        from .gif import decode_gif
        return decode_gif(payload)
    raise NotImplementedError(
        "unrecognized image payload (not BMP, PNG, JPEG or GIF) — other "
        "formats require an image library (e.g. Pillow) not present in "
        "this container; pass decode_fn=...")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → PCM16 WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """PCM16 WAV bytes → (float32 mono samples in [-1, 1], sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a WAV payload — decoding other audio formats requires an "
            "image/audio library (e.g. torchaudio) not present in this "
            "container; pass decode_fn=...")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 WAV is supported (got sample width "
                f"{wf.getsampwidth()}); pass decode_fn=...")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        raw = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    x = raw.astype(np.float32) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def split_video_frames(payload: bytes) -> list:
    """Demux a video payload into per-frame image bytes. Two real
    containers decode: concat-of-BMP (each frame declares its byte
    length in the BMP header at offset 2 — an exact O(#frames) scan)
    and animated GIF (``GIF8`` magic; frames re-encoded as BMP so every
    downstream consumer sees one frame format)."""
    if payload[:4] == b"GIF8":
        from .gif import decode_gif_frames
        return [encode_bmp(f) for f in decode_gif_frames(payload)]
    frames, pos = [], 0
    while pos + 54 <= len(payload):
        if payload[pos:pos + 2] != b"BM":
            raise NotImplementedError(
                "video payload is not a concat-of-BMP stream or an "
                "animated GIF; real containers (MP4/WebM) need a "
                "demuxer library — pass decode_fn=...")
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        frames.append(payload[pos:pos + size])
        pos += size
    return frames


def resize_image(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact block-mean resample of an (h, w, 3) uint8 image to
    ``(out_h, out_w, 3)`` — the same any-size bucketed ``reduceat``
    kernel the perceptual hash uses, exposed as a first-class
    transform (uint8 out, per-cell float64 means rounded half-up)."""
    h, w, _ = px.shape
    f = px.astype(np.float64)
    rs = (np.arange(out_h) * h) // out_h
    cs = (np.arange(out_w) * w) // out_w
    re_ = np.add.reduceat(f, rs, axis=0)
    ce = np.add.reduceat(re_, cs, axis=1)
    # upscale: repeated reduceat indices return the SINGLE source row
    # (not an empty sum), so the divisor there is 1, not diff()==0
    rows = np.maximum(np.diff(np.r_[rs, h]), 1).astype(np.float64)
    cols = np.maximum(np.diff(np.r_[cs, w]), 1).astype(np.float64)
    mean = ce / rows[:, None, None] / cols[None, :, None]
    return np.floor(mean + 0.5).clip(0, 255).astype(np.uint8)


def resize_images(ds: Dataset, out_h: int, out_w: int,
                  payload_col: str = "payload",
                  decode_fn=None) -> Dataset:
    """Batch image resize: decode (format-dispatching stdlib codecs or
    ``decode_fn``) → exact block-mean resample → re-encode BMP into
    ``{payload_col}_resized``. Stateless vectorized-per-image map, zero
    shuffles — the multimodal 'resize' stage from the brief as a
    first-class pipeline op."""
    dec = decode_fn or decode_image

    def fn(t: pa.Table) -> pa.Table:
        out = [encode_bmp(resize_image(dec(p.as_py()), out_h, out_w))
               for p in t[payload_col]]
        return t.append_column(f"{payload_col}_resized",
                               pa.array(out, type=pa.large_binary()))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synthetic media corpus (real payloads by default)
# ---------------------------------------------------------------------------

def synth_media_table(n: int = 32, seed: int = 3,
                      real_payloads: bool = True) -> pa.Table:
    """Deterministic media table matching :data:`MEDIA_SCHEMA`.

    ``real_payloads=True`` (default) writes genuine BMP / PCM16-WAV /
    concat-of-BMP bytes whose metadata columns describe the actual
    content; ``False`` keeps the legacy opaque random-byte payloads for
    plumbing-only tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads, widths, heights, rates, durs = [], [], [], [], []
    for kind in kinds:
        if not real_payloads:
            payloads.append(rng.integers(
                0, 256, size=int(rng.integers(256, 4096)),
                dtype=np.uint8).tobytes())
            widths.append(int(rng.integers(16, 512)))
            heights.append(int(rng.integers(16, 512)))
            rates.append(16_000 if kind == "audio" else 0)
            durs.append(int(rng.integers(100, 60_000)))
            continue
        if kind == "image":
            w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px))
            widths.append(w)
            heights.append(h)
            rates.append(0)
            durs.append(0)
        elif kind == "audio":
            rate = int(rng.choice([8_000, 16_000]))
            ns = int(rng.integers(rate // 100, rate // 4))
            x = (rng.standard_normal(ns) * 6000).astype(np.int16)
            payloads.append(encode_wav(x, rate))
            widths.append(0)
            heights.append(0)
            rates.append(rate)
            durs.append(int(round(ns / rate * 1000)))
        else:                                  # video: 2-5 BMP frames
            w, h = int(rng.integers(8, 17)), int(rng.integers(8, 17))
            nf = int(rng.integers(2, 6))
            payloads.append(b"".join(
                encode_bmp(rng.integers(0, 256, size=(h, w, 3),
                                        dtype=np.uint8))
                for _ in range(nf)))
            widths.append(w)
            heights.append(h)
            rates.append(0)
            durs.append(nf * 40)              # 25 fps
    return pa.table({
        "media_id": pa.array([f"m{i:05d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(kinds.tolist()),
        "width": pa.array(np.array(widths, dtype=np.int32)),
        "height": pa.array(np.array(heights, dtype=np.int32)),
        "sample_rate": pa.array(np.array(rates, dtype=np.int32)),
        "duration_ms": pa.array(np.array(durs, dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

def _image_features(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → 16-dim [w, h, mean RGB, std RGB, 8-bin luminance
    histogram], every component scaled into [0, 1]."""
    h, w, _ = px.shape
    f = np.empty(16, dtype=np.float32)
    f[0] = min(w / 4096.0, 1.0)
    f[1] = min(h / 4096.0, 1.0)
    flat = px.reshape(-1, 3).astype(np.float32)
    f[2:5] = flat.mean(axis=0) / 255.0
    f[5:8] = flat.std(axis=0) / 255.0
    lum = flat @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 255.0001))
    f[8:16] = hist.astype(np.float32) / max(len(lum), 1)
    return f


def _audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """float32 mono [-1,1] → 16-dim [duration, rate, rms, peak,
    zero-cross rate, silence fraction, spectral centroid, flatness-ish,
    8 log-spaced band energy fractions], scaled into [0, 1]."""
    f = np.zeros(16, dtype=np.float32)
    n = len(x)
    if n == 0:
        return f
    f[0] = min(n / rate / 60.0, 1.0)
    f[1] = min(rate / 48_000.0, 1.0)
    f[2] = min(float(np.sqrt(np.mean(x * x))), 1.0)
    f[3] = min(float(np.abs(x).max()), 1.0)
    f[4] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
        if n > 1 else 0.0
    f[5] = float(np.mean(np.abs(x) < 0.01))
    mag = np.abs(np.fft.rfft(x))
    total = float(mag.sum())
    if total > 0:
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        f[6] = float((freqs * mag).sum() / total / (rate / 2))
        # energy fraction in 8 geometric bands up to Nyquist
        edges = np.geomspace(rate / 512, rate / 2, 9)
        band = np.searchsorted(edges, freqs, side="right")
        e = mag * mag
        esum = float(e.sum())
        for b in range(8):
            f[8 + b] = float(e[band == b + 1].sum() / esum)
        f[7] = float(np.exp(np.mean(np.log(mag + 1e-12))) /
                     (mag.mean() + 1e-12))    # spectral flatness
    return f


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-size feature vector.

    ``__init__`` is where per-actor state loads ONCE (the actor-pool
    rule); ``__call__`` decodes + featurizes the batch. ``mode="stdlib"``
    (default) runs the real BMP/WAV/concat-BMP decoders above;
    ``mode="fake"`` keeps the sha256-derived deterministic vector for
    plumbing-only tests; ``decode_fn`` plugs in an external
    payload→vector decoder (the hook for real image/audio libraries)."""

    DIM = 16

    def __init__(self, decode_fn=None, mode: str = "stdlib",
                 deterministic_fake: bool | None = None):
        # legacy kwarg: deterministic_fake=True meant "use the fake path"
        if deterministic_fake:
            mode = "fake"
        if mode not in ("stdlib", "fake"):
            raise ValueError(f"unknown decode mode {mode!r}")
        self.decode_fn = decode_fn
        self.mode = mode

    def _fake_decode(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[:self.DIM * 2], dtype=np.uint16)
        return (raw.astype(np.float32) / 65535.0)[:self.DIM]

    def _stdlib_decode(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "image":
            return _image_features(decode_image(payload))
        if kind == "audio":
            return _audio_features(*decode_wav(payload))
        if kind == "video":
            frames = split_video_frames(payload)
            if not frames:
                return np.zeros(self.DIM, dtype=np.float32)
            return np.mean([_image_features(decode_bmp(fr))
                            for fr in frames], axis=0).astype(np.float32)
        raise NotImplementedError(
            f"unknown media_type {kind!r}; pass decode_fn=...")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        if self.decode_fn is not None:
            fn = self.decode_fn
        elif self.mode == "fake":
            fn = self._fake_decode
        else:
            fn = self._stdlib_decode
        feats = np.stack([np.asarray(fn(p, k), dtype=np.float32)
                          for p, k in zip(payloads, kinds)]) \
            if payloads else np.zeros((0, self.DIM), dtype=np.float32)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1).astype(np.float32)), self.DIM),
        })


class MediaWitness:
    """Task-pool stage: binary payload → INTEGER decode witnesses
    (pixel sum / value count / PCM |sample| sum / sample count / frame
    count / payload bytes). The witnesses are exact integers derived
    from the REAL stdlib decode path (``decode_bmp`` / ``decode_wav`` /
    ``split_video_frames``), so an independent pure-Python decoder can
    reproduce them bit-for-bit — the checkable-oracle surface for the
    media pipeline (round-3 verdict item 3)."""

    def __init__(self):
        pass

    @staticmethod
    def _one(payload: bytes, kind: str):
        if kind == "image":
            px = decode_image(payload)
            return (int(px.sum(dtype=np.int64)), int(px.size), 0, 0, 1)
        if kind == "audio":
            x, _rate = decode_wav(payload)
            # decode_wav yields float32 = int16/32768 (mono fixtures:
            # no channel averaging) — recover the exact ints
            raw = np.round(x.astype(np.float64) * 32768.0).astype(np.int64)
            return (0, 0, int(np.abs(raw).sum()), int(raw.size), 0)
        if kind == "video":
            frames = split_video_frames(payload)
            tot = nv = 0
            for fr in frames:
                px = decode_bmp(fr)
                tot += int(px.sum(dtype=np.int64))
                nv += int(px.size)
            return (tot, nv, 0, 0, len(frames))
        raise NotImplementedError(
            f"unknown media_type {kind!r}; pass decode_fn=...")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        rows = [self._one(p, k) for p, k in zip(payloads, kinds)]
        arr = np.array(rows, dtype=np.int64).reshape(-1, 5)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "px_sum": pa.array(arr[:, 0]),
            "n_vals": pa.array(arr[:, 1]),
            "pcm_abs_sum": pa.array(arr[:, 2]),
            "n_samples": pa.array(arr[:, 3]),
            "n_frames": pa.array(arr[:, 4]),
            "payload_bytes": pa.array(
                np.array([len(p) for p in payloads], dtype=np.int64)),
        })


def extract_media_witnesses(ds: Dataset, batch_size: int = 64) -> Dataset:
    """Integer decode witnesses per media row (see :class:`MediaWitness`)."""
    from .partition import cached_kernel

    def extract(batch: pa.Table) -> pa.Table:
        return cached_kernel(MediaWitness)(batch)

    return ds.map_batches(extract, batch_format="pyarrow",
                          batch_size=batch_size)


class FrameSampler:
    """Actor-pool stage: 'video' payload → k evenly-spaced frames (real
    BMP bytes demuxed from the concat container). Emits one row per
    frame — the fan-out layout downstream image stages consume."""

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
            fr = split_video_frames(p)
            if not fr:
                continue
            picks = np.round(np.linspace(0, len(fr) - 1,
                                         self.k)).astype(int)
            for i, src in enumerate(picks):
                ids.append(mid)
                fidx.append(i)
                frames.append(fr[src])
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "frame": pa.array(frames, type=pa.binary()),
        })


def extract_media_features(ds: Dataset, decode_fn=None,
                           mode: str = "stdlib",
                           concurrency=(1, 8),
                           batch_size: int = 64) -> Dataset:
    """Media feature pipeline: small batches (large payloads), Arrow-only.
    Task pool + per-worker kernel memo (cheap decoder setup)."""
    from .partition import cached_kernel

    def extract(batch: pa.Table) -> pa.Table:
        return cached_kernel(MediaFeatureExtractor, decode_fn,
                             mode)(batch)

    return ds.map_batches(extract, batch_format="pyarrow",
                          batch_size=batch_size)


def sample_frames(ds: Dataset, k: int = 4, concurrency=None,
                  batch_size: int = 64) -> Dataset:
    from .partition import cached_kernel

    def sample(batch: pa.Table) -> pa.Table:
        return cached_kernel(FrameSampler, k)(batch)

    return ds.map_batches(sample, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash) + near-duplicate image dedup
# ---------------------------------------------------------------------------

def ahash64(px: np.ndarray) -> int:
    """64-bit average hash: block-mean downsample to 8×8 luminance,
    threshold each cell by the 64-cell mean, pack row-major. Robust to
    resizing/re-encoding/small noise; sensitive to content changes —
    the standard cheap perceptual image fingerprint."""
    lum = px.reshape(-1, 3).astype(np.float64) @ \
        np.array([0.299, 0.587, 0.114])
    h, w, _ = px.shape
    lum = lum.reshape(h, w)
    # block-mean resample to 8×8 via bucketed row/col sums (exact for
    # any h, w ≥ 1: cell (i, j) averages rows ⌊ih/8⌋..⌊(i+1)h/8⌋)
    re_ = np.add.reduceat(lum, (np.arange(8) * h) // 8, axis=0)
    ce = np.add.reduceat(re_, (np.arange(8) * w) // 8, axis=1)
    # images under 8px repeat reduceat indices, which return the SINGLE
    # source row/col (divisor 1), not an empty sum (divisor 0)
    rows = np.maximum(np.diff(np.r_[(np.arange(8) * h) // 8, h]), 1)
    cols = np.maximum(np.diff(np.r_[(np.arange(8) * w) // 8, w]), 1)
    cells = ce / np.outer(rows, cols)
    bits = (cells > cells.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImageHasher:
    """Task-pool kernel: decode BMP payloads → 64-bit aHash (int64
    two's-complement transport) per image row; non-image rows pass
    through with a null hash."""

    def __init__(self, payload_col: str = "payload",
                 type_col: str = "media_type"):
        self.payload_col = payload_col
        self.type_col = type_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch[self.type_col].to_numpy(zero_copy_only=False)
        payloads = batch[self.payload_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(batch), dtype=np.int64)
        valid = np.zeros(len(batch), dtype=bool)
        for i in np.flatnonzero(kinds == "image"):
            out[i] = np.int64(np.uint64(ahash64(
                decode_image(payloads[i]))).astype(np.int64))
            valid[i] = True
        return batch.append_column(
            "ahash", pa.array(out, mask=~valid))


def image_ahashes(ds: Dataset, payload_col: str = "payload",
                  type_col: str = "media_type") -> Dataset:
    """Append a 64-bit perceptual aHash to every image row (null for
    audio/video) — one streaming pass, per-worker-memoized kernel."""
    from .partition import cached_kernel

    def fn(batch: pa.Table) -> pa.Table:
        return cached_kernel(ImageHasher, payload_col, type_col)(batch)

    return ds.map_batches(fn, batch_format="pyarrow")


def image_dedup_perceptual(ds: Dataset, id_col: str = "media_id",
                           max_hamming: int = 3,
                           payload_col: str = "payload",
                           type_col: str = "media_type") -> "object":
    """Near-duplicate IMAGE dedup: aHash every image, then cluster
    hashes within ``max_hamming`` bits through the text-simhash path's
    fully distributed banded-Hamming machinery
    (``dedup._simhash_verified_pairs`` + CC tail). The 4×16-bit band
    scheme GUARANTEES recall only for ``max_hamming ≤ 3`` (pigeonhole);
    larger radii are best-effort. Returns the (doc_id, cluster_id,
    is_duplicate) frame over image rows."""
    import ray
    from . import dedup as DD
    from .partition import _stable_hash_strings, derive_num_buckets
    hashed = image_ahashes(ds, payload_col, type_col)

    def img_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        t = t.filter(_pc.is_valid(t["ahash"]))
        ah = t["ahash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # the simhash tail keys on INTEGER doc ids — map string ids via
        # the stable hash and carry the original for the join back
        iid = _stable_hash_strings(ids).astype(np.int64)
        cols = {"doc_id": pa.array(iid), id_col: ids,
                "simhash": t["ahash"]}
        for b in range(4):
            cols[f"sim_band{b}"] = pa.array(
                ((ah >> np.uint64(16 * b)) &
                 np.uint64(0xFFFF)).astype(np.int64))
        return pa.table(cols)

    sig = hashed.map_batches(img_only,
                             batch_format="pyarrow").materialize()
    num_buckets = derive_num_buckets(sig)
    verified = DD._simhash_verified_pairs(
        sig.drop_columns([id_col]), max_hamming, num_buckets)
    out = DD._cluster_output(sig.select_columns(["doc_id"]), verified,
                             "doc_id", num_buckets, "pandas")
    # restore original ids (cluster ids stay in hashed-int space —
    # stable, deterministic labels)
    mp = pa.concat_tables(
        [ray.get(r) for r in
         sig.select_columns(["doc_id", id_col]).to_arrow_refs()]
    ).to_pandas().drop_duplicates("doc_id").set_index("doc_id")[id_col]
    out["doc_id"] = out["doc_id"].map(mp)
    return out


def audio_fingerprint64(x: np.ndarray, rate: int) -> int:
    """64-bit Haitsma–Kalker-style audio fingerprint: split the clip
    into 9 equal time segments, measure FFT energy in 8 log-spaced
    bands per segment, and emit bit (t, b) = E[t+1, b] > E[t, b] —
    delta-coding makes the hash invariant to amplitude scaling (energy
    ratios survive gain changes) and robust to mild noise, the public
    'robust audio hashing' construction. ``rate`` fixes the band edges
    so resampled copies land in the same bands."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 18:
        x = np.pad(x, (0, 18 - n))
        n = len(x)
    seg_starts = (np.arange(10) * n) // 9
    # log-spaced band edges between 300 Hz and Nyquist (min 8 bins)
    bands = np.zeros((9, 8))
    for t in range(9):
        seg = x[seg_starts[t]:seg_starts[t + 1]]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / max(rate, 1))
        lo, hi = 300.0, max(rate, 1) / 2.0
        if hi <= lo:
            lo, hi = 0.0, freqs[-1] if len(freqs) else 1.0
        edges = np.geomspace(max(lo, 1e-9), hi, 9)
        idx = np.searchsorted(freqs, edges)
        for b in range(8):
            s, e = idx[b], max(idx[b + 1], idx[b] + 1)
            bands[t, b] = spec[s:e].sum()
    bits = (bands[1:] > bands[:-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def audio_dedup_perceptual(ds: Dataset, id_col: str = "media_id",
                           max_hamming: int = 3,
                           payload_col: str = "payload",
                           type_col: str = "media_type") -> "object":
    """Near-duplicate AUDIO dedup: fingerprint every audio row
    (``audio_fingerprint64`` over decoded WAV bytes), then cluster
    within ``max_hamming`` bits through the same banded-Hamming tail
    as :func:`image_dedup_perceptual` (recall guaranteed ≤ 3 bits)."""
    import ray
    from . import dedup as DD
    from .partition import _stable_hash_strings, derive_num_buckets

    def fp_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        kinds = t[type_col].to_numpy(zero_copy_only=False)
        payloads = t[payload_col].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sel = np.flatnonzero(kinds == "audio")
        fps = np.zeros(len(sel), dtype=np.uint64)
        for j, i in enumerate(sel):
            x, rate = decode_wav(payloads[i])
            fps[j] = np.uint64(audio_fingerprint64(x, rate))
        ids = ids.take(pa.array(sel.astype(np.int64)))
        iid = _stable_hash_strings(ids).astype(np.int64)
        cols = {"doc_id": pa.array(iid), id_col: ids,
                "simhash": pa.array(fps.astype(np.int64))}
        for b in range(4):
            cols[f"sim_band{b}"] = pa.array(
                ((fps >> np.uint64(16 * b)) &
                 np.uint64(0xFFFF)).astype(np.int64))
        return pa.table(cols)

    sig = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()
    num_buckets = derive_num_buckets(sig)
    verified = DD._simhash_verified_pairs(
        sig.drop_columns([id_col]), max_hamming, num_buckets)
    out = DD._cluster_output(sig.select_columns(["doc_id"]), verified,
                             "doc_id", num_buckets, "pandas")
    mp = pa.concat_tables(
        [ray.get(r) for r in
         sig.select_columns(["doc_id", id_col]).to_arrow_refs()]
    ).to_pandas().drop_duplicates("doc_id").set_index("doc_id")[id_col]
    out["doc_id"] = out["doc_id"].map(mp)
    return out


def video_dedup_perceptual(ds: Dataset, id_col: str = "media_id",
                           max_hamming: int = 3,
                           payload_col: str = "payload",
                           type_col: str = "media_type") -> "object":
    """Near-duplicate VIDEO dedup: each clip's fingerprint is the
    64-bit aHash of its MEAN FRAME (pixel-wise average over demuxed
    BMP frames — invariant to frame reordering and robust to
    per-frame noise), clustered through the shared banded-Hamming
    tail. Completes the image/audio/video perceptual-dedup trio."""
    import ray
    from . import dedup as DD
    from .partition import _stable_hash_strings, derive_num_buckets

    def fp_rows(t: pa.Table) -> pa.Table:
        kinds = t[type_col].to_numpy(zero_copy_only=False)
        payloads = t[payload_col].to_numpy(zero_copy_only=False)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sel = np.flatnonzero(kinds == "video")
        fps = np.zeros(len(sel), dtype=np.uint64)
        for j, i in enumerate(sel):
            frames = [decode_bmp(f).astype(np.float64)
                      for f in split_video_frames(payloads[i])]
            mean = np.mean(frames, axis=0)
            fps[j] = np.uint64(ahash64(
                np.clip(mean, 0, 255).astype(np.uint8)))
        ids = ids.take(pa.array(sel.astype(np.int64)))
        iid = _stable_hash_strings(ids).astype(np.int64)
        cols = {"doc_id": pa.array(iid), id_col: ids,
                "simhash": pa.array(fps.astype(np.int64))}
        for b in range(4):
            cols[f"sim_band{b}"] = pa.array(
                ((fps >> np.uint64(16 * b)) &
                 np.uint64(0xFFFF)).astype(np.int64))
        return pa.table(cols)

    sig = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()
    num_buckets = derive_num_buckets(sig)
    verified = DD._simhash_verified_pairs(
        sig.drop_columns([id_col]), max_hamming, num_buckets)
    out = DD._cluster_output(sig.select_columns(["doc_id"]), verified,
                             "doc_id", num_buckets, "pandas")
    mp = pa.concat_tables(
        [ray.get(r) for r in
         sig.select_columns(["doc_id", id_col]).to_arrow_refs()]
    ).to_pandas().drop_duplicates("doc_id").set_index("doc_id")[id_col]
    out["doc_id"] = out["doc_id"].map(mp)
    return out


def probe_media(payload: bytes) -> dict:
    """Header-only media probe — the cheap metadata pass a catalog or
    triage stage runs BEFORE any full decode (100-TB reality: you
    size/route/filter by header, decode only survivors). Parses only
    the fixed header bytes of the container:

    * BMP  → width, height, bpp
    * PNG  → width, height, bit depth, color type
    * JPEG → width, height, components (first SOF0/1/2 marker walk)
    * GIF  → width, height (logical screen)
    * WAV  → channels, sample rate, bits, n_frames

    Returns ``{format, width, height, ...}``; unknown magics →
    ``{"format": "unknown"}`` (never raises — a probe must survive
    junk bytes)."""
    import struct
    try:
        if payload[:2] == b"BM" and len(payload) >= 30:
            w, h = struct.unpack_from("<ii", payload, 18)
            bpp = struct.unpack_from("<H", payload, 28)[0]
            return {"format": "bmp", "width": int(w),
                    "height": int(abs(h)), "bpp": int(bpp)}
        if payload[:8] == _PNG_SIG and len(payload) >= 26:
            w, h = struct.unpack_from(">II", payload, 16)
            depth, ctype = payload[24], payload[25]
            return {"format": "png", "width": int(w),
                    "height": int(h), "bit_depth": int(depth),
                    "color_type": int(ctype)}
        if payload[:2] == b"\xFF\xD8":
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack_from(">HH", payload, i + 5)
                    nc = payload[i + 9]
                    return {"format": "jpeg", "width": int(w),
                            "height": int(h),
                            "components": int(nc)}
                seg = struct.unpack_from(">H", payload, i + 2)[0]
                i += 2 + seg
            return {"format": "jpeg", "width": None, "height": None}
        if payload[:4] == b"GIF8" and len(payload) >= 10:
            w, h = struct.unpack_from("<HH", payload, 6)
            return {"format": "gif", "width": int(w),
                    "height": int(h)}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            with wave.open(io.BytesIO(payload), "rb") as wf:
                return {"format": "wav",
                        "channels": wf.getnchannels(),
                        "rate": wf.getframerate(),
                        "bits": wf.getsampwidth() * 8,
                        "n_frames": wf.getnframes()}
    except Exception:
        pass
    return {"format": "unknown"}


def probe_media_batch(ds, payload_col: str = "payload",
                      id_col: str = "media_id"):
    """Streaming header probe over a binary media column — emits
    (id, format, width, height) without decoding a single pixel."""
    def fn(t: pa.Table) -> pa.Table:
        col = t[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fmts, ws, hs = [], [], []
        for v in col:
            info = probe_media(v.as_py() if v.is_valid else b"")
            fmts.append(info.get("format"))
            ws.append(info.get("width"))
            hs.append(info.get("height"))
        return pa.table({id_col: t[id_col],
                         "format": pa.array(fmts, pa.string()),
                         "width": pa.array(ws, pa.int64()),
                         "height": pa.array(hs, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")
