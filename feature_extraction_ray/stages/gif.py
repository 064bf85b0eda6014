"""Baseline GIF codec — pure numpy + stdlib, no image libraries.

Decoder: GIF87a/GIF89a logical screen + global/local color tables,
extension blocks skipped (graphic-control/comment/application), full
variable-width LZW decompression (clear/EOI codes, dictionary growth to
12 bits, the KwKwK self-reference case, table-full streams) via
prefix-link tables — only the per-code dictionary walk loops, output
reconstruction is array backtracking. Interlaced images are supported
(the 4-pass row reorder is a single index permutation). Multi-frame
(animated) streams decode frame-by-frame; frame composition
(disposal/transparency blending) is NOT implemented — each frame
returns its own indexed rectangle mapped through its palette, which is
exact for the full-frame-replacement GIFs the multimodal fixtures
generate (and the documented ``decode_fn`` hook covers the rest).

Encoder: GIF89a with a power-of-two global palette and real LZW
compression (CLEAR + table rebuild at 4096 codes, variable width in
sync with the decoder's giflib-convention bump), single frame,
optional interlace.

The GIF spec (CompuServe GIF89a, public) is the reference; no
counterpart exists in the reference repo (it has no media code).
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_MAX_CODES = 4096


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> np.ndarray:
    """GIF LZW → uint8 index stream (``n_expected`` pixels).

    Width rule (giflib convention, mirrored by :func:`_lzw_encode`):
    after adding an entry, if ``next_code`` no longer fits the current
    width, the width grows — capped at 12 bits, after which no entries
    are added until a CLEAR."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    clear = 1 << min_code
    eoi = clear + 1
    prefix = np.full(_MAX_CODES, -1, dtype=np.int32)
    suffix = np.zeros(_MAX_CODES, dtype=np.uint8)
    length = np.zeros(_MAX_CODES, dtype=np.int32)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    length[:clear] = 1

    out = np.zeros(n_expected, dtype=np.uint8)
    pos, nout = 0, 0
    width = min_code + 1
    next_code = eoi + 1
    prev = -1
    nbits = len(bits)
    pw2 = 1 << np.arange(12)

    def emit(code: int, at: int) -> int:
        ln = int(length[code])
        c = code
        i = ln - 1
        while c >= 0:
            if at + i < n_expected:
                out[at + i] = suffix[c]
            c = prefix[c]
            i -= 1
        return min(ln, n_expected - at)

    def first_byte(code: int) -> int:
        c = code
        while prefix[c] >= 0:
            c = prefix[c]
        return int(suffix[c])

    while pos + width <= nbits and nout < n_expected:
        code = int(bits[pos:pos + width] @ pw2[:width])
        pos += width
        if code == clear:
            next_code = eoi + 1
            width = min_code + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:                       # first code after clear
            if code >= clear:
                raise NotImplementedError(
                    "corrupt GIF LZW stream (first code not a root); "
                    "pass decode_fn=...")
            nout += emit(code, nout)
            prev = code
            continue
        known = code < next_code
        if not known and code != next_code:
            raise NotImplementedError(
                "corrupt GIF LZW stream (code beyond dictionary); "
                "pass decode_fn=...")
        first = first_byte(code if known else prev)
        added = -1
        if next_code < _MAX_CODES:
            prefix[next_code] = prev
            suffix[next_code] = np.uint8(first)
            length[next_code] = length[prev] + 1
            added = next_code
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1
        if known:
            nout += emit(code, nout)
        elif added >= 0:                   # KwKwK: emit the new entry
            nout += emit(added, nout)
        else:
            raise NotImplementedError(
                "corrupt GIF LZW stream (KwKwK with a full table); "
                "pass decode_fn=...")
        prev = code
    if nout < n_expected:
        raise NotImplementedError(
            "truncated GIF LZW stream; pass decode_fn=...")
    return out


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """uint8 index stream → GIF LZW bytes (CLEAR-led; width bumps after
    each add exactly when the decoder's does, CLEAR + rebuild at 4096)."""
    clear = 1 << min_code
    eoi = clear + 1
    out_bits: list[int] = []

    def put(code: int, width: int):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    width = min_code + 1
    next_code = eoi + 1
    table: dict[tuple[int, int], int] = {}
    put(clear, width)
    prev = -1
    for px in indices.tolist():
        if prev < 0:
            prev = px
            continue
        got = table.get((prev, px))
        if got is not None:
            prev = got
            continue
        put(prev, width)
        if next_code < _MAX_CODES:
            table[(prev, px)] = next_code
            next_code += 1
            # ONE ADD LATER than the decoder's bump (>= there, > here):
            # the decoder defines each entry only when it READS the
            # next code, so at equal stream positions it is one entry
            # behind the encoder — bumping in lockstep would desync the
            # width of exactly the boundary code
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code + 1
        prev = px
    if prev >= 0:
        put(prev, width)
    put(eoi, width)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Stored-stream position → display row (the 4-pass order)."""
    return np.concatenate([np.arange(s, h, step)
                           for s, step in _INTERLACE_PASSES
                           if s < h]).astype(np.int64)


def decode_gif_frames(payload: bytes):
    """Yield (h, w, 3) uint8 RGB frames from a GIF87a/89a stream."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "not a GIF payload — decoding other image formats requires "
            "an image library (e.g. Pillow) not present in this "
            "container; pass decode_fn=...")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8,
                            count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            return
        if block == _EXTENSION:
            pos += 1                      # label byte
            while payload[pos]:           # sub-blocks until terminator
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != _IMAGE_SEP:
            raise NotImplementedError(
                f"unknown GIF block 0x{block:02x}; pass decode_fn=...")
        _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8,
                                count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise NotImplementedError(
                "GIF image with no color table; pass decode_fn=...")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h) \
            .reshape(h, w)
        if iflags & 0x40:                 # interlaced: undo row order
            disp = np.empty((h, w), dtype=np.uint8)
            disp[_interlace_order(h)] = idx
            idx = disp
        yield pal[np.minimum(idx, len(pal) - 1)]


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF stream → (h, w, 3) uint8 RGB."""
    for frame in decode_gif_frames(payload):
        return frame
    raise NotImplementedError(
        "GIF stream has no image block; pass decode_fn=...")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a. The palette is built
    from the image's distinct colors (≤ 256 — raise beyond; palette
    quantization is out of scope for a codec used on synthetic
    fixtures)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise NotImplementedError(
            "encode_gif writes palette images (<= 256 distinct colors); "
            "quantize first")
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    min_code = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", _IMAGE_SEP, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(_TRAILER)
    return bytes(out)
