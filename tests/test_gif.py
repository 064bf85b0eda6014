"""GIF codec (stages/gif.py): LZW roundtrips through every regime
(width growth to 12 bits, 4096-table CLEAR+rebuild, KwKwK), an
INDEPENDENT textbook string-table decoder cross-checking the prefix-
link decoder, a real-world stream (the canonical 1×1 data-URI pixel),
interlace, multi-frame, and the decode_image dispatch."""
import base64
import struct

import numpy as np
import pytest

from feature_extraction_ray.stages.gif import (_interlace_order,
                                               _lzw_decode, _lzw_encode,
                                               decode_gif,
                                               decode_gif_frames,
                                               encode_gif)
from feature_extraction_ray.stages.multimodal import decode_image


def ref_lzw_decode(data: bytes, min_code: int) -> list:
    """Independent textbook LZW decoder: explicit byte-string table,
    no prefix links (O(n²) worst case — test-only)."""
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out, pos = [], 0
    table = None
    width = min_code + 1
    prev = None
    while pos + width <= len(bits):
        code = int(bits[pos:pos + width] @ (1 << np.arange(width)))
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        # emulate the 4096 cap: stop adding (pop the over-add)
        if len(table) > 4096:
            table.pop()
        out.append(entry)
        prev = entry
    return list(b"".join(out))


@pytest.mark.parametrize("seed,n,k", [(0, 500, 4), (1, 5000, 30),
                                      (2, 60000, 200)])
def test_lzw_roundtrip_and_independent_decoder(seed, n, k):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, k, n).astype(np.uint8)
    mc = max(2, int(np.ceil(np.log2(k))))
    enc = _lzw_encode(seq, mc)
    assert np.array_equal(_lzw_decode(enc, mc, n), seq)
    assert ref_lzw_decode(enc, mc)[:n] == seq.tolist()


def test_lzw_kwkwk_and_runs():
    # constant and near-constant streams hit code==next_code immediately
    for seq in ([0] * 50, [1, 1, 1, 2, 2, 2, 1, 1, 1, 1],
                [0, 0, 0, 0, 1, 0, 0, 0, 0]):
        a = np.array(seq, dtype=np.uint8)
        enc = _lzw_encode(a, 2)
        assert np.array_equal(_lzw_decode(enc, 2, len(a)), a)
        assert ref_lzw_decode(enc, 2)[:len(a)] == seq


def test_gif_roundtrips():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, (17, 23, 1)).repeat(3, axis=2) \
        .astype(np.uint8) * 60
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    pal = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    img2 = pal[rng.integers(0, 200, (80, 120))]
    assert np.array_equal(decode_gif(encode_gif(img2)), img2)
    # noisy 300x300: dictionary reaches 4096 -> CLEAR + rebuild
    img3 = pal[rng.integers(0, 200, (300, 300))]
    assert np.array_equal(decode_gif(encode_gif(img3)), img3)
    # interlaced storage decodes to the same image
    assert np.array_equal(decode_gif(encode_gif(img2, interlace=True)),
                          img2)
    # flat image: LZW actually compresses
    img4 = np.zeros((64, 64, 3), np.uint8)
    img4[20:40, 20:40] = 200
    enc = encode_gif(img4)
    assert len(enc) < 64 * 64
    assert np.array_equal(decode_gif(enc), img4)


def test_interlace_order_is_spec_permutation():
    o = _interlace_order(10)
    # rows 0,8 (pass 1), 4 (pass 2), 2,6 (pass 3), odd rows (pass 4)
    assert o.tolist() == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert sorted(_interlace_order(37).tolist()) == list(range(37))


def test_real_world_pixel_and_dispatch():
    # the canonical 1x1 transparent-pixel data URI (public domain)
    real = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    f = decode_gif(real)
    assert f.shape == (1, 1, 3) and f.ravel().tolist() == [0, 0, 0]
    # decode_image dispatches on the GIF8 magic
    img = np.full((5, 7, 3), 90, np.uint8)
    assert np.array_equal(decode_image(encode_gif(img)), img)
    with pytest.raises(NotImplementedError):
        decode_gif(b"NOTAGIF")


def test_multiframe_stream():
    rng = np.random.default_rng(4)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    f1 = pal[rng.integers(0, 4, (9, 11))]
    f2 = pal[rng.integers(0, 4, (9, 11))]
    g1, g2 = encode_gif(f1), encode_gif(f2)
    # splice frame 2's image block (after header+LSD+GCT, before the
    # trailer) into stream 1 — both share the same 4-color palette
    hdr = 6 + 7 + 3 * 4
    assert g1[:hdr] == g2[:hdr]
    spliced = g1[:-1] + g2[hdr:-1] + bytes([0x3B])
    frames = list(decode_gif_frames(spliced))
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)


def test_extension_blocks_skipped():
    img = np.full((3, 3, 3), 10, np.uint8)
    g = encode_gif(img)
    hdr = 6 + 7 + 3 * 2                    # 1-color -> 2-entry table
    # inject a graphic-control extension before the image block
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    assert np.array_equal(decode_gif(g[:hdr] + gce + g[hdr:]), img)


def test_palette_cap():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)  # ~1600 colors
    with pytest.raises(NotImplementedError):
        encode_gif(img)


def test_animated_gif_feeds_video_demux():
    from feature_extraction_ray.stages.multimodal import (
        decode_bmp, split_video_frames)
    rng = np.random.default_rng(9)
    pal = np.array([[0, 0, 0], [255, 255, 255], [200, 10, 10]], np.uint8)
    f1, f2 = pal[rng.integers(0, 3, (7, 9))], pal[rng.integers(0, 3, (7, 9))]
    from feature_extraction_ray.stages.gif import encode_gif
    g1, g2 = encode_gif(f1), encode_gif(f2)
    hdr = 6 + 7 + 3 * 4
    # palettes may differ between frames; rebuild with a merged palette
    # by re-encoding both frames' union — simplest: concat image blocks
    # only when headers agree, else encode each frame from shared pal
    if g1[:hdr] == g2[:hdr]:
        anim = g1[:-1] + g2[hdr:-1] + bytes([0x3B])
        frames = split_video_frames(anim)
        assert len(frames) == 2
        assert np.array_equal(decode_bmp(frames[0]), f1)
        assert np.array_equal(decode_bmp(frames[1]), f2)
    single = split_video_frames(encode_gif(f1))
    assert len(single) == 1 and np.array_equal(decode_bmp(single[0]), f1)


def test_resize_image_block_mean():
    from feature_extraction_ray.stages.multimodal import resize_image
    # exact 2x downsample: each output cell is the mean of a 2x2 block
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_image(img, 2, 3)
    assert out.shape == (2, 3, 3)
    exp = np.floor(img.reshape(2, 2, 3, 2, 3).astype(np.float64)
                   .mean(axis=(1, 3)) + 0.5).astype(np.uint8)
    assert np.array_equal(out, exp)
    # identity resize
    assert np.array_equal(resize_image(img, 4, 6), img)
    # upscale replicates source cells exactly
    up = resize_image(img, 8, 6)
    assert np.array_equal(up[0], up[1]) and np.array_equal(up[0], img[0])
    # perceptual hash invariant under 2x upscale (>= 8px base)
    from feature_extraction_ray.stages.multimodal import ahash64
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    assert ahash64(resize_image(base, 32, 32)) == ahash64(base)
    # sub-8px images hash without the zero-divisor artifact
    tiny = rng.integers(0, 255, (4, 5, 3)).astype(np.uint8)
    assert ahash64(resize_image(tiny, 8, 10)) == ahash64(tiny)


def test_gif87a_magic_accepted():
    # GIF87a streams share the layout; only the version bytes differ
    img = np.full((4, 4, 3), 33, np.uint8)
    g = bytearray(encode_gif(img))
    g[3:6] = b"87a"
    assert np.array_equal(decode_gif(bytes(g)), img)


def test_edge_shapes_and_full_palette():
    rng = np.random.default_rng(12)
    # exactly 256 distinct colors: 8-bit palette, clear code 256,
    # starting width 9
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256]
                    for i in range(256)], np.uint8)
    img = pal[rng.integers(0, 256, (40, 50))]
    assert len(np.unique(img.reshape(-1, 3), axis=0)) == 256
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    one = np.array([[[5, 6, 7]]], np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)
    for shape in ((1, 17), (17, 1)):
        im = (rng.integers(0, 3, (*shape, 1)).repeat(3, axis=2)
              .astype(np.uint8) * 80)
        assert np.array_equal(
            decode_gif(encode_gif(im, interlace=True)), im)
