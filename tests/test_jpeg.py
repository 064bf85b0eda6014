"""JPEG codec tests: the engine decoder is verified against an
INDEPENDENT spec-level reference decoder written here from the standard
(own zigzag literal, own canonical-Huffman build, own bit-at-a-time
reader, own direct-cosine-sum IDCT, own color convert / upsample) —
the same strategy the PNG unfilter test uses. Shared conventions are
limited to table DATA and the two spec-free rounding choices (pixel
rounding, IDCT rounding), which any decoder pair must agree on to be
bit-comparable."""
import struct

import numpy as np
import pytest

from feature_extraction_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                                _zigzag)

# the standard zigzag order, as a hardcoded literal (independent of the
# engine's diagonal-walk generator)
ZZ_LITERAL = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _test_image(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 / (w - 1)), (yy * 255 / (h - 1)),
                    ((xx + yy) % 32) * 8], axis=-1).astype(np.uint8)
    img[10:20, 10:30] = [200, 30, 30]
    img[25:33, 40:52] = [20, 180, 220]
    return img


def test_zigzag_generator_matches_spec_literal():
    assert _zigzag().tolist() == ZZ_LITERAL


# --------------------------------------------------------------------------
# independent reference decoder (slow, per-spec)
# --------------------------------------------------------------------------

class _RefBits:
    def __init__(self, d, pos):
        self.d, self.pos, self.buf = d, pos, []

    def bit(self):
        if not self.buf:
            b = self.d[self.pos]
            if b == 0xFF:
                assert self.d[self.pos + 1] == 0x00, "marker in scan"
                self.pos += 2
            else:
                self.pos += 1
            self.buf = [(b >> i) & 1 for i in range(7, -1, -1)]
        return self.buf.pop(0)

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = v * 2 + self.bit()
        return v

    def sync_restart(self):
        self.buf = []
        assert self.d[self.pos] == 0xFF and \
            0xD0 <= self.d[self.pos + 1] <= 0xD7
        self.pos += 2


def _ref_huff(bits, vals):
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code, k = code + 1, k + 1
        code *= 2
    return table


def _ref_decode(data):
    """Reference baseline decoder: marker walk, Huffman scan, per-block
    direct cosine-sum IDCT, replication upsample, BT.601 to RGB."""
    assert data[:2] == b"\xFF\xD8"
    pos, qts, huffs, comps, scan = 2, {}, {}, None, None
    h = w = ri = 0
    while True:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:
            i = 0
            while i < len(body):
                tid = body[i] & 0xF
                t = [0] * 64
                for j in range(64):
                    t[ZZ_LITERAL[j]] = body[i + 1 + j]
                qts[tid] = t
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(body):
                key = (body[i] >> 4, body[i] & 0xF)
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                huffs[key] = _ref_huff(bits, list(body[i + 17:i + 17 + n]))
                i += 17 + n
        elif m == 0xC0:
            h = body[1] * 256 + body[2]
            w = body[3] * 256 + body[4]
            comps = []
            for c in range(body[5]):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append([cid, hv >> 4, hv & 0xF, tq])
        elif m == 0xDD:
            ri = body[0] * 256 + body[1]
        elif m == 0xDA:
            scan = []
            for c in range(body[0]):
                scan.append((body[1 + 2 * c], body[2 + 2 * c] >> 4,
                             body[2 + 2 * c] & 0xF))
            break
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    coeff = {c[0]: {} for c in comps}
    rd = _RefBits(data, pos)
    pred = {c[0]: 0 for c in comps}

    def read_sym(tbl):
        code, ln = 0, 0
        while True:
            code = code * 2 + rd.bit()
            ln += 1
            if (ln, code) in tbl:
                return tbl[(ln, code)]

    def extend(v, s):
        if s == 0:
            return 0
        return v if v >= 2 ** (s - 1) else v - 2 ** s + 1

    for mcu in range(mx * my):
        if ri and mcu and mcu % ri == 0:
            rd.sync_restart()
            pred = {c[0]: 0 for c in comps}
        r, c0 = divmod(mcu, mx)
        for cid, td, ta in scan:
            comp = next(cc for cc in comps if cc[0] == cid)
            for v in range(comp[2]):
                for hh in range(comp[1]):
                    s = read_sym(huffs[(0, td)])
                    pred[cid] += extend(rd.bits(s), s)
                    blk = [0] * 64
                    blk[0] = pred[cid]
                    k = 1
                    while k < 64:
                        sym = read_sym(huffs[(1, ta)])
                        if sym == 0:
                            break
                        if sym == 0xF0:
                            k += 16
                            continue
                        k += sym >> 4
                        blk[k] = extend(rd.bits(sym & 0xF), sym & 0xF)
                        k += 1
                    coeff[cid][(r * comp[2] + v,
                                c0 * comp[1] + hh)] = blk

    # direct cosine-sum IDCT over NATURAL-order dequantized coefficients
    def idct(blk, qt):
        nat = np.zeros(64)
        for j in range(64):
            nat[ZZ_LITERAL[j]] = blk[j] * qt[ZZ_LITERAL[j]]
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    for v in range(8):
                        cv = np.sqrt(0.125) if v == 0 else 0.5
                        s += cu * cv * nat[u * 8 + v] * \
                            np.cos((2 * x + 1) * u * np.pi / 16) * \
                            np.cos((2 * y + 1) * v * np.pi / 16)
                out[x, y] = s
        return out

    planes = {}
    for cid, hi, vi, tq in comps:
        ph, pw = my * vi * 8, mx * hi * 8
        plane = np.zeros((ph, pw))
        for (br, bc), blk in coeff[cid].items():
            plane[br * 8:br * 8 + 8, bc * 8:bc * 8 + 8] = \
                idct(blk, qts[tq])
        plane = np.clip(np.round(plane) + 128.0, 0, 255)
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        planes[cid] = plane[:h, :w]
    y_, cb, cr = planes[1], planes[2] - 128.0, planes[3] - 128.0
    r = y_ + 1.402 * cr
    g = y_ - 0.344136286 * cb - 0.714136286 * cr
    b = y_ + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


@pytest.mark.parametrize("sub,ri", [("444", 0), ("444", 2),
                                    ("420", 0), ("420", 3)])
def test_engine_decode_matches_independent_reference(sub, ri):
    img = _test_image()
    data = encode_jpeg(img, quality=80, subsampling=sub,
                       restart_interval=ri)
    got = decode_jpeg(data)
    exp = _ref_decode(data)
    np.testing.assert_array_equal(got, exp)


def test_roundtrip_psnr_and_subsampling_tradeoff():
    img = _test_image()
    full = encode_jpeg(img, quality=90, subsampling="444")
    sub = encode_jpeg(img, quality=90, subsampling="420")
    out_full = decode_jpeg(full)
    out_sub = decode_jpeg(sub)

    def psnr(a, b):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        return 10 * np.log10(255 ** 2 / max(mse, 1e-12))

    assert out_full.shape == img.shape == out_sub.shape
    assert psnr(out_full, img) >= 33.0
    assert psnr(out_sub, img) >= 22.0        # lossy chroma, still sane
    assert len(sub) < len(full)              # 4:2:0 actually compresses
    # quality ladder: lower quality -> smaller file, worse psnr
    lo = encode_jpeg(img, quality=25, subsampling="444")
    assert len(lo) < len(full)
    assert psnr(decode_jpeg(lo), img) < psnr(out_full, img)


def test_restart_markers_do_not_change_pixels():
    img = _test_image()
    a = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=2))
    np.testing.assert_array_equal(a, b)


def test_dispatcher_and_extractor_accept_jpeg():
    from feature_extraction_ray.stages.multimodal import (
        MediaFeatureExtractor, decode_image)
    img = _test_image()
    data = encode_jpeg(img, quality=90)
    np.testing.assert_array_equal(decode_image(data), decode_jpeg(data))
    import pyarrow as pa
    batch = pa.table({
        "media_id": ["j1"], "payload": pa.array([data], type=pa.binary()),
        "media_type": ["image"]})
    out = MediaFeatureExtractor()(batch)
    feats = np.asarray(out["features"][0].as_py())
    assert feats.shape == (16,) and np.isfinite(feats).all()
    assert feats.any()


def test_unsupported_variants_raise_documented_hook():
    img = _test_image(16, 16)
    data = bytearray(encode_jpeg(img, quality=80))
    # flip SOF0 -> SOF2 (progressive): find the FFC0 marker
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="decode_fn"):
        decode_jpeg(bytes(data))
    with pytest.raises(NotImplementedError, match="decode_fn"):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_grey_single_component_stream_decodes():
    """Hand-built 1-component (greyscale) stream: the decoder must
    broadcast the luma plane to 3 channels."""
    from feature_extraction_ray.stages.jpeg import (_AC_LUMA, _DC_LUMA,
                                                    _BitWriter, _ZZ,
                                                    _canonical_codes,
                                                    _encode_block,
                                                    _fdct_quant,
                                                    _quality_tables)
    grey = ((np.mgrid[0:16, 0:16][0] * 16) % 256).astype(np.uint8)
    qt, _ = _quality_tables(85)
    coeffs = _fdct_quant(grey.astype(np.float64), qt)
    wr = _BitWriter()
    dc = _canonical_codes(*_DC_LUMA)
    ac = _canonical_codes(*_AC_LUMA)
    pred = 0
    for blk in coeffs:
        pred = _encode_block(wr, blk, pred, dc, ac)
    wr.flush()

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) +
                 bytes(_DC_LUMA[1]))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) +
                 bytes(_AC_LUMA[1]))
    dqt = seg(0xDB, bytes([0]) + bytes(int(qt[z]) for z in _ZZ))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    data = (b"\xFF\xD8" + dqt + seg(0xC0, sof) + dht_dc + dht_ac +
            sos + bytes(wr.out) + b"\xFF\xD9")
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    # quantization error bounded: DC quantizer alone caps the block-mean
    # error; require per-pixel agreement within a generous lossy bound
    assert np.abs(out[..., 0].astype(int) - grey.astype(int)).max() <= 40
