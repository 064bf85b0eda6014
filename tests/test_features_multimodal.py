"""Feature-registry stage + multimodal stub plumbing tests."""
import datetime

import numpy as np
import pytest
import ray.data as rd

from feature_extraction_ray import fixtures as FX
from feature_extraction_ray.stages import multimodal as MM
from feature_extraction_ray.stages.features import (
    FEATURE_REGISTRY, extract_group_features, lexical_diversity_features,
    verbosity_features)


def test_feature_registry_dispatch():
    segs = [np.array([1, 2, 3]), np.array([2, 2])]
    for name, fn in FEATURE_REGISTRY.items():
        out = fn(segs)
        assert isinstance(out, dict) and out, name


def test_extract_group_features_dataset():
    tbl = FX.gen_tokens(n_rows=200, n_entities=4, seed=17)
    ds = rd.from_arrow(tbl)
    out = extract_group_features(
        ds, entity_col="entity", ts_col="ts",
        session_gap=datetime.timedelta(hours=1),
        order_cols=["doc_id"], num_buckets=4).to_pandas()
    assert len(out) > 4                      # more groups than entities
    assert {"wc_mean", "MATTR_50", "HS", "num_nodes_naive",
            "ave_degree_naive", "session_id"} <= set(out.columns)
    # verbosity oracle for one group
    pdf = tbl.to_pandas()
    ent0 = out.iloc[0]["entity"]
    # total tokens of entity across sessions == sum over its rows
    got_total = out[out["entity"] == ent0]["total_count"].sum()
    exp_total = pdf[pdf["entity"] == ent0]["n_tok"].sum()
    assert got_total == exp_total


def test_media_features_real_decode_deterministic():
    tbl = MM.synth_media_table(24)
    ds = rd.from_arrow(tbl)
    out1 = MM.extract_media_features(ds).to_pandas().sort_values(
        "media_id").reset_index(drop=True)
    out2 = MM.extract_media_features(rd.from_arrow(tbl)).to_pandas(
    ).sort_values("media_id").reset_index(drop=True)
    assert len(out1) == 24
    f1 = np.stack(out1["features"].to_numpy())
    f2 = np.stack(out2["features"].to_numpy())
    np.testing.assert_array_equal(f1, f2)    # content-deterministic
    assert f1.shape == (24, MM.MediaFeatureExtractor.DIM)
    assert (f1 >= 0).all() and (f1 <= 1).all()
    # real decode: every vector is content-derived, none all-zero
    assert (np.abs(f1).sum(axis=1) > 0).all()


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    for w, h in [(5, 3), (8, 8), (13, 2)]:   # odd widths test row padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = MM.decode_bmp(MM.encode_bmp(px))
        np.testing.assert_array_equal(got, px)


def _build_filtered_png(px: np.ndarray, ch: int, ctype: int) -> bytes:
    """Independent spec-level PNG builder: FILTERS scanlines with the
    per-spec byte-at-a-time formulas (cycling through filter types
    0..4 row by row), so the engine's vectorized unfilter is checked
    against a second implementation, not a roundtrip of itself."""
    import struct
    import zlib
    h, w = px.shape[0], px.shape[1]
    flat = px.reshape(h, w * ch).astype(int)
    recon = [[0] * (w * ch) for _ in range(h)]
    scan = bytearray()
    for r in range(h):
        ft = r % 5
        scan.append(ft)
        for x in range(w * ch):
            a = recon[r][x - ch] if x >= ch else 0
            b = recon[r - 1][x] if r > 0 else 0
            c = recon[r - 1][x - ch] if (r > 0 and x >= ch) else 0
            orig = flat[r][x]
            recon[r][x] = orig
            if ft == 0:
                f = orig
            elif ft == 1:
                f = (orig - a) % 256
            elif ft == 2:
                f = (orig - b) % 256
            elif ft == 3:
                f = (orig - (a + b) // 2) % 256
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                f = (orig - pred) % 256
            scan.append(f)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (MM._PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(scan))) +
            chunk(b"IEND", b""))


def test_png_roundtrip_exact():
    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (5, 3), (16, 16), (13, 2), (2, 33)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = MM.decode_png(MM.encode_png(px))
        np.testing.assert_array_equal(got, px)


def test_png_all_filter_types_vs_spec_reference():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    got = MM.decode_png(_build_filtered_png(px, 3, 2))
    np.testing.assert_array_equal(got, px)


def test_png_color_types_grey_greyalpha_rgba():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, size=(7, 5, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        MM.decode_png(_build_filtered_png(g, 1, 0)),
        np.repeat(g, 3, axis=2))
    ga = rng.integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        MM.decode_png(_build_filtered_png(ga, 2, 4)),
        np.repeat(ga[:, :, :1], 3, axis=2))
    rgba = rng.integers(0, 256, size=(6, 8, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        MM.decode_png(_build_filtered_png(rgba, 4, 6)),
        rgba[:, :, :3])


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    with pytest.raises(NotImplementedError, match="image library"):
        MM.decode_png(b"\xff\xd8\xff\xe0 jpeg bytes")
    # palette color type (3)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad = MM._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="color_type=3"):
        MM.decode_png(bad)
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = MM._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=16"):
        MM.decode_png(bad)


def test_decode_image_dispatch_and_cross_format_parity():
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        MM.decode_image(MM.encode_bmp(px)),
        MM.decode_image(MM.encode_png(px)))
    # perceptual hash + feature vector identical across containers
    assert MM.ahash64(MM.decode_image(MM.encode_bmp(px))) == \
        MM.ahash64(MM.decode_image(MM.encode_png(px)))
    np.testing.assert_array_equal(
        MM._image_features(MM.decode_image(MM.encode_bmp(px))),
        MM._image_features(MM.decode_image(MM.encode_png(px))))
    # GIF now dispatches (stages/gif.py) — garbage after the magic is a
    # corrupt stream, not an unknown format; truly unknown magic still
    # names the decode_fn hook
    with pytest.raises(NotImplementedError, match="unknown GIF block"):
        MM.decode_image(b"GIF89a not a supported format")
    with pytest.raises(NotImplementedError,
                       match="not BMP, PNG, JPEG or GIF"):
        MM.decode_image(b"WEBPxxxx not a supported format")


def test_png_rows_flow_through_media_pipeline(ray_session):
    import pyarrow as pa
    rng = np.random.default_rng(23)
    rows = []
    for i in range(6):
        px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
        rows.append((f"p{i}", MM.encode_png(px) if i % 2 else
                     MM.encode_bmp(px), px))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows]),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "media_type": pa.array(["image"] * 6),
    })
    out = MM.extract_media_witnesses(
        rd.from_arrow(tbl)).to_pandas().set_index("media_id")
    for mid, _, px in rows:
        assert out.loc[mid, "px_sum"] == int(px.sum(dtype=np.int64))
        assert out.loc[mid, "n_vals"] == px.size


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(777) * 9000).astype(np.int16)
    got, rate = MM.decode_wav(MM.encode_wav(x, 16_000))
    assert rate == 16_000
    np.testing.assert_allclose(got, x.astype(np.float32) / 32768.0)


def test_image_features_known_values():
    # constant-color image: exact channel means, zero std, one hist bin
    px = np.full((4, 6, 3), 0, dtype=np.uint8)
    px[:, :, 0] = 200
    px[:, :, 1] = 100
    px[:, :, 2] = 50
    f = MM._image_features(MM.decode_bmp(MM.encode_bmp(px)))
    np.testing.assert_allclose(f[0:2], [6 / 4096, 4 / 4096])
    np.testing.assert_allclose(f[2:5], [200 / 255, 100 / 255, 50 / 255],
                               rtol=1e-6)
    np.testing.assert_allclose(f[5:8], 0.0, atol=1e-7)
    assert np.isclose(f[8:16].sum(), 1.0) and (f[8:16] == 1.0).sum() == 1


def test_media_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="image/audio library"):
        MM.decode_bmp(b"\xff\xd8\xff\xe0 not a bmp, looks like jpeg")
    with pytest.raises(NotImplementedError, match="image/audio library"):
        MM.decode_wav(b"ID3 not a wav")


def test_frame_sampler_real_demux():
    tbl = MM.synth_media_table(30)
    out = MM.sample_frames(rd.from_arrow(tbl), k=4).to_pandas()
    # every sampled frame is itself a decodable BMP of the video's size
    meta = tbl.to_pandas().set_index("media_id")
    for _, row in out.iterrows():
        px = MM.decode_bmp(row["frame"])
        assert px.shape[1] == meta.loc[row["media_id"], "width"]
        assert px.shape[0] == meta.loc[row["media_id"], "height"]


def test_frame_sampler_fanout():
    tbl = MM.synth_media_table(30)
    n_videos = sum(1 for t in tbl["media_type"].to_pylist() if t == "video")
    out = MM.sample_frames(rd.from_arrow(tbl), k=4).to_pandas()
    assert len(out) == 4 * n_videos
    assert set(out["frame_idx"].unique()) == {0, 1, 2, 3}


def test_ahash_invariances_and_perceptual_dedup(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.multimodal import (
        ahash64, decode_bmp, encode_bmp, image_dedup_perceptual,
        synth_media_table)
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    h1 = ahash64(px)
    # exact 2x block upscale preserves the hash (block means unchanged)
    h2 = ahash64(np.repeat(np.repeat(px, 2, axis=0), 2, axis=1))
    assert h1 == h2
    noised = np.clip(px.astype(int) + rng.integers(-6, 7, px.shape),
                     0, 255).astype(np.uint8)
    assert bin(h1 ^ ahash64(noised)).count("1") <= 6
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert bin(h1 ^ ahash64(other)).count("1") > 10
    # dedup clusters planted exact + noised copies, merges nothing else
    tbl = synth_media_table(40, seed=3)
    kinds = tbl["media_type"].to_numpy(zero_copy_only=False)
    img_idx = int(np.flatnonzero(kinds == "image")[0])
    payload = tbl["payload"][img_idx].as_py()
    src = decode_bmp(payload)
    near = np.clip(src.astype(int) + rng.integers(-4, 5, src.shape),
                   0, 255).astype(np.uint8)
    extra = pa.table({
        "media_id": pa.array(["dup_exact", "dup_noise"]),
        "payload": pa.array([payload, encode_bmp(near)],
                            type=pa.binary()),
        "media_type": pa.array(["image", "image"]),
        "width": pa.array(np.array([src.shape[1]] * 2, dtype=np.int32)),
        "height": pa.array(np.array([src.shape[0]] * 2,
                                    dtype=np.int32)),
        "sample_rate": pa.array(np.array([0, 0], dtype=np.int32)),
        "duration_ms": pa.array(np.array([0, 0], dtype=np.int64))})
    ds = rd.from_arrow(pa.concat_tables([tbl, extra]))
    res = image_dedup_perceptual(ds, max_hamming=3)
    c = res.set_index("doc_id")["cluster_id"]
    anchor = tbl["media_id"][img_idx].as_py()
    assert c["dup_exact"] == c[anchor] and c["dup_noise"] == c[anchor]
    assert int(res["is_duplicate"].sum()) == 2   # nothing else merged


def test_audio_fingerprint_invariances_and_dedup(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.multimodal import (
        audio_dedup_perceptual, audio_fingerprint64, decode_wav,
        encode_wav, synth_media_table)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(4000) * 6000).astype(np.int16)
    h1 = audio_fingerprint64(x, 16000)
    # gain-invariant (delta-coded band energies), noise-robust,
    # content-sensitive
    assert audio_fingerprint64((x * 0.5).astype(np.int16), 16000) == h1
    noise = (x + rng.standard_normal(4000) * 120).astype(np.int16)
    assert bin(h1 ^ audio_fingerprint64(noise, 16000)).count("1") <= 6
    other = (rng.standard_normal(4000) * 6000).astype(np.int16)
    assert bin(h1 ^ audio_fingerprint64(other, 16000)).count("1") > 10
    # dedup: exact + gain-scaled copies cluster, nothing else merges
    tbl = synth_media_table(40, seed=3)
    kinds = tbl["media_type"].to_numpy(zero_copy_only=False)
    a_idx = int(np.flatnonzero(kinds == "audio")[0])
    payload = tbl["payload"][a_idx].as_py()
    xx, rate = decode_wav(payload)
    gain = np.clip(xx * 0.7 * 32768.0, -32768, 32767).astype(np.int16)
    extra = pa.table({
        "media_id": pa.array(["a_dup", "a_gain"]),
        "payload": pa.array([payload, encode_wav(gain, rate)],
                            type=pa.binary()),
        "media_type": pa.array(["audio", "audio"]),
        "width": pa.array(np.array([0, 0], dtype=np.int32)),
        "height": pa.array(np.array([0, 0], dtype=np.int32)),
        "sample_rate": pa.array(np.array([rate, rate],
                                         dtype=np.int32)),
        "duration_ms": pa.array(np.array([0, 0], dtype=np.int64))})
    res = audio_dedup_perceptual(
        rd.from_arrow(pa.concat_tables([tbl, extra])), max_hamming=3)
    c = res.set_index("doc_id")["cluster_id"]
    anchor = tbl["media_id"][a_idx].as_py()
    assert c["a_dup"] == c[anchor] and c["a_gain"] == c[anchor]
    assert int(res["is_duplicate"].sum()) == 2


def test_video_dedup_frame_reorder_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from feature_extraction_ray.stages.multimodal import (
        split_video_frames, synth_media_table, video_dedup_perceptual)
    tbl = synth_media_table(40, seed=3)
    kinds = tbl["media_type"].to_numpy(zero_copy_only=False)
    v_idx = int(np.flatnonzero(kinds == "video")[0])
    payload = tbl["payload"][v_idx].as_py()
    reordered = b"".join(split_video_frames(payload)[::-1])
    w = tbl["width"].slice(v_idx, 1).combine_chunks().take(
        pa.array([0, 0]))
    h = tbl["height"].slice(v_idx, 1).combine_chunks().take(
        pa.array([0, 0]))
    extra = pa.table({
        "media_id": pa.array(["v_dup", "v_reorder"]),
        "payload": pa.array([payload, reordered], type=pa.binary()),
        "media_type": pa.array(["video", "video"]),
        "width": w, "height": h,
        "sample_rate": pa.array(np.array([0, 0], dtype=np.int32)),
        "duration_ms": pa.array(np.array([0, 0], dtype=np.int64))})
    res = video_dedup_perceptual(
        rd.from_arrow(pa.concat_tables([tbl, extra])), max_hamming=3)
    c = res.set_index("doc_id")["cluster_id"]
    anchor = tbl["media_id"][v_idx].as_py()
    # mean-frame hash: exact copy AND frame-reversed copy both cluster
    assert c["v_dup"] == c[anchor] and c["v_reorder"] == c[anchor]
    assert int(res["is_duplicate"].sum()) == 2
