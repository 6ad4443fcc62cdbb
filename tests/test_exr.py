"""OpenEXR loader round-trip tests (reference skybox parity: the
Assets/Skyboxes set is HDR/EXR; models/exr.py covers the .exr half)."""

import numpy as np
import pytest

from unityraytracer_tpu.models.exr import load_exr, write_exr
from unityraytracer_tpu.models.skybox import load_environment, save_hdr


def _img(h=24, w=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    # HDR-ish content: bright sun values + dark regions + exact zeros.
    img = (rng.uniform(0, 1, (h, w, c)).astype(np.float32) ** 3) * 90.0
    img[0, 0] = 0.0
    return img


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip",
                                         "piz"])
def test_exr_float32_roundtrip_exact(tmp_path, compression):
    img = _img()
    path = str(tmp_path / f"rt_{compression}.exr")
    write_exr(path, img, compression=compression, dtype="float")
    out = load_exr(path)
    np.testing.assert_array_equal(out, img)


def test_exr_pxr24_half_lossless_float_24bit(tmp_path):
    # PXR24 is lossless for HALF channels; FLOAT channels are rounded by
    # the writer to a 24-bit float (15 significand bits), so round-trip
    # error is bounded by half an ulp at 2^-15 relative.
    img = _img(seed=3)
    ph = str(tmp_path / "rt_pxr24_h.exr")
    write_exr(ph, img, compression="pxr24", dtype="half")
    np.testing.assert_array_equal(
        load_exr(ph), img.astype(np.float16).astype(np.float32))
    pf = str(tmp_path / "rt_pxr24_f.exr")
    write_exr(pf, img, compression="pxr24", dtype="float")
    out = load_exr(pf)
    np.testing.assert_allclose(out, img, rtol=2.0 ** -15)
    # The 24-bit quantization actually happened (file is lossy for f32)...
    assert not np.array_equal(out, img)
    # ...and the decoded bits are exactly the writer's f24 rounding.
    from unityraytracer_tpu.models.exr import _float_to_float24
    expect = (_float_to_float24(img.view(np.uint32)) << np.uint32(8)) \
        .view(np.float32)
    np.testing.assert_array_equal(out, expect)


def test_exr_pxr24_special_values(tmp_path):
    # floatToFloat24 edge cases: inf survives, NaN stays NaN (never
    # collapses to inf), near-FLT_MAX rounds by truncation, sign preserved.
    img = np.zeros((16, 8, 1), np.float32)
    img[0, 0] = np.inf
    img[0, 1] = -np.inf
    img[0, 2] = np.nan
    img[0, 3] = np.float32(3.4028235e38)      # FLT_MAX
    img[0, 4] = -1.5
    img[1, :4] = np.float32(np.frombuffer(
        np.uint32(0x7F800001).tobytes(), np.float32))   # NaN w/ tiny payload
    p = str(tmp_path / "pxr24_special.exr")
    write_exr(p, img, compression="pxr24", dtype="float")
    out = load_exr(p)
    assert np.isposinf(out[0, 0, 0]) and np.isneginf(out[0, 1, 0])
    assert np.isnan(out[0, 2, 0]) and np.isnan(out[1, 0, 0])
    assert np.isfinite(out[0, 3, 0]) and out[0, 3, 0] > 3.4e38
    assert out[0, 4, 0] == -1.5


@pytest.mark.parametrize("compression", ["none", "zip", "rle", "piz",
                                         "pxr24"])
def test_exr_tiled_one_level_roundtrip(tmp_path, compression):
    # Tiled single-part files (version flag 0x200) with ragged edge tiles:
    # 37x53 at 16x16 tiles leaves 5- and 4-pixel tails in each axis.
    from unityraytracer_tpu.models.exr import write_exr_tiled

    img = _img(h=37, w=53, seed=8)
    p = str(tmp_path / f"tiled_{compression}.exr")
    write_exr_tiled(p, img, tile=(16, 16), compression=compression,
                    dtype="half")
    np.testing.assert_array_equal(
        load_exr(p), img.astype(np.float16).astype(np.float32))


def test_exr_tiled_mipmap_reads_level0(tmp_path):
    # MIPMAP files carry a full level chain; the loader must skip the
    # reduced levels and return only the full-resolution image.
    from unityraytracer_tpu.models.exr import write_exr_tiled

    img = _img(h=48, w=80, seed=9)
    p = str(tmp_path / "tiled_mip.exr")
    write_exr_tiled(p, img, tile=(32, 32), compression="zip", dtype="half",
                    level_mode="mip")
    out = load_exr(p)
    assert out.shape == (48, 80, 3)
    np.testing.assert_array_equal(
        out, img.astype(np.float16).astype(np.float32))
    # The file really contains more than the one level's tiles.
    from unityraytracer_tpu.models.exr import _tile_level_table
    tl = _tile_level_table(80, 48, 32, 32, 1, False)
    assert len(tl) == 7 and sum(x * y for *_, x, y in tl) > 6


def test_exr_multipart_roundtrip(tmp_path):
    # Multi-part files (version flag 0x1000): select a part by index or by
    # name; different sizes per part; chunks carry the part-number prefix.
    from unityraytracer_tpu.models.exr import write_exr_multipart

    beauty = _img(h=24, w=32, seed=12)
    depth = _img(h=40, w=20, c=1, seed=13)
    p = str(tmp_path / "multi.exr")
    write_exr_multipart(p, [("beauty", beauty), ("depth", depth)],
                        compression="zip")
    exp_b = beauty.astype(np.float16).astype(np.float32)
    exp_d = depth.astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(load_exr(p), exp_b)          # default: 0
    np.testing.assert_array_equal(load_exr(p, part=1), exp_d)
    np.testing.assert_array_equal(load_exr(p, part="depth"), exp_d)
    np.testing.assert_array_equal(load_exr(p, part="beauty"), exp_b)
    with pytest.raises(ValueError, match="no part named"):
        load_exr(p, part="normals")


def test_exr_b44_smooth_blocks_exact(tmp_path):
    # A 4x4 block whose remapped range fits 5-bit deltas packs with
    # shift=0, which the B44 chain reconstructs EXACTLY (spec property:
    # base + running differences, exactMax anchoring). A slow gradient in
    # half-space guarantees that for every block.
    h, w = 24, 36
    base = np.float16(1.0).view(np.uint16)
    ramp = (base + (np.arange(h)[:, None] + np.arange(w)[None, :]) // 2) \
        .astype(np.uint16).view(np.float16).astype(np.float32)
    img = np.stack([ramp, ramp * 0 + 0.25, ramp[::-1]], axis=-1)
    for comp in ("b44", "b44a"):
        p = str(tmp_path / f"rt_{comp}.exr")
        write_exr(p, img, compression=comp, dtype="half")
        np.testing.assert_array_equal(
            load_exr(p), img.astype(np.float16).astype(np.float32))


def test_exr_b44a_flat_blocks_pack3(tmp_path):
    # B44A stores all-flat 4x4 blocks as 3 bytes; a constant image must
    # round-trip exactly AND come out smaller than B44's fixed 14/block.
    img = np.full((32, 64, 3), 0.625, np.float32)
    pa = str(tmp_path / "flat_a.exr")
    pb = str(tmp_path / "flat_b.exr")
    write_exr(pa, img, compression="b44a", dtype="half")
    write_exr(pb, img, compression="b44", dtype="half")
    np.testing.assert_array_equal(load_exr(pa), img)
    np.testing.assert_array_equal(load_exr(pb), img)
    import os
    assert os.path.getsize(pa) < os.path.getsize(pb)


def test_exr_b44_lossy_bounded_and_specials(tmp_path):
    # Random same-exponent content: B44 quantization error is bounded by
    # half the shift step over the block's remapped range — a few percent
    # here (uniform [0.5, 1.0) keeps each block's half-bit range ~1024, so
    # shift <= 6 and error <= 32/1024 of one exponent octave).
    rng = np.random.default_rng(7)
    img = rng.uniform(0.5, 1.0, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "noisy_b44.exr")
    write_exr(p, img, compression="b44", dtype="half")
    out = load_exr(p)
    np.testing.assert_allclose(out, img, rtol=0.05)
    # Inf/NaN are flushed by the ENCODER to the bottom of the remapped
    # range (exact zero when their block is flat; within block
    # quantization of zero otherwise — same behavior as libopenexr).
    img2 = np.full((8, 8, 1), 0.25, np.float32)
    img2[0, 0] = np.inf
    img2[4, 4] = np.nan
    p2 = str(tmp_path / "special_b44.exr")
    write_exr(p2, img2, compression="b44", dtype="half")
    out2 = load_exr(p2)
    assert abs(out2[0, 0, 0]) < 2e-3 and abs(out2[4, 4, 0]) < 2e-3
    assert np.isfinite(out2).all()


@pytest.mark.parametrize("compression", ["none", "zip", "rle", "piz",
                                         "pxr24"])
def test_exr_half_roundtrip(tmp_path, compression):
    img = _img(seed=1)
    path = str(tmp_path / f"rt_h_{compression}.exr")
    write_exr(path, img, compression=compression, dtype="half")
    out = load_exr(path)
    np.testing.assert_array_equal(out, img.astype(np.float16).astype(np.float32))


def test_exr_non_chunk_multiple_height(tmp_path):
    # ZIP chunks are 16 scanlines; H=21 exercises the ragged final chunk.
    img = _img(h=21, w=17)
    path = str(tmp_path / "ragged.exr")
    write_exr(path, img, compression="zip", dtype="float")
    np.testing.assert_array_equal(load_exr(path), img)


def test_exr_channel_order_rgba(tmp_path):
    img = _img(c=4, seed=2)
    path = str(tmp_path / "rgba.exr")
    write_exr(path, img, compression="zip", dtype="float")
    out = load_exr(path)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_exr_rejects_unknown_compression(tmp_path):
    img = _img(h=8, w=8)
    path = str(tmp_path / "px.exr")
    write_exr(path, img, compression="zip", dtype="float")
    raw = bytearray(open(path, "rb").read())
    idx = raw.index(b"compression\x00compression\x00")
    # Attribute payload byte follows name, type, and int32 size.
    off = idx + len(b"compression\x00compression\x00") + 4
    raw[off] = 10  # beyond DWAB: the whole v2 scanline set is supported now
    bad = str(tmp_path / "px_bad.exr")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="10"):
        load_exr(bad)


def test_exr_piz_matches_zip(tmp_path):
    # The same image through the PIZ pipeline (wavelet+Huffman, 32-line
    # chunks, ragged tail) and the ZIP pipeline must load bit-identically.
    img = _img(h=71, w=53, seed=5)
    p_zip = str(tmp_path / "a.exr")
    p_piz = str(tmp_path / "b.exr")
    write_exr(p_zip, img, compression="zip", dtype="half")
    write_exr(p_piz, img, compression="piz", dtype="half")
    np.testing.assert_array_equal(load_exr(p_zip), load_exr(p_piz))


def test_exr_piz_python_fallback_matches_native(tmp_path):
    from unityraytracer_tpu import native

    img = _img(h=40, w=37, seed=6)
    path = str(tmp_path / "c.exr")
    write_exr(path, img, compression="piz", dtype="half")
    a = load_exr(path)
    real = native.huf_decode
    native.huf_decode = lambda *args, **kw: None   # force Python decoder
    try:
        b = load_exr(path)
    finally:
        native.huf_decode = real
    np.testing.assert_array_equal(a, b)


def test_load_environment_dispatches_hdr_and_exr(tmp_path):
    img = _img(h=16, w=32)
    p_exr = str(tmp_path / "env.exr")
    write_exr(p_exr, img, compression="zip", dtype="float")
    np.testing.assert_array_equal(load_environment(p_exr), img)

    p_hdr = str(tmp_path / "env.hdr")
    save_hdr(p_hdr, img)
    out = load_environment(p_hdr)
    assert out.shape == img.shape
    # RGBE shares one exponent per texel: quantization step is up to
    # max_channel/128 for EVERY channel of that texel.
    step = img.max(-1, keepdims=True) / 128.0
    assert (np.abs(out - img) <= step + 1e-4).all()


# ---------------------------------------------------------------------------
# DWAA/DWAB (lossy DCT, models/dwa.py) — hermetic self tests; the
# authoritative cross-checks live in test_exr_oracle.py.

def test_exr_dwa_roundtrip_close(tmp_path):
    # Our encoder quantizes nothing, so round-trip error is only the
    # nonlinear-LUT half round-trip plus half rounding of DCT coefficients.
    img = _img(h=37, w=53, seed=3) * 3.0
    for comp in ("dwaa", "dwab"):
        p = str(tmp_path / f"d_{comp}.exr")
        write_exr(p, img, compression=comp, dtype="half")
        out = load_exr(p)[..., :3]
        ref = img.astype(np.float16).astype(np.float32)
        assert np.abs(out - ref).max() <= 0.02 * max(1.0, float(ref.max()))


def test_exr_dwa_alpha_rle_lossless(tmp_path):
    # Non-RGB half channels ride the DWA RLE scheme: byte planes +
    # PackBits, bit-exact.
    img = _img(h=16, w=24, c=4, seed=4)
    img[..., 3] = np.linspace(0, 1, 16 * 24).reshape(16, 24)
    p = str(tmp_path / "a.exr")
    write_exr(p, img, compression="dwaa", dtype="half")
    out = load_exr(p)
    np.testing.assert_array_equal(
        out[..., 3], img[..., 3].astype(np.float16).astype(np.float32))


def test_exr_dwa_float_channels_unknown_lossless(tmp_path):
    # FLOAT channels match no half rule -> the zlib'd unknown blob,
    # bit-exact round-trip.
    img = _img(h=19, w=21, seed=5)
    p = str(tmp_path / "f.exr")
    write_exr(p, img, compression="dwaa", dtype="float")
    np.testing.assert_array_equal(load_exr(p), img)


def test_exr_dwab_multi_chunk(tmp_path):
    # DWAB chunks are 256 scanlines: 600 rows -> 3 chunks with a ragged
    # tail; seams must be invisible to the block/chunk arithmetic.
    img = _img(h=600, w=16, seed=6)
    p = str(tmp_path / "b.exr")
    write_exr(p, img, compression="dwab", dtype="half")
    out = load_exr(p)[..., :3]
    ref = img.astype(np.float16).astype(np.float32)
    assert np.abs(out - ref).max() <= 0.02


def test_exr_dwa_tiny_raw_fallback(tmp_path):
    # An 8x8 half RGB chunk's DWA payload exceeds its raw size, so the
    # writer stores raw bytes (EXR fallback) and the reader must detect
    # that by size — the probe trap that bit the real library's files too.
    img = _img(h=8, w=8, seed=7)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compression="dwaa", dtype="half")
    np.testing.assert_array_equal(
        load_exr(p), img.astype(np.float16).astype(np.float32))
