"""Cross-validate the package's EXR codecs against the REAL OpenEXR.

models/exr.py + piz.py + b44.py (+ dwa.py) are clean-room
reimplementations; their other tests round-trip through our own
writer, which cannot catch a mutually-consistent format bug. These
tests close that hole using the system libOpenEXR (via
tests/exr_oracle.py) as the authority, in both directions:

  real writer  -> our reader   (exact for lossless, == real reader for
                                lossy, since both decode the same bits)
  our writer   -> real reader  (our files must be spec-valid)

Skipped wholesale when the shared library is not installed.

Reference behavior: the Unity project loads its 16 Assets/Skyboxes/*
HDR/EXR maps through Unity's importer (RayTraceMaster.cs:761-792);
accepting authentic OpenEXR output is the parity bar.
"""
import numpy as np
import pytest

import exr_oracle as oracle
from unityraytracer_tpu.models.exr import load_exr, write_exr

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="libOpenEXR not installed")

SCANLINE = ["none", "rle", "zips", "zip", "piz", "pxr24", "b44", "b44a"]


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    # Mix smooth gradients (compressor-friendly) with noise and
    # half-special values so predictors/quantizers all get exercised.
    h, w = 37, 53   # deliberately not tile/block aligned
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([x / w, y / h, (x + y) % 7.0], axis=-1)
    noise = rng.random((h, w, 3), np.float32) * 4.0
    out = base + noise
    out[0, 0] = 0.0
    out[1, 1] = 65504.0        # half max
    out[2, 2] = -1.5
    return out.astype(np.float32)


@pytest.mark.parametrize("comp", SCANLINE)
def test_real_writer_our_reader(tmp_path, img, comp):
    p = str(tmp_path / f"real_{comp}.exr")
    oracle.write_rgba(p, img, comp)
    ref = oracle.read_rgba(p)          # what OpenEXR itself decodes
    ours = load_exr(p)                 # (H, W, 4) RGBA
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("comp", SCANLINE)
def test_our_writer_real_reader(tmp_path, img, comp):
    p = str(tmp_path / f"ours_{comp}.exr")
    write_exr(p, img, compression=comp)
    ref = oracle.read_rgba(p)[:, :, :3]
    ours = load_exr(p)[:, :, :3]
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("comp", ["zip", "piz", "b44"])
def test_real_tiled_our_reader(tmp_path, img, comp):
    p = str(tmp_path / f"real_tiled_{comp}.exr")
    oracle.write_rgba_tiled(p, img, comp, tile=(16, 16))
    ref = oracle.read_rgba(p)
    ours = load_exr(p)
    np.testing.assert_array_equal(ours, ref)


DWA = ["dwaa", "dwab"]


@pytest.mark.parametrize("comp", DWA)
def test_real_writer_our_reader_dwa(tmp_path, img, comp):
    # Lossy DCT: both decoders consume the SAME bits; the only slack is
    # float op order inside IDCT/CSC. Measured: libOpenEXR's float32 DCT
    # deviates from the float64-true value by up to ~4 half-ulps on this
    # content, ours by less — so decoders agree to a few ulps, mostly
    # bit-exact.
    p = str(tmp_path / f"real_{comp}.exr")
    oracle.write_rgba(p, img, comp)
    ref = oracle.read_rgba(p)
    ours = load_exr(p)
    assert ours.shape == ref.shape
    ulp = np.abs(ours.astype(np.float16).view(np.uint16).astype(np.int32)
                 - ref.astype(np.float16).view(np.uint16).astype(np.int32))
    assert (ulp == 0).mean() > 0.98
    assert ulp.max() <= 8
    # The RLE-coded alpha plane is integer plumbing only: bit-exact.
    np.testing.assert_array_equal(ours[..., 3], ref[..., 3])


@pytest.mark.parametrize("comp", DWA)
def test_our_writer_real_reader_dwa(tmp_path, img, comp):
    # Our encoder must produce files the AUTHORITATIVE decoder accepts.
    # It quantizes nothing, so the real decoder's output stays within the
    # nonlinear-LUT + half-DCT rounding budget of the source.
    p = str(tmp_path / f"ours_{comp}.exr")
    write_exr(p, img, compression=comp)
    back = oracle.read_rgba(p)[..., :3]
    ref = img.astype(np.float16).astype(np.float32)
    assert np.abs(back - ref).max() <= 0.02 * max(1.0, float(ref.max()))
