"""A-trous denoiser: noise reduction, edge preservation, sanity."""

import numpy as np
import jax

from unityraytracer_tpu.utils.denoise import atrous_denoise


def _noisy_edge(h=64, w=64, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, w // 2:, :] = 1.0                     # hard vertical edge
    noisy = clean + rng.normal(0, noise, clean.shape).astype(np.float32)
    return clean, noisy


def test_reduces_noise_flat_regions():
    clean, noisy = _noisy_edge()
    out = np.asarray(atrous_denoise(noisy, iterations=3, sigma_color=1.0))
    # Interior of each flat half: variance must drop a lot.
    for sl in (np.s_[8:-8, 8:24], np.s_[8:-8, 40:-8]):
        assert out[sl].std() < 0.35 * noisy[sl].std()
    assert abs(out.mean() - noisy.mean()) < 0.02   # roughly energy-preserving


def test_preserves_hard_edge():
    clean, noisy = _noisy_edge(noise=0.05)
    out = np.asarray(atrous_denoise(noisy, iterations=3, sigma_color=0.1))
    # The step across the edge survives (no smearing to the midpoint).
    left = out[16:-16, 24:30].mean()
    right = out[16:-16, 34:40].mean()
    assert right - left > 0.8
    rmse_after = np.sqrt(((out - clean) ** 2).mean())
    rmse_before = np.sqrt(((noisy - clean) ** 2).mean())
    assert rmse_after < rmse_before


def test_constant_image_is_fixed_point():
    img = np.full((32, 32, 3), 0.7, np.float32)
    out = np.asarray(atrous_denoise(img, iterations=2))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_renderer_denoised_image():
    from unityraytracer_tpu import RenderConfig
    from unityraytracer_tpu.models import fixtures
    from unityraytracer_tpu.render import Renderer

    scene = fixtures.scene1(skybox=np.ones((4, 8, 3), np.float32) * 0.6)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       tracer="cluster", cluster_size=32, ray_chunk=1024)
    r = Renderer(scene, fixtures.scene1_camera(aspect=1.0), cfg).step(1)
    den = r.denoised_image(iterations=2)
    assert den.shape == r.image.shape
    assert np.isfinite(den).all()
