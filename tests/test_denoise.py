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


def test_guided_denoise_preserves_albedo_edge():
    # Same RADIANCE step on both sides + noise; the albedo guide carries
    # the only edge information. With a wide color sigma the unguided
    # filter smears the step; the guided one must keep it sharp.
    rng = np.random.default_rng(3)
    h, w = 64, 64
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, w // 2:, :] = 0.6
    noisy = clean + rng.normal(0, 0.25, clean.shape).astype(np.float32)
    albedo = np.zeros_like(clean)
    albedo[:, w // 2:, :] = 1.0
    normal = np.zeros_like(clean)
    normal[..., 2] = 1.0
    plain = np.asarray(atrous_denoise(noisy, iterations=4, sigma_color=5.0))
    guided = np.asarray(atrous_denoise(noisy, iterations=4, sigma_color=5.0,
                                       albedo=albedo, normal=normal,
                                       sigma_albedo=0.05))
    # Contrast retained across the edge (columns straddling w/2).
    def edge_step(img):
        return float(img[:, w // 2 + 2:w // 2 + 6].mean()
                     - img[:, w // 2 - 6:w // 2 - 2].mean())
    assert edge_step(guided) > 0.5
    assert edge_step(guided) > edge_step(plain) + 0.2
    # Flat interiors still denoise.
    assert guided[8:-8, 8:24].std() < 0.4 * noisy[8:-8, 8:24].std()


def test_render_aovs_and_multipart_export(tmp_path):
    from unityraytracer_tpu import RenderConfig
    from unityraytracer_tpu.models import fixtures
    from unityraytracer_tpu.models.exr import load_exr
    from unityraytracer_tpu.render import Renderer, render_aovs

    scene = fixtures.scene1(skybox=np.ones((4, 8, 3), np.float32) * 0.6)
    cam = fixtures.scene1_camera(aspect=1.0)
    cfg = RenderConfig(width=32, height=32, spp=1, bounces=2,
                       tracer="cluster", cluster_size=32, ray_chunk=1024)
    r = Renderer(scene, cam, cfg).step(1)
    g = {k: np.asarray(jax.device_get(v)) for k, v in r.aovs().items()}
    assert g["albedo"].shape == (32, 32, 3)
    assert g["depth"].shape == (32, 32)
    assert g["hit"].any() and not g["hit"].all()
    # Normals are unit length exactly where something was hit.
    nn = np.linalg.norm(g["normal"], axis=-1)
    np.testing.assert_allclose(nn[g["hit"]], 1.0, atol=1e-4)
    assert (g["depth"][g["hit"]] > 0).all()
    assert (g["depth"][~g["hit"]] == 0).all()
    # Deterministic across tracers (no RNG in the G-buffer pass).
    g2 = render_aovs(scene, cfg.replace(tracer="brute", ray_chunk=1024),
                     cam)
    np.testing.assert_allclose(g["albedo"],
                               np.asarray(g2["albedo"]), atol=1e-5)
    np.testing.assert_allclose(g["depth"], np.asarray(g2["depth"]),
                               rtol=1e-4, atol=1e-5)
    # Multi-part AOV export round-trips per part.
    p = str(tmp_path / "aovs.exr")
    r.save_aovs(p)
    alb = load_exr(p, part="albedo")
    np.testing.assert_allclose(
        alb, g["albedo"].astype(np.float16).astype(np.float32), atol=1e-4)
    dep = load_exr(p, part="depth")
    assert dep.shape == (32, 32, 1)
    # Guided denoise wiring through the Renderer.
    den = r.denoised_image(iterations=2, guided=True)
    assert den.shape == r.image.shape and np.isfinite(den).all()
