"""Shading/BRDF behavior tests (reference Shade, RayTraceShader.compute:386-428).

The shading API is component-SoA (Vec3 tuples of (N,) arrays; ops/vec.py).
"""

import numpy as np
import jax.numpy as jnp

from unityraytracer_tpu.ops.shade import Hit, sample_skybox, shade, MISS_T


def _v3(t):
    return tuple(jnp.asarray([c], jnp.float32) for c in t)


def _hit(t, albedo, specular, emission=(0, 0, 0), smoothness=0.5, n=(0, 1, 0)):
    return Hit(
        t=jnp.full((1,), t, jnp.float32),
        position=_v3((0, 0, 0)),
        normal=_v3(n),
        albedo=_v3(albedo),
        specular=_v3(specular),
        emission=_v3(emission),
        smoothness=jnp.full((1,), smoothness, jnp.float32),
    )


SKY = jnp.ones((4, 8, 3), jnp.float32) * 2.0


def _shade1(hit, uniforms, energy=(1, 1, 1), rd=(0, -1, 0)):
    ro = _v3((0, 0, 0))
    rdj = _v3(rd)
    e = _v3(energy)
    u = tuple(jnp.asarray([x], jnp.float32) for x in uniforms)
    new_ro, new_rd, new_e, radiance, missed = shade(ro, rdj, e, hit, u)
    return new_ro, new_rd, new_e, radiance, missed


def _np3(v):
    return np.stack([np.asarray(c) for c in v], axis=-1)[0]


def test_miss_kills_ray_and_flags_for_sky():
    hit = _hit(MISS_T * 2, (0.5, 0.5, 0.5), (0, 0, 0))
    _, _, energy, radiance, missed = _shade1(hit, (0.5, 0.5, 0.5),
                                             energy=(0.5, 0.5, 0.5))
    # Sky is resolved by the caller (deferred environment); shade only flags.
    assert bool(np.asarray(missed)[0])
    np.testing.assert_allclose(_np3(radiance), 0.0, atol=1e-6)
    np.testing.assert_allclose(_np3(energy), 0.0)


def test_emission_weighted_by_energy_before_bounce():
    hit = _hit(1.0, (0.2, 0.2, 0.2), (0, 0, 0), emission=(3, 0, 1))
    _, _, _, radiance, _ = _shade1(hit, (0.9, 0.5, 0.5), energy=(0.5, 1.0, 1.0))
    np.testing.assert_allclose(_np3(radiance), [1.5, 0.0, 1.0], atol=1e-6)


def test_diffuse_energy_update():
    # Pure diffuse material: diffChance = 1, energy *= albedo.
    hit = _hit(1.0, (0.6, 0.3, 0.1), (0, 0, 0))
    _, rd, energy, _, _ = _shade1(hit, (0.5, 0.3, 0.7))
    np.testing.assert_allclose(_np3(energy), [0.6, 0.3, 0.1], atol=1e-5)
    # New direction must be in the upper hemisphere of the normal.
    assert float(rd[1][0]) > 0


def test_albedo_clamped_by_specular():
    # albedo = min(1 - spec, albedo): spec (0.8,...) clamps albedo 0.9 -> 0.2.
    hit = _hit(1.0, (0.9, 0.9, 0.9), (0.8, 0.8, 0.8))
    # roulette = 0.99 -> diffuse branch (specChance = 0.8, diffChance = 0.2).
    _, _, energy, _, _ = _shade1(hit, (0.99, 0.5, 0.5))
    # diffuse weight = albedo/diffChance_normalized = 0.2 / 0.2 = 1.
    np.testing.assert_allclose(_np3(energy), 1.0, atol=1e-5)


def test_specular_mirror_reflects():
    # Perfectly smooth specular: alpha = 1000, lobe is tight around reflect.
    hit = _hit(1.0, (0, 0, 0), (1.0, 1.0, 1.0), smoothness=1.0)
    rd_in = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    # u1 = 1-eps -> cos_t ~ 1 -> new dir ~ reflect(rd, n) = (1, 1, 0)/sqrt(2)
    _, rd, energy, _, _ = _shade1(hit, (0.0, 0.999999, 0.0), rd=tuple(rd_in))
    want = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    np.testing.assert_allclose(_np3(rd), want, atol=5e-3)
    assert np.all(_np3(energy) > 0.5)


def test_black_material_terminates():
    hit = _hit(1.0, (0, 0, 0), (0, 0, 0))
    _, _, energy, radiance, _ = _shade1(hit, (0.5, 0.5, 0.5))
    np.testing.assert_allclose(_np3(energy), 0.0)
    np.testing.assert_allclose(_np3(radiance), 0.0)
    assert np.isfinite(_np3(energy)).all()


def test_skybox_poles_and_wrap():
    sky = np.zeros((8, 16, 3), np.float32)
    sky[0] = (1, 0, 0)    # top rows = +y pole
    sky[-1] = (0, 1, 0)   # bottom rows = -y pole
    skyj = jnp.asarray(sky)
    up = _np3(sample_skybox(skyj, _v3((0.0, 1.0, 0.0))))
    down = _np3(sample_skybox(skyj, _v3((0.0, -1.0, 0.0))))
    assert up[0] > 0.9 and up[1] < 0.1
    assert down[1] > 0.9 and down[0] < 0.1
    # Horizontal directions land mid-rows; u wraps without NaN.
    for d in ([1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 0, -1]):
        out = _np3(sample_skybox(skyj, _v3(d)))
        assert np.isfinite(out).all()


def test_shade_no_nans_on_garbage_miss_lanes():
    # Miss lanes carry zero normals; shade must stay finite.
    hit = _hit(MISS_T * 2, (0, 0, 0), (0, 0, 0), n=(0, 0, 0))
    ro, rd, energy, radiance, _ = _shade1(hit, (0.5, 0.5, 0.5))
    for a in (ro, rd, energy, radiance):
        assert np.isfinite(_np3(a)).all()


def test_rgbe_skybox_close_to_exact():
    from unityraytracer_tpu.ops.shade import sample_skybox_rgbe
    from unityraytracer_tpu.models.skybox import sun_sky
    sky = jnp.asarray(sun_sky(32, 64))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(3, 256)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    rd = tuple(jnp.asarray(d[k]) for k in range(3))
    exact = np.stack([np.asarray(c) for c in sample_skybox(sky, rd)])
    packed = np.stack([np.asarray(c) for c in sample_skybox_rgbe(sky, rd)])
    rel = np.abs(packed - exact) / np.maximum(np.abs(exact), 1e-2)
    assert rel.max() < 0.02  # RGBE quantization ~0.4%


def test_stochastic_sky_tap_is_unbiased():
    # Expectation of the single stochastic tap == bilinear filtering.
    from unityraytracer_tpu.ops.shade import sample_skybox_rgbe
    from unityraytracer_tpu.models.skybox import gradient_sky
    import jax

    sky = jnp.asarray(gradient_sky(16, 32))
    rng = np.random.default_rng(1)
    d = rng.normal(size=(3, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    rd = tuple(jnp.asarray(d[k]) for k in range(3))
    exact = np.stack([np.asarray(c) for c in sample_skybox_rgbe(sky, rd)])
    acc = np.zeros_like(exact)
    K = 400
    key = jax.random.key(0)
    for i in range(K):
        key, k1, k2 = jax.random.split(key, 3)
        u1 = jax.random.uniform(k1, (64,))
        u2 = jax.random.uniform(k2, (64,))
        tap = sample_skybox_rgbe(sky, rd, u1=u1, u2=u2)
        acc += np.stack([np.asarray(c) for c in tap])
    acc /= K
    rel = np.abs(acc - exact) / np.maximum(np.abs(exact), 1e-2)
    assert rel.max() < 0.08  # MC error ~1/sqrt(400) of texel deltas


def test_pack_rgbe_np_matches_jnp():
    # The host-numpy packer (baked into Scene at build) must be bit-identical
    # to the traced packer it replaces in the per-frame path.
    from unityraytracer_tpu.ops.shade import pack_rgbe, pack_rgbe_np

    rng = np.random.default_rng(0)
    sky = (rng.uniform(0, 1, (16, 32, 3)).astype(np.float32) ** 2) * 40.0
    sky[0, 0] = 0.0  # zero texel exercises the e == 0 branch
    np.testing.assert_array_equal(np.asarray(pack_rgbe(jnp.asarray(sky))),
                                  pack_rgbe_np(sky))


def test_sample_skybox_rgbe_prepacked_plane_identical():
    from unityraytracer_tpu.ops.shade import pack_rgbe_np, sample_skybox_rgbe

    rng = np.random.default_rng(1)
    sky = rng.uniform(0, 8, (8, 16, 3)).astype(np.float32)
    rd = rng.normal(size=(64, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd3 = tuple(jnp.asarray(rd[:, k]) for k in range(3))
    a = sample_skybox_rgbe(jnp.asarray(sky), rd3)
    b = sample_skybox_rgbe(jnp.asarray(sky), rd3,
                           packed=jnp.asarray(pack_rgbe_np(sky)))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_scene_builder_bakes_rgbe_plane():
    from unityraytracer_tpu import SceneBuilder
    from unityraytracer_tpu.ops.shade import pack_rgbe_np

    rng = np.random.default_rng(2)
    sky = rng.uniform(0, 4, (4, 8, 3)).astype(np.float32)
    b = SceneBuilder()
    b.add_sphere((0, 1, 0), 1.0)
    b.set_skybox(sky)
    scene = b.build()
    assert scene.skybox_rgbe is not None
    np.testing.assert_array_equal(np.asarray(scene.skybox_rgbe),
                                  pack_rgbe_np(sky))
