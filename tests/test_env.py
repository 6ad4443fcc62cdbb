"""MXU one-hot environment lookup (ops/pallas_env) vs the gather path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unityraytracer_tpu import Camera, Material, RenderConfig, SceneBuilder
from unityraytracer_tpu.models.skybox import sun_sky
from unityraytracer_tpu.ops.shade import pack_rgbe_np, sample_skybox_rgbe
from unityraytracer_tpu.ops.pallas_env import (ENV_BLOCK,
                                               sample_skybox_rgbe_mxu,
                                               usable)
from unityraytracer_tpu.render import render_sample


def test_usable_gates():
    assert usable(256, 512)
    assert not usable(256, 500)       # lane dim % 128
    assert not usable(250, 512)       # sublane dim % 8
    assert not usable(2048, 4096)     # 8M texels: table exceeds VMEM


@pytest.mark.parametrize("impl", ["bf16", "bf16x8", "int8x8"])
@pytest.mark.parametrize("n", [ENV_BLOCK, ENV_BLOCK + 37, 777])
def test_mxu_tap_bit_exact(n, impl):
    # The one-hot dot sums exactly one exact product (bytes 0-255 are exact
    # in bf16; byte-128 exact in int8 with s32 accumulation), and the decode
    # matches _decode_rgbe op-for-op — so every MXU impl must be
    # BIT-identical to the serial-gather path, padding included (the x8
    # impls pad to 8*B rays, exercised by every n here).
    sky = sun_sky()
    H, W = sky.shape[:2]
    packed = jnp.asarray(pack_rgbe_np(sky))
    rng = np.random.default_rng(7)
    rd = rng.normal(size=(3, n)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=0, keepdims=True)
    rd = tuple(jnp.asarray(c) for c in rd)
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    ref = sample_skybox_rgbe(jnp.asarray(sky), rd, u1=u1, u2=u2,
                             packed=packed)
    got = sample_skybox_rgbe_mxu((H, W), packed, rd, u1, u2, interpret=True,
                                 impl=impl)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(got[k]))


def test_megakernel_sky_mxu_identical():
    # The bench path (render_sample_mega) resolves the environment through
    # the same _env_tap — flag on/off must agree pixel-for-pixel there too.
    from unityraytracer_tpu.models import primitives as P
    from unityraytracer_tpu.ops.pallas_trace import prepare_pallas_accel
    from unityraytracer_tpu.ops.bvh import build_cluster_accel
    from unityraytracer_tpu.render import render_sample_mega

    b = SceneBuilder()
    v, f, n = P.icosphere(2)
    b.add_mesh(v, f, material=Material(albedo=(0.3, 0.6, 0.9)))
    b.add_sphere((-2.0, 0.8, 0), 0.8)
    b.set_skybox(sun_sky())
    scene = b.build()
    accel = build_cluster_accel(scene.triangles, cluster_size=64,
                                use_native=False)
    pa = prepare_pallas_accel(accel, scene.materials, scene=scene)
    cam = Camera.create(position=(0, 1.5, -6), look_at=(0, 0.8, 0),
                        fov_y_deg=55, aspect=4 / 3)
    cfg = RenderConfig(width=64, height=48, spp=1, bounces=3,
                       tracer="pallas")
    key = jax.random.key(5)
    img0 = np.asarray(render_sample_mega(scene, pa, cam, key, cfg))
    img1 = np.asarray(render_sample_mega(scene, pa, cam, key,
                                         cfg.replace(sky_mxu=True)))
    np.testing.assert_array_equal(img0, img1)


def test_render_sample_sky_mxu_identical():
    # End-to-end: the sky_mxu config flag must not change a single pixel
    # (same keys -> same stochastic corner picks -> identical texels).
    b = SceneBuilder()
    b.add_sphere((0, 1.0, 0), 1.0,
                 Material(albedo=(0.8, 0.2, 0.2), specular=(0.1,) * 3,
                          smoothness=0.7))
    b.set_skybox(sun_sky())
    scene = b.build()
    cam = Camera.create(position=(0, 1.5, -5), look_at=(0, 1, 0),
                        fov_y_deg=55, aspect=4 / 3)
    cfg = RenderConfig(width=64, height=48, spp=1, bounces=3, tracer="brute")
    from unityraytracer_tpu.render import get_tracer
    tracer = get_tracer(scene, cfg)
    key = jax.random.key(3)
    img0 = np.asarray(render_sample(scene, tracer, cam, key, cfg))
    img1 = np.asarray(render_sample(scene, tracer, cam, key,
                                    cfg.replace(sky_mxu=True)))
    np.testing.assert_array_equal(img0, img1)
