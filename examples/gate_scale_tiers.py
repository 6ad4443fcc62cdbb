"""Fidelity gates for the sharded-accel scale tiers (1M/2M triangles), TPU.

Reproduces the round-5 ladder gates in SCALING_r05.json. Two lessons are
baked into the design (both measured, see CLAUDE.md round-5 notes):

1. ``rng_impl="rbg"`` bits are BACKEND-SPECIFIC (XLA RngBitGenerator):
   a CPU-rendered oracle compared against a TPU render draws different
   streams, so the two images are independent 1-spp estimates (measured
   rmse ~0.64 — two-different-seeds noise), not a comparison. Both sides
   of a gate must run on ONE backend (or use threefry, which is
   counter-based and bit-portable).
2. One whole-frame cluster-tracer dispatch at >=1M triangles runs minutes
   of serial per-ray gathers and trips the remote tunnel's execution
   watchdog (kills the TPU worker). ``RenderConfig.dispatch_bands`` bounds
   each dispatch; the banded key chain (render.py:_step_banded) depends
   only on seed/step/band — NOT on the tracer — so a pallas render and a
   cluster render with the same banded config draw identical streams and
   compare exactly (modulo the known near-tie ulp winner flips).

Expected results (v5e, round-5 HEAD): 2M bounce-1 BIT-exact vs the
cluster oracle; 1M 4-bounce gate rmse ~4e-3 from 2/18432 near-tie flips
(the mechanism diagnosed at 400k: MXU fused-split dot vs XLA op order,
ulps apart on competing t's); 2M 4-bounce renders bit-identical across
different shard partitions of the same kd order.

Usage (TPU):   python examples/gate_scale_tiers.py {gate1m,gate2m_b1,gate2m_part}
CPU sanity:    python examples/gate_scale_tiers.py smoke

Reference motivation: the per-mesh brute loop these tiers replace,
/root/reference/Assets/Shaders/RayTraceShader.compute:243.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

cmd = sys.argv[1] if len(sys.argv) > 1 else "smoke"

if cmd == "smoke":
    jax.config.update("jax_platforms", "cpu")
else:
    from unityraytracer_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()

from unityraytracer_tpu import Camera, RenderConfig, Renderer
from unityraytracer_tpu.models import fixtures
from unityraytracer_tpu.utils.image import rmse

W, H = (192, 96) if cmd != "smoke" else (64, 32)
CAM = dict(position=(0.0, 14.0, -42.0), look_at=(0.0, 2.0, 0.0),
           fov_y_deg=60.0, aspect=W / H)


def base_cfg(bounces, bands, tracer):
    return RenderConfig(width=W, height=H, spp=1, bounces=bounces,
                        tracer=tracer, ray_chunk=4096,
                        wavefront=True, rr_group="step", rng_impl="rbg",
                        dispatch_bands=bands)


def render(scene, cfg, accel=None):
    return Renderer(scene, Camera.create(**CAM), cfg,
                    accel=accel, seed=7).step(1).image


def report(tag, img_a, img_b, **extra):
    d = np.abs(img_a - img_b).max(axis=-1)
    out = {"tag": tag, "rmse": float(rmse(img_a, img_b)),
           "max_diff": float(d.max()),
           "bad_px_1e2": int((d > 1e-2).sum()),
           "bad_px_1e4": int((d > 1e-4).sum()),
           "bit_exact": bool(np.array_equal(img_a, img_b)),
           "n_px": int(d.size)}
    out.update(extra)
    print("RESULT " + json.dumps(out), flush=True)


def forced_partition_accel(scene, frac=0.75):
    """Sharded kernel accel with a DIFFERENT partition of the same global
    kd order: smaller-than-budget shards (a larger cap would fail the
    per-shard VMEM check — the budget shards are already maximal)."""
    from unityraytracer_tpu.ops.pallas_trace import (
        _est_shard_tris, prepare_pallas_accel_sharded)
    cap = int(_est_shard_tris() * frac)
    acc = prepare_pallas_accel_sharded(scene.triangles, scene.materials,
                                       max_shard_tris=cap)
    return acc, len(acc.shards)


if cmd == "gate1m":
    # Deep-bounce gate at 1M: sharded pallas tier vs the cluster oracle,
    # both banded (4 bands keep each cluster dispatch ~under the measured
    # ~470 s survivable point).
    scene = fixtures.bench_scene(n_tris=1_000_000)
    img_p = render(scene, base_cfg(4, 4, "pallas"))
    img_c = render(scene, base_cfg(4, 4, "cluster"))
    report("gate1m_b4_vs_cluster", img_p, img_c)
elif cmd == "gate2m_b1":
    # Bounce-1 exactness at the 2M addressing bound (expected bit-exact).
    scene = fixtures.bench_scene(n_tris=2_000_000)
    img_p = render(scene, base_cfg(1, 4, "pallas"))
    img_c = render(scene, base_cfg(1, 4, "cluster"))
    report("gate2m_bounce1_vs_cluster", img_p, img_c)
elif cmd == "gate2m_part":
    # Deep-bounce partition independence at 2M: the default (budget-sized,
    # 16-shard) partition vs a forced ~21-shard partition of the same kd
    # order must render BIT-identically — shard chaining and the global
    # closest-hit combine cannot depend on where the cuts fall.
    scene = fixtures.bench_scene(n_tris=2_000_000)
    cfg = base_cfg(4, 4, "pallas")
    img_a = render(scene, cfg)
    acc_b, n_b = forced_partition_accel(scene)
    img_b = render(scene, cfg, accel=acc_b)
    report("gate2m_partition_independence", img_a, img_b, n_shards_b=n_b)
elif cmd == "smoke":
    scene = fixtures.bench_scene(n_tris=2_000)
    img_p = render(scene, base_cfg(2, 2, "pallas"))
    img_c = render(scene, base_cfg(2, 2, "cluster"))
    report("smoke_pallas_vs_cluster", img_p, img_c)
    acc_b, n_b = forced_partition_accel(scene, frac=0.01)
    img_s = render(scene, base_cfg(2, 2, "pallas"), accel=acc_b)
    report("smoke_partition", img_p, img_s, n_shards_b=n_b)
else:
    raise SystemExit(f"unknown cmd {cmd!r}")
print("ALL_DONE", flush=True)
