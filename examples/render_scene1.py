"""Render the reference's main demo scene (Scene1) progressively.

Usage: python examples/render_scene1.py [frames] [out.png]
Uses the fused Pallas tracer on TPU, the interpretable cluster tracer on CPU.
"""

import sys

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax

from unityraytracer_tpu import RenderConfig, Renderer
from unityraytracer_tpu.models import fixtures


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    out = sys.argv[2] if len(sys.argv) > 2 else "scene1.png"

    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(width=640, height=480, spp=1, bounces=4,
                       tracer="pallas" if on_tpu else "cluster",
                       wavefront=True)
    scene = fixtures.scene1()
    camera = fixtures.scene1_camera(aspect=cfg.width / cfg.height)

    r = Renderer(scene, camera, cfg)
    r.step(frames)
    print(f"{frames} frames, {r.stats['ms_per_frame']:.1f} ms/frame, "
          f"{r.stats['mrays_per_sec']:.1f} Mrays/s")
    print("wrote", r.save_screenshot(out))


if __name__ == "__main__":
    main()
