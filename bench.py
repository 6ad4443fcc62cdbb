"""Headline benchmark: Mrays/s/chip at 1080p on a 100k-triangle LBVH scene.

Runs the full progressive frame step (camera rays -> fused Pallas trace ->
roulette shade, x bounces) on the flagship path and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}

vs_baseline is measured against BASELINE.json's north-star target of
100 Mrays/sec/chip (the reference publishes no numbers of its own —
README.md:2 only says it is "very slow"). Rays are counted as dispatched
trace slots: width x height x spp x bounces per frame; the JSON also
carries ``effective_mrays`` — the alive-weighted rate (miss termination
and Russian roulette kill most slots by bounce 2) — so both the
slot-throughput and the honest surviving-ray rate are recorded.
"""

import functools
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from unityraytracer_tpu.utils.compcache import enable_persistent_cache

    # Remote compiles queue on a globally-shared service (30-900 s measured,
    # congestion-dependent); the persistent cache makes reruns of this
    # unchanged benchmark program skip the queue entirely. With the cache
    # on, compile_s measures warm-cache loads on reruns — the JSON records
    # the cache dir so cold and warm runs are distinguishable; run with
    # URT_COMPILE_CACHE='' for an official cold-compile measurement.
    cache_dir = enable_persistent_cache()

    on_tpu = jax.default_backend() == "tpu"

    from unityraytracer_tpu import RenderConfig, RenderState
    from unityraytracer_tpu.models import fixtures
    from unityraytracer_tpu.ops.bvh import build_accel
    from unityraytracer_tpu.render import (get_tracer, progressive_step,
                                           render_frame, render_sample)

    if on_tpu:
        # rr_group="step": group Russian roulette (one decision per
        # megakernel step; unbiased, slightly correlated deep-bounce noise)
        # lets dead steps skip all per-bounce work — measured 210.7 vs
        # 217.8 ms with per-ray RR on this scene.
        # rng_impl="rbg": hardware RngBitGenerator bits (config.py:101-109)
        # — measured ~1.3 ms/frame cheaper than XLA threefry at 1080p x 8
        # bounces; streams stay deterministic and tracer-identical, so the
        # oracle gate below is unaffected (it renders both paths with the
        # same impl).
        cfg = RenderConfig(width=1920, height=1080, spp=1, bounces=8,
                           tracer="pallas", wavefront=True, rr_group="step",
                           rng_impl="rbg")
        n_tris = 100_000
        iters, warmup = 8, 2
    else:
        # CPU fallback (driver sanity off-TPU): tiny interpret-mode config.
        cfg = RenderConfig(width=64, height=64, spp=1, bounces=2,
                           tracer="cluster", cluster_size=32, ray_chunk=4096)
        n_tris = 2_000
        iters, warmup = 1, 1

    scene = fixtures.bench_scene(n_tris=n_tris)
    camera_kw = dict(position=(0.0, 14.0, -42.0), look_at=(0.0, 2.0, 0.0),
                     fov_y_deg=60.0, aspect=cfg.width / cfg.height)
    from unityraytracer_tpu import Camera
    camera = Camera.create(**camera_kw)
    # One untimed warmup (first call pays ~2 s of one-time numpy ufunc /
    # BLAS initialization that no steady-state dirty-scene rebuild sees),
    # then best of 3: the single shared host core suffers multi-second
    # scheduling stalls when the remote compile service is busy; the min is
    # the real rebuild latency a dirty-scene frame pays.
    accel = build_accel(scene, cfg)
    build_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        accel = build_accel(scene, cfg)
        build_s = min(build_s, time.time() - t0)
    scene = jax.device_put(scene)
    accel = jax.device_put(accel)

    @functools.partial(jax.jit, static_argnums=(5,))
    def step(state, scene, camera, accel, key, n_frames):
        def body(i, st):
            sub = jax.random.fold_in(key, st.n_samples)
            frame = render_frame(scene, cfg, camera, sub, accel)
            return progressive_step(st, frame)

        # The whole frame block runs INSIDE one jit dispatch (fori_loop):
        # through the axon execution tunnel, per-dispatch latency is large
        # and noisy; a progressive renderer amortizes it the same way.
        return jax.lax.fori_loop(0, n_frames, body, state)

    state = RenderState.create(cfg.width, cfg.height)
    key = jax.random.key(0, impl=cfg.rng_impl)

    # NOTE: jax.block_until_ready does NOT actually block through the axon
    # execution tunnel — only a value fetch synchronizes. All timing below is
    # fetch-based.
    del warmup
    # Compile timing: AOT .lower().compile() dies inside the axon plugin's
    # lowering cache (KeyError on closed_call), so the first jit call is
    # timed instead; it includes ONE iters-frame execution, which is
    # subtracted back out below once the steady block time is known.
    key, sub = jax.random.split(key)
    t0 = time.time()
    state = step(state, scene, camera, accel, sub, iters)
    np.asarray(jax.device_get(state.n_samples))
    first_call_s = time.time() - t0

    # Time by SCALAR fetch (synchronizes the chain like any value fetch);
    # pulling the 25 MB framebuffer through the axon debug tunnel costs
    # ~80 ms/frame of pure measurement artifact. Best of 5 blocks guards
    # against shared-infrastructure noise windows (the compile service
    # shares the chip; single blocks measured up to ~2% slow).
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        key, sub = jax.random.split(key)
        state = step(state, scene, camera, accel, sub, iters)
        np.asarray(jax.device_get(state.n_samples))
        best = min(best, (time.time() - t0) / iters)
    img = np.asarray(jax.device_get(state.accum))

    rays_per_frame = cfg.width * cfg.height * cfg.spp * cfg.bounces
    mrays = rays_per_frame / best / 1e6
    ms_frame = best * 1000.0
    # First call = trace + compile + one executed block; remove the block.
    compile_s = max(0.0, first_call_s - best * iters)

    assert np.isfinite(img).all(), "benchmark produced non-finite pixels"

    # Fidelity gate: the flagship path must match the brute-force oracle on
    # THIS scene (same key => same estimator decisions, so the only allowed
    # difference is float op-order noise). Small res keeps the dense oracle
    # tractable at 100k triangles; 192x96 still exercises the blocked tile
    # path. Perf work cannot silently break rendering correctness.
    from unityraytracer_tpu.utils.image import rmse

    # bounces=4 makes Russian roulette fire (active for 2 <= b < bounces-1),
    # so the gate covers the megakernel RR against the oracle's XLA RR.
    ccfg = cfg.replace(width=192, height=96, bounces=4, spp=1)
    bcfg = ccfg.replace(tracer="brute", ray_chunk=1024)
    ckey = jax.random.key(42, impl=cfg.rng_impl)

    @jax.jit
    def check_frame(scene, camera, accel, key, _cfg=ccfg):
        # render_frame: the same megakernel/bounce-loop choice the timed
        # block made, so the oracle gate covers exactly the path that ships.
        return render_frame(scene, _cfg, camera, key, accel)

    @jax.jit
    def oracle_frame(scene, camera, key, _cfg=bcfg):
        return render_sample(scene, get_tracer(scene, _cfg, None), camera,
                             key, _cfg)

    cam_small = Camera.create(**dict(camera_kw, aspect=ccfg.width / ccfg.height))
    img_fast = np.asarray(jax.device_get(
        check_frame(scene, cam_small, accel, ckey)))
    img_oracle = np.asarray(jax.device_get(
        oracle_frame(scene, cam_small, ckey)))
    oracle_rmse = float(rmse(img_fast, img_oracle))
    assert oracle_rmse < 1e-3, (
        f"flagship path diverged from the brute oracle: RMSE {oracle_rmse}")

    # Honest-throughput companion: the headline counts DISPATCHED trace
    # slots (W*H*spp*bounces), but miss termination and Russian roulette
    # kill most rays by bounce 2 — also report the alive-weighted effective
    # rate. The alive trajectory is estimator-identical across tracers
    # (same threefry streams), so it is measured on the brute path at the
    # gate resolution with the BENCH bounce count and applied as a fraction.
    # VALIDATED r5: the exact full-1080p alive fraction, measured once on
    # the per-bounce Pallas path (with_alive_count through the real accel),
    # is 0.2216 vs 0.222 from this gate-res approximation — the resolution
    # dependence through tile occupancy is below the bench's noise floor,
    # so the cheap measurement stays.
    acfg = bcfg.replace(bounces=cfg.bounces)

    @jax.jit
    def alive_frame(scene, camera, key, _cfg=acfg):
        return render_sample(scene, get_tracer(scene, _cfg, None), camera,
                             key, _cfg, with_alive_count=True)[1]

    alive_total = float(np.asarray(jax.device_get(
        alive_frame(scene, cam_small, ckey))))
    alive_frac = alive_total / (acfg.width * acfg.height * acfg.spp
                                * acfg.bounces)
    effective_mrays = mrays * alive_frac

    result = {
        "metric": (f"Mrays/s/chip @ {cfg.width}x{cfg.height}, "
                   f"{scene.num_triangles}-tri LBVH scene, {cfg.bounces} bounces "
                   f"({'TPU ' + jax.devices()[0].device_kind if on_tpu else 'CPU fallback'})"),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "ms_per_frame": round(ms_frame, 2),
        "effective_mrays": round(effective_mrays, 2),
        "alive_fraction": round(alive_frac, 4),
        "accel_build_s": round(build_s, 2),
        "compile_s": round(compile_s, 2),
        "compile_cache_dir": cache_dir,
        "oracle_rmse": round(oracle_rmse, 6),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
