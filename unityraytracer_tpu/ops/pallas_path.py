"""Full-path megakernel: every bounce of the path trace in ONE Pallas call.

The per-bounce architecture (render.py bounce loop + pallas_trace.py kernel)
round-trips all ray state through HBM eight times per frame and leaves
~25% of device time in XLA elementwise stages (sphere/ground candidates,
candidate merging, shading). This kernel is the reference megakernel
(CSMain, RayTraceShader.compute:431-469) re-shaped for the TPU grid model:

* **Grid = (ray steps, bounces), bounce innermost.** TPU grid iteration is
  sequential, so for each 1024-ray step the bounce index b sweeps 0..B-1
  while the step's ENTIRE path state (rays, throughput, radiance, sky
  records, alive mask) lives in VMEM scratch — rays never touch HBM between
  bounces, and the kernel body (one bounce) keeps Mosaic code size flat in
  the bounce count.

* **Ground + spheres in-kernel.** The per-bounce XLA candidates/merge
  (trace.py:_ground_candidate/_sphere_candidate/combine_candidates) fold
  into ~40 row ops: sphere hits are a (spheres, rays) broadcast quadratic
  with the same pack-index-into-mantissa winner min used for triangles, and
  winner attributes come from one (16, Sp) one-hot matmul.

* **Shading in-kernel, bit-matching the XLA path.** ops/shade.py:shade and
  ops/sampling.py run unmodified on (1, BLOCK) rows inside the kernel (all
  elementwise), consuming the SAME threefry uniforms the XLA bounce loop
  draws (precomputed per frame, fed as a per-(step, bounce) input block) —
  so the megakernel's estimator is stream-identical to the brute oracle's
  and the image agrees to float op-order noise.

* **Deferred environment stays in XLA**: the kernel emits (radiance,
  sky throughput, sky direction); the single stochastic RGBE gather per ray
  happens once per frame outside (render.py rationale).

Per-bounce coherence binning (pallas_trace.py) applies unchanged, selected
per bounce with a scalar predicate; the permutation matrix parks in a VMEM
scratch ref so unbinned bounces skip the sort entirely.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_trace as pt
from .pallas_trace import _ground_sphere_init
from .shade import Hit, shade

_F32_MAX = pt._F32_MAX
MISS = 1.0e30  # matches ops/shade.py MISS_T

# Perf-diagnosis ablations (NEVER enable for rendering): members of
# {"noshade", "nogs", "notrace"} disable the respective kernel stage.
ABLATE = frozenset()


def _rows3(ref_or_val, r0):
    return (ref_or_val[r0:r0 + 1, :], ref_or_val[r0 + 1:r0 + 2, :],
            ref_or_val[r0 + 2:r0 + 3, :])


def _path_kernel(n_pages, bounces, bin_lo, bin_hi, use_rr, bbox, geom,
                 rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                 alive0_ref, uni_ref,
                 scx_ref, scy_ref, scz_ref, sr_ref, sattr_ref, gmisc_ref,
                 pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
                 cxmin_ref, cymin_ref, czmin_ref,
                 cxmax_ref, cymax_ref, czmax_ref,
                 cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref,
                 epl_ref, epn_ref, chan_ref,
                 rad0_ref, rad1_ref, rad2_ref,
                 se0_ref, se1_ref, se2_ref,
                 sd0_ref, sd1_ref, sd2_ref,
                 S, ST, A_ref, P_ref):
    """One (step, bounce) grid cell. ST rows: 0-2 ro, 3-5 rd, 6-8 energy,
    9-11 radiance, 12-14 sky_e, 15-17 sky_d, 18 alive."""
    B = pt.BLOCK
    b = pl.program_id(1)
    zero = jnp.zeros((1, B), jnp.float32)

    @pl.when(b == 0)
    def _init():
        ST[0:1, :] = rox_ref[0, 0:1, :]
        ST[1:2, :] = roy_ref[0, 0:1, :]
        ST[2:3, :] = roz_ref[0, 0:1, :]
        ST[3:4, :] = rdx_ref[0, 0:1, :]
        ST[4:5, :] = rdy_ref[0, 0:1, :]
        ST[5:6, :] = rdz_ref[0, 0:1, :]
        ST[6:9, :] = jnp.ones((3, B), jnp.float32)        # energy
        ST[9:15, :] = jnp.zeros((6, B), jnp.float32)      # radiance, sky_e
        ST[15:16, :] = zero                               # sky_d = (0, 1, 0)
        ST[16:17, :] = zero + 1.0
        ST[17:18, :] = zero
        ST[18:19, :] = alive0_ref[0, 0:1, :]

    alive_row = ST[18:19, :]
    seed_alive = jnp.where(alive_row > 0, 1.0, 0.0)
    ins = jnp.concatenate([ST[0:6, :], seed_alive, zero], axis=0)  # (8, B)

    if bin_lo is None:
        bin_now = None
        A_ref[:] = ins
    else:
        bin_now = (b >= bin_lo) & (b <= bin_hi)

        @pl.when(bin_now)
        def _sort():
            if pt.BIN_SCHEME == "morton_fine":
                keys = pt._morton_fine_keys(
                    ins[0:1, :], ins[1:2, :], ins[2:3, :],
                    ins[3:4, :], ins[4:5, :], ins[5:6, :],
                    ins[6:7, :], bbox)
                src = jnp.bitwise_and(pt._bitonic_sort_row(keys),
                                      jnp.int32((1 << pt._LANE_BITS) - 1))
                i_iota = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                P_ref[:] = (i_iota == src).astype(jnp.bfloat16)
            else:
                bins = pt._ray_bin_ids(ins[0:1, :], ins[1:2, :], ins[2:3, :],
                                       ins[3:4, :], ins[4:5, :], ins[5:6, :],
                                       ins[6:7, :], bbox)
                P_ref[:] = pt._perm_matrix(pt._bin_destinations(bins))
            A_ref[:] = pt._permute_exact(ins, P_ref[:], 0)

        @pl.when(jnp.logical_not(bin_now))
        def _ident():
            A_ref[:] = ins

    A = A_ref[:]
    # Non-triangle candidates seed S (in trace order); triangles overwrite
    # where strictly closer. Dead rays carry best-t 0 -> no triangle work.
    a_alive = A[6:7, :]
    if "nogs" in ABLATE:
        S[0:1, :] = jnp.where(a_alive > 0, _F32_MAX, 0.0)
        S[1:16, :] = jnp.zeros((15, B), jnp.float32)
    else:
        _ground_sphere_init(A, S, a_alive,
                            scx_ref[:], scy_ref[:], scz_ref[:], sr_ref[:],
                            sattr_ref[:], gmisc_ref[:])
    if "notrace" not in ABLATE:
        pt._trace_block(
            geom, n_pages, A, S,
            (pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref),
            (cxmin_ref, cymin_ref, czmin_ref,
             cxmax_ref, cymax_ref, czmax_ref),
            (cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref),
            epl_ref, epn_ref, chan_ref)

    if bin_lo is not None:
        @pl.when(bin_now)
        def _unsort():
            S[:] = pt._permute_exact(S[:], P_ref[:], 1)

    # ---- shade (original ray order; ops/shade.py runs on (1, B) rows) ----
    H = S[:]
    ro = _rows3(ST, 0)
    rd = _rows3(ST, 3)
    energy = _rows3(ST, 6)
    t = jnp.where(alive_row > 0, H[0:1, :], _F32_MAX)  # dead rays: miss
    t = jnp.where(t >= _F32_MAX * 0.5, MISS * 1.5, t)
    pos = tuple(ro[k] + t * rd[k] for k in range(3))
    hit = Hit(t=t, position=pos, normal=_rows3(H, 1),
              albedo=_rows3(H, 4), specular=_rows3(H, 7),
              emission=_rows3(H, 10), smoothness=H[13:14, :])
    # Uniform rows (precomputed in XLA, see render_sample_mega): 0 roulette,
    # 1 log2(u1), 2 cos(2*pi*u2), 3 sin(2*pi*u2), 4 RR. The trig/log rows
    # exist because Mosaic lowers pow/sin/cos to slow generic polynomials —
    # each is a pure function of the SAME uniform, so the stream matches the
    # XLA bounce loop / brute oracle.
    u_rows = tuple(uni_ref[0, 0, k:k + 1, :] for k in range(5))
    if "noshade" in ABLATE:
        missed = t >= MISS
        new_ro, new_rd = ro, rd
        new_energy = tuple(e * jnp.where(missed, 0.0, 0.9) for e in energy)
        contrib = tuple(e * 0.01 for e in energy)
    else:
        new_ro, new_rd, new_energy, contrib, missed = shade(
            ro, rd, energy, hit, (u_rows[0], u_rows[1], u_rows[2]),
            trig=(u_rows[1], u_rows[2], u_rows[3]))
    alive_b = alive_row > 0
    record = missed & alive_b
    for k in range(3):
        ST[9 + k:10 + k, :] = jnp.where(alive_b, ST[9 + k:10 + k, :]
                                        + contrib[k], ST[9 + k:10 + k, :])
        ST[12 + k:13 + k, :] = jnp.where(record, energy[k],
                                         ST[12 + k:13 + k, :])
        ST[15 + k:16 + k, :] = jnp.where(record, rd[k], ST[15 + k:16 + k, :])
        ST[0 + k:1 + k, :] = jnp.where(alive_b, new_ro[k], ST[0 + k:1 + k, :])
        ST[3 + k:4 + k, :] = jnp.where(alive_b, new_rd[k], ST[3 + k:4 + k, :])

    energy = new_energy
    alive_new = (alive_b & jnp.logical_not(missed)
                 & ((energy[0] > 0) | (energy[1] > 0) | (energy[2] > 0)))

    if use_rr:
        # Unbiased Russian roulette from bounce 3 (render.py bounce loop).
        do_rr = (b >= 2) & (b < bounces - 1)
        u_rr = u_rows[4]
        p_surv = jnp.clip(jnp.maximum(jnp.maximum(energy[0], energy[1]),
                                      energy[2]), 0.05, 1.0)
        keep = u_rr < p_surv
        boost = jnp.where(keep, 1.0 / p_surv, 0.0)
        rr_scale = jnp.where(do_rr, boost, 1.0)
        energy = tuple(e * rr_scale for e in energy)
        alive_new = alive_new & (keep | jnp.logical_not(do_rr))

    for k in range(3):
        ST[6 + k:7 + k, :] = jnp.where(alive_b, energy[k], ST[6 + k:7 + k, :])
    ST[18:19, :] = jnp.where(alive_b, alive_new.astype(jnp.float32),
                             ST[18:19, :])

    # Outputs: rewritten every bounce of the step; the b == bounces-1 values
    # are what lands in HBM (the out block index is constant in b).
    for ref, row in ((rad0_ref, 9), (rad1_ref, 10), (rad2_ref, 11),
                     (se0_ref, 12), (se1_ref, 13), (se2_ref, 14),
                     (sd0_ref, 15), (sd1_ref, 16), (sd2_ref, 17)):
        ref[0, 0:1, :] = ST[row:row + 1, :]


def path_trace(pa, ro, rd, uni, cfg, interpret: bool):
    """Trace + shade full paths for all rays in one pallas_call.

    ro/rd: Vec3 tuples of (N,) camera rays (block order). ``uni``: (bounces,
    5, N) uniform rows in the same ray order — (roulette, log2(u1),
    cos(2*pi*u2), sin(2*pi*u2), rr). Returns (radiance, sky_energy,
    sky_dir): three Vec3 tuples of (N,).
    """
    N = ro[0].shape[0]
    B = pt.BLOCK
    bounces = cfg.bounces
    pad = (-N) % B
    alive0 = jnp.ones((N,), jnp.float32)
    if pad:
        zpad = jnp.zeros((pad,), jnp.float32)
        ro = tuple(jnp.concatenate([c, zpad]) for c in ro)
        rd = (jnp.concatenate([rd[0], zpad]),
              jnp.concatenate([rd[1], zpad - 1.0]),
              jnp.concatenate([rd[2], zpad]))
        alive0 = jnp.concatenate([alive0, zpad])
        uni = jnp.concatenate(
            [uni, jnp.zeros((bounces, 5, pad), jnp.float32)], axis=2)
    Np = N + pad
    n_steps = Np // B

    def comp(a):
        return a.reshape(n_steps, 1, B)

    ray_in = [comp(c) for c in (*ro, *rd, alive0)]
    # (n_steps, bounces, 8, B): rows 0-4 = uniform rows, 5-7 pad (block
    # specs need a sublane dim % 8).
    uni8 = jnp.concatenate(
        [uni, jnp.zeros((bounces, 3, Np), jnp.float32)], axis=1)
    uni_steps = jnp.transpose(uni8.reshape(bounces, 8, n_steps, B),
                              (2, 0, 1, 3))

    ray_spec = pl.BlockSpec((1, 1, B), lambda i, b: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    uni_spec = pl.BlockSpec((1, 1, 8, B), lambda i, b: (i, b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, B), lambda i, b: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    lo, hi = cfg.ray_bin_bounces
    kernel = functools.partial(
        _path_kernel, pa.n_pages, bounces, lo, hi, cfg.russian_roulette,
        pa.bbox, pa.geom)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out_shape = [jax.ShapeDtypeStruct((n_steps, 1, B), jnp.float32)
                 for _ in range(9)]
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps, bounces),
        in_specs=[ray_spec] * 7 + [uni_spec] + [full()] * (6 + 6 + 6 + 6 + 3),
        out_specs=[out_spec] * 9,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, B), jnp.float32),
                        pltpu.VMEM((24, B), jnp.float32),
                        pltpu.VMEM((8, B), jnp.float32),
                        pltpu.VMEM((B, B), jnp.bfloat16)],
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*ray_in, uni_steps, *pa.gs, *pa.pgb, *pa.cl_cols, *pa.cb_rows,
      pa.epluck, pa.eplane, pa.chan)

    outs = tuple(o.reshape(Np)[:N] for o in outs)
    return outs[0:3], outs[3:6], outs[6:9]
