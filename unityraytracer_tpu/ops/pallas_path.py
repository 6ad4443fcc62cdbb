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

_F32_MAX = pt._F32_MAX
MISS = 1.0e30  # matches ops/shade.py MISS_T

# Perf-diagnosis ablations (NEVER enable for rendering): members of
# {"noshade", "nogs", "notrace"} disable the respective kernel stage.
ABLATE = frozenset()


def _path_kernel(n_pages, bounces, b0, emit_state, bin_lo, bin_hi, use_rr,
                 bbox, geom, n_sph, order_ax, trav, bin_scheme, chan_mode,
                 page_axes,
                 rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                 alive0_ref, e0x_ref, e0y_ref, e0z_ref, uni_ref,
                 scx_ref, scy_ref, scz_ref, sr_ref, sattr_ref, gmisc_ref,
                 pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
                 pgaxd_ref,
                 cxmin_ref, cymin_ref, czmin_ref,
                 cxmax_ref, cymax_ref, czmax_ref,
                 cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref,
                 epl_ref, epn_ref, chan_ref,
                 rad0_ref, rad1_ref, rad2_ref,
                 se0_ref, se1_ref, se2_ref,
                 sd0_ref, sd1_ref, sd2_ref,
                 *rest):
    """One (step, bounce) grid cell. ST state lives in 8-ALIGNED (3, B)
    blocks (Mosaic assigns per-row sublane offsets; aligned blocks keep
    Vec3 math relayout-free): rows 0-2 ro, 8-10 rd, 16-18 energy, 24-26
    radiance, 32-34 sky_e, 40-42 sky_d, 48 alive.

    ``b0``/``bounces``: this call runs LOCAL bounces 0..grid-1 that are
    GLOBAL bounces b0..b0+grid-1 of a ``bounces``-deep path — the bounce-
    split driver (render.py:render_sample_mega) runs bounces [0, sb) at
    full width, compacts the ~2% of rays still alive, and runs [sb, B) on
    the compact buffer. All bounce-indexed predicates (binning window,
    Russian-roulette range) use the global index, and ``emit_state`` adds a
    (16, B) packed state output (ro/rd/energy/alive) for the hand-off.
    """
    if emit_state:
        st_ref = rest[0]
        S, ST, A_ref, P_ref, H_ref, slot_ref = rest[1:]
    else:
        S, ST, A_ref, P_ref, H_ref, slot_ref = rest
    B = pt.BLOCK
    b = pl.program_id(1)
    bg = b + b0                      # global bounce index
    zero = jnp.zeros((1, B), jnp.float32)

    # Step-level early-out: once every ray of this 1024-ray step is dead
    # (sky strips die at bounce 1; group Russian roulette kills whole steps
    # at deep bounces), the remaining (step, bounce) grid cells skip
    # sort/ground/spheres/trace/shade entirely — the out blocks keep their
    # VMEM-resident values from the last live bounce, which are exactly the
    # step's final state (dead rays never change radiance or sky records).
    # At b == 0 the scratch is uninitialized, so the init bounce always runs.
    @pl.when((b == 0) | jnp.any(ST[48:49, :] > 0))
    def _live_step():
        @pl.when(b == 0)
        def _init():
            ST[0:1, :] = rox_ref[0, 0:1, :]
            ST[1:2, :] = roy_ref[0, 0:1, :]
            ST[2:3, :] = roz_ref[0, 0:1, :]
            ST[8:9, :] = rdx_ref[0, 0:1, :]
            ST[9:10, :] = rdy_ref[0, 0:1, :]
            ST[10:11, :] = rdz_ref[0, 0:1, :]
            ST[16:17, :] = e0x_ref[0, 0:1, :]                 # energy
            ST[17:18, :] = e0y_ref[0, 0:1, :]
            ST[18:19, :] = e0z_ref[0, 0:1, :]
            ST[24:27, :] = jnp.zeros((3, B), jnp.float32)     # radiance
            ST[32:35, :] = jnp.zeros((3, B), jnp.float32)     # sky_e
            ST[40:41, :] = zero                               # sky_d = (0, 1, 0)
            ST[41:42, :] = zero + 1.0
            ST[42:43, :] = zero
            ST[48:49, :] = alive0_ref[0, 0:1, :]

        alive_row = ST[48:49, :]
        seed_alive = jnp.where(alive_row > 0, 1.0, 0.0)
        ins = jnp.concatenate([ST[0:3, :], ST[8:11, :], seed_alive, zero],
                              axis=0)                                  # (8, B)

        if bin_lo is None:
            bin_now = None
            A_ref[:] = ins
        else:
            bin_now = (bg >= bin_lo) & (bg <= bin_hi)

            @pl.when(bin_now)
            def _sort():
                if bin_scheme == "morton_fine":
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
                                           ins[6:7, :], bbox, bin_scheme)
                    P_ref[:] = pt._perm_matrix(
                        pt._bin_destinations(bins, bin_scheme))
                A_ref[:] = pt._permute_exact(ins, P_ref[:], 0)

            @pl.when(jnp.logical_not(bin_now))
            def _ident():
                A_ref[:] = ins

        A = A_ref[:]
        # Non-triangle candidates seed S (in trace order); triangles overwrite
        # where strictly closer. Dead rays carry best-t 0 -> no triangle work.
        a_alive = A[6:7, :]
        if "nogs" in ABLATE:
            S[:] = jnp.concatenate(
                [jnp.where(a_alive > 0, _F32_MAX, 0.0),
                 jnp.zeros((pt.SROWS - 1, B), jnp.float32)], axis=0)
        else:
            _ground_sphere_init(A, S, a_alive,
                                scx_ref[:], scy_ref[:], scz_ref[:], sr_ref[:],
                                sattr_ref[:], gmisc_ref[:],
                                n_spheres=n_sph)
        if "notrace" not in ABLATE:
            pt._trace_block(
                geom, n_pages, order_ax, A, S,
                (pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
                 pgaxd_ref),
                (cxmin_ref, cymin_ref, czmin_ref,
                 cxmax_ref, cymax_ref, czmax_ref),
                (cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref),
                epl_ref, epn_ref, chan_ref, trav, chan_mode, page_axes,
                slot_ref=slot_ref)

        # Compact the aligned hit scratch into the 16-row record (so the
        # unpermute matmul stays 16 rows wide), inverse-permute if binned.
        H_ref[:] = pt._compact_hit(S)
        if bin_lo is not None:
            @pl.when(bin_now)
            def _unsort():
                H_ref[:] = pt._permute_exact(H_ref[:], P_ref[:], 1)

        # ---- shade: STACKED Vec3 on 8-aligned (3, B) blocks -----------------
        # Mosaic packs (1, B) rows with per-row sublane offsets, so row-wise
        # Vec3 math costs one issue PER COMPONENT plus relayouts between
        # mismatched offsets; (3, B) blocks at 8-aligned scratch offsets run
        # whole vectors per issue (measured 1.6x on a shade-like chain). The
        # math below mirrors ops/shade.py's trig branch op-for-op.
        H = H_ref[:]

        def c3(r0):
            return jnp.concatenate([H[r0:r0 + 1, :], H[r0 + 1:r0 + 2, :],
                                    H[r0 + 2:r0 + 3, :]], axis=0)

        alive_b = alive_row > 0
        t = jnp.where(alive_b, H[0:1, :], _F32_MAX)       # dead rays: miss
        t = jnp.where(t >= _F32_MAX * 0.5, MISS * 1.5, t)
        missed = t >= MISS
        ro = ST[0:3, :]
        rd = ST[8:11, :]
        energy = ST[16:19, :]
        n = c3(1)
        alb_raw = c3(4)
        spec = c3(7)
        emis = c3(10)
        smooth = H[13:14, :]

        # Uniform rows (precomputed in XLA, see render_sample_mega): 0 roulette,
        # 1 log2(u1), 2 cos(2*pi*u2), 3 sin(2*pi*u2), 4 RR — pure functions of
        # the same threefry draws the XLA bounce loop uses (Mosaic's pow/sin/cos
        # lower to slow generic polynomials). One (1, 1, 8, B) block per
        # (step, bounce) — the index map varies in b, so Pallas streams the
        # right bounce's rows and the kernel reads them at STATIC offsets.
        # Measured history of the alternatives (v5e, 1080p/100k/8b):
        # ee5d2bf's one-fetch-per-step (1, 5*nb, B) block sliced at pl.ds(5*b)
        # does not COMPILE (Mosaic: dynamic sublane offsets must be provably
        # ≡ 0 mod 8); the 8-aligned repair (1, 8*nb, B) + ds8(8, b, 8)
        # compiles but LOSES ~8 ms/frame (171.9 vs 163.7 — the in-kernel
        # dynamic VMEM slice costs more than the per-bounce fetch it saves).
        urows = uni_ref[0, 0]
        u_r = urows[0:1, :]
        log2_u1 = urows[1:2, :]
        cos_phi = urows[2:3, :]
        sin_phi = urows[3:4, :]

        if "noshade" in ABLATE:
            new_ro, new_dir = ro, rd
            new_energy = energy * jnp.where(missed, 0.0, 0.9)
            contrib = energy * 0.01
        else:
            albedo = jnp.minimum(1.0 - spec, alb_raw)
            spec_chance = (spec[0:1, :] + spec[1:2, :] + spec[2:3, :]) / 3.0
            diff_chance = (albedo[0:1, :] + albedo[1:2, :] + albedo[2:3, :]) / 3.0
            total = spec_chance + diff_chance
            safe_total = jnp.where(total > 0, total, 1.0)
            spec_chance = spec_chance / safe_total
            diff_chance = diff_chance / safe_total
            is_spec = (total > 0) & (u_r < spec_chance)
            is_diff = (total > 0) & jnp.logical_not(is_spec) & (diff_chance > 0)

            d_dot_n = (rd[0:1, :] * n[0:1, :] + rd[1:2, :] * n[1:2, :]
                       + rd[2:3, :] * n[2:3, :])
            refl = rd - (2.0 * d_dot_n) * n
            axis = jnp.where(is_spec, refl, n)
            alpha = jnp.exp2(smooth * smooth * jnp.float32(np.log2(1000.0)))
            cos_t = jnp.exp2(log2_u1 / jnp.where(is_spec, alpha + 1.0, 2.0))
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

            # Branchless Frisvad/Pixar orthonormal frame — mirrors
            # ops/sampling.py:tangent_frame op-for-op (same MC streams as
            # the XLA bounce loop); replaces the helper-axis double-cross
            # (~14 fewer row ops; frame-time neutral on the bench scene —
            # see the sampling.py docstring for the measurement).
            ax0, ax1, ax2 = axis[0:1, :], axis[1:2, :], axis[2:3, :]
            s_ = jnp.where(ax2 >= 0.0, 1.0, -1.0)
            a_ = -1.0 / (s_ + ax2)
            b_ = ax0 * ax1 * a_
            tang = jnp.concatenate(
                [1.0 + s_ * ax0 * ax0 * a_, s_ * b_, -s_ * ax0], axis=0)
            binorm = jnp.concatenate(
                [b_, s_ + ax1 * ax1 * a_, -ax1], axis=0)
            new_dir = (tang * (cos_phi * sin_t) + binorm * (sin_phi * sin_t)
                       + axis * cos_t)
            f = (alpha + 2.0) / (alpha + 1.0)
            nd = (n[0:1, :] * new_dir[0:1, :] + n[1:2, :] * new_dir[1:2, :]
                  + n[2:3, :] * new_dir[2:3, :])
            w_spec_s = jnp.clip(nd * f, 0.0, 1.0) \
                / jnp.maximum(spec_chance, 1e-8)
            lobe = jnp.where(is_spec, spec * w_spec_s,
                             jnp.where(is_diff,
                                       albedo / jnp.maximum(diff_chance, 1e-8),
                                       0.0))
            pos = ro + t * rd
            contrib = jnp.where(missed, 0.0, energy * emis)
            new_energy = jnp.where(missed, 0.0, energy * lobe)
            new_ro = jnp.where(missed, ro, pos + n * 0.001)
            new_dir = jnp.where(missed, rd, new_dir)

        record = missed & alive_b
        # Radiance/energy/ray updates need no alive gating: a dead ray reached
        # shade with t = F32_MAX => missed, zero contrib/energy, ray preserved.
        ST[24:27, :] = ST[24:27, :] + contrib
        ST[32:35, :] = jnp.where(record, energy, ST[32:35, :])
        ST[40:43, :] = jnp.where(record, rd, ST[40:43, :])
        ST[0:3, :] = new_ro
        ST[8:11, :] = new_dir

        energy = new_energy
        alive_new = (alive_b & jnp.logical_not(missed)
                     & ((energy[0:1, :] > 0) | (energy[1:2, :] > 0)
                        | (energy[2:3, :] > 0)))

        if use_rr:
            # Unbiased Russian roulette from bounce 3 (render.py bounce loop).
            do_rr = (bg >= 2) & (bg < bounces - 1)
            u_rr = urows[4:5, :]
            p_surv = jnp.clip(jnp.maximum(jnp.maximum(energy[0:1, :],
                                                      energy[1:2, :]),
                                          energy[2:3, :]), 0.05, 1.0)
            keep = u_rr < p_surv
            boost = jnp.where(keep, 1.0 / p_surv, 0.0)
            rr_scale = jnp.where(do_rr, boost, 1.0)
            energy = energy * rr_scale
            alive_new = alive_new & (keep | jnp.logical_not(do_rr))

        ST[16:19, :] = energy
        ST[48:49, :] = alive_new.astype(jnp.float32)

        # Outputs: rewritten every bounce of the step; the last-bounce values
        # are what lands in HBM (the out block index is constant in b).
        for refs, r0 in (((rad0_ref, rad1_ref, rad2_ref), 24),
                         ((se0_ref, se1_ref, se2_ref), 32),
                         ((sd0_ref, sd1_ref, sd2_ref), 40)):
            for k, ref in enumerate(refs):
                ref[0, 0:1, :] = ST[r0 + k:r0 + k + 1, :]
        if emit_state:
            # Packed hand-off state for the bounce-split driver: one
            # (16, B) block per step -> a single cheap trailing-axis gather
            # moves the whole surviving-ray state to the compact buffer.
            st_ref[0, 0:3, :] = ST[0:3, :]        # ro
            st_ref[0, 3:6, :] = ST[8:11, :]       # rd
            st_ref[0, 6:9, :] = ST[16:19, :]      # energy (post-RR)
            st_ref[0, 9:10, :] = ST[48:49, :]     # alive
            st_ref[0, 10:16, :] = jnp.zeros((6, B), jnp.float32)


def path_trace(pa, ro, rd, uni, cfg, interpret: bool, *, b0: int = 0,
               nb: int = None, energy0=None, alive0=None,
               emit_state: bool = False):
    """Trace + shade path bounces [b0, b0+nb) for all rays in one
    pallas_call.

    ro/rd: Vec3 tuples of (N,) rays (block order). ``uni``: the uniform
    rows in the same ray order — (roulette, log2(u1), cos(2*pi*u2),
    sin(2*pi*u2), rr) for the LOCAL bounce range — as EITHER a (nb, 5, N)
    array (bounce-split driver: sliceable/gatherable) OR a list of nb
    5-row lists of (N,) arrays, which XLA assembles straight into the
    kernel block layout with ONE stack (no (nb,5,N) intermediate, no pad
    op, no 530 MB transpose — measured 35.8 -> 28.5 ms for the whole
    uniform pipeline at 1080p x 8 bounces). ``energy0``/``alive0``:
    optional (N,) initial throughput / liveness (bounce-split resume state;
    default fresh paths). Returns (radiance, sky_energy, sky_dir): three
    Vec3 tuples of (N,) — plus, when ``emit_state``, a (16, N) packed
    resume state (rows 0-2 ro, 3-5 rd, 6-8 energy, 9 alive).
    """
    N = ro[0].shape[0]
    B = pt.BLOCK
    bounces = cfg.bounces
    nb = bounces if nb is None else nb
    pad = (-N) % B
    if alive0 is None:
        alive0 = jnp.ones((N,), jnp.float32)
    if energy0 is None:
        energy0 = tuple(jnp.ones((N,), jnp.float32) for _ in range(3))
    rows_form = isinstance(uni, (list, tuple))
    steps_form = (not rows_form) and uni.ndim == 4
    if pad:
        zpad = jnp.zeros((pad,), jnp.float32)
        ro = tuple(jnp.concatenate([c, zpad]) for c in ro)
        rd = (jnp.concatenate([rd[0], zpad]),
              jnp.concatenate([rd[1], zpad - 1.0]),
              jnp.concatenate([rd[2], zpad]))
        alive0 = jnp.concatenate([alive0, zpad])
        energy0 = tuple(jnp.concatenate([c, zpad]) for c in energy0)
        if not rows_form:
            assert not steps_form, "steps-form uni requires N % BLOCK == 0"
            uni = jnp.concatenate(
                [uni, jnp.zeros((nb, 5, pad), jnp.float32)], axis=2)
    Np = N + pad
    n_steps = Np // B

    def comp(a):
        return a.reshape(n_steps, 1, B)

    ray_in = [comp(c) for c in (*ro, *rd, alive0, *energy0)]
    # (n_steps, nb, 8, B): one 8-row block per (step, bounce), rows 0-4
    # live, 5-7 pad (sublane dim must be % 8). The index map varies in b so
    # Pallas streams each bounce's rows and the kernel reads STATIC offsets
    # — the round-3/4 relayout attempts (one fetch per step + in-kernel
    # dynamic slice) either failed Mosaic alignment (5*b) or measured an
    # ~8 ms/frame LOSS (8-aligned ds8(8, b, 8)); see the kernel comment.
    if steps_form:
        # Pre-assembled kernel layout (render_sample_mega's batched
        # pixel-order path: one stack + ONE fused block transpose instead
        # of a per-row to_blocks transpose each).
        assert uni.shape == (n_steps, nb, 8, B), uni.shape
        uni_steps = uni
    elif rows_form:
        # Rows arrive unstacked: assemble the kernel layout with ONE stack
        # so XLA writes the buffer once (no (nb, 5, N) intermediate, no pad
        # op, no transpose — the uniform pipeline measured 35.8 -> 28.5 ms
        # standalone at 1080p x 8 bounces).
        assert len(uni) == nb and all(len(r) == 5 for r in uni)
        z = jnp.zeros((n_steps, B), jnp.float32)
        cols = []
        for rows in uni:
            for r in rows:
                if pad:
                    r = jnp.concatenate([r, jnp.zeros((pad,), jnp.float32)])
                cols.append(r.reshape(n_steps, B))
            cols += [z, z, z]
        uni_steps = jnp.stack(cols, axis=1).reshape(n_steps, nb, 8, B)
    else:
        uni_steps = jnp.transpose(
            jnp.pad(uni, ((0, 0), (0, 3), (0, 0))).reshape(nb, 8, Np // B, B),
            (2, 0, 1, 3))

    ray_spec = pl.BlockSpec((1, 1, B), lambda i, b: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    uni_spec = pl.BlockSpec((1, 1, 8, B), lambda i, b: (i, b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, B), lambda i, b: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    lo, hi = cfg.ray_bin_bounces
    if lo is None or hi is None:
        # Mixed (1, None)-style configs mean "binning disabled", matching
        # the bounce loop's predicate in render.py:render_sample.
        lo = hi = None
    kernel = functools.partial(
        _path_kernel, pa.n_pages, bounces, b0, emit_state, lo, hi,
        cfg.russian_roulette, pa.bbox, pa.geom, pa.n_spheres, pa.order_ax,
        pa.trav, pa.bin_scheme, pa.chan_mode, pa.page_axes)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=pt.scoped_vmem_limit(pa))
    out_shape = [jax.ShapeDtypeStruct((n_steps, 1, B), jnp.float32)
                 for _ in range(9)]
    out_specs = [out_spec] * 9
    if emit_state:
        out_shape.append(jax.ShapeDtypeStruct((n_steps, 16, B), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 16, B), lambda i, b: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps, nb),
        in_specs=[ray_spec] * 10 + [uni_spec]
        + [full()] * (6 + 7 + 6 + 6 + 3),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((pt.SROWS, B), jnp.float32),
                        pltpu.VMEM((56, B), jnp.float32),
                        pltpu.VMEM((8, B), jnp.float32),
                        pltpu.VMEM((B, B), jnp.bfloat16),
                        pltpu.VMEM((16, B), jnp.float32),
                        pltpu.SMEM((2 * max(pt.SLOT_EPI, 1),), jnp.int32)],
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*ray_in, uni_steps, *pa.gs, *pa.pgb, pa.pgaxd, *pa.cl_cols,
      *pa.cb_rows, pa.epluck, pa.eplane, pa.chan)

    flat = tuple(o.reshape(Np)[:N] for o in outs[0:9])
    ret = (flat[0:3], flat[3:6], flat[6:9])
    if emit_state:
        state = jnp.transpose(outs[9], (1, 0, 2)).reshape(16, Np)[:, :N]
        return ret + (state,)
    return ret
