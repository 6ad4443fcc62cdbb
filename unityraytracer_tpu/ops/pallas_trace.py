"""Fused Pallas TPU kernel for closest-hit triangle tracing.

This is the TPU-native descendant of the reference's HLSL megakernel
(CSMain + Trace + IntersectMeshBVH + IntersectTriangle_MT97,
RayTraceShader.compute:199-383). Design, mapped to the hardware:

* **Transposed outer-product intersection.** Each grid step owns a tile of
  ``TILE = 128`` rays living in the LANE dimension: every ray SoA component
  is a dense (1, 128) row window of an (n_tiles, 128) array — zero layout
  padding and unit-stride DMA. A *cluster* is 128 Morton-adjacent triangles;
  its SoA rows are loaded and transposed in-kernel to (128, 1) columns, so
  broadcasting column x row yields dense (128 triangles, 128 rays)
  Moller-Trumbore on full-width VPU registers — no gathers, no per-ray
  divergence. (The mirror orientation — rays as (N, 1) sublane columns —
  forces XLA to materialize 128x-padded gigabyte operand buffers; measured
  66 ms/frame of pure layout traffic on v5e.)

* **Two-level culling with bitmask scalarization.** TPU lanes cannot branch
  per ray, but the tile can skip whole clusters via scalar predicates. Level
  1: one (pages, rays) slab test of the tile against all *page* AABBs (a
  page = 128 clusters). Level 2: per hit page, a (clusters, rays) slab test
  pruned by each ray's current best hit. Per-box verdicts are reduced over
  rays and packed into int32 bitmask scalars (Mosaic cannot read a dynamic
  lane/sublane, but a reduce-with-shifted-iota packs bits into a scalar);
  a count-trailing-zeros while_loop then visits exactly the set bits and
  runs the triangle pass under ``pl.when``. This replaces the reference's
  per-thread traversal stack (compute:294-326) with tile-coherent work
  skipping.

* **One min-reduce picks the winner.** Positive f32 order survives an int32
  view, so the triangle index is packed into the low 7 mantissa bits of t
  (<= 1.5e-5 relative perturbation); a single min over the triangle axis
  returns both the nearest hit and who produced it. Barycentrics are
  recomputed outside the kernel from the winning triangle id, where XLA
  gathers are cheap.

* **Padding is self-correcting.** Padded triangles are all-zero (det == 0 is
  rejected by the same test the reference uses, compute:211) and padded
  clusters carry far-away point boxes, so a culling false positive costs
  only wasted work, never wrong results.

Spheres and the ground plane are composed outside the kernel (XLA handles
those tiny dense candidates well).

Mosaic layout rules that shaped this file (probed on v5e): dynamic indices
are legal only in the sublane dimension; (N, 1)-shaped pallas operands get
128x lane padding; sublane<->lane reshapes are unsupported in-kernel but
(1, 128) -> (128, 1) transposes are supported.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene, Triangles
from ..utils.math3d import INF
from .bvh import ClusterAccel
from .shade import Hit
from .trace import _ground_candidate, _sphere_candidate, combine_candidates

TILE = 128          # rays per culling tile (= lane width)
ROWS = 8            # ray tiles per grid step (sublane dim % 8; 16 = no gain)
BLOCK = ROWS * TILE  # rays per grid step
KSIZE = 128         # triangles per kernel cluster (sublane block; 256 measured 12% slower)
PAGE = 128          # clusters per page
MAX_PAGES = 128     # single page-level block => up to 128*128*128 = 2M tris

NCHAN = 24          # packed per-triangle attribute rows (19 used, 8-aligned)

# Triangle-test numeric backend. The TPU MXU truncates f32 operands to bf16
# at DEFAULT precision, which moved 1.3% of primary-hit t values by >1e-3
# relative (up to 73%) on the bench scene — caught by bench.py's oracle-RMSE
# gate. Exactness is recovered per quantity at measured cost:
#   "vpu"          — plane (t) AND edge tests as exact-f32 VPU outer-product
#                    FMAs from per-triangle constant columns; no geometry
#                    MXU work at all.
#   "hybrid"       — exact VPU plane (t drives winner selection, hit
#                    positions and bounce origins, so it must be f32); edge
#                    tests stay one-pass MXU bf16 (sign decisions only flip
#                    within ~0.4% of an edge — silhouette-class noise).
#   "mxu_highest"  — everything on the MXU at 6-pass f32 emulation.
# Measured on v5e (1080p/100k-tri/8-bounce frame, bf16-broken baseline
# 485 ms): mxu_highest 697 ms (exact, oracle RMSE 2.6e-7), vpu 1049 ms
# (exact; per-pass transposes dominate), hybrid 632 ms (REJECTED: bf16 edge
# tests wrongly accept near-edge closer triangles — 60/18k rays off by up to
# 56% t, oracle RMSE 2e-2). Mosaic does not implement Precision.HIGH, so a
# 3-pass middle ground is unavailable.
GEOM_MODE = "mxu_highest"

_F32_MAX = 3.0e38
_PAD_BOX = 1.0e30   # far-away point box for padded clusters/pages


def _col(row):
    """(1, 128) row -> (128, 1) column (Mosaic-supported transpose)."""
    return jnp.transpose(row)


def _outer_aabb(ro, inv, bmin_cols, bmax_cols, best_t_row):
    """(boxes, rays) slab test: box-bound columns vs per-ray rows.

    ro/inv: 3-tuples of (1, TILE); bmin_cols/bmax_cols: 3-tuples of (B, 1).
    Returns (B, TILE) bool: hit AND entry distance < that ray's best hit.
    """
    B = bmin_cols[0].shape[0]
    tmin = jnp.full((B, TILE), -_F32_MAX, jnp.float32)
    tmax = jnp.full((B, TILE), _F32_MAX, jnp.float32)
    for a in range(3):
        t1 = (bmin_cols[a] - ro[a]) * inv[a]   # (B, TILE)
        t2 = (bmax_cols[a] - ro[a]) * inv[a]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return (tmax >= tmin) & (tmax > 0) & (jnp.maximum(tmin, 0.0) < best_t_row)


def _pack_flags_col(flags_col, sub):
    """(128, 1) bool column -> four int32 bitmask scalars."""
    words = []
    for w in range(4):
        in_word = (sub >= w * 32) & (sub < (w + 1) * 32)
        shifted = jnp.left_shift(jnp.int32(1), jnp.bitwise_and(sub, 31))
        words.append(jnp.sum(jnp.where(in_word & flags_col, shifted, 0)))
    return words


def _for_set_bits(word, fn):
    """Run ``fn(bit_index)`` for every set bit of an int32 scalar.

    Trip count equals the popcount — the skip path costs nothing. ctz is
    log2 of the isolated lowest bit, exact for all powers of two in f32
    (|float| handles bit 31's two's-complement sign).
    """
    def cond(w):
        return w != 0

    def body(w):
        low = jnp.bitwise_and(w, jnp.int32(0) - w)   # lowest set bit
        dc = jnp.round(jnp.log2(jnp.abs(low.astype(jnp.float32)))).astype(jnp.int32)
        fn(dc)
        return jnp.bitwise_xor(w, low)

    jax.lax.while_loop(cond, body, word)


NBINS = 72          # 8 direction octants x 8 origin cells + dead bin (pad 72)


def _split3(x):
    """Exact 3-way bf16 decomposition: x == h1 + h2 + h3, each term exactly
    representable in bfloat16 (f32's 24 mantissa bits = 3 x 8)."""
    h1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    h3 = r1 - h2
    return h1, h2, h3


def _permute_exact(M, P, p_dim: int):
    """EXACT f32 permutation of M's lanes by one-hot matrix P on the MXU.

    The MXU's default precision truncates operands to bf16 — but a one-hot
    matmul only ever copies single values, so feeding it the three exact
    bf16 splits of M (and P's exact 0/1 entries) reconstructs the f32
    permutation exactly in three one-pass matmuls. ``p_dim`` selects which
    index of P the lanes contract with: 0 applies the permutation, 1 applies
    its inverse (P is orthogonal).
    """
    dims = (((1,), (p_dim,)), ((), ()))
    out = None
    for h in _split3(M):
        p = jax.lax.dot_general(h, P, dims,
                                preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    return out


def _ray_bin_ids(rox, roy, roz, rdx, rdy, rdz, seed, bbox):
    """(1, B) int32 coherence bin per ray; dead rays -> last bin.

    Key = direction octant (major: rays in one octant sweep the scene in the
    same order) x one origin-cell bit per axis around the scene center
    (minor: adjacent bins are spatially adjacent, so a 128-ray tile that
    straddles two bins still holds nearby rays). Dead rays (zero seed) group
    last — whole tiles of them skip every culling and triangle pass (perfect
    wavefront compaction at tile granularity). ``bbox`` is the static scene
    bounding box baked at accel-prep time.
    """
    cx = 0.5 * (bbox[0] + bbox[3])
    cy = 0.5 * (bbox[1] + bbox[4])
    cz = 0.5 * (bbox[2] + bbox[5])
    oct_ = ((rdx > 0).astype(jnp.int32)
            + 2 * (rdy > 0).astype(jnp.int32)
            + 4 * (rdz > 0).astype(jnp.int32))
    cell = ((rox > cx).astype(jnp.int32)
            + 2 * (roy > cy).astype(jnp.int32)
            + 4 * (roz > cz).astype(jnp.int32))
    return jnp.where(seed > 0, oct_ * 8 + cell, NBINS - 1)


def _bin_destinations(bin_id):
    """Stable counting sort by bin: (1, B) int32 -> (1, B) int32 positions.

    One-hot bin matrix (NBINS, B) + Hillis-Steele prefix sums along lanes
    (rank within bin) and along sublanes (bin offsets). All arithmetic in
    f32 on integer values < B — exact.
    """
    B = bin_id.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (NBINS, B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NBINS, B), 1)
    m = (bin_id == sub).astype(jnp.float32)             # (NBINS, B) one-hot
    pref = m
    sh = 1
    while sh < B:
        rolled = pltpu.roll(pref, sh, axis=1)
        pref = pref + jnp.where(lane >= sh, rolled, 0.0)
        sh *= 2
    excl = pref - m                                     # rank within bin
    totals = jnp.sum(m, axis=1, keepdims=True)          # (NBINS, 1)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (NBINS, 1), 0)
    run = totals
    sh = 1
    while sh < NBINS:
        rolled = pltpu.roll(run, sh, axis=0)
        run = run + jnp.where(sub1 >= sh, rolled, 0.0)
        sh *= 2
    offs = run - totals                                 # exclusive bin offset
    d = jnp.sum(m * (excl + offs), axis=0, keepdims=True)
    return d.astype(jnp.int32)


def _perm_matrix(d):
    """(1, B) destinations -> (B, B) one-hot P with P[i, j] = (d[i] == j),
    so ``ins @ P`` places source lane i at destination lane d[i]."""
    B = d.shape[1]
    d_col = jnp.transpose(d)                            # (B, 1) int32
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    return (d_col == j_iota).astype(jnp.float32)


def _trace_kernel(n_pages: int, bin_rays: bool, bbox,
                  rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                  seed_ref,
                  pgb_ref,
                  cxmin_ref, cymin_ref, czmin_ref,
                  cxmax_ref, cymax_ref, czmax_ref,
                  epl_ref, epn_ref, chan_ref,
                  out_t_ref, *out_chans_and_scratch):
    # Ray I/O is (1, BLOCK)-wide rows (rays purely in the lane dimension):
    # out_chans: 13 (1, BLOCK) f32 refs — nx, ny, nz, albedo rgb,
    # specular rgb, emission rgb, smoothness — plus a trailing (16, BLOCK)
    # VMEM scratch that holds [t, 13 channels] during tracing. Shading data
    # is resolved IN-KERNEL because XLA's per-ray gathers run serially
    # (~22 ns/element on v5e): the winner `pick` matrix is one-hot per ray
    # column, so one MXU matmul of the cluster's packed (NCHAN, 128-triangle)
    # attribute block against pick selects every winner's attributes at once.
    #
    # seed_ref carries each ray's best NON-triangle hit distance (ground /
    # sphere candidates, computed cheaply in XLA before the kernel): best-t
    # starts there instead of F32_MAX, so page- AND cluster-level culling
    # immediately discard every box behind the ground plane — most downward
    # bounce rays skip all triangle work. Dead rays arrive with seed 0, which
    # fails every `tmin < best_t` test: a fully-dead tile runs only the page
    # slab test (the TPU form of wavefront ray-queue compaction, replacing the
    # reference's per-thread early-out at compute:457-460). A triangle wins
    # only by strictly beating its ray's seed; the caller maps "t == seed"
    # back to a triangle miss.
    #
    # With ``bin_rays`` (incoherent bounces), the step's BLOCK rays are
    # counting-sorted by direction octant (dead rays last) and traced in that
    # order, then the outputs are unpermuted — every 128-ray tile becomes
    # direction-coherent, so tile-level culling stops paying for 128 rays'
    # worth of clusters when only a few rays need each. Permutation rides the
    # MXU as an exact one-hot matmul (see _permute_exact); results are
    # bit-identical to the unbinned kernel.
    out_chans = out_chans_and_scratch[:-1]
    S = out_chans_and_scratch[-1]            # (16, BLOCK) scratch

    ins = jnp.concatenate(
        [rox_ref[0], roy_ref[0], roz_ref[0],
         rdx_ref[0], rdy_ref[0], rdz_ref[0], seed_ref[0],
         jnp.zeros((1, BLOCK), jnp.float32)], axis=0)    # (8, BLOCK)
    if bin_rays:
        bins = _ray_bin_ids(ins[0:1, :], ins[1:2, :], ins[2:3, :],
                            ins[3:4, :], ins[4:5, :], ins[5:6, :],
                            ins[6:7, :], bbox)
        P = _perm_matrix(_bin_destinations(bins))
        A = _permute_exact(ins, P, 0)
    else:
        P = None
        A = ins

    S[:] = jnp.concatenate([A[6:7, :], jnp.zeros((15, BLOCK), jnp.float32)],
                           axis=0)           # row 0 = best_t (seed-init)

    sub_col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    sub_mat = jax.lax.broadcasted_iota(jnp.int32, (KSIZE, TILE), 0)
    LANE_MASK = jnp.int32(KSIZE - 1)        # low 7 bits carry the sublane id

    def row_body(r):
        """Trace one 128-ray lane block of the (1, BLOCK) step."""
        ls = slice(r * TILE, (r + 1) * TILE)  # static 128-aligned lane slice
        rox, roy, roz = A[0:1, ls], A[1:2, ls], A[2:3, ls]
        rdx, rdy, rdz = A[3:4, ls], A[4:5, ls], A[5:6, ls]
        ro = (rox, roy, roz)
        rd = (rdx, rdy, rdz)

        def safe_inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                   jnp.where(d < 0, -1e-12, 1e-12), d)

        inv = tuple(safe_inv(d) for d in rd)

        # Per-ray Pluecker coordinates + homogeneous forms, built once per
        # row: the triangle test contracts per-triangle coefficient blocks
        # against these on the MXU (see cluster_pass).
        zero_row = jnp.zeros((1, TILE), jnp.float32)
        mx = roy * rdz - roz * rdy           # m = o x d
        my = roz * rdx - rox * rdz
        mz = rox * rdy - roy * rdx
        P8 = jnp.concatenate([rdx, rdy, rdz, mx, my, mz,
                              zero_row, zero_row], axis=0)        # (8, TILE)
        O4 = jnp.concatenate([-rox, -roy, -roz, zero_row - 1.0,
                              zero_row, zero_row, zero_row, zero_row], axis=0)
        D4 = jnp.concatenate([rdx, rdy, rdz] + [zero_row] * 5, axis=0)

        def best_t():
            return S[0:1, ls]

        def cluster_pass(c):
            """Dense (tris, rays) Pluecker test for cluster c + best update.

            Edge-side values are one MXU contraction of the cluster's packed
            (8, 3*KSIZE) edge-coefficient block against the per-ray Pluecker
            vectors; the plane distance is two more (8, KSIZE) contractions.
            Replaces a ~45-op VPU Moller-Trumbore with ~16 VPU ops + three
            small matmuls (math validated against MT97: front face iff
            n.d < -eps, inside iff all edge values <= 0, u = e20/sum,
            v = e01/sum).
            """
            eblk = epl_ref[pl.ds(pl.multiple_of(c * 8, 8), 8), :]  # (8, 3K)
            pblk = epn_ref[pl.ds(pl.multiple_of(c * 8, 8), 8), :]  # (8, K)

            def row_col(blk, r, lane0=0, width=KSIZE):
                # (1, width) row slice of a VMEM block -> (width, 1) column
                # (the only Mosaic-supported in-kernel transpose shape).
                return _col(blk[r:r + 1, lane0:lane0 + width])

            if GEOM_MODE in ("vpu", "hybrid"):
                # Exact f32 plane: t_num = -(n.o + dp), t_den = n.d as
                # broadcast outer products of per-triangle constant columns
                # against per-ray rows — no MXU rounding on the quantity
                # that drives winner selection and hit positions.
                nx, ny, nz = (row_col(pblk, r) for r in range(3))
                dpc = row_col(pblk, 3)
                t_num = -(nx * rox + ny * roy + nz * roz + dpc)  # (K, rays)
                t_den = nx * rdx + ny * rdy + nz * rdz
            else:
                prec = (jax.lax.Precision.HIGHEST
                        if GEOM_MODE == "mxu_highest"
                        else jax.lax.Precision.HIGH)
                t_num = jax.lax.dot_general(
                    pblk, O4, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)          # (K, rays)
                t_den = jax.lax.dot_general(
                    pblk, D4, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)

            if GEOM_MODE == "vpu":
                # Exact f32 edge tests: e = mom.d + dir.(o x d) per edge.
                m_rows = (mx, my, mz)
                d_rows = (rdx, rdy, rdz)
                es = []
                for k in range(3):
                    e = jnp.zeros((KSIZE, TILE), jnp.float32)
                    for ax in range(3):
                        e += row_col(eblk, ax, k * KSIZE) * d_rows[ax]
                        e += row_col(eblk, 3 + ax, k * KSIZE) * m_rows[ax]
                    es.append(e)
                e01, e12, e20 = es
            else:
                prec = (jax.lax.Precision.DEFAULT if GEOM_MODE == "hybrid"
                        else jax.lax.Precision.HIGHEST
                        if GEOM_MODE == "mxu_highest"
                        else jax.lax.Precision.HIGH)
                e_all = jax.lax.dot_general(
                    eblk, P8, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)          # (3K, rays)
                e01 = e_all[0:KSIZE, :]
                e12 = e_all[KSIZE:2 * KSIZE, :]
                e20 = e_all[2 * KSIZE:3 * KSIZE, :]
            front = t_den <= -1e-8               # == MT97 det >= 1e-8
            t = t_num * (1.0 / jnp.where(front, t_den, 1.0))
            ok = (front & (e01 <= 0.0) & (e12 <= 0.0) & (e20 <= 0.0)
                  & (t > 0.0) & (t < best_t()))
            t_bits = jax.lax.bitcast_convert_type(jnp.where(ok, t, _F32_MAX),
                                                  jnp.int32)
            key = jnp.bitwise_or(jnp.bitwise_and(t_bits, ~LANE_MASK), sub_mat)
            win_key = jnp.min(key, axis=0, keepdims=True)      # (1, rays)
            t_win = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(win_key, ~LANE_MASK), jnp.float32)
            # Guard against the all-miss column: clearing the lane bits makes
            # the F32_MAX sentinel compare as slightly LESS than a fresh
            # sentinel, which would let garbage attribute sums through.
            closer = (t_win < best_t()) & (t_win < _F32_MAX * 0.25)

            # Winner attribute selection — only when some ray improved
            # (incoherent passes often test clusters that win nothing; the
            # scalar skip saves the matmul + selects). pick is one-hot over
            # triangles for every ray column (lane bits make keys unique), so
            # a single MXU matmul of the packed per-cluster attribute block
            # (NCHAN, tris) against pick (tris, rays) yields each winner's
            # attributes.
            @pl.when(jnp.any(closer))
            def _():
                pick = (key == win_key).astype(jnp.float32)    # (tris, rays)
                chan = chan_ref[pl.ds(pl.multiple_of(c * NCHAN, 8), NCHAN), :]
                # HIGHEST: default MXU precision would truncate the selected
                # normals/materials to bf16 (pick itself is exact 0/1).
                sel = jnp.dot(chan, pick,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)  # (NCHAN, rays)
                # Exact t and barycentrics of the winner (removes the key
                # truncation): one masked reduce each. Barycentrics from the
                # edge values: u = e20/sum, v = e01/sum.
                ssum = e01 + e12 + e20
                inv_s = 1.0 / jnp.where(jnp.abs(ssum) > 1e-30, ssum, 1.0)
                t_sel = jnp.sum(jnp.where(pick > 0, t, 0.0), axis=0,
                                keepdims=True)
                u_sel = jnp.sum(jnp.where(pick > 0, e20 * inv_s, 0.0), axis=0,
                                keepdims=True)
                v_sel = jnp.sum(jnp.where(pick > 0, e01 * inv_s, 0.0), axis=0,
                                keepdims=True)
                w_sel = 1.0 - u_sel - v_sel
                # Smooth normal: barycentric blend of the winner's vertex
                # normals (channels 0-8 are n0/n1/n2 xyz), normalized.
                nx = (sel[0:1, :] * w_sel + sel[3:4, :] * u_sel
                      + sel[6:7, :] * v_sel)
                ny = (sel[1:2, :] * w_sel + sel[4:5, :] * u_sel
                      + sel[7:8, :] * v_sel)
                nz = (sel[2:3, :] * w_sel + sel[5:6, :] * u_sel
                      + sel[8:9, :] * v_sel)
                inv_len = jax.lax.rsqrt(
                    jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
                new_vals = (nx * inv_len, ny * inv_len, nz * inv_len,
                            sel[9:10, :], sel[10:11, :], sel[11:12, :],
                            sel[12:13, :], sel[13:14, :], sel[14:15, :],
                            sel[15:16, :], sel[16:17, :], sel[17:18, :],
                            sel[18:19, :])
                for oc_i, val in enumerate(new_vals):
                    S[1 + oc_i:2 + oc_i, ls] = jnp.where(
                        closer, val, S[1 + oc_i:2 + oc_i, ls])
                S[0:1, ls] = jnp.where(closer, t_sel, S[0:1, ls])

        def page_pass(g):
            """Cluster-level culling for page g, then triangle passes."""
            bmin = tuple(_col(cref[g, :].reshape(1, PAGE))
                         for cref in (cxmin_ref, cymin_ref, czmin_ref))
            bmax = tuple(_col(cref[g, :].reshape(1, PAGE))
                         for cref in (cxmax_ref, cymax_ref, czmax_ref))
            cl_hit = _outer_aabb(ro, inv, bmin, bmax, best_t())  # (128, TILE)
            flags = jnp.any(cl_hit, axis=1, keepdims=True)        # (128, 1)
            words = _pack_flags_col(flags, sub_col)
            for w in range(4):
                _for_set_bits(
                    words[w],
                    lambda dc, w=w: cluster_pass(g * PAGE + w * 32 + dc))

        # Page-level culling: one (pages, rays) block over all page AABBs,
        # pruned by the seeded best-t (ground/sphere hits and dead rays
        # eliminate pages before any cluster work happens).
        pg_bmin = tuple(_col(pgb_ref[a, :].reshape(1, MAX_PAGES))
                        for a in range(3))
        pg_bmax = tuple(_col(pgb_ref[3 + a, :].reshape(1, MAX_PAGES))
                        for a in range(3))
        pg_hit = _outer_aabb(ro, inv, pg_bmin, pg_bmax, best_t())
        pg_flags = jnp.any(pg_hit, axis=1, keepdims=True)
        pg_words = _pack_flags_col(pg_flags, sub_col)
        for w in range(4):
            if w * 32 >= n_pages:
                break
            _for_set_bits(pg_words[w], lambda dg, w=w: page_pass(w * 32 + dg))

    for r in range(ROWS):
        row_body(r)

    OUT = S[:]                               # (16, BLOCK)
    if bin_rays:
        OUT = _permute_exact(OUT, P, 1)      # inverse: back to ray order
    out_t_ref[0] = OUT[0:1, :]
    for c, oc in enumerate(out_chans):
        oc[0] = OUT[1 + c:2 + c, :]


@struct.dataclass
class PallasAccel:
    """Kernel-ready geometry, prepared host-side once per scene build.

    The kernel uses its own cluster granularity (KSIZE = 128 Morton-adjacent
    triangles, independent of cfg.cluster_size) because lane width dictates
    the efficient batch.
    """

    pgb: jnp.ndarray                 # (8, MAX_PAGES) page bounds rows
    cl_cols: Tuple[jnp.ndarray, ...]  # 6 x (G, PAGE) cluster bounds
    epluck: jnp.ndarray              # (Cp*8, 3*KSIZE) edge Pluecker coeffs:
                                     # rows 0-5 = (moment xyz, dir xyz) for
                                     # edges v0v1 | v1v2 | v2v0 (lane-major)
    eplane: jnp.ndarray              # (Cp*8, KSIZE): rows 0-3 = (n xyz, dp)
    chan: jnp.ndarray                # (Cp*NCHAN, KSIZE) packed attributes:
                                     # n0/n1/n2 xyz, albedo, specular,
                                     # emission, smoothness (19 rows + pad)
    n_pages: int = struct.field(pytree_node=False, default=1)
    # Static scene bounds (xmin, ymin, zmin, xmax, ymax, zmax): the binning
    # origin-cell key quantizes against these (baked at prep, not traced).
    bbox: Tuple[float, ...] = struct.field(
        pytree_node=False, default=(0., 0., 0., 1., 1., 1.))


def prepare_pallas_accel(accel: ClusterAccel, materials=None) -> PallasAccel:
    """Regroup a ClusterAccel into kernel geometry (host-side, not jittable).

    ``materials``: the scene Materials table; per-triangle shading attributes
    are baked into the packed channel block so the kernel can output complete
    hit records without any XLA-side gathers.
    """
    tr = accel.triangles
    v0 = np.asarray(tr.v0)
    v1 = np.asarray(tr.v1)
    v2 = np.asarray(tr.v2)
    T = len(v0)

    C = max((T + KSIZE - 1) // KSIZE, 1)
    Cp = ((C + PAGE - 1) // PAGE) * PAGE
    G = Cp // PAGE
    if G > MAX_PAGES:
        raise ValueError(
            f"scene too large for single-block page culling: {G} pages "
            f"(max {MAX_PAGES}, ~2M triangles); shard the scene")
    Tp = Cp * KSIZE

    def pad(a):
        out = np.zeros((Tp,) + a.shape[1:], a.dtype)
        out[:T] = a
        return out

    v0p, v1p, v2p = pad(v0), pad(v1), pad(v2)
    e1 = v1p - v0p
    e2 = v2p - v0p

    # Cluster AABBs over real members only.
    mmin = np.minimum(np.minimum(v0p, v1p), v2p).reshape(Cp, KSIZE, 3)
    mmax = np.maximum(np.maximum(v0p, v1p), v2p).reshape(Cp, KSIZE, 3)
    real = (np.arange(Tp) < T).reshape(Cp, KSIZE, 1)
    cvmin = np.where(real, mmin, np.inf).min(axis=1)
    cvmax = np.where(real, mmax, -np.inf).max(axis=1)
    has_real = real.any(axis=1)[:, 0]
    cvmin = np.where(has_real[:, None], cvmin, _PAD_BOX).astype(np.float32)
    cvmax = np.where(has_real[:, None], cvmax, _PAD_BOX).astype(np.float32)

    # Page AABBs.
    pvmin = np.where(has_real.reshape(G, PAGE, 1),
                     cvmin.reshape(G, PAGE, 3), np.inf).min(axis=1)
    pvmax = np.where(has_real.reshape(G, PAGE, 1),
                     cvmax.reshape(G, PAGE, 3), -np.inf).max(axis=1)
    page_real = has_real.reshape(G, PAGE).any(axis=1)
    pvmin = np.where(page_real[:, None], pvmin, _PAD_BOX)
    pvmax = np.where(page_real[:, None], pvmax, _PAD_BOX)
    pgb = np.full((8, MAX_PAGES), _PAD_BOX, np.float32)
    pgb[0:3, :G] = pvmin.T
    pgb[3:6, :G] = pvmax.T

    cl_cols = tuple(np.ascontiguousarray(cvmin[:, k].reshape(G, PAGE))
                    for k in range(3)) \
        + tuple(np.ascontiguousarray(cvmax[:, k].reshape(G, PAGE))
                for k in range(3))

    # Edge Pluecker coefficient blocks: e(edge, ray) = dir_e . (o x d)
    #                                               + moment_e . d
    # packed so the kernel contracts (8, 3*KSIZE) against the per-ray
    # [d, o x d] vector on the MXU. Plane block gives t via n.x + dp = 0.
    v1p_, v2p_ = v1p, v2p
    epluck = np.zeros((Cp, 8, 3 * KSIZE), np.float32)
    for k, (a, b) in enumerate(((v0p, v1p_), (v1p_, v2p_), (v2p_, v0p))):
        emom = np.cross(a, b)          # pairs with ray direction d
        edir = b - a                   # pairs with ray moment o x d
        lanes = slice(k * KSIZE, (k + 1) * KSIZE)
        for ax in range(3):
            epluck[:, ax, lanes] = emom[:, ax].reshape(Cp, KSIZE)
            epluck[:, 3 + ax, lanes] = edir[:, ax].reshape(Cp, KSIZE)
    epluck = epluck.reshape(Cp * 8, 3 * KSIZE)

    nrm = np.cross(e1, e2)
    dp = -np.sum(nrm * v0p, axis=1)
    eplane = np.zeros((Cp, 8, KSIZE), np.float32)
    for ax in range(3):
        eplane[:, ax, :] = nrm[:, ax].reshape(Cp, KSIZE)
    eplane[:, 3, :] = dp.reshape(Cp, KSIZE)
    eplane = eplane.reshape(Cp * 8, KSIZE)

    # Packed per-triangle attribute block (NCHAN rows per cluster).
    n0 = pad(np.asarray(tr.n0))
    n1 = pad(np.asarray(tr.n1))
    n2 = pad(np.asarray(tr.n2))
    mid = np.zeros((Tp,), np.int64)
    mid[:T] = np.asarray(tr.material_id)[:T]
    if materials is not None:
        alb = np.asarray(materials.albedo)[mid]
        spc = np.asarray(materials.specular)[mid]
        emi = np.asarray(materials.emission)[mid]
        smo = np.asarray(materials.smoothness)[mid]
    else:
        alb = np.zeros((Tp, 3), np.float32)
        spc = np.zeros((Tp, 3), np.float32)
        emi = np.zeros((Tp, 3), np.float32)
        smo = np.zeros((Tp,), np.float32)
    chan = np.zeros((Cp, NCHAN, KSIZE), np.float32)
    packed = [n0[:, 0], n0[:, 1], n0[:, 2],
              n1[:, 0], n1[:, 1], n1[:, 2],
              n2[:, 0], n2[:, 1], n2[:, 2],
              alb[:, 0], alb[:, 1], alb[:, 2],
              spc[:, 0], spc[:, 1], spc[:, 2],
              emi[:, 0], emi[:, 1], emi[:, 2],
              smo]
    for k, col in enumerate(packed):
        chan[:, k, :] = col.reshape(Cp, KSIZE)
    chan = chan.reshape(Cp * NCHAN, KSIZE)

    if T:
        lo = np.minimum(np.minimum(v0[:T], v1[:T]), v2[:T]).min(axis=0)
        hi = np.maximum(np.maximum(v0[:T], v1[:T]), v2[:T]).max(axis=0)
    else:
        lo, hi = np.zeros(3), np.ones(3)
    bbox = tuple(float(x) for x in np.concatenate([lo, hi]))

    # Host numpy leaves; callers device_put the pytree once per scene build.
    return PallasAccel(pgb=pgb, cl_cols=cl_cols, epluck=epluck,
                       eplane=eplane, chan=chan, n_pages=G, bbox=bbox)


N_OUTS = 14  # t + normal(3) + albedo(3) + specular(3) + emission(3) + smooth


def _pallas_triangle_trace(pa: PallasAccel, ro, rd, seed, interpret: bool,
                           bin_rays: bool = False):
    """Run the kernel over all rays. ro/rd: Vec3 of (N,), N % BLOCK == 0.

    ``seed``: (N,) best-t upper bound per ray (non-triangle candidate hit
    distance; 0 for dead rays, <= _F32_MAX always). ``bin_rays`` enables the
    in-kernel coherence sort (use on incoherent bounces; bit-identical
    results either way).

    Returns 14 (N,) arrays: t, nx, ny, nz, albedo rgb, specular rgb,
    emission rgb, smoothness. t stays == seed where no triangle beat it.
    """
    pgb, cl_cols, n_pages = pa.pgb, pa.cl_cols, pa.n_pages
    N = ro[0].shape[0]
    n_steps = N // BLOCK

    def comp(a):
        # Dense (n_steps, 1, BLOCK) wide-row layout: rays purely in the lane
        # dim, unit-stride windows, no padding. (The middle singleton keeps
        # Mosaic's trailing-two-dims block rule satisfied: the (1, BLOCK)
        # window equals the array's trailing dims.)
        return a.reshape(n_steps, 1, BLOCK)

    ray_in = [comp(ro[0]), comp(ro[1]), comp(ro[2]),
              comp(rd[0]), comp(rd[1]), comp(rd[2]), comp(seed)]

    blk_spec = pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((n_steps, 1, BLOCK), jnp.float32)
                 for _ in range(N_OUTS)]

    kernel = functools.partial(_trace_kernel, n_pages, bin_rays, pa.bbox)
    # The scene-resident blocks (edge Pluecker + plane + attributes) exceed
    # the 16 MB default scoped-VMEM budget for large scenes; v5e has 128 MB.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[blk_spec] * 7 + [full()] * (1 + 6 + 3),
        out_specs=[blk_spec] * N_OUTS,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((16, BLOCK), jnp.float32)],
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*ray_in, pgb, *cl_cols, pa.epluck, pa.eplane, pa.chan)

    return tuple(o.reshape(N) for o in outs)


def _triangle_pallas_candidate(pa: PallasAccel, ro, rd, interpret: bool,
                               seed=None, bin_rays: bool = False):
    """Full-material triangle candidate via the Pallas kernel (zero gathers).

    ro/rd are component-SoA Vec3 tuples of (N,). ``seed`` is an optional (N,)
    best-t bound (nearest non-triangle candidate; 0 marks dead rays) — the
    kernel culls against it, and a triangle only counts as a hit where it came
    back strictly closer than the seed.
    """
    N = ro[0].shape[0]
    if seed is None:
        seed = jnp.full((N,), _F32_MAX, jnp.float32)
    else:
        seed = jnp.minimum(seed, _F32_MAX)  # INF -> representable sentinel
    pad = (-N) % BLOCK
    if pad:
        zpad = jnp.zeros((pad,), ro[0].dtype)
        ro = tuple(jnp.concatenate([c, zpad]) for c in ro)
        # Padded rays point straight down and carry seed 0: every culling
        # test fails, so padding costs no triangle work at all.
        rd = (jnp.concatenate([rd[0], zpad]),
              jnp.concatenate([rd[1], zpad - 1.0]),
              jnp.concatenate([rd[2], zpad]))
        seed_p = jnp.concatenate([seed, zpad])
    else:
        seed_p = seed

    outs = _pallas_triangle_trace(pa, ro, rd, seed_p, interpret, bin_rays)
    outs = tuple(o[:N] for o in outs)
    # out t == seed means "nothing beat the non-triangle candidate": a miss.
    t = jnp.where(outs[0] < seed, outs[0], INF)
    return dict(t=t, normal=outs[1:4], albedo=outs[4:7],
                specular=outs[7:10], emission=outs[10:13],
                smoothness=outs[13])


def make_pallas_tracer(scene: Scene, accel, cfg, interpret: bool = None):
    """Build ``fn(ro, rd) -> Hit`` using the fused kernel for triangles.

    ``interpret`` defaults to True off-TPU (tests/CPU) and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_tris = scene.num_triangles > 0
    if has_tris and isinstance(accel, ClusterAccel):
        # Host-side callers (tests) may hand the raw ClusterAccel; the
        # renderer's build_accel pre-packs a PallasAccel (prep is numpy,
        # illegal under jit).
        accel = prepare_pallas_accel(accel, scene.materials)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    if accel is not None:
        accel = jax.tree_util.tree_map(jnp.asarray, accel)

    def tracer(ro, rd, alive=None, bin_rays: bool = False) -> Hit:
        """ro/rd: Vec3 tuples of (N,); ``alive`` is an optional (N,) bool
        mask — dead rays are zero-seeded so the kernel skips all of their
        culling and triangle work (tile-granular wavefront compaction).
        ``bin_rays`` turns on the in-kernel coherence sort (incoherent
        bounces; results are bit-identical either way)."""
        cands = [_ground_candidate(scene, ro, rd),
                 _sphere_candidate(scene, ro, rd)]
        if has_tris:
            # Seed the kernel's best-t with the nearest non-triangle hit:
            # page/cluster culling then discards everything behind it.
            seed = jnp.minimum(cands[0]["t"], cands[1]["t"])
            if alive is not None:
                seed = jnp.where(alive, seed, 0.0)
            cands.append(_triangle_pallas_candidate(accel, ro, rd, interpret,
                                                    seed, bin_rays))
        return combine_candidates(scene, ro, rd, cands)

    return tracer
