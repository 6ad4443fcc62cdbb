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
from typing import Optional, Tuple

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
from .trace import (_ground_candidate, _sphere_candidate,
                    combine_candidates, fold_candidate)

import os as _os

# Rays per culling tile. The per-hit-pass fixed cost (~650 cyc of VPU->MXU
# ->VPU serialization, invariant to dot size) amortizes over the tile width,
# while the admitted-cluster set per tile grows with the union of its rays'
# frustums — wider tiles win while rays are coherent enough that the union
# factor stays under the width ratio. Measured on the 1080p/100k/8b bench
# (v5e, megakernel): single passes 128 -> 210.5 ms, 256 -> 201.5, 512 ->
# 223.5 (256 won); under PASS_PAIR the optimum moves back DOWN — 128 ->
# 163.7 ms, 256 -> 167.4, 512 -> 206.7 (bit-identical images) — because
# pairing halves the per-pass fixed cost that wide tiles amortize, while
# narrow tiles keep the per-pass triangle work tighter. 128 ships. Env
# override is an A/B probe hook only.
TILE = int(_os.environ.get("URT_TILE", "128"))
BLOCK = 1024         # rays per grid step (fixed: megakernel state layout)
ROWS = BLOCK // TILE  # ray tiles per grid step
assert TILE % 128 == 0 and BLOCK % TILE == 0
KSIZE = 128         # triangles per kernel cluster (sublane block; 256 measured 12% slower)
# Scoped-VMEM budget handed to Mosaic (v5e has 128 MB physical). 100 MB
# leaves double-buffer headroom at KSIZE=128; KSIZE=64 pads the 64-lane
# eplane/chan blocks to 128 lanes (+~49 MB) and needs ~121 MB (measured:
# compiles and runs at 126, bit-identical images — but LOSES 26 ms/frame,
# so 128 stays the cluster size). The pallas_call sites raise the limit
# automatically when the accel's resident blocks need it (scoped_vmem_mb).
VMEM_LIMIT_MB = 100
# Hard scoped-VMEM ceiling Mosaic will accept on v5e, and the stack /
# scratch headroom the kernels need beyond the resident accel blocks
# (grid-stream double buffers, the (B, B) bf16 permutation scratch, Mosaic
# temporaries — the 101k-tri bench compiles at blocks 71 MB + 29 headroom).
VMEM_CEILING_MB = 126
VMEM_STACK_MB = 30


def ds8(stride: int, idx, size: int):
    """Checked dynamic sublane slice: rows [stride*idx, stride*idx + size).

    Mosaic layout rules (probed on v5e; the round-3 ``pl.ds(5*b, 5)``
    regression is the cautionary tale — interpret mode enforces NONE of
    them, so misaligned slices sail through the CPU suite and fail only on
    hardware):

    * a single-row dynamic sublane index (size == 1) may sit anywhere;
    * a multi-row dynamic slice needs BOTH its offset and its size provably
      ≡ 0 (mod 8). ``pl.multiple_of`` only ASSERTS the offset claim to
      Mosaic — it never checks it — so this helper verifies the static
      stride factor at trace time, where the CPU interpret tests trace the
      exact same code and fail loudly.

    All dynamic sublane slices in the kernel files must route through this
    helper; tests/test_mosaic_align.py enforces that by AST scan.
    """
    if not isinstance(stride, int) or not isinstance(size, int):
        raise TypeError("ds8 stride/size must be static Python ints")
    if size == 1:
        return pl.ds(idx if stride == 1 else stride * idx, 1)
    if stride % 8 != 0 or size % 8 != 0:
        raise ValueError(
            f"ds8(stride={stride}, size={size}): multi-row dynamic sublane "
            "slices need stride % 8 == 0 and size % 8 == 0 — Mosaic cannot "
            "statically prove alignment otherwise (the ee5d2bf failure "
            "class; see CLAUDE.md TPU/Mosaic rules)")
    return pl.ds(pl.multiple_of(stride * idx, 8), size)


class PallasVmemError(ValueError):
    """Scene's packed accel blocks cannot fit scoped VMEM (the megakernel
    keeps the whole scene resident). Callers catch this to fall back to the
    HBM-resident cluster tracer (ops/bvh.build_accel, traverse
    .make_accel_tracer)."""


def _padded_mb(arrs) -> float:
    """VMEM footprint of whole-array kernel operands: the lane (last) dim
    pads to the 128-lane tile quantum."""
    total = 0
    for a in arrs:
        if a is None:
            continue
        lanes = -(-int(a.shape[-1]) // 128) * 128
        rows = 1
        for d in a.shape[:-1]:
            rows *= int(d)
        total += rows * lanes * np.dtype(a.dtype).itemsize
    return total / 2 ** 20


def scoped_vmem_limit(pa) -> int:
    """Compile-time scoped-VMEM limit for this accel: the default budget,
    auto-raised (up to the hardware ceiling) when the resident blocks plus
    stack headroom need more."""
    mb = _padded_mb([pa.epluck, pa.eplane, pa.chan, *pa.cb_rows,
                     *pa.cl_cols, *pa.pgb, pa.pgaxd,
                     *(pa.gs or ())])
    need = mb + VMEM_STACK_MB
    return int(min(VMEM_CEILING_MB, max(VMEM_LIMIT_MB, need)) * 2 ** 20)
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
#   "mxu_f6"       — the SAME six bf16 products as mxu_highest, but fused
#                    into ONE MXU dot per quantity: the per-triangle constant
#                    blocks are pre-split host-side into their three bf16
#                    components (f32's 24 mantissa bits = 3 x 8, the
#                    _permute_exact trick) and stacked along the CONTRACTION
#                    dim, the per-ray vectors likewise in-kernel — a k=48 dot
#                    at DEFAULT precision computes hH+hM+mH+hL+lH+mM exactly
#                    (every operand is bf16-representable, accumulation is
#                    f32). Same numerics as HIGHEST at one dot call instead
#                    of six.
#   "mxu_f3"       — the 3-product subset (hH+hM+mH, a k=24 dot): relative
#                    error ~2^-17 per quantity (vs bf16's 2^-8 that broke
#                    round 1) at half the f6 MAC count.
#   "mxu_pf3"      — f3 with the triangle-side operand stored PRE-FUSED
#                    ([h; h; m] rows, h duplicated): the kernel dots the
#                    block straight out of VMEM with no per-pass concat.
#                    Same memory as f6's [h; m; l] storage, same numerics
#                    as f3 (bench-scene oracle RMSE 8.5e-7).
# Measured on v5e (1080p/100k-tri/8-bounce frame, bf16-broken baseline
# 485 ms): mxu_highest 697 ms (exact, oracle RMSE 2.6e-7), vpu 1049 ms
# (exact; per-pass transposes dominate), hybrid 632 ms (REJECTED: bf16 edge
# tests wrongly accept near-edge closer triangles — 60/18k rays off by up to
# 56% t, oracle RMSE 2e-2). Mosaic does not implement Precision.HIGH, so the
# fused-split modes above are the hand-rolled middle ground.
GEOM_MODE = "mxu_f6"

_F32_MAX = 3.0e38
_PAD_BOX = 1.0e30   # far-away point box for padded clusters/pages

# Debug: when True, each ray row counts its cluster passes in scratch row 14
# and the kernel emits that count IN PLACE OF the smoothness channel — the
# mean of Hit.smoothness over a traced batch is then (cluster passes per
# 128-ray tile). Perf instrumentation only; never enable for rendering.
COUNT_PASSES = False

# Perf probe (NEVER for rendering): winner epilogue reduced to the t update
# (no exact t/u/v reduces, no attribute matmul, no channel writes).
EPILOGUE_LITE = False
# Perf bisect (NEVER for rendering): "full" | "no_reduce" (t from the packed
# key, flat barycentrics) | "no_chan" (skip attribute matmul/blend/writes)
# | "no_dot" (zero attributes, keep blend + writes).
EPILOGUE_MODE = "full"

# Attribute-block numeric path for the fused-split geometry modes:
# "split3" = exact 3-component bf16 dot at DEFAULT ((3*NCHAN, K) operand);
# "highest" = unsplit f32 block at Precision.HIGHEST ((NCHAN, K) operand —
# a third of the dynamic-slice staging per hit pass, 6 internal passes);
# "int8b4" = the f32 bit pattern split into FOUR biased byte planes
# ((4*NCHAN, K) int8 operand, int8 one-hot pick, s32 accumulation, bytes
# reassembled + bitcast in-kernel — bit-exact like split3, 2/3 the operand
# bytes, and the v5e MXU runs int8 at 2x the bf16 rate; pair/group paths).
# MEASURED on v5e (r5, 1080p/100k/8b flagship, interleaved A/B): int8b4
# 144.07 ms/frame vs split3 144.82 — NEUTRAL within tunnel noise, same
# oracle RMSE (bit-identical attr path). Confirms the ~650-cycle per-hit-
# pass cost is the VPU->MXU->VPU serialization LATENCY, not operand width
# or MXU rate — with SLOT_EPI (both register variants) this closes the
# attribute-dot hypothesis space: cheaper operands (int8b4), fewer passes
# (pair/quad), deferred dots (SLOT_EPI/gid), and pipelining (PAIR_PIPE)
# are ALL neutral-or-loss. split3 stays the default.
CHAN_MODE = "split3"

# Re-test each cluster's AABB against the tile's CURRENT best-t immediately
# before its triangle pass (a ~20-op (1, rays) slab on broadcast bound rows):
# page-level culling gated on the best-t at page ENTRY, so every hit found
# inside the page invalidates later clusters that the entry-time test let
# through. Default OFF: with kd median-split clusters only ~2-7 clusters
# are admitted per tile and the re-test costs more than it prunes
# (interleaved A/B: +8 ms/frame on the 1080p bench).
REGATE = False

# Kernel hit-record scratch layout: (48, BLOCK) with every Vec3 channel at
# an 8-ALIGNED row so the winner epilogue and the ground/sphere seeding
# write whole (3, rays) blocks (Mosaic gives each row a sublane offset;
# misaligned row-wise writes each pay an issue + relayout).
SROWS = 48
ROW_T, ROW_CNT, ROW_ADM = 0, 1, 2           # best-t, debug counters
ROW_WC = 3                                  # winner cluster id (-1 = none)
ROW_U, ROW_V, ROW_GID = 4, 5, 6             # "gid" defer: winner u/v/tri-id
ROW_N, ROW_ALB, ROW_SPC, ROW_EMI, ROW_SMO = 8, 16, 24, 32, 40

# Diagnostic: when True, each ray records its winning cluster id in
# ROW_WC and the kernel emits that row in place of the smoothness channel
# (feeds the distinct-winners-per-step statistic that decides whether a
# step-level batched attribute resolver would pay off).
TRACK_WINNERS = False

# Deferred winner-attribute epilogue (fused geometry modes only):
#   "dots" (or True) — hit passes record just the lane-truncated winner t +
#       winning cluster id (two masked row writes); after the page sweep a
#       short while_loop RE-RUNS the fused dots and the full epilogue ONCE
#       per distinct winning cluster per tile. Measured a LOSS at TILE=128
#       (238.5 vs 210.7 ms): the resolver's serial scalar->dynamic-slice->
#       MXU chain cost more than the per-pass epilogues it removed.
#   "gid"  — hit passes keep the cheap winner reduces (exact t/u/v — the
#       no_chan bisect measured those ~free) and store the winner's GLOBAL
#       triangle id (cluster*KSIZE + lane + 1) in ROW_GID; the resolver
#       rebuilds the one-hot pick straight from the id's lane bits, so it
#       runs ONLY the attribute matmul + blend + channel writes per
#       distinct winning cluster — no geometric dot re-run. Bit-identical
#       channels to the per-pass epilogue (same pick one-hot, same blend).
#       MEASURED a loss (209.8 vs 201.5 control; batched GID_BATCH dot
#       208.7): the post-sweep resolver's serial scalar-extract sweeps
#       cost the same ~650-cycle pipeline drain per step as the per-pass
#       dots they replace.
#   "lag"  — hit passes record like "gid" (exact t/u/v reduces in-pass;
#       winner LANE+1 in ROW_GID), and the pending pass's attribute dot is
#       issued at the TOP of the NEXT admitted pass, back-to-back with its
#       geometric dots: each hit pass pays ONE VPU->MXU->VPU round trip
#       instead of two. The pending cluster id rides the visitation
#       while_loop carries as a scalar; one drain resolves the final
#       pending pass after the sweep. MEASURED EXACTLY NEUTRAL (202.45 vs
#       202.46 ms control): MXU-issue adjacency is NOT the per-pass cost —
#       together with the chan-size/precision invariance this localizes
#       the ~650 cycles to the PICK operand (the only operand that never
#       varied) and/or the dot's dependency position in the chain.
# TRACK_WINNERS measured ~40% of hit passes as transient winners and ~2-4
# distinct winning clusters per tile vs ~17 hit passes — deferral trades
# ~17 attribute matmul + 5-block-write epilogues for ~3.
EPILOGUE_DEFER = False
# Debug aid: run the deferred sweep but skip the resolver (t stays
# lane-truncated, attributes stale) — bisects defer bugs to sweep/resolve.
DEFER_RESOLVE = True
# Distinct winning clusters resolved per "gid" resolver iteration (ONE
# concatenated attribute dot covers the whole batch — the per-issue
# VPU->MXU->VPU stall amortizes over the batch).
GID_BATCH = 4
# Second-level epilogue gate (immediate epilogue only): a hit pass whose
# triangles beat no ray's current best writes nothing — pl.when(any(closer))
# skips its whole attribute epilogue (the ~650-cycle VPU->MXU->VPU round
# trip). Exact: every epilogue write is already masked by `closer`.
# MEASURED a small loss (206.7 vs 202.5 control): the extra scalar reduce
# + branch drain costs more than the skipped transient-free epilogues.
# RE-MEASURED at the 142 ms state (r4, PASS_PAIR+PAGE_SORT): 141.21 vs
# 141.77 control and 141.86 with PAGE_SORT — neutral within tunnel noise
# even with monotone per-page ordering; stays OFF.
CLOSER_GATE = False
# Pair-pass traversal: each visitation loop iteration tests TWO admitted
# clusters in one fused pass (one edge dot, one plane dot, one attribute
# dot — each covering 256 triangles) instead of one. Fixed per-issue
# overhead (~650 cyc/dot, size-invariant) halves per admitted cluster
# while culling granularity stays at 128 triangles; leftovers carry
# across words/pages and drain as a single pass. Fused geom + split3/
# bf16s3 chan + bitmask trav only.
# MEASURED on v5e (bench scene, 1080p/100k/8b): 200.6 -> 173.1 ms/frame
# (82.7 -> 95.8 Mrays/s), bit-identical accumulator checksum. QUAD (300.9)
# and OCT (423.3) LOSE badly: past GROUP=2 the extra untested-triangle MXU
# rows + wider winner reduce outgrow the saved per-issue overhead.
PASS_PAIR = True
# Pipelined pair epilogue: each fired pair pass stores its winners' exact
# t/u/v (the reduces the no_chan bisect measured ~free) plus the winner
# LANE+1 in ROW_GID, and its ATTRIBUTE dot runs one fired pass later —
# pick + chan-slice are rebuilt at the NEXT pass's TOP from the GID row
# and the carried pending cluster ids (operands depend on nothing this
# pass computes, the const_pick dependency shape), while the channel
# WRITES land at that pass's BOTTOM, after its winner reduces, giving the
# MXU the whole pass to finish (the "lag" mode consumed its lagged dot
# immediately after issue — cluster_pass_lag:1600-1602 — which is why it
# measured neutral; the 109-110 ms no_dot == static_chan == const_pick
# probe triple localizes the remaining ~63 ms/frame to exactly this
# consume-position stall). Chan writes are sequence- and value-identical
# to the immediate epilogue, so images are bit-identical.
# MEASURED A LOSS on v5e (bench scene): 173.7 vs 167.4 ms base /
# 171.7 vs 163.7 at TILE=128, bit-identical checksums — decoupling the
# pick/slice operands does NOT remove the stall inside the visitation
# while_loop (consistent with "lag"), and the (2K, TILE) pick rebuild +
# extra row writes add ~6 ms. Ships OFF; kept as the documented probe of
# the consume-position hypothesis.
PAIR_PIPE = False
# SLOTTED pair epilogue: fire the pair GEOMETRY every pass as usual, but
# defer the attribute dot + normal blend + channel writes across
# SLOT_EPI consecutive fired passes. Each pass only records its winners
# (exact t/u/v reduces — measured ~free — plus ROW_GID = slot*2K + winner
# lane + 1, four masked (1, TILE) row writes under the existing any_ok
# gate) and stashes its two cluster ids in scalar slot registers carried
# through the visitation loops; every SLOT_EPI-th fired pass DRAINS: one
# iota==gid compare rebuilds the one-hot over all SLOT_EPI*2K slot lanes,
# the slots' chan blocks concatenate along lanes, and ONE attribute dot +
# ONE blend/write sequence resolves every ray's CURRENT winner. The
# ~650-cycle per-issue dot stall (and the per-pass blend + 5 block
# writes) amortizes SLOT_EPI x. Differences from the measured-out
# variants: PAIR_PIPE still issued its dot EVERY pass (no amortization);
# "gid"/step-level resolvers swept winners with serial scalar loops or
# 8x-wide ops — here the drain is one fixed-shape dot at TILE width and
# the per-pass path gets STRICTLY cheaper. t writes stay per-pass, so
# culling/re-gate see the exact same best-t stream -> identical pass
# sequence, and a one-hot dot sums exactly one product regardless of
# operand width -> bit-identical images. 0 = off; 4/8 are the candidate
# drain periods (A/B on hardware).
# MEASURED A LOSS on v5e, BOTH variants (bench scene, r5; control 141.8):
#   carry-based slot registers: slot=2 158.1, slot=4 153.4, slot=8 271.0
#   SMEM slot registers:        slot=2 155.7, slot=4 153.2, slot=8 257.8
# Checksums all IDENTICAL to control (the scheme is correct). The two
# variants agreeing (±2 ms) ACQUITS the while-loop scalar carry — the
# cost is the drain itself: the (N*2K, TILE) iota pick rebuild, the 2N
# dynamic chan slices per drain, and the per-pass winner-record row
# writes together cost more than the per-pass dots they replace, and
# scale superlinearly with the drain width (slot=8 pick spans 4096
# virtual lanes). Together with PAIR_PIPE/lag/gid/step-batch this closes
# the defer-the-attribute-dot family: on this hardware the immediate
# one-dot-per-pair epilogue is the measured optimum. Ships 0 (off); the
# implementation stays as the documented probe (oracle-exact, tested).
SLOT_EPI = int(_os.environ.get("URT_SLOT_EPI", "0"))
# Keep the slot cluster ids in SMEM scratch (dynamic scalar stores at
# fire time, STATIC reads at drain time) instead of while-loop carries:
# the carry shrinks to (pend, n). Measured == the carry variant (above).
SLOT_SMEM = _os.environ.get("URT_SLOT_SMEM", "1") == "1"
# Single-issue geometry: concatenate the edge and plane operands along the
# OUTPUT lane/sublane axes so each cluster pass issues ONE MXU dot
# ((k, 4NK) x (k, 3*TILE)) instead of two. Bit-identical results (each
# output element contracts the same k products); trades ~2.4x the MACs for
# one fewer ~650-cycle in-loop issue per pass.
# MEASURED A LOSS on v5e (bench scene): 185.6 vs 163.0 ms, bit-identical
# checksum — OUTPUT-LANE width is NOT free (the earlier "dot cost is
# size-invariant" finding covered contraction/row growth only); the extra
# (4NK, 2*TILE) discarded cross-term results outweigh the saved issue.
# Ships OFF; kept as the documented probe closing the issue-fusion idea.
FUSE_GEOM1 = False
# Slice the pair pass's attribute operand at the TOP of the pass (before
# the geometry dots) instead of inside the gated epilogue: the dynamic
# VMEM slice copy then overlaps the geometry/winner chain. Costs the
# slice on no-hit passes (their epilogue gate no longer skips it).
HOIST_CHAN = False
# Quad-pass traversal: same idea at GROUP=4 — each fire tests FOUR admitted
# clusters in one fused pass (one 12K-row edge dot, one 4K-row plane dot,
# one 512-wide attribute dot), quartering the fixed per-issue overhead per
# admitted cluster. Up to three leftovers carry across words/pages and
# drain as one pair + one single pass. Takes precedence over PASS_PAIR.
PASS_QUAD = False
# Oct-pass traversal: GROUP=8 — one fused pass per eight admitted clusters
# (24K-row edge dot, 8K-row plane dot, 1024-wide attribute dot). Up to
# seven leftovers carry and drain as pairs + one single. Takes precedence
# over PASS_QUAD/PASS_PAIR.
PASS_OCT = False


def _col(row):
    """(1, 128) row -> (128, 1) column (Mosaic-supported transpose)."""
    return jnp.transpose(row)


# Diagnostic probe (off by default): multiply slab entry distances by
# (1 - URT_CULL_SLACK) before the best-t prune compare, making the cull
# conservative against f32 rounding in (bmin - ro) * inv (Ize-style robust
# traversal). Used to rule culling-epsilon OUT as the source of the rare
# deep-bounce winner flips vs the XLA oracle: the flip pattern is
# partition-INDEPENDENT (identical diff images at 2 vs 5 shards of the
# same scene), which only cross-arithmetic t noise explains — prune errors
# would track the partition's page/cluster boxes.
CULL_SLACK = float(_os.environ.get("URT_CULL_SLACK", "0.0"))


def _entry_slack(ent):
    return ent * (1.0 - CULL_SLACK) if CULL_SLACK else ent


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
    return (tmax >= tmin) & (tmax > 0) \
        & (_entry_slack(jnp.maximum(tmin, 0.0)) < best_t_row)


# Traversal ordering strategy:
#   "priority" — distance-ordered visitation: pages and clusters are visited
#                in ascending tile entry distance (nearest box first) via a
#                packed-key min-reduce loop, with a global best-t cutoff that
#                stops the sweep once the nearest remaining box lies behind
#                every ray's current best hit. The tile-coherent analog of
#                ordered BVH traversal with early termination (the ordering
#                the reference's unordered stack never had,
#                compute:294-326).
#   "bitmask"  — index-ordered visitation (dual asc/desc bit packing
#                selected by the tile's dominant marching direction); the
#                per-visit cost is a ~free ctz.
#   "bitmask_pipe" — bitmask visitation with the cluster MXU dots
#                SOFTWARE-PIPELINED across the ctz loop: iteration i+1's
#                dots issue before iteration i's VPU epilogue, so the two
#                units overlap (the measured bottleneck was ~650 cyc of
#                VPU->MXU->VPU serialization per hit pass).
#   MEASURED (1080p/100k/8b megakernel, v5e, control bitmask 250.7 ms):
#     priority 280.1 — the distance-ordered sweep's per-visit min-reduce
#       (~18 latency-bound row ops) costs more than the transient winners
#       it saves, and the best-t cutoff almost never fires (any sky-bound
#       ray holds the tile's max best-t at F32_MAX);
#     bitmask_pipe 259.2 — Mosaic does NOT overlap the speculative MXU
#       dots with the current epilogue across a while-loop carry; the
#       ~330 KB carried dot results cost copies instead;
#     bitmask+page_axes 250.9 — neutral on the bench scene (its pages'
#       dominant axes mostly agree with the global axis).
#   All modes are oracle-identical; bitmask stays the default.
TRAV_MODE = "bitmask"
# Per-page dominant-axis ordering (vs one global axis): zero per-visit
# cost, measured neutral on the bench scene, strictly better ordering on
# scenes whose kd pages sweep different axes.
PAGE_AXES = True
# Within-page cluster sort (prep-side, zero kernel cost): re-order each
# page's clusters by centroid along the page's longest axis so ascending
# cluster index IS the monotone spatial sweep the asc/desc visitation
# flags assume. The raw kd dfs order only correlates ~0.8 with its page's
# dominant axis (bench scene, measured) — the zigzag turns closer-later
# clusters into transient winner passes (~40% of hit passes, TRACK_WINNERS
# round 2). MEASURED NEUTRAL on the 1080p bench (142.25 vs 141.77 control,
# checksum-identical; also neutral combined with CLOSER_GATE at 141.86 and
# with REGATE at 186.6 vs 190.2) — a transient winner improves best_t at
# its own visit time, so no gate can skip its epilogue and the bench
# scene's pages leave nothing recoverable. Ships ON anyway (PAGE_AXES
# precedent): zero per-visit and ~zero prep cost, output identical modulo
# exact-t ties (the strict `closer` compare breaks equal-t ties by visit
# order, so coplanar duplicate geometry may resolve to a different — still
# valid — winner), strictly better ordering on scenes whose kd pages
# zigzag harder.
PAGE_SORT = True

# Sharded-tier (ShardedPallasAccel) chain via ONE lax.scan over the
# stacked shards instead of a Python loop of per-shard pallas_calls: the
# kernel traces + Mosaic-compiles once for any shard count (the loop paid
# one compile per shard — ~36 min cold at 16 shards through the shared
# remote-compile queue — because per-shard statics baked distinct
# kernels). Output-identical to the loop (strict '<' left-fold rides the
# scan carry). False restores the loop for A/B.
SHARD_SCAN = True

_INF_I32 = int(np.float32(np.inf).view(np.int32))      # +inf bit pattern
_CUT_I32 = int(np.float32(1e29).view(np.int32))        # "padded box" cutoff


def _outer_aabb_entry(ro, inv, bmin_cols, bmax_cols, best_t_row):
    """(boxes, rays) slab ENTRY distances: max(tmin, 0) where the box is hit
    in front of that ray's best-t; +inf otherwise (same admission set as
    ``_outer_aabb``, but carrying the ordering information)."""
    B = bmin_cols[0].shape[0]
    tmin = jnp.full((B, TILE), -_F32_MAX, jnp.float32)
    tmax = jnp.full((B, TILE), _F32_MAX, jnp.float32)
    for a in range(3):
        t1 = (bmin_cols[a] - ro[a]) * inv[a]   # (B, TILE)
        t2 = (bmax_cols[a] - ro[a]) * inv[a]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    ent = _entry_slack(jnp.maximum(tmin, 0.0))
    ok = (tmax >= tmin) & (tmax > 0) & (ent < best_t_row)
    return jnp.where(ok, ent, jnp.float32(jnp.inf))


def _visit_by_distance(entry_col, best_t_fn, visit_fn):
    """Visit boxes in ascending tile entry order with best-t early exit.

    ``entry_col``: (B, 1) f32 — each box's nearest entry distance over the
    tile's rays (+inf = no ray admits it). The box index is packed into the
    low 7 mantissa bits (positive-f32 order survives an int32 view), so ONE
    min-reduce finds the nearest unvisited box; it is visited, masked to
    +inf, and the loop repeats. The sweep stops when the nearest remaining
    entry exceeds every ray's current best-t (``best_t_fn() -> (1, TILE)``):
    once the first real hits land, everything behind them is never touched.
    Padded far boxes (>= 1e29) are never visited at all.
    """
    B = entry_col.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    bits = jax.lax.bitcast_convert_type(entry_col, jnp.int32)
    keys0 = jnp.bitwise_or(jnp.bitwise_and(bits, ~jnp.int32(127)), sub)

    def go_flag(wk):
        # Entirely in int32 bit space (positive-f32 order survives the int
        # view; Mosaic has no SCALAR bitcast): the tile's best-t row is
        # bitcast as a vector and max-reduced, and wk's index bits are
        # masked DOWN so the comparison stays conservative.
        bt_bits = jnp.max(jax.lax.bitcast_convert_type(
            best_t_fn(), jnp.int32))
        ent = jnp.bitwise_and(wk, ~jnp.int32(127))
        return (ent < bt_bits) & (ent < jnp.int32(_CUT_I32))

    def cond(carry):
        _, _, go = carry
        return go

    def body(carry):
        keys, wk, _ = carry
        visit_fn(jnp.bitwise_and(wk, jnp.int32(127)))
        keys = jnp.where(sub == jnp.bitwise_and(wk, jnp.int32(127)),
                         jnp.int32(_INF_I32), keys)
        wk = jnp.min(keys)
        return keys, wk, go_flag(wk)

    wk0 = jnp.min(keys0)
    jax.lax.while_loop(cond, body, (keys0, wk0, go_flag(wk0)))


def _pack_flags_col(flags_col, sub):
    """(B, 1) bool column -> ceil(B/32) int32 bitmask scalars."""
    B = flags_col.shape[0]
    words = []
    for w in range((B + 31) // 32):
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


def _for_set_bits_pair(word, idx_of, fire2, pend):
    """Visit set bits in GREEDY PAIRS: each loop iteration fires
    ``fire2(a, b)`` on two distinct admitted clusters — the carried
    leftover ``pend`` (from a previous word/page) paired with this word's
    first bit, or two bits of this word. A word whose last bit finds no
    partner stashes it into the carry; the caller drains the final
    leftover with a single-cluster pass.

    Rationale (measured): the per-cluster-pass cost is dominated by FIXED
    per-issue overhead (~650 cycles per in-loop dot, invariant to size /
    precision / operand bytes / position / dependency — see the
    EPILOGUE_DEFER notes). Pairing halves the number of issues per
    admitted cluster while leaving the CULLING granularity at 128
    triangles (static KSIZE=256 measured 12% slower because its coarser
    AABBs admit more work; pairs are formed from already-admitted,
    possibly distant clusters instead).

    Returns the new leftover (int32 global cluster id, -1 = none).
    """
    def ctz(v):
        return jnp.round(jnp.log2(jnp.abs(
            v.astype(jnp.float32)))).astype(jnp.int32)

    def cond(c):
        return c[0] != 0

    def body(c):
        w, p = c
        low0 = jnp.bitwise_and(w, jnp.int32(0) - w)
        c0 = idx_of(ctz(low0))
        w_a = jnp.bitwise_xor(w, low0)
        have_p = p >= 0
        low1 = jnp.bitwise_and(w_a, jnp.int32(0) - w_a)
        has1 = w_a != 0
        c1 = idx_of(ctz(jnp.where(has1, low1, jnp.int32(1))))
        a = jnp.where(have_p, p, c0)
        b = jnp.where(have_p, c0, c1)
        fire = have_p | has1

        @pl.when(fire)
        def _():
            fire2(a, b)

        new_p = jnp.where(fire, jnp.int32(-1), c0)
        new_w = jnp.where(have_p, w_a,
                          jnp.bitwise_xor(
                              w_a, jnp.where(has1, low1, jnp.int32(0))))
        return new_w, new_p

    return jax.lax.while_loop(cond, body, (word, pend))[1]


def _for_set_bits_pair_pipe(word, idx_of, fire4, pend3):
    """``_for_set_bits_pair`` with the pipelined epilogue's pending-pass
    cluster ids threaded through the carry: ``fire4(a, b, pc0, pc1)``
    resolves the pending pair (pc0, pc1) and processes (a, b), which then
    becomes the new pending pair. ``pend3 = (pend, pc0, pc1)`` with pc0 =
    -1 meaning nothing pending; it carries across words/pages like the
    unpaired-leftover ``pend`` does."""
    def ctz(v):
        return jnp.round(jnp.log2(jnp.abs(
            v.astype(jnp.float32)))).astype(jnp.int32)

    def cond(c):
        return c[0] != 0

    def body(c):
        w, p, pc0, pc1 = c
        low0 = jnp.bitwise_and(w, jnp.int32(0) - w)
        c0 = idx_of(ctz(low0))
        w_a = jnp.bitwise_xor(w, low0)
        have_p = p >= 0
        low1 = jnp.bitwise_and(w_a, jnp.int32(0) - w_a)
        has1 = w_a != 0
        c1 = idx_of(ctz(jnp.where(has1, low1, jnp.int32(1))))
        a = jnp.where(have_p, p, c0)
        b = jnp.where(have_p, c0, c1)
        fire = have_p | has1

        @pl.when(fire)
        def _():
            fire4(a, b, pc0, pc1)

        new_p = jnp.where(fire, jnp.int32(-1), c0)
        new_w = jnp.where(have_p, w_a,
                          jnp.bitwise_xor(
                              w_a, jnp.where(has1, low1, jnp.int32(0))))
        return (new_w, new_p, jnp.where(fire, a, pc0),
                jnp.where(fire, b, pc1))

    out = jax.lax.while_loop(cond, body, (word,) + tuple(pend3))
    return out[1:]


def _for_set_bits_pair_slot(word, idx_of, fire2s, drain, carry, nslot):
    """``_for_set_bits_pair`` with the SLOTTED epilogue's state threaded
    through the carry: ``carry = (pend, cids, n)`` where ``cids`` is a
    tuple of ``2 * nslot`` scalar cluster ids (the slot registers) and
    ``n`` the fired-pass count since the last drain. Each fired pass runs
    ``fire2s(a, b, n)`` (geometry + winner-record writes, side effects
    only), stores (a, b) into slots (2n, 2n+1), and every ``nslot``-th
    fired pass runs ``drain(cids)`` (the amortized attribute resolve).
    Pairing logic — greedy pairs, leftover carried across words/pages —
    is identical to ``_for_set_bits_pair``."""
    def ctz(v):
        return jnp.round(jnp.log2(jnp.abs(
            v.astype(jnp.float32)))).astype(jnp.int32)

    def cond(c):
        return c[0] != 0

    def body(c):
        w, (p, cids, n) = c
        low0 = jnp.bitwise_and(w, jnp.int32(0) - w)
        c0 = idx_of(ctz(low0))
        w_a = jnp.bitwise_xor(w, low0)
        have_p = p >= 0
        low1 = jnp.bitwise_and(w_a, jnp.int32(0) - w_a)
        has1 = w_a != 0
        c1 = idx_of(ctz(jnp.where(has1, low1, jnp.int32(1))))
        a = jnp.where(have_p, p, c0)
        b = jnp.where(have_p, c0, c1)
        fire = have_p | has1

        @pl.when(fire)
        def _():
            fire2s(a, b, n)

        # Slot writes are masked no-ops when not firing; stale ids behind
        # a re-armed n are never picked (ROW_GID only references lanes the
        # NEXT batch's passes write) and their drain-time chan reads are
        # safe (ids stay in range).
        new_cids = tuple(
            jnp.where(fire & (n == i // 2), (a if i % 2 == 0 else b), s)
            for i, s in enumerate(cids))
        full = fire & (n == nslot - 1)

        @pl.when(full)
        def _():
            drain(new_cids)

        nn = jnp.where(full, jnp.int32(0), jnp.where(fire, n + 1, n))
        new_p = jnp.where(fire, jnp.int32(-1), c0)
        new_w = jnp.where(have_p, w_a,
                          jnp.bitwise_xor(
                              w_a, jnp.where(has1, low1, jnp.int32(0))))
        return new_w, (new_p, new_cids, nn)

    return jax.lax.while_loop(cond, body, (word, carry))[1]


def _for_set_bits_pair_slot_smem(word, idx_of, fire2s, drain, carry,
                                 nslot, slot_ref):
    """``_for_set_bits_pair_slot`` with the slot registers in SMEM scratch
    instead of the while-loop carry. MEASURED rationale: each scalar
    carried through the visitation loops costs real per-iteration time on
    Mosaic (the carry variant lost 12-129 ms/frame, superlinear in slot
    count) — here the carry stays (pend, n) and the cluster ids land in
    ``slot_ref`` with two dynamic scalar stores per fired pass; the drain
    reads them back at STATIC indices. ``drain()`` takes no arguments (it
    closes over slot_ref)."""
    def ctz(v):
        return jnp.round(jnp.log2(jnp.abs(
            v.astype(jnp.float32)))).astype(jnp.int32)

    def cond(c):
        return c[0] != 0

    def body(c):
        w, (p, n) = c
        low0 = jnp.bitwise_and(w, jnp.int32(0) - w)
        c0 = idx_of(ctz(low0))
        w_a = jnp.bitwise_xor(w, low0)
        have_p = p >= 0
        low1 = jnp.bitwise_and(w_a, jnp.int32(0) - w_a)
        has1 = w_a != 0
        c1 = idx_of(ctz(jnp.where(has1, low1, jnp.int32(1))))
        a = jnp.where(have_p, p, c0)
        b = jnp.where(have_p, c0, c1)
        fire = have_p | has1

        @pl.when(fire)
        def _():
            slot_ref[2 * n] = a
            slot_ref[2 * n + 1] = b
            fire2s(a, b, n)

        full = fire & (n == nslot - 1)

        @pl.when(full)
        def _():
            drain()

        nn = jnp.where(full, jnp.int32(0), jnp.where(fire, n + 1, n))
        new_p = jnp.where(fire, jnp.int32(-1), c0)
        new_w = jnp.where(have_p, w_a,
                          jnp.bitwise_xor(
                              w_a, jnp.where(has1, low1, jnp.int32(0))))
        return new_w, (new_p, nn)

    return jax.lax.while_loop(cond, body, (word, carry))[1]


def _for_set_bits_group(word, idx_of, fire, pend, nslots):
    """Visit set bits in GREEDY GROUPS of ``nslots``: clusters accumulate
    into ``nslots - 1`` pending slots; the last one found fires
    ``fire(*slots, c)`` and empties the slots. ``pend`` is
    ``(slots_tuple, n)`` with ``n`` the live slot count; it carries across
    words/pages, and the caller drains the final leftovers with pair +
    single passes. Each loop iteration costs one scalar ctz chain; the
    heavy fused pass runs under a ``pl.when`` every ``nslots``-th admitted
    cluster."""
    def ctz(v):
        return jnp.round(jnp.log2(jnp.abs(
            v.astype(jnp.float32)))).astype(jnp.int32)

    def cond(c):
        return c[0] != 0

    def body(c):
        w, (slots, n) = c
        low = jnp.bitwise_and(w, jnp.int32(0) - w)
        cid = idx_of(ctz(low))
        full = n == nslots - 1

        @pl.when(full)
        def _():
            fire(*slots, cid)

        # Slot writes are no-ops when full (n matches no slot index), so
        # the reset below leaves stale ids behind n=0 — never re-read.
        new_slots = tuple(jnp.where(n == i, cid, s)
                          for i, s in enumerate(slots))
        nn = jnp.where(full, jnp.int32(0), n + 1)
        return jnp.bitwise_xor(w, low), (new_slots, nn)

    return jax.lax.while_loop(cond, body, (word, pend))[1]


def _chan_rpc(chan_mode: str) -> int:
    """Chan-block rows per cluster for a packing mode."""
    return 4 * NCHAN if chan_mode == "int8b4" else 3 * NCHAN


def _chan_sel(blk, pick):
    """Winner-attribute dot: (RPC, L) chan block x one-hot pick (L, TILE)
    -> exact f32 (NCHAN, TILE), dispatched on the BLOCK dtype.

    * bf16/f32: three [h; m; l] component groups, one default-precision
      dot, thirds summed — exact (24 mantissa bits = 3x8, one-hot sums a
      single product).
    * int8 ("int8b4"): four biased byte planes of the f32 BIT PATTERN
      ([b0; b1; b2; b3], byte-128 each — exact in int8), int8 pick, ONE
      s32-accumulating MXU dot (2x the bf16 rate on v5e, proven by the
      env fetch — ops/pallas_env.py:51-55), bytes re-biased and OR-packed
      back into the f32 bits in-kernel. Columns with no pick reassemble
      to garbage (0x80808080) — every caller masks its writes.
    """
    if blk.dtype == jnp.int8:
        p = pick.astype(jnp.int8)
        sel4 = jax.lax.dot_general(
            blk, p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # (4*NCHAN, TILE)
        b = [sel4[i * NCHAN:(i + 1) * NCHAN, :] + 128 for i in range(4)]
        word = jnp.bitwise_or(
            jnp.bitwise_or(b[0], jnp.left_shift(b[1], 8)),
            jnp.bitwise_or(jnp.left_shift(b[2], 16),
                           jnp.left_shift(b[3], 24)))
        return jax.lax.bitcast_convert_type(word, jnp.float32)
    p = pick.astype(jnp.bfloat16 if blk.dtype == jnp.bfloat16
                    else jnp.float32)
    sel3 = jax.lax.dot_general(
        blk, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (3*NCHAN, TILE)
    return (sel3[0:NCHAN, :] + sel3[NCHAN:2 * NCHAN, :]
            + sel3[2 * NCHAN:3 * NCHAN, :])


def _for_set_bits_carry(word, fn, init):
    """``_for_set_bits`` with a loop-carried value: ``fn(bit_index, carry)
    -> carry`` (used by the lagged epilogue to thread the pending cluster
    id through the visitation). Returns the final carry."""
    def cond(c):
        return c[0] != 0

    def body(c):
        w, p = c
        low = jnp.bitwise_and(w, jnp.int32(0) - w)
        dc = jnp.round(jnp.log2(jnp.abs(
            low.astype(jnp.float32)))).astype(jnp.int32)
        p2 = fn(dc, p)
        return jnp.bitwise_xor(w, low), p2

    return jax.lax.while_loop(cond, body, (word, init))[1]


# In-kernel coherence-sort key scheme (see _ray_bin_ids):
#   "oct_cell"   — 8 direction octants x 8 scene-halves origin cells (64+dead)
#   "oct_src"    — 8 octants x source 128-lane tile id (origin locality comes
#                  from the camera's pixel-block order instead of scene cells)
#   "oct24_cell" — octant x dominant direction axis (24 cones) x 8 cells
#   "oct_cell32" — 8 octants x 32 origin cells (4x4 in xz, 2 in y)
#   "morton_fine" — FULL bitonic sort by (dead | octant | 15-bit Morton
#                  origin cell | lane): a counting sort is O(bins x B) so it
#                  caps at ~64 coarse bins, but a bitonic network is
#                  O(B log^2 B) in cheap lane ops REGARDLESS of key
#                  granularity — 32x32x32 origin cells make each 128-ray
#                  tile as spatially pure as the sort window allows.
BIN_SCHEME = "oct_cell"

_LANE_BITS = 11      # morton_fine key layout: lane idx in the low bits


def _morton_fine_keys(rox, roy, roz, rdx, rdy, rdz, seed, bbox):
    """(1, B) int32 sort keys: dead(1) | octant(3) | morton15 | lane(11)."""
    B = rox.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def q5(v, lo, hi):
        x = (v - lo) * (31.999 / max(hi - lo, 1e-9))
        return jnp.clip(x.astype(jnp.int32), 0, 31)

    xq = q5(rox, bbox[0], bbox[3])
    yq = q5(roy, bbox[1], bbox[4])
    zq = q5(roz, bbox[2], bbox[5])
    morton = jnp.zeros_like(lane)
    for l in range(5):
        morton = jnp.bitwise_or(
            morton,
            jnp.left_shift(jnp.bitwise_and(jnp.right_shift(xq, l), 1),
                           3 * l + 2)
            | jnp.left_shift(jnp.bitwise_and(jnp.right_shift(zq, l), 1),
                             3 * l + 1)
            | jnp.left_shift(jnp.bitwise_and(jnp.right_shift(yq, l), 1),
                             3 * l))
    oct_ = ((rdx > 0).astype(jnp.int32)
            + 2 * (rdy > 0).astype(jnp.int32)
            + 4 * (rdz > 0).astype(jnp.int32))
    dead = (seed <= 0).astype(jnp.int32)
    return (lane
            + jnp.left_shift(morton, _LANE_BITS)
            + jnp.left_shift(oct_, _LANE_BITS + 15)
            + jnp.left_shift(dead, _LANE_BITS + 18))


def _bitonic_sort_row(x):
    """Ascending bitonic sort of a (1, B) int32 row along lanes.

    Batcher's network: log2(B)(log2(B)+1)/2 compare-exchange sweeps, each a
    pair of cyclic lane rolls + min/max/select — no gathers, no scalar loops.
    XOR partners never cross their 2j-block, so cyclic rolls are safe.
    """
    B = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    k = 2
    while k <= B:
        j = k // 2
        while j >= 1:
            lower = jnp.bitwise_and(lane, j) == 0
            asc = jnp.bitwise_and(lane, k) == 0
            # roll requires non-negative shifts: -j == B - j cyclically.
            pv = jnp.where(lower, pltpu.roll(x, B - j, axis=1),
                           pltpu.roll(x, j, axis=1))
            want_min = lower == asc
            x = jnp.where(want_min, jnp.minimum(x, pv), jnp.maximum(x, pv))
            j //= 2
        k *= 2
    return x


def _nbins(scheme: str = None) -> int:
    """Bin count for the given scheme (+1 dead bin, padded to % 8)."""
    raw = {"oct_cell": 65,
           "oct_src": 8 * (BLOCK // TILE) + 1,
           "oct24_cell": 24 * 8 + 1,
           "oct_cell32": 8 * 32 + 1}[scheme or BIN_SCHEME]
    return ((raw + 7) // 8) * 8


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
        # Every split component is bf16-representable (the 3rd up to the
        # truncation the MXU would apply anyway), so the bf16 cast is free
        # precision-wise and runs the dot at native bf16 operand width.
        p = jax.lax.dot_general(h.astype(jnp.bfloat16), P, dims,
                                preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    return out


def _ray_bin_ids(rox, roy, roz, rdx, rdy, rdz, seed, bbox, scheme=None):
    """(1, B) int32 coherence bin per ray; dead rays -> last bin.

    Key = direction octant (major: rays in one octant sweep the scene in the
    same order) x one origin-cell bit per axis around the scene center
    (minor: adjacent bins are spatially adjacent, so a 128-ray tile that
    straddles two bins still holds nearby rays). Dead rays (zero seed) group
    last — whole tiles of them skip every culling and triangle pass (perfect
    wavefront compaction at tile granularity). ``bbox`` is the static scene
    bounding box baked at accel-prep time.
    """
    scheme = scheme or BIN_SCHEME
    cx = 0.5 * (bbox[0] + bbox[3])
    cy = 0.5 * (bbox[1] + bbox[4])
    cz = 0.5 * (bbox[2] + bbox[5])
    oct_ = ((rdx > 0).astype(jnp.int32)
            + 2 * (rdy > 0).astype(jnp.int32)
            + 4 * (rdz > 0).astype(jnp.int32))
    if scheme == "oct_src":
        B = rox.shape[1]
        src = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1) // TILE
        key = oct_ * (B // TILE) + src
    elif BIN_SCHEME == "oct24_cell":
        ax_, ay, az = jnp.abs(rdx), jnp.abs(rdy), jnp.abs(rdz)
        dom = jnp.where((ax_ >= ay) & (ax_ >= az), 0,
                        jnp.where(ay >= az, 1, 2))
        cell = ((rox > cx).astype(jnp.int32)
                + 2 * (roy > cy).astype(jnp.int32)
                + 4 * (roz > cz).astype(jnp.int32))
        key = (oct_ * 3 + dom) * 8 + cell
    elif BIN_SCHEME == "oct_cell32":
        def quart(v, lo, hi):
            q1, q2, q3 = (lo + 0.25 * (hi - lo), 0.5 * (lo + hi),
                          lo + 0.75 * (hi - lo))
            return ((v > q1).astype(jnp.int32) + (v > q2).astype(jnp.int32)
                    + (v > q3).astype(jnp.int32))
        cell = ((quart(rox, bbox[0], bbox[3]) * 4
                 + quart(roz, bbox[2], bbox[5])) * 2
                + (roy > cy).astype(jnp.int32))
        key = oct_ * 32 + cell
    else:
        cell = ((rox > cx).astype(jnp.int32)
                + 2 * (roy > cy).astype(jnp.int32)
                + 4 * (roz > cz).astype(jnp.int32))
        key = oct_ * 8 + cell
    return jnp.where(seed > 0, key, _nbins(scheme) - 1)


def _bin_destinations(bin_id, scheme=None):
    """Stable counting sort by bin: (1, B) int32 -> (1, B) int32 positions.

    One-hot bin matrix (NBINS, B) + Hillis-Steele prefix sums along lanes
    (rank within bin) and along sublanes (bin offsets). All arithmetic in
    f32 on integer values < B — exact.
    """
    B = bin_id.shape[1]
    nbins = _nbins(scheme)
    sub = jax.lax.broadcasted_iota(jnp.int32, (nbins, B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nbins, B), 1)
    m = (bin_id == sub).astype(jnp.float32)             # (nbins, B) one-hot
    pref = m
    sh = 1
    while sh < B:
        rolled = pltpu.roll(pref, sh, axis=1)
        pref = pref + jnp.where(lane >= sh, rolled, 0.0)
        sh *= 2
    excl = pref - m                                     # rank within bin
    totals = jnp.sum(m, axis=1, keepdims=True)          # (nbins, 1)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (nbins, 1), 0)
    run = totals
    sh = 1
    while sh < nbins:
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
    return (d_col == j_iota).astype(jnp.bfloat16)       # 0/1: exact in bf16


def _trace_kernel(n_pages: int, bin_rays: bool, bbox, geom, merged: bool,
                  n_sph: int, order_ax, trav, bin_scheme, chan_mode,
                  page_axes,
                  rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                  seed_ref,
                  scx_ref, scy_ref, scz_ref, sr_ref, sattr_ref, gmisc_ref,
                  pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
                  pgaxd_ref,
                  cxmin_ref, cymin_ref, czmin_ref,
                  cxmax_ref, cymax_ref, czmax_ref,
                  cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref,
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
    out_chans = out_chans_and_scratch[:-2]
    S = out_chans_and_scratch[-2]            # (SROWS, BLOCK) scratch
    slot_ref = out_chans_and_scratch[-1]     # SMEM slot registers

    ins = jnp.concatenate(
        [rox_ref[0], roy_ref[0], roz_ref[0],
         rdx_ref[0], rdy_ref[0], rdz_ref[0], seed_ref[0],
         jnp.zeros((1, BLOCK), jnp.float32)], axis=0)    # (8, BLOCK)
    if bin_rays and bin_scheme == "morton_fine":
        keys = _morton_fine_keys(ins[0:1, :], ins[1:2, :], ins[2:3, :],
                                 ins[3:4, :], ins[4:5, :], ins[5:6, :],
                                 ins[6:7, :], bbox)
        src = jnp.bitwise_and(_bitonic_sort_row(keys),
                              jnp.int32((1 << _LANE_BITS) - 1))  # (1, B)
        i_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        P = (i_iota == src).astype(jnp.bfloat16)  # P[i, dst] = (src[dst]==i)
        A = _permute_exact(ins, P, 0)
    elif bin_rays:
        bins = _ray_bin_ids(ins[0:1, :], ins[1:2, :], ins[2:3, :],
                            ins[3:4, :], ins[4:5, :], ins[5:6, :],
                            ins[6:7, :], bbox, bin_scheme)
        P = _perm_matrix(_bin_destinations(bins, bin_scheme))
        A = _permute_exact(ins, P, 0)
    else:
        P = None
        A = ins

    if merged:
        # MERGED mode: ground + spheres run IN-KERNEL and seed both best-t
        # and the hit channels (row 6 of A carries the alive sentinel:
        # F32_MAX alive, 0 dead). Triangles then overwrite wherever strictly
        # closer — the kernel's outputs are the COMPLETE merged hit, and the
        # per-bounce XLA candidate/combine stages disappear entirely.
        _ground_sphere_init(A, S, A[6:7, :],
                            scx_ref[:], scy_ref[:], scz_ref[:], sr_ref[:],
                            sattr_ref[:], gmisc_ref[:], n_spheres=n_sph)
    else:
        S[:] = jnp.concatenate(
            [A[6:7, :], jnp.zeros((SROWS - 1, BLOCK), jnp.float32)],
            axis=0)           # row 0 = best_t (seed-init)

    _trace_block(geom, n_pages, order_ax, A, S,
                 (pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
                  pgaxd_ref),
                 (cxmin_ref, cymin_ref, czmin_ref,
                  cxmax_ref, cymax_ref, czmax_ref),
                 (cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref),
                 epl_ref, epn_ref, chan_ref, trav, chan_mode, page_axes,
                 slot_ref=slot_ref)

    OUT = _compact_hit(S)                    # (16, BLOCK)
    if bin_rays:
        OUT = _permute_exact(OUT, P, 1)      # inverse: back to ray order
    out_t_ref[0] = OUT[0:1, :]
    for c, oc in enumerate(out_chans):
        oc[0] = OUT[1 + c:2 + c, :]


def _compact_hit(S):
    """Gather the aligned SROWS hit scratch into the (16, BLOCK) record
    [t, n(3), albedo(3), specular(3), emission(3), smoothness, pad(2)] —
    with COUNT_PASSES the smoothness slot carries
    survived + 1000 * admitted instead."""
    if TRACK_WINNERS:
        last = S[ROW_WC:ROW_WC + 1, :] - 1.0   # -2 marks "no winner"
    elif COUNT_PASSES:
        last = (S[ROW_CNT:ROW_CNT + 1, :]
                + 1000.0 * S[ROW_ADM:ROW_ADM + 1, :])
    else:
        last = S[ROW_SMO:ROW_SMO + 1, :]
    return jnp.concatenate(
        [S[0:1, :], S[ROW_N:ROW_N + 3, :], S[ROW_ALB:ROW_ALB + 3, :],
         S[ROW_SPC:ROW_SPC + 3, :], S[ROW_EMI:ROW_EMI + 3, :], last,
         jnp.zeros((2, S.shape[1]), jnp.float32)], axis=0)


def _trace_block(geom, n_pages, order_ax, A, S, pg_refs, cl_refs, cb_refs,
                 epl_ref, epn_ref, chan_ref, trav=None, chan_mode=None,
                 page_axes=None, slot_ref=None):
    """Run the page/cluster/triangle machinery for one grid step.

    A: (>=7, BLOCK) ray matrix — rows 0-2 origin, 3-5 direction, 6 initial
    best-t (0 = dead ray). S: (16, BLOCK) VMEM scratch ref with row 0
    pre-seeded to the initial best-t; rows 0-13 hold [t, 13 hit channels]
    after the call (a triangle only overwrites rows where it beat row 0's
    seed). Shared by the single-bounce kernel and the full-path megakernel.
    """
    trav = trav or TRAV_MODE
    chan_mode = chan_mode or CHAN_MODE
    page_axes = PAGE_AXES if page_axes is None else page_axes
    defer = EPILOGUE_DEFER
    if EPILOGUE_LITE or geom not in ("mxu_f6", "mxu_f3", "mxu_pf3"):
        defer = False
    if defer is True:
        defer = "dots"
    assert defer in (False, "dots", "gid", "lag"), defer
    if defer == "lag" and (trav != "bitmask" or REGATE):
        # The pending-pass carry is only threaded through the bitmask
        # visitation loops (and a re-gate pl.when cannot return a carry).
        defer = False
    _groupable = (trav == "bitmask" and not REGATE and not defer
                  and not TRACK_WINNERS and not EPILOGUE_LITE
                  and geom in ("mxu_f6", "mxu_f3", "mxu_pf3")
                  and chan_mode in ("split3", "bf16s3", "int8b4"))
    group_n = ((8 if PASS_OCT else 4 if PASS_QUAD else 0)
               if _groupable else 0)
    pair = PASS_PAIR and _groupable and not group_n
    # Pipelined pair epilogue: probes that replace the attribute dot or
    # reorder writes bisect the IMMEDIATE epilogue, so they force pipe off.
    pipe2 = PAIR_PIPE and pair and EPILOGUE_MODE == "full"
    # Slotted pair epilogue (SLOT_EPI passes per attribute drain); the
    # EPILOGUE_MODE probes bisect the immediate epilogue, so they force it
    # off, as does pipe2 (mutually exclusive deferral schemes).
    slot_epi = (SLOT_EPI if (pair and not pipe2
                             and EPILOGUE_MODE == "full") else 0)
    slot_smem = bool(slot_epi and SLOT_SMEM and slot_ref is not None)
    assert not (defer and TRACK_WINNERS), \
        "EPILOGUE_DEFER and TRACK_WINNERS share ROW_WC"
    (pgx0_ref, pgy0_ref, pgz0_ref, pgx1_ref, pgy1_ref, pgz1_ref,
     pgaxd_ref) = pg_refs
    (cxmin_ref, cymin_ref, czmin_ref,
     cxmax_ref, cymax_ref, czmax_ref) = cl_refs
    (cbx0_ref, cby0_ref, cbz0_ref, cbx1_ref, cby1_ref, cbz1_ref) = cb_refs

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

        if geom in ("mxu_f6", "mxu_f3", "mxu_pf3"):
            # Fused-split ray operands: stack the bf16 components along the
            # contraction dim, paired with the [h,h,m,(h,l,m)] triangle-side
            # groups, so ONE default-precision dot computes the 6 (or 3)
            # exact bf16 products. t_num and t_den share the plane block, so
            # their ray vectors concatenate along LANES into a single dot.
            def fuse_ray(v):
                h, m, l = _split3(v)
                if geom == "mxu_f6":
                    return jnp.concatenate([h, m, h, l, h, m], axis=0)
                return jnp.concatenate([h, m, h], axis=0)

            B_e = fuse_ray(P8)                                   # (k, TILE)
            B_od = jnp.concatenate([fuse_ray(O4), fuse_ray(D4)],
                                   axis=1)                       # (k, 2*TILE)
            if FUSE_GEOM1:
                # Loop-invariant combined ray operand for the single-issue
                # geometry dot: columns 0:TILE pair with edge rows, columns
                # TILE:3*TILE with plane rows (cross terms are discarded).
                B_epd = jnp.concatenate([B_e, B_od], axis=1)     # (k, 3*TILE)

            def fuse_tri(blk):
                # Blocks are stored as three 8-row bf16-component groups —
                # [h; m; l] for f6/f3 (stacked along the contraction dim per
                # pass to pair with the fused ray operands), or PRE-FUSED
                # [h; h; m] for pf3 (dotted straight from VMEM).
                if geom == "mxu_pf3":
                    return blk
                h, m, l = blk[0:8], blk[8:16], blk[16:24]
                if geom == "mxu_f6":
                    return jnp.concatenate([h, h, m, h, l, m], axis=0)
                return jnp.concatenate([h, h, m], axis=0)

            def fused_dots(c):
                """The cluster's MXU work alone (no VPU epilogue): one
                fused-split edge dot + one plane dot (ONE combined dot
                under FUSE_GEOM1 — identical contractions, so the values
                are bit-identical)."""
                eblk = epl_ref[ds8(24, c, 24), :]
                pblk = epn_ref[ds8(24, c, 24), :]
                dims = (((0,), (0,)), ((), ()))
                if FUSE_GEOM1:
                    A = jnp.concatenate([fuse_tri(eblk), fuse_tri(pblk)],
                                        axis=1)                  # (k, 4K)
                    out = jax.lax.dot_general(
                        A, B_epd, dims,
                        preferred_element_type=jnp.float32)      # (4K, 3T)
                    e_all = out[0:3 * KSIZE, 0:TILE]
                    tnd = out[3 * KSIZE:4 * KSIZE, TILE:3 * TILE]
                    return e_all, tnd
                e_all = jax.lax.dot_general(
                    fuse_tri(eblk), B_e, dims,
                    preferred_element_type=jnp.float32)          # (3K, rays)
                tnd = jax.lax.dot_general(
                    fuse_tri(pblk), B_od, dims,
                    preferred_element_type=jnp.float32)          # (K, 2*TILE)
                return e_all, tnd

            def fused_epilogue(c, e_all, tnd):
                e01 = e_all[0:KSIZE, :]
                e12 = e_all[KSIZE:2 * KSIZE, :]
                e20 = e_all[2 * KSIZE:3 * KSIZE, :]
                t_num = tnd[:, 0:TILE]
                t_den = tnd[:, TILE:2 * TILE]
                return _winner_update(c, e01, e12, e20, t_num, t_den)

            def fused_dotsN(cs):
                """ALL N clusters' MXU work in one edge + one plane dot:
                the per-cluster operands concatenate along the OUTPUT
                lane axis (the contraction stays the 24 fused component
                rows), so N clusters cost the same two fixed ~650-cycle
                issues one cluster does."""
                eLs, pLs = [], []
                for c in cs:
                    eb = epl_ref[ds8(24, c, 24), :]
                    pb = epn_ref[ds8(24, c, 24), :]
                    eLs.append(fuse_tri(eb))
                    pLs.append(fuse_tri(pb))
                dims = (((0,), (0,)), ((), ()))
                if FUSE_GEOM1:
                    NK = len(cs) * KSIZE
                    A = jnp.concatenate(eLs + pLs, axis=1)  # (k, 4NK)
                    out = jax.lax.dot_general(
                        A, B_epd, dims,
                        preferred_element_type=jnp.float32)  # (4NK, 3*TILE)
                    e_all = out[0:3 * NK, 0:TILE]
                    tnd = out[3 * NK:4 * NK, TILE:3 * TILE]
                    return e_all, tnd
                e_all = jax.lax.dot_general(
                    jnp.concatenate(eLs, axis=1), B_e, dims,
                    preferred_element_type=jnp.float32)   # (3NK, rays)
                tnd = jax.lax.dot_general(
                    jnp.concatenate(pLs, axis=1), B_od, dims,
                    preferred_element_type=jnp.float32)   # (NK, 2*TILE)
                return e_all, tnd

        def best_t():
            return S[0:1, ls]

        def cluster_pass(c):
            """Re-gate cluster c against the CURRENT best-t, then test it.

            One (1, rays) slab test against broadcast bound rows: every hit
            recorded since this page's cluster-level culling ran tightens
            best-t, so clusters admitted at page entry are frequently dead by
            the time their turn comes — the scalar skip saves their dots.
            """
            if COUNT_PASSES:
                S[ROW_ADM:ROW_ADM + 1, ls] = \
                    S[ROW_ADM:ROW_ADM + 1, ls] + 1.0  # admitted (pre-re-gate)
            if not REGATE:
                return _cluster_body(c)
            row = ds8(1, c, 1)
            tmn = jnp.full((1, TILE), -_F32_MAX, jnp.float32)
            tmx = jnp.full((1, TILE), _F32_MAX, jnp.float32)
            for a, (r0, r1) in enumerate(((cbx0_ref, cbx1_ref),
                                          (cby0_ref, cby1_ref),
                                          (cbz0_ref, cbz1_ref))):
                t1 = (r0[row, :] - ro[a]) * inv[a]
                t2 = (r1[row, :] - ro[a]) * inv[a]
                tmn = jnp.maximum(tmn, jnp.minimum(t1, t2))
                tmx = jnp.minimum(tmx, jnp.maximum(t1, t2))
            live = ((tmx >= tmn) & (tmx > 0)
                    & (_entry_slack(jnp.maximum(tmn, 0.0)) < best_t()))

            @pl.when(jnp.any(live))
            def _():
                _cluster_body(c)

        def _cluster_body(c):
            """Dense (tris, rays) Pluecker test for cluster c + best update.

            Edge-side values are one MXU contraction of the cluster's packed
            (8, 3*KSIZE) edge-coefficient block against the per-ray Pluecker
            vectors; the plane distance is two more (8, KSIZE) contractions.
            Replaces a ~45-op VPU Moller-Trumbore with ~16 VPU ops + three
            small matmuls (math validated against MT97: front face iff
            n.d < -eps, inside iff all edge values <= 0, u = e20/sum,
            v = e01/sum).
            """
            if COUNT_PASSES:
                S[ROW_CNT:ROW_CNT + 1, ls] = S[ROW_CNT:ROW_CNT + 1, ls] + 1.0
            if geom in ("mxu_f6", "mxu_f3", "mxu_pf3"):
                e_all, tnd = fused_dots(c)
                return fused_epilogue(c, e_all, tnd)

            eblk = epl_ref[ds8(8, c, 8), :]  # (8, 3K)
            pblk = epn_ref[ds8(8, c, 8), :]  # (8, K)

            def row_col(blk, r, lane0=0, width=KSIZE):
                # (1, width) row slice of a VMEM block -> (width, 1) column
                # (the only Mosaic-supported in-kernel transpose shape).
                # Lane offsets must be 128-multiples, so the VPU modes
                # require the default KSIZE.
                assert KSIZE % 128 == 0, "vpu/hybrid modes need KSIZE=128"
                return _col(blk[r:r + 1, lane0:lane0 + width])

            if geom in ("vpu", "hybrid"):
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
                        if geom == "mxu_highest"
                        else jax.lax.Precision.HIGH)
                t_num = jax.lax.dot_general(
                    pblk, O4, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)          # (K, rays)
                t_den = jax.lax.dot_general(
                    pblk, D4, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)

            if geom == "vpu":
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
                prec = (jax.lax.Precision.DEFAULT if geom == "hybrid"
                        else jax.lax.Precision.HIGHEST
                        if geom == "mxu_highest"
                        else jax.lax.Precision.HIGH)
                e_all = jax.lax.dot_general(
                    eblk, P8, (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)          # (3K, rays)
                e01 = e_all[0:KSIZE, :]
                e12 = e_all[KSIZE:2 * KSIZE, :]
                e20 = e_all[2 * KSIZE:3 * KSIZE, :]
            return _winner_update(c, e01, e12, e20, t_num, t_den)

        def _winner_update(c, e01, e12, e20, t_num, t_den):
            """Hit test + winner select + attribute update for one cluster.

            The acceptance test is DIVISION-FREE (t = n/d with d < 0, so
            t > 0 <=> n < 0 and t < best <=> n > best*d), and the whole
            winner-selection epilogue — divide, key packing, min-reduce,
            attribute matmul — runs under a scalar skip: incoherent passes
            frequently test a cluster whose box overlaps the tile but where
            no triangle beats any ray's current best.
            """
            front = t_den <= -1e-8               # == MT97 det >= 1e-8
            # max-of-edges folds three sign tests into one compare.
            e_max = jnp.maximum(jnp.maximum(e01, e12), e20)
            ok = (front & (e_max <= 0.0)
                  & (t_num < 0.0) & (t_num > best_t() * t_den))
            any_ok = jnp.any(ok)

            def _gate(pred):
                # "nogates" perf probe: run the epilogue unconditionally
                # (all its writes are masked by `closer`, so this is
                # correctness-neutral) to measure the scalar-reduce +
                # branch drain the gates cost per pass.
                if EPILOGUE_MODE == "nogates":
                    return lambda fn: fn()
                return pl.when(pred)

            @_gate(any_ok)
            def _():
                t = t_num * (1.0 / jnp.where(front, t_den, 1.0))
                t_bits = jax.lax.bitcast_convert_type(
                    jnp.where(ok, t, _F32_MAX), jnp.int32)
                key = jnp.bitwise_or(jnp.bitwise_and(t_bits, ~LANE_MASK),
                                     sub_mat)
                win_key = jnp.min(key, axis=0, keepdims=True)  # (1, rays)
                t_win = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(win_key, ~LANE_MASK), jnp.float32)
                # Guard against the all-miss column: clearing the lane bits
                # makes the F32_MAX sentinel compare as slightly LESS than a
                # fresh sentinel, which would let garbage through.
                closer = (t_win < best_t()) & (t_win < _F32_MAX * 0.25)

                if EPILOGUE_LITE:
                    S[0:1, ls] = jnp.where(closer, t_win, S[0:1, ls])
                    return

                if defer in ("gid", "lag"):
                    # "gid"/"lag" defer: keep the winner reduces — exact
                    # t/u/v, measured ~free by the no_chan bisect — and
                    # store the winner's id (global triangle id for "gid",
                    # whose resolver runs post-sweep; lane+1 for "lag",
                    # whose cluster id rides the visitation carry and is
                    # resolved at the next admitted pass).
                    pick = (key == win_key).astype(jnp.float32)
                    ssum = e01 + e12 + e20
                    inv_s = 1.0 / jnp.where(jnp.abs(ssum) > 1e-30, ssum, 1.0)
                    t_sel = jnp.sum(jnp.where(pick > 0, t, 0.0), axis=0,
                                    keepdims=True)
                    u_sel = jnp.sum(jnp.where(pick > 0, e20 * inv_s, 0.0),
                                    axis=0, keepdims=True)
                    v_sel = jnp.sum(jnp.where(pick > 0, e01 * inv_s, 0.0),
                                    axis=0, keepdims=True)
                    lane = jnp.bitwise_and(win_key, LANE_MASK)
                    if defer == "lag":
                        gid = (1 + lane).astype(jnp.float32)
                    else:
                        gid = (c * KSIZE + 1 + lane).astype(jnp.float32)
                    S[0:1, ls] = jnp.where(closer, t_sel, S[0:1, ls])
                    S[ROW_U:ROW_U + 1, ls] = jnp.where(
                        closer, u_sel, S[ROW_U:ROW_U + 1, ls])
                    S[ROW_V:ROW_V + 1, ls] = jnp.where(
                        closer, v_sel, S[ROW_V:ROW_V + 1, ls])
                    S[ROW_GID:ROW_GID + 1, ls] = jnp.where(
                        closer, gid, S[ROW_GID:ROW_GID + 1, ls])
                    return

                if defer:
                    # "dots" defer: record only the lane-truncated winner t
                    # and the winning cluster id (two masked row writes); the
                    # attribute matmul + exact t/u/v reduces run ONCE per
                    # distinct winning cluster per tile in _resolve_deferred
                    # after the page sweep (which RE-RUNS the fused dots).
                    S[0:1, ls] = jnp.where(closer, t_win, S[0:1, ls])
                    S[ROW_WC:ROW_WC + 1, ls] = jnp.where(
                        closer,
                        (c + 1).astype(jnp.float32) + jnp.zeros_like(t_win),
                        S[ROW_WC:ROW_WC + 1, ls])
                    return

                if CLOSER_GATE:
                    # Second-level gate: a pass whose triangle hits beat no
                    # ray's current best writes nothing — skipping its
                    # whole attribute epilogue saves the ~650-cycle
                    # VPU->MXU->VPU round trip per transient-free pass.
                    @pl.when(jnp.any(closer))
                    def _():
                        _attr_epilogue(c, e01, e12, e20, t, key, win_key,
                                       closer)
                else:
                    _attr_epilogue(c, e01, e12, e20, t, key, win_key, closer)
                if TRACK_WINNERS:
                    # 1-based so the zero-initialized row means "no winner"
                    # (the emitted channel subtracts 1 back).
                    S[ROW_WC:ROW_WC + 1, ls] = jnp.where(
                        closer,
                        (c + 1).astype(jnp.float32) + jnp.zeros_like(t_win),
                        S[ROW_WC:ROW_WC + 1, ls])
            if defer == "lag":
                # The pending-cluster carry: this pass becomes pending iff
                # it had any accepted hit (any_ok is the gate predicate, so
                # it is available outside the gate for free). A hit pass
                # whose winners beat nobody leaves ROW_GID untouched (all
                # zero after the previous resolve) — its resolve is a
                # masked no-op.
                return jnp.where(any_ok, c, jnp.int32(-1))

        def cluster_passN(cs, pipe_store=False, slot_n=None):
            """One GROUP pass: N clusters' geometry in one fused dot pair,
            one shared winner select, one attribute dot over the
            concatenated N*K-triangle block. All ids in ``cs`` are distinct
            (each cluster is visited once; the greedy grouper never
            self-pairs). With ``pipe_store`` the attribute dot is left to
            the NEXT fired pass (PAIR_PIPE): the gated epilogue writes the
            exact t/u/v reduces plus winner lane+1 into ROW_GID instead.
            With ``slot_n`` (SLOT_EPI) it is left to the next DRAIN:
            ROW_GID records slot_n*N*K + winner lane + 1 so one drain dot
            resolves every slot's winners at once."""
            N = len(cs)
            if COUNT_PASSES:
                S[ROW_ADM:ROW_ADM + 1, ls] = \
                    S[ROW_ADM:ROW_ADM + 1, ls] + float(N)
                S[ROW_CNT:ROW_CNT + 1, ls] = \
                    S[ROW_CNT:ROW_CNT + 1, ls] + float(N)
            blk_h = None
            if HOIST_CHAN and not pipe_store and slot_n is None:
                RPC_h = _chan_rpc(chan_mode)
                blk_h = jnp.concatenate(
                    [chan_ref[ds8(RPC_h, c, RPC_h), :]
                     for c in cs], axis=1)               # (RPC, NK)
            e_all, tnd = fused_dotsN(cs)
            K = KSIZE
            bt = best_t()

            def part(i):
                e_off, t_row0 = 3 * K * i, K * i
                e01 = e_all[e_off:e_off + K, :]
                e12 = e_all[e_off + K:e_off + 2 * K, :]
                e20 = e_all[e_off + 2 * K:e_off + 3 * K, :]
                t_num = tnd[t_row0:t_row0 + K, 0:TILE]
                t_den = tnd[t_row0:t_row0 + K, TILE:2 * TILE]
                front = t_den <= -1e-8
                e_max = jnp.maximum(jnp.maximum(e01, e12), e20)
                ok = (front & (e_max <= 0.0)
                      & (t_num < 0.0) & (t_num > bt * t_den))
                return e01, e12, e20, t_num, t_den, front, ok

            hs = [part(i) for i in range(N)]
            any_ok = hs[0][6]
            for h in hs[1:]:
                any_ok = any_ok | h[6]
            any_ok = jnp.any(any_ok)
            gate = ((lambda fn: fn()) if EPILOGUE_MODE == "nogates"
                    else pl.when(any_ok))

            @gate
            def _():
                # log2(N*K) lane bits cover the N*K virtual lanes; the
                # coarser key truncation only affects the conservative
                # `closer` gate — the written t/u/v come from exact masked
                # reduces.
                LMN = jnp.int32(N * KSIZE - 1)

                def keyed(h, lane_off):
                    e01, e12, e20, t_num, t_den, front, ok = h
                    t = t_num * (1.0 / jnp.where(front, t_den, 1.0))
                    t_bits = jax.lax.bitcast_convert_type(
                        jnp.where(ok, t, _F32_MAX), jnp.int32)
                    key = jnp.bitwise_or(jnp.bitwise_and(t_bits, ~LMN),
                                         sub_mat + lane_off)
                    return t, key

                tks = [keyed(h, i * KSIZE) for i, h in enumerate(hs)]
                win_key = jnp.min(tks[0][1], axis=0, keepdims=True)
                for _, k in tks[1:]:
                    win_key = jnp.minimum(
                        win_key, jnp.min(k, axis=0, keepdims=True))
                t_win = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(win_key, ~LMN), jnp.float32)
                closer = (t_win < bt) & (t_win < _F32_MAX * 0.25)
                picks = [(k == win_key) for _, k in tks]

                def reduced(h, pick, t):
                    e01, e12, e20 = h[0], h[1], h[2]
                    ssum = e01 + e12 + e20
                    inv_s = 1.0 / jnp.where(jnp.abs(ssum) > 1e-30, ssum,
                                            1.0)
                    rt = jnp.sum(jnp.where(pick, t, 0.0), axis=0,
                                 keepdims=True)
                    ru = jnp.sum(jnp.where(pick, e20 * inv_s, 0.0),
                                 axis=0, keepdims=True)
                    rv = jnp.sum(jnp.where(pick, e01 * inv_s, 0.0),
                                 axis=0, keepdims=True)
                    return rt, ru, rv

                t_sel = u_sel = v_sel = None
                for h, pick, (t, _) in zip(hs, picks, tks):
                    rt, ru, rv = reduced(h, pick, t)
                    t_sel = rt if t_sel is None else t_sel + rt
                    u_sel = ru if u_sel is None else u_sel + ru
                    v_sel = rv if v_sel is None else v_sel + rv

                if pipe_store or slot_n is not None:
                    # Defer the attribute dot: record the exact winner
                    # rows + the winner's group lane (1-based; 0 = this
                    # pass won nothing for the ray, left by the caller's
                    # re-arm). The next fired pass (PAIR_PIPE) or the next
                    # slot drain (SLOT_EPI, lane offset slot_n*N*K over
                    # the batch's virtual lanes — f32-exact, <= 2048)
                    # rebuilds the one-hot pick from these.
                    lane_w = jnp.bitwise_and(win_key, LMN).astype(
                        jnp.float32)
                    if slot_n is not None:
                        lane_w = lane_w + (slot_n * (N * KSIZE)).astype(
                            jnp.float32)
                    S[0:1, ls] = jnp.where(closer, t_sel, S[0:1, ls])
                    S[ROW_U:ROW_U + 1, ls] = jnp.where(
                        closer, u_sel, S[ROW_U:ROW_U + 1, ls])
                    S[ROW_V:ROW_V + 1, ls] = jnp.where(
                        closer, v_sel, S[ROW_V:ROW_V + 1, ls])
                    S[ROW_GID:ROW_GID + 1, ls] = jnp.where(
                        closer, lane_w + 1.0, S[ROW_GID:ROW_GID + 1, ls])
                    return

                RPC = _chan_rpc(chan_mode)
                blk = blk_h if blk_h is not None else jnp.concatenate(
                    [chan_ref[ds8(RPC, c, RPC), :]
                     for c in cs], axis=1)                # (RPC, NK)
                if EPILOGUE_MODE in ("no_chan", "no_dot", "static_chan",
                                     "const_pick"):
                    sel = jnp.zeros((NCHAN, TILE), jnp.float32)  # probes
                else:
                    sel = _chan_sel(blk, jnp.concatenate(picks, axis=0))
                _chan_writeback(sel, t_sel, u_sel, v_sel, closer)

        def cluster_pass2(c0, c1):
            cluster_passN([c0, c1])

        def cluster_pass2_slot(a, b, n):
            cluster_passN([a, b], slot_n=n)

        def _slot_drain_smem():
            """SMEM-register drain: cluster ids read back at STATIC
            indices (slot_ref is zero-initialized per tile, so stale
            slots hold valid in-range ids whose lanes ROW_GID never
            references)."""
            _slot_drain(tuple(slot_ref[j] for j in range(2 * slot_epi)))

        def _slot_drain(cids):
            """Amortized attribute resolve of the last <= SLOT_EPI fired
            pair passes (SLOT_EPI mode). ROW_GID holds each ray's winning
            virtual lane + 1 over the batch's SLOT_EPI*2K slot lanes (0 =
            no triangle in the batch beat the ray); ROW_U/ROW_V (and t in
            row 0) already hold that winner's exact reduces from its own
            pass. One iota compare rebuilds the one-hot, the slots' chan
            blocks concatenate along lanes, ONE dot + ONE blend/write
            sequence lands the channels. A one-hot dot sums exactly one
            product whatever the operand width, so the written channels
            are bit-identical to the immediate epilogue's."""
            RPC = _chan_rpc(chan_mode)
            g_row = S[ROW_GID:ROW_GID + 1, ls]
            valid = g_row > 0.5

            @pl.when(jnp.any(valid))
            def _():
                lane = g_row.astype(jnp.int32) - 1
                L = len(cids) * KSIZE
                subL = jax.lax.broadcasted_iota(jnp.int32, (L, TILE), 0)
                pick = (subL == lane) & valid
                blk = jnp.concatenate(
                    [chan_ref[ds8(RPC, jnp.maximum(c, 0), RPC), :]
                     for c in cids], axis=1)             # (RPC, L)
                sel = _chan_sel(blk, pick)
                u_p = S[ROW_U:ROW_U + 1, ls]
                v_p = S[ROW_V:ROW_V + 1, ls]
                _chan_writeback(sel, u_p, u_p, v_p, valid, write_t=False)
                S[ROW_GID:ROW_GID + 1, ls] = jnp.zeros((1, TILE),
                                                       jnp.float32)

        def cluster_pass_group(*cs):
            cluster_passN(list(cs))

        def _pair_select2(pc0, pc1):
            """Pending PAIR pass attribute dot (PAIR_PIPE). Rebuilds the
            one-hot pick over the pair's 2K virtual lanes from ROW_GID
            (winner lane+1, 0 = not won by the pending pass) and the two
            carried cluster ids — nothing here depends on the current
            pass's compute, so the dot issues immediately. Also captures
            the pending u/v rows before the current pass overwrites them.
            Returns (sel, valid, u_p, v_p)."""
            RPC = _chan_rpc(chan_mode)
            g_row = S[ROW_GID:ROW_GID + 1, ls]
            u_p = S[ROW_U:ROW_U + 1, ls]
            v_p = S[ROW_V:ROW_V + 1, ls]
            valid = (g_row > 0.5) & (pc0 >= 0)
            lane = g_row.astype(jnp.int32) - 1
            sub2 = jax.lax.broadcasted_iota(
                jnp.int32, (2 * KSIZE, TILE), 0)
            pick = ((sub2 == lane) & valid)
            c0s = jnp.maximum(pc0, 0)
            c1s = jnp.maximum(pc1, 0)
            blk = jnp.concatenate(
                [chan_ref[ds8(RPC, c0s, RPC), :],
                 chan_ref[ds8(RPC, c1s, RPC), :]],
                axis=1)                                  # (RPC, 2K)
            sel = _chan_sel(blk, pick)
            return sel, valid, u_p, v_p

        def cluster_pass2_pipe(a, b, pc0, pc1):
            """Pair pass with the PIPELINED epilogue: issue the PENDING
            pair's attribute dot first (operands from rows stored last
            pass), re-arm ROW_GID, run this pass's geometry + winner
            reduces (its t/u/v land in-pass, keeping best-t exact), and
            only then consume the dot for the pending channel writes —
            the MXU gets the whole pass to finish, so the VPU never
            stalls on it. Write order and values match the immediate
            epilogue exactly (bit-identical images)."""
            sel_p, valid_p, u_p, v_p = _pair_select2(pc0, pc1)
            S[ROW_GID:ROW_GID + 1, ls] = jnp.zeros((1, TILE), jnp.float32)
            cluster_passN([a, b], pipe_store=True)
            _chan_writeback(sel_p, u_p, u_p, v_p, valid_p, write_t=False)

        def _pipe_flush(pc0, pc1):
            """Tile-end drain of the last pending pair pass."""
            sel_p, valid_p, u_p, v_p = _pair_select2(pc0, pc1)
            _chan_writeback(sel_p, u_p, u_p, v_p, valid_p, write_t=False)
            S[ROW_GID:ROW_GID + 1, ls] = jnp.zeros((1, TILE), jnp.float32)

        def _attr_epilogue(c, e01, e12, e20, t, key, win_key, mask):
            """Attribute matmul + exact t/u/v reduces + channel writes for
            the rays selected by ``mask`` (whose winner is in cluster c)."""
            # Winner attribute selection: pick is one-hot over triangles
            # for every ray column (lane bits make keys unique), so one
            # MXU matmul of the packed per-cluster attribute block
            # (NCHAN, tris) against pick (tris, rays) yields each
            # winner's attributes.
            pick = (key == win_key).astype(jnp.float32)    # (tris, rays)
            # Exact t and barycentrics of the winner (removes the key
            # truncation): one masked reduce each. Barycentrics from the
            # edge values: u = e20/sum, v = e01/sum.
            if EPILOGUE_MODE == "no_reduce":      # perf probe only
                t_sel = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(win_key, ~LANE_MASK), jnp.float32)
                u_sel = jnp.full_like(t_sel, 0.33)
                v_sel = jnp.full_like(t_sel, 0.33)
            else:
                ssum = e01 + e12 + e20
                inv_s = 1.0 / jnp.where(jnp.abs(ssum) > 1e-30, ssum, 1.0)
                t_sel = jnp.sum(jnp.where(pick > 0, t, 0.0), axis=0,
                                keepdims=True)
                u_sel = jnp.sum(jnp.where(pick > 0, e20 * inv_s, 0.0),
                                axis=0, keepdims=True)
                v_sel = jnp.sum(jnp.where(pick > 0, e01 * inv_s, 0.0),
                                axis=0, keepdims=True)
            _attr_writeback(c, pick, t_sel, u_sel, v_sel, mask)

        def _attr_writeback(c, pick, t_sel, u_sel, v_sel, mask,
                            write_t=True):
            """Attribute matmul + channel writes for the rays in ``mask``
            (whose winner is in cluster c, one-hot over ``pick``)."""
            _chan_writeback(_attr_select(c, pick), t_sel, u_sel, v_sel,
                            mask, write_t)

        def _attr_select(c, pick):
            """Winner attribute matmul for cluster ``c``: one MXU dot of
            the packed per-cluster attribute block against the one-hot
            ``pick`` -> (NCHAN, rays)."""
            if EPILOGUE_MODE == "const_pick":     # perf probe only
                # Same dot shapes, but the pick operand depends only on the
                # cluster id (not on this pass's fresh key/win_key values):
                # bisects the per-pass attr-dot cost into "dependency chain
                # on in-flight VPU data" vs "operand staging / issue".
                pick = (sub_mat == jnp.bitwise_and(
                    c, LANE_MASK)).astype(jnp.float32)
            if EPILOGUE_MODE in ("no_chan", "no_dot"):  # perf probe only
                sel = jnp.zeros((NCHAN, TILE), jnp.float32)
            elif EPILOGUE_MODE == "static_chan":        # perf probe only
                sel3 = jax.lax.dot_general(
                    chan_ref[0:3 * NCHAN, :], pick,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sel = (sel3[0:NCHAN, :] + sel3[NCHAN:2 * NCHAN, :]
                       + sel3[2 * NCHAN:3 * NCHAN, :])
            elif geom in ("mxu_f6", "mxu_f3", "mxu_pf3") \
                    and chan_mode not in ("split3", "bf16s3", "int8b4"):
                chan = chan_ref[ds8(NCHAN, c, NCHAN), :]
                sel = jnp.dot(chan, pick,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            elif geom in ("mxu_f6", "mxu_f3", "mxu_pf3"):
                # Attribute block stored as three bf16 components [h; m; l]
                # — an EXACT decomposition (24 mantissa bits = 3 x 8, and
                # h+m, m+l, and the total are all exactly representable,
                # so the f32 accumulation reconstructs the original
                # attribute bit-for-bit; "bf16s3" stores the components AS
                # bf16, lossless, half the operand staging bytes) — or as
                # four int8 byte planes of the f32 bit pattern ("int8b4",
                # also bit-exact: see _chan_sel). One dot either way.
                RPC = _chan_rpc(chan_mode)
                cblk = chan_ref[ds8(RPC, c, RPC), :]
                sel = _chan_sel(cblk, pick)
            else:
                chan = chan_ref[ds8(NCHAN, c, NCHAN), :]
                # HIGHEST: default MXU precision would truncate the
                # selected normals/materials to bf16.
                sel = jnp.dot(chan, pick,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            return sel

        def _chan_writeback(sel, t_sel, u_sel, v_sel, mask, write_t=True):
            """Normal blend + channel writes of selected attributes ``sel``
            for the rays in ``mask``."""
            w_sel = 1.0 - u_sel - v_sel
            if EPILOGUE_MODE == "no_chan":        # perf probe only
                if write_t:
                    S[0:1, ls] = jnp.where(mask, t_sel, S[0:1, ls])
                return
            # Smooth normal: barycentric blend of the winner's vertex
            # normals (channels 0-8 are n0/n1/n2 xyz), normalized, then
            # written as ONE stacked (3, rays) block — as are the
            # material channels (see the SROWS layout note).
            n_new = (sel[0:3, :] * w_sel + sel[3:6, :] * u_sel
                     + sel[6:9, :] * v_sel)
            d2 = (n_new[0:1, :] * n_new[0:1, :]
                  + n_new[1:2, :] * n_new[1:2, :]
                  + n_new[2:3, :] * n_new[2:3, :])
            n_new = n_new * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
            S[ROW_N:ROW_N + 3, ls] = jnp.where(
                mask, n_new, S[ROW_N:ROW_N + 3, ls])
            S[ROW_ALB:ROW_ALB + 3, ls] = jnp.where(
                mask, sel[9:12, :], S[ROW_ALB:ROW_ALB + 3, ls])
            S[ROW_SPC:ROW_SPC + 3, ls] = jnp.where(
                mask, sel[12:15, :], S[ROW_SPC:ROW_SPC + 3, ls])
            S[ROW_EMI:ROW_EMI + 3, ls] = jnp.where(
                mask, sel[15:18, :], S[ROW_EMI:ROW_EMI + 3, ls])
            S[ROW_SMO:ROW_SMO + 1, ls] = jnp.where(
                mask, sel[18:19, :], S[ROW_SMO:ROW_SMO + 1, ls])
            if write_t:
                S[0:1, ls] = jnp.where(mask, t_sel, S[0:1, ls])

        def _resolve_deferred():
            """Run the full attribute epilogue once per DISTINCT winning
            cluster in this tile (deferred-epilogue mode).

            After the page sweep, S[ROW_WC] holds each ray's winning cluster
            id + 1 (0 = ground/sphere/miss — their attributes were seeded by
            _ground_sphere_init and must not be touched). Each iteration
            resolves the highest remaining id: re-runs that cluster's fused
            dots, re-derives the per-ray winner key (the min over the
            cluster's accepting triangles IS the final winner — nothing else
            in the cluster beats it, and the best-t race is already settled),
            then runs the shared epilogue masked to the rays this cluster
            won. The max strictly decreases every iteration, so the loop
            runs exactly (distinct winning clusters) times — measured ~2-4
            per 128-ray tile vs ~17 hit passes.
            """
            # The loop condition must be PURE ON THE CARRY: a Pallas
            # while_loop cond cannot observe ref mutations (a cond that
            # reads S sees the loop-entry value forever, spins to the
            # bound, and the cf == 0 iterations then mask EVERY
            # ground/miss ray and overwrite it with garbage — a measured
            # 58-ray corruption on the test scene). The next cluster id
            # is therefore computed in the body AFTER clearing and
            # carried out.
            def cond(carry):
                i, cf = carry
                return (i < 128) & (cf > 0.5)

            def body(carry):
                i, cf = carry
                wc_row = S[ROW_WC:ROW_WC + 1, ls]
                c = cf.astype(jnp.int32) - 1
                e_all, tnd = fused_dots(c)
                e01 = e_all[0:KSIZE, :]
                e12 = e_all[KSIZE:2 * KSIZE, :]
                e20 = e_all[2 * KSIZE:3 * KSIZE, :]
                t_num = tnd[:, 0:TILE]
                t_den = tnd[:, TILE:2 * TILE]
                front = t_den <= -1e-8
                e_max = jnp.maximum(jnp.maximum(e01, e12), e20)
                ok = front & (e_max <= 0.0) & (t_num < 0.0)
                t = t_num * (1.0 / jnp.where(front, t_den, 1.0))
                t_bits = jax.lax.bitcast_convert_type(
                    jnp.where(ok, t, _F32_MAX), jnp.int32)
                key = jnp.bitwise_or(jnp.bitwise_and(t_bits, ~LANE_MASK),
                                     sub_mat)
                win_key = jnp.min(key, axis=0, keepdims=True)
                mask = wc_row == cf
                _attr_epilogue(c, e01, e12, e20, t, key, win_key, mask)
                cleared = jnp.where(mask, 0.0, wc_row)
                S[ROW_WC:ROW_WC + 1, ls] = cleared
                return i + 1, jnp.max(cleared)

            jax.lax.while_loop(cond, body,
                               (jnp.int32(0),
                                jnp.max(S[ROW_WC:ROW_WC + 1, ls])))

        def _resolve_gid():
            """Attribute write-back once per DISTINCT winning cluster
            ("gid" deferred-epilogue mode).

            After the sweep, S[ROW_GID] holds each ray's winning global
            triangle id + 1 (0 = ground/sphere/miss — their channels were
            seeded by _ground_sphere_init and must not be touched), and
            S[0]/ROW_U/ROW_V the winner's exact t/u/v. The per-pass attr
            dot costs ~650 cycles of VPU->MXU->VPU serialization per
            ISSUE regardless of size (measured: no_dot 123 vs full 201.5
            ms, gid-per-cluster resolver 210, chan block size irrelevant)
            — so each iteration extracts up to GID_BATCH distinct winning
            clusters (serial max/clear sweeps, VPU-only), concatenates
            their attribute blocks along lanes, and issues ONE wide dot:
            the serialization stall amortizes over every distinct winner
            in the tile. pick is rebuilt from the stored ids' lane
            offsets — no geometric dot re-run; channels are bit-identical
            to the per-pass epilogue (same one-hot, same blend). The next
            remaining id is carried out (a Pallas while_loop cond must be
            pure on the carry — see _resolve_deferred); ROW_GID ends
            all-zero, re-armed for the next grid step."""
            split = (chan_mode in ("split3", "bf16s3", "int8b4")
                     and geom in ("mxu_f6", "mxu_f3", "mxu_pf3"))
            RPC = _chan_rpc(chan_mode) if split else NCHAN

            def cond(carry):
                i, gf = carry
                return (i < 32) & (gf > 0.5)

            def body(carry):
                i, gf = carry
                g_row = S[ROW_GID:ROW_GID + 1, ls]
                gm1 = g_row - 1.0                    # global tri id, -1=none
                rem = g_row
                cur = gf
                picks, blks = [], []
                for _ in range(GID_BATCH):
                    c_j = (cur.astype(jnp.int32) - 1) // KSIZE  # -1 = empty
                    lo = (c_j * KSIZE + 1).astype(jnp.float32)
                    in_j = (rem >= lo) & (rem < lo + KSIZE) & (c_j >= 0)
                    rem = jnp.where(in_j, 0.0, rem)
                    cur = jnp.max(rem)
                    lane = gm1 - (lo - 1.0)
                    picks.append((sub_mat == lane.astype(jnp.int32))
                                 & (lane >= 0.0) & (lane < float(KSIZE))
                                 & (c_j >= 0))
                    c_safe = jnp.maximum(c_j, 0)
                    blks.append(chan_ref[
                        ds8(RPC, c_safe, RPC), :])
                blk = jnp.concatenate(blks, axis=1)  # (RPC, GID_BATCH*K)
                pick = jnp.concatenate(picks, axis=0).astype(
                    jnp.bfloat16 if blk.dtype == jnp.bfloat16
                    else jnp.float32)
                if EPILOGUE_MODE in ("no_chan", "no_dot", "static_chan"):
                    sel = jnp.zeros((NCHAN, TILE), jnp.float32)  # probes
                elif split:
                    sel = _chan_sel(blk, pick)
                else:
                    sel = jnp.dot(blk, pick,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                matched = (g_row > 0.5) & (rem == 0.0)
                _chan_writeback(sel, S[0:1, ls], S[ROW_U:ROW_U + 1, ls],
                                S[ROW_V:ROW_V + 1, ls], matched,
                                write_t=False)
                S[ROW_GID:ROW_GID + 1, ls] = rem
                return i + 1, cur

            jax.lax.while_loop(cond, body,
                               (jnp.int32(0),
                                jnp.max(S[ROW_GID:ROW_GID + 1, ls])))

        def _lag_select(c_p):
            """Pending-pass attribute dot ("lag" deferred-epilogue mode).

            c_p: the pending pass's cluster id (int32 scalar carried through
            the visitation loops; -1 = nothing pending). ROW_GID holds each
            ray's pending winner lane+1 (0 = not won by the pending pass).
            Rebuilds the one-hot pick from the lane bits and issues the
            attribute matmul — the caller places this back-to-back with the
            NEXT pass's geometric dots so both share one MXU issue island.
            Returns (sel, valid): selected channels and the write mask.
            """
            split = (chan_mode in ("split3", "bf16s3", "int8b4")
                     and geom in ("mxu_f6", "mxu_f3", "mxu_pf3"))
            RPC = _chan_rpc(chan_mode) if split else NCHAN
            g_row = S[ROW_GID:ROW_GID + 1, ls]          # lane+1, 0 = none
            valid = (g_row > 0.5) & (c_p >= 0)
            lane = g_row.astype(jnp.int32) - 1
            pick = ((sub_mat == lane) & valid).astype(jnp.float32)
            c_safe = jnp.maximum(c_p, 0)
            blk = chan_ref[ds8(RPC, c_safe, RPC), :]
            if EPILOGUE_MODE in ("no_chan", "no_dot", "static_chan"):
                sel = jnp.zeros((NCHAN, TILE), jnp.float32)  # perf probes
            elif split:
                sel = _chan_sel(blk, pick)
            else:
                sel = jnp.dot(blk, pick,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            return sel, valid

        def _lag_resolve(sel, valid):
            """Channel write-back of a pending pass (t/u/v already exact in
            their rows from the in-pass reduces) + re-arm ROW_GID."""
            _chan_writeback(sel, S[0:1, ls], S[ROW_U:ROW_U + 1, ls],
                            S[ROW_V:ROW_V + 1, ls], valid, write_t=False)
            S[ROW_GID:ROW_GID + 1, ls] = jnp.zeros((1, TILE), jnp.float32)

        def cluster_pass_lag(c, c_p):
            """Cluster pass with the LAGGED attribute epilogue: the pending
            pass's attribute dot issues adjacent to THIS pass's geometric
            dots (one VPU->MXU->VPU round trip per hit pass instead of
            two), then its channel writes land before this pass's winner
            reduces update the t/u/v/lane rows. Returns the new pending
            cluster id."""
            if COUNT_PASSES:
                S[ROW_ADM:ROW_ADM + 1, ls] = \
                    S[ROW_ADM:ROW_ADM + 1, ls] + 1.0
                S[ROW_CNT:ROW_CNT + 1, ls] = \
                    S[ROW_CNT:ROW_CNT + 1, ls] + 1.0
            sel, valid = _lag_select(c_p)       # VPU pick + MXU attr dot
            e_all, tnd = fused_dots(c)          # MXU, back-to-back
            _lag_resolve(sel, valid)            # VPU channel writes
            return fused_epilogue(c, e_all, tnd)

        def _lag_drain(c_p):
            """Resolve the final pending pass after the sweep."""
            sel, valid = _lag_select(c_p)
            _lag_resolve(sel, valid)

        def page_cols(g):
            bmin = tuple(_col(cref[g, :].reshape(1, PAGE))
                         for cref in (cxmin_ref, cymin_ref, czmin_ref))
            bmax = tuple(_col(cref[g, :].reshape(1, PAGE))
                         for cref in (cxmax_ref, cymax_ref, czmax_ref))
            return bmin, bmax

        pg_bmin = (pgx0_ref[:], pgy0_ref[:], pgz0_ref[:])
        pg_bmax = (pgx1_ref[:], pgy1_ref[:], pgz1_ref[:])

        if trav in ("priority", "priority_pipe"):
            # Distance-ordered sweep at both levels: the nearest admitted
            # page is culled and traversed first, its clusters visited in
            # entry order — so the first real hits land as early as possible
            # and the best-t cutoff ends each sweep (a transient winner that
            # a closer triangle would later beat is mostly never computed).
            # Page- and cluster-level culling are pruned by the seeded
            # best-t exactly as in bitmask mode (ground/sphere hits and
            # dead rays still eliminate boxes before any triangle work).
            pipe = (trav == "priority_pipe"
                    and geom in ("mxu_f6", "mxu_f3", "mxu_pf3"))

            def page_pass(g):
                bmin, bmax = page_cols(g)
                entry = _outer_aabb_entry(ro, inv, bmin, bmax, best_t())
                ecol = jnp.min(entry, axis=1, keepdims=True)   # (PAGE, 1)
                if not pipe:
                    _visit_by_distance(
                        ecol, best_t, lambda dc: cluster_pass(g * PAGE + dc))
                    return
                # Software-pipelined variant: cluster i+1's MXU dots are
                # issued BEFORE cluster i's VPU epilogue runs, so the two
                # units can overlap inside one loop body (the measured
                # bottleneck is ~650 cycles/hit-pass of VPU->MXU->VPU
                # serialization, invariant to dot size). The dots carry
                # across the while iteration; the first/last iterations
                # each waste at most one speculative dot pair.
                sub = jax.lax.broadcasted_iota(jnp.int32, (PAGE, 1), 0)
                bits = jax.lax.bitcast_convert_type(ecol, jnp.int32)
                keys0 = jnp.bitwise_or(
                    jnp.bitwise_and(bits, ~jnp.int32(127)), sub)

                def go_flag(wk):
                    # int32 bit-space compare (no scalar bitcast on Mosaic).
                    bt_bits = jnp.max(jax.lax.bitcast_convert_type(
                        best_t(), jnp.int32))
                    ent = jnp.bitwise_and(wk, ~jnp.int32(127))
                    return (ent < bt_bits) & (ent < jnp.int32(_CUT_I32))

                def cond(carry):
                    return carry[2]

                def body(carry):
                    keys, wk, _, c_cur, e_all, tnd = carry
                    keys2 = jnp.where(
                        sub == jnp.bitwise_and(wk, jnp.int32(127)),
                        jnp.int32(_INF_I32), keys)
                    wk2 = jnp.min(keys2)
                    c_next = g * PAGE + jnp.bitwise_and(wk2, jnp.int32(127))
                    e2, t2 = fused_dots(c_next)     # MXU, independent
                    if COUNT_PASSES:
                        S[ROW_ADM:ROW_ADM + 1, ls] = \
                            S[ROW_ADM:ROW_ADM + 1, ls] + 1.0
                        S[ROW_CNT:ROW_CNT + 1, ls] = \
                            S[ROW_CNT:ROW_CNT + 1, ls] + 1.0
                    fused_epilogue(c_cur, e_all, tnd)   # VPU, current
                    return keys2, wk2, go_flag(wk2), c_next, e2, t2

                wk0 = jnp.min(keys0)
                c0 = g * PAGE + jnp.bitwise_and(wk0, jnp.int32(127))
                e0, t0 = fused_dots(c0)   # speculative prologue dots
                jax.lax.while_loop(cond, body,
                                   (keys0, wk0, go_flag(wk0), c0, e0, t0))

            pg_entry = _outer_aabb_entry(ro, inv, pg_bmin, pg_bmax, best_t())
            pcol = jnp.min(pg_entry, axis=1, keepdims=True)     # (PW, 1)
            _visit_by_distance(pcol, best_t, page_pass)
            if defer and DEFER_RESOLVE:
                (_resolve_gid if defer == "gid" else _resolve_deferred)()
            return

        # "bitmask" ordering family: ascending cluster index sweeps the
        # scene along the prep-measured dominant axis (index-vs-centroid
        # correlation of the kd order); dual asc/desc bit packings are
        # selected by the sum-of-direction sign — per PAGE when the accel
        # carries per-page axis codes (kd recursion gives different pages
        # different dominant axes; the global axis mis-ordered ~40% of hit
        # passes into transient winners).
        d_dom = (rdx, rdy, rdz)[order_ax[0]]
        desc_global = (jnp.sum(d_dom) * order_ax[1]) < 0
        if page_axes:
            dsx, dsy, dsz = jnp.sum(rdx), jnp.sum(rdy), jnp.sum(rdz)

        pipe = trav == "bitmask_pipe" and geom in ("mxu_f6", "mxu_f3",
                                                   "mxu_pf3")

        def _ctz(w):
            """Index of the lowest set bit (garbage-safe: 0 when w == 0)."""
            low = jnp.bitwise_and(w, jnp.int32(0) - w)
            safe = jnp.where(w != 0, low, jnp.int32(1))
            return jnp.round(jnp.log2(jnp.abs(
                safe.astype(jnp.float32)))).astype(jnp.int32)

        def _pipe_word(word, idx_of):
            """ctz loop with the cluster dots software-pipelined: iteration
            i+1's MXU dots are issued before iteration i's VPU epilogue, so
            the units overlap (the measured per-hit-pass bottleneck was
            ~650 cycles of VPU->MXU->VPU serialization, invariant to dot
            size). Each word costs at most one speculative dot pair."""
            @pl.when(word != 0)
            def _():
                c0 = idx_of(_ctz(word))
                e0, t0 = fused_dots(c0)

                def cond(carry):
                    return carry[0] != 0

                def body(carry):
                    w, c_cur, e_all, tnd = carry
                    low = jnp.bitwise_and(w, jnp.int32(0) - w)
                    w2 = jnp.bitwise_xor(w, low)
                    c_next = idx_of(_ctz(w2))
                    e2, t2 = fused_dots(c_next)     # MXU, independent
                    if COUNT_PASSES:
                        S[ROW_ADM:ROW_ADM + 1, ls] = \
                            S[ROW_ADM:ROW_ADM + 1, ls] + 1.0
                        S[ROW_CNT:ROW_CNT + 1, ls] = \
                            S[ROW_CNT:ROW_CNT + 1, ls] + 1.0
                    fused_epilogue(c_cur, e_all, tnd)   # VPU, current
                    return w2, c_next, e2, t2

                jax.lax.while_loop(cond, body, (word, c0, e0, t0))

        def page_pass(g, pend=None):
            """Cluster-level culling for page g, then triangle passes.
            ``pend`` (lag mode): pending-cluster carry, threaded and
            returned."""
            bmin, bmax = page_cols(g)
            cl_hit = _outer_aabb(ro, inv, bmin, bmax, best_t())  # (128, TILE)
            flags = jnp.any(cl_hit, axis=1, keepdims=True)        # (128, 1)
            if page_axes:
                axv = pgaxd_ref[g, 0]        # sign * (axis + 1)
                absv = jnp.abs(axv)
                dsel = jnp.where(absv > 2.5, dsz,
                                 jnp.where(absv > 1.5, dsy, dsx))
                desc = (dsel * axv) < 0
            else:
                desc = desc_global
            words_a = _pack_flags_col(flags, sub_col)
            words_d = _pack_flags_col(flags, PAGE - 1 - sub_col)
            for w in range(4):
                word = jnp.where(desc, words_d[w], words_a[w])

                def idx_of(dc, w=w, desc=desc):
                    return g * PAGE + jnp.where(
                        desc, PAGE - 1 - (w * 32 + dc), w * 32 + dc)

                if pipe:
                    _pipe_word(word, idx_of)
                elif group_n:
                    pend = _for_set_bits_group(word, idx_of,
                                               cluster_pass_group, pend,
                                               group_n)
                elif pipe2:
                    pend = _for_set_bits_pair_pipe(
                        word, idx_of, cluster_pass2_pipe, pend)
                elif slot_smem:
                    pend = _for_set_bits_pair_slot_smem(
                        word, idx_of, cluster_pass2_slot, _slot_drain_smem,
                        pend, slot_epi, slot_ref)
                elif slot_epi:
                    pend = _for_set_bits_pair_slot(
                        word, idx_of, cluster_pass2_slot, _slot_drain,
                        pend, slot_epi)
                elif pair:
                    pend = _for_set_bits_pair(word, idx_of, cluster_pass2,
                                              pend)
                elif defer == "lag":
                    pend = _for_set_bits_carry(
                        word,
                        lambda dc, p, f=idx_of: cluster_pass_lag(f(dc), p),
                        pend)
                else:
                    _for_set_bits(word,
                                  lambda dc, f=idx_of: cluster_pass(f(dc)))
            return pend

        # Page-level culling: one (pages, rays) block over the page AABBs —
        # stored as narrow (PW, 1) columns with PW = pages rounded up to the
        # sublane quantum, so a 7-page scene pays for an (8, rays) slab test
        # rather than a MAX_PAGES-wide one. Pruned by the seeded best-t
        # (ground/sphere hits and dead rays eliminate pages before any
        # cluster work happens).
        pg_hit = _outer_aabb(ro, inv, pg_bmin, pg_bmax, best_t())
        pg_flags = jnp.any(pg_hit, axis=1, keepdims=True)
        PW = pg_flags.shape[0]
        sub_pg = jax.lax.broadcasted_iota(jnp.int32, (PW, 1), 0)
        pgw_a = _pack_flags_col(pg_flags, sub_pg)
        pgw_d = _pack_flags_col(pg_flags, PW - 1 - sub_pg)
        if group_n:
            pend = (tuple(jnp.int32(-1) for _ in range(group_n - 1)),
                    jnp.int32(0))
            for w in range(len(pgw_a)):
                word = jnp.where(desc_global, pgw_d[w], pgw_a[w])
                pend = _for_set_bits_carry(
                    word,
                    lambda dg, p, w=w: page_pass(
                        jnp.where(desc_global, PW - 1 - (w * 32 + dg),
                                  w * 32 + dg), p),
                    pend)
            slots, n = pend

            # Drain the 0..group_n-1 leftovers as pair passes plus at most
            # one single (slot index n-1 when n is odd).
            for k in range(0, group_n - 2, 2):
                @pl.when(n >= k + 2)
                def _(k=k):
                    cluster_pass2(slots[k], slots[k + 1])
            odd = slots[0]
            for i in range(2, group_n - 1, 2):
                odd = jnp.where(n - 1 == i, slots[i], odd)

            @pl.when(n % 2 == 1)
            def _():
                cluster_pass(odd)
            return
        if pipe2:
            pend = (jnp.int32(-1), jnp.int32(-1), jnp.int32(-1))
            for w in range(len(pgw_a)):
                word = jnp.where(desc_global, pgw_d[w], pgw_a[w])
                pend = _for_set_bits_carry(
                    word,
                    lambda dg, p, w=w: page_pass(
                        jnp.where(desc_global, PW - 1 - (w * 32 + dg),
                                  w * 32 + dg), p),
                    pend)
            p, pc0, pc1 = pend
            # Flush the last pending pair FIRST so the unpaired single's
            # best-t compare (and its immediate epilogue) see exactly the
            # state the non-pipelined order would have produced.
            _pipe_flush(pc0, pc1)

            @pl.when(p >= 0)
            def _():
                cluster_pass(p)        # drain the unpaired leftover
            return
        if pair:
            if slot_smem:
                # Zero the SMEM slot registers (static stores) so stale
                # drain reads stay in-range, and keep only (pend, n) in
                # the carry.
                for j in range(2 * slot_epi):
                    slot_ref[j] = jnp.int32(0)
                pend = (jnp.int32(-1), jnp.int32(0))
            elif slot_epi:
                pend = (jnp.int32(-1),
                        tuple(jnp.int32(0) for _ in range(2 * slot_epi)),
                        jnp.int32(0))
            else:
                pend = jnp.int32(-1)
            for w in range(len(pgw_a)):
                word = jnp.where(desc_global, pgw_d[w], pgw_a[w])
                pend = _for_set_bits_carry(
                    word,
                    lambda dg, p, w=w: page_pass(
                        jnp.where(desc_global, PW - 1 - (w * 32 + dg),
                                  w * 32 + dg), p),
                    pend)
            if slot_epi:
                # Final drain FIRST (full-width: lanes behind the re-armed
                # slot count are never referenced by ROW_GID), so the
                # unpaired single's immediate epilogue runs on a clean
                # ROW_GID and the channel state matches the non-slotted
                # write order exactly.
                if slot_smem:
                    p, _n = pend
                    _slot_drain_smem()
                else:
                    p, cids, _n = pend
                    _slot_drain(cids)

                @pl.when(p >= 0)
                def _():
                    cluster_pass(p)    # drain the unpaired leftover
                return

            @pl.when(pend >= 0)
            def _():
                cluster_pass(pend)     # drain the unpaired leftover
            return
        if defer == "lag":
            pend = jnp.int32(-1)
            for w in range(len(pgw_a)):
                word = jnp.where(desc_global, pgw_d[w], pgw_a[w])
                pend = _for_set_bits_carry(
                    word,
                    lambda dg, p, w=w: page_pass(
                        jnp.where(desc_global, PW - 1 - (w * 32 + dg),
                                  w * 32 + dg), p),
                    pend)
            if DEFER_RESOLVE:
                _lag_drain(pend)
            return
        for w in range(len(pgw_a)):
            word = jnp.where(desc_global, pgw_d[w], pgw_a[w])
            _for_set_bits(
                word,
                lambda dg, w=w: page_pass(
                    jnp.where(desc_global, PW - 1 - (w * 32 + dg),
                              w * 32 + dg)))
        if defer and DEFER_RESOLVE:
            (_resolve_gid if defer == "gid" else _resolve_deferred)()

    for r in range(A.shape[1] // TILE):
        row_body(r)


def _rows3(ref_or_val, r0):
    return (ref_or_val[r0:r0 + 1, :], ref_or_val[r0 + 1:r0 + 2, :],
            ref_or_val[r0 + 2:r0 + 3, :])


def _ground_sphere_init(A, S, alive_row, scx, scy, scz, sr, sattr, gmisc,
                        n_spheres: int = -1):
    """Seed S with the nearest ground/sphere candidate (aligned SROWS rows).

    A: (8, B) ray matrix (possibly permuted). Dead rays get best-t 0 so every
    later culling test fails. Triangle passes then only overwrite rows where
    they beat this seed — the kernel's final S rows ARE the merged hit.

    ``n_spheres``: static scene sphere count when known. 0 statically elides
    the whole sphere stage (quadratic + winner reduce + attribute matmul) —
    bit-identical to the full path for sphere-less scenes, where every
    padded-sphere candidate resolves to a miss anyway. Measured on the
    sphere-free 1080p/100k/8b bench: the elided stage was costing a large
    fraction of the frame purely in (8, B)-block VPU latency per
    (step, bounce) cell. -1 (unknown) keeps the full path.
    """
    B = A.shape[1]
    ro = _rows3(A, 0)
    rd = _rows3(A, 3)
    ro_blk = A[0:3, :]
    rd_blk = A[3:6, :]
    zero = jnp.zeros((1, B), jnp.float32)
    one = zero + 1.0

    # Ground plane y == 0 (compute:156-172).
    dy = rd[1]
    safe_dy = jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    tg = -ro[1] / safe_dy
    tg = jnp.where((tg > 0) & (gmisc[0:1, :] > 0), tg, _F32_MAX)

    if n_spheres == 0:
        hit_g = tg < _F32_MAX * 0.5
        n_g = jnp.concatenate([zero, one, zero], axis=0)     # (3, B)

        def pickg(g_blk):
            return jnp.where(hit_g, g_blk, 0.0)

        S[ROW_N:ROW_N + 3, :] = pickg(n_g)
        S[ROW_ALB:ROW_ALB + 3, :] = pickg(gmisc[1:4, :])
        S[ROW_SPC:ROW_SPC + 3, :] = pickg(gmisc[4:7, :])
        S[ROW_EMI:ROW_EMI + 3, :] = pickg(gmisc[7:10, :])
        S[ROW_SMO:ROW_SMO + 1, :] = pickg(gmisc[10:11, :])
        S[0:1, :] = jnp.where(alive_row > 0,
                              jnp.minimum(tg, _F32_MAX), 0.0)
        S[ROW_CNT:ROW_CNT + 6, :] = jnp.zeros((6, B), jnp.float32)
        return

    # Spheres: (Sp, B) broadcast quadratic (compute:175-196) — (Sp, 1)
    # sphere columns against (1, B) ray rows.
    ocx = ro[0] - scx
    ocy = ro[1] - scy
    ocz = ro[2] - scz
    p1 = -(rd[0] * ocx + rd[1] * ocy + rd[2] * ocz)
    p2sqr = p1 * p1 - (ocx * ocx + ocy * ocy + ocz * ocz) + sr * sr
    p2 = jnp.sqrt(jnp.maximum(p2sqr, 0.0))
    t_near = p1 - p2
    ts = jnp.where(t_near > 0, t_near, p1 + p2)
    ts = jnp.where((p2sqr >= 0) & (ts > 0), ts, _F32_MAX)   # (Sp, B)

    # Winner sphere via the pack-index-into-mantissa min (Sp <= 128).
    Sp = ts.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, (Sp, B), 0)
    mask = jnp.int32(127)
    key = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(ts, jnp.int32), ~mask),
        sub)
    wk = jnp.min(key, axis=0, keepdims=True)                 # (1, B)
    pick = (key == wk).astype(jnp.float32)                   # (Sp, B)
    sel = jax.lax.dot_general(sattr[:, :], pick, (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)  # (16, B)
    ts_min = jnp.sum(jnp.where(pick > 0, ts, 0.0), axis=0, keepdims=True)

    sphere_wins = ts_min < tg                                # tie -> ground
    t_ns = jnp.where(sphere_wins, ts_min, tg)
    hit_ns = t_ns < _F32_MAX * 0.5

    # Normals: ground (0,1,0); sphere normalize(pos - center). All channel
    # writes land as stacked (3, B) blocks at the aligned SROWS offsets.
    pos = ro_blk + t_ns * rd_blk                             # (3, B)
    n_s = pos - sel[10:13, :]
    d2 = (n_s[0:1, :] * n_s[0:1, :] + n_s[1:2, :] * n_s[1:2, :]
          + n_s[2:3, :] * n_s[2:3, :])
    n_s = n_s * jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
    n_g = jnp.concatenate([zero, one, zero], axis=0)         # (3, B)

    def pick3(s_blk, g_blk):
        return jnp.where(hit_ns, jnp.where(sphere_wins, s_blk, g_blk), 0.0)

    S[ROW_N:ROW_N + 3, :] = pick3(n_s, n_g)
    S[ROW_ALB:ROW_ALB + 3, :] = pick3(sel[0:3, :], gmisc[1:4, :])
    S[ROW_SPC:ROW_SPC + 3, :] = pick3(sel[3:6, :], gmisc[4:7, :])
    S[ROW_EMI:ROW_EMI + 3, :] = pick3(sel[6:9, :], gmisc[7:10, :])
    S[ROW_SMO:ROW_SMO + 1, :] = pick3(sel[9:10, :], gmisc[10:11, :])
    S[0:1, :] = jnp.where(alive_row > 0, jnp.minimum(t_ns, _F32_MAX), 0.0)
    # Zero the counter/deferral rows (CNT, ADM, WC, U, V, GID): the resolve
    # loops and the megakernel's bounce reuse both require them re-armed.
    S[ROW_CNT:ROW_CNT + 6, :] = jnp.zeros((6, B), jnp.float32)


@struct.dataclass
class PallasAccel:
    """Kernel-ready geometry, prepared host-side once per scene build.

    The kernel uses its own cluster granularity (KSIZE = 128 Morton-adjacent
    triangles, independent of cfg.cluster_size) because lane width dictates
    the efficient batch.
    """

    pgb: Tuple[jnp.ndarray, ...]     # 6 x (PW, 1) page bound columns
                                     # (min xyz, max xyz; PW = pages % 8)
    pgaxd: jnp.ndarray               # (PW, 1) per-page dominant-axis code:
                                     # sign * (axis + 1) of the strongest
                                     # index-vs-centroid correlation WITHIN
                                     # the page (prep-measured); drives
                                     # per-page asc/desc cluster visitation
    cl_cols: Tuple[jnp.ndarray, ...]  # 6 x (G, PAGE) cluster bounds
    cb_rows: Tuple[jnp.ndarray, ...]  # 6 x (Cp, TILE) lane-broadcast cluster
                                      # bounds (per-cluster re-gate rows)
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
    # Geometry numeric backend this accel was packed for (see GEOM_MODE):
    # the fused-split modes store epluck/eplane/chan as three stacked bf16
    # component groups (24 / 24 / 72 rows per cluster).
    geom: str = struct.field(pytree_node=False, default="mxu_highest")
    # Attribute-block numeric path the chan block was packed for (CHAN_MODE).
    chan_mode: str = struct.field(pytree_node=False, default="split3")
    # Traversal ordering (TRAV_MODE) and coherence-bin key scheme
    # (BIN_SCHEME) the kernel should run with — prep arguments so A/B runs
    # need no source edits.
    trav: str = struct.field(pytree_node=False, default="bitmask")
    # Per-page (instead of global) dominant-axis cluster ordering.
    page_axes: bool = struct.field(pytree_node=False, default=True)
    bin_scheme: str = struct.field(pytree_node=False, default="oct_cell")
    # (axis, sign): the spatial axis along which cluster INDEX increases
    # most strongly (index-vs-centroid correlation, baked at prep). The
    # kernel visits clusters ascending or descending by each tile's mean
    # direction along this axis, so first hits land early and the best-t
    # prune kills everything behind them.
    order_ax: Tuple[int, float] = struct.field(
        pytree_node=False, default=(0, 1.0))
    # Optional ground+sphere blocks for the full-path megakernel
    # (ops/pallas_path.py): (scx, scy, scz, sr) as (Sp, 1) columns, the
    # (16, Sp) per-sphere attribute block [albedo3, specular3, emission3,
    # smoothness, center xyz], and the (16, 1) ground block
    # [enabled, albedo3, specular3, emission3, smoothness]. None when the
    # accel was prepared without a scene.
    gs: Optional[Tuple[jnp.ndarray, ...]] = None
    # Static scene sphere count (-1 = unknown): 0 statically elides the
    # in-kernel sphere stage (see _ground_sphere_init).
    n_spheres: int = struct.field(pytree_node=False, default=-1)


def _split_rows(blocks: np.ndarray, n_terms: int,
                pattern: str = "hml") -> np.ndarray:
    """Host-side bf16 component split of per-cluster blocks.

    blocks: (C, R, L) f32. Returns (C * n_terms * R, L) f32 where each
    cluster's rows become n_terms stacked groups of bf16-representable
    values: pattern "hml" gives [h; m; (l)] with h + m (+ l) ~= x (exact
    for n_terms=3 up to the last bf16 rounding); pattern "hhm" gives the
    PRE-FUSED [h; h; m] arrangement the pf3 kernel dots directly.
    """
    C, R, L = blocks.shape
    blocks = np.ascontiguousarray(blocks, np.float32)
    # Component groups are written STRAIGHT into the packed output (the
    # obvious concatenate costs two extra full copies — at 100k triangles
    # that was most of the accel-build time).
    out = np.empty((C, n_terms * R, L), np.float32)

    def bf_into(x, dst):
        # Round-to-nearest-even to bf16 precision via uint32 bit ops
        # (ml_dtypes astype round-trips are ~10x slower at these sizes;
        # all inputs are finite so no NaN/inf handling is needed). All
        # intermediates land in ``dst`` — no temporaries.
        b = x.view(np.uint32)
        o = dst.view(np.uint32)
        np.right_shift(b, np.uint32(16), out=o)
        np.bitwise_and(o, np.uint32(1), out=o)
        np.add(o, b, out=o)
        np.add(o, np.uint32(0x7FFF), out=o)
        np.bitwise_and(o, np.uint32(0xFFFF0000), out=o)
        return dst

    h = bf_into(blocks, out[:, 0:R])
    r = blocks - h
    if pattern == "hhm":
        out[:, R:2 * R] = h
        bf_into(r, out[:, 2 * R:3 * R])
    else:
        m = bf_into(r, out[:, R:2 * R])
        if n_terms == 3:
            np.subtract(r, m, out=r)
            bf_into(r, out[:, 2 * R:3 * R])
    return out.reshape(-1, L)


def _prepare_ground_spheres(scene) -> Tuple[np.ndarray, ...]:
    """Pack ground plane + spheres into megakernel blocks (host-side).

    Reference behaviors folded in: IntersectGroundPlane (compute:156-172)
    and IntersectSphere (compute:175-196) — the megakernel runs both
    in-kernel so no per-bounce XLA candidate/combine work remains.
    """
    sp = scene.spheres
    mats = scene.materials
    S = int(sp.count)
    Sp = max(8, ((S + 7) // 8) * 8)
    if S > 128:
        # The in-kernel sphere block is one (Sp, rays) broadcast quadratic
        # with a 7-bit winner index — 128 spheres max. Larger sphere sets
        # return None so callers fall back to the per-bounce XLA candidate
        # path (O(S), unbounded), mirroring the reference's sphere-BVH
        # scale-out (RayTraceMaster.cs:703-722) rather than failing.
        from ..utils.logging import get_logger
        get_logger().warn(f"{S} spheres exceed the megakernel block cap "
                          "(128); using the per-bounce sphere candidate path")
        return None
    center = np.zeros((Sp, 3), np.float32)
    radius = np.zeros((Sp,), np.float32)
    if S:
        center[:S] = np.asarray(sp.center, np.float32)
        radius[:S] = np.asarray(sp.radius, np.float32)
    center[S:] = 1.0e30      # padded spheres: r=0 far away -> never hit
    cols = tuple(np.ascontiguousarray(center[:, k:k + 1]) for k in range(3))
    sr = np.ascontiguousarray(radius[:, None])

    sattr = np.zeros((16, Sp), np.float32)
    if S:
        mid = np.asarray(sp.material_id, np.int64)[:S]
        alb = np.asarray(mats.albedo, np.float32)[mid]
        spc = np.asarray(mats.specular, np.float32)[mid]
        emi = np.asarray(mats.emission, np.float32)[mid]
        smo = np.asarray(mats.smoothness, np.float32)[mid]
        sattr[0:3, :S] = alb.T
        sattr[3:6, :S] = spc.T
        sattr[6:9, :S] = emi.T
        sattr[9, :S] = smo
        sattr[10:13, :S] = center[:S].T

    gmisc = np.zeros((16, 1), np.float32)
    gid = int(np.asarray(scene.ground_material_id))
    gmisc[0, 0] = float(np.asarray(scene.ground_enabled))
    gmisc[1:4, 0] = np.asarray(mats.albedo, np.float32)[gid]
    gmisc[4:7, 0] = np.asarray(mats.specular, np.float32)[gid]
    gmisc[7:10, 0] = np.asarray(mats.emission, np.float32)[gid]
    gmisc[10, 0] = float(np.asarray(mats.smoothness)[gid])
    return cols + (sr, sattr, gmisc)


def _median_split_order(cent: np.ndarray, K: int) -> np.ndarray:
    """Exact-K-leaf kd ordering: recursive widest-axis median split, splits
    snapped to multiples of K so every leaf (except possibly the last) is a
    FULL kernel cluster.

    Replaces plain Morton-run clustering for the kernel's 128-triangle
    clusters: on the 100k-tri bench scene, Morton runs leave elongated
    overlapping boxes (mean extent 2.1 x 0.5 x 3.3, union volume 2.9x the
    scene, 8.9 cluster-AABB hits per random ray) while median-split leaves
    are compact (0.9^3, 0.41x, 2.2 hits) — ~4x less per-ray culling work.
    """
    out = []
    stack = [np.arange(len(cent))]
    while stack:
        idx = stack.pop()
        if len(idx) <= K:
            out.append(idx)
            continue
        c = cent[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        n_left = max(K, (len(idx) // 2 // K) * K)
        # argpartition: O(n) median split (a full sort here made accel
        # build ~25 s at 100k triangles; this brings it to ~1 s).
        part = np.argpartition(c[:, ax], n_left - 1)
        stack.append(idx[part[n_left:]])
        stack.append(idx[part[:n_left]])
    return np.concatenate(out)


def prepare_pallas_accel(accel, materials=None, scene=None, geom=None,
                         chan_mode=None, trav=None,
                         bin_scheme=None, page_axes=None,
                         page_sort=None) -> PallasAccel:
    """Pack kernel geometry from a ClusterAccel OR a raw Triangles soup
    (host-side numpy, not jittable).

    The kernel re-orders triangles with its own kd median split and never
    reads the LBVH tree, so ``build_accel`` hands the scene Triangles
    straight here for tracer="pallas" (building the radix tree only to
    discard it cost ~1 s at 100k triangles); a ClusterAccel is still
    accepted for callers that built one anyway (tests, debug tooling).

    ``materials``: the scene Materials table; per-triangle shading attributes
    are baked into the packed channel block so the kernel can output complete
    hit records without any XLA-side gathers. ``scene``: when given, ground +
    sphere blocks for the full-path megakernel are packed too.

    ``geom``/``chan_mode``/``trav``/``bin_scheme`` override the module-level
    defaults (GEOM_MODE etc.) and are recorded on the returned accel — the
    kernels follow the accel's fields, so A/B experiments are prep arguments,
    not source edits. ``page_sort`` is prep-only (it permutes the baked
    cluster order) and intentionally NOT recorded on the accel: the kernels
    have no sort-dependent behavior to follow.
    """
    geom = GEOM_MODE if geom is None else geom
    chan_mode = CHAN_MODE if chan_mode is None else chan_mode
    trav = TRAV_MODE if trav is None else trav
    bin_scheme = BIN_SCHEME if bin_scheme is None else bin_scheme
    page_axes = PAGE_AXES if page_axes is None else page_axes
    page_sort = PAGE_SORT if page_sort is None else page_sort
    tr = getattr(accel, "triangles", accel)   # ClusterAccel or raw Triangles
    v0 = np.asarray(tr.v0)
    v1 = np.asarray(tr.v1)
    v2 = np.asarray(tr.v2)
    T = len(v0)

    # Kd-order triangles so every 128-run is a compact median-split leaf
    # (see _median_split_order) — the kernel resolves all hit attributes
    # internally, so the reorder is invisible outside this function.
    if T > KSIZE:
        perm = _median_split_order(
            ((v0 + v1 + v2) / 3.0).astype(np.float64), KSIZE)
        v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    else:
        perm = np.arange(T)

    C = max((T + KSIZE - 1) // KSIZE, 1)
    Cp = ((C + PAGE - 1) // PAGE) * PAGE
    G = Cp // PAGE
    if G > MAX_PAGES:
        raise ValueError(
            f"scene too large for single-block page culling: {G} pages "
            f"(max {MAX_PAGES}, ~2M triangles); shard the scene")
    # Coarse VMEM short-circuit (~672 B/tri padded at the default modes):
    # way-oversize scenes skip the packing work before the exact check
    # below. 500k tris ~= 330 MB of blocks — far past the 126 MB ceiling
    # in every packing mode.
    if T > 500_000:
        raise PallasVmemError(
            f"{T} triangles exceed the megakernel's VMEM-resident accel "
            f"budget (~{(VMEM_CEILING_MB - VMEM_STACK_MB)} MB of packed "
            "blocks, ~150k triangles at defaults); falling back to the "
            "cluster tracer keeps rendering correct")
    Tp = Cp * KSIZE

    # Triangle gather map into the kd-ordered length-T arrays; -1 marks a
    # padding slot. PAGE_SORT re-orders each page's clusters by centroid
    # along the page's longest axis (prep-only; the kernel resolves all
    # hit attributes internally, so cluster order is pure visitation
    # order): ascending index then IS the front-to-back sweep the per-page
    # asc/desc flags assume, converting transient-winner hit passes into
    # best-t re-gate skips at zero per-visit cost.
    tgi = np.full((Tp,), -1, np.int64)
    tgi[:T] = np.arange(T)
    if page_sort and C > 1:
        centp = np.zeros((Tp, 3))
        centp[:T] = (v0 + v1 + v2) / 3.0
        rw = (tgi >= 0).reshape(Cp, KSIZE, 1)
        csum = (centp.reshape(Cp, KSIZE, 3) * rw).sum(axis=1)
        ccent_s = csum / np.maximum(rw.sum(axis=1), 1)
        cperm = np.arange(Cp)
        for p_ in range(G):
            lo_, hi_ = p_ * PAGE, min(C, (p_ + 1) * PAGE)
            if hi_ - lo_ > 2:
                seg = ccent_s[lo_:hi_]
                ax_ = int(np.argmax(seg.max(axis=0) - seg.min(axis=0)))
                cperm[lo_:hi_] = lo_ + np.argsort(seg[:, ax_],
                                                  kind="stable")
        tgi = tgi.reshape(Cp, KSIZE)[cperm].reshape(-1)
    realm = tgi >= 0
    _src = np.maximum(tgi, 0)

    def pad(a):
        if T == 0:
            return np.zeros((Tp,) + a.shape[1:], a.dtype)
        out = a[_src]          # fancy indexing already allocates a new array
        out[~realm] = 0
        return out

    v0p, v1p, v2p = pad(v0), pad(v1), pad(v2)
    e1 = v1p - v0p
    e2 = v2p - v0p

    # Cluster AABBs over real members only.
    mmin = np.minimum(np.minimum(v0p, v1p), v2p).reshape(Cp, KSIZE, 3)
    mmax = np.maximum(np.maximum(v0p, v1p), v2p).reshape(Cp, KSIZE, 3)
    real = realm.reshape(Cp, KSIZE, 1)
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
    # Page bounds as six narrow (PW, 1) columns, PW = pages rounded up to the
    # sublane quantum: the kernel's page slab test then scales with the REAL
    # page count (an (8, rays) test for a 7-page scene) instead of MAX_PAGES.
    PW = max(8 * ((G + 7) // 8), 8)
    pgb = []
    for src, k in [(pvmin, 0), (pvmin, 1), (pvmin, 2),
                   (pvmax, 0), (pvmax, 1), (pvmax, 2)]:
        col = np.full((PW, 1), _PAD_BOX, np.float32)
        col[:G, 0] = src[:, k]
        pgb.append(col)
    pgb = tuple(pgb)

    cl_cols = tuple(np.ascontiguousarray(cvmin[:, k].reshape(G, PAGE))
                    for k in range(3)) \
        + tuple(np.ascontiguousarray(cvmax[:, k].reshape(G, PAGE))
                for k in range(3))
    # Lane-broadcast copies of the same bounds ((Cp, TILE) rows): the
    # per-cluster best-t re-gate reads row c elementwise against the rays
    # (dynamic indexing is sublane-only on TPU, so the (G, PAGE) lane-major
    # layout above cannot serve per-cluster lookups).
    cb_rows = tuple(np.ascontiguousarray(
        np.repeat(arr[:, k:k + 1], TILE, axis=1))
        for arr, k in ((cvmin, 0), (cvmin, 1), (cvmin, 2),
                       (cvmax, 0), (cvmax, 1), (cvmax, 2)))

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

    # Packed per-triangle attribute block (NCHAN rows per cluster); the
    # attribute rows follow the kd reorder applied to the vertices above.
    n0 = pad(np.asarray(tr.n0)[perm])
    n1 = pad(np.asarray(tr.n1)[perm])
    n2 = pad(np.asarray(tr.n2)[perm])
    mid = pad(np.asarray(tr.material_id)[perm].astype(np.int64))
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

    if geom in ("mxu_f6", "mxu_f3", "mxu_pf3"):
        # Pre-split each per-cluster block into bf16-exact component groups
        # stacked along the sublane axis ([h; m; l] per cluster — or the
        # pre-fused [h; h; m] for pf3), so the kernel's fused
        # default-precision dots see only bf16-representable f32 operands
        # (see the GEOM_MODE comment at the top).
        geo_pat = "hhm" if geom == "mxu_pf3" else "hml"
        epluck = _split_rows(epluck.reshape(Cp, 8, 3 * KSIZE), 3, geo_pat)
        eplane = _split_rows(eplane.reshape(Cp, 8, KSIZE), 3, geo_pat)
        if chan_mode in ("split3", "bf16s3"):
            chan = _split_rows(chan.reshape(Cp, NCHAN, KSIZE), 3)
            if chan_mode == "bf16s3":
                # The [h; m; l] components are bf16-representable f32 by
                # construction — storing them AS bf16 is lossless and halves
                # both the VMEM block and the MXU operand staging.
                chan = chan.astype(jnp.bfloat16)  # ml_dtypes-backed, lossless
        elif chan_mode == "int8b4":
            # Four biased int8 byte planes of the f32 BIT PATTERN
            # ([b0; b1; b2; b3] per cluster, byte-128 each — exact in
            # int8): the kernel's s32 one-hot dot selects the winner's
            # bytes and reassembles the f32 bit-for-bit (_chan_sel).
            w = np.ascontiguousarray(
                chan.reshape(Cp, NCHAN, KSIZE)).view(np.uint32)
            planes = np.stack([(w >> s) & 0xFF for s in (0, 8, 16, 24)],
                              axis=1)                # (Cp, 4, NCHAN, K)
            chan = (planes.astype(np.int32) - 128).astype(np.int8) \
                .reshape(Cp * 4 * NCHAN, KSIZE)

    # Per-page dominant axis codes sign*(axis+1): within each page, which
    # spatial direction does ascending cluster index sweep? (The kd
    # median-split recursion gives different pages different dominant
    # axes; a single global axis mis-orders ~40% of hit passes into
    # transient winners, measured via TRACK_WINNERS in round 2.)
    ccent_all = 0.5 * (cvmin[:C] + cvmax[:C])
    pgaxd = np.ones((PW, 1), np.float32)
    for p_ in range(G):
        lo_, hi_ = p_ * PAGE, min(C, (p_ + 1) * PAGE)
        cc = ccent_all[lo_:hi_]
        if len(cc) > 2:
            ii = np.arange(len(cc), dtype=np.float64)
            ii -= ii.mean()
            cd = cc - cc.mean(axis=0)
            den = np.sqrt((ii ** 2).sum()) * \
                np.sqrt(np.maximum((cd ** 2).sum(axis=0), 1e-12))
            corr = (ii[:, None] * cd).sum(axis=0) / den
            ax_ = int(np.argmax(np.abs(corr)))
            pgaxd[p_, 0] = float(np.sign(corr[ax_]) or 1.0) * (ax_ + 1)

    # Dominant traversal axis: correlate cluster index with cluster centroid
    # per axis; the strongest (absolute) correlation tells which spatial
    # direction ascending cluster order sweeps.
    ccent = ccent_all
    if C > 2:
        idxs = np.arange(C, dtype=np.float64)
        idxs -= idxs.mean()
        cc = ccent - ccent.mean(axis=0)
        denom = np.sqrt((idxs ** 2).sum()) * \
            np.sqrt(np.maximum((cc ** 2).sum(axis=0), 1e-12))
        corr = (idxs[:, None] * cc).sum(axis=0) / denom
        ax = int(np.argmax(np.abs(corr)))
        order_ax = (ax, float(np.sign(corr[ax]) or 1.0))
    else:
        order_ax = (0, 1.0)

    # Host numpy leaves; callers device_put the pytree once per scene build.
    gs = _prepare_ground_spheres(scene) if scene is not None else None
    n_spheres = int(scene.spheres.count) if (scene is not None
                                             and gs is not None) else -1
    blocks_mb = _padded_mb([epluck, eplane, chan, *cb_rows, *cl_cols,
                            *pgb, pgaxd])
    if blocks_mb + VMEM_STACK_MB > VMEM_CEILING_MB:
        raise PallasVmemError(
            f"packed accel blocks need {blocks_mb:.1f} MB of scoped VMEM "
            f"(+{VMEM_STACK_MB} MB stack) — over the {VMEM_CEILING_MB} MB "
            f"ceiling for {T} triangles; falling back to the cluster "
            "tracer keeps rendering correct")
    return PallasAccel(pgb=pgb, pgaxd=pgaxd, cl_cols=cl_cols,
                       cb_rows=cb_rows,
                       epluck=epluck, eplane=eplane, chan=chan,
                       n_pages=G, bbox=bbox, geom=geom, chan_mode=chan_mode,
                       trav=trav, bin_scheme=bin_scheme,
                       page_axes=page_axes, gs=gs,
                       order_ax=order_ax, n_spheres=n_spheres)


@struct.dataclass
class ShardedPallasAccel:
    """VMEM-sized shards of one scene for the PER-BOUNCE Pallas path.

    Scenes past the single-accel scoped-VMEM ceiling (~150k triangles at
    defaults) but under the ~2M addressing bound split into contiguous
    ranges of ONE global kd median-split order (contiguous kd ranges are
    spatial subtrees, so each shard keeps compact culling boxes). The
    tracer chains the shards through the kernel's best-t seed — shard i+1
    culls against everything shards 0..i already hit — and the XLA combine
    picks the global closest. Exact: same winner as a single accel.

    Shards are stored STACKED (one PallasAccel whose array leaves carry a
    leading shard axis; every shard padded to identical shapes and
    identical statics) so the tracer can ``lax.scan`` over them: the
    kernel is then traced and Mosaic-compiled ONCE regardless of shard
    count. With one accel per shard in a Python loop, every shard
    compiled its own kernel even at identical shapes, because per-shard
    statics (``order_ax``, ``bbox``) were baked into distinct kernels —
    measured 36 min cold at 16 shards through the shared remote-compile
    queue, ~linear in shard count.
    """

    stacked: PallasAccel             # leaves: (n_shards, ...) per field
    n_shards: int = struct.field(pytree_node=False, default=1)

    @property
    def shards(self) -> Tuple[PallasAccel, ...]:
        """Per-shard views (leaf slices; statics shared) — introspection
        and the non-scan fallback path."""
        return tuple(
            jax.tree_util.tree_map(lambda a, k=k: a[k], self.stacked)
            for k in range(self.n_shards))


def _est_shard_tris() -> int:
    """Max triangles per shard so the packed blocks fit the VMEM budget
    (mirrors the prep shapes; exact check still runs per shard). The
    cluster count pads to a full page (PAGE clusters), so the worst-case
    padding page is budgeted too — without it a 133k shard's padded blocks
    measured just past the ceiling and dropped the scene to the cluster
    tracer."""
    lam = lambda x: -(-x // 128) * 128
    fused = GEOM_MODE in ("mxu_f6", "mxu_f3", "mxu_pf3")
    eg = 3 if fused else 1
    cg = 3 if fused else 1
    per_cluster = 4 * (eg * 8 * lam(3 * KSIZE) + eg * 8 * lam(KSIZE)
                       + 24 * cg * lam(KSIZE)) + 6 * TILE * 4
    budget = (VMEM_CEILING_MB - VMEM_STACK_MB - 4) * 2 ** 20 \
        - (PAGE - 1) * per_cluster
    return max(KSIZE, (budget // per_cluster) * KSIZE)


def prepare_pallas_accel_sharded(accel, materials=None, *,
                                 max_shard_tris: int = 0,
                                 **prep_kw) -> ShardedPallasAccel:
    """Split the scene into VMEM-sized kernel accels (see
    ShardedPallasAccel). ``max_shard_tris`` overrides the budget-derived
    shard size (tests). Raises PallasVmemError if even a shard overflows
    (callers fall back to the cluster tracer).

    Shards are EQUAL-SIZED (the last one padded with degenerate point
    triangles anchored at its final real vertex — det == 0 is rejected by
    the kernel's front test and the point AABB sits inside the shard, the
    ``shard_scene_pallas_accels`` convention) and share normalized statics
    (global ``bbox``, shard-0 ``order_ax`` — both perf-only: bbox seeds
    the binning quantization, order_ax is the page-axis fallback; the
    per-page ``pgaxd`` codes that actually drive visitation stay
    per-shard array leaves). Identical shapes + identical statics let the
    shards stack into ONE PallasAccel the tracer scans over, so the
    kernel compiles once for any shard count."""
    from ..scene import Triangles

    tr = getattr(accel, "triangles", accel)
    v0 = np.asarray(tr.v0)
    T = len(v0)
    cap = max_shard_tris or _est_shard_tris()
    n_shards = max(1, -(-T // cap))
    per = -(-T // n_shards)
    # ONE global kd order; shards are contiguous ranges of it.
    cent = ((np.asarray(tr.v0) + np.asarray(tr.v1) + np.asarray(tr.v2))
            / 3.0).astype(np.float64)
    perm = _median_split_order(cent, KSIZE) if T > KSIZE else np.arange(T)

    def take(a, idx, pad, fill):
        out = np.asarray(a)[idx]
        if pad:
            out = np.concatenate([out, np.repeat(fill, pad, axis=0)])
        return np.ascontiguousarray(out)

    shards = []
    for k in range(n_shards):
        idx = perm[k * per:(k + 1) * per]
        pad = per - len(idx)
        anchor = (np.asarray(tr.v0)[idx[-1:]] if len(idx)
                  else np.zeros((1, 3), np.float32))
        zero3 = np.zeros((1, 3), np.float32)
        zmid = np.zeros((1,), np.asarray(tr.material_id).dtype)
        sub = Triangles(v0=take(tr.v0, idx, pad, anchor),
                        v1=take(tr.v1, idx, pad, anchor),
                        v2=take(tr.v2, idx, pad, anchor),
                        n0=take(tr.n0, idx, pad, zero3),
                        n1=take(tr.n1, idx, pad, zero3),
                        n2=take(tr.n2, idx, pad, zero3),
                        material_id=take(tr.material_id, idx, pad, zmid))
        shards.append(prepare_pallas_accel(sub, materials, **prep_kw))

    if T:
        gv0, gv1, gv2 = v0[perm], np.asarray(tr.v1)[perm], \
            np.asarray(tr.v2)[perm]
        lo = np.minimum(np.minimum(gv0, gv1), gv2).min(axis=0)
        hi = np.maximum(np.maximum(gv0, gv1), gv2).max(axis=0)
        bbox = tuple(float(x) for x in np.concatenate([lo, hi]))
    else:
        bbox = shards[0].bbox
    shards = [s.replace(bbox=bbox, order_ax=shards[0].order_ax)
              for s in shards]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
    return ShardedPallasAccel(stacked=stacked, n_shards=n_shards)


N_OUTS = 14  # t + normal(3) + albedo(3) + specular(3) + emission(3) + smooth


def _pallas_triangle_trace(pa: PallasAccel, ro, rd, seed, interpret: bool,
                           bin_rays: bool = False, merged: bool = False):
    """Run the kernel over all rays. ro/rd: Vec3 of (N,), N % BLOCK == 0.

    ``seed``: (N,) best-t upper bound per ray (non-triangle candidate hit
    distance; 0 for dead rays, <= _F32_MAX always). ``bin_rays`` enables the
    in-kernel coherence sort (use on incoherent bounces; bit-identical
    results either way).

    ``merged``: ground + spheres run in-kernel (pa.gs blocks) and the
    outputs are the COMPLETE merged hit — seed then only carries the alive
    sentinel (F32_MAX alive / 0 dead) and t == _F32_MAX marks a miss.

    Returns 14 (N,) arrays: t, nx, ny, nz, albedo rgb, specular rgb,
    emission rgb, smoothness. Without ``merged``, t stays == seed where no
    triangle beat it.
    """
    pgb, cl_cols, n_pages = pa.pgb, pa.cl_cols, pa.n_pages
    N = ro[0].shape[0]
    n_steps = N // BLOCK
    if merged:
        gs = pa.gs
    else:
        # Placeholder blocks keep the kernel signature static.
        gs = (jnp.zeros((8, 1), jnp.float32),) * 4 \
            + (jnp.zeros((16, 8), jnp.float32), jnp.zeros((16, 1), jnp.float32))

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

    kernel = functools.partial(_trace_kernel, n_pages, bin_rays, pa.bbox,
                               pa.geom, merged, pa.n_spheres, pa.order_ax,
                               pa.trav, pa.bin_scheme, pa.chan_mode,
                               pa.page_axes)
    # The scene-resident blocks (edge Pluecker + plane + attributes) exceed
    # the 16 MB default scoped-VMEM budget for large scenes; v5e has 128 MB.
    params = pltpu.CompilerParams(vmem_limit_bytes=scoped_vmem_limit(pa))
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[blk_spec] * 7 + [full()] * (6 + 7 + 6 + 6 + 3),
        out_specs=[blk_spec] * N_OUTS,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((SROWS, BLOCK), jnp.float32),
                        pltpu.SMEM((2 * max(SLOT_EPI, 1),), jnp.int32)],
        compiler_params=None if interpret else params,
        interpret=interpret,
    )(*ray_in, *gs, *pgb, pa.pgaxd, *cl_cols, *pa.cb_rows,
      pa.epluck, pa.eplane, pa.chan)

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


def _merged_pallas_hit(pa: PallasAccel, ro, rd, alive, interpret: bool,
                       bin_rays: bool) -> Hit:
    """Complete hit record from ONE kernel call (ground + spheres + BVH
    triangles merged in-kernel; replaces the XLA candidates + combine of the
    reference's Trace, RayTraceShader.compute:364-383)."""
    N = ro[0].shape[0]
    if alive is None:
        seed = jnp.full((N,), _F32_MAX, jnp.float32)
    else:
        seed = jnp.where(alive, _F32_MAX, 0.0)
    pad = (-N) % BLOCK
    if pad:
        zpad = jnp.zeros((pad,), ro[0].dtype)
        ro = tuple(jnp.concatenate([c, zpad]) for c in ro)
        rd = (jnp.concatenate([rd[0], zpad]),
              jnp.concatenate([rd[1], zpad - 1.0]),
              jnp.concatenate([rd[2], zpad]))
        seed = jnp.concatenate([seed, zpad])

    outs = _pallas_triangle_trace(pa, ro, rd, seed, interpret, bin_rays,
                                  merged=True)
    outs = tuple(o[:N] for o in outs)
    ro = tuple(c[:N] for c in ro)
    rd = tuple(c[:N] for c in rd)
    # Misses carry the F32_MAX sentinel; dead rays carry their zero seed —
    # both report INF (the dead-ray case matters only for direct tracer
    # calls; the renderer's alive mask already excludes them).
    t = jnp.where((outs[0] >= _F32_MAX * 0.5) | (outs[0] <= 0.0), INF,
                  outs[0])
    tc = jnp.minimum(t, 1.0e30)   # keeps miss positions finite (0 * INF)
    pos = (ro[0] + tc * rd[0], ro[1] + tc * rd[1], ro[2] + tc * rd[2])
    return Hit(t=t, position=pos, normal=outs[1:4], albedo=outs[4:7],
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
        accel = prepare_pallas_accel(accel, scene.materials, scene=scene)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    if accel is not None:
        accel = jax.tree_util.tree_map(jnp.asarray, accel)

    sharded = isinstance(accel, ShardedPallasAccel)
    merged = (has_tris and accel is not None and not sharded
              and accel.gs is not None)

    def tracer(ro, rd, alive=None, bin_rays: bool = False) -> Hit:
        """ro/rd: Vec3 tuples of (N,); ``alive`` is an optional (N,) bool
        mask — dead rays are zero-seeded so the kernel skips all of their
        culling and triangle work (tile-granular wavefront compaction).
        ``bin_rays`` turns on the in-kernel coherence sort (incoherent
        bounces; results are bit-identical either way)."""
        if merged:
            # Ground + spheres fold into the kernel (accel carries the
            # packed blocks): no XLA candidate/combine work per bounce.
            return _merged_pallas_hit(accel, ro, rd, alive, interpret,
                                      bin_rays)
        cands = [_ground_candidate(scene, ro, rd),
                 _sphere_candidate(scene, ro, rd)]
        if has_tris:
            # Seed the kernel's best-t with the nearest non-triangle hit:
            # page/cluster culling then discards everything behind it.
            seed = jnp.minimum(cands[0]["t"], cands[1]["t"])
            if alive is not None:
                seed = jnp.where(alive, seed, 0.0)
            if sharded and SHARD_SCAN and accel.n_shards > 1:
                # Chain shards through the tightening best-t seed: shard
                # i+1 culls against everything 0..i hit (exact — same
                # winner as a single accel). lax.scan over the STACKED
                # shard accel traces + compiles the kernel ONCE for any
                # shard count (the Python loop compiled one kernel per
                # shard: ~36 min cold at 16 shards); the nearest-wins
                # fold rides the carry, so this reproduces the
                # loop+combine left-fold exactly (strict '<': a later
                # shard can never tie an earlier one — its kernel only
                # reports hits strictly inside the tightened seed).
                best = fold_candidate(cands[0], cands[1])

                def shard_step(carry, sh):
                    seed, best = carry
                    cand = _triangle_pallas_candidate(
                        sh, ro, rd, interpret, seed, bin_rays)
                    return (jnp.minimum(seed, cand["t"]),
                            fold_candidate(best, cand)), None

                (_, best), _ = jax.lax.scan(
                    shard_step, (seed, best), accel.stacked)
                cands = [best]
            elif sharded:
                # Non-scan fallback (SHARD_SCAN=False A/B control): one
                # kernel per shard through per-shard leaf views.
                for sh in accel.shards:
                    cand = _triangle_pallas_candidate(sh, ro, rd, interpret,
                                                      seed, bin_rays)
                    seed = jnp.minimum(seed, cand["t"])
                    cands.append(cand)
            else:
                cands.append(_triangle_pallas_candidate(
                    accel, ro, rd, interpret, seed, bin_rays))
        return combine_candidates(scene, ro, rd, cands)

    return tracer
