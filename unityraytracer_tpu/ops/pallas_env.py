"""MXU environment lookup: one-hot factorized RGBE texel fetch.

The equirect skybox tap is the last per-ray gather in the frame
(``ops/shade.py:sample_skybox_rgbe``; reference behavior
``RayTraceShader.compute:424-426`` — sky sampled at ray miss). XLA lowers
per-ray gathers to a serial loop on TPU (~22 ns/element measured), so the
single stochastic tap still costs ~45 ms for a 2M-ray frame — a quarter of
the whole frame budget, for 512 KB of texture.

This kernel replaces the serial gather with dense MXU/VPU work:

* the packed RGBE plane is split into four byte planes (values 0-255 are
  EXACT in bf16) laid out as one ``(H, 4W)`` table resident in VMEM;
* per block of ``B`` rays, a one-hot row matrix over ``y`` (``(H, B)``
  bf16, built by iota compare) contracts with the table in ONE dot —
  each ray's full texture row, all four planes, exactly (a one-hot dot
  sums a single exact product);
* a one-hot column mask over ``x`` then multiply-reduces each ``(W, B)``
  plane segment on the VPU — again a single exact product per ray;
* the RGBE decode (``byte * 2^(e-136)``) matches ``_decode_rgbe``
  op-for-op, so results are BIT-IDENTICAL to the gather path.

Cost: rays x texels x 4 bytes MACs on the MXU — ~2.2 TFLOP(bf16) for a
2M-ray frame against a 256x512 sky, ~11 ms of MXU time vs ~45 ms of serial
gather. The trade inverts for big maps (a 2K HDRI table would not fit
VMEM): ``usable()`` gates on table size and the caller falls back to the
gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rays per grid step. The acc intermediate is (4W, B) f32 in VMEM
# (8 MB at W=512, B=1024); grid steps pipeline over ray blocks.
ENV_BLOCK = 1024
# Largest table the kernel will take: (H, 4W) bf16 must leave VMEM room
# for acc + one-hots. 512K texels = 4 MB table.
MAX_TEXELS = 1 << 19
# Fetch implementation (A/B'd on v5e, 1080p bench sky 256x512, 2M rays):
#   "bf16"   — original: one 1024-ray chunk per grid step, (steps, 8, B)
#              padded operand/result blocks (6 input + 5 output rows dead).
#   "bf16x8" — EIGHT chunks per grid step: dense (steps8, 8, B) y/x operands
#              and three dense r/g/b outputs — no pad concat XLA-side, no
#              strided row extract; same bf16 MXU dots.
#   "int8x8" — bf16x8 with the table and one-hots in int8 (bytes biased by
#              -128, exact in int8; s32 accumulation then +128 restores the
#              byte) — the v5e MXU runs int8 at 2x the bf16 rate, and the
#              result stays BIT-identical to the gather path.
ENV_IMPL = "int8x8"


def usable(H: int, W: int) -> bool:
    """True when the MXU path supports this map (VMEM + layout limits)."""
    return H % 8 == 0 and W % 128 == 0 and H * W <= MAX_TEXELS


def _env_kernel(H, W, yx_ref, tab_ref, out_ref):
    B = yx_ref.shape[-1]
    yn = yx_ref[0, 0:1, :]                                # (1, B)
    xn = yx_ref[0, 1:2, :]
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, B), 0)
    oh_y = (iy == yn).astype(jnp.bfloat16)                # (H, B)
    acc = jax.lax.dot_general(
        tab_ref[:], oh_y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (4W, B)
    ix = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    oh_x = (ix == xn).astype(jnp.float32)                 # (W, B)

    def pick(p):
        seg = acc[p * W:(p + 1) * W, :]
        return jnp.sum(seg * oh_x, axis=0, keepdims=True)  # (1, B)

    r, g, b, e = pick(0), pick(1), pick(2), pick(3)
    # _decode_rgbe op-for-op: scale = e > 0 ? 2^(e-136) : 0.
    scale = jnp.where(e > 0.0, jnp.exp2(e - 136.0), 0.0)
    out_ref[0, 0:1, :] = r * scale
    out_ref[0, 1:2, :] = g * scale
    out_ref[0, 2:3, :] = b * scale
    out_ref[0, 3:8, :] = jnp.zeros((5, B), jnp.float32)


def _env_kernel8(H, W, dtype, y_ref, x_ref, tab_ref, r_ref, g_ref, b_ref):
    """Eight ray chunks per grid step: row j of every (1, 8, B) block is
    chunk j. Operands and results are fully dense — no pad rows, no
    XLA-side concat/strided-extract glue. ``dtype`` selects bf16 dots or
    int8 dots with s32 accumulation (see ENV_IMPL)."""
    B = y_ref.shape[-1]
    int8 = dtype == jnp.int8
    for j in range(8):
        yn = y_ref[0, j:j + 1, :]                         # (1, B)
        xn = x_ref[0, j:j + 1, :]
        iy = jax.lax.broadcasted_iota(jnp.int32, (H, B), 0)
        oh_y = (iy == yn).astype(dtype)                   # (H, B)
        acc = jax.lax.dot_general(
            tab_ref[:], oh_y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8 else jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
        if int8:
            def pick(p):
                seg = acc[p * W:(p + 1) * W, :]           # (W, B) s32
                sel = jnp.sum(jnp.where(ix == xn, seg, 0),
                              axis=0, keepdims=True)      # (1, B)
                # The winner is byte-128 (bias exact in int8; the one-hot
                # dot sums exactly one product) — restore the byte.
                return (sel + 128).astype(jnp.float32)
        else:
            oh_x = (ix == xn).astype(jnp.float32)

            def pick(p):
                seg = acc[p * W:(p + 1) * W, :]
                return jnp.sum(seg * oh_x, axis=0, keepdims=True)

        r, g, b, e = pick(0), pick(1), pick(2), pick(3)
        scale = jnp.where(e > 0.0, jnp.exp2(e - 136.0), 0.0)
        r_ref[0, j:j + 1, :] = r * scale
        g_ref[0, j:j + 1, :] = g * scale
        b_ref[0, j:j + 1, :] = b * scale


def _byte_planes(packed, H, W, impl):
    """(H, 4W) byte-plane table from the packed RGBE words — bf16 for the
    bf16 impls (0-255 exact), biased int8 for int8x8 (byte-128 exact)."""
    w = packed.reshape(H, W).astype(jnp.uint32)
    planes = [(w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF, w >> 24]
    if impl == "int8x8":
        return jnp.concatenate(
            [(p.astype(jnp.int32) - 128).astype(jnp.int8) for p in planes],
            axis=1)
    return jnp.concatenate([p.astype(jnp.bfloat16) for p in planes], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "interpret", "block", "impl"))
def _env_lookup8(packed, yn, xn, H: int, W: int, interpret: bool = False,
                 block: int = 0, impl: str = "int8x8"):
    """Dense eight-chunk variant of :func:`_env_lookup` (see ENV_IMPL)."""
    N = yn.shape[0]
    B = block or ENV_BLOCK
    n_pad = (-N) % (8 * B)
    yn = jnp.pad(yn, (0, n_pad))
    xn = jnp.pad(xn, (0, n_pad))
    steps8 = (N + n_pad) // (8 * B)
    y8 = yn.reshape(steps8, 8, B)
    x8 = xn.reshape(steps8, 8, B)
    tab = _byte_planes(packed, H, W, impl)
    dtype = jnp.int8 if impl == "int8x8" else jnp.bfloat16

    blk = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((steps8, 8, B), jnp.float32)
    r, g, b = pl.pallas_call(
        functools.partial(_env_kernel8, H, W, dtype),
        grid=(steps8,),
        in_specs=[blk, blk,
                  pl.BlockSpec((H, 4 * W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(blk, blk, blk),
        out_shape=(out, out, out),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y8, x8, tab)
    return (r.reshape(-1)[:N], g.reshape(-1)[:N], b.reshape(-1)[:N])


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "interpret", "block"))
def _env_lookup(packed, yn, xn, H: int, W: int, interpret: bool = False,
                block: int = 0):
    N = yn.shape[0]
    B = block or ENV_BLOCK
    n_pad = (-N) % B
    yn = jnp.pad(yn, (0, n_pad))
    xn = jnp.pad(xn, (0, n_pad))
    steps = (N + n_pad) // B
    yx = jnp.concatenate(
        [yn.reshape(steps, 1, B), xn.reshape(steps, 1, B),
         jnp.zeros((steps, 6, B), jnp.int32)], axis=1)    # (steps, 8, B)

    # Byte planes from the packed words — (H*W) elementwise per frame,
    # negligible next to the per-ray work and keeps Scene's pytree as-is.
    w = packed.reshape(H, W).astype(jnp.uint32)
    tab = jnp.concatenate(
        [((w >> 16) & 0xFF).astype(jnp.bfloat16),
         ((w >> 8) & 0xFF).astype(jnp.bfloat16),
         (w & 0xFF).astype(jnp.bfloat16),
         (w >> 24).astype(jnp.bfloat16)], axis=1)          # (H, 4W)

    out = pl.pallas_call(
        functools.partial(_env_kernel, H, W),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, 8, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yx, tab)
    flat = out.reshape(steps * 8, B)
    # Rows 0-2 of each step are r/g/b.
    r = flat[0::8].reshape(-1)[:N]
    g = flat[1::8].reshape(-1)[:N]
    b = flat[2::8].reshape(-1)[:N]
    return r, g, b


def sample_skybox_rgbe_mxu(skybox_hw, packed, rd, u1, u2,
                           interpret: bool = False, block: int = 0,
                           impl: str = None):
    """Stochastic single-tap equirect RGBE lookup on the MXU.

    Same (y, x) texel choice as ``sample_skybox_rgbe(u1=, u2=)`` — the
    stochastic-bilinear corner pick happens XLA-side on the SAME uniforms,
    so the estimator stream is identical; only the fetch runs as one-hot
    dots instead of a serial gather. Bit-identical to the gather path for
    EVERY impl (ENV_IMPL): the one-hot dot sums exactly one exact product
    (bytes 0-255 exact in bf16; byte-128 exact in int8 with s32
    accumulation) and the decode matches ``_decode_rgbe`` op-for-op.
    """
    from .shade import _equirect_coords

    H, W = skybox_hw
    y0, y1, x0, x1, wy, wx = _equirect_coords((H, W), rd)
    yn = jnp.where(u1 < wy, y1, y0).astype(jnp.int32)
    xn = jnp.where(u2 < wx, x1, x0).astype(jnp.int32)
    shp = yn.shape
    impl = impl or ENV_IMPL
    if impl in ("bf16x8", "int8x8"):
        r, g, b = _env_lookup8(packed, yn.reshape(-1), xn.reshape(-1), H, W,
                               interpret=interpret, block=block, impl=impl)
    else:
        r, g, b = _env_lookup(packed, yn.reshape(-1), xn.reshape(-1), H, W,
                              interpret=interpret, block=block)
    return r.reshape(shp), g.reshape(shp), b.reshape(shp)
