"""Pallas TPU direct convolution for SMALL-CHANNEL stride-1 convs.

Why: XLA's conv on TPU contracts over (C_in x kw) per pass, so convs with few
input channels leave the 128-deep MXU mostly idle — the measured pool is
SPyNet's 7x7 stacks and the MonoNet full-res 3x3 convs at ~10-25% MXU
(PERF.md r4/r5; im2col at the XLA level was measured and REJECTED — the HBM
layout copies dominate, PERF.md r4 #8).  This kernel does the im2col-style
repacking in VMEM where layout is free:

  * Input layout (B, Hpad, Ct, Wp): rows on the UNTILED leading dim (legal
    dynamic band DMA starts — the warp kernel's lesson), channels on
    sublanes (Ct = C padded to the dtype sublane tile), W on lanes.
  * Grid = bands of TH=8 output rows; per band ONE contiguous window DMA of
    (TH + kh - 1) rows (double-buffered).
  * In VMEM, the kh row-taps are packed into a (TH, kh*Ct, Wp) slab P by kh
    static sublane-block copies; the kw column-taps become EXTRA MATMUL ROWS:
    one dot of the stacked weights (kw*O, kh*Ct) against P gives per-column-
    tap partial outputs, which are combined by kw static lane-rolls + adds in
    f32 (32-bit rolls are the supported kind).  This keeps BOTH matmul
    dimensions large: K = kh*Ct, M = kw*O — e.g. SPyNet conv2 (32->64, 7x7)
    runs (448, 224) against an 8x1408-pixel stream vs XLA's K=32-deep passes.
  * Epilogue: bias + optional ReLU fused before the single output write;
    output blocks are (1, O, TH, Wp) — NCHW directly, no post-transpose.

Semantics: PyTorch Conv2d, stride 1, 'same' zero padding (padding = k//2),
odd square-ish kernels.  Exact in f32 (HIGHEST matmul precision); bf16 runs
accumulate in f32 like XLA's conv (bf16 operand rounding only).

Reference scope note: the reference has no such kernel (its convs are cudnn
calls); this is TPU-native performance work for the same model math
(networks/SPyNet/Network.py:83-93, networks/MEMC_Net.py:180-238).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8
_FORCE_INTERPRET = False  # tests: run the kernel interpreted on CPU


def _ceil_to(x, m):
    return -(-x // m) * m


def _sublane(dtype):
    return 32 // jnp.dtype(dtype).itemsize


_ABLATE = None  # None | "pack" | "dot" | "noroll" — perf bisection only


def _conv_kernel(kh, kw, O, Ct, Wp, nb, out_dtype, relu, prec,
                 img_hbm, wstack_ref, bias_ref,
                 out_ref, win_ref, p2_ref, sem):
    g = pl.program_id(0)
    sh = TH + kh - 1

    def start_dma(slot, gg):
        b = gg // nb
        r0 = (gg - b * nb) * TH
        return pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(r0, sh), :, :], win_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_dma(0, g).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    start_dma(slot, g).wait()

    # pack kh row-taps into the contraction axis (static sublane blocks)
    for ky in range(kh):
        p2_ref[:, ky * Ct:(ky + 1) * Ct, :] = win_ref[slot, ky:ky + TH]

    if _ABLATE == "pack":
        out_ref[0] = jnp.broadcast_to(
            p2_ref[0, 0:1, :], out_ref.shape[1:]).astype(out_dtype)
        return

    # (kw*O, kh*Ct) @ (TH, kh*Ct, Wp) -> (kw*O, TH, Wp): column taps ride the
    # matmul M dimension, keeping the MXU full for small C
    ot = jax.lax.dot_general(
        wstack_ref[:], p2_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)

    if _ABLATE == "dot":
        out_ref[0] = ot[:O].astype(out_dtype)
        return

    acc = bias_ref[:, 0:1][:, :, None]  # (O, 1, 1) broadcasts
    for kx in range(kw):
        part = ot[kx * O:(kx + 1) * O]
        if kx and _ABLATE != "noroll":
            part = pltpu.roll(part, Wp - kx, axis=2)  # left-shift kx lanes
        acc = acc + part
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_dtype)


def _prep_weights(w, Ct, dtype):
    """(O, C, kh, kw) -> (kw*O, kh*Ct) with K2 index ky*Ct + c."""
    O, C, kh, kw = w.shape
    wp = jnp.pad(w, ((0, 0), (0, Ct - C), (0, 0), (0, 0)))
    return (wp.transpose(3, 0, 2, 1)       # (kw, O, kh, Ct)
            .reshape(kw * O, kh * Ct).astype(dtype))


@partial(jax.jit, static_argnames=("relu", "interpret"))
def conv2d_small(x, w, b=None, *, relu=False, interpret=False):
    """Stride-1 'same' conv via the band kernel.  x: (B, C, H, W) NCHW,
    w: (O, C, kh, kw), b: (O,) or None.  Returns (B, O, H, W)."""
    B, C, H, W = x.shape
    O, Cw, kh, kw = w.shape
    assert Cw == C, (w.shape, x.shape)
    dt = x.dtype
    sub = _sublane(dt)
    Ct = _ceil_to(C, sub)
    nb = _ceil_to(H, TH) // TH
    Hb = nb * TH
    ph, pw = kh // 2, kw // 2
    Wp = _ceil_to(W + kw - 1, 128)
    Hpad = Hb + kh - 1
    xk = jnp.pad(x, ((0, 0), (0, Ct - C),
                     (ph, Hpad - H - ph), (pw, Wp - W - pw)))
    xk = xk.transpose(0, 2, 1, 3)  # (B, Hpad, Ct, Wp)

    wstack = _prep_weights(w, Ct, dt)
    bias = (b if b is not None else jnp.zeros((O,), jnp.float32))
    bias = jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (O, 128))

    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    K2 = kh * Ct
    G = B * nb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xk stays in HBM
            pl.BlockSpec((kw * O, K2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, O, TH, Wp),
                               lambda g: (g // nb, 0, g % nb, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TH + kh - 1, Ct, Wp), dt),
            pltpu.VMEM((TH, K2, Wp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_conv_kernel, kh, kw, O, Ct, Wp, nb, dt, relu, prec),
        out_shape=jax.ShapeDtypeStruct((B, O, Hb, Wp), dt),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xk, wstack, bias)
    return out[:, :, :H, :W]


def _xla_conv(x, w, b, relu):
    """The gradient-defining XLA formulation (PyTorch Conv2d semantics) —
    via nn/layers.py::conv2d, whose bf16 path carries the hand-written conv
    VJP (the preferred_element_type pattern has no bf16 transpose rule)."""
    from memcnet_tpu.nn import layers as L

    kh, kw = w.shape[2], w.shape[3]
    out = L.conv2d(x, w, b, stride=1, padding=(kh // 2, kw // 2))
    return jnp.maximum(out, 0) if relu else out


@lru_cache(maxsize=None)
def _fast_conv_op(relu, interpret):
    """custom_vjp: the Pallas conv runs in inference AND the training value
    (raw-input residuals); differentiation runs the XLA conv's exact VJP."""

    @jax.custom_vjp
    def op(x, w, b):
        return conv2d_small(x, w, b, relu=relu, interpret=interpret)

    def fwd(x, w, b):
        return conv2d_small(x, w, b, relu=relu, interpret=interpret), (x, w, b)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda a, c, d: _xla_conv(a, c, d, relu), *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def use_fast_conv(x):
    """Dispatch gate: TPU (or forced interpret) and a spatial extent where
    the band pipeline beats XLA (tiny pyramid levels stay on XLA)."""
    from memcnet_tpu.ops.warp import _use_pallas

    H, W = x.shape[2], x.shape[3]
    return (H * W >= 96 * 96) and (_FORCE_INTERPRET or _use_pallas())


def conv2d_small_op(x, w, b=None, *, relu=False):
    """Public fast small-C conv: Pallas forward, XLA-exact gradients."""
    return _fast_conv_op(relu, _FORCE_INTERPRET)(x, w, b)
