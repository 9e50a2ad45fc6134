"""Motion-compensation weighting/splatting ops (the reference's MC-subnet family).

TPU-native equivalents of WeightLayer (N9), PixelValueLayer + PixelWeightLayer
(N10) and ReliableWeightLayer (N11).  In the reference these kernels are
exported capability with no live model call site (only the broken gradcheck
stub functions/my_gradcheck.py:5 references them), and no Python wrapper
supplies hyperparameter defaults — the values below are keyword arguments the
caller owns.  ``tao_r`` / ``Prowindow`` appear in the C signatures
(my_lib_cuda.h:165-203) but are never read by any kernel body, so they are not
reproduced here.

Reference semantics (file:line under /root/reference/my_package/src/):
  * occlusion_weight (WeightLayer): my_lib_kernel.cu:3026-3126.  Per pixel p
    with flow f: 3x3 patch L1 photometric error between frame1 around p and a
    bilinear-blended frame2 patch around p+f (the four corner taps are
    clamped to the border *independently*, :3095-3105 — near edges this is
    NOT plain bilinear sampling, and we replicate the corner-wise clamping
    exactly).  err is averaged over channels*9 and mapped through
    (1 - err/lambda_e)^2 (:3117-3119).  If p+f lands out of frame -> 1e-4
    (:3122-3124).  The patch window is fixed 3x3 ("Nw must be 3", :3089).
  * pixel_splat (PixelValue/PixelWeight): my_lib_kernel.cu:3398-3473 and
    :3689-3755.  Each source pixel splats into the 4x4 window (m,n in
    [-1..2]) around the integer cell of the HALF-flow landing point
    p + f/2, with polynomial distance weight
    g_d = (1 - ((beta-m)^2 + (alpha-n)^2) / (2 sigma_d^2))^2 (:3460-3462).
    PixelValue accumulates f_w * g_d * value per channel; PixelWeight
    accumulates f_w * g_d.  Window taps are clamped to the border
    (:3455-3456), so border cells can receive multiple contributions from
    one source pixel — reproduced.  Out-of-frame landing centers splat
    nothing (:3443-3444).
  * reliable_weight (ReliableWeightLayer): my_lib_kernel.cu:3967-4045.  Same
    4x4 half-flow splat of g_d alone (no f_w) -> coverage/reliability map.

The atomicAdd scatters become XLA scatter-adds (deterministic on TPU).

Backward fidelity (custom VJPs — the reference's hand-derived backwards are
the parity spec, and they deviate from the true gradients; pinned against the
reference's own compiled C in tests/test_ref_c_backward.py):
  * WeightLayer backward replaces the d/d err factor -2(1 - err/lambda_e)
    with -2*sqrt(output) (my_lib.c WeightLayer_cpu_backward, the
    `2*sqrtf(output_data[...])` term; likewise my_lib_kernel.cu:3209-3213) —
    sqrt of the squared forward LOSES THE SIGN of (1 - err/lambda_e), so
    wherever err > lambda_e the reference gradient points the other way.
  * The splat backwards (PixelValue/PixelWeight/ReliableWeight, my_lib.c and
    my_lib_kernel.cu:3510-3580 etc.) compute the flow gradient as
    -2x the true one: the d alpha/d fx = 1/2 half-flow chain factor is
    omitted and the sign of d g_d/d alpha is flipped.  values/flow_weights
    gradients are the exact transposes (autodiff-equal).
Layout NCHW.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from memcnet_tpu.ops.warp import _gather_hw


def _flow_landing(flow, scale):
    """Landing coords p + scale*f -> (x2, y2) each (B,H,W)."""
    B, two, H, W = flow.shape
    assert two == 2, flow.shape
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    return xs + flow[:, 0] * scale, ys + flow[:, 1] * scale


def _ow_valid(flow):
    _, _, H, W = flow.shape
    x2, y2 = _flow_landing(flow, 1.0)
    return (x2 >= 0.0) & (y2 >= 0.0) & (x2 <= W - 1.0) & (y2 <= H - 1.0)


def _patch_error(frame1, frame2, flow, window):
    """Mean-abs patch photometric error (the err of WeightLayer's forward),
    shared by the forward and the reference-faithful backward."""
    B, C, H, W = frame1.shape
    r = window // 2
    x2, y2 = _flow_landing(flow, 1.0)
    ixL = jnp.clip(x2.astype(jnp.int32), 0, W - 1)
    iyT = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
    ixR = jnp.minimum(ixL + 1, W - 1)  # my_lib_kernel.cu:3076-3077
    iyB = jnp.minimum(iyT + 1, H - 1)
    alpha = (x2 - ixL.astype(x2.dtype))[:, None]
    beta = (y2 - iyT.astype(y2.dtype))[:, None]

    ybase = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :, None], (B, H, W))
    xbase = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, None, :], (B, H, W))

    def cl_h(v):
        return jnp.clip(v, 0, H - 1)

    def cl_w(v):
        return jnp.clip(v, 0, W - 1)

    err = jnp.zeros((B, H, W), frame1.dtype)
    for m in range(-r, r + 1):
        for n in range(-r, r + 1):
            p1 = _gather_hw(frame1, cl_h(ybase + m), cl_w(xbase + n))
            # corner-wise clamped bilinear blend (cu:3095-3105)
            tgt = (
                (1 - alpha) * (1 - beta) * _gather_hw(frame2, cl_h(iyT + m), cl_w(ixL + n))
                + alpha * (1 - beta) * _gather_hw(frame2, cl_h(iyT + m), cl_w(ixR + n))
                + (1 - alpha) * beta * _gather_hw(frame2, cl_h(iyB + m), cl_w(ixL + n))
                + alpha * beta * _gather_hw(frame2, cl_h(iyB + m), cl_w(ixR + n))
            )
            err = err + jnp.sum(jnp.abs(p1 - tgt), axis=1)
    return err / (C * window * window)


@lru_cache(maxsize=None)
def _ow_op(lambda_e, window):
    def forward(frame1, frame2, flow):
        err = _patch_error(frame1, frame2, flow, window)
        w = (1.0 - err / lambda_e) ** 2
        return jnp.where(_ow_valid(flow), w, 1e-4)[:, None]

    @jax.custom_vjp
    def op(frame1, frame2, flow):
        return forward(frame1, frame2, flow)

    def fwd(frame1, frame2, flow):
        w = forward(frame1, frame2, flow)
        return w, (frame1, frame2, flow, w)

    def bwd(res, g):
        # The reference backward, reproduced exactly (my_lib.c
        # WeightLayer_cpu_backward; my_lib_kernel.cu:3189-3396), including
        # its two deviations from the true gradient:
        #   * d w/d err uses -2*sqrt(output)/lambda_e — sqrt of the squared
        #     forward LOSES THE SIGN of (1 - err/lambda_e);
        #   * the fy gradient weights BOTH corner differences by
        #     gamma = (1 - alpha) (true gradient: alpha on the second term).
        frame1, frame2, flow, w = res
        B, C, H, W = frame1.shape
        r = window // 2
        derr = g[:, 0] * (
            -2.0 * jnp.sqrt(jnp.maximum(w[:, 0], 0.0))
            / (lambda_e * C * window * window)
        )
        derr = jnp.where(_ow_valid(flow), derr, 0.0).astype(frame1.dtype)

        x2, y2 = _flow_landing(flow, 1.0)
        ixL = jnp.clip(x2.astype(jnp.int32), 0, W - 1)
        iyT = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
        ixR = jnp.minimum(ixL + 1, W - 1)
        iyB = jnp.minimum(iyT + 1, H - 1)
        a = (x2 - ixL.astype(x2.dtype))[:, None]
        b = (y2 - iyT.astype(y2.dtype))[:, None]
        ybase = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :, None], (B, H, W))
        xbase = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, None, :], (B, H, W))
        cl_h = lambda v: jnp.clip(v, 0, H - 1)
        cl_w = lambda v: jnp.clip(v, 0, W - 1)

        bidx = jnp.arange(B)[:, None, None]
        cidx = jnp.arange(C)[None, :, None]
        gf1 = jnp.zeros((B, C, H * W), frame1.dtype)
        gf2 = jnp.zeros((B, C, H * W), frame1.dtype)
        gfx = jnp.zeros((B, H, W), frame1.dtype)
        gfy = jnp.zeros((B, H, W), frame1.dtype)
        for m in range(-r, r + 1):
            for n in range(-r, r + 1):
                p1 = _gather_hw(frame1, cl_h(ybase + m), cl_w(xbase + n))
                TL = _gather_hw(frame2, cl_h(iyT + m), cl_w(ixL + n))
                TR = _gather_hw(frame2, cl_h(iyT + m), cl_w(ixR + n))
                BL = _gather_hw(frame2, cl_h(iyB + m), cl_w(ixL + n))
                BR = _gather_hw(frame2, cl_h(iyB + m), cl_w(ixR + n))
                tgt = (1 - a) * (1 - b) * TL + a * (1 - b) * TR \
                    + (1 - a) * b * BL + a * b * BR
                s = jnp.where(p1 > tgt, 1.0, -1.0) * derr[:, None]  # (B,C,H,W)
                lin1 = (cl_h(ybase + m) * W + cl_w(xbase + n))[:, None]
                gf1 = gf1.at[bidx, cidx, lin1.reshape(B, 1, H * W)].add(
                    s.reshape(B, C, H * W), mode="promise_in_bounds")
                for iy, ix, wgt in (
                    (iyT + m, ixL + n, (1 - a) * (1 - b)),
                    (iyT + m, ixR + n, a * (1 - b)),
                    (iyB + m, ixL + n, (1 - a) * b),
                    (iyB + m, ixR + n, a * b),
                ):
                    lin = (cl_h(iy) * W + cl_w(ix))[:, None]
                    gf2 = gf2.at[bidx, cidx, lin.reshape(B, 1, H * W)].add(
                        (-s * wgt).reshape(B, C, H * W), mode="promise_in_bounds")
                gfx = gfx + jnp.sum(((1 - b) * (TR - TL) + b * (BR - BL)) * (-s), axis=1)
                # reference bug reproduced: gamma=(1-alpha) on BOTH terms
                gfy = gfy + jnp.sum(((1 - a) * (BL - TL) + (1 - a) * (BR - TR)) * (-s), axis=1)
        return (gf1.reshape(B, C, H, W), gf2.reshape(B, C, H, W),
                jnp.stack([gfx, gfy], axis=1))

    op.defvjp(fwd, bwd)
    return op


@partial(jax.jit, static_argnames=("lambda_e", "window"))
def occlusion_weight(frame1, frame2, flow, *, lambda_e=0.02, window=3):
    """Occlusion/reliability weight from patch photometric error (WeightLayer).

    Args:
      frame1: (B, C, H, W) reference frame.
      frame2: (B, C, H, W) frame the flow points into.
      flow:   (B, 2, H, W) flow from frame1 to frame2.
      lambda_e: photometric-error scale of the (1 - err/lambda_e)^2 mapping.
      window: patch size (the reference hardcodes 3, my_lib_kernel.cu:3089).
    Returns:
      (B, 1, H, W) weight map; 1e-4 where p+f lands out of frame.

    Backward follows the reference's hand-derived rule (sqrt-magnitude
    d w/d err — see module docstring), via custom_vjp.
    """
    assert window % 2 == 1, window
    return _ow_op(float(lambda_e), window)(frame1, frame2, flow)


def _halfflow_splat(flow, planes, sigma_d):
    """Shared 4x4 half-flow splat: scatter each (B,K,H,W) plane * g_d into the
    window around p + f/2.  Returns (B, K, H, W) accumulated."""
    B, K, H, W = planes.shape
    x2, y2 = _flow_landing(flow, 0.5)
    valid = (x2 >= 0.0) & (y2 >= 0.0) & (x2 <= W - 1.0) & (y2 <= H - 1.0)

    ixL = jnp.clip(x2.astype(jnp.int32), 0, W - 1)
    iyT = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
    alpha = x2 - ixL.astype(x2.dtype)
    beta = y2 - iyT.astype(y2.dtype)

    out = jnp.zeros((B, K, H * W), planes.dtype)
    bidx = jnp.arange(B)[:, None, None]
    kidx = jnp.arange(K)[None, :, None]
    inv2s2 = 1.0 / (2.0 * sigma_d * sigma_d)
    for m in range(-1, 3):
        for n in range(-1, 3):
            g = 1.0 - ((beta - m) ** 2 + (alpha - n) ** 2) * inv2s2
            g = g * g  # cu:3460-3462
            iy = jnp.clip(iyT + m, 0, H - 1)
            ix = jnp.clip(ixL + n, 0, W - 1)
            lin = (iy * W + ix).reshape(B, 1, H * W)
            contrib = jnp.where(valid[:, None], planes * g[:, None], 0.0)
            out = out.at[bidx, kidx, lin].add(
                contrib.reshape(B, K, H * W), mode="promise_in_bounds"
            )
    return out.reshape(B, K, H, W)


@lru_cache(maxsize=None)
def _splat_op(sigma_d, mode):
    """custom_vjp half-flow splat with the reference's flow-gradient rule:
    the hand-derived backwards scale the flow cotangent by -2 relative to
    the true transpose (omitted d alpha/d fx = 1/2 chain factor, flipped
    d g_d/d alpha sign — my_lib.c PixelValueLayer_cpu_backward and
    my_lib_kernel.cu:3510-3580); the plane cotangents are the exact
    transpose.  mode selects which args feed the planes."""

    def planes_fn(args):
        if mode == "value":
            values, flow, fw = args
            return flow, values * fw
        if mode == "weight":
            flow, fw = args
            return flow, fw
        if mode == "reliable":
            (flow,) = args
            ones = jnp.ones((flow.shape[0], 1) + flow.shape[2:], flow.dtype)
            return flow, ones
        values_fw, flow, fw = args  # "splat": fused value+weight pair
        return flow, jnp.concatenate([values_fw * fw, fw], axis=1)

    def forward(*args):
        flow, planes = planes_fn(args)
        return _halfflow_splat(flow, planes, sigma_d)

    @jax.custom_vjp
    def op(*args):
        return forward(*args)

    def fwd(*args):
        return forward(*args), args

    def bwd(args, g):
        flow_idx = {"value": 1, "weight": 0, "reliable": 0, "splat": 1}[mode]
        _, vjp = jax.vjp(forward, *args)
        grads = list(vjp(g))
        grads[flow_idx] = -2.0 * grads[flow_idx]
        return tuple(grads)

    op.defvjp(fwd, bwd)
    return op


@partial(jax.jit, static_argnames=("sigma_d",))
def pixel_splat(values, flow, flow_weights, *, sigma_d=1.0):
    """Forward-splatting MC pair (PixelValueLayer + PixelWeightLayer, fused).

    Args:
      values: (B, C, H, W) frame to splat.
      flow:   (B, 2, H, W) full flow (landing uses f/2, cu:3439-3441).
      flow_weights: (B, 1, H, W) per-pixel flow confidence f_w.
    Returns:
      (splat_values (B,C,H,W), splat_weights (B,1,H,W)); their ratio is the
      splatted frame.  Fusing the two reference kernels shares the landing
      math and scatter indices (one scatter of C+1 planes).
    """
    out = _splat_op(float(sigma_d), "splat")(values, flow, flow_weights)
    return out[:, :-1], out[:, -1:]


@partial(jax.jit, static_argnames=("sigma_d",))
def pixel_value(values, flow, flow_weights, *, sigma_d=1.0):
    """PixelValueLayer alone (my_lib_kernel.cu:3398-3473)."""
    return _splat_op(float(sigma_d), "value")(values, flow, flow_weights)


@partial(jax.jit, static_argnames=("sigma_d",))
def pixel_weight(flow, flow_weights, *, sigma_d=1.0):
    """PixelWeightLayer alone (my_lib_kernel.cu:3689-3755)."""
    return _splat_op(float(sigma_d), "weight")(flow, flow_weights)


@partial(jax.jit, static_argnames=("sigma_d",))
def reliable_weight(flow, *, sigma_d=1.0):
    """Coverage/reliability map: splat g_d alone (my_lib_kernel.cu:3967-4045).

    Returns (B, 1, H, W).
    """
    return _splat_op(float(sigma_d), "reliable")(flow)
