"""Minimal functional NN layers with exact PyTorch numeric semantics.

The models keep their parameters as a flat ``dict[str, jnp.ndarray]`` whose
keys are exactly the reference's PyTorch state-dict names (e.g.
``"conv1.0.weight"``), and weights keep the PyTorch layouts (conv OIHW,
conv-transpose IOHW).  This makes the ``.pth`` importer a name-for-name copy
with zero mapping logic, and makes parity auditable key by key.

Semantics that must match PyTorch-0.2 for weight-import parity
(SURVEY.md section 7 "hard parts"):
  * ``Upsample(scale_factor=2, mode='bilinear')`` == align_corners=True
    (the only behavior that existed in 0.2).
  * BatchNorm in eval mode: running stats, eps=1e-5.
  * ConvTranspose2d(k=4, s=2, p=1): the FlowNetS deconv.
  * grid_sample(mode='bilinear', zero padding, align_corners=True): SPyNet.
  * ReplicationPad2d: demo padding geometry (demo_MiddleBury.py:99-117).

All spatial ops are NCHW. XLA relayouts internally for the TPU MXU; keeping
NCHW at the API keeps parameter parity trivial.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_CONV_DN = ("NCHW", "OIHW", "NCHW")


@lru_cache(maxsize=None)
def _conv2d_bf16_op(s, p):
    """custom_vjp bf16 conv (groups=1): forward keeps the
    preferred_element_type(f32)+astype pattern (a measured TPU perf feature
    — dropping it regressed the 720p forward 115 -> 320 ms, r5), whose
    built-in transpose rule rejects bf16 (it feeds an f32 cotangent into a
    bf16-operand conv).  The backward here is the standard conv transpose
    written explicitly, with the same fast pattern on both gradient convs."""

    def _impl(x, w):
        out = lax.conv_general_dilated(
            x, w, window_strides=s, padding=((p[0], p[0]), (p[1], p[1])),
            dimension_numbers=_CONV_DN,
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    op = jax.custom_vjp(_impl)

    def fwd(x, w):
        return _impl(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        g = g.astype(x.dtype)
        kh, kw = w.shape[2], w.shape[3]
        H, W = x.shape[2], x.shape[3]
        Hg, Wg = g.shape[2], g.shape[3]
        (sh, sw), (ph, pw) = s, p
        # d/dx: flipped-kernel conv of the (stride-dilated) cotangent
        plh, plw = kh - 1 - ph, kw - 1 - pw
        phh = H - ((Hg - 1) * sh + 1) - plh + kh - 1
        pwh = W - ((Wg - 1) * sw + 1) - plw + kw - 1
        gx = lax.conv_general_dilated(
            g, w[:, :, ::-1, ::-1], (1, 1), ((plh, phh), (plw, pwh)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NCHW", "IOHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        # d/dw: batch becomes the contraction ("CNHW" lhs / "IOHW" rhs),
        # kernel positions become the output window
        loh = (H + 2 * ph - kh) % sh
        low = (W + 2 * pw - kw) % sw
        gw = lax.conv_general_dilated(
            x, g, (1, 1), ((ph, ph - loh), (pw, pw - low)),
            rhs_dilation=(sh, sw),
            dimension_numbers=("CNHW", "IOHW", "NCHW"),
            preferred_element_type=jnp.float32)  # (I, O, kh, kw)
        return gx, gw.transpose(1, 0, 2, 3).astype(w.dtype)

    op.defvjp(fwd, bwd)
    return op


def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1):
    """PyTorch Conv2d. w: (O, I/groups, kH, kW)."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    if x.dtype == jnp.bfloat16 and groups == 1:
        out = _conv2d_bf16_op(s, p)(x, w)
    else:
        out = lax.conv_general_dilated(
            x, w, window_strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            dimension_numbers=_CONV_DN,
            feature_group_count=groups,
            preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
        )
        if out.dtype != x.dtype:
            out = out.astype(x.dtype)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def conv2d_im2col(x, w, b=None, *, stride=1, padding=0):
    """Conv as explicit patches + one matmul. For tiny input-channel STRIDE-1
    convs (ctxNet 3->64 7x7) XLA's native conv leaves the MXU ~97% idle
    (C_in pads to 128); flattening taps into the contraction dim gives
    K = C_in*kh*kw.  WARNING: with stride>1 the strided lane slicing is
    pathological on TPU (6->64 k7/s2 at 720p: 225 ms vs 13 ms direct on
    v5e) — use the direct conv for strided layers."""
    O, I, kh, kw = w.shape
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    xp = jnp.pad(x, ((0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])))
    B, C, Hp, Wp = xp.shape
    Ho = (Hp - kh) // s[0] + 1
    Wo = (Wp - kw) // s[1] + 1
    cols = [
        xp[:, :, dy:dy + (Ho - 1) * s[0] + 1:s[0], dx:dx + (Wo - 1) * s[1] + 1:s[1]]
        for dy in range(kh)
        for dx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=1)  # (B, kh*kw*I, Ho, Wo), (dy,dx,i) order
    wf = w.transpose(0, 2, 3, 1).reshape(O, kh * kw * I).astype(patches.dtype)
    out = jnp.einsum(
        "bkhw,ok->bohw", patches, wf,
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
    )
    if out.dtype != x.dtype:
        out = out.astype(x.dtype)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def conv_transpose2d(x, w, b=None, *, stride=2, padding=1):
    """PyTorch ConvTranspose2d. w: (I, O, kH, kW) — PyTorch layout.

    The k=4/s=2/p=1 case (every deconv in the model zoo) uses the sub-pixel
    decomposition: one 2x2/s1 conv producing 4*O channels + parity interleave.
    The equivalent lhs_dilation convolution is pathological on TPU for
    small-spatial/large-channel inputs (FlowNetS deconv5 at 12x21x1024:
    ~38 ms vs <1 ms; measured v5e) because the zero-inserted input defeats
    XLA's conv tiling.  General (k, s, p) falls back to the dilation identity
    (output (H-1)*s - 2p + k).
    """
    kh, kw = w.shape[2], w.shape[3]
    if stride == 2 and kh == 4 and kw == 4 and padding == 1:
        return _conv_transpose2d_subpixel(x, w, b)
    wf = w[:, :, ::-1, ::-1]
    out = lax.conv_general_dilated(
        x, wf, window_strides=(1, 1),
        padding=((kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "IOHW", "NCHW"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.bfloat16 else None,
    )
    if out.dtype != x.dtype:
        out = out.astype(x.dtype)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def _conv_transpose2d_subpixel(x, w, b=None):
    """ConvTranspose2d(k=4, s=2, p=1) as a 2x2 conv + parity interleave.

    Derivation: out[2u+a, 2v+c] = sum_{dm,dn in {0,1}}
        in[u+a-1+dm, v+c-1+dn] * w[.., 3-a-2dm, 3-c-2dn]
    so each output parity (a, c) is a stride-1 2x2 conv over the 1-padded
    input with kernel taps w[.., {3-a,1-a}, {3-c,1-c}]; the four parities
    stack into one I -> 4*O conv (exact same arithmetic, MXU-native layout).
    """
    I, O, _, _ = w.shape
    B, _, H, W = x.shape
    wt = w.transpose(1, 0, 2, 3)  # (O, I, 4, 4)
    subs = [
        wt[:, :, (3 - a, 1 - a), :][:, :, :, (3 - c, 1 - c)]
        for a in (0, 1)
        for c in (0, 1)
    ]
    wbig = jnp.concatenate(subs, axis=0)  # (4O, I, 2, 2), blocks (a,c)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    # via conv2d so the bf16 custom-vjp path applies (see _conv2d_bf16_op)
    q = conv2d(xp, wbig, None, stride=1, padding=0)  # (B, 4O, H+1, W+1)
    o = [
        q[:, (2 * a + c) * O : (2 * a + c + 1) * O, a : a + H, c : c + W]
        for a in (0, 1)
        for c in (0, 1)
    ]
    row0 = jnp.stack([o[0], o[1]], axis=-1).reshape(B, O, H, 2 * W)
    row1 = jnp.stack([o[2], o[3]], axis=-1).reshape(B, O, H, 2 * W)
    out = jnp.stack([row0, row1], axis=-2).reshape(B, O, 2 * H, 2 * W)
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def batch_norm_eval(x, gamma, beta, running_mean, running_var, eps=1e-5):
    """BatchNorm2d in eval mode (running statistics)."""
    inv = lax.rsqrt(running_var.astype(jnp.float32) + eps)
    scale = (gamma.astype(jnp.float32) * inv).astype(x.dtype)
    shift = (beta.astype(jnp.float32) - running_mean.astype(jnp.float32) * gamma.astype(jnp.float32) * inv).astype(x.dtype)
    return x * scale.reshape(1, -1, 1, 1) + shift.reshape(1, -1, 1, 1)


def batch_norm_train(x, gamma, beta, running_mean, running_var,
                     momentum=0.1, eps=1e-5):
    """BatchNorm2d in train mode (torch nn.BatchNorm2d semantics, as the
    reference's BN-bearing MonoNets use it — networks/MEMC_Net.py:292-305).

    Normalizes by the BIASED batch variance; updates the running statistics
    with the UNBIASED variance at torch's default momentum 0.1:
      running = (1 - momentum) * running + momentum * batch_stat.
    Returns (y, new_running_mean, new_running_var); the running-stat updates
    are gradient-stopped (they are state, not differentiable outputs)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(0, 2, 3))
    var = jnp.square(x32 - mean.reshape(1, -1, 1, 1)).mean(axis=(0, 2, 3))
    n = x.shape[0] * x.shape[2] * x.shape[3]
    unbiased = var * (n / max(n - 1, 1))
    rdt = running_mean.dtype
    new_mean = ((1.0 - momentum) * running_mean.astype(jnp.float32)
                + momentum * mean).astype(rdt)
    new_var = ((1.0 - momentum) * running_var.astype(jnp.float32)
               + momentum * unbiased).astype(rdt)
    inv = lax.rsqrt(var + eps)
    y = (x32 - mean.reshape(1, -1, 1, 1)) * (gamma.astype(jnp.float32) * inv).reshape(1, -1, 1, 1)
    y = y + beta.astype(jnp.float32).reshape(1, -1, 1, 1)
    return (y.astype(x.dtype),
            lax.stop_gradient(new_mean), lax.stop_gradient(new_var))


def max_pool2d(x, k=2, s=None):
    s = k if s is None else s
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max, (1, 1, k, k), (1, 1, s, s), "VALID",
    )


def avg_pool2d(x, k=2, s=None):
    s = k if s is None else s
    summed = lax.reduce_window(x, 0.0, lax.add, (1, 1, k, k), (1, 1, s, s), "VALID")
    return summed / (k * k)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope=0.1):
    return jnp.where(x >= 0, x, x * negative_slope)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def _linear_resize_1d_indices(n_in, n_out):
    """align_corners=True source indices/weights (static, computed at trace)."""
    if n_out == 1 or n_in == 1:
        i0 = np.zeros(n_out, np.int32)
        return i0, i0, np.zeros(n_out, np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int32)
    i0 = np.minimum(i0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (src - i0).astype(np.float32)
    return i0, i1, w


def _resize_matrix(n_in, n_out):
    """Dense (n_out, n_in) align_corners=True interpolation matrix (static)."""
    i0, i1, w = _linear_resize_1d_indices(n_in, n_out)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


def upsample_bilinear(x, scale_factor=2):
    """PyTorch-0.2 nn.Upsample(mode='bilinear') == align_corners=True.

    Expressed as two small static matmuls (out = M_h @ x @ M_w^T) rather than
    gathers: the MXU eats these, and matmul contraction partitions cleanly
    under SPMD sharding where a gather on a sharded axis would not.
    HIGHEST precision pins the interpolation weights to fp32 on TPU (where
    default-precision fp32 matmuls drop to bf16)."""
    B, C, H, W = x.shape
    mh = jnp.asarray(_resize_matrix(H, H * scale_factor), x.dtype)
    mw = jnp.asarray(_resize_matrix(W, W * scale_factor), x.dtype)
    # HIGHEST keeps fp32 parity runs exact; bf16 runs use the MXU-native pass
    # (a 3-pass fp32 emulation costs ~30 ms per 720p flow upsample).
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT
    x = jnp.einsum("oh,bchw->bcow", mh, x, precision=prec)
    return jnp.einsum("pw,bcow->bcop", mw, x, precision=prec)


def replication_pad2d(x, pad):
    """pad = (left, right, top, bottom), PyTorch ReplicationPad2d order."""
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)), mode="edge")


def pad_replicate_hw(x, pad):
    return replication_pad2d(x, pad)


def grid_sample_bilinear(x, grid):
    """torch.nn.functional.grid_sample, mode='bilinear', padding_mode='zeros',
    align_corners=True (the PyTorch-0.2 behavior SPyNet relies on,
    SPyNet/Network.py:134).

    x: (B,C,H,W); grid: (B,Ho,Wo,2) with normalized coords in [-1,1]
    (grid[...,0]=x, grid[...,1]=y). Out-of-range *taps* are zeroed
    individually (unlike bilinear_warp's whole-pixel validity).

    On TPU with a same-size grid (the SPyNet warp shape) the forward runs the
    Pallas window kernel via a zero-ring reduction (see _grid_sample_fast):
    the per-element tap gathers were ~110 ms of MEMC_Net_s's 720p frame.
    Gradients always flow through the XLA formulation (custom_vjp).
    """
    B, C, H, W = x.shape
    from memcnet_tpu.ops.warp import _use_pallas

    if grid.shape[1] == H and grid.shape[2] == W and (_GS_INTERPRET or _use_pallas()):
        return _gs_fast_op()(x, grid)
    return _grid_sample_xla(x, grid)


def _grid_sample_xla(x, grid):
    B, C, H, W = x.shape
    gx = (grid[..., 0] + 1.0) * (W - 1) / 2.0
    gy = (grid[..., 1] + 1.0) * (H - 1) / 2.0
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = gx - x0.astype(gx.dtype)
    wy = gy - y0.astype(gy.dtype)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        lin = (yc * W + xc).reshape(B, 1, -1)
        v = jnp.take_along_axis(x.reshape(B, C, H * W), lin, axis=2, mode="promise_in_bounds")
        v = v.reshape(B, C, *yi.shape[1:])
        return v * inb[:, None].astype(x.dtype)

    out = (
        tap(y0, x0) * ((1 - wx) * (1 - wy))[:, None]
        + tap(y0, x1) * (wx * (1 - wy))[:, None]
        + tap(y1, x0) * ((1 - wx) * wy)[:, None]
        + tap(y1, x1) * (wx * wy)[:, None]
    )
    return out


def _grid_sample_fast(x, grid, interpret=False):
    """grid_sample == a bilinear (fs=2) pass of the Pallas band-gather kernel
    on a ZERO-RING-padded source: per-tap zeroing falls out of the padding.

    Reduction (exact for ALL inputs): clamp the landing point into
    [-RING, dim-1+RING].  Landings clamped from outside have every tap in the
    zero ring -> output 0, which is exactly grid_sample's value there; the
    partial-overlap band (-1 < g < 0 etc.) reads ring zeros for its outside
    taps.  Over-budget bands (wild flows) fall back to the whole-frame XLA
    formulation inside lax.cond, so values never change.

    The band-gather kernel (ops/pallas/gather_kernel.py) keeps W on the
    lanes, so C=3 sources don't pay the window kernel's pad-to-128-lanes tax.
    """
    from memcnet_tpu.ops.pallas import gather_kernel as gk

    RING = 2
    PT = 8  # top row margin (window anchors clip to >= 0 cheaply)
    B, C, H, W = x.shape
    gx = (grid[..., 0] + 1.0) * (W - 1) / 2.0
    gy = (grid[..., 1] + 1.0) * (H - 1) / 2.0
    gx = jnp.clip(gx.astype(jnp.float32), -RING, W - 1 + RING)
    gy = jnp.clip(gy.astype(jnp.float32), -RING, H - 1 + RING)
    x0 = jnp.floor(gx).astype(jnp.int32)  # in [-RING, W-1+RING]
    y0 = jnp.floor(gy).astype(jnp.int32)
    wx = gx - x0
    wy = gy - y0

    # padded source: rows [PT-RING, PT+H+RING+1) hold taps; bottom margin
    # covers the R-row window overhang; lanes cover tap columns + 128 tiling
    Wp = -(-W // 128) * 128
    Wsp = -(-max(W + 2 * RING, Wp + 2) // 128) * 128
    PB = gk.R + gk.TH + RING
    Hsp = -(-(H + PT + PB) // gk.TH) * gk.TH
    xz = jnp.pad(x, ((0, 0), (0, 0), (PT, Hsp - H - PT), (RING, Wsp - W - RING)))

    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    dy = (y0 + PT) - ys   # padded-row tap base minus output row
    dx = (x0 + RING) - xs
    valid = jnp.ones((B, H, W), bool)
    # tap (j, i) weight: [ (1-wy)(1-wx), (1-wy)wx, wy(1-wx), wy wx ]
    wtap = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], axis=1
    )

    plan = gk.plan_bands(dy, dx, valid)

    def pallas_branch(_):
        return gk.gather_bands(xz, wtap, plan, filter_size=2, out_w=W,
                               interpret=interpret)

    def xla_branch(_):
        return _grid_sample_xla(x, grid)

    return jax.lax.cond(gk.gather_ok(plan, 2), pallas_branch, xla_branch, None)


_GS_INTERPRET = False  # tests: run the fast path interpreted on CPU


def _gs_fast_op(_cache={}):
    """custom_vjp grid_sample: inference runs the Pallas fast path,
    differentiation runs the XLA formulation (exact gradient)."""
    key = _GS_INTERPRET
    if key not in _cache:
        interpret = key

        @jax.custom_vjp
        def op(x, grid):
            return _grid_sample_fast(x, grid, interpret=interpret)

        def fwd(x, grid):
            # Pallas fast path for the training value too (raw-input
            # residuals); backward stays the XLA formulation's exact VJP
            return _grid_sample_fast(x, grid, interpret=interpret), (x, grid)

        def bwd(res, g):
            _, vjp = jax.vjp(_grid_sample_xla, *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        _cache[key] = op
    return _cache[key]


# ---- flat-param helpers -----------------------------------------------------


def p_conv(params, prefix, x, *, stride=1, padding=0):
    w = params[prefix + ".weight"]
    b = params.get(prefix + ".bias")
    return conv2d(x, w, b, stride=stride, padding=padding)


def p_conv_transpose(params, prefix, x, *, stride=2, padding=1):
    w = params[prefix + ".weight"]
    b = params.get(prefix + ".bias")
    return conv_transpose2d(x, w, b, stride=stride, padding=padding)


def p_bn(params, prefix, x):
    return batch_norm_eval(
        x,
        params[prefix + ".weight"],
        params[prefix + ".bias"],
        params[prefix + ".running_mean"],
        params[prefix + ".running_var"],
    )
