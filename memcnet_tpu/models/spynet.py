"""SPyNet: 6-level spatial-pyramid residual flow (networks/SPyNet/Network.py).

Per-level Basic = 5x conv7x7 (8->32->64->32->16->2) with ReLU between
(:83-93).  Pyramid: avg-pool x2 while the level is larger than 32 px (:150-155,
up to 6 levels); flow starts as zeros at half the coarsest size (:157); each
level upsamples flow x2 (bilinear, x2.0), replicate-pads on odd sizes
(:162-165), and adds a residual predicted from
cat(first, warp(second, flow_up), flow_up) (:167).

The level count depends only on static shapes, so under jit the Python while
loop resolves at trace time (SURVEY.md section 7: "make it static per
resolution").  Preprocess reverses channel order with per-channel mean/std
(:66-75) — input is treated as BGR and emitted RGB-normalized.

Keys: {prefix}.moduleBasic.{L}.moduleBasic.{0,2,4,6,8}.{weight,bias}.
"""

import math

import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.nn import layers as L

_BASIC = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def _torch_default_uniform(key, shape, dtype=jnp.float32):
    # torch-0.2 Conv2d.reset_parameters: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    o, i, kh, kw = shape
    bound = 1.0 / math.sqrt(i * kh * kw)
    return jr.uniform(key, shape, dtype, -bound, bound)


def init_params(key, prefix="flownets", dtype=jnp.float32):
    p = {}
    for lvl in range(6):
        for j, (cin, cout) in enumerate(_BASIC):
            key, k1, k2 = jr.split(key, 3)
            name = f"{prefix}.moduleBasic.{lvl}.moduleBasic.{2 * j}"
            p[name + ".weight"] = _torch_default_uniform(k1, (cout, cin, 7, 7), dtype)
            bound = 1.0 / math.sqrt(cin * 49)
            p[name + ".bias"] = jr.uniform(k2, (cout,), dtype, -bound, bound)
    return p


def _preprocess(x):
    # Network.py:66-75 — slice B/G/R with their means, emit cat([R, G, B]).
    b = (x[:, 0:1] - 0.406) / 0.225
    g = (x[:, 1:2] - 0.456) / 0.224
    r = (x[:, 2:3] - 0.485) / 0.229
    return jnp.concatenate([r, g, b], axis=1)


def _basic(params, prefix, lvl, x):
    from memcnet_tpu.ops.pallas import conv_kernel as CK

    h = x
    for j in range(5):
        name = f"{prefix}.moduleBasic.{lvl}.moduleBasic.{2 * j}"
        if CK.use_fast_conv(h):
            # Pallas band conv: the 7x7 small-C stacks are the model's
            # dominant cost at ~12% MXU under XLA (PERF.md r5); ReLU fused
            h = CK.conv2d_small_op(
                h, params[name + ".weight"], params[name + ".bias"],
                relu=j < 4)
        else:
            h = L.p_conv(params, name, h, padding=3)
            if j < 4:
                h = L.relu(h)
    return h


def _backward_warp(x, flow):
    """grid_sample warp with flow in pixels (Network.py:120-134)."""
    B, C, H, W = x.shape
    gy, gx = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, H, dtype=x.dtype),
        jnp.linspace(-1.0, 1.0, W, dtype=x.dtype),
        indexing="ij",
    )
    base = jnp.stack([gx, gy], axis=-1)[None]
    fx = flow[:, 0] / ((W - 1) / 2.0)
    fy = flow[:, 1] / ((H - 1) / 2.0)
    grid = base + jnp.stack([fx, fy], axis=-1)
    return L.grid_sample_bilinear(x, grid)


def forward(params, first, second, prefix="flownets"):
    """first/second: (B,3,H,W) in [0,1]. Returns (B,2,H,W) flow at input res."""
    firsts = [_preprocess(first)]
    seconds = [_preprocess(second)]
    for _ in range(5):
        if firsts[0].shape[2] > 32 or firsts[0].shape[3] > 32:
            firsts.insert(0, L.avg_pool2d(firsts[0], 2))
            seconds.insert(0, L.avg_pool2d(seconds[0], 2))

    B = first.shape[0]
    h0 = int(math.floor(firsts[0].shape[2] / 2.0))
    w0 = int(math.floor(firsts[0].shape[3] / 2.0))
    flow = jnp.zeros((B, 2, h0, w0), first.dtype)

    for lvl in range(len(firsts)):
        up = L.upsample_bilinear(flow, 2) * 2.0
        if up.shape[2] != firsts[lvl].shape[2]:
            up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
        if up.shape[3] != firsts[lvl].shape[3]:
            up = jnp.pad(up, ((0, 0), (0, 0), (0, 0), (0, 1)), mode="edge")
        inp = jnp.concatenate([firsts[lvl], _backward_warp(seconds[lvl], up), up], axis=1)
        flow = _basic(params, prefix, lvl, inp) + up
    return flow
