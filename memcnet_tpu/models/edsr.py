"""EDSR rectifier backbone (networks/EDSR/EDSR.py:8-52, common.py:24-43).

Head conv -> n_resblocks ResBlocks (no BN, conv-relu-conv + skip) -> body tail
conv -> final conv to 3 channels.  NOTE: the global residual is commented out
in the reference (`# res += x`, EDSR.py:47) — reproduced here.
Keys: head.0.*, body.{i}.body.{0,2}.*, body.{n}.* (tail conv of the body
Sequential), tail.0.*.
"""

import os

import jax.numpy as jnp
import jax.random as jr
from jax import lax

from memcnet_tpu.nn import layers as L
from memcnet_tpu.nn import init as I


def init_params(key, n_colors, n_resblocks=10, n_feats=128, prefix="rectifyNet",
                init_fn=I.kaiming_uniform, dtype=jnp.float32):
    p = {}

    def conv(k1, name, cin, cout):
        p[f"{prefix}.{name}.weight"] = init_fn(k1, (cout, cin, 3, 3), dtype)
        p[f"{prefix}.{name}.bias"] = jnp.zeros((cout,), dtype)

    key, k1 = jr.split(key)
    conv(k1, "head.0", n_colors, n_feats)
    for i in range(n_resblocks):
        key, k1, k2 = jr.split(key, 3)
        conv(k1, f"body.{i}.body.0", n_feats, n_feats)
        conv(k2, f"body.{i}.body.2", n_feats, n_feats)
    key, k1 = jr.split(key)
    conv(k1, f"body.{n_resblocks}", n_feats, n_feats)
    key, k1 = jr.split(key)
    conv(k1, "tail.0", n_feats, 3)
    return p


def forward(params, x, n_resblocks=10, prefix="rectifyNet"):
    h = L.p_conv(params, f"{prefix}.head.0", x, padding=1)
    return _body(params, h, n_resblocks, prefix)


def forward_pieces(params, pieces, n_resblocks=10, prefix="rectifyNet"):
    """EDSR forward taking the rectify input as a LIST of channel pieces.

    conv(concat(pieces)) == sum_i conv_i(piece_i) with the head weight sliced
    along its input-channel axis — numerically identical (f32-exact: the
    contraction order over channels is unchanged within each piece and the
    cross-piece sum matches XLA's K-split accumulation to fp tolerance).
    This avoids materializing the (B, 169|577, H, W) concat (348 MB at 720p)
    AND decouples the head conv's layout from the concat producers — the
    fused 169-ch head conv regressed to 31 ms on v5e when the r4 warp kernel
    changed its input layouts; per-piece convs stay on the fast path."""
    w = params[f"{prefix}.head.0.weight"]
    b = params[f"{prefix}.head.0.bias"]
    # Adjacent SMALL pieces (the 1-3 ch flow/occlusion/blend planes) merge
    # into one conv call each — a 2-ch head conv costs ~1.3 ms of layout
    # fusion on v5e while the concat of a few small planes is ~free; big
    # pieces (ctx, 64 ch) stay per-piece so the r4 layout-decoupling holds.
    groups = []
    cur = []
    cur_c = 0
    for piece in pieces:
        c = piece.shape[1]
        if c >= 64:
            if cur:
                groups.append(cur)
                cur, cur_c = [], 0
            groups.append([piece])
        else:
            cur.append(piece)
            cur_c += c
            if cur_c >= 32:
                groups.append(cur)
                cur, cur_c = [], 0
    if cur:
        groups.append(cur)

    off = 0
    h = None
    for group in groups:
        x = group[0] if len(group) == 1 else jnp.concatenate(group, axis=1)
        c = x.shape[1]
        part = L.conv2d(x, w[:, off:off + c], None, stride=1, padding=1)
        h = part if h is None else h + part
        off += c
    assert off == w.shape[1], (off, w.shape)
    h = h + b.reshape(1, -1, 1, 1).astype(h.dtype)
    return _body(params, h, n_resblocks, prefix)


def _body(params, h, n_resblocks, prefix):
    import jax

    if os.environ.get("MEMCNET_EDSR_NHWC"):
        return _body_nhwc(params, h, n_resblocks, prefix)
    res = h
    for i in range(n_resblocks):
        # remat per resblock: inference cost zero (checkpoint inlines when
        # not differentiated); training stores only the res chain instead of
        # every conv activation — the 720p bf16 train step was 6.8 G over
        # HBM without it (r5)
        def blk(r, i=i):
            t = L.p_conv(params, f"{prefix}.body.{i}.body.0", r, padding=1)
            t = L.relu(t)
            return L.p_conv(params, f"{prefix}.body.{i}.body.2", t, padding=1)

        res = res + jax.checkpoint(blk)(res)  # ResBlock skip (common.py:39-43)
    res = L.p_conv(params, f"{prefix}.body.{n_resblocks}", res, padding=1)
    # no global residual: EDSR.py:47 `# res += x`
    # NOTE r5: routing the tiny-O tail (128->3) through the Pallas band conv
    # measured CATASTROPHIC in-model (115 -> ~320 ms): the kernel's
    # (B,Hpad,Ct,Wp) input layout flips the layout of the entire upstream
    # resblock chain.  XLA's 1.6 ms for the tail stands.
    return L.p_conv(params, f"{prefix}.tail.0", res, padding=1)


def _body_nhwc(params, h, n_resblocks, prefix):
    """A/B experiment: the body stack in NHWC (MEMCNET_EDSR_NHWC=1)."""

    def conv(name, x):
        w = params[f"{prefix}.{name}.weight"].transpose(2, 3, 1, 0)
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + params[f"{prefix}.{name}.bias"].astype(y.dtype)

    res = h.transpose(0, 2, 3, 1)
    for i in range(n_resblocks):
        r = jnp.maximum(conv(f"body.{i}.body.0", res), 0)
        res = res + conv(f"body.{i}.body.2", r)
    res = conv(f"body.{n_resblocks}", res)
    return conv("tail.0", res).transpose(0, 3, 1, 2)
