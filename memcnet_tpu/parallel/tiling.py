"""Spatial tiling with explicit halo exchange — the SP analogue for video
CNNs (SURVEY.md section 2.4): the W pixel axis is sharded across the mesh
'tile' axis and warp ops exchange boundary bands with ring neighbors over ICI
via ppermute, instead of letting GSPMD all-gather whole frames.

Semantics contract: `tiled_filter_interp_warp` equals the global
`filter_interp_warp` for flows with |fx| <= halo - filter_size (the halo
budget); horizontal flow is clamped to that budget (SURVEY.md section 7:
"clamp flow to a configurable halo budget" — the reference's own validity
gate |f| < frame/2 would imply full-frame halos).  Vertical stays local (H is
untiled on this axis).  Global-border tiles replicate their own edge columns
into the halo, reproducing the reference's border-clamp exactly.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def _exchange_halo_w(img, axis, halo):
    """Bring `halo` columns from each W-neighbor; edge tiles replicate their
    own border (matching global edge-clamp semantics)."""
    t = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right_band = img[..., -halo:]
    left_band = img[..., :halo]
    if t > 1:
        fwd = [(i, (i + 1) % t) for i in range(t)]
        bwd = [(i, (i - 1) % t) for i in range(t)]
        from_left = jax.lax.ppermute(right_band, axis, fwd)   # my left neighbor's right edge
        from_right = jax.lax.ppermute(left_band, axis, bwd)   # my right neighbor's left edge
    else:
        from_left, from_right = right_band, left_band
    left_fill = jnp.repeat(img[..., :1], halo, axis=-1)
    right_fill = jnp.repeat(img[..., -1:], halo, axis=-1)
    first = (idx == 0)
    last = (idx == t - 1)
    from_left = jnp.where(first, left_fill, from_left)
    from_right = jnp.where(last, right_fill, from_right)
    return jnp.concatenate([from_left, img, from_right], axis=-1)


def _local_filter_interp(img, flow, filt, idx, t, halo, fs, W_global, H):
    """Per-shard warp on the halo-extended image with global-coordinate
    validity gates (my_lib_kernel.cu:1130-1131 semantics)."""
    from memcnet_tpu.ops.warp import _gather_patches

    B, C, _H, W_ext = img.shape
    W_local = W_ext - 2 * halo
    half = fs // 2
    x_origin = idx * W_local

    fx = jnp.clip(flow[:, 0], -(halo - fs), halo - fs)
    fy = flow[:, 1]
    xs_g = x_origin + jnp.arange(W_local, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    x2g = xs_g + fx
    y2 = ys + fy
    valid = (
        (x2g >= 0.0) & (y2 >= 0.0) & (x2g <= W_global - 1.0) & (y2 <= H - 1.0)
        & (jnp.abs(fx) < W_global / 2.0) & (jnp.abs(fy) < H / 2.0)
    )

    # local patch coordinates on the extended image
    ixg = jnp.clip(x2g.astype(jnp.int32), 0, W_global - 1)
    iy = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
    alpha = x2g - ixg.astype(flow.dtype)
    beta = y2 - iy.astype(flow.dtype)

    pad = fs
    img_p = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    img_cl = img_p.transpose(0, 2, 3, 1)
    N = H * W_local
    iy_start = (iy + 1 - half + pad).reshape(B, N)
    ix_local = ixg - x_origin + halo  # position within ext image
    ix_start = (jnp.clip(ix_local, -halo, W_ext - 1) + 1 - half + pad).reshape(B, N)
    patches = jax.vmap(_gather_patches, in_axes=(0, 0, 0, None))(img_cl, iy_start, ix_start, fs)

    jj = jnp.arange(fs)
    wy = jnp.where(jj[None, None, :] >= half, beta.reshape(B, N, 1), 1.0 - beta.reshape(B, N, 1))
    wx = jnp.where(jj[None, None, :] >= half, alpha.reshape(B, N, 1), 1.0 - alpha.reshape(B, N, 1))
    fw = filt.reshape(B, fs, fs, N).transpose(0, 3, 1, 2)
    weight = (fw * wy[:, :, :, None] * wx[:, :, None, :]).astype(patches.dtype)
    acc = jnp.einsum("bnjic,bnji->bnc", patches, weight)
    acc = acc.transpose(0, 2, 1).reshape(B, C, H, W_local)
    center = img[..., halo:halo + W_local]
    return jnp.where(valid[:, None], acc, jax.lax.stop_gradient(center))


def tiled_filter_interp_warp(mesh, image, flow, filt, *, filter_size=4, halo=64,
                             axis="tile"):
    """W-sharded adaptive warp with ring halo exchange.

    image/flow/filt: global arrays (B, C, H, W); returns the global warp,
    computed shard-locally after exchanging `halo` boundary columns.
    """
    B, C, H, W = image.shape
    t = mesh.shape[axis]
    assert W % t == 0, (W, t)
    fs = filter_size

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, None, axis),) * 3,
        out_specs=P(None, None, None, axis),
        check_vma=False,
    )
    def fn(img, fl, ft):
        idx = jax.lax.axis_index(axis)
        ext = _exchange_halo_w(img, axis, halo)
        return _local_filter_interp(ext, fl, ft, idx, t, halo, fs, W, H)

    return fn(image, flow, filt)
