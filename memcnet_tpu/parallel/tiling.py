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


def _ppermute_shift(x, axis, shift):
    """Ring-shift a per-shard value by `shift` shard positions (returns the
    value held by the shard `shift` to the left when shift=+1)."""
    t = jax.lax.axis_size(axis)
    perm = [(i, (i + shift) % t) for i in range(t)]
    return jax.lax.ppermute(x, axis, perm)


def tiled_flow_project(mesh, flow, *, halo=64, fillhole=False, axis="tile",
                       batch_axis=None):
    """W-sharded flow projection with boundary scatter-reduce halo exchange.

    Each shard scatters into a halo-extended local buffer (|fx| clamped to
    the halo budget, the same contract as tiled_filter_interp_warp); the
    spilled halo bands ride ``ppermute`` to the ring neighbors and are added
    on (the SP scatter-reduce planned in SURVEY.md section 2.4).  The
    eval-only hole fill's horizontal scans continue across shard boundaries:
    each shard exchanges its edge carry (nearest projected value seen from
    its side) so a hole in one shard fills from a neighbor's projection,
    matching the global scans up to the (documented) halo flow clamp.
    """
    from memcnet_tpu.ops.projection import _last_valid_scan, _scatter4

    B, two, H, W = flow.shape
    assert two == 2
    t = mesh.shape[axis]
    assert W % t == 0, (W, t)
    W_local = W // t
    spec = P(batch_axis, None, None, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    def fn(fl):
        idx = jax.lax.axis_index(axis)
        x_origin = (idx * W_local).astype(fl.dtype)

        fx = jnp.clip(fl[:, 0], -(halo - 1), halo - 1)
        fy = fl[:, 1]
        # landing cells in LOCAL extended coords [0, W_local + 2*halo), with
        # the global validity gate (my_lib_kernel.cu:1661-1663)
        xs_l = jnp.arange(W_local, dtype=fl.dtype)[None, None, :]
        ys = jnp.arange(H, dtype=fl.dtype)[None, :, None]
        x2g = x_origin + xs_l + fx
        y2 = ys + fy
        Wg = float(W)
        valid = (x2g >= 0.0) & (y2 >= 0.0) & (x2g <= Wg - 1.0) & (y2 <= H - 1.0)

        # extended-local coordinate; int(x2l) == int(x2g) + halo - idx*W_local
        # (halo and the origin are integers), so local landing cells align
        # exactly with the global ones.  Invalid pixels scatter zero payload,
        # so their (in-range, meaningless) indices are harmless — same as the
        # global op's clip (projection._landing_cells).
        We = W_local + 2 * halo
        x2l = xs_l + fx + halo
        ixL = jnp.clip(x2l.astype(jnp.int32), 0, We - 1)
        iyT = jnp.clip(y2.astype(jnp.int32), 0, H - 1)

        vals = -jnp.stack([fx, fy], axis=1)
        out_e, cnt_e = _scatter4(
            vals, jnp.ones_like(fx), valid, ixL, None, iyT, None, H, We
        )
        # scatter-reduce the halo spill to ring neighbors
        left_band = out_e[..., :halo]
        right_band = out_e[..., -halo:]
        lcnt = cnt_e[..., :halo]
        rcnt = cnt_e[..., -halo:]
        if t > 1:
            from_left = _ppermute_shift(jnp.concatenate([right_band, rcnt[:, None]], 1), axis, 1)
            from_right = _ppermute_shift(jnp.concatenate([left_band, lcnt[:, None]], 1), axis, -1)
        else:
            from_left = jnp.concatenate([right_band, rcnt[:, None]], 1)
            from_right = jnp.concatenate([left_band, lcnt[:, None]], 1)
        out = out_e[..., halo:halo + W_local]
        cnt = cnt_e[..., halo:halo + W_local]
        first = jax.lax.axis_index(axis) == 0
        last = jax.lax.axis_index(axis) == t - 1
        # neighbors' spill lands on my [0:halo] and [W_local-halo:] columns;
        # edge shards get no wraparound contribution (global border clamps
        # already folded in-shard)
        addl = jnp.where(first, 0.0, 1.0) * from_left
        addr = jnp.where(last, 0.0, 1.0) * from_right
        out = out.at[..., :halo].add(addl[:, :2])
        cnt = cnt.at[..., :halo].add(addl[:, 2])
        out = out.at[..., W_local - halo:].add(addr[:, :2])
        cnt = cnt.at[..., W_local - halo:].add(addr[:, 2])
        # global right-border fold: a pixel landing exactly on x2 == W-1 has
        # ixR clamped back onto W-1 in the global op (_landing_cells); in
        # extended coords that contribution sits one past the border on the
        # last shard — fold it back instead of spilling it.
        fold = jnp.where(last, 1.0, 0.0)  # scalar
        out = out.at[..., -1:].add(fold * out_e[:, :, :, We - halo : We - halo + 1])
        cnt = cnt.at[..., -1:].add(fold * cnt_e[:, :, We - halo : We - halo + 1])

        avg = out / jnp.where(cnt > 0.0, cnt, 1.0)[:, None]
        if fillhole:
            avg = _tiled_fill(avg, cnt, axis, t)
        return avg

    return fn(flow)


def _tiled_fill(avg, cnt, axis, t):
    """Directional fill with cross-shard horizontal continuation.

    Local scans first; then each shard's outgoing edge carry (has, val) walks
    the ring so left/right hole searches see other shards' projections
    (nearest shard first, wraparound masked at the global edges).  Vertical
    scans are shard-local (H is untiled).  The reference's dead down-scan
    (my_lib_kernel.cu:1799) is reproduced.
    """
    from memcnet_tpu.ops.projection import _last_valid_scan

    has = jnp.broadcast_to((cnt > 0.0)[:, None], avg.shape)
    idx = jax.lax.axis_index(axis)

    def chained_scan(reverse):
        h_loc, v_loc = _last_valid_scan(has, avg, axis=3, reverse=reverse)
        edge = 0 if reverse else -1
        step = -1 if reverse else 1
        msg_h = h_loc[..., edge]  # (B, 2, H): my exported edge carry
        msg_v = v_loc[..., edge]
        ch = jnp.zeros_like(msg_h)
        cv = jnp.zeros_like(msg_v)
        for k in range(1, t):
            msg_h = _ppermute_shift(msg_h, axis, step)
            msg_v = _ppermute_shift(msg_v, axis, step)
            # after k hops the message originated at shard idx - k*step;
            # it wrapped the global edge unless that origin is in range
            ok = (idx >= k) if step > 0 else (idx <= t - 1 - k)
            fresh = msg_h & ok
            take = fresh & ~ch  # nearest shard wins (hop order = distance)
            cv = jnp.where(take, msg_v, cv)
            ch = ch | fresh
        v = jnp.where(h_loc, v_loc, cv[..., None])
        h = h_loc | ch[..., None]
        return h, v

    dirs = [chained_scan(False), chained_scan(True),
            _last_valid_scan(has, avg, axis=2)]  # left, right, up (down: dead)
    num = jnp.zeros_like(avg)
    den = jnp.zeros_like(avg)
    for exists, val in dirs:
        w = exists.astype(avg.dtype)
        num = num + val * w
        den = den + w
    hole = (~has) & (den > 0.0)
    filled = num / jnp.where(den > 0.0, den, 1.0)
    return jnp.where(hole, filled, avg)


def tiled_filter_interp_warp(mesh, image, flow, filt, *, filter_size=4, halo=64,
                             axis="tile", batch_axis=None):
    """W-sharded adaptive warp with ring halo exchange.

    image/flow/filt: global arrays (B, C, H, W); returns the global warp,
    computed shard-locally after exchanging `halo` boundary columns.
    """
    B, C, H, W = image.shape
    t = mesh.shape[axis]
    assert W % t == 0, (W, t)
    fs = filter_size
    spec = P(batch_axis, None, None, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec,) * 3,
        out_specs=spec,
        check_vma=False,
    )
    def fn(img, fl, ft):
        idx = jax.lax.axis_index(axis)
        ext = _exchange_halo_w(img, axis, halo)
        return _local_filter_interp(ext, fl, ft, idx, t, halo, fs, W, H)

    return fn(image, flow, filt)
