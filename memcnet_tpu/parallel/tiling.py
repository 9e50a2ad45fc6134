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


def _exchange_halo(img, axis, halo, dim):
    """Bring `halo` slices from each ring neighbor along array dim `dim`
    (-1 = columns, -2 = rows); global-edge tiles replicate their own border
    (matching the reference's edge clamp)."""
    t = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n = img.shape[dim]
    d = img.ndim + dim if dim < 0 else dim
    lead = jax.lax.slice_in_dim(img, 0, halo, axis=d)
    trail = jax.lax.slice_in_dim(img, n - halo, n, axis=d)
    if t > 1:
        fwd = [(i, (i + 1) % t) for i in range(t)]
        bwd = [(i, (i - 1) % t) for i in range(t)]
        from_prev = jax.lax.ppermute(trail, axis, fwd)  # prev neighbor's trailing edge
        from_next = jax.lax.ppermute(lead, axis, bwd)   # next neighbor's leading edge
    else:
        from_prev, from_next = trail, lead
    first_fill = jnp.repeat(jax.lax.slice_in_dim(img, 0, 1, axis=d), halo, axis=d)
    last_fill = jnp.repeat(jax.lax.slice_in_dim(img, n - 1, n, axis=d), halo, axis=d)
    from_prev = jnp.where(idx == 0, first_fill, from_prev)
    from_next = jnp.where(idx == t - 1, last_fill, from_next)
    return jnp.concatenate([from_prev, img, from_next], axis=d)


def _exchange_halo_w(img, axis, halo):
    return _exchange_halo(img, axis, halo, dim=-1)


def _local_filter_interp(img, flow, filt, x_origin, y_origin, halo, halo_h,
                         fs, W_global, H_global):
    """Per-shard warp on the halo-extended image with global-coordinate
    validity gates (my_lib_kernel.cu:1130-1131 semantics).

    halo_h == 0 means H is untiled (y_origin == 0, no vertical clamp)."""
    from memcnet_tpu.ops.warp import _gather_patches

    B, C, H_ext, W_ext = img.shape
    W_local = W_ext - 2 * halo
    H_local = H_ext - 2 * halo_h
    half = fs // 2

    fx = jnp.clip(flow[:, 0], -(halo - fs), halo - fs)
    fy = flow[:, 1]
    if halo_h:
        fy = jnp.clip(fy, -(halo_h - fs), halo_h - fs)
    xs_g = x_origin + jnp.arange(W_local, dtype=flow.dtype)[None, None, :]
    ys_g = y_origin + jnp.arange(H_local, dtype=flow.dtype)[None, :, None]
    x2g = xs_g + fx
    y2g = ys_g + fy
    valid = (
        (x2g >= 0.0) & (y2g >= 0.0)
        & (x2g <= W_global - 1.0) & (y2g <= H_global - 1.0)
        & (jnp.abs(fx) < W_global / 2.0) & (jnp.abs(fy) < H_global / 2.0)
    )

    # local patch coordinates on the extended image
    ixg = jnp.clip(x2g.astype(jnp.int32), 0, W_global - 1)
    iyg = jnp.clip(y2g.astype(jnp.int32), 0, H_global - 1)
    alpha = x2g - ixg.astype(flow.dtype)
    beta = y2g - iyg.astype(flow.dtype)

    pad = fs
    img_p = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    img_cl = img_p.transpose(0, 2, 3, 1)
    N = H_local * W_local
    iy_local = iyg - y_origin + halo_h
    iy_start = (jnp.clip(iy_local, -halo_h, H_ext - 1) + 1 - half + pad).reshape(B, N)
    ix_local = ixg - x_origin + halo
    ix_start = (jnp.clip(ix_local, -halo, W_ext - 1) + 1 - half + pad).reshape(B, N)
    patches = jax.vmap(_gather_patches, in_axes=(0, 0, 0, None))(img_cl, iy_start, ix_start, fs)

    jj = jnp.arange(fs)
    wy = jnp.where(jj[None, None, :] >= half, beta.reshape(B, N, 1), 1.0 - beta.reshape(B, N, 1))
    wx = jnp.where(jj[None, None, :] >= half, alpha.reshape(B, N, 1), 1.0 - alpha.reshape(B, N, 1))
    fw = filt.reshape(B, fs, fs, N).transpose(0, 3, 1, 2)
    weight = (fw * wy[:, :, :, None] * wx[:, :, None, :]).astype(patches.dtype)
    acc = jnp.einsum("bnjic,bnji->bnc", patches, weight)
    acc = acc.transpose(0, 2, 1).reshape(B, C, H_local, W_local)
    center = img[:, :, halo_h:halo_h + H_local, halo:halo + W_local]
    return jnp.where(valid[:, None], acc, jax.lax.stop_gradient(center))


def _ppermute_shift(x, axis, shift):
    """Ring-shift a per-shard value by `shift` shard positions (returns the
    value held by the shard `shift` to the left when shift=+1)."""
    t = jax.lax.axis_size(axis)
    perm = [(i, (i + shift) % t) for i in range(t)]
    return jax.lax.ppermute(x, axis, perm)


def _fold_and_exchange_spill(pay, axis, t, halo, dim):
    """Fold the global far-border '+1' contribution back (last shard), then
    scatter-reduce the halo spill bands to the ring neighbors along `dim`.

    pay: (B, K, He, We) extended payload (values + count stacked on K); the
    local region occupies [halo, n - halo) along `dim`.  A pixel landing
    exactly on the global far border scatters its +1-neighbor one slot past
    it; the global op clamps that back onto the border (_landing_cells), so
    the last shard folds ext slice (n - halo) onto (n - halo - 1) instead of
    spilling it.  Edge shards take no wraparound spill."""
    idx = jax.lax.axis_index(axis)
    n = pay.shape[dim]
    d = pay.ndim + dim if dim < 0 else dim

    def sl(a, start, size):
        return jax.lax.slice_in_dim(a, start, start + size, axis=d)

    last = jnp.where(idx == t - 1, 1.0, 0.0)
    fold_src = last * sl(pay, n - halo, 1)
    pay = jax.lax.dynamic_update_slice_in_dim(
        pay, sl(pay, n - halo - 1, 1) + fold_src, n - halo - 1, axis=d)

    lead = sl(pay, 0, halo)
    trail = sl(pay, n - halo, halo)
    if t > 1:
        from_prev = _ppermute_shift(trail, axis, 1)
        from_next = _ppermute_shift(lead, axis, -1)
    else:
        from_prev, from_next = trail, lead
    from_prev = jnp.where(idx == 0, 0.0, 1.0) * from_prev
    from_next = jnp.where(idx == t - 1, 0.0, 1.0) * from_next
    pay = jax.lax.dynamic_update_slice_in_dim(
        pay, sl(pay, halo, halo) + from_prev, halo, axis=d)
    pay = jax.lax.dynamic_update_slice_in_dim(
        pay, sl(pay, n - 2 * halo, halo) + from_next, n - 2 * halo, axis=d)
    return pay


def tiled_flow_project(mesh, flow, *, halo=64, fillhole=False, axis="tile",
                       batch_axis=None, axis_h=None, halo_h=None):
    """Spatially-sharded flow projection with scatter-reduce halo exchange.

    Each shard scatters into a halo-extended local buffer (flow clamped to
    the halo budget, the same contract as tiled_filter_interp_warp); the
    spilled halo bands ride ``ppermute`` to the ring neighbors and are added
    on (the SP scatter-reduce planned in SURVEY.md section 2.4).  With
    `axis_h`, H is sharded too: column spills are exchanged first over the
    FULL extended rows (so corner spills ride to the W neighbor) and row
    spills second, which routes a corner spill to the diagonal neighbor in
    two hops.  The eval-only hole fill's scans continue across shard
    boundaries in both directions; the reference's dead down-scan
    (my_lib_kernel.cu:1799) is reproduced.
    """
    from memcnet_tpu.ops.projection import _scatter4

    B, two, H, W = flow.shape
    assert two == 2
    t = mesh.shape[axis]
    th = mesh.shape[axis_h] if axis_h else 1
    assert W % t == 0, (W, t)
    assert H % th == 0, (H, th)
    W_local = W // t
    H_local = H // th
    hh = (halo_h if halo_h is not None else halo) if axis_h else 0
    assert W_local >= 2 * halo and (not hh or H_local >= 2 * hh), \
        (W_local, halo, H_local, hh)
    spec = P(batch_axis, None, axis_h, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    def fn(fl):
        x_origin = (jax.lax.axis_index(axis) * W_local).astype(fl.dtype)
        y_origin = ((jax.lax.axis_index(axis_h) * H_local).astype(fl.dtype)
                    if axis_h else jnp.zeros((), fl.dtype))

        fx = jnp.clip(fl[:, 0], -(halo - 1), halo - 1)
        fy = fl[:, 1]
        if hh:
            fy = jnp.clip(fy, -(hh - 1), hh - 1)
        # landing cells in LOCAL extended coords, with the global validity
        # gate (my_lib_kernel.cu:1661-1663)
        xs_l = jnp.arange(W_local, dtype=fl.dtype)[None, None, :]
        ys_l = jnp.arange(H_local, dtype=fl.dtype)[None, :, None]
        x2g = x_origin + xs_l + fx
        y2g = y_origin + ys_l + fy
        valid = ((x2g >= 0.0) & (y2g >= 0.0)
                 & (x2g <= float(W) - 1.0) & (y2g <= float(H) - 1.0))

        # int(x2l) == int(x2g) + halo - x_origin (halo and origins are
        # integers), so local landing cells align exactly with global ones.
        # Invalid pixels scatter zero payload, so their (in-range,
        # meaningless) indices are harmless — same as the global op's clip.
        We = W_local + 2 * halo
        He = H_local + 2 * hh
        x2l = xs_l + fx + halo
        y2l = ys_l + fy + hh
        ixL = jnp.clip(x2l.astype(jnp.int32), 0, We - 1)
        iyT = jnp.clip(y2l.astype(jnp.int32), 0, He - 1)

        vals = -jnp.stack([fx, fy], axis=1)
        out_e, cnt_e = _scatter4(
            vals, jnp.ones_like(fx), valid, ixL, None, iyT, None, He, We
        )
        pay = jnp.concatenate([out_e, cnt_e[:, None]], axis=1)  # (B, 3, He, We)
        pay = _fold_and_exchange_spill(pay, axis, t, halo, dim=-1)
        if axis_h:
            pay = _fold_and_exchange_spill(pay, axis_h, th, hh, dim=-2)
            pay = pay[:, :, hh:hh + H_local]
        out = pay[:, :2, :, halo:halo + W_local]
        cnt = pay[:, 2, :, halo:halo + W_local]

        avg = out / jnp.where(cnt > 0.0, cnt, 1.0)[:, None]
        if fillhole:
            avg = _tiled_fill(avg, cnt, axis, t, axis_h=axis_h, t_h=th)
        return avg

    return fn(flow)


def _tiled_fill(avg, cnt, axis, t, axis_h=None, t_h=1):
    """Directional fill with cross-shard continuation.

    Local scans first; then each shard's outgoing edge carry (has, val) walks
    the ring so hole searches see other shards' projections (nearest shard
    first, wraparound masked at the global edges).  Horizontal scans chain
    over `axis`; the up-scan chains over `axis_h` when H is sharded (else it
    is shard-local).  The reference's dead down-scan (my_lib_kernel.cu:1799)
    is reproduced.
    """
    from memcnet_tpu.ops.projection import _last_valid_scan

    has = jnp.broadcast_to((cnt > 0.0)[:, None], avg.shape)

    def chained_scan(scan_axis, reverse, shard_axis, nsh):
        h_loc, v_loc = _last_valid_scan(has, avg, axis=scan_axis, reverse=reverse)
        idx = jax.lax.axis_index(shard_axis)
        n = avg.shape[scan_axis]
        edge = 0 if reverse else n - 1
        step = -1 if reverse else 1
        msg_h = jax.lax.index_in_dim(h_loc, edge, axis=scan_axis, keepdims=False)
        msg_v = jax.lax.index_in_dim(v_loc, edge, axis=scan_axis, keepdims=False)
        ch = jnp.zeros_like(msg_h)
        cv = jnp.zeros_like(msg_v)
        for k in range(1, nsh):
            msg_h = _ppermute_shift(msg_h, shard_axis, step)
            msg_v = _ppermute_shift(msg_v, shard_axis, step)
            # after k hops the message originated at shard idx - k*step;
            # it wrapped the global edge unless that origin is in range
            ok = (idx >= k) if step > 0 else (idx <= nsh - 1 - k)
            fresh = msg_h & ok
            take = fresh & ~ch  # nearest shard wins (hop order = distance)
            cv = jnp.where(take, msg_v, cv)
            ch = ch | fresh
        v = jnp.where(h_loc, v_loc, jnp.expand_dims(cv, scan_axis))
        h = h_loc | jnp.expand_dims(ch, scan_axis)
        return h, v

    dirs = [chained_scan(3, False, axis, t),   # left search
            chained_scan(3, True, axis, t)]    # right search
    if axis_h:
        dirs.append(chained_scan(2, False, axis_h, t_h))  # up search
    else:
        dirs.append(_last_valid_scan(has, avg, axis=2))
    # down: dead (reference bug reproduced)
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
                             axis="tile", batch_axis=None,
                             axis_h=None, halo_h=None):
    """Spatially-sharded adaptive warp with ring halo exchange.

    W is sharded over mesh axis `axis`; pass `axis_h` to additionally shard
    H over a second mesh axis (the (tile_h, tile_w) grid of SURVEY.md
    section 2.4) — rows exchange `halo_h` boundary bands the same way
    columns exchange `halo`, and vertical flow is then clamped to the
    vertical halo budget.  image/flow/filt: global arrays (B, C, H, W);
    returns the global warp computed shard-locally.
    """
    B, C, H, W = image.shape
    t = mesh.shape[axis]
    th = mesh.shape[axis_h] if axis_h else 1
    assert W % t == 0, (W, t)
    assert H % th == 0, (H, th)
    fs = filter_size
    hh = (halo_h if halo_h is not None else halo) if axis_h else 0
    spec = P(batch_axis, None, axis_h, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec,) * 3,
        out_specs=spec,
        check_vma=False,
    )
    def fn(img, fl, ft):
        x_origin = jax.lax.axis_index(axis) * (W // t)
        ext = _exchange_halo(img, axis, halo, dim=-1)
        if axis_h:
            y_origin = jax.lax.axis_index(axis_h) * (H // th)
            # rows second: the W-extended array's corner halos ride along
            ext = _exchange_halo(ext, axis_h, hh, dim=-2)
        else:
            y_origin = 0
        return _local_filter_interp(ext, fl, ft, x_origin, y_origin,
                                    halo, hh, fs, W, H)

    return fn(image, flow, filt)
