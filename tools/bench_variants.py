"""Micro-bench alternative implementations of the hot ops on the TPU.

Variants for filter_interp_warp's patch fetch and flow_project's scatter —
run each on real hardware, keep the winner in the library.

Usage: python tools/bench_variants.py [warp|proj|all]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, args, iters=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return acc + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    try:
        acc = step(acc, *args)
        float(acc)
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:40s} {ms:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return ms


# --------------------------------------------------------------------------
# warp variants


def warp_variants(dtype):
    import jax
    import jax.numpy as jnp

    from memcnet_tpu.ops import filter_interp_warp
    from memcnet_tpu.ops.warp import _base_coords

    H, W, C, fs = 768, 1344, 67, 4
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, C, H, W), dtype)
    flow = jnp.asarray(rng.rand(1, 2, H, W) * 4 - 2, dtype)
    filt = jnp.asarray(rng.rand(1, fs * fs, H, W), dtype)

    timeit("current (patch-slice gather)", filter_interp_warp, (img, flow, filt))

    def weights_and_indices(image, flow, filt):
        B, C, H, W = image.shape
        x2, y2, fx, fy = _base_coords(flow)
        valid = (
            (x2 >= 0.0) & (y2 >= 0.0) & (x2 <= W - 1.0) & (y2 <= H - 1.0)
            & (jnp.abs(fx) < W / 2.0) & (jnp.abs(fy) < H / 2.0)
        )
        ix = jnp.clip(x2.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
        alpha = x2 - ix.astype(x2.dtype)
        beta = y2 - iy.astype(y2.dtype)
        half = fs // 2
        jj = jnp.arange(fs)
        B_, N = B, H * W
        wy = jnp.where(jj[None, None, :] >= half, beta.reshape(B, N, 1), 1.0 - beta.reshape(B, N, 1))
        wx = jnp.where(jj[None, None, :] >= half, alpha.reshape(B, N, 1), 1.0 - alpha.reshape(B, N, 1))
        fw = filt.reshape(B, fs, fs, N).transpose(0, 3, 1, 2)
        weight = (fw * wy[:, :, :, None] * wx[:, :, None, :]).astype(image.dtype)
        return valid, iy, ix, weight

    def v_16lineargathers(image, flow, filt):
        """16 take-along-axis gathers on a channels-last (HW, C) view."""
        B, C, H, W = image.shape
        fs, half, pad = 4, 2, 4
        valid, iy, ix, weight = weights_and_indices(image, flow, filt)
        img_p = jnp.pad(image, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
        Hp, Wp = H + 2 * pad, W + 2 * pad
        flat = img_p.transpose(0, 2, 3, 1).reshape(B, Hp * Wp, C)
        iy0 = (iy + 1 - half + pad).reshape(B, H * W)
        ix0 = (ix + 1 - half + pad).reshape(B, H * W)
        lin0 = iy0 * Wp + ix0
        acc = jnp.zeros((B, H * W, C), image.dtype)
        for j in range(fs):
            for i in range(fs):
                lin = (lin0 + j * Wp + i)[:, :, None]
                tap = jnp.take_along_axis(flat, lin, axis=1)
                acc = acc + tap * weight[:, :, j, i][:, :, None]
        out = acc.transpose(0, 2, 1).reshape(B, C, H, W)
        return jnp.where(valid[:, None], out, jax.lax.stop_gradient(image))

    timeit("16 linear gathers (full-C taps)", v_16lineargathers, (img, flow, filt))

    def v_4rowslices(image, flow, filt):
        """4 gathers of (1, fs, C) row slices instead of one (fs, fs, C)."""
        B, C, H, W = image.shape
        fs, half, pad = 4, 2, 4
        valid, iy, ix, weight = weights_and_indices(image, flow, filt)
        img_p = jnp.pad(image, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
        img_cl = img_p.transpose(0, 2, 3, 1)
        iy0 = (iy + 1 - half + pad).reshape(H * W)
        ix0 = (ix + 1 - half + pad).reshape(H * W)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1)
        )
        acc = jnp.zeros((H * W, C), image.dtype)
        for j in range(fs):
            starts = jnp.stack([iy0 + j, ix0], axis=-1)
            row = jax.lax.gather(
                img_cl[0], starts, dnums, slice_sizes=(1, fs, C),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # (N, fs, C)
            acc = acc + jnp.einsum("nic,ni->nc", row, weight[0, :, j, :])
        out = acc.T.reshape(1, C, H, W)
        return jnp.where(valid[:, None], out, jax.lax.stop_gradient(image))

    timeit("4 row-slice gathers", v_4rowslices, (img, flow, filt))

    def v_split_channels(image, flow, filt):
        """Patch gather in two chunks of C (halves VMEM pressure per gather)."""
        h1 = filter_interp_warp(image[:, :32], flow, filt)
        h2 = filter_interp_warp(image[:, 32:], flow, filt)
        return jnp.concatenate([h1, h2], axis=1)

    timeit("split-C patch gathers (32+35)", v_split_channels, (img, flow, filt))

    def v_unbatched_b1(image, flow, filt):
        """Same patch gather but WITHOUT the vmap batch dimension (B=1
        squeezed): batched gathers cost more per descriptor (VE measurement),
        so a B=1 fast path may pay off."""
        from memcnet_tpu.ops.warp import _gather_patches

        B, C, H, W = image.shape
        assert B == 1
        fs, half, pad = 4, 2, 4
        valid, iy, ix, weight = weights_and_indices(image, flow, filt)
        img_p = jnp.pad(image, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
        img_cl = img_p.transpose(0, 2, 3, 1)[0]
        N = H * W
        iy_start = (iy + 1 - half + pad).reshape(N)
        ix_start = (ix + 1 - half + pad).reshape(N)
        patches = _gather_patches(img_cl, iy_start, ix_start, fs)[None]
        acc = jnp.einsum("bnjic,bnji->bnc", patches, weight)
        out = acc.transpose(0, 2, 1).reshape(B, C, H, W)
        return jnp.where(valid[:, None], out, jax.lax.stop_gradient(image))

    r = timeit("unbatched B=1 patch gather", v_unbatched_b1, (img, flow, filt))
    if r is not None:
        got = np.asarray(v_unbatched_b1(img, flow, filt), np.float32)
        want = np.asarray(filter_interp_warp(img, flow, filt), np.float32)
        print(f"  max diff vs current: {np.abs(got - want).max():.2e}", flush=True)

    def v_padded_c(image, flow, filt):
        """Pad C 67->128 so each gathered patch row is a full 128-lane tile."""
        B, C, H, W = image.shape
        imgp = jnp.pad(image, ((0, 0), (0, 128 - C), (0, 0), (0, 0)))
        return filter_interp_warp(imgp, flow, filt)[:, :C]

    timeit("patch gather with C padded to 128", v_padded_c, (img, flow, filt))

    # fp32 indices/weights but bf16 patches is the default; try full fp32
    img32 = img.astype(jnp.float32)
    filt32 = filt.astype(jnp.float32)
    flow32 = flow.astype(jnp.float32)
    timeit("current, fp32", filter_interp_warp, (img32, flow32, filt32))

    def v_c3_only(image, flow, filt):
        return filter_interp_warp(image[:, :3], flow, filt)

    timeit("current, C=3 slice only", v_c3_only, (img, flow, filt))

    def v_stacked_linear(image, flow, filt):
        """Pre-stack all 16 tap shifts channels-last, then ONE 1-D linear
        take_along_axis gather per pixel (linear-index descriptors measured
        ~4x cheaper than 2-D slice-gather descriptors)."""
        B, C, H, W = image.shape
        fs, half, pad = 4, 2, 4
        valid, iy, ix, weight = weights_and_indices(image, flow, filt)
        img_p = jnp.pad(image, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
        img_cl = img_p.transpose(0, 2, 3, 1)  # (B, Hp, Wp, C)
        Hs = H + pad + 1  # start positions range [0, H+pad] etc.
        Ws = W + pad + 1
        stack = jnp.concatenate(
            [img_cl[:, j : j + Hs, i : i + Ws, :] for j in range(fs) for i in range(fs)],
            axis=-1,
        )  # (B, Hs, Ws, fs*fs*C)
        flat = stack.reshape(B, Hs * Ws, fs * fs * C)
        iy0 = (iy + 1 - half + pad).reshape(B, H * W)
        ix0 = (ix + 1 - half + pad).reshape(B, H * W)
        lin = (iy0 * Ws + ix0)[..., None]
        patches = jnp.take_along_axis(flat, lin, axis=1)  # (B, N, fs*fs*C)
        patches = patches.reshape(B, H * W, fs, fs, C)
        acc = jnp.einsum("bnjic,bnji->bnc", patches, weight)
        out = acc.transpose(0, 2, 1).reshape(B, C, H, W)
        return jnp.where(valid[:, None], out, jax.lax.stop_gradient(image))

    r = timeit("stacked-shift single linear gather", v_stacked_linear, (img, flow, filt))
    if r is not None:
        got = np.asarray(v_stacked_linear(img, flow, filt), np.float32)
        want = np.asarray(filter_interp_warp(img, flow, filt), np.float32)
        print(f"  max diff vs current: {np.abs(got - want).max():.2e}", flush=True)

    def v_stacked_two_warps(image, flow, filt):
        """Both directions share the stacked tensor."""
        return (v_stacked_linear(image, flow, filt),
                v_stacked_linear(image, -flow, filt))

    timeit("stacked linear gather (x2 directions)", v_stacked_two_warps, (img, flow, filt))


# --------------------------------------------------------------------------
# projection variants


def proj_variants(dtype):
    import jax
    import jax.numpy as jnp

    from memcnet_tpu.ops import flow_project
    from memcnet_tpu.ops.projection import _directional_fill, _landing_cells

    H, W = 768, 1344
    rng = np.random.RandomState(0)
    flow = jnp.asarray(rng.rand(2, 2, H, W) * 30 - 15, dtype)

    timeit("flow_project (fillhole)", partial(flow_project, fillhole=True), (flow,))
    timeit("flow_project (no fill)", partial(flow_project, fillhole=False), (flow,))

    def scatter_only(flow):
        B, _, H, W = flow.shape
        valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
        vals = jnp.where(valid[:, None], -flow, 0.0).reshape(B, 2, H * W)
        wts = jnp.where(valid, 1.0, 0.0).reshape(B, H * W)
        out = jnp.zeros((B, 2, H * W), flow.dtype)
        cnt = jnp.zeros((B, H * W), flow.dtype)
        for iy, ix in ((iyT, ixL), (iyT, ixR), (iyB, ixL), (iyB, ixR)):
            lin = (iy * W + ix).reshape(B, H * W)
            out = out.at[jnp.arange(B)[:, None, None], jnp.arange(2)[None, :, None], lin[:, None, :]].add(vals)
            cnt = cnt.at[jnp.arange(B)[:, None], lin].add(wts)
        return out, cnt

    timeit("scatter4 alone", scatter_only, (flow,))

    def scatter_fused3(flow):
        """One scatter of a 3-plane payload (fx, fy, 1) instead of 4x(2ch)+4x(1ch)."""
        B, _, H, W = flow.shape
        valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
        payload = jnp.concatenate(
            [jnp.where(valid[:, None], -flow, 0.0), jnp.where(valid, 1.0, 0.0)[:, None]], axis=1
        ).reshape(B, 3, H * W)
        out = jnp.zeros((B, 3, H * W), flow.dtype)
        for iy, ix in ((iyT, ixL), (iyT, ixR), (iyB, ixL), (iyB, ixR)):
            lin = (iy * W + ix).reshape(B, H * W)
            out = out.at[jnp.arange(B)[:, None, None], jnp.arange(3)[None, :, None], lin[:, None, :]].add(payload)
        return out

    timeit("scatter4 fused payload", scatter_fused3, (flow,))

    def fill_only(flow):
        B, _, H, W = flow.shape
        cnt = (flow[:, 0] > 0).astype(flow.dtype)
        return _directional_fill(flow, cnt, False)

    timeit("directional fill alone", fill_only, (flow,))

    def sort_based(flow):
        """Scatter-free: sort landing keys, prefix-sum payloads, and read each
        cell's segment sum by adjacent differences of searchsorted cuts."""
        B, _, H, W = flow.shape
        N = H * W
        valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
        fx = jnp.where(valid, -flow[:, 0], 0.0).reshape(B, N).astype(jnp.float32)
        fy = jnp.where(valid, -flow[:, 1], 0.0).reshape(B, N).astype(jnp.float32)
        one = jnp.where(valid, 1.0, 0.0).reshape(B, N).astype(jnp.float32)
        keys = jnp.concatenate(
            [(iy * W + ix).reshape(B, N) for iy, ix in ((iyT, ixL), (iyT, ixR), (iyB, ixL), (iyB, ixR))],
            axis=1,
        )
        vx = jnp.tile(fx, (1, 4))
        vy = jnp.tile(fy, (1, 4))
        vw = jnp.tile(one, (1, 4))
        ks, sx, sy, sw = jax.lax.sort((keys, vx, vy, vw), dimension=1, num_keys=1)
        Tx = jnp.cumsum(sx, axis=1)
        Ty = jnp.cumsum(sy, axis=1)
        Tw = jnp.cumsum(sw, axis=1)
        q = jnp.arange(N, dtype=jnp.int32)
        right = jax.vmap(lambda k: jnp.searchsorted(k, q, side="right"))(ks)  # (B, N)
        z = jnp.zeros((B, 1), jnp.float32)
        Tx = jnp.concatenate([z, Tx], 1)
        Ty = jnp.concatenate([z, Ty], 1)
        Tw = jnp.concatenate([z, Tw], 1)
        cutx = jnp.take_along_axis(Tx, right, axis=1)
        cuty = jnp.take_along_axis(Ty, right, axis=1)
        cutw = jnp.take_along_axis(Tw, right, axis=1)
        sumx = jnp.diff(cutx, prepend=z, axis=1)
        sumy = jnp.diff(cuty, prepend=z, axis=1)
        cnt = jnp.diff(cutw, prepend=z, axis=1)
        avg = jnp.stack([sumx, sumy], 1) / jnp.where(cnt > 0, cnt, 1.0)[:, None]
        return avg.reshape(B, 2, H, W).astype(flow.dtype), cnt.reshape(B, H, W)

    timeit("sort-based projection (no fill)", sort_based, (flow,))

    def sort_based_32(flow):
        """Same but keys packed with payload index; single-operand sorts."""
        B, _, H, W = flow.shape
        N = H * W
        valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
        keys = jnp.concatenate(
            [(iy * W + ix).reshape(B, N) for iy, ix in ((iyT, ixL), (iyT, ixR), (iyB, ixL), (iyB, ixR))],
            axis=1,
        )
        ks = jax.lax.sort(keys, dimension=1)
        return ks

    timeit("  sort(keys) alone", sort_based_32, (flow,))

    def searchsorted_only(flow):
        B, _, H, W = flow.shape
        N = H * W
        valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
        keys = (iyT * W + ixL).reshape(B, N)
        ks = jax.lax.sort(jnp.tile(keys, (1, 4)), dimension=1)
        q = jnp.arange(N, dtype=jnp.int32)
        return jax.vmap(lambda k: jnp.searchsorted(k, q, side="right"))(ks)

    timeit("  sort + searchsorted", searchsorted_only, (flow,))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.bfloat16
    if which in ("warp", "all"):
        warp_variants(dtype)
    if which in ("proj", "all"):
        proj_variants(dtype)


if __name__ == "__main__":
    main()
