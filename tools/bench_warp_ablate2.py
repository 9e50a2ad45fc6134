"""Ablate INSIDE the warp kernel: roll vs FMA vs DMA cost at the production
geometry (720p, C=67->128, fs=4, near-constant flow => ~1 bucket/tile).

Builds variant kernels by monkeypatching _warp_kernel with stripped bodies.
Results are numerically WRONG for stripped variants — timing only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memcnet_tpu.ops import warp as W
from memcnet_tpu.ops.pallas import warp_kernel as wk


def timeit(name, fn, *args, iters=8):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        return acc + jnp.sum(out.astype(jnp.float32))

    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    acc = step(acc, *args)
    float(acc)
    c = time.time() - t0
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:55s} {ms:8.2f} ms  (compile {c:.1f}s)", flush=True)
    return ms


def make_variant(mode):
    """mode: 'full' | 'noroll' | 'taps4' | 'nofma' | 'dmaonly'"""

    def _kern(fs, grid_n, out_dtype,
              r0f, c0f, sxf, nxf, nyxf,
              img_hbm, wtap_ref, dyr_ref, dxr_ref,
              out_ref, win_ref, acc_ref, sem):
        g = pl.program_id(0)
        sub = wk._sublane(win_ref.dtype)

        def start_dma(slot, gg):
            c = pl.multiple_of(c0f[gg], sub)
            return pltpu.make_async_copy(
                img_hbm.at[gg // grid_n, pl.ds(r0f[gg], wk.SH), pl.ds(c, wk.SW), :],
                win_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            start_dma(0, g).start()

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

        start_dma(slot, g).wait()
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if mode == "dmaonly":
            out_ref[:] = acc_ref[:].astype(out_dtype)
            return
        nx = nxf[g]
        sx = sxf[g]
        dyr = dyr_ref[:]
        dxr = dxr_ref[:]

        def bucket(k, _):
            dyk = k // nx
            dxk = k - dyk * nx
            match = (dyr == dyk) & (dxr == dxk)

            @pl.when(jnp.any(match))
            def _():
                m = match.astype(jnp.float32)
                dxs = dxk + sx
                width = wk._slab_width(win_ref.dtype)
                qa = pl.multiple_of((dxs // sub) * sub, sub)
                r = dxs - qa
                slab = win_ref[slot, pl.ds(dyk, wk.TH + fs - 1), pl.ds(qa, width), :]
                if mode == "noroll":
                    slab = slab.astype(jnp.float32)
                else:
                    slab = pltpu.roll(slab.astype(jnp.float32), width - r, axis=1)
                ntap = 4 if mode == "taps4" else fs * fs
                if mode != "nofma":
                    a = acc_ref[:]
                    cnt = 0
                    for j in range(fs):
                        for i in range(fs):
                            if cnt >= ntap:
                                break
                            w = wtap_ref[j * fs + i] * m
                            tap = slab[j:j + wk.TH, i:i + wk.TW, :]
                            a = a + w[:, :, None] * tap
                            cnt += 1
                    acc_ref[:] = a
            return 0

        jax.lax.fori_loop(0, nyxf[g], bucket, 0)
        out_ref[:] = acc_ref[:].astype(out_dtype)

    return _kern


def main():
    dtype = jnp.bfloat16
    B, H, Wd = 1, 768, 1344
    rng = np.random.RandomState(0)
    fs = 4
    print(f"devices: {jax.devices()}", flush=True)

    img = jnp.asarray(rng.rand(B, 67, H, Wd), dtype)
    flow = jnp.asarray(rng.rand(B, 2, H, Wd) * 0.3, dtype)  # ~1 bucket
    filt = jnp.asarray(rng.rand(B, fs * fs, H, Wd), dtype)

    def runner(image, flowv, filtv):
        valid, ix, iy, alpha, beta = W._valid_and_taps(image, flowv, fs)
        ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(Wd, dtype=jnp.int32)[None, None, :]
        dy = iy + (1 - fs // 2) - ys
        dx = ix + (1 - fs // 2) - xs
        plan = wk.plan_tiles(dy, dx, valid, fs, image.dtype)
        wtap = W._fused_tap_weights(filt, alpha, beta, valid, fs)
        img_nhwc = image.transpose(0, 2, 3, 1)
        return wk.filter_interp_warp_tiles(img_nhwc, wtap, plan, filter_size=fs)

    orig = wk._warp_kernel
    for mode in ("full", "noroll", "taps4", "nofma", "dmaonly"):
        wk._warp_kernel = make_variant(mode)
        timeit(f"variant {mode}", runner, img, flow, filt)
    wk._warp_kernel = orig


if __name__ == "__main__":
    main()
