"""Ablation bench for the warp window kernel: where do the ~17 us/tile go?

Monkeypatches warp_kernel tile constants (TH/SH) to measure tile-size scaling,
and times kernel variants with pieces stripped (DMA-only, no-roll).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=8):
    import jax
    import jax.numpy as jnp

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


def main():
    import jax
    import jax.numpy as jnp

    from memcnet_tpu.ops import warp as W
    from memcnet_tpu.ops.pallas import warp_kernel as wk

    dtype = jnp.bfloat16
    B, H, Wd = 1, 768, 1344
    rng = np.random.RandomState(0)
    fs = 4

    print(f"devices: {jax.devices()}", flush=True)

    def mk(C, fscale):
        img = jnp.asarray(rng.rand(B, C, H, Wd), dtype)
        ys, xs = np.mgrid[0:H, 0:Wd].astype(np.float32)
        fx = fscale * np.sin(2 * np.pi * ys / 193.0) * np.cos(2 * np.pi * xs / 541.0)
        fy = fscale * np.cos(2 * np.pi * ys / 379.0) * np.sin(2 * np.pi * xs / 257.0)
        flow = jnp.asarray(np.stack([fx, fy])[None].repeat(B, 0), dtype)
        filt = jnp.asarray(rng.rand(B, fs * fs, H, Wd), dtype)
        return img, flow, filt

    def kernel_only(image, flow, filt):
        valid, ix, iy, alpha, beta = W._valid_and_taps(image, flow, fs)
        ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(Wd, dtype=jnp.int32)[None, None, :]
        dy = iy + (1 - fs // 2) - ys
        dx = ix + (1 - fs // 2) - xs
        plan = wk.plan_tiles(dy, dx, valid, fs, image.dtype)
        wtap = W._fused_tap_weights(filt, alpha, beta, valid, fs)
        img_nhwc = image.transpose(0, 2, 3, 1)
        return wk.filter_interp_warp_tiles(img_nhwc, wtap, plan, filter_size=fs)

    img, flow, filt = mk(67, 0.15)

    for th, sh in [(8, 32), (16, 40), (32, 56), (64, 88)]:
        wk.TH, wk.SH = th, sh
        try:
            timeit(f"kernel TH={th} SH={sh} |f|~0.15", kernel_only, img, flow, filt)
        except Exception as e:
            print(f"TH={th} failed: {type(e).__name__}: {str(e)[:200]}")
    wk.TH, wk.SH = 8, 32



if __name__ == "__main__":
    main()
