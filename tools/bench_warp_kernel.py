"""Microbenchmark the Pallas warp window kernel (ops/pallas/warp_kernel.py)
at the production geometry (720p padded, C=67 merged img+ctx warp), isolating
where its time goes: DMA window size, bucket count, and call overhead.

Timing rides the chained-checksum method (PERF.md): the axon tunnel executes
lazily, so each iteration data-depends on the last via a scalar.
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

    dtype = jnp.bfloat16
    B, H, Wd = 1, 768, 1344
    rng = np.random.RandomState(0)
    fs = 4

    print(f"devices: {jax.devices()}", flush=True)

    def mk(C, fscale):
        img = jnp.asarray(rng.rand(B, C, H, Wd), dtype)
        # smooth flow field: low-frequency sinusoid, amplitude fscale px
        ys, xs = np.mgrid[0:H, 0:Wd].astype(np.float32)
        fx = fscale * np.sin(2 * np.pi * ys / 193.0) * np.cos(2 * np.pi * xs / 541.0)
        fy = fscale * np.cos(2 * np.pi * ys / 379.0) * np.sin(2 * np.pi * xs / 257.0)
        flow = jnp.asarray(np.stack([fx, fy])[None].repeat(B, 0), dtype)
        filt = jnp.asarray(rng.rand(B, fs * fs, H, Wd), dtype)
        return img, flow, filt

    for C in (67,):
        for fscale in (0.0, 2.0, 8.0, 24.0):
            img, flow, filt = mk(C, fscale)
            timeit(f"pallas warp C={C} fs={fs} |f|~{fscale}",
                   lambda a, b, c: W._fast_op(fs)(a, b, c), img, flow, filt)

    img, flow, filt = mk(67, 2.0)
    os.environ["MEMCNET_NO_PALLAS"] = "1"
    timeit("XLA chunked fallback C=67 |f|~2",
           lambda a, b, c: W._xla_forward(a, b, c, 4), img, flow, filt)
    del os.environ["MEMCNET_NO_PALLAS"]

    # kernel-only (no plan, no wtap, no select): how much of the cond cost is
    # the pallas_call itself?
    from memcnet_tpu.ops.pallas import warp_kernel as wk

    img, flow, filt = mk(67, 2.0)

    def kernel_only(image, flow, filt):
        valid, ix, iy, alpha, beta = W._valid_and_taps(image, flow, fs)
        ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(Wd, dtype=jnp.int32)[None, None, :]
        dy = iy + (1 - fs // 2) - ys
        dx = ix + (1 - fs // 2) - xs
        plan = wk.plan_tiles(dy, dx, valid, fs, image.dtype)
        wtap = W._fused_tap_weights(filt, alpha, beta, valid, fs)
        img_nhwc = image.transpose(0, 2, 3, 1)
        acc = wk.filter_interp_warp_tiles(img_nhwc, wtap, plan, filter_size=fs)
        return acc

    timeit("kernel+plan (no cond, no select, no transpose-back)",
           kernel_only, img, flow, filt)

    def plan_only(image, flow, filt):
        valid, ix, iy, alpha, beta = W._valid_and_taps(image, flow, fs)
        ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(Wd, dtype=jnp.int32)[None, None, :]
        dy = iy + (1 - fs // 2) - ys
        dx = ix + (1 - fs // 2) - xs
        plan = wk.plan_tiles(dy, dx, valid, fs, image.dtype)
        wtap = W._fused_tap_weights(filt, alpha, beta, valid, fs)
        return plan["dy_rel"], plan["dx_rel"], wtap

    timeit("plan+wtap only (XLA pre/post work)", plan_only, img, flow, filt)


if __name__ == "__main__":
    main()
