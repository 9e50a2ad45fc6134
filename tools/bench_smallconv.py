"""Small-channel conv variants (MonoNet5 trunk shapes) on TPU: native
NCHW conv vs im2col matmul, per level. MonoNet's 16-32ch stride-1 convs are
suspected to run at padded-C=128 cost in XLA's native conv."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, args, iters=8):
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
    t0 = time.time()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:46s} {ms:8.2f} ms  (compile {c:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from memcnet_tpu.nn import layers as L

    dtype = jnp.bfloat16
    B = 1
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}", flush=True)

    # (cin, cout, H, W) mononet trunk levels at 720p-padded
    CASES = [
        (6, 16, 768, 1344),
        (16, 16, 768, 1344),
        (16, 32, 384, 672),
        (32, 32, 384, 672),
        (32, 64, 192, 336),
        (64, 64, 192, 336),
        (64, 128, 96, 168),
        (16, 16, 768, 1344 // 1),  # branch head shape
    ]
    for ci, co, h, w in CASES:
        x = jnp.asarray(rng.rand(B, ci, h, w), dtype)
        wgt = jnp.asarray(rng.rand(co, ci, 3, 3) * 0.05, dtype)
        b = jnp.zeros((co,), dtype)
        gf = 2 * ci * co * 9 * h * w * B / 1e9
        timeit(f"native {ci:4d}->{co:<4d} {h}x{w} ({gf:5.1f} GF)",
               lambda x, w_, b_: L.conv2d(x, w_, b_, stride=1, padding=1), (x, wgt, b))
        timeit(f"im2col {ci:4d}->{co:<4d} {h}x{w}",
               lambda x, w_, b_: L.conv2d_im2col(x, w_, b_, stride=1, padding=1), (x, wgt, b))

    # a pair of chained convs (fusion behavior differs from isolated)
    x = jnp.asarray(rng.rand(B, 6, 768, 1344), dtype)
    w1 = jnp.asarray(rng.rand(16, 6, 3, 3) * 0.05, dtype)
    w2 = jnp.asarray(rng.rand(16, 16, 3, 3) * 0.05, dtype)
    b1 = jnp.zeros((16,), dtype)

    def chain_native(x, w1, w2, b1):
        h = L.conv2d(x, w1, b1, stride=1, padding=1)
        return L.conv2d(jnp.maximum(h, 0), w2, b1, stride=1, padding=1)

    def chain_im2col(x, w1, w2, b1):
        h = L.conv2d_im2col(x, w1, b1, stride=1, padding=1)
        return L.conv2d_im2col(jnp.maximum(h, 0), w2, b1, stride=1, padding=1)

    timeit("chain native 6->16->16 full res", chain_native, (x, w1, w2, b1))
    timeit("chain im2col 6->16->16 full res", chain_im2col, (x, w1, w2, b1))


if __name__ == "__main__":
    main()
