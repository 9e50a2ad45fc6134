"""EDSR rectifier variants on TPU: fp32-accumulate+cast (current) vs bf16
conv output, and NHWC layout — hunting the 55 ms -> ~35 ms gap (61% MXU)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, args, iters=5):
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
    print(f"{name:44s} {ms:8.2f} ms  (compile {c:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dtype = jnp.bfloat16
    B, H, W = 1, 768, 1344
    CIN, F, NB = 169, 128, 10
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, CIN, H, W), dtype)
    head = jnp.asarray(rng.rand(F, CIN, 3, 3) * 0.02, dtype)
    body = [
        (jnp.asarray(rng.rand(F, F, 3, 3) * 0.02, dtype),
         jnp.asarray(rng.rand(F, F, 3, 3) * 0.02, dtype))
        for _ in range(NB)
    ]
    tail = jnp.asarray(rng.rand(3, F, 3, 3) * 0.02, dtype)
    print(f"devices: {jax.devices()}", flush=True)

    def conv(x, w, pet):
        out = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=pet)
        return out.astype(x.dtype)

    def edsr(x, pet):
        h = conv(x, head, pet)
        for w1, w2 in body:
            r = conv(jnp.maximum(conv(h, w1, pet), 0), w2, pet)
            h = h + r
        return conv(h, tail, pet)

    timeit("NCHW fp32-accum (current)", lambda x: edsr(x, jnp.float32), (x,))
    timeit("NCHW bf16 out", lambda x: edsr(x, None), (x,))

    # NHWC
    xh = jnp.asarray(rng.rand(B, H, W, CIN), dtype)
    headh = jnp.transpose(head, (2, 3, 1, 0))
    bodyh = [(jnp.transpose(a, (2, 3, 1, 0)), jnp.transpose(b, (2, 3, 1, 0))) for a, b in body]
    tailh = jnp.transpose(tail, (2, 3, 1, 0))

    def convh(x, w, pet):
        out = lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)
        return out.astype(x.dtype)

    def edsrh(x, pet):
        h = convh(x, headh, pet)
        for w1, w2 in bodyh:
            r = convh(jnp.maximum(convh(h, w1, pet), 0), w2, pet)
            h = h + r
        return convh(h, tailh, pet)

    timeit("NHWC fp32-accum", lambda x: edsrh(x, jnp.float32), (xh,))
    timeit("NHWC bf16 out", lambda x: edsrh(x, None), (xh,))

    # body-only fori_loop (compile-time win, maybe runtime same)
    ws1 = jnp.stack([a for a, _ in body])
    ws2 = jnp.stack([b for _, b in body])

    def edsr_scan(x):
        h = conv(x, head, jnp.float32)

        def blk(i, h):
            r = conv(jnp.maximum(conv(h, ws1[i], jnp.float32), 0), ws2[i], jnp.float32)
            return h + r

        h = jax.lax.fori_loop(0, NB, blk, h)
        return conv(h, tail, jnp.float32)

    timeit("NCHW fori_loop body", edsr_scan, (x,))


if __name__ == "__main__":
    main()
