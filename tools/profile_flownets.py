"""Per-layer FlowNetS timing on TPU: find where the 240 ms goes.

Times each encoder conv / deconv / predict layer individually (chained
checksum forcing), and compares NCHW vs NHWC vs im2col formulations for the
slowest ones.
"""

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
        leaves = jax.tree_util.tree_leaves(out)
        return acc + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    try:
        acc = step(acc, *args)
        float(acc)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from memcnet_tpu.nn import layers as L

    dtype = jnp.bfloat16
    B, H, W = 2, 768, 1344
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}", flush=True)

    ENC = [
        ("conv1", 6, 64, 7, 2, H, W),
        ("conv2", 64, 128, 5, 2, H // 2, W // 2),
        ("conv3", 128, 256, 5, 2, H // 4, W // 4),
        ("conv3_1", 256, 256, 3, 1, H // 8, W // 8),
        ("conv4", 256, 512, 3, 2, H // 8, W // 8),
        ("conv4_1", 512, 512, 3, 1, H // 16, W // 16),
        ("conv5", 512, 512, 3, 2, H // 16, W // 16),
        ("conv5_1", 512, 512, 3, 1, H // 32, W // 32),
        ("conv6", 512, 1024, 3, 2, H // 32, W // 32),
        ("conv6_1", 1024, 1024, 3, 1, H // 64, W // 64),
    ]
    for name, ci, co, k, s, h, w in ENC:
        x = jnp.asarray(rng.rand(B, ci, h, w), dtype)
        wgt = jnp.asarray(rng.rand(co, ci, k, k) * 0.01, dtype)
        bias = jnp.zeros((co,), dtype)
        gf = 2 * ci * co * k * k * (h // s) * (w // s) * B / 1e9
        ms = timeit(f"{name} {ci}->{co} k{k}/s{s} ({gf:.1f} GF)",
                    lambda x, w, b, s=s, k=k: L.conv2d(x, w, b, stride=s, padding=(k - 1) // 2),
                    (x, wgt, bias))

    # deconvs
    DEC = [
        ("deconv5", 1024, 512, H // 64, W // 64),
        ("deconv4", 1026, 256, H // 32, W // 32),
        ("deconv3", 770, 128, H // 16, W // 16),
        ("deconv2", 386, 64, H // 8, W // 8),
    ]
    for name, ci, co, h, w in DEC:
        x = jnp.asarray(rng.rand(B, ci, h, w), dtype)
        wgt = jnp.asarray(rng.rand(ci, co, 4, 4) * 0.01, dtype)
        bias = jnp.zeros((co,), dtype)
        timeit(f"{name} {ci}->{co} k4/s2 tr",
               lambda x, w, b: L.conv_transpose2d(x, w, b, stride=2, padding=1),
               (x, wgt, bias))

    x = jnp.asarray(rng.rand(B, 194, H // 4, W // 4), dtype)
    wgt = jnp.asarray(rng.rand(2, 194, 3, 3) * 0.01, dtype)
    timeit("predict_flow2 194->2 k3", lambda x, w: L.conv2d(x, w, None, stride=1, padding=1), (x, wgt))

    # upflow tiny transpose conv 2->2
    x = jnp.asarray(rng.rand(B, 2, H // 8, W // 8), dtype)
    wgt = jnp.asarray(rng.rand(2, 2, 4, 4) * 0.01, dtype)
    timeit("upsampled_flow3_to_2 2->2 k4/s2 tr",
           lambda x, w: L.conv_transpose2d(x, w, None, stride=2, padding=1), (x, wgt))

    # --- variants for the whole encoder-ish costs: NHWC conv2 comparison
    for name, ci, co, k, s, h, w in [ENC[0], ENC[1], ENC[2]]:
        x = jnp.asarray(rng.rand(B, h, w, ci), dtype)
        wgt = jnp.asarray(rng.rand(k, k, ci, co) * 0.01, dtype)

        def nhwc(x, w, s=s, k=k):
            return lax.conv_general_dilated(
                x, w, window_strides=(s, s),
                padding=((k // 2, k // 2), (k // 2, k // 2)) if k % 2 == 1 else "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

        timeit(f"{name} NHWC", nhwc, (x, wgt))

    # im2col variant of conv2 (64->128 5x5/2)
    name, ci, co, k, s, h, w = ENC[1]
    x = jnp.asarray(rng.rand(B, ci, h, w), dtype)
    wgt = jnp.asarray(rng.rand(co, ci, k, k) * 0.01, dtype)
    bias = jnp.zeros((co,), dtype)
    timeit("conv2 im2col", lambda x, w, b: L.conv2d_im2col(x, w, b, stride=2, padding=2), (x, wgt, bias))


if __name__ == "__main__":
    main()
