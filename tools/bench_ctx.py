"""ctxNet conv variants: 3->64 7x7 stride-1 at 720p (the ResNet-conv1
context extractor).  The NCHW im2col einsum costs ~17 ms for two frames —
~1% MXU — layout experiments toward the ~0.5 ms roofline."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_components import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from memcnet_tpu.nn import layers as L

    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    B, H, W = 2, 768, 1344
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 3, H, W), dtype)
    w = jnp.asarray(rng.randn(64, 3, 7, 7) * 0.05, dtype)

    timeit("im2col NCHW einsum (current)", lambda x: L.conv2d_im2col(x, w, padding=3), (x,))

    def direct(x):
        return L.conv2d(x, w, padding=3)

    timeit("XLA direct conv NCHW", direct, (x,))

    def nhwc_im2col(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3))).transpose(0, 2, 3, 1)
        cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(7) for dx in range(7)]
        patches = jnp.concatenate(cols, axis=-1)  # (B,H,W,147)
        wf = w.transpose(2, 3, 1, 0).reshape(147, 64).astype(patches.dtype)
        out = jnp.einsum("bhwk,ko->bhwo", patches, wf,
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype).transpose(0, 3, 1, 2)

    timeit("im2col NHWC matmul", nhwc_im2col, (x,))

    def nhwc_conv(x):
        xh = x.transpose(0, 2, 3, 1)
        wh = w.transpose(2, 3, 1, 0)  # HWIO
        out = jax.lax.conv_general_dilated(
            xh, wh, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype).transpose(0, 3, 1, 2)

    timeit("XLA direct conv NHWC", nhwc_conv, (x,))

    def rowcol(x):
        # fold the 7 vertical taps into the channel dim with plain slices,
        # then ONE NHWC conv over the 7 horizontal taps (K=21 contraction)
        xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (0, 0)))
        rows = jnp.concatenate([xp[:, :, dy:dy + H, :] for dy in range(7)], axis=1)
        xh = rows.transpose(0, 2, 3, 1)  # (B,H,W,21)
        wh = w.transpose(2, 1, 3, 0).reshape(1, 21, 7, 64).transpose(0, 2, 1, 3)  # (1,7,21,64)
        out = jax.lax.conv_general_dilated(
            xh, wh, (1, 1), ((0, 0), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype).transpose(0, 3, 1, 2)

    timeit("row-fold + NHWC 1x7 conv", rowcol, (x,))

    # numeric agreement
    ref = np.asarray(L.conv2d_im2col(x, w, padding=3), np.float32)
    for name, fn in [("nhwc_im2col", nhwc_im2col), ("nhwc_conv", nhwc_conv), ("rowcol", rowcol)]:
        got = np.asarray(fn(x), np.float32)
        print(f"{name}: maxerr={np.abs(got - ref).max():.2e}")


if __name__ == "__main__":
    main()
