"""SepConv-family ops: separable-kernel synthesis and kernel-to-flow conversion.

TPU-native equivalents of the reference's SeparableConvLayer (N5) and
SeparableConvFlowLayer (N6).  Neither has a live model call site in the
reference (the SeparableConvLayer Python wrapper imports a nonexistent
``___ext`` module, functions/SeparableConvLayer.py:4), but both CUDA kernels
are exported capability, so the framework carries them.

Reference semantics (file:line under /root/reference/my_package/src/):
  * separable_conv: my_lib_kernel.cu:285-337.  Per output pixel (y, x) and
    channel c:  out = sum_{j,i < fs} input1[c, y+j, x+i] * vert[j, y, x]
    * horiz[i, y, x].  Output is valid-convolution sized (H-fs+1, W-fs+1)
    (bounds check :312-313; wrapper shape contract
    functions/SeparableConvLayer.py:21-27).
  * separable_conv_flow: my_lib_kernel.cu:19-84.  Converts the separable 1-D
    kernel pair into a flow field: the centroid of the vertical/horizontal
    kernel weights minus (fs-1)/2; where the weights sum to exactly 0 the
    output is the -2000 sentinel (:66-67,79-80).  Channel 0 = x (from horiz),
    channel 1 = y (from vert), matching :67 (c=1 <- vert) and :80 (c=0 <-
    horiz).

Implementation notes (TPU): the fs^2 taps are unrolled statically into
shifted elementwise multiply-adds — XLA fuses the whole reduction into one
VPU loop over the output tile; there is no gather and no dynamic shape.
Autodiff of this forward reproduces the reference's hand-derived backward
(my_lib_kernel.cu:339-390: gradients are the same trilinear products).
Array layout is NCHW, as everywhere in this package.
"""

from functools import partial

import jax
import jax.numpy as jnp

FLOW_SENTINEL = -2000.0  # my_lib_kernel.cu:67 — "no kernel mass" marker


@partial(jax.jit, static_argnames=())
def separable_conv(image, vert, horiz):
    """Separable adaptive convolution (SepConv synthesis).

    Args:
      image: (B, C, H, W) source frame.
      vert:  (B, fs, H-fs+1, W-fs+1) per-pixel vertical 1-D kernels.
      horiz: (B, fs, H-fs+1, W-fs+1) per-pixel horizontal 1-D kernels.
    Returns:
      (B, C, H-fs+1, W-fs+1) synthesized output.
    """
    B, C, H, W = image.shape
    fs = vert.shape[1]
    assert horiz.shape[1] == fs, (vert.shape, horiz.shape)
    oH, oW = H - fs + 1, W - fs + 1
    assert vert.shape[2:] == (oH, oW), (vert.shape, (oH, oW))

    out = jnp.zeros((B, C, oH, oW), image.dtype)
    for j in range(fs):
        # inner horizontal pass at row offset j: sum_i I[y+j, x+i] * h_i
        inner = jnp.zeros((B, C, oH, oW), image.dtype)
        for i in range(fs):
            inner = inner + image[:, :, j : j + oH, i : i + oW] * horiz[:, None, i]
        out = out + inner * vert[:, None, j]
    return out


@jax.jit
def separable_conv_flow(vert, horiz):
    """Kernel-centroid flow from separable 1-D kernel pairs.

    Args:
      vert:  (B, fs, oH, oW) vertical kernel weights.
      horiz: (B, fs, oH, oW) horizontal kernel weights.
    Returns:
      (B, 2, oH, oW) flow — channel 0 = x centroid of `horiz`, channel 1 = y
      centroid of `vert`; FLOW_SENTINEL where the weights sum to 0.
    """
    fs = vert.shape[1]
    assert horiz.shape[1] == fs

    def centroid(k):
        idx = jnp.arange(fs, dtype=k.dtype)[None, :, None, None]
        s = jnp.sum(k, axis=1)
        c = jnp.sum(idx * k, axis=1) / jnp.where(s == 0.0, 1.0, s)
        c = c - (fs - 1.0) / 2.0
        return jnp.where(jnp.abs(s) > 0.0, c, FLOW_SENTINEL)

    return jnp.stack([centroid(horiz), centroid(vert)], axis=1)
