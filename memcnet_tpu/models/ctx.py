"""Context extractor: ResNet18 conv1 at stride 1 (networks/ResNet/Resnet_conv1.py).

A single 7x7/64 conv (stride 1, not the ImageNet stride 2 — :221-222) over a
channel-normalized input.  The reference's normalization quirk is reproduced
verbatim (:263-265): mean 0.485 is used for ALL THREE channels and std 0.224
for both G and B — this must not be "fixed" or imported weights shift.
Key: ctxNet.conv1.weight (no bias).
"""

import jax.numpy as jnp

from memcnet_tpu.nn import layers as L
from memcnet_tpu.nn import init as I


def init_params(key, prefix="ctxNet", dtype=jnp.float32):
    return {f"{prefix}.conv1.weight": I.resnet_msra(key, (64, 3, 7, 7), dtype)}


def forward(params, x, prefix="ctxNet"):
    from memcnet_tpu.ops.pallas import conv_kernel as CK

    mean = jnp.asarray([0.485, 0.485, 0.485], x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray([0.229, 0.224, 0.224], x.dtype).reshape(1, 3, 1, 1)
    y = (x - mean) / std
    w = params[f"{prefix}.conv1.weight"]
    if CK.use_fast_conv(y):
        # Pallas band conv: XLA's direct conv leaves this 3->64 7x7 at ~8%
        # MXU in-model (2.5 ms + ~1.7 ms adjacent layout copies, r5 trace)
        return CK.conv2d_small_op(y, w, None)
    # direct conv: 7.9 ms vs 17.1 ms for the im2col einsum at 720p B=2 on
    # v5e — and the im2col einsum costs ~770 s of XLA compile at this shape
    # (most of the bench's cold compile); tools/bench_ctx.py
    return L.conv2d(y, w, None, stride=1, padding=3)
