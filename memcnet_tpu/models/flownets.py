"""FlowNetS: 6-level conv encoder + deconv decoder with multi-scale flow.

Reference: networks/FlowNetS/FlowNetS.py:33-117 (batchNorm=False variant used
by all shipped models, :122-136). Returns the quarter-resolution 2-channel
flow (flow2). Parameter keys match the reference state dict:
conv{N}.0.{weight,bias}, deconv{N}.0.*, predict_flow{N}.weight (no bias),
upsampled_flow{N}_to_{M}.weight (no bias).
"""

import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.nn import layers as L
from memcnet_tpu.nn import init as I

# (name, in, out, kernel, stride)
_ENC = [
    ("conv1", 6, 64, 7, 2),
    ("conv2", 64, 128, 5, 2),
    ("conv3", 128, 256, 5, 2),
    ("conv3_1", 256, 256, 3, 1),
    ("conv4", 256, 512, 3, 2),
    ("conv4_1", 512, 512, 3, 1),
    ("conv5", 512, 512, 3, 2),
    ("conv5_1", 512, 512, 3, 1),
    ("conv6", 512, 1024, 3, 2),
    ("conv6_1", 1024, 1024, 3, 1),
]
_DECONV = [("deconv5", 1024, 512), ("deconv4", 1026, 256), ("deconv3", 770, 128), ("deconv2", 386, 64)]
_PRED = [("predict_flow6", 1024), ("predict_flow5", 1026), ("predict_flow4", 770), ("predict_flow3", 386), ("predict_flow2", 194)]
_UP = ["upsampled_flow6_to_5", "upsampled_flow5_to_4", "upsampled_flow4_to_3", "upsampled_flow3_to_2"]


def init_params(key, prefix="flownets", dtype=jnp.float32):
    p = {}
    for name, cin, cout, k, _s in _ENC:
        key, k1 = jr.split(key)
        p[f"{prefix}.{name}.0.weight"] = I.flownets_normal(k1, (cout, cin, k, k), dtype)
        p[f"{prefix}.{name}.0.bias"] = jnp.zeros((cout,), dtype)
    for name, cin, cout in _DECONV:
        key, k1 = jr.split(key)
        p[f"{prefix}.{name}.0.weight"] = I.flownets_normal_iohw(k1, (cin, cout, 4, 4), dtype)
        p[f"{prefix}.{name}.0.bias"] = jnp.zeros((cout,), dtype)
    for name, cin in _PRED:
        key, k1 = jr.split(key)
        p[f"{prefix}.{name}.weight"] = I.flownets_normal(k1, (2, cin, 3, 3), dtype)
    for name in _UP:
        key, k1 = jr.split(key)
        p[f"{prefix}.{name}.weight"] = I.flownets_normal_iohw(k1, (2, 2, 4, 4), dtype)
    return p


def forward(params, x, prefix="flownets", training=False):
    """x: (B, 6, H, W) stacked frame pair; H, W divisible by 64. Returns
    (B, 2, H/4, W/4) flow2 (FlowNetS.py:80-111); with ``training=True`` the
    full multi-scale tuple (flow2, flow3, flow4, flow5, flow6) as the
    reference's train-mode forward does (FlowNetS.py:106-117, used for
    multi-scale EPE supervision when training FlowNetS itself)."""

    def enc(name, h, k, s):
        w = params[f"{prefix}.{name}.0.weight"]
        b = params[f"{prefix}.{name}.0.bias"]
        # conv1 (6-channel input) stays on the direct conv: im2col's strided
        # slicing is pathological on TPU (measured 225 ms vs 13 ms at 720p for
        # 6->64 k7/s2 on v5e); im2col only wins for stride-1 tiny-C convs.
        h = L.conv2d(h, w, b, stride=s, padding=(k - 1) // 2)
        return L.leaky_relu(h, 0.1)

    out = x
    acts = {}
    for name, _ci, _co, k, s in _ENC:
        out = enc(name, out, k, s)
        acts[name] = out

    def deconv(name, h):
        h = L.p_conv_transpose(params, f"{prefix}.{name}.0", h, stride=2, padding=1)
        return L.leaky_relu(h, 0.1)

    def predict(name, h):
        return L.conv2d(h, params[f"{prefix}.{name}.weight"], None, stride=1, padding=1)

    def upflow(name, f):
        return L.conv_transpose2d(f, params[f"{prefix}.{name}.weight"], None, stride=2, padding=1)

    out_conv2 = acts["conv2"]
    out_conv3 = acts["conv3_1"]
    out_conv4 = acts["conv4_1"]
    out_conv5 = acts["conv5_1"]
    out_conv6 = acts["conv6_1"]

    flow6 = predict("predict_flow6", out_conv6)
    flow6_up = upflow("upsampled_flow6_to_5", flow6)
    out_deconv5 = deconv("deconv5", out_conv6)

    concat5 = jnp.concatenate((out_conv5, out_deconv5, flow6_up), axis=1)
    flow5 = predict("predict_flow5", concat5)
    flow5_up = upflow("upsampled_flow5_to_4", flow5)
    out_deconv4 = deconv("deconv4", concat5)

    concat4 = jnp.concatenate((out_conv4, out_deconv4, flow5_up), axis=1)
    flow4 = predict("predict_flow4", concat4)
    flow4_up = upflow("upsampled_flow4_to_3", flow4)
    out_deconv3 = deconv("deconv3", concat4)

    concat3 = jnp.concatenate((out_conv3, out_deconv3, flow4_up), axis=1)
    flow3 = predict("predict_flow3", concat3)
    flow3_up = upflow("upsampled_flow3_to_2", flow3)
    out_deconv2 = deconv("deconv2", concat3)

    concat2 = jnp.concatenate((out_conv2, out_deconv2, flow3_up), axis=1)
    flow2 = predict("predict_flow2", concat2)
    if training:
        return flow2, flow3, flow4, flow5, flow6  # FlowNetS.py:106-112
    return flow2
