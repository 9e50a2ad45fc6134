"""Cumulative-prefix timing of FlowNetS on TPU (per-dispatch overhead ~6ms,
so per-layer isolation lies; deltas between cumulative prefixes don't).
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
    acc = step(acc, *args)
    float(acc)
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
    import jax.random as jr

    from memcnet_tpu.models import flownets
    from memcnet_tpu.nn import layers as L

    dtype = jnp.bfloat16
    B, H, W = 2, 768, 1344
    rng = np.random.RandomState(0)
    params = flownets.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) for k, v in params.items()}
    x = jnp.asarray(rng.rand(B, 6, H, W), dtype)
    print(f"devices: {jax.devices()}", flush=True)

    prefix = "flownets"

    def enc_prefix(n):
        def f(params, x):
            out = x
            for name, _ci, _co, k, s in flownets._ENC[:n]:
                w = params[f"{prefix}.{name}.0.weight"]
                b = params[f"{prefix}.{name}.0.bias"]
                if w.shape[1] <= 8:
                    out = L.conv2d_im2col(out, w, b, stride=s, padding=(k - 1) // 2)
                else:
                    out = L.conv2d(out, w, b, stride=s, padding=(k - 1) // 2)
                out = L.leaky_relu(out, 0.1)
            return out
        return f

    for n in (1, 2, 3, 6, 10):
        timeit(f"encoder[:{n}]", enc_prefix(n), (params, x))

    # decoder built on frozen encoder activations
    def run_encoder(params, x):
        out = x
        acts = {}
        for name, _ci, _co, k, s in flownets._ENC:
            w = params[f"{prefix}.{name}.0.weight"]
            b = params[f"{prefix}.{name}.0.bias"]
            if w.shape[1] <= 8:
                out = L.conv2d_im2col(out, w, b, stride=s, padding=(k - 1) // 2)
            else:
                out = L.conv2d(out, w, b, stride=s, padding=(k - 1) // 2)
            out = L.leaky_relu(out, 0.1)
            acts[name] = out
        return acts

    acts = jax.jit(run_encoder)(params, x)
    acts = {k: jax.block_until_ready(v) for k, v in acts.items()}

    def decoder(params, acts):
        def deconv(name, h):
            h = L.p_conv_transpose(params, f"{prefix}.{name}.0", h, stride=2, padding=1)
            return L.leaky_relu(h, 0.1)

        def predict(name, h):
            return L.conv2d(h, params[f"{prefix}.{name}.weight"], None, stride=1, padding=1)

        def upflow(name, f):
            return L.conv_transpose2d(f, params[f"{prefix}.{name}.weight"], None, stride=2, padding=1)

        flow6 = predict("predict_flow6", acts["conv6_1"])
        flow6_up = upflow("upsampled_flow6_to_5", flow6)
        out_deconv5 = deconv("deconv5", acts["conv6_1"])
        concat5 = jnp.concatenate((acts["conv5_1"], out_deconv5, flow6_up), axis=1)
        flow5 = predict("predict_flow5", concat5)
        flow5_up = upflow("upsampled_flow5_to_4", flow5)
        out_deconv4 = deconv("deconv4", concat5)
        concat4 = jnp.concatenate((acts["conv4_1"], out_deconv4, flow5_up), axis=1)
        flow4 = predict("predict_flow4", concat4)
        flow4_up = upflow("upsampled_flow4_to_3", flow4)
        out_deconv3 = deconv("deconv3", concat4)
        concat3 = jnp.concatenate((acts["conv3_1"], out_deconv3, flow4_up), axis=1)
        flow3 = predict("predict_flow3", concat3)
        flow3_up = upflow("upsampled_flow3_to_2", flow3)
        out_deconv2 = deconv("deconv2", concat3)
        concat2 = jnp.concatenate((acts["conv2"], out_deconv2, flow3_up), axis=1)
        flow2 = predict("predict_flow2", concat2)
        return flow2

    timeit("decoder (from frozen acts)", decoder, (params, acts))

    def dec_stage1(params, acts):
        flow6 = L.conv2d(acts["conv6_1"], params[f"{prefix}.predict_flow6.weight"], None, stride=1, padding=1)
        return flow6

    timeit("predict_flow6 only", dec_stage1, (params, acts))

    def dec_deconv5(params, acts):
        return L.p_conv_transpose(params, f"{prefix}.deconv5.0", acts["conv6_1"], stride=2, padding=1)

    timeit("deconv5 only", dec_deconv5, (params, acts))

    def dec_upflow6(params, acts):
        flow6 = L.conv2d(acts["conv6_1"], params[f"{prefix}.predict_flow6.weight"], None, stride=1, padding=1)
        return L.conv_transpose2d(flow6, params[f"{prefix}.upsampled_flow6_to_5.weight"], None, stride=2, padding=1)

    timeit("predict6 + upflow6", dec_upflow6, (params, acts))

    timeit("FULL flownets", flownets.forward, (params, x))


if __name__ == "__main__":
    main()
