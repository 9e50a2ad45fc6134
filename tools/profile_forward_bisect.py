"""Cumulative bisect of MEMC_Net_star.forward on TPU: find composition
overhead that per-stage timing misses (each prefix jitted as ONE program).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, args, iters=4):
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
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:40s} {ms:8.1f} ms  (compile {c:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M
    from memcnet_tpu.models import ctx as ctx_mod
    from memcnet_tpu.models import edsr
    from memcnet_tpu.ops import filter_interp_warp

    dtype = jnp.bfloat16
    H, W = 768, 1344
    model = M.get_model("MEMC_Net_star")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v for k, v in params.items()}
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, 3, H, W), dtype)
    x2 = jnp.asarray(rng.rand(1, 3, H, W), dtype)
    print(f"devices: {jax.devices()}", flush=True)

    def upto_flows(params, x0, x2):
        return model._flows(params, x0, x2, fillhole=True)

    def upto_filters(params, x0, x2):
        pair = jnp.concatenate((x0, x2), axis=1)
        offs = model._flows(params, x0, x2, fillhole=True)
        f, o = model._filters_and_occlusions(params, pair)
        return offs, f, o

    def upto_ctx(params, x0, x2):
        offs, f, o = upto_filters(params, x0, x2)
        return offs, f, o, ctx_mod.forward(params, x0), ctx_mod.forward(params, x2)

    def upto_warps(params, x0, x2):
        offs, filters, occs, c0, c2 = upto_ctx(params, x0, x2)
        m0 = filter_interp_warp(jnp.concatenate((x0, c0), 1), offs[0], filters[0])
        m1 = filter_interp_warp(jnp.concatenate((x2, c2), 1), offs[1], filters[1])
        return offs, filters, occs, m0, m1

    def upto_blend(params, x0, x2):
        offs, filters, occs, m0, m1 = upto_warps(params, x0, x2)
        w0, ctx0 = m0[:, :3], jax.lax.stop_gradient(m0[:, 3:])
        w1, ctx1 = m1[:, :3], jax.lax.stop_gradient(m1[:, 3:])
        blended = model._blend(w0, w1, occs)
        return blended, offs, filters, occs, ctx0, ctx1

    def full(params, x0, x2):
        return model.forward(params, x0, x2)[0][1]

    timeit("A flows (proj+fill)", upto_flows, (params, x0, x2))
    timeit("B + mononets (fused)", upto_filters, (params, x0, x2))
    timeit("C + ctx", upto_ctx, (params, x0, x2))
    timeit("D + warps", upto_warps, (params, x0, x2))
    timeit("E + blend", upto_blend, (params, x0, x2))
    timeit("F FULL (with EDSR)", full, (params, x0, x2))


if __name__ == "__main__":
    main()
