"""Per-component wall-time breakdown of MEMC_Net_star at 720p on the TPU.

Each stage is jitted separately and timed with the same checksum-chaining
trick bench.py uses (the axon tunnel executes lazily; only fetching a scalar
that data-depends on the whole chain forces execution).

Usage: python tools/profile_components.py [--fp32]
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
    print(f"{name:36s} {ms:8.1f} ms   (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M
    from memcnet_tpu.models import ctx as ctx_mod
    from memcnet_tpu.models import edsr, flownets
    from memcnet_tpu.models.memc_net import _forward_flownets
    from memcnet_tpu.models.mononet import forward_single_path, rectify_specs
    from memcnet_tpu.ops import filter_interp_warp, flow_project

    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    H, W = 768, 1344
    B = 1

    model = M.get_model("MEMC_Net_star")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v for k, v in params.items()}

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, 3, H, W), dtype)
    x2 = jnp.asarray(rng.rand(B, 3, H, W), dtype)
    pair = jnp.concatenate((x0, x2), axis=1)
    pairs2 = jnp.concatenate(
        [pair, jnp.concatenate((x2, x0), axis=1)], axis=0
    )
    print(f"devices: {jax.devices()}  dtype={dtype.__name__}  {H}x{W}", flush=True)

    total = 0.0
    total += timeit("flownets (2-batch)", lambda p, x: flownets.forward(p, x), (params, pairs2))
    total += timeit(
        "flow upsample x4 + project(fill)",
        lambda p, x: flow_project(_forward_flownets(p, x), fillhole=True),
        (params, pairs2),
    )
    total += timeit(
        "mononet filter (trunk+2 branches)",
        lambda p, x: model._filters(p, x),
        (params, pair),
    )
    total += timeit(
        "mononet occlusion",
        lambda p, x: model._occlusions(p, x, None),
        (params, pair),
    )
    total += timeit(
        "ctxnet x2",
        lambda p, a, b: (ctx_mod.forward(p, a), ctx_mod.forward(p, b)),
        (params, x0, x2),
    )

    flow = jnp.asarray(rng.rand(B, 2, H, W) * 4 - 2, dtype)
    filt = jnp.asarray(rng.rand(B, 16, H, W), dtype)
    img67 = jnp.asarray(rng.rand(B, 67, H, W), dtype)
    total += timeit(
        "merged warp C=67 (x2)",
        lambda i, f, k: (
            filter_interp_warp(i, f, k),
            filter_interp_warp(i, -f, k),
        ),
        (img67, flow, filt),
    )
    rin = jnp.asarray(rng.rand(B, model.rectify_in, H, W), dtype)
    total += timeit(
        "EDSR rectifier (169ch)",
        lambda p, x: edsr.forward(p, x, n_resblocks=10),
        (params, rin),
    )
    print(f"{'SUM of stages':36s} {total:8.1f} ms", flush=True)

    timeit(
        "FULL forward",
        lambda p, a, b: model.forward(p, a, b)[0][1],
        (params, x0, x2),
        iters=3,
    )


if __name__ == "__main__":
    main()
