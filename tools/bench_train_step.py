"""720p MEMC_Net_star train-step timing on the real chip (PERF.md record).

r5: the custom_vjp forwards run the Pallas kernels (raw-input residuals), so
the train step no longer pays the ~95 ms/warp XLA gather path for its primal.
Usage: python tools/bench_train_step.py [--h 768] [--w 1344] [--fp32]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")

    from memcnet_tpu import models as M
    from memcnet_tpu.train import make_interp_train_step, make_optimizer

    H, W = 768, 1344
    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    for i, a in enumerate(sys.argv):
        if a == "--h":
            H = int(sys.argv[i + 1])
        if a == "--w":
            W = int(sys.argv[i + 1])

    model = M.get_model("MEMC_Net_star")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v
              for k, v in params.items()}
    opt = make_optimizer(lr=1e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_interp_train_step(model, opt))

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, 3, H, W), dtype)
    x2 = jnp.asarray(rng.rand(1, 3, H, W), dtype)
    x1 = (x0 + x2) / 2

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x0, x1, x2)
    print(f"compile+first step: {time.time() - t0:.1f}s loss {float(loss):.4f}",
          flush=True)

    iters = 5
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, x0, x1, x2)
        final = float(loss)  # forces the chain
        best = min(best, (time.time() - t0) / iters)
    assert np.isfinite(final), final
    print(f"train step ({H}x{W}, {jnp.dtype(dtype).name}): "
          f"{best * 1e3:.1f} ms (loss {final:.4f})")


if __name__ == "__main__":
    main()
