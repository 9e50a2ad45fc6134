"""Per-stage wall-time breakdown of MEMC_Net_s / SPyNet at 720p on the TPU.

MEMC_Net_s measured 362 ms/frame in r1 — slower than the much bigger star
model (289 ms) — with the SPyNet full-resolution pyramid the suspect.  This
bisects: per-level Basic conv stacks, per-level grid_sample warps, the full
pyramid, and the full model.

Usage: python tools/profile_spynet.py [--fp32]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_components import timeit  # noqa: E402


def main():
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M
    from memcnet_tpu.models import spynet
    from memcnet_tpu.models.spynet import _backward_warp, _basic, _preprocess
    from memcnet_tpu.nn import layers as L

    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    H, W = 768, 1344
    B = 2  # both directions batched, as MEMC_Net_s does

    model = M.get_model("MEMC_Net_s")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v
              for k, v in params.items()}
    rng = np.random.RandomState(0)
    first = jnp.asarray(rng.rand(B, 3, H, W), dtype)
    second = jnp.asarray(rng.rand(B, 3, H, W), dtype)

    timeit("spynet full pyramid", lambda a, b: spynet.forward(params, a, b),
           (first, second))

    # per-level costs: basic stack + warp at each pyramid resolution
    # (mirror spynet.forward: at most 5 pools -> at most 6 levels)
    h, w = H, W
    levels = [(h, w)]
    for _ in range(5):
        if h > 32 or w > 32:
            h, w = h // 2, w // 2
            levels.append((h, w))
    levels = levels[::-1]  # coarse -> fine

    for lvl, (h, w) in enumerate(levels):
        x = jnp.asarray(rng.rand(B, 8, h, w), dtype)
        timeit(f"L{lvl} basic 5xconv7 ({h}x{w})",
               lambda x, lvl=lvl: _basic(params, "flownets", lvl, x), (x,))
        img = jnp.asarray(rng.rand(B, 3, h, w), dtype)
        fl = jnp.asarray(rng.rand(B, 2, h, w) * 4, dtype)
        timeit(f"L{lvl} grid_sample warp ({h}x{w})",
               lambda i, f: _backward_warp(i, f), (img, fl))
        timeit(f"L{lvl} upsample x2 ({h}x{w})",
               lambda f: L.upsample_bilinear(f, 2), (fl,))

    # full model for reference
    x0 = jnp.asarray(rng.rand(1, 3, H, W), dtype)
    x2 = jnp.asarray(rng.rand(1, 3, H, W), dtype)

    def fwd(p, a, b):
        (i, r), *_ = model.forward(p, a, b)
        return r

    timeit("MEMC_Net_s FULL forward", fwd, (params, x0, x2), iters=3)


if __name__ == "__main__":
    main()
