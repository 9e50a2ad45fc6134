"""Scaling benchmark: frames/s/chip on a (data x tile) mesh at 1..N devices.

The BASELINE.json north-star metric is frames/s/chip at 1 chip, 1 host and
N>=2 hosts.  On real multi-chip hardware this measures true scaling over
ICI; on a single chip it degenerates to the headline bench; under
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 it
validates the sharded program structure (tiny shapes, wall-times not
meaningful).

Usage: python tools/bench_scaling.py [--sizes 1,2,4,8] [--hw H,W] [--iters N]
       [--multihost]   # jax.distributed.initialize across hosts (DCN); run
                       # the same command on every host of the slice
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_mesh(n, H, W, iters, dtype_name):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M
    from memcnet_tpu.parallel.mesh import frame_sharding, make_mesh, replicated

    dtype = getattr(jnp, dtype_name)
    mesh = make_mesh(n)
    if mesh.size != n:
        print(f"[skip] only {mesh.size} devices available (wanted {n})")
        return None
    data = mesh.shape["data"]
    tile = mesh.shape["tile"]

    model = M.get_model("MEMC_Net_star")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v for k, v in params.items()}
    params = jax.device_put(params, replicated(mesh))

    rng = np.random.RandomState(0)
    B = data  # one frame pair per data-shard
    Wl = W * tile // tile  # W stays global; tile shards split it
    fsh = frame_sharding(mesh)
    x0 = jax.device_put(rng.rand(B, 3, H, Wl).astype(np.float32), fsh).astype(dtype)
    x2 = jax.device_put(rng.rand(B, 3, H, Wl).astype(np.float32), fsh).astype(dtype)

    from memcnet_tpu.parallel.context import spatial_tiling

    @jax.jit
    def step(params, x0, x2, acc):
        (interp, rectified), _o, _f, _occ = model.forward(params, x0, x2)
        return jnp.clip(rectified, 0, 1), acc + jnp.sum(interp.astype(jnp.float32))

    import contextlib

    # W-tiled meshes route warp/projection through the shard_map halo paths
    # (trace-time dispatch); single-tile meshes keep the global ops
    ctx = spatial_tiling(mesh, halo=64) if tile > 1 else contextlib.nullcontext()
    with ctx:
        acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        out, a = step(params, x0, x2, acc)
        float(a)
        compile_s = time.time() - t0

        acc = jnp.zeros((), jnp.float32)
        cur = x0
        t0 = time.time()
        for _ in range(iters):
            cur, acc = step(params, cur, x2, acc)
        float(acc)
    dt = (time.time() - t0) / iters
    frames = B  # frames produced per step
    fps = frames / dt
    print(
        f"mesh {data}x{tile} ({n} dev): {fps:8.2f} frames/s total, "
        f"{fps / n:7.2f} frames/s/chip  ({dt * 1e3:.1f} ms/step, compile {compile_s:.0f}s)",
        flush=True,
    )
    return fps / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--hw", default=None, help="H,W (default 768,1344 on TPU; 128,256 on CPU)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize the JAX distributed runtime first "
                         "(coordinator from env/TPU metadata); gives the "
                         "N>=2-hosts row of the north-star table")
    args = ap.parse_args()

    import jax

    if args.multihost:
        jax.distributed.initialize()
        print(f"distributed runtime: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices",
              flush=True)

    plat = jax.devices()[0].platform
    if args.hw:
        H, W = (int(v) for v in args.hw.split(","))
    elif plat == "cpu":
        H, W = 128, 256
    else:
        H, W = 768, 1344
    print(f"platform={plat} devices={len(jax.devices())} shape={H}x{W}", flush=True)
    for n in (int(s) for s in args.sizes.split(",")):
        if n > len(jax.devices()):
            print(f"[skip] {n} > available {len(jax.devices())}")
            continue
        bench_mesh(n, H, W, args.iters, args.dtype)


if __name__ == "__main__":
    main()
