"""Pallas scatter-accumulate experiment for flow projection.

XLA's scatter costs ~45 ns/update (scalar loop) -> ~90 ms for the 2M base
updates at 720p B=2.  This kernel keeps the (HW/128, 3*128) fp32 accumulator
resident in VMEM and does a one-hot dynamic-sublane RMW per element; if the
per-element cost lands near ~10-20 cycles it beats XLA several-fold.

Usage:
  python tools/bench_pallas_scatter.py check   # CPU interpret-mode correctness
  python tools/bench_pallas_scatter.py tpu     # TPU timing vs XLA scatter
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 1024  # 8 sublanes x 128 lanes per SMEM block


def make_scatter(HW, N, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = HW // 128
    assert HW % 128 == 0

    def kernel(lin_ref, pay_ref, out_ref):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * 128), 1)
        lane_mod = lane_iota % 128
        chan = lane_iota // 128

        def body(i, _):
            r = i // 128
            l = i - r * 128
            k = lin_ref[0, 0, r, l]
            row = k // 128
            lane = k - row * 128
            p0 = pay_ref[0, 0, 0, r, l]
            p1 = pay_ref[0, 1, 0, r, l]
            p2 = pay_ref[0, 2, 0, r, l]
            val = jnp.where(chan == 0, p0, jnp.where(chan == 1, p1, p2))
            vec = jnp.where(lane_mod == lane, val, 0.0)
            cur = out_ref[0, pl.ds(row, 1), :]
            out_ref[0, pl.ds(row, 1), :] = cur + vec
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    n_chunks = N // CHUNK

    @jax.jit
    def scatter(lin, pay):
        """lin: (B, N) int32 in [0, HW); pay: (B, 3, N) f32 -> (B, ROWS, 384)."""
        B = lin.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, 8, 128), lambda b, c: (b, c, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, 1, 8, 128), lambda b, c: (b, 0, c, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, ROWS, 3 * 128), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, ROWS, 3 * 128), jnp.float32),
            interpret=interpret,
        )(lin.reshape(B, n_chunks, 8, 128), pay.reshape(B, 3, n_chunks, 8, 128))

    return scatter


def unpack(out, H, W):
    """(B, ROWS, 384) -> (B, 3, H, W)."""
    B, ROWS, _ = out.shape
    planes = out.reshape(B, ROWS, 3, 128).transpose(0, 2, 1, 3).reshape(B, 3, ROWS * 128)
    return planes.reshape(B, 3, H, W)


def check():
    import jax
    import jax.numpy as jnp

    H, W = 16, 128 * 2
    HW = H * W
    N = HW
    rng = np.random.RandomState(0)
    lin = rng.randint(0, HW, (2, N)).astype(np.int32)
    pay = rng.randn(2, 3, N).astype(np.float32)
    scatter = make_scatter(HW, N, interpret=True)
    got = unpack(np.asarray(scatter(jnp.asarray(lin), jnp.asarray(pay))), H, W)
    want = np.zeros((2, 3, HW), np.float32)
    for b in range(2):
        for c in range(3):
            np.add.at(want[b, c], lin[b], pay[b, c])
    want = want.reshape(2, 3, H, W)
    err = np.abs(got - want).max()
    print(f"interpret-mode max err: {err:.2e}")
    assert err < 1e-4


def tpu():
    import jax
    import jax.numpy as jnp

    H, W = 768, 1344
    HW = H * W
    N = HW
    rng = np.random.RandomState(0)
    lin = jnp.asarray(rng.randint(0, HW, (2, N)).astype(np.int32))
    pay = jnp.asarray(rng.randn(2, 3, N).astype(np.float32))
    scatter = make_scatter(HW, N)

    def timeit(name, fn, args, iters=5):
        @jax.jit
        def step(acc, *a):
            return acc + jnp.sum(fn(*a).astype(jnp.float32))

        acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        acc = step(acc, *args)
        float(acc)
        c = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            acc = step(acc, *args)
        float(acc)
        print(f"{name:32s} {(time.time() - t0) / iters * 1e3:8.2f} ms (compile {c:.1f}s)", flush=True)

    timeit("pallas scatter (2M upd, 3ch)", scatter, (lin, pay))

    def xla_scatter(lin, pay):
        B, _, N = pay.shape
        out = jnp.zeros((B, HW, 3), jnp.float32)
        return out.at[jnp.arange(B)[:, None], lin].add(
            pay.transpose(0, 2, 1), mode="promise_in_bounds")

    timeit("XLA scatter (same)", xla_scatter, (lin, pay))


if __name__ == "__main__":
    if sys.argv[1:] == ["check"]:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        check()
    else:
        tpu()
