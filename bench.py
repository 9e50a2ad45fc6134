"""Headline benchmark: MEMC_Net_star 720p 2x interpolation, frames/s/chip.

Protocol mirrors demo_HD720p.py / demo_MiddleBury.py geometry: 1280x720
frames, replication-padded to 1344x768 (pad-to-x128 rule,
demo_MiddleBury.py:99-117), batch 1, eval mode (fillhole on).  The model runs
in bfloat16 (the production TPU config; MXU-native) with fp32 parameters cast
at call time; steady-state wall time over repeated iterations.

Prints ONE JSON line:
  {"metric": "720p_interp_frames_per_s_per_chip", "value": fps,
   "unit": "frames/s", "vs_baseline": fps / 10.0}

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
north-star target is >=5x an estimated Titan-X (Pascal) rate of ~2 frames/s
at 720p for MEMC-Net*, i.e. 10 frames/s. vs_baseline >= 1.0 means the target
is met. The estimate is recorded in BASELINE.md pending regenerated reference
numbers.
"""

import json
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (repo-local, gitignored): a serving
    process restart should not pay the full cold compile again.  Cold-compile
    reduction itself is tracked in PERF.md (chunked warp fallback)."""
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"compile cache disabled: {e}", file=sys.stderr)


def _family_rows():
    """One JSON line per non-headline family model (MEMC_Net, MEMC_Net_s at
    the 720p protocol; MEMC_Net_VE at the Vimeo window protocol), so the
    driver-recorded BENCH file carries the whole family, not just the
    headline.  Kept cheap: few iterations, warm persistent cache."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M

    rng = np.random.RandomState(0)
    for name in ("MEMC_Net", "MEMC_Net_s"):
        model = M.get_model(name)
        params = model.init_params(jr.PRNGKey(0))
        params = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
                  for k, v in params.items()}
        x0 = jnp.asarray(rng.rand(1, 3, 768, 1344), jnp.bfloat16)
        x2 = jnp.asarray(rng.rand(1, 3, 768, 1344), jnp.bfloat16)

        @jax.jit
        def step(params, x0, x2, acc):
            (interp, rectified), _o, _f, _occ = model.forward(params, x0, x2)
            return jnp.clip(rectified, 0, 1), acc + jnp.sum(interp.astype(jnp.float32))

        acc = jnp.zeros((), jnp.float32)
        out, a0 = step(params, x0, x2, acc)
        float(a0)
        iters = 5
        best = float("inf")
        for _rep in range(2):
            acc = jnp.zeros((), jnp.float32)
            cur = x0
            t0 = time.time()
            for _ in range(iters):
                cur, acc = step(params, cur, x2, acc)
            final = float(acc)
            best = min(best, (time.time() - t0) / iters)
        assert np.isfinite(final), (name, final)
        print(json.dumps({
            "metric": f"{name}_720p_interp_frames_per_s_per_chip",
            "value": round(1.0 / best, 3), "unit": "frames/s",
            "vs_baseline": round(1.0 / best / 10.0, 3),
        }))

    # VE at its Vimeo protocol geometry
    model = M.get_model("MEMC_Net_VE")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
              for k, v in params.items()}
    frames = [jnp.asarray(rng.rand(1, 3, 256, 512), jnp.bfloat16) for _ in range(7)]

    @jax.jit
    def vestep(params, frames, acc):
        out = model.forward(params, frames)
        return jnp.clip(out, 0, 1), acc + jnp.sum(out.astype(jnp.float32))

    acc = jnp.zeros((), jnp.float32)
    out, a0 = vestep(params, frames, acc)
    float(a0)
    best = float("inf")
    for _rep in range(2):
        acc = jnp.zeros((), jnp.float32)
        f = list(frames)
        t0 = time.time()
        for _ in range(5):
            center, acc = vestep(params, f, acc)
            f = f[:3] + [center] + f[4:]
        final = float(acc)
        best = min(best, (time.time() - t0) / 5)
    assert np.isfinite(final), final
    print(json.dumps({
        "metric": "MEMC_Net_VE_vimeo_windows_per_s_per_chip",
        "value": round(1.0 / best, 3), "unit": "windows/s",
        "vs_baseline": round(1.0 / best / 2.0, 3),
    }))


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M

    _enable_compile_cache()

    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    B = 1
    name = "MEMC_Net_star"
    for i, a in enumerate(sys.argv):
        if a == "--batch":
            B = int(sys.argv[i + 1])
        if a == "--model":
            name = sys.argv[i + 1]

    H, W = 768, 1344  # 720p padded to x128
    model = M.get_model(name)
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v for k, v in params.items()}

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(B, 3, H, W), dtype)
    x2 = jnp.asarray(rng.rand(B, 3, H, W), dtype)

    # The axon tunnel executes lazily (block_until_ready returns before the
    # device finishes), so the step chains its output into the next input AND
    # accumulates a checksum scalar; fetching the final checksum forces the
    # whole chain by data dependency.  Per-frame time = total / iters.
    @jax.jit
    def step(params, x0, x2, acc):
        (interp, rectified), _o, _f, _occ = model.forward(params, x0, x2)
        # clip keeps the chained input in-distribution over many iterations
        return jnp.clip(rectified, 0, 1), acc + jnp.sum(interp.astype(jnp.float32))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    out, a0 = step(params, x0, x2, acc)
    a0 = float(a0)
    print(f"compile+first run: {time.time() - t0:.1f}s, dtype={out.dtype}", file=sys.stderr)

    trace_dir = None
    for i, a in enumerate(sys.argv):
        if a == "--trace-dir":
            trace_dir = sys.argv[i + 1]

    from memcnet_tpu.utils.tracing import device_trace

    iters = 10
    best = float("inf")
    with device_trace(trace_dir):
        for _rep in range(3):
            acc = jnp.zeros((), jnp.float32)
            cur = x0
            t0 = time.time()
            for _ in range(iters):
                cur, acc = step(params, cur, x2, acc)
            final = float(acc)  # forces execution of the full chain
            best = min(best, (time.time() - t0) / iters)
    assert np.isfinite(final), final
    dt = best / B  # per frame
    fps = 1.0 / dt
    print(f"per-frame: {dt * 1e3:.1f} ms (checksum {final:.3e})", file=sys.stderr)

    # family rows first (default on; the headline JSON line stays LAST so
    # existing parsers keep working); --no-family to skip
    if name == "MEMC_Net_star" and B == 1 and dtype == jnp.bfloat16 \
            and "--no-family" not in sys.argv:
        try:
            _family_rows()
        except Exception as e:  # family rows are additive, never a failure
            print(f"family rows skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "720p_interp_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


def main_ve():
    """Secondary benchmark: MEMC_Net_VE 7-frame enhancement windows/s
    (Vimeo protocol geometry: 256x448 padded to 256x512, batch 1)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from memcnet_tpu import models as M

    dtype = jnp.bfloat16 if "--fp32" not in sys.argv else jnp.float32
    H, W = 256, 512
    model = M.get_model("MEMC_Net_VE")
    params = model.init_params(jr.PRNGKey(0))
    params = {k: v.astype(dtype) if v.dtype == jnp.float32 else v for k, v in params.items()}
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(1, 3, H, W), dtype) for _ in range(7)]

    @jax.jit
    def step(params, frames, acc):
        out = model.forward(params, frames)
        return jnp.clip(out, 0, 1), acc + jnp.sum(out.astype(jnp.float32))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    out, a0 = step(params, frames, acc)
    float(a0)
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 10
    best = float("inf")
    for _rep in range(3):
        acc = jnp.zeros((), jnp.float32)
        f = list(frames)
        t0 = time.time()
        for _ in range(iters):
            center, acc = step(params, f, acc)
            f = f[:3] + [center] + f[4:]
        final = float(acc)
        best = min(best, (time.time() - t0) / iters)
    assert np.isfinite(final), final
    wps = 1.0 / best
    print(f"per-window: {best * 1e3:.1f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": "vimeo_ve_windows_per_s_per_chip",
        "value": round(wps, 3),
        "unit": "windows/s",
        "vs_baseline": round(wps / 2.0, 3),  # ~0.5 s/window Titan-X estimate
    }))


if __name__ == "__main__":
    if "--ve" in sys.argv:
        main_ve()
    else:
        main()
