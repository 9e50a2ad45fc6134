"""Oracle + gradient tests for the core warp ops (reference: SURVEY.md N1-N3).

The numpy loop oracles in tests/oracles.py transcribe my_lib_kernel.cu
semantics; the vectorized XLA ops must match them elementwise, and autodiff
must match the reference's hand-derived backward structure.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memcnet_tpu.ops import bilinear_warp, filter_interp_warp, flow_project
from oracles import bilinear_warp_oracle, filter_interp_oracle, flow_project_oracle


def make_inputs(rng, B=2, C=3, H=9, W=11, fs=4, flow_scale=3.0):
    image = rng.rand(B, C, H, W).astype(np.float32)
    # flows spanning in-range, out-of-range, and the |f| >= frame/2 gate
    flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 2 * flow_scale
    filt = rng.rand(B, fs * fs, H, W).astype(np.float32)
    return image, flow, filt


class TestFilterInterp:
    def test_matches_oracle(self, rng):
        image, flow, filt = make_inputs(rng)
        got = np.asarray(filter_interp_warp(image, flow, filt))
        want = filter_interp_oracle(image, flow, filt)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_matches_oracle_large_flow(self, rng):
        # exercise the |f| < frame/2 validity gate (cu:1130-1131)
        image, flow, filt = make_inputs(rng, flow_scale=8.0)
        got = np.asarray(filter_interp_warp(image, flow, filt))
        want = filter_interp_oracle(image, flow, filt)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_any_channel_count(self, rng):
        # used with C=64 context features (MEMC_Net_star.py:280-285)
        image, flow, filt = make_inputs(rng, C=64, H=6, W=7)
        got = np.asarray(filter_interp_warp(image, flow, filt))
        want = filter_interp_oracle(image, flow, filt)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_filter_size_2(self, rng):
        image, flow, _ = make_inputs(rng)
        filt = rng.rand(2, 4, 9, 11).astype(np.float32)
        got = np.asarray(filter_interp_warp(image, flow, filt, filter_size=2))
        want = filter_interp_oracle(image, flow, filt, filter_size=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grad_matches_numerical(self, rng):
        # All-valid flow field, off integer boundaries: finite differences only
        # see the quadrant-blend path (the passthrough grad is dropped by
        # design, checked separately below).
        B, C, H, W = 1, 2, 6, 6
        image = rng.rand(B, C, H, W).astype(np.float32)
        filt = rng.rand(B, 16, H, W).astype(np.float32)
        col = np.arange(W)[None, :]
        row = np.arange(H)[:, None]
        fx = np.where(col < W - 1, 0.4, -0.6) + 0 * row
        fy = np.where(row < H - 1, 0.4, -0.6) + 0 * col
        flow = np.stack([fx, fy])[None].astype(np.float32)
        flow = flow + (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 0.02

        def loss(im, fl, ft):
            return jnp.sum(filter_interp_warp(im, fl, ft) ** 2)

        g_im, g_fl, g_ft = jax.grad(loss, argnums=(0, 1, 2))(image, flow, filt)
        eps = 1e-3
        for (g, x, name) in ((g_im, image, "image"), (g_fl, flow, "flow"), (g_ft, filt, "filt")):
            idxs = [tuple(rng.randint(0, s) for s in x.shape) for _ in range(8)]
            for idx in idxs:
                xp = x.copy(); xp[idx] += eps
                xm = x.copy(); xm[idx] -= eps
                args_p = [image, flow, filt]
                args_m = [image, flow, filt]
                pos = {"image": 0, "flow": 1, "filt": 2}[name]
                args_p[pos] = xp
                args_m[pos] = xm
                fd = (loss(*args_p) - loss(*args_m)) / (2 * eps)
                np.testing.assert_allclose(np.asarray(g)[idx], fd, rtol=2e-2, atol=2e-2)

    def test_passthrough_grad_dropped(self):
        # Reference backward has no else-branch: invalid pixels contribute no
        # image gradient (my_lib_kernel.cu:1248-1515).
        B, C, H, W = 1, 1, 4, 4
        image = np.ones((B, C, H, W), np.float32)
        flow = np.full((B, 2, H, W), 100.0, np.float32)  # everything invalid
        filt = np.ones((B, 16, H, W), np.float32)
        g = jax.grad(lambda im: jnp.sum(filter_interp_warp(im, flow, filt)))(image)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestBilinearWarp:
    def test_matches_oracle(self, rng):
        image, flow, _ = make_inputs(rng)
        got = np.asarray(bilinear_warp(image, flow))
        want = bilinear_warp_oracle(image, flow)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_out_of_range_zero(self):
        image = np.ones((1, 3, 4, 4), np.float32)
        flow = np.full((1, 2, 4, 4), 50.0, np.float32)
        out = np.asarray(bilinear_warp(image, flow))
        np.testing.assert_array_equal(out, 0.0)

    def test_grad_matches_numerical(self, rng):
        H = W = 5
        image = rng.rand(1, 2, H, W).astype(np.float32)
        col = np.arange(W)[None, :]
        row = np.arange(H)[:, None]
        fx = np.where(col < W - 1, 0.4, -0.6) + 0 * row
        fy = np.where(row < H - 1, 0.4, -0.6) + 0 * col
        flow = np.stack([fx, fy])[None].astype(np.float32)
        flow = flow + (rng.rand(1, 2, H, W).astype(np.float32) - 0.5) * 0.02

        def loss(im, fl):
            return jnp.sum(bilinear_warp(im, fl) ** 2)

        g_im, g_fl = jax.grad(loss, argnums=(0, 1))(image, flow)
        eps = 1e-3
        for g, x, pos in ((g_im, image, 0), (g_fl, flow, 1)):
            for idx in [tuple(rng.randint(0, s) for s in x.shape) for _ in range(6)]:
                xp = x.copy(); xp[idx] += eps
                xm = x.copy(); xm[idx] -= eps
                args = [image, flow]
                args_p = list(args); args_p[pos] = xp
                args_m = list(args); args_m[pos] = xm
                fd = (loss(*args_p) - loss(*args_m)) / (2 * eps)
                np.testing.assert_allclose(np.asarray(g)[idx], fd, rtol=2e-2, atol=2e-2)


class TestFlowProject:
    def test_matches_oracle(self, rng):
        flow = (rng.rand(2, 2, 9, 11).astype(np.float32) - 0.5) * 6
        got = np.asarray(flow_project(flow))
        want = flow_project_oracle(flow)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("fix_bug", [False, True])
    def test_fillhole_matches_oracle(self, rng, fix_bug):
        flow = (rng.rand(1, 2, 8, 8).astype(np.float32) - 0.5) * 8
        got = np.asarray(flow_project(flow, fillhole=True, fix_down_scan_bug=fix_bug))
        want = flow_project_oracle(flow, fillhole=True, fix_down_scan_bug=fix_bug)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_matches_reference_backward(self, rng):
        # Reference backward: grad_f(p) = -sum_{4 neighbors} g[n] / count[n]
        # (my_lib_kernel.cu:1879-1896). Autodiff must reproduce it.
        flow = (rng.rand(1, 2, 6, 6).astype(np.float32) - 0.5) * 4
        g_out = rng.rand(1, 2, 6, 6).astype(np.float32)

        _, vjp = jax.vjp(lambda f: flow_project(f), flow)
        got = np.asarray(vjp(g_out)[0])

        # oracle backward
        H = W = 6
        cnt = np.zeros((1, H, W), np.float32)
        for h in range(H):
            for w in range(W):
                x2, y2 = w + flow[0, 0, h, w], h + flow[0, 1, h, w]
                if 0 <= x2 <= W - 1 and 0 <= y2 <= H - 1:
                    ixL, iyT = int(x2), int(y2)
                    for iy in (iyT, min(iyT + 1, H - 1)):
                        for ix in (ixL, min(ixL + 1, W - 1)):
                            cnt[0, iy, ix] += 1
        want = np.zeros_like(flow)
        for h in range(H):
            for w in range(W):
                x2, y2 = w + flow[0, 0, h, w], h + flow[0, 1, h, w]
                if 0 <= x2 <= W - 1 and 0 <= y2 <= H - 1:
                    ixL, iyT = int(x2), int(y2)
                    for iy in (iyT, min(iyT + 1, H - 1)):
                        for ix in (ixL, min(ixL + 1, W - 1)):
                            want[0, 0, h, w] += -g_out[0, 0, iy, ix] / cnt[0, iy, ix]
                            want[0, 1, h, w] += -g_out[0, 1, iy, ix] / cnt[0, iy, ix]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestDeterminism:
    def test_flow_project_bit_deterministic(self, rng):
        """TPU-native scatter has a fixed combine order — a strict improvement
        over the reference's atomicAdd FP-order nondeterminism (SURVEY.md
        section 5 'race detection'). Two evaluations must be bit-identical."""
        flow = ((rng.rand(2, 2, 24, 36) - 0.5) * 30).astype(np.float32)
        a = np.asarray(flow_project(flow, fillhole=True))
        b = np.asarray(flow_project(flow, fillhole=True))
        np.testing.assert_array_equal(a, b)

    def test_filter_interp_bit_deterministic(self, rng):
        image = rng.rand(1, 3, 16, 20).astype(np.float32)
        flow = ((rng.rand(1, 2, 16, 20) - 0.5) * 6).astype(np.float32)
        filt = rng.rand(1, 16, 16, 20).astype(np.float32)
        a = np.asarray(filter_interp_warp(image, flow, filt))
        b = np.asarray(filter_interp_warp(image, flow, filt))
        np.testing.assert_array_equal(a, b)
