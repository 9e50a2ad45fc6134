"""Pallas warp-kernel tests (interpret mode — CI runs on the CPU platform).

The kernel (memcnet_tpu/ops/pallas/warp_kernel.py) must reproduce the
reference semantics (my_lib_kernel.cu:1087-1218) exactly: it is checked both
against the XLA formulation and against the numpy loop oracle, across the
flow regimes that exercise its window planning (smooth, uniform-large,
invalid/passthrough, over-budget fallback, ragged tile edges).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memcnet_tpu.ops import warp as W
from memcnet_tpu.ops.pallas import warp_kernel as wk
from oracles import filter_interp_oracle


def _check(rng, B, C, H, Wd, flow, fs=4, atol=2e-5):
    image = rng.rand(B, C, H, Wd).astype(np.float32)
    filt = rng.rand(B, fs * fs, H, Wd).astype(np.float32)
    flow = flow.astype(np.float32)
    got = np.asarray(W._fast_forward(image, flow, filt, fs, interpret=True))
    want = filter_interp_oracle(image, flow, filt, filter_size=fs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)


class TestPallasWarpKernel:
    def test_zero_flow_identity_regimes(self, rng):
        _check(rng, 1, 3, 16, 144, np.zeros((1, 2, 16, 144)))

    def test_smooth_flow(self, rng):
        H, Wd = 24, 136
        ys, xs = np.meshgrid(np.arange(H), np.arange(Wd), indexing="ij")
        fx = 5 * np.sin(2 * np.pi * ys / H)
        fy = 4 * np.cos(2 * np.pi * xs / Wd)
        _check(rng, 2, 3, H, Wd, np.broadcast_to(np.stack([fx, fy])[None], (2, 2, H, Wd)))

    def test_uniform_large_flow(self, rng):
        # Large uniform offsets cost nothing: only the per-tile SPREAD must
        # fit the window budget.
        _check(rng, 1, 5, 32, 256, np.full((1, 2, 32, 256), 17.3))

    def test_out_of_range_passthrough(self, rng):
        _check(rng, 1, 3, 16, 128, np.full((1, 2, 16, 128), 500.0))

    def test_over_budget_falls_back_exactly(self, rng):
        # randn*40 blows every tile budget -> whole-frame XLA fallback
        flow = rng.randn(1, 2, 64, 128) * 40.0
        _check(rng, 1, 3, 64, 128, flow)

    def test_mixed_validity_tile(self, rng):
        # a tile mixing valid smooth pixels with invalid ones must not blow
        # the budget (invalid pixels are excluded from the window planning)
        flow = np.ones((1, 2, 16, 128), np.float32) * 2.0
        flow[0, :, :4, :16] = 999.0  # invalid corner
        _check(rng, 1, 3, 16, 128, flow)

    def test_filter_size_2(self, rng):
        _check(rng, 1, 3, 16, 128, rng.randn(1, 2, 16, 128) * 2.0, fs=2)

    def test_ragged_tiles_and_channels(self, rng):
        # H, W not multiples of the (8, 128) tile; C=67 (the fused
        # image+context warp of MEMC_Net_star)
        _check(rng, 1, 67, 13, 150, rng.randn(1, 2, 13, 150) * 1.5)

    def test_batched(self, rng):
        _check(rng, 3, 4, 16, 128, rng.randn(3, 2, 16, 128) * 2.0)

    def test_budgets_match_window(self):
        by, bx = wk.kernel_budgets(4)
        # row slab must fit: spread + TH + fs - 1 <= SH
        assert by + wk.TH + 4 - 1 <= wk.SH
        # aligned column slab must fit: 8*floor((spread+7)/8) + TW + 16 <= SW
        assert 8 * ((bx + 7) // 8) + wk.TW + 16 <= wk.SW


class TestFastOpGradients:
    """The custom_vjp routes differentiation through the XLA formulation —
    grads of the fast op must equal grads of the XLA op exactly."""

    def test_grads_equal_xla(self, rng):
        B, C, H, Wd = 1, 2, 8, 16
        image = rng.rand(B, C, H, Wd).astype(np.float32)
        flow = (rng.rand(B, 2, H, Wd).astype(np.float32) - 0.5) * 3
        filt = rng.rand(B, 16, H, Wd).astype(np.float32)
        op = W._fast_op(4, interpret=True)

        def loss_fast(a, b, c):
            return jnp.sum(op(a, b, c) ** 2)

        def loss_xla(a, b, c):
            return jnp.sum(W._xla_forward(a, b, c, 4) ** 2)

        g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(image, flow, filt)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(image, flow, filt)
        for a, b in zip(g_fast, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_dispatch_is_xla_on_cpu(self):
        # CI runs on the CPU platform: the public op must not route to Pallas
        assert not W._use_pallas()


class TestChunkedFallback:
    """The in-graph XLA fallback branch runs row-chunked (lax.map) so its
    patch intermediates never dominate the lax.cond memory plan — values must
    equal the whole-frame formulation exactly."""

    def test_chunked_equals_whole(self, rng, monkeypatch):
        B, C, H, Wd = 2, 5, 24, 40
        image = jnp.asarray(rng.rand(B, C, H, Wd).astype(np.float32))
        flow = jnp.asarray((rng.randn(B, 2, H, Wd) * 3).astype(np.float32))
        filt = jnp.asarray(rng.rand(B, 16, H, Wd).astype(np.float32))
        ref = W._xla_forward(image, flow, filt, 4)
        monkeypatch.setattr(W, "_row_chunk_for", lambda *a, **k: 4)
        got = W._xla_forward_chunked(image, flow, filt, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)

    def test_row_chunk_bounds_memory(self):
        for B in (1, 4):
            rows = W._row_chunk_for(768, 1344, 67, 4, B)
            assert 768 % rows == 0
            assert B * rows * 1344 * 16 * 67 * 4 <= 256 * 1024 * 1024
        # more batch -> smaller bands
        assert W._row_chunk_for(768, 1344, 67, 4, 4) <= W._row_chunk_for(768, 1344, 67, 4, 1)


class TestTrainingForwardRunsPallas:
    """r5: custom_vjp fwd returns the Pallas fast forward (raw-input
    residuals), so training pays the kernel price, not the ~95 ms/warp XLA
    gather path.  Value parity: a differentiated step's primal on the Pallas
    path must match the XLA formulation (f32, interpret mode), and gradients
    stay the XLA-exact VJP."""

    def test_vjp_primal_matches_xla_and_grads_unchanged(self, rng):
        B, C, H, Wd = 1, 3, 16, 128
        image = rng.rand(B, C, H, Wd).astype(np.float32)
        flow = (rng.rand(B, 2, H, Wd).astype(np.float32) - 0.5) * 3
        filt = rng.rand(B, 16, H, Wd).astype(np.float32)
        op = W._fast_op(4, interpret=True)

        primal, vjp = jax.vjp(op, image, flow, filt)
        want = W._xla_forward(image, flow, filt, 4)
        np.testing.assert_allclose(
            np.asarray(primal), np.asarray(want), rtol=1e-6, atol=1e-6)

        g = rng.rand(B, C, H, Wd).astype(np.float32)
        _, vjp_xla = jax.vjp(lambda a, b, c: W._xla_forward(a, b, c, 4),
                             image, flow, filt)
        for a, b in zip(vjp(jnp.asarray(g)), vjp_xla(jnp.asarray(g))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_train_step_loss_matches_xla_forward(self, rng):
        """A full MEMC_Net_star train-residual loss on the Pallas-forward
        path equals the XLA-forward loss (CPU interpret mode, f32)."""
        from memcnet_tpu import models as M
        import memcnet_tpu.ops.projection as P
        import jax.random as jr

        model = M.get_model("MEMC_Net_star")
        params = model.init_params(jr.PRNGKey(0))
        x0 = jnp.asarray(rng.rand(1, 3, 64, 128).astype(np.float32))
        x1 = jnp.asarray(rng.rand(1, 3, 64, 128).astype(np.float32))
        x2 = jnp.asarray(rng.rand(1, 3, 64, 128).astype(np.float32))

        def loss(p):
            residuals, *_ = model.train_residuals(p, x0, x1, x2)
            return sum(jnp.mean(jnp.abs(r)) for r in residuals)

        l_xla, g_xla = jax.value_and_grad(loss)(params)
        W._FORCE_INTERPRET = True
        P._FORCE_INTERPRET = True
        try:
            l_pk, g_pk = jax.value_and_grad(loss)(params)
        finally:
            W._FORCE_INTERPRET = False
            P._FORCE_INTERPRET = False
        np.testing.assert_allclose(float(l_pk), float(l_xla),
                                   rtol=1e-5, atol=1e-6)
        # grads differ only through the primal's f32 summation-order noise
        # feeding downstream activations (the VJP itself is the same XLA VJP)
        for k in g_xla:
            np.testing.assert_allclose(
                np.asarray(g_pk[k]), np.asarray(g_xla[k]),
                rtol=2e-3, atol=2e-4, err_msg=k)


class TestSplitWarp:
    """filter_interp_warp_split: N channel-split sources through one kernel
    pass == the concat single-op semantics, values and gradients."""

    def test_split_matches_concat(self, rng):
        B, H, Wd = 1, 16, 128
        img = rng.rand(B, 3, H, Wd).astype(np.float32)
        ctx = rng.rand(B, 5, H, Wd).astype(np.float32)
        flow = (rng.rand(B, 2, H, Wd).astype(np.float32) - 0.5) * 3
        filt = rng.rand(B, 16, H, Wd).astype(np.float32)

        want = W._xla_forward(np.concatenate([img, ctx], 1), flow, filt, 4)
        W._FORCE_INTERPRET = True
        try:
            got_i, got_c = W.filter_interp_warp_split(
                (jnp.asarray(img), jnp.asarray(ctx)), jnp.asarray(flow),
                jnp.asarray(filt))
        finally:
            W._FORCE_INTERPRET = False
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want[:, :3]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want[:, 3:]),
                                   rtol=1e-6, atol=1e-6)

    def test_split_grads_match_concat(self, rng):
        B, H, Wd = 1, 8, 128
        img = jnp.asarray(rng.rand(B, 3, H, Wd).astype(np.float32))
        ctx = jnp.asarray(rng.rand(B, 2, H, Wd).astype(np.float32))
        flow = jnp.asarray((rng.rand(B, 2, H, Wd).astype(np.float32) - 0.5) * 3)
        filt = jnp.asarray(rng.rand(B, 16, H, Wd).astype(np.float32))
        ct = (jnp.asarray(rng.randn(B, 3, H, Wd).astype(np.float32)),
              jnp.asarray(rng.randn(B, 2, H, Wd).astype(np.float32)))

        op = W._fast_multi_op(2, 4, True)

        def loss_split(a, b, f, k):
            o1, o2 = op(a, b, f, k)
            return jnp.sum(o1 * ct[0]) + jnp.sum(o2 * ct[1])

        def loss_cat(a, b, f, k):
            out = W._xla_forward(jnp.concatenate([a, b], 1), f, k, 4)
            return jnp.sum(out[:, :3] * ct[0]) + jnp.sum(out[:, 3:] * ct[1])

        g1 = jax.grad(loss_split, argnums=(0, 1, 2, 3))(img, ctx, flow, filt)
        g2 = jax.grad(loss_cat, argnums=(0, 1, 2, 3))(img, ctx, flow, filt)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
