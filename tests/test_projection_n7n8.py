"""N7 DepthFlowProjection / N8 WeightedFlowProjection: pinned to the
reference's own compiled C (my_lib.c:1637-2160) and to numpy oracles.

Both ops are exported-only capability in the reference (no Python call site,
SURVEY.md N7/N8); the C API is the ground truth for their semantics:
  * N7 scatters depth*-f with a depth-weighted count (my_lib.c:1700-1722) and
    has a hand-derived backward whose depth gradient uses (f - avg), NOT the
    true gradient (my_lib.c:1816-1860) — replicated via custom_vjp.
  * N8 gates on nearest-pixel brightness constancy at p+2f, scatters plain -f
    with a +1 count plus the raw error into a separate weight plane, and
    divides both by the count (my_lib.c:1955-2016).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracles
import ref_c
from memcnet_tpu.ops import depth_flow_project, weighted_flow_project

needs_ref_c = pytest.mark.skipif(
    not ref_c.available(), reason="reference checkout or gcc unavailable")


def _flow(rng, B, H, W, scale):
    return (rng.randn(B, 2, H, W) * scale).astype(np.float32)


class TestDepthFlowProjection:
    @pytest.mark.parametrize("scale", [1.5, 8.0])
    def test_forward_matches_oracle(self, rng, scale):
        B, H, W = 2, 24, 40
        flow = _flow(rng, B, H, W, scale)
        depth = (rng.rand(B, 1, H, W) + 0.5).astype(np.float32)
        want, _ = oracles.depth_flow_project_oracle(flow, depth)
        got = np.asarray(depth_flow_project(jnp.asarray(flow), jnp.asarray(depth)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    @needs_ref_c
    @pytest.mark.parametrize("scale", [1.5, 8.0])
    def test_forward_matches_reference_c(self, rng, scale):
        B, H, W = 1, 48, 80
        flow = _flow(rng, B, H, W, scale)
        depth = (rng.rand(B, 1, H, W) + 0.5).astype(np.float32)
        want, _ = ref_c.depth_flow_project_forward(flow, depth)
        got = np.asarray(depth_flow_project(jnp.asarray(flow), jnp.asarray(depth)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    @needs_ref_c
    def test_backward_matches_reference_c(self, rng):
        """The reference's hand backward (my_lib.c:1751-1877), including its
        not-the-true-gradient depth term (f - avg instead of f + avg)."""
        B, H, W = 1, 24, 40
        flow = _flow(rng, B, H, W, 2.0)
        depth = (rng.rand(B, 1, H, W) + 0.5).astype(np.float32)
        gout = rng.randn(B, 2, H, W).astype(np.float32)

        out, cnt = ref_c.depth_flow_project_forward(flow, depth)
        want_gf, want_gd = ref_c.depth_flow_project_backward(
            flow, depth, cnt, out, gout)

        _, vjp = jax.vjp(
            lambda f, d: depth_flow_project(f, d),
            jnp.asarray(flow), jnp.asarray(depth))
        got_gf, got_gd = vjp(jnp.asarray(gout))
        np.testing.assert_allclose(np.asarray(got_gf), want_gf, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_gd), want_gd, atol=2e-4)

    def test_uniform_depth_reduces_to_flow_project(self, rng):
        """With depth == c the weighting cancels: same result as N2's plain
        projection (scatter -c*f / count c*4 == -f / 4)."""
        from memcnet_tpu.ops import flow_project

        B, H, W = 1, 16, 24
        flow = _flow(rng, B, H, W, 2.0)
        depth = np.full((B, 1, H, W), 3.0, np.float32)
        got = np.asarray(depth_flow_project(jnp.asarray(flow), jnp.asarray(depth)))
        want = np.asarray(flow_project(jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fillhole_fills_holes(self, rng):
        B, H, W = 1, 16, 24
        # every pixel shifts right by 4: columns 0-3 receive nothing (holes),
        # and the projected value everywhere else is -4
        flow = np.zeros((B, 2, H, W), np.float32)
        flow[:, 0] = 4.0
        depth = np.ones((B, 1, H, W), np.float32)
        unfilled = np.asarray(depth_flow_project(
            jnp.asarray(flow), jnp.asarray(depth)))
        filled = np.asarray(depth_flow_project(
            jnp.asarray(flow), jnp.asarray(depth), fillhole=True))
        assert (unfilled[:, 0, :, :4] == 0.0).all()
        assert (filled[:, 0, :, :4] != 0.0).any()


class TestWeightedFlowProjection:
    THR = 0.3

    def _inputs(self, rng, B, H, W, scale):
        flow = _flow(rng, B, H, W, scale)
        frame1 = rng.rand(B, 3, H, W).astype(np.float32)
        # frame2 = jittered frame1 so the photometric gate is mixed on/off
        frame2 = np.clip(
            frame1 + rng.randn(B, 3, H, W).astype(np.float32) * 0.3, 0, 1
        ).astype(np.float32)
        return flow, frame1, frame2

    @pytest.mark.parametrize("scale", [1.5, 8.0])
    def test_forward_matches_oracle(self, rng, scale):
        B, H, W = 2, 24, 40
        flow, frame1, frame2 = self._inputs(rng, B, H, W, scale)
        want, want_w, _ = oracles.weighted_flow_project_oracle(
            flow, frame1, frame2, self.THR)
        got, got_w = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frame1), jnp.asarray(frame2),
            threshold=self.THR)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_w)[:, 0], want_w, atol=2e-5)

    @needs_ref_c
    @pytest.mark.parametrize("scale", [1.5, 8.0])
    def test_forward_matches_reference_c(self, rng, scale):
        B, H, W = 1, 48, 80
        flow, frame1, frame2 = self._inputs(rng, B, H, W, scale)
        want, want_w, _ = ref_c.weighted_flow_project_forward(
            flow, frame1, frame2, self.THR)
        got, got_w = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frame1), jnp.asarray(frame2),
            threshold=self.THR)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_w), want_w, atol=2e-5)

    @needs_ref_c
    def test_backward_matches_reference_c(self, rng):
        """Autodiff of the forward == the reference's hand backward
        (my_lib.c:2030-2160): -sum_n g[n]/count[n] over gated pixels only."""
        B, H, W = 1, 24, 40
        flow, frame1, frame2 = self._inputs(rng, B, H, W, 2.0)
        gout = rng.randn(B, 2, H, W).astype(np.float32)

        _, weight, cnt = ref_c.weighted_flow_project_forward(
            flow, frame1, frame2, self.THR)
        want_gf = ref_c.weighted_flow_project_backward(
            flow, frame1, frame2, cnt, weight, gout, self.THR)

        _, vjp = jax.vjp(
            lambda f: weighted_flow_project(
                f, jnp.asarray(frame1), jnp.asarray(frame2),
                threshold=self.THR)[0],
            jnp.asarray(flow))
        (got_gf,) = vjp(jnp.asarray(gout))
        np.testing.assert_allclose(np.asarray(got_gf), want_gf, atol=2e-4)

    def test_gate_blocks_high_error_flows(self, rng):
        """Where frame2 is uncorrelated noise the error exceeds any small
        threshold and nothing scatters: output and weight stay zero."""
        B, H, W = 1, 16, 24
        flow = _flow(rng, B, H, W, 2.0)
        frame1 = np.zeros((B, 3, H, W), np.float32)
        frame2 = np.ones((B, 3, H, W), np.float32)
        got, got_w = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frame1), jnp.asarray(frame2),
            threshold=0.5)
        assert (np.asarray(got) == 0.0).all()
        assert (np.asarray(got_w) == 0.0).all()

    def test_fillhole_fills_holes(self, rng):
        B, H, W = 1, 16, 24
        flow = np.zeros((B, 2, H, W), np.float32)
        flow[:, 0] = 4.0
        frames = np.full((B, 3, H, W), 0.5, np.float32)
        unfilled, _ = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frames), jnp.asarray(frames),
            threshold=0.5)
        filled, _ = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frames), jnp.asarray(frames),
            threshold=0.5, fillhole=True)
        assert (np.asarray(unfilled)[:, 0, :, :4] == 0.0).all()
        assert (np.asarray(filled)[:, 0, :, :4] != 0.0).any()


class TestPallasScatterPath:
    """N7/N8 through the Pallas banded bucket-scatter (interpret mode) — the
    path TPU hardware takes when shapes qualify."""

    def test_depth_and_weighted_interpret(self, rng):
        from memcnet_tpu.ops import projection as P

        B, H, W = 1, 16, 128  # TH-aligned so the Pallas path qualifies
        flow = _flow(rng, B, H, W, 2.0)
        depth = (rng.rand(B, 1, H, W) + 0.5).astype(np.float32)
        frame1 = rng.rand(B, 3, H, W).astype(np.float32)
        frame2 = np.clip(
            frame1 + rng.randn(B, 3, H, W).astype(np.float32) * 0.3, 0, 1
        ).astype(np.float32)

        want_d = np.asarray(depth_flow_project(
            jnp.asarray(flow), jnp.asarray(depth)))
        want_w, want_wp = weighted_flow_project(
            jnp.asarray(flow), jnp.asarray(frame1), jnp.asarray(frame2),
            threshold=0.3)
        P._FORCE_INTERPRET = True
        try:
            got_d = np.asarray(depth_flow_project(
                jnp.asarray(flow), jnp.asarray(depth)))
            got_w, got_wp = weighted_flow_project(
                jnp.asarray(flow), jnp.asarray(frame1), jnp.asarray(frame2),
                threshold=0.3)
        finally:
            P._FORCE_INTERPRET = False
        np.testing.assert_allclose(got_d, want_d, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_wp), np.asarray(want_wp), atol=1e-5)
