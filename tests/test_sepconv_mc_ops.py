"""Oracle + gradient tests for the SepConv (N5/N6) and MC (N9-N11) op families.

These ops are exported capability in the reference with no live model call
site (SURVEY.md section 2.1); the numpy oracles transcribe the CUDA kernel
semantics and the XLA ops must match elementwise.
"""

import numpy as np
import jax
import jax.numpy as jnp

from memcnet_tpu.ops import (
    occlusion_weight,
    pixel_splat,
    pixel_value,
    pixel_weight,
    reliable_weight,
    separable_conv,
    separable_conv_flow,
)
from oracles import (
    occlusion_weight_oracle,
    pixel_splat_oracle,
    reliable_weight_oracle,
    separable_conv_oracle,
    separable_conv_flow_oracle,
)


class TestSeparableConv:
    def test_matches_oracle(self, rng):
        B, C, H, W, fs = 2, 3, 10, 12, 4
        image = rng.rand(B, C, H, W).astype(np.float32)
        vert = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        horiz = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        got = np.asarray(separable_conv(image, vert, horiz))
        want = separable_conv_oracle(image, vert, horiz)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_finite(self, rng):
        B, C, H, W, fs = 1, 2, 7, 8, 3
        image = rng.rand(B, C, H, W).astype(np.float32)
        vert = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        horiz = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        g = jax.grad(lambda *a: jnp.sum(separable_conv(*a) ** 2), argnums=(0, 1, 2))(
            image, vert, horiz
        )
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi)))

    def test_flow_matches_oracle(self, rng):
        B, fs, oH, oW = 2, 5, 6, 7
        vert = rng.rand(B, fs, oH, oW).astype(np.float32)
        horiz = rng.rand(B, fs, oH, oW).astype(np.float32)
        # inject exact-zero kernel columns to hit the -2000 sentinel
        vert[0, :, 2, 3] = 0.0
        horiz[1, :, 4, 1] = 0.0
        got = np.asarray(separable_conv_flow(vert, horiz))
        want = separable_conv_flow_oracle(vert, horiz)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert got[0, 1, 2, 3] == -2000.0
        assert got[1, 0, 4, 1] == -2000.0


def mc_inputs(rng, B=2, C=3, H=9, W=11, flow_scale=3.0):
    f1 = rng.rand(B, C, H, W).astype(np.float32)
    f2 = rng.rand(B, C, H, W).astype(np.float32)
    flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 2 * flow_scale
    fw = rng.rand(B, 1, H, W).astype(np.float32)
    return f1, f2, flow, fw


class TestOcclusionWeight:
    def test_matches_oracle(self, rng):
        f1, f2, flow, _ = mc_inputs(rng)
        got = np.asarray(occlusion_weight(f1, f2, flow))
        want = occlusion_weight_oracle(f1, f2, flow)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_out_of_range_is_1e4(self, rng):
        f1, f2, _, _ = mc_inputs(rng)
        flow = np.full((2, 2, 9, 11), 100.0, np.float32)
        got = np.asarray(occlusion_weight(f1, f2, flow))
        np.testing.assert_allclose(got, 1e-4)

    def test_grads_finite(self, rng):
        f1, f2, flow, _ = mc_inputs(rng, B=1, H=6, W=6, flow_scale=1.5)
        g = jax.grad(
            lambda *a: jnp.sum(occlusion_weight(*a) ** 2), argnums=(0, 1, 2)
        )(f1, f2, flow)
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi)))


class TestPixelSplat:
    def test_matches_oracle(self, rng):
        vals, _, flow, fw = mc_inputs(rng)
        got_v, got_w = pixel_splat(vals, flow, fw)
        want_v, want_w = pixel_splat_oracle(vals, flow, fw)
        np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), want_w, rtol=1e-4, atol=1e-5)

    def test_separate_wrappers_agree(self, rng):
        vals, _, flow, fw = mc_inputs(rng)
        v, w = pixel_splat(vals, flow, fw)
        np.testing.assert_allclose(
            np.asarray(pixel_value(vals, flow, fw)), np.asarray(v), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pixel_weight(flow, fw)), np.asarray(w), rtol=1e-6
        )

    def test_grads_finite(self, rng):
        vals, _, flow, fw = mc_inputs(rng, B=1, H=6, W=6, flow_scale=1.5)

        def loss(vals, flow, fw):
            v, w = pixel_splat(vals, flow, fw)
            return jnp.sum(v**2) + jnp.sum(w**2)

        g = jax.grad(loss, argnums=(0, 1, 2))(vals, flow, fw)
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi)))


class TestReliableWeight:
    def test_matches_oracle(self, rng):
        _, _, flow, _ = mc_inputs(rng)
        got = np.asarray(reliable_weight(flow))
        want = reliable_weight_oracle(flow)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
