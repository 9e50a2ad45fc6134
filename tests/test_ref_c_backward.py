"""Backward parity: autodiff of our ops vs the REFERENCE'S own hand-derived
CPU backward kernels (my_lib.c, compiled in place — tests/ref_c.py).

Round-1/2 tests only asserted grad finiteness for N5/N9-N11; these pin the
actual values to the reference arithmetic (VERDICT r2 task #9), including N1
whose backward is the training-critical one (my_lib.c:1082, the CPU mirror of
my_lib_kernel.cu:1220-1518).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_c
from memcnet_tpu.ops import filter_interp_warp, separable_conv
from memcnet_tpu.ops.mc import occlusion_weight, pixel_value, pixel_weight, reliable_weight

pytestmark = pytest.mark.skipif(
    not ref_c.available(), reason="reference checkout or gcc unavailable")


def _vjp_grads(fn, args, gout):
    _, vjp = jax.vjp(fn, *args)
    return tuple(np.asarray(g) for g in vjp(jnp.asarray(gout)))


class TestFilterInterpBackward:
    def test_grads_match_reference_c(self, rng):
        B, C, H, W = 1, 3, 20, 24
        image = rng.rand(B, C, H, W).astype(np.float32)
        flow = (rng.randn(B, 2, H, W) * 2).astype(np.float32)
        filt = rng.rand(B, 16, H, W).astype(np.float32)
        gout = rng.randn(B, C, H, W).astype(np.float32)
        want = ref_c.filter_interp_backward(image, flow, filt, gout)
        got = _vjp_grads(
            lambda a, b, c: filter_interp_warp(a, b, c),
            (jnp.asarray(image), jnp.asarray(flow), jnp.asarray(filt)), gout)
        for g, w, name in zip(got, want, ("image", "flow", "filt")):
            np.testing.assert_allclose(g, w, atol=3e-5, err_msg=name)


class TestSeparableConvBackward:
    def test_grads_match_reference_c(self, rng):
        B, C, H, W, fs = 1, 3, 14, 18, 4
        image = rng.rand(B, C, H, W).astype(np.float32)
        vert = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        horiz = rng.rand(B, fs, H - fs + 1, W - fs + 1).astype(np.float32)
        gout = rng.randn(B, C, H - fs + 1, W - fs + 1).astype(np.float32)
        want = ref_c.separable_conv_backward(image, vert, horiz, gout)
        got = _vjp_grads(
            lambda a, b, c: separable_conv(a, b, c),
            (jnp.asarray(image), jnp.asarray(vert), jnp.asarray(horiz)), gout)
        for g, w, name in zip(got, want, ("image", "vert", "horiz")):
            np.testing.assert_allclose(g, w, atol=3e-5, err_msg=name)


class TestWeightLayerBackward:
    def test_forward_matches_reference_c(self, rng):
        B, C, H, W = 1, 3, 16, 20
        f1 = rng.rand(B, C, H, W).astype(np.float32)
        f2 = rng.rand(B, C, H, W).astype(np.float32)
        flow = (rng.randn(B, 2, H, W) * 2).astype(np.float32)
        want = ref_c.weight_layer_forward(f1, f2, flow, 0.02)
        got = np.asarray(occlusion_weight(
            jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow), lambda_e=0.02))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_grads_match_reference_c(self, rng):
        B, C, H, W = 1, 3, 16, 20
        f1 = rng.rand(B, C, H, W).astype(np.float32)
        f2 = rng.rand(B, C, H, W).astype(np.float32)
        flow = (rng.randn(B, 2, H, W) * 2).astype(np.float32)
        out = ref_c.weight_layer_forward(f1, f2, flow, 0.02)
        gout = rng.randn(*out.shape).astype(np.float32)
        want = ref_c.weight_layer_backward(f1, f2, flow, out, gout, 0.02)
        got = _vjp_grads(
            lambda a, b, c: occlusion_weight(a, b, c, lambda_e=0.02),
            (jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(flow)), gout)
        for g, w, name in zip(got, want, ("frame1", "frame2", "flow")):
            np.testing.assert_allclose(g, w, atol=1e-3, err_msg=name)


class TestSplatBackwards:
    def _inputs(self, rng, B=1, C=3, H=16, W=20):
        values = rng.rand(B, C, H, W).astype(np.float32)
        flow = (rng.randn(B, 2, H, W) * 2).astype(np.float32)
        fw = rng.rand(B, 1, H, W).astype(np.float32)
        return values, flow, fw

    def test_pixel_value_grads_match(self, rng):
        values, flow, fw = self._inputs(rng)
        gout = rng.randn(*values.shape).astype(np.float32)
        want = ref_c.pixel_value_backward(values, flow, fw, gout, 1.0)
        got = _vjp_grads(
            lambda v, f, w: pixel_value(v, f, w, sigma_d=1.0),
            (jnp.asarray(values), jnp.asarray(flow), jnp.asarray(fw)), gout)
        for g, w_, name in zip(got, want, ("values", "flow", "flow_weights")):
            np.testing.assert_allclose(g, w_, atol=3e-4, err_msg=name)

    def test_pixel_weight_grads_match(self, rng):
        _, flow, fw = self._inputs(rng)
        out = np.asarray(pixel_weight(jnp.asarray(flow), jnp.asarray(fw), sigma_d=1.0))
        gout = rng.randn(*out.shape).astype(np.float32)
        want = ref_c.pixel_weight_backward(flow, fw, out, gout, 1.0)
        got = _vjp_grads(
            lambda f, w: pixel_weight(f, w, sigma_d=1.0),
            (jnp.asarray(flow), jnp.asarray(fw)), gout)
        for g, w_, name in zip(got, want, ("flow", "flow_weights")):
            np.testing.assert_allclose(g, w_, atol=3e-4, err_msg=name)

    def test_reliable_weight_grads_match(self, rng):
        _, flow, _ = self._inputs(rng)
        out = np.asarray(reliable_weight(jnp.asarray(flow), sigma_d=1.0))
        gout = rng.randn(*out.shape).astype(np.float32)
        want = ref_c.reliable_weight_backward(flow, out, gout, 1.0)
        (got,) = _vjp_grads(
            lambda f: reliable_weight(f, sigma_d=1.0), (jnp.asarray(flow),), gout)
        np.testing.assert_allclose(got, want, atol=3e-4)
