"""Small-C direct-conv Pallas kernel (ops/pallas/conv_kernel.py) — interpret
mode (CI runs on CPU).  The kernel packs kh row-taps into the matmul K dim
and kw column-taps into the M dim, then combines with f32 lane-rolls; it must
match PyTorch Conv2d semantics (stride 1, 'same' zero padding) exactly in f32
and keep XLA-exact gradients through the custom_vjp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memcnet_tpu.ops.pallas import conv_kernel as CK


@pytest.mark.parametrize("C,O,k,H,W", [
    (3, 32, 7, 24, 40),
    (8, 32, 7, 16, 132),
    (32, 64, 7, 16, 40),
    (64, 32, 7, 11, 40),
    (16, 2, 7, 16, 40),
    (6, 32, 3, 24, 40),
    (64, 64, 3, 16, 140),
])
def test_matches_xla_conv(rng, C, O, k, H, W):
    x = jnp.asarray(rng.randn(2, C, H, W).astype(np.float32))
    w = jnp.asarray((rng.randn(O, C, k, k) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32))
    want = CK._xla_conv(x, w, b, relu=True)
    got = CK.conv2d_small(x, w, b, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_are_xla_exact(rng):
    C, O, k, H, W = 8, 16, 7, 16, 40
    x = jnp.asarray(rng.randn(1, C, H, W).astype(np.float32))
    w = jnp.asarray((rng.randn(O, C, k, k) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(O).astype(np.float32))
    op = CK._fast_conv_op(True, True)
    # linear loss with a fixed cotangent: the custom_vjp backward must then
    # equal the XLA conv's VJP bit-for-bit (no primal-noise amplification)
    ct = jnp.asarray(rng.randn(1, O, H, W).astype(np.float32))

    def loss_fast(a, c, d):
        return jnp.sum(op(a, c, d) * ct)

    def loss_xla(a, c, d):
        return jnp.sum(CK._xla_conv(a, c, d, True) * ct)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, w, b)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_fast, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-6)


def test_spynet_forward_matches_xla_path(rng):
    """SPyNet with the Pallas conv stack (interpret) == the pure-XLA path."""
    import jax.random as jr

    from memcnet_tpu.models import spynet

    params = spynet.init_params(jr.PRNGKey(0))
    first = jnp.asarray(rng.rand(1, 3, 96, 128).astype(np.float32))
    second = jnp.asarray(rng.rand(1, 3, 96, 128).astype(np.float32))
    want = spynet.forward(params, first, second)
    CK._FORCE_INTERPRET = True
    try:
        got = spynet.forward(params, first, second)
    finally:
        CK._FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mononet_walkers_match_xla_path(rng, monkeypatch):
    """The MonoNet dual/single walks with the Pallas conv dispatch
    (interpret, opt-in env — see mononet._conv_maybe_fast's measured-negative
    note) == the pure-XLA walks; ReLU lookahead fusion preserved."""
    import jax.random as jr

    monkeypatch.setenv("MEMCNET_MONONET_PALLAS", "1")

    from memcnet_tpu.models import mononet as MN

    specs = MN.mononet5_specs(3, "thin", with_bn=False)
    params = MN.init_specs(jr.PRNGKey(0), specs, "t")
    params.update(MN.init_specs(jr.PRNGKey(1), specs, "u"))
    x = jnp.asarray(rng.rand(1, 6, 128, 128).astype(np.float32))

    want = MN.forward_single_path(params, "t", specs, x)
    want_a, want_b = MN.forward_dual_path(params, "t", "u", specs, x)
    CK._FORCE_INTERPRET = True
    try:
        got = MN.forward_single_path(params, "t", specs, x)
        got_a, got_b = MN.forward_dual_path(params, "t", "u", specs, x)
    finally:
        CK._FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)
