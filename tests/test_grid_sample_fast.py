"""Pallas grid_sample fast path (nn/layers.py::_grid_sample_fast) vs the XLA
formulation: the zero-ring reduction must reproduce torch grid_sample's
per-tap zeroing exactly, for in-range, border-straddling, and wildly
out-of-range grids, in interpret mode on CPU; gradients route through the XLA
path via custom_vjp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memcnet_tpu.nn import layers as L


@pytest.fixture
def gs_interpret():
    L._GS_INTERPRET = True
    yield
    L._GS_INTERPRET = False


def _grid(rng, B, H, W, scale):
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    base = np.stack([gx, gy], -1)[None].repeat(B, 0)
    fl = rng.randn(B, H, W, 2) * scale
    fl[..., 0] /= (W - 1) / 2
    fl[..., 1] /= (H - 1) / 2
    return jnp.asarray((base + fl).astype(np.float32))


@pytest.mark.parametrize("scale", [0.0, 2.0, 8.0, 60.0])
def test_fast_matches_xla(rng, gs_interpret, scale):
    B, C, H, W = 2, 3, 24, 40
    x = jnp.asarray(rng.rand(B, C, H, W).astype(np.float32))
    g = _grid(rng, B, H, W, scale)
    ref = L._grid_sample_xla(x, g)
    got = L._grid_sample_fast(x, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_public_op_grads_route_through_xla(rng, gs_interpret):
    B, C, H, W = 1, 3, 16, 24
    x = jnp.asarray(rng.rand(B, C, H, W).astype(np.float32))
    g = _grid(rng, B, H, W, 2.0)
    ga = jax.grad(lambda x, g: jnp.sum(L.grid_sample_bilinear(x, g) ** 2),
                  argnums=(0, 1))(x, g)
    gb = jax.grad(lambda x, g: jnp.sum(L._grid_sample_xla(x, g) ** 2),
                  argnums=(0, 1))(x, g)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mismatched_grid_uses_xla(rng):
    # non-same-size grids (not the SPyNet shape) stay on the XLA path
    B, C, H, W = 1, 3, 16, 24
    x = jnp.asarray(rng.rand(B, C, H, W).astype(np.float32))
    g = _grid(rng, B, 8, 12, 1.0)
    out = L.grid_sample_bilinear(x, g)
    assert out.shape == (B, C, 8, 12)
