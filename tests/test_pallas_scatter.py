"""Pallas banded bucket-scatter kernel (ops/pallas/scatter_kernel.py) vs the
numpy scatter-add oracle, in interpret mode on CPU, plus the integrated
projection fast path (values AND gradients vs the XLA formulation).

The kernel's semantics target: the base scatter of
my_lib_kernel.cu:1630-1694 — each valid source pixel adds its payload into
its integer base landing cell (the 3 shifted neighbors are applied outside
the kernel, projection._shift_fold_last).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memcnet_tpu.ops import projection as P
from memcnet_tpu.ops.pallas import scatter_kernel as sk


def _mk_case(rng, B, H, W, fy_scale, fx_scale, valid_frac=1.0, uniform=None):
    if uniform is not None:
        fy = np.full((B, H, W), uniform[0], np.float32)
        fx = np.full((B, H, W), uniform[1], np.float32)
    else:
        fy = (rng.randn(B, H, W) * fy_scale).astype(np.float32)
        fx = (rng.randn(B, H, W) * fx_scale).astype(np.float32)
    ys = np.arange(H)[None, :, None]
    xs = np.arange(W)[None, None, :]
    x2, y2 = xs + fx, ys + fy
    valid = (x2 >= 0) & (y2 >= 0) & (x2 <= W - 1) & (y2 <= H - 1)
    if valid_frac < 1.0:
        valid &= rng.rand(B, H, W) < valid_frac
    ixL = np.clip(x2.astype(np.int32), 0, W - 1)
    iyT = np.clip(y2.astype(np.int32), 0, H - 1)
    dy = (iyT - ys).astype(np.int32)
    dx = (ixL - xs).astype(np.int32)
    payload = rng.randn(B, 3, H, W).astype(np.float32)
    payload = np.where(valid[:, None], payload, 0.0)
    return payload, dy, dx, valid, iyT, ixL


def _oracle(payload, iyT, ixL, H, W):
    B, Pn = payload.shape[:2]
    want = np.zeros((B, Pn, H * W), np.float32)
    lin = (iyT * W + ixL).reshape(B, -1)
    for b in range(B):
        for p in range(Pn):
            np.add.at(want[b, p], lin[b], payload[b, p].reshape(-1))
    return want.reshape(B, Pn, payload.shape[2], payload.shape[3])


CASES = [
    ("smooth", dict(fy_scale=1.5, fx_scale=1.5), True),
    ("uniform_large", dict(fy_scale=0, fx_scale=0, uniform=(7.3, -41.2)), True),
    ("holes", dict(fy_scale=2.0, fx_scale=2.0, valid_frac=0.6), True),
    ("zero_flow", dict(fy_scale=0, fx_scale=0, uniform=(0.0, 0.0)), True),
    # spatially-incoherent big flows blow the per-band budgets -> must
    # still be exact through the in-graph XLA fallback
    ("over_budget_x", dict(fy_scale=2.0, fx_scale=25.0), False),
    ("over_budget_y", dict(fy_scale=12.0, fx_scale=1.0), False),
]


@pytest.mark.parametrize("name,kw,expect_ok", CASES, ids=[c[0] for c in CASES])
def test_scatter_bands_vs_oracle(rng, name, kw, expect_ok):
    B, H, W = 2, 32, 200
    payload, dy, dx, valid, iyT, ixL = _mk_case(rng, B, H, W, **kw)
    plan = sk.plan_bands(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(valid))
    assert bool(plan["ok"]) == expect_ok, name
    if expect_ok:
        got = np.asarray(sk.scatter_bands(jnp.asarray(payload), plan, interpret=True))
        want = _oracle(payload, iyT, ixL, H, W)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_scatter_bands_ragged_width(rng):
    """W=200 is not a lane multiple: the lane-pad + roll wrap must stay exact
    at the right frame border (landing exactly on W-1)."""
    B, H, W = 1, 16, 200
    payload, dy, dx, valid, iyT, ixL = _mk_case(
        rng, B, H, W, fy_scale=0, fx_scale=0, uniform=(0.0, 5.0))
    # pixels near the right border land out of range -> invalid; x=W-6 lands
    # exactly on W-1
    plan = sk.plan_bands(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(valid))
    assert bool(plan["ok"])
    got = np.asarray(sk.scatter_bands(jnp.asarray(payload), plan, interpret=True))
    want = _oracle(payload, iyT, ixL, H, W)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.fixture
def force_interpret():
    jax.clear_caches()
    P._fast_base_scatter.cache_clear()
    P._FORCE_INTERPRET = True
    yield
    P._FORCE_INTERPRET = False
    P._fast_base_scatter.cache_clear()
    jax.clear_caches()


def test_flow_project_pallas_path_values_and_grads(rng, force_interpret):
    """The public op through the Pallas fast path == XLA path, for values
    (fill and no-fill) and for the backward (the custom_vjp gather must equal
    autodiff of the scatter)."""
    B, H, W = 2, 32, 200
    flow = jnp.asarray((rng.randn(B, 2, H, W) * 2.0).astype(np.float32))

    got_fill = P.flow_project(flow, fillhole=True)
    got_nf = P.flow_project(flow, fillhole=False)
    g_got = jax.grad(lambda f: jnp.sum(P.flow_project(f) ** 2))(flow)

    P._FORCE_INTERPRET = False
    P._fast_base_scatter.cache_clear()
    jax.clear_caches()
    ref_fill = P.flow_project(flow, fillhole=True)
    ref_nf = P.flow_project(flow, fillhole=False)
    g_ref = jax.grad(lambda f: jnp.sum(P.flow_project(f) ** 2))(flow)

    np.testing.assert_allclose(np.asarray(got_fill), np.asarray(ref_fill), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_nf), np.asarray(ref_nf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-5)


def test_flow_project_pallas_fallback_exact(rng, force_interpret):
    """Budget-blowing flow goes through the lax.cond XLA fallback inside the
    custom_vjp op — still exact."""
    B, H, W = 1, 16, 200
    flow = jnp.asarray((rng.randn(B, 2, H, W) * 30.0).astype(np.float32))
    got = P.flow_project(flow, fillhole=True)

    P._FORCE_INTERPRET = False
    P._fast_base_scatter.cache_clear()
    jax.clear_caches()
    ref = P.flow_project(flow, fillhole=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
