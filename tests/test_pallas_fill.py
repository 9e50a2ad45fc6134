"""Pallas hole-fill kernel (ops/pallas/fill_kernel.py) vs the XLA
directional-scan formulation, in interpret mode on CPU — plus the
flow_project-level dispatch equality."""

import numpy as np
import pytest

import jax.numpy as jnp

from memcnet_tpu.ops import projection as P
from memcnet_tpu.ops import flow_project
from memcnet_tpu.ops.pallas.fill_kernel import fill_holes


def _case(rng, B, H, W, density):
    avg = rng.randn(B, 2, H, W).astype(np.float32)
    cnt = (rng.rand(B, H, W) < density).astype(np.float32) * (
        1.0 + rng.rand(B, H, W).astype(np.float32))
    avg = avg * (cnt > 0)[:, None]
    return jnp.asarray(avg), jnp.asarray(cnt)


@pytest.mark.parametrize("B,H,W,density", [
    (2, 24, 136, 0.15),   # ragged W, sparse projections
    (1, 16, 128, 0.9),    # dense: few holes
    (1, 8, 300, 0.02),    # very sparse: long scans, single band
    (1, 40, 256, 0.0),    # no projections at all: everything stays
])
def test_fill_matches_xla_scans(rng, B, H, W, density):
    avg, cnt = _case(rng, B, H, W, density)
    want = np.asarray(P._directional_fill_xla(avg, cnt, False))
    got = np.asarray(fill_holes(avg, cnt, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fill_band_carry_crosses_bands(rng):
    """A projection only in the TOP row must fill holes many bands below
    through the sequential carry (and batch 1's carry must not leak into
    batch 0's bands: per-batch reset)."""
    B, H, W = 2, 64, 128
    avg = np.zeros((B, 2, H, W), np.float32)
    cnt = np.zeros((B, H, W), np.float32)
    cnt[0, 0, :] = 1.0
    avg[0, 0, 0, :] = 7.0
    avg[0, 1, 0, :] = -3.0
    # batch 1: projection only in the LAST row -> holes above it get filled
    # by nothing from the up-scan (and nothing horizontally)
    cnt[1, H - 1, :] = 1.0
    avg[1, 0, H - 1, :] = 9.0
    want = np.asarray(P._directional_fill_xla(
        jnp.asarray(avg), jnp.asarray(cnt), False))
    got = np.asarray(fill_holes(jnp.asarray(avg), jnp.asarray(cnt),
                                interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got[0, 0, 40, 64] == 7.0  # carried down 5 bands
    assert got[1, 0, 0, 0] == 0.0    # down-scan dead: hole above stays empty


def test_flow_project_fillhole_dispatch(rng):
    """flow_project(fillhole=True) equals the XLA path when the Pallas fill
    is force-dispatched in interpret mode."""
    B, H, W = 1, 32, 128
    flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 30.0
    want = np.asarray(flow_project(jnp.asarray(flow), fillhole=True))
    P._FORCE_INTERPRET = True
    try:
        got = np.asarray(flow_project(jnp.asarray(flow), fillhole=True))
    finally:
        P._FORCE_INTERPRET = False
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
