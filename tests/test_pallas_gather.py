"""Pallas band-gather kernel (ops/pallas/gather_kernel.py) vs a direct numpy
tap-sum oracle, in interpret mode on CPU — kernel-level coverage independent
of the grid_sample integration (tests/test_grid_sample_fast.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from memcnet_tpu.ops.pallas import gather_kernel as gk


def _oracle(src, wtap, dy, dx, fs):
    """out[b,c,y,x] = sum_{j,i} wtap[b,j*fs+i,y,x] * src[b,c,y+dy+j,x+dx+i]."""
    B, C, Hs, Ws = src.shape
    _, _, H, W = wtap.shape
    out = np.zeros((B, C, H, W), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                for j in range(fs):
                    for i in range(fs):
                        sy = y + dy[b, y, x] + j
                        sx = x + dx[b, y, x] + i
                        out[b, :, y, x] += wtap[b, j * fs + i, y, x] * src[b, :, sy, sx]
    return out


def _case(rng, B, C, H, W, fs, spread):
    # offsets chosen so every tap is in-bounds in the padded source
    PT, PL = 8, 4
    dy = rng.randint(0, spread + 1, (B, H, W)).astype(np.int32) + PT - spread // 2
    dx = rng.randint(0, spread + 1, (B, H, W)).astype(np.int32) + PL - spread // 2
    Wsp = -(-(W + 2 * PL + fs) // 128) * 128
    Hsp = -(-(H + PT + gk.R + gk.TH) // gk.TH) * gk.TH
    src = rng.rand(B, C, Hsp, Wsp).astype(np.float32)
    wtap = rng.rand(B, fs * fs, H, W).astype(np.float32)
    return src, wtap, dy, dx


@pytest.mark.parametrize("fs,spread", [(2, 0), (2, 3), (4, 2)])
def test_gather_bands_vs_oracle(rng, fs, spread):
    B, C, H, W = 2, 3, 16, 40
    src, wtap, dy, dx = _case(rng, B, C, H, W, fs, spread)
    valid = np.ones((B, H, W), bool)
    plan = gk.plan_bands(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(valid))
    assert bool(gk.gather_ok(plan, fs))
    got = np.asarray(gk.gather_bands(
        jnp.asarray(src), jnp.asarray(wtap), plan, filter_size=fs, out_w=W,
        interpret=True))
    want = _oracle(src, wtap, dy, dx, fs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dy_lo", [8, 15])  # dylo_off = 0 and 7
def test_gather_budget_boundary(rng, dy_lo):
    """Pin gather_ok's derived bound: dylo_off + ny <= R - TH - fs + 2,
    with correctness vs the oracle at exactly the budget."""
    B, C, H, W, fs = 1, 2, 8, 40, 2
    budget = gk.R - gk.TH - fs + 2
    dylo_off = dy_lo % gk.TH
    ny_max = budget - dylo_off
    PL = 4
    dx = np.full((B, H, W), PL, np.int32)
    valid = np.ones((B, H, W), bool)
    for ny, expect_ok in [(ny_max, True), (ny_max + 1, False)]:
        dy = rng.randint(0, ny, (B, H, W)).astype(np.int32) + dy_lo
        dy[0, 0, 0] = dy_lo            # force the exact spread
        dy[0, 0, 1] = dy_lo + ny - 1
        plan = gk.plan_bands(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(valid))
        assert bool(gk.gather_ok(plan, fs)) == expect_ok, (dy_lo, ny)
        if expect_ok:
            Hsp = -(-(H + dy_lo + ny + fs + gk.R) // gk.TH) * gk.TH
            src = rng.rand(B, C, Hsp, 128).astype(np.float32)
            wtap = rng.rand(B, fs * fs, H, W).astype(np.float32)
            got = np.array(gk.gather_bands(
                jnp.asarray(src), jnp.asarray(wtap), plan, filter_size=fs,
                out_w=W, interpret=True))
            want = _oracle(src, wtap, dy, dx, fs)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_ok_rejects_wild_vertical_spread(rng):
    B, H, W = 1, 16, 40
    dy = (rng.randint(0, 60, (B, H, W)) + 8).astype(np.int32)  # spread ~60 > budget
    dx = np.zeros((B, H, W), np.int32) + 4
    valid = np.ones((B, H, W), bool)
    plan = gk.plan_bands(jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(valid))
    assert not bool(gk.gather_ok(plan, 2))


def test_invalid_pixels_excluded_from_plan(rng):
    """Zero-weight invalid pixels must not blow the band budgets."""
    B, C, H, W = 1, 2, 16, 40
    src, wtap, dy, dx = _case(rng, B, C, H, W, 2, 2)
    valid = np.ones((B, H, W), bool)
    # one absurd offset, masked invalid with zero weights
    dy2 = dy.copy()
    dy2[0, 5, 7] = 500
    valid2 = valid.copy()
    valid2[0, 5, 7] = False
    wtap[0, :, 5, 7] = 0.0
    plan = gk.plan_bands(jnp.asarray(dy2), jnp.asarray(dx), jnp.asarray(valid2))
    assert bool(gk.gather_ok(plan, 2))
    got = np.array(gk.gather_bands(
        jnp.asarray(src), jnp.asarray(wtap), plan, filter_size=2, out_w=W,
        interpret=True))
    want = _oracle(src, wtap, dy, dx, 2)  # oracle with the sane dy; weights 0 there
    want[0, :, 5, 7] = 0.0
    got[0, :, 5, 7] = 0.0  # that pixel's value is unspecified (zero weights)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
