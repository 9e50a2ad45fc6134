"""Parity of memcnet_tpu.nn layers vs PyTorch (CPU) reference primitives.

Weight-import parity (SURVEY.md section 7 "bit-level parity details") hinges on
these layers matching torch semantics exactly; torch (CPU build) is baked into
the image, so each layer is checked against the real thing.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from memcnet_tpu import nn as mnn  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 3, 7), (2, 2, 5), (1, 0, 1)])
def test_conv2d(rng, stride, padding, k):
    x = rng.randn(2, 5, 16, 18).astype(np.float32)
    w = rng.randn(7, 5, k, k).astype(np.float32) * 0.1
    b = rng.randn(7).astype(np.float32)
    want = F.conv2d(t(x), t(w), t(b), stride=stride, padding=padding).numpy()
    got = np.asarray(mnn.conv2d(x, w, b, stride=stride, padding=padding))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_k4s2p1(rng):
    # FlowNetS deconv geometry (FlowNetS.py:26-30)
    x = rng.randn(2, 6, 8, 9).astype(np.float32)
    w = rng.randn(6, 4, 4, 4).astype(np.float32) * 0.1
    b = rng.randn(4).astype(np.float32)
    want = F.conv_transpose2d(t(x), t(w), t(b), stride=2, padding=1).numpy()
    got = np.asarray(mnn.conv_transpose2d(x, w, b, stride=2, padding=1))
    assert got.shape == want.shape == (2, 4, 16, 18)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_eval(rng):
    x = rng.randn(2, 8, 6, 6).astype(np.float32)
    g = rng.rand(8).astype(np.float32) + 0.5
    bta = rng.randn(8).astype(np.float32)
    rm = rng.randn(8).astype(np.float32)
    rv = rng.rand(8).astype(np.float32) + 0.1
    want = F.batch_norm(t(x), t(rm), t(rv), t(g), t(bta), training=False, eps=1e-5).numpy()
    got = np.asarray(mnn.batch_norm_eval(x, g, bta, rm, rv))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_train(rng):
    """Train-mode BN vs torch: output normalized by batch stats AND the
    running-stat moving-average update (momentum 0.1, unbiased var), as
    nn.BatchNorm2d does in the reference's BN MonoNets
    (networks/MEMC_Net.py:292-305)."""
    x = rng.randn(3, 8, 6, 5).astype(np.float32) * 2 + 1
    g = rng.rand(8).astype(np.float32) + 0.5
    bta = rng.randn(8).astype(np.float32)
    rm = rng.randn(8).astype(np.float32)
    rv = rng.rand(8).astype(np.float32) + 0.1
    t_rm, t_rv = t(rm.copy()), t(rv.copy())
    want = F.batch_norm(t(x), t_rm, t_rv, t(g), t(bta), training=True,
                        momentum=0.1, eps=1e-5).numpy()
    got, new_m, new_v = mnn.batch_norm_train(x, g, bta, rm, rv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # torch mutates the running stats in place
    np.testing.assert_allclose(np.asarray(new_m), t_rm.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_v), t_rv.numpy(), rtol=1e-5, atol=1e-6)


def test_batch_norm_train_block_parity(rng):
    """One conv-relu-bn MonoNet block in train mode vs the torch equivalent
    (the reference's conv_relu_maxpool unit, MEMC_Net.py:292-305, sans pool)."""
    import torch.nn as tnn

    from memcnet_tpu.models.mononet import forward_single_path

    x = rng.randn(2, 4, 12, 16).astype(np.float32)
    block = tnn.Sequential(
        tnn.Conv2d(4, 6, 3, padding=1), tnn.ReLU(), tnn.BatchNorm2d(6))
    block.train()
    params = {
        "blk.0.weight": np.asarray(block[0].weight.detach()),
        "blk.0.bias": np.asarray(block[0].bias.detach()),
        "blk.2.weight": np.asarray(block[2].weight.detach()),
        "blk.2.bias": np.asarray(block[2].bias.detach()),
        "blk.2.running_mean": np.asarray(block[2].running_mean),
        "blk.2.running_var": np.asarray(block[2].running_var),
    }
    specs = [("conv", 0, (4, 6)), ("relu", 1, None), ("bn", 2, 6)]
    upd = {}
    got = forward_single_path(params, "blk", specs, x, training=True, bn_updates=upd)
    want = block(t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["blk.2.running_mean"]),
                               block[2].running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["blk.2.running_var"]),
                               block[2].running_var.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("H,W", [(8, 8), (7, 9)])
def test_max_pool2d(rng, H, W):
    x = rng.randn(2, 3, H, W).astype(np.float32)
    want = F.max_pool2d(t(x), 2).numpy()
    got = np.asarray(mnn.max_pool2d(x, 2))
    np.testing.assert_allclose(got, want)


def test_avg_pool2d(rng):
    x = rng.randn(2, 3, 8, 10).astype(np.float32)
    want = F.avg_pool2d(t(x), 2).numpy()
    got = np.asarray(mnn.avg_pool2d(x, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_bilinear_align_corners(rng, scale):
    # PyTorch-0.2 Upsample(bilinear) == modern align_corners=True
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    want = F.interpolate(t(x), scale_factor=scale, mode="bilinear", align_corners=True).numpy()
    got = np.asarray(mnn.upsample_bilinear(x, scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_replication_pad(rng):
    x = rng.randn(1, 3, 4, 5).astype(np.float32)
    pad = (2, 3, 1, 4)  # l, r, t, b
    want = F.pad(t(x), pad, mode="replicate").numpy()
    got = np.asarray(mnn.replication_pad2d(x, pad))
    np.testing.assert_allclose(got, want)


def test_leaky_relu(rng):
    x = rng.randn(2, 3, 4, 4).astype(np.float32)
    want = F.leaky_relu(t(x), 0.1).numpy()
    got = np.asarray(mnn.leaky_relu(x, 0.1))
    np.testing.assert_allclose(got, want)


def test_grid_sample_bilinear(rng):
    # SPyNet Backward-warp semantics (SPyNet/Network.py:134):
    # zeros padding + align_corners=True (the 0.2 behavior)
    x = rng.randn(2, 3, 6, 7).astype(np.float32)
    grid = (rng.rand(2, 6, 7, 2).astype(np.float32) - 0.5) * 2.6  # spans out-of-range
    want = F.grid_sample(t(x), t(grid), mode="bilinear", padding_mode="zeros", align_corners=True).numpy()
    got = np.asarray(mnn.grid_sample_bilinear(x, grid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,padding,k,cin", [(1, 3, 7, 3), (2, 3, 7, 6)])
def test_conv2d_im2col(rng, stride, padding, k, cin):
    x = rng.randn(2, cin, 16, 18).astype(np.float32)
    w = rng.randn(7, cin, k, k).astype(np.float32) * 0.1
    b = rng.randn(7).astype(np.float32)
    want = F.conv2d(t(x), t(w), t(b), stride=stride, padding=padding).numpy()
    got = np.asarray(mnn.layers.conv2d_im2col(x, w, b, stride=stride, padding=padding))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


import jax.numpy as jnp  # noqa: E402

from memcnet_tpu.nn import layers as L  # noqa: E402


class TestBf16ConvVJP:
    """The hand-written bf16 conv backward (nn/layers.py::_conv2d_bf16_op)
    must match autodiff of the f32 conv within bf16 rounding, across strides
    and the asymmetric-leftover padding case."""

    @pytest.mark.parametrize("s,p,k,H,W", [
        (1, 1, 3, 12, 20),
        (1, 3, 7, 12, 20),
        (2, 1, 3, 13, 21),   # leftover != 0 on both axes
        (2, 3, 7, 16, 24),
    ])
    def test_grads_match_f32(self, s, p, k, H, W):
        import jax

        rng = np.random.RandomState(0)
        x32 = jnp.asarray(rng.randn(2, 5, H, W).astype(np.float32))
        w32 = jnp.asarray((rng.randn(4, 5, k, k) * 0.2).astype(np.float32))
        ct32 = None

        def loss(x, w):
            out = L.conv2d(x, w, stride=s, padding=p)
            return jnp.sum(out * ct)

        Ho = (H + 2 * p - k) // s + 1
        Wo = (W + 2 * p - k) // s + 1
        ct = jnp.asarray(rng.randn(2, 4, Ho, Wo).astype(np.float32))
        gx32, gw32 = jax.grad(loss, argnums=(0, 1))(x32, w32)

        ct = ct.astype(jnp.bfloat16)
        gx16, gw16 = jax.grad(loss, argnums=(0, 1))(
            x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
        assert gx16.dtype == jnp.bfloat16 and gw16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gx16, np.float32), np.asarray(gx32),
            rtol=0.05, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(gw16, np.float32), np.asarray(gw32),
            rtol=0.05, atol=0.35)
