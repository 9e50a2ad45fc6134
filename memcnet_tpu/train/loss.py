"""Training losses.

The reference ships no trainer (SURVEY.md section 3 end-note), but its
training-mode forwards return residual lists to be penalized
(MEMC_Net.py:132-137: [interp - gt, rectified - gt]) and my_args.py:41-59
documents the hyperparameters of the upstream trainer (charbonnier epsilon
1e-6, per-residual alpha weights [1.0, 0.0]).  This module provides that loss
surface for capability parity.
"""

import jax.numpy as jnp


def charbonnier(x, eps=1e-6):
    """Mean Charbonnier penalty sqrt(x^2 + eps^2) (my_args.py:56 epsilon)."""
    return jnp.mean(jnp.sqrt(x.astype(jnp.float32) ** 2 + eps * eps))


def l1(x):
    return jnp.mean(jnp.abs(x.astype(jnp.float32)))


def residual_loss(residuals, alpha=None, eps=1e-6):
    """Weighted sum of Charbonnier penalties over residual tensors.

    alpha defaults to uniform 1.0 (the reference default [1.0, 0.0] trains the
    pre-rectification output only; pass it explicitly to reproduce that)."""
    if alpha is None:
        alpha = [1.0] * len(residuals)
    assert len(alpha) == len(residuals)
    total = 0.0
    for a, r in zip(alpha, residuals):
        total = total + a * charbonnier(r, eps)
    return total
