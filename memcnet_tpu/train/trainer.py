"""Trainer: optax-based train step over the functional models.

Optimizer default is Adamax at lr 2e-3 (the upstream trainer's documented
hyperparameters, my_args.py:41-59).  The step is a pure function suitable for
jit/pjit over a device mesh; sharding is decided by the caller (see
memcnet_tpu.parallel).
"""

import jax
import optax

from memcnet_tpu.train.loss import residual_loss


def make_optimizer(lr=2e-3, weight_decay=0.0):
    tx = optax.adamax(lr)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def make_interp_train_step(model, optimizer, alpha=(1.0, 1.0), eps=1e-6):
    """Train step for the interpolation models (triplet supervision)."""

    def loss_fn(params, x0, x1, x2):
        residuals, *_ = model.train_residuals(params, x0, x1, x2)
        return residual_loss(residuals, list(alpha), eps)

    def step(params, opt_state, x0, x1, x2):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, x1, x2)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_ve_train_step(model, optimizer, eps=1e-6):
    """Train step for MEMC_Net_VE (7-frame window, center target)."""

    def loss_fn(params, frames, y):
        residuals = model.train_residuals(params, frames, y)
        return residual_loss(residuals, eps=eps)

    def step(params, opt_state, frames, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, frames, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
