"""Trainer: optax-based train step over the functional models.

The reference ships no trainer, but documents the upstream one's
hyperparameters as commented-out flags (my_args.py:41-59): Adamax at lr 2e-3,
per-subnet relative learning rates (flow 0.01x, occlusion 1.0x, filter 1.0x),
Charbonnier epsilon 1e-6, loss alpha [1.0, 0.0] over the [interpolated,
rectified] residuals, weight decay 0, and ReduceLROnPlateau(patience=5,
factor=0.2).  ``build_interp_trainer`` reproduces exactly that from a Config;
the lower-level factories keep explicit knobs.

The step is a pure function suitable for jit/pjit over a device mesh;
sharding is decided by the caller (see memcnet_tpu.parallel and
__graft_entry__.dryrun_multichip for the ZeRO-1 + spatial-tiling recipe).
"""

import jax
import jax.numpy as jnp
import optax

from memcnet_tpu.train.loss import residual_loss

# my_args.py:44-46 relative learning rates, keyed on parameter-name prefix
SUBNET_LR = {"flownets": 0.01, "spynet": 0.01,
             "initScaleNets_occlusion": 1.0, "initScaleNets_filter": 1.0}


def scale_by_subnet_lr(coefs=None):
    """Per-subnet relative learning rates: updates whose (flat dict) param
    name starts with a key of `coefs` are scaled by its value."""
    coefs = dict(SUBNET_LR if coefs is None else coefs)

    def coef(name):
        for prefix, c in coefs.items():
            if name.startswith(prefix):
                return c
        return 1.0

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None, **_):
        assert isinstance(updates, dict), "flat param dict expected"
        return {k: v * coef(k) for k, v in updates.items()}, state

    return optax.GradientTransformation(init, update)


def make_optimizer(lr=2e-3, weight_decay=0.0, *, clip_norm=None,
                   subnet_lr=None, plateau=False, patience=5, factor=0.2):
    """Adamax chain per the upstream hyperparameters; `plateau` appends
    ReduceLROnPlateau (consumes the loss via update(..., value=loss))."""
    parts = []
    if clip_norm:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adamax(lr))
    if subnet_lr is not None:
        parts.append(scale_by_subnet_lr(subnet_lr if subnet_lr is not True else None))
    if plateau:
        parts.append(optax.contrib.reduce_on_plateau(
            patience=patience, factor=factor))
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    return optax.with_extra_args_support(tx)


def make_interp_train_step(model, optimizer, alpha=(1.0, 1.0), eps=1e-6):
    """Train step for the interpolation models (triplet supervision).

    alpha weights the [interpolated, rectified] Charbonnier residuals
    (my_args.py:53 documents [1.0, 0.0]; the uniform default here trains
    both heads)."""

    def loss_fn(params, x0, x1, x2):
        residuals, _offs, _filt, _occ, bn_updates = model.train_residuals(
            params, x0, x1, x2)
        return residual_loss(residuals, list(alpha), eps), bn_updates

    def step(params, opt_state, x0, x1, x2):
        (loss, bn_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x0, x1, x2)
        updates, opt_state = optimizer.update(
            grads, opt_state, params, value=loss)
        params = optax.apply_updates(params, updates)
        # BatchNorm running stats are state, not gradients: fold the
        # train-mode moving-average updates back in (their grads are zero,
        # so the optimizer left them untouched).
        params = {**params, **bn_updates}
        return params, opt_state, loss

    return step


def make_ve_train_step(model, optimizer, eps=1e-6):
    """Train step for MEMC_Net_VE (7-frame window, center target)."""

    def loss_fn(params, frames, y):
        residuals, bn_updates = model.train_residuals(params, frames, y)
        return residual_loss(residuals, eps=eps), bn_updates

    def step(params, opt_state, frames, y):
        (loss, bn_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, y)
        updates, opt_state = optimizer.update(
            grads, opt_state, params, value=loss)
        params = optax.apply_updates(params, updates)
        params = {**params, **bn_updates}
        return params, opt_state, loss

    return step


def build_interp_trainer(model, cfg=None, **overrides):
    """The documented upstream configuration, end to end: Adamax(cfg.lr),
    subnet relative LRs, plateau decay, clipping, alpha=cfg.alpha,
    eps=cfg.epsilon.  Returns (optimizer, jitted step)."""
    from memcnet_tpu.utils.config import Config

    cfg = cfg or Config()
    kw = dict(lr=cfg.lr, subnet_lr=True, plateau=True, clip_norm=None)
    kw.update(overrides)
    opt = make_optimizer(**kw)
    step = jax.jit(make_interp_train_step(
        model, opt, alpha=tuple(cfg.alpha), eps=cfg.epsilon))
    return opt, step


def fit(model, params, step, opt_state, batches, *, steps, eval_every=0,
        eval_fn=None, checkpoint_dir=None, log=print):
    """Minimal training loop: jitted steps over a batch iterator, periodic
    eval + orbax checkpointing.  Returns (params, opt_state, history)."""
    import numpy as np

    history = []
    for i, (x0, gt, x1) in zip(range(steps), batches):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x0), jnp.asarray(gt), jnp.asarray(x1))
        loss = float(loss)
        assert np.isfinite(loss), f"loss diverged at step {i}: {loss}"
        history.append(loss)
        if eval_every and (i + 1) % eval_every == 0:
            msg = f"step {i + 1}: loss {loss:.5f}"
            if eval_fn is not None:
                msg += f", eval {eval_fn(params):.4f}"
            log(msg)
            if checkpoint_dir:
                from memcnet_tpu.io import save_checkpoint

                save_checkpoint(checkpoint_dir, params, step=i + 1)
    return params, opt_state, history
