"""Trainer smoke tests: the interp and VE train steps run, produce finite
losses, and reduce the loss when overfitting a single tiny example (the
reference ships no trainer — SURVEY.md section 3 end-note — so this guards
the capability we added)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from memcnet_tpu import models as M
from memcnet_tpu.train import make_interp_train_step, make_optimizer, make_ve_train_step


class TestInterpTraining:
    @pytest.mark.parametrize("name", ["MEMC_Net", "MEMC_Net_star"])
    def test_loss_decreases(self, rng, name):
        model = M.get_model(name)
        params = model.init_params(jr.PRNGKey(0))
        # small lr: at 1e-3 the randomly-initialized EDSR head overshoots on
        # the first Adamax step (loss spike) before recovering
        opt = make_optimizer(lr=1e-4)
        opt_state = opt.init(params)
        step = jax.jit(make_interp_train_step(model, opt))

        H = W = 128
        x0 = jnp.asarray(rng.rand(1, 3, H, W).astype(np.float32))
        x2 = jnp.asarray(rng.rand(1, 3, H, W).astype(np.float32))
        x1 = (x0 + x2) / 2

        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, x0, x1, x2)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses), losses
        # Adamax's first update overshoots from random init (it normalizes by
        # the max gradient), so assert descent from the post-update point
        assert losses[-1] < losses[1], losses
        assert losses[-1] < losses[-2] < losses[-3], losses

    def test_grads_cover_all_params(self, rng):
        # every parameter that should train receives a gradient (BN running
        # stats and the like excluded by not existing for star)
        model = M.get_model("MEMC_Net_star")
        params = model.init_params(jr.PRNGKey(0))

        def loss_fn(p):
            residuals, *_ = model.train_residuals(
                p,
                jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)),
                jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)),
                jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)),
            )
            return sum(jnp.mean(jnp.abs(r)) for r in residuals)

        grads = jax.grad(loss_fn)(params)
        nonzero = sum(int(jnp.any(g != 0)) for g in grads.values())
        # ctx net is behind stop_gradient only for the warped copies; its
        # direct path is dead in star's rectify input, so allow a small
        # number of zero-grad tensors but the bulk must train
        assert nonzero > 0.8 * len(grads), (nonzero, len(grads))


class TestVETraining:
    def test_step_runs(self, rng):
        model = M.get_model("MEMC_Net_VE")
        params = model.init_params(jr.PRNGKey(0))
        opt = make_optimizer(lr=1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_ve_train_step(model, opt))

        frames = [jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)) for _ in range(7)]
        y = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
        p2, o2, loss = step(params, opt_state, frames, y)
        assert np.isfinite(float(loss))
        changed = sum(
            int(bool(jnp.any(p2[k] != params[k]))) for k in list(params)[:20]
        )
        assert changed > 0
