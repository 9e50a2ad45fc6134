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


class TestBatchNormTraining:
    """Training-mode BatchNorm on the BN-bearing models (VERDICT r3 #4):
    batch statistics drive normalization and the running stats move."""

    def test_running_stats_update_and_loss_decreases(self, rng):
        model = M.get_model("MEMC_Net")  # BN MonoNets (MEMC_Net.py:292-305)
        params = model.init_params(jr.PRNGKey(0))
        opt = make_optimizer(lr=1e-4)
        opt_state = opt.init(params)
        step = jax.jit(make_interp_train_step(model, opt))

        x0 = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
        x2 = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
        x1 = (x0 + x2) / 2
        bn_keys = [k for k in params if k.endswith("running_mean")]
        assert bn_keys, "MEMC_Net must carry BN running stats"
        before = {k: np.asarray(params[k]) for k in bn_keys}

        losses = []
        for _ in range(4):
            params, opt_state, loss = step(params, opt_state, x0, x1, x2)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses), losses
        assert losses[-1] < losses[1], losses
        moved = sum(
            int(not np.allclose(before[k], np.asarray(params[k]))) for k in bn_keys)
        assert moved == len(bn_keys), f"only {moved}/{len(bn_keys)} BN stats moved"

    def test_thin_model_bn_updates(self, rng):
        model = M.get_model("MEMC_Net_s")
        params = model.init_params(jr.PRNGKey(0))
        res, _o, _f, _oc, upd = model.train_residuals(
            params,
            jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)),
            jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)),
            jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32)))
        assert any(k.endswith("running_mean") for k in upd)
        # all updates name existing running-stat params
        assert all(k in params and ("running_" in k) for k in upd)


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
        # VE is BN-bearing: the step must move its running stats too
        bn_keys = [k for k in params if k.endswith("running_mean")]
        assert bn_keys
        assert all(bool(jnp.any(p2[k] != params[k])) for k in bn_keys)

    def test_grads_reach_all_subnets_and_loss_decreases(self, rng):
        """VERDICT r3 #8: exercise the VE train path — grads must reach
        flownets/ctx/EDSR (residual structure: MEMC_Net_VE.py:270-275) and a
        few overfit steps must descend."""
        from memcnet_tpu.train.loss import residual_loss

        model = M.get_model("MEMC_Net_VE")
        params = model.init_params(jr.PRNGKey(0))
        frames = [jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
                  for _ in range(7)]
        y = frames[3] * 0.9 + 0.05

        def loss_fn(p):
            residuals, _bn = model.train_residuals(p, frames, y)
            return residual_loss(residuals)

        grads = jax.grad(loss_fn)(params)
        for prefix in ("flownets", "ctxNet", "rectifyNet", "initScaleNets_filter"):
            sub = [k for k in grads if k.startswith(prefix)
                   and "running_" not in k]
            assert sub, prefix
            live = sum(int(bool(jnp.any(grads[k] != 0))) for k in sub)
            assert live > 0.5 * len(sub), (prefix, live, len(sub))

        opt = make_optimizer(lr=1e-4)
        opt_state = opt.init(params)
        step = jax.jit(make_ve_train_step(model, opt))
        losses = []
        for _ in range(4):
            params, opt_state, loss = step(params, opt_state, frames, y)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses), losses
        assert losses[-1] < losses[1], losses


FIXTURES = "/root/reference/vimeo_video_enhancement_test/input"


class TestUpstreamHyperparameters:
    """The documented upstream trainer configuration (my_args.py:41-59):
    alpha, per-subnet relative LRs, plateau decay."""

    def test_alpha_1_0_trains_interp_head_only(self, rng):
        # alpha=[1.0, 0.0] puts zero weight on the rectified residual, so the
        # rectify net (reached only by that residual) must get zero grads
        from memcnet_tpu.train.loss import residual_loss

        model = M.get_model("MEMC_Net")
        params = model.init_params(jr.PRNGKey(0))
        x0, x1, x2 = (jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
                      for _ in range(3))

        def loss_fn(p):
            residuals, *_ = model.train_residuals(p, x0, x1, x2)
            return residual_loss(residuals, [1.0, 0.0])

        grads = jax.grad(loss_fn)(params)
        rect = [k for k in grads if k.startswith("rectifyNet")]
        # BN running stats are unused in train mode (batch stats drive the
        # normalization), so they legitimately carry zero grads
        other = [k for k in grads
                 if not k.startswith("rectifyNet") and "running_" not in k]
        assert rect and all(not bool(jnp.any(grads[k] != 0)) for k in rect)
        assert sum(int(bool(jnp.any(grads[k] != 0))) for k in other) > 0.8 * len(other)

    def test_subnet_lr_scaling(self):
        from memcnet_tpu.train.trainer import make_optimizer

        opt = make_optimizer(lr=1e-2, subnet_lr=True)
        params = {"flownets.c.w": jnp.ones(4), "initScaleNets_filter.0.w": jnp.ones(4)}
        st = opt.init(params)
        g = {k: jnp.ones(4) for k in params}
        up, _ = opt.update(g, st, params, value=jnp.float32(1.0))
        ratio = float(up["flownets.c.w"][0] / up["initScaleNets_filter.0.w"][0])
        assert abs(ratio - 0.01) < 1e-4, ratio  # my_args.py:44 flow_lr_coe

    def test_plateau_reduces_lr(self):
        from memcnet_tpu.train.trainer import make_optimizer

        opt = make_optimizer(lr=1.0, plateau=True, patience=2, factor=0.5)
        params = {"w": jnp.ones(2)}
        st = opt.init(params)
        g = {"w": jnp.ones(2)}
        scales = []
        for _ in range(8):  # constant loss -> plateau fires after patience
            up, st = opt.update(g, st, params, value=jnp.float32(1.0))
            scales.append(abs(float(up["w"][0])))
        assert scales[-1] < scales[0] * 0.6, scales


class TestTripletPipeline:
    """Vimeo triplet loader + fit() on real fixture frames."""

    def test_loader_scans_fixtures(self):
        import os

        import pytest as _pytest

        if not os.path.isdir(FIXTURES):
            _pytest.skip("reference fixtures unavailable")
        from memcnet_tpu.data.vimeo90k import VimeoTriplet

        ds = VimeoTriplet(FIXTURES, crop=(128, 128), seed=0)
        assert len(ds) >= 4
        x0, gt, x1 = ds[0]
        assert x0.shape == (3, 128, 128) and gt.dtype == np.float32
        b = next(ds.batches(2))
        assert all(a.shape == (2, 3, 128, 128) for a in b)

    def test_fit_overfits_fixture_triplet(self):
        import os

        import pytest as _pytest

        if not os.path.isdir(FIXTURES):
            _pytest.skip("reference fixtures unavailable")
        from memcnet_tpu.data.vimeo90k import VimeoTriplet
        from memcnet_tpu.train.trainer import build_interp_trainer, fit

        model = M.get_model("MEMC_Net")
        params = model.init_params(jr.PRNGKey(0))
        ds = VimeoTriplet(FIXTURES, crop=(128, 128), seed=0)
        ds.paths = ds.paths[:1]  # overfit a single real triplet
        opt, step = build_interp_trainer(model, lr=1e-4, plateau=False)
        opt_state = opt.init(params)
        params, opt_state, hist = fit(
            model, params, step, opt_state, ds.batches(1, shuffle=False),
            steps=8)
        assert len(hist) == 8 and all(np.isfinite(h) for h in hist)
        # Adamax overshoots from random init on step 0, and train-mode BN at
        # batch size 1 makes individual steps noisy; require net descent
        assert min(hist[4:]) < hist[1], hist
