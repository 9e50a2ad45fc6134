"""Model-level tests: registry, forward shapes, and numeric parity of every
subnet against a fresh torch replica loaded (strict) with our flat params —
which simultaneously proves the state-dict naming contract the .pth importer
relies on."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.random as jr

import torch

from memcnet_tpu import models as M
from memcnet_tpu.models import edsr, flownets, mononet, spynet
import torch_ref as TR


def load_torch(module, params, prefix):
    """Copy flat jax params (prefix-stripped) into a torch module, strict."""
    sd = {}
    plen = len(prefix) + 1
    for k, v in params.items():
        if k.startswith(prefix + "."):
            sd[k[plen:]] = torch.from_numpy(np.asarray(v))
    missing_ok = {k for k in module.state_dict() if k.endswith("num_batches_tracked")}
    for k in missing_ok:
        sd[k] = module.state_dict()[k]
    module.load_state_dict(sd, strict=True)
    module.eval()
    return module


class TestSubnetParity:
    def test_flownets(self, rng):
        params = flownets.init_params(jr.PRNGKey(0))
        tm = load_torch(TR.TorchFlowNetS(), params, "flownets")
        x = rng.rand(1, 6, 64, 64).astype(np.float32)
        want = tm(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(flownets.forward(params, x))
        assert got.shape == want.shape == (1, 2, 16, 16)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_flownets_train_mode_multiscale(self, rng):
        """Train mode returns (flow2..flow6) like the reference
        (FlowNetS.py:106-117); flow2 is bit-identical to the eval output."""
        params = flownets.init_params(jr.PRNGKey(0))
        x = rng.rand(1, 6, 64, 128).astype(np.float32)
        flows = flownets.forward(params, x, training=True)
        assert len(flows) == 5
        for i, f in enumerate(flows):
            s = 4 * (2 ** i)
            assert f.shape == (1, 2, 64 // s, 128 // s), (i, f.shape)
        f2 = flownets.forward(params, x)
        np.testing.assert_array_equal(np.asarray(flows[0]), np.asarray(f2))

    def test_edsr(self, rng):
        params = edsr.init_params(jr.PRNGKey(1), n_colors=8, n_resblocks=3, n_feats=16)
        tm = load_torch(TR.TorchEDSR(8, 3, 16), params, "rectifyNet")
        x = rng.rand(1, 8, 16, 16).astype(np.float32)
        want = tm(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(edsr.forward(params, x, n_resblocks=3))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    @pytest.mark.parametrize("variant,bn", [("full", True), ("full", False), ("thin", True)])
    def test_mononet_trunk(self, rng, variant, bn):
        specs = mononet.mononet5_specs(3, variant, bn)
        params = mononet.init_specs(jr.PRNGKey(2), specs, "trunk")
        # randomize BN stats so eval BN is actually exercised
        for k in list(params):
            if k.endswith("running_mean"):
                params[k] = jnp.asarray(rng.randn(*params[k].shape).astype(np.float32) * 0.1)
            if k.endswith("running_var"):
                params[k] = jnp.asarray(rng.rand(*params[k].shape).astype(np.float32) + 0.5)
        tm = load_torch(TR.mononet5_modulelist(3, variant, bn), params, "trunk")
        x = rng.rand(1, 6, 64, 64).astype(np.float32)
        want = TR.walk_single_path(tm, torch.from_numpy(x)).detach().numpy()
        got = np.asarray(mononet.forward_single_path(params, "trunk", specs, x))
        assert got.shape == want.shape == (1, 16, 64, 64)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_rectify(self, rng):
        specs = mononet.rectify_specs(41)
        params = mononet.init_specs(jr.PRNGKey(3), specs, "rectifyNet")
        tm = load_torch(TR.rectify_modulelist(41), params, "rectifyNet")
        x = rng.rand(1, 41, 16, 16).astype(np.float32)
        want = TR.walk_single_path(tm, torch.from_numpy(x)).detach().numpy()
        got = np.asarray(mononet.forward_single_path(params, "rectifyNet", specs, x))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_spynet(self, rng):
        params = spynet.init_params(jr.PRNGKey(4))
        tm = load_torch(TR.TorchSPyNet(), params, "flownets")
        a = rng.rand(1, 3, 64, 96).astype(np.float32)
        b = rng.rand(1, 3, 64, 96).astype(np.float32)
        want = tm(torch.from_numpy(a), torch.from_numpy(b)).detach().numpy()
        got = np.asarray(spynet.forward(params, a, b))
        assert got.shape == want.shape == (1, 2, 64, 96)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestModelForward:
    def test_registry(self):
        assert set(M.__all__) == {"MEMC_Net", "MEMC_Net_s", "MEMC_Net_star", "MEMC_Net_VE"}
        with pytest.raises(KeyError):
            M.get_model("nope")

    @pytest.mark.parametrize("name", ["MEMC_Net", "MEMC_Net_s", "MEMC_Net_star"])
    def test_interp_forward_shapes(self, rng, name):
        model = M.get_model(name)
        params = model.init_params(jr.PRNGKey(0))
        x0 = rng.rand(1, 3, 128, 128).astype(np.float32)
        x2 = rng.rand(1, 3, 128, 128).astype(np.float32)
        (interp, rectified), offs, filts, occs = model.forward(params, x0, x2)
        assert interp.shape == rectified.shape == (1, 3, 128, 128)
        assert offs[0].shape == (1, 2, 128, 128)
        assert filts[0].shape == (1, 16, 128, 128)
        assert occs[0].shape == (1, 1, 128, 128)
        assert np.isfinite(np.asarray(rectified)).all()

    def test_ve_forward_shapes(self, rng):
        model = M.get_model("MEMC_Net_VE")
        params = model.init_params(jr.PRNGKey(0))
        frames = [rng.rand(1, 3, 128, 128).astype(np.float32) for _ in range(7)]
        out = model.forward(params, frames)
        assert out.shape == (1, 3, 128, 128)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_residuals(self, rng):
        model = M.get_model("MEMC_Net")
        params = model.init_params(jr.PRNGKey(0))
        x0, x1, x2 = (rng.rand(1, 3, 128, 128).astype(np.float32) for _ in range(3))
        losses, offs, filts, occs, bn_updates = model.train_residuals(params, x0, x1, x2)
        assert len(losses) == 2
        # MEMC_Net has BN MonoNets: train mode must produce running-stat updates
        assert any(k.endswith("running_mean") for k in bn_updates)
        # gradient flows through both residuals
        def loss_fn(p):
            ls, *_ = model.train_residuals(p, x0, x1, x2)
            return sum(jnp.mean(jnp.abs(l)) for l in ls)
        g = jax.grad(loss_fn)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
        assert np.isfinite(gnorm) and gnorm > 0
