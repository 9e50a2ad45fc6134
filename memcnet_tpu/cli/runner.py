"""Shared demo machinery: model construction, weight loading, padded eval."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu import models as M
from memcnet_tpu.data import pad_frame, pad_plan, unpad_frame
from memcnet_tpu.io import import_pth, load_checkpoint


def build_model(cfg):
    model = M.get_model(cfg.net_name, filter_size=cfg.filter_size, channel=cfg.channels)
    params = model.init_params(jr.PRNGKey(cfg.seed))
    if cfg.pretrained:
        if cfg.pretrained.endswith(".pth"):
            params, report = import_pth(params, cfg.pretrained)
            print(f"imported {len(report['loaded'])} tensors from {cfg.pretrained} "
                  f"(skipped {len(report['skipped'])}, missing {len(report['missing'])})",
                  file=sys.stderr)
        else:
            params = load_checkpoint(cfg.pretrained)["params"]
    if cfg.dtype == "bfloat16":
        params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    return model, params


def cfg_jnp_dtype(cfg):
    """The config's compute dtype as a jnp dtype (inputs + activations;
    params are cast in build_model)."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class PaddedInterp:
    """Pad -> forward -> unpad for the interpolation models, re-jitting only
    when the padded geometry changes (shapes are static under jit)."""

    def __init__(self, model, params, save_which=1, dtype=jnp.float32):
        self.model = model
        self.params = params
        self.save_which = save_which
        self.dtype = dtype
        self._fns = {}

    def _fn(self, shape):
        if shape not in self._fns:
            model = self.model

            @jax.jit
            def fwd(params, x0, x2):
                outs, offs, filts, occs = model.forward(params, x0, x2)
                return outs, offs, filts, occs

            self._fns[shape] = fwd
        return self._fns[shape]

    def __call__(self, x0_np, x2_np):
        """x0/x2: (3, H, W) float32 [0,1] -> (out (3,H,W), aux dict)."""
        _, H, W = x0_np.shape
        assert W <= 1280 and H <= 720, (H, W)  # demo_MiddleBury.py:96-97
        plan = pad_plan(H, W)
        x0 = jnp.asarray(pad_frame(x0_np, plan)[None], self.dtype)
        x2 = jnp.asarray(pad_frame(x2_np, plan)[None], self.dtype)
        outs, offs, filts, occs = self._fn(x0.shape)(self.params, x0, x2)
        self.last_out_dtype = outs[self.save_which].dtype  # observability/tests
        sel = np.asarray(outs[self.save_which], np.float32)[0]
        out = unpad_frame(sel, plan, H, W)
        aux = {
            "interp": unpad_frame(np.asarray(outs[0], np.float32)[0], plan, H, W),
            "offsets": [unpad_frame(np.asarray(o, np.float32)[0], plan, H, W) for o in offs],
            "filters": [unpad_frame(np.asarray(f, np.float32)[0], plan, H, W) for f in filts],
            "occlusions": [unpad_frame(np.asarray(o, np.float32)[0], plan, H, W) for o in occs],
        }
        return out, aux


class PaddedVE:
    """Pad -> forward -> unpad for MEMC_Net_VE (7-frame windows)."""

    def __init__(self, model, params, dtype=jnp.float32):
        self.model = model
        self.params = params
        self.dtype = dtype
        self._fns = {}

    def _fn(self, shape):
        if shape not in self._fns:
            model = self.model

            @jax.jit
            def fwd(params, frames):
                return model.forward(params, list(frames))

            self._fns[shape] = fwd
        return self._fns[shape]

    def __call__(self, frames_np):
        _, H, W = frames_np[0].shape
        plan = pad_plan(H, W)
        frames = tuple(jnp.asarray(pad_frame(f, plan)[None], self.dtype) for f in frames_np)
        out = self._fn(frames[0].shape)(self.params, frames)
        self.last_out_dtype = out.dtype  # observability/tests
        return unpad_frame(np.asarray(out, np.float32)[0], plan, H, W)
