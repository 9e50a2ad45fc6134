"""The three frame-interpolation models: MEMC_Net, MEMC_Net_s, MEMC_Net_star.

Reference forwards: networks/MEMC_Net.py:69-146, MEMC_Net_s.py:62-145,
MEMC_Net_star.py:78-169.  Eval returns ([interp, rectified], flows, filters,
occlusions); train returns L1-ready residual pairs plus the same intermediates
(MEMC_Net.py:132-137).

Pipeline (shared skeleton):
  flow:      FlowNetS(pair) * div_flow/2, bilinear x4 upsample (:148-152)
             [_s: SPyNet(first, second) / 2, full-res already (:147-156)]
             -> flow_project to the intermediate time (fillhole in eval only)
  filter:    MonoNet5 trunk -> two branches of filter_size^2 channels
  occlusion: MonoNet5 trunk -> 0.5 + branch  [_s: filter branch-0 channel 0]
  warp:      filter_interp_warp both frames; occlusion-weighted blend
             [_s: plain average]
  [star]:    ResNet-conv1 contexts warped through the same op, detached
  rectify:   8-conv RectifyNet residual  [star: EDSR(169ch, 10 blocks, 128)]
"""

import jax
import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.models import ctx as ctx_mod
from memcnet_tpu.models import edsr, flownets, spynet
from memcnet_tpu.models.mononet import (
    branch_specs,
    forward_dual_path,
    forward_single_path,
    init_specs,
    mononet5_specs,
    rectify_specs,
)
from memcnet_tpu.nn import init as I
from memcnet_tpu.nn.layers import upsample_bilinear
from memcnet_tpu.ops import filter_interp_warp, flow_project
from memcnet_tpu.ops.warp import filter_interp_warp_split

DIV_FLOW = 20.0


def _forward_flownets(params, pair, prefix="flownets"):
    """FlowNetS quarter-res flow -> x(div_flow/2), x4 bilinear upsample
    (MEMC_Net.py:148-152)."""
    f = flownets.forward(params, pair, prefix=prefix)
    return upsample_bilinear(f * (DIV_FLOW / 2.0), 4)


class MEMCNet:
    """MEMC_Net (FlowNetS flow, BN MonoNets, conv RectifyNet)."""

    name = "MEMC_Net"
    variant = "full"
    with_bn = True
    init_fn = staticmethod(I.kaiming_uniform)
    has_occlusion_net = True
    has_ctx = False

    def __init__(self, filter_size=4, channel=3):
        self.filter_size = filter_size
        self.channel = channel
        fs2 = filter_size * filter_size
        self.trunk_specs = mononet5_specs(channel, self.variant, self.with_bn)
        self.filter_branch_specs = branch_specs(fs2)
        self.occ_branch_specs = branch_specs(1)
        self.rectify_in = 3 + 4 + 2 * fs2 + 2  # MEMC_Net.py:32

    # -- params ---------------------------------------------------------------

    def init_params(self, key, dtype=jnp.float32):
        ks = jr.split(key, 12)
        p = {}
        p.update(init_specs(ks[0], self.trunk_specs, "initScaleNets_filter", self.init_fn, dtype))
        p.update(init_specs(ks[1], self.filter_branch_specs, "initScaleNets_filter1", self.init_fn, dtype))
        p.update(init_specs(ks[2], self.filter_branch_specs, "initScaleNets_filter2", self.init_fn, dtype))
        if self.has_occlusion_net:
            p.update(init_specs(ks[3], self.trunk_specs, "initScaleNets_occlusion", self.init_fn, dtype))
            p.update(init_specs(ks[4], self.occ_branch_specs, "initScaleNets_occlusion1", self.init_fn, dtype))
            p.update(init_specs(ks[5], self.occ_branch_specs, "initScaleNets_occlusion2", self.init_fn, dtype))
        p.update(self._init_rectify(ks[6], dtype))
        p.update(self._init_flow(ks[7], dtype))
        if self.has_ctx:
            p.update(ctx_mod.init_params(ks[8], dtype=dtype))
        return p

    def _init_rectify(self, key, dtype):
        return init_specs(key, rectify_specs(self.rectify_in), "rectifyNet", self.init_fn, dtype)

    def _init_flow(self, key, dtype):
        return flownets.init_params(key, dtype=dtype)

    # -- forward --------------------------------------------------------------

    def _flows(self, params, x0, x2, fillhole):
        # Both directions batched into one FlowNetS call and one projection.
        # The direction axis is interleaved sample-major (B, 2, ...) so each
        # sample's two directions live on the same DP shard: a direction-major
        # concat would make off[:B] / off[B:] reshard the batch axis (GSPMD
        # emits an all-to-all for that slice; it aborted the 8-device CPU
        # dryrun).  Per-sample results are order-independent.
        B = x0.shape[0]
        p01 = jnp.concatenate((x0, x2), axis=1)
        p10 = jnp.concatenate((x2, x0), axis=1)
        pairs = jnp.stack((p01, p10), axis=1).reshape((2 * B,) + p01.shape[1:])
        f = _forward_flownets(params, pairs)
        off = flow_project(f, fillhole=fillhole)
        off = off.reshape((B, 2) + off.shape[1:])
        return off[:, 0], off[:, 1]

    def _filters(self, params, pair):
        t = forward_single_path(params, "initScaleNets_filter", self.trunk_specs, pair)
        f0 = forward_single_path(params, "initScaleNets_filter1", self.filter_branch_specs, t)
        f1 = forward_single_path(params, "initScaleNets_filter2", self.filter_branch_specs, t)
        return f0, f1

    def _occlusions(self, params, pair, filters):
        t = forward_single_path(params, "initScaleNets_occlusion", self.trunk_specs, pair)
        o0 = 0.5 + forward_single_path(params, "initScaleNets_occlusion1", self.occ_branch_specs, t)
        o1 = 0.5 + forward_single_path(params, "initScaleNets_occlusion2", self.occ_branch_specs, t)
        return o0, o1

    def _filters_and_occlusions(self, params, pair, training=False, bn_updates=None):
        """Filter + occlusion nets fused: identical specs on the same input
        run as grouped-conv walks (see mononet.forward_dual_path)."""
        t_f, t_o = forward_dual_path(
            params, "initScaleNets_filter", "initScaleNets_occlusion", self.trunk_specs, pair,
            training=training, bn_updates=bn_updates,
        )
        filters = forward_dual_path(
            params, "initScaleNets_filter1", "initScaleNets_filter2", self.filter_branch_specs, t_f
        )
        o0, o1 = forward_dual_path(
            params, "initScaleNets_occlusion1", "initScaleNets_occlusion2", self.occ_branch_specs, t_o
        )
        return filters, (0.5 + o0, 0.5 + o1)

    def _blend(self, warped0, warped1, occ):
        return occ[0] * warped0 + occ[1] * warped1  # MEMC_Net.py:263

    def _rectify(self, params, blended, offs, filters, occs, ctxs):
        rin = jnp.concatenate((blended, offs[0], offs[1], filters[0], filters[1], occs[0], occs[1]), axis=1)
        return blended + forward_single_path(params, "rectifyNet", rectify_specs(self.rectify_in), rin)

    def forward(self, params, x0, x2, *, training=False, bn_updates=None):
        """x0/x2: (B, 3, H, W), H and W multiples of 128 (padded upstream).
        Returns ((interp, rectified), (off0, off1), (filt0, filt1), (occ0, occ1)).

        training=True switches BatchNorm to batch statistics (train mode);
        pass a dict as ``bn_updates`` to collect the updated running stats
        (keyed by parameter name) for the trainer to fold back into params."""
        pair = jnp.concatenate((x0, x2), axis=1)
        offs = self._flows(params, x0, x2, fillhole=not training)
        filters, occs = self._filters_and_occlusions(
            params, pair, training=training, bn_updates=bn_updates)
        fs = self.filter_size
        if self.has_ctx:
            # Image + context share flow/filter indices — warping the
            # 3+64-channel stack in ONE call amortizes the gather (the per-
            # index cost dominates; 2 merged warps ~ 156 ms vs 4 split ~ 660
            # ms at 720p).  Context slices are gradient-stopped afterwards
            # (MEMC_Net_star.py:285).
            # one batched ctx call for both frames (per-op overhead dominates
            # this single small-C conv; B=2 costs the same as B=1); frame axis
            # interleaved sample-major for the same DP-shard reason as _flows
            B = x0.shape[0]
            cc = ctx_mod.forward(
                params, jnp.stack((x0, x2), axis=1).reshape((2 * B,) + x0.shape[1:])
            )
            cc = cc.reshape((B, 2) + cc.shape[1:])
            c0, c2 = cc[:, 0], cc[:, 1]
            # split API: frame + context warp in ONE kernel pass without the
            # channel concat / output slices (r5; ~3 ms/warp of the 720p step)
            w0, ctx0 = filter_interp_warp_split((x0, c0), offs[0], filters[0], filter_size=fs)
            w1, ctx1 = filter_interp_warp_split((x2, c2), offs[1], filters[1], filter_size=fs)
            ctxs = (jax.lax.stop_gradient(ctx0), jax.lax.stop_gradient(ctx1))
        else:
            w0 = filter_interp_warp(x0, offs[0], filters[0], filter_size=fs)
            w1 = filter_interp_warp(x2, offs[1], filters[1], filter_size=fs)
            ctxs = None
        blended = self._blend(w0, w1, occs)
        rectified = self._rectify(params, blended, offs, filters, occs, ctxs)
        return (blended, rectified), offs, filters, occs

    def train_residuals(self, params, x0, x1, x2):
        """Training-mode loss residuals (MEMC_Net.py:132-137):
        [interp - gt, rectified - gt].  The trailing element is the dict of
        BatchNorm running-stat updates (empty for BN-free models)."""
        bn_updates = {}
        (blended, rectified), offs, filters, occs = self.forward(
            params, x0, x2, training=True, bn_updates=bn_updates)
        return [blended - x1, rectified - x1], offs, filters, occs, bn_updates


class MEMCNetStar(MEMCNet):
    """MEMC-Net*: + ResNet-conv1 contexts (warped, detached) and EDSR rectifier
    (MEMC_Net_star.py:35,127-148,272-285); xavier init (:64); MonoNet pool/unpool
    blocks carry no BatchNorm (:313-345)."""

    name = "MEMC_Net_star"
    with_bn = False
    init_fn = staticmethod(I.xavier_uniform)
    has_ctx = True

    def __init__(self, filter_size=4, channel=3):
        super().__init__(filter_size, channel)
        fs2 = filter_size * filter_size
        self.rectify_in = 3 + 2 * 2 + 2 * fs2 + 64 * 2 + 1 * 2  # MEMC_Net_star.py:35

    def _init_rectify(self, key, dtype):
        return edsr.init_params(key, self.rectify_in, n_resblocks=10, n_feats=128,
                                init_fn=self.init_fn, dtype=dtype)

    def _rectify(self, params, blended, offs, filters, occs, ctxs):
        # MEMC_Net_star.py:142-147 channel order; the concat itself is never
        # materialized — the EDSR head conv runs per piece (edsr.forward_pieces)
        pieces = (blended, offs[0], offs[1], filters[0], filters[1],
                  occs[0], occs[1], ctxs[0], ctxs[1])
        return blended + edsr.forward_pieces(params, pieces, n_resblocks=10)


class MEMCNetS(MEMCNet):
    """Small variant: SPyNet flow at full res (div_flow=1, /2 — MEMC_Net_s.py:147-156),
    thin single MonoNet5, no occlusion net (plain average blend :260-266,
    pseudo-occlusions from filter branch-0 channel 0 :111-114)."""

    name = "MEMC_Net_s"
    variant = "thin"
    with_bn = True
    has_occlusion_net = False

    def _init_flow(self, key, dtype):
        return spynet.init_params(key, dtype=dtype)

    def _flows(self, params, x0, x2, fillhole):
        # direction axis interleaved sample-major (see MEMCNet._flows)
        B = x0.shape[0]
        first = jnp.stack((x0, x2), axis=1).reshape((2 * B,) + x0.shape[1:])
        second = jnp.stack((x2, x0), axis=1).reshape((2 * B,) + x0.shape[1:])
        f = spynet.forward(params, first, second) / 2.0
        off = flow_project(f, fillhole=fillhole)
        off = off.reshape((B, 2) + off.shape[1:])
        return off[:, 0], off[:, 1]

    def _occlusions(self, params, pair, filters):
        o = filters[0][:, :1]
        return o, o  # MEMC_Net_s.py:111-114

    def _filters_and_occlusions(self, params, pair, training=False, bn_updates=None):
        # single (thin) trunk; the two filter branches still pair up
        t = forward_single_path(params, "initScaleNets_filter", self.trunk_specs, pair,
                                training=training, bn_updates=bn_updates)
        filters = forward_dual_path(
            params, "initScaleNets_filter1", "initScaleNets_filter2", self.filter_branch_specs, t
        )
        return filters, self._occlusions(params, pair, filters)

    def _blend(self, warped0, warped1, occ):
        return warped0 / 2.0 + warped1 / 2.0  # MEMC_Net_s.py:264

