"""MEMC_Net_VE: 7-frame video-enhancement model (networks/MEMC_Net_VE.py:129-290).

The 6 (center, neighbor) pairs are batched into ONE FlowNetS call and ONE
MonoNet5 filter call (:193-199); each neighbor (and its ResNet-conv1 context,
detached :474) is filter-interpolation-warped toward the center; the center
frame passes through.  The EDSR rectifier consumes 577 channels —
cat(7 ctx(64), 6 flows(2), 6 filters(16), 7 frames(3)) in that order
(:241-256) — and adds a residual on the center frame (:260).

Flow scaling differs from the interpolation models: flow = div_flow * out with
NO /2 (:292-296) since the warp target is the full neighbor offset.
"""

import jax
import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.models import ctx as ctx_mod
from memcnet_tpu.models import edsr, flownets
from memcnet_tpu.models.mononet import (
    branch_specs,
    forward_single_path,
    init_specs,
    mononet5_specs,
)
from memcnet_tpu.nn import init as I
from memcnet_tpu.nn.layers import upsample_bilinear
from memcnet_tpu.ops.warp import filter_interp_warp_split

DIV_FLOW = 20.0


class MEMCNetVE:
    name = "MEMC_Net_VE"

    def __init__(self, filter_size=4, channel=3):
        self.filter_size = filter_size
        self.channel = channel
        fs2 = filter_size * filter_size
        self.trunk_specs = mononet5_specs(channel, "full", with_bn=True)
        self.filter_branch_specs = branch_specs(fs2)
        self.rectify_in = 3 * 7 + 64 * 7 + 2 * 6 + fs2 * 6  # MEMC_Net_VE.py:77

    def init_params(self, key, dtype=jnp.float32):
        ks = jr.split(key, 5)
        p = {}
        p.update(init_specs(ks[0], self.trunk_specs, "initScaleNets_filter", I.kaiming_uniform, dtype))
        p.update(init_specs(ks[1], self.filter_branch_specs, "initScaleNets_filter1", I.kaiming_uniform, dtype))
        p.update(edsr.init_params(ks[2], self.rectify_in, n_resblocks=10, n_feats=128,
                                  init_fn=I.kaiming_uniform, dtype=dtype))
        p.update(flownets.init_params(ks[3], dtype=dtype))
        p.update(ctx_mod.init_params(ks[4], dtype=dtype))
        return p

    def forward(self, params, frames, *, training=False, debug=False,
                bn_updates=None):
        """frames: list of 7 arrays (B, 3, H, W); H, W multiples of 128.
        Returns the rectified center frame (B,3,H,W); with debug=True also
        (flow, filter) as in MEMC_Net_VE.py:287-290."""
        assert len(frames) == 7
        B = frames[0].shape[0]
        center = frames[3]
        neighbors = [frames[i] for i in (0, 1, 2, 4, 5, 6)]

        # Neighbor axis interleaved sample-major (B, 6, ...): each sample's 6
        # pairs stay on its DP shard, so the per-neighbor slices below are
        # local views instead of batch-axis reshards under GSPMD (same fix as
        # MEMCNet._flows; per-sample results are order-independent).
        pairs = jnp.stack(
            [jnp.concatenate((center, n), axis=1) for n in neighbors], axis=1
        ).reshape((6 * B, 6) + center.shape[2:])
        flow = upsample_bilinear(flownets.forward(params, pairs) * DIV_FLOW, 4)  # :292-296

        t = forward_single_path(params, "initScaleNets_filter", self.trunk_specs, pairs,
                                training=training, bn_updates=bn_updates)
        filt = forward_single_path(params, "initScaleNets_filter1", self.filter_branch_specs, t)

        fs = self.filter_size
        # ONE ctx call for all 7 frames (small-C conv is per-op-overhead
        # bound); the 6 warps stay separate B-sized calls — batching them
        # into one 6B gather measured SLOWER (63 vs 49 ms/window on v5e: the
        # extra batch index dimension raises the per-descriptor gather cost).
        neigh = jnp.stack(neighbors, axis=1).reshape((6 * B,) + center.shape[1:])
        ctx_all = ctx_mod.forward(params, jnp.concatenate([neigh, center], axis=0))
        ctx_n, ctx_c = ctx_all[: 6 * B], ctx_all[6 * B :]

        def nb(x, k):  # neighbor k of the sample-major (B, 6, ...) layout
            return x.reshape((B, 6) + x.shape[1:])[:, k]

        # ONE 6B-batched warp: the Pallas band kernel's grid scales linearly
        # with batch (unlike the old XLA gather, whose per-descriptor cost
        # rose with a batch dim — the r3 measurement that kept these split).
        # r5: the split API warps frame + context without the channel concat
        # or output slicing.
        w_all, cw_all = filter_interp_warp_split(
            (neigh, ctx_n), flow, filt, filter_size=fs)
        warped = []
        ctx_warped = []
        for k in range(6):
            warped.append(nb(w_all, k))
            ctx_warped.append(jax.lax.stop_gradient(nb(cw_all, k)))  # :474

        # re-interleave into temporal order with the center passthrough (:208-239)
        outs = warped[:3] + [center] + warped[3:]
        ctxs = ctx_warped[:3] + [ctx_c] + ctx_warped[3:]

        flows6 = [nb(flow, k) for k in range(6)]
        filts6 = [nb(filt, k) for k in range(6)]
        # :241-256 channel order; the 577-ch concat is never materialized —
        # the EDSR head conv runs per piece (edsr.forward_pieces)
        rectified = center + edsr.forward_pieces(
            params, ctxs + flows6 + filts6 + outs, n_resblocks=10)  # :260

        if training:
            return outs, rectified
        if debug:
            return rectified, flow, filt
        return rectified

    def train_residuals(self, params, frames, y):
        """MEMC_Net_VE.py:270-275: per-neighbor warped-vs-target residuals plus
        the rectified-vs-target residual in the center slot.  Returns
        (losses, bn_updates)."""
        bn_updates = {}
        outs, rectified = self.forward(
            params, frames, training=True, bn_updates=bn_updates)
        losses = []
        for i in range(7):
            losses.append((rectified if i == 3 else outs[i]) - y)
        return losses, bn_updates
