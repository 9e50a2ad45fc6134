"""MonoNet5 U-Net trunk + branches and RectifyNet, as static layer specs.

The reference builds these as flat nn.ModuleLists and wires the U-Net skips by
walking the list with a stack — push the tensor entering each MaxPool, add the
popped tensor after each Upsample (MEMC_Net.py:154-178,180-250).  Here the
same topology is expressed as a *static spec list* interpreted by a small
functional walker; parameter keys reproduce the reference's flat ModuleList
state-dict indices exactly (e.g. "initScaleNets_filter.12.running_mean"), so
the .pth importer is a name-for-name copy.

Variants (all cited in SURVEY.md section 2.2):
  * full, with BatchNorm: MEMC_Net (MEMC_Net.py:180-238) and MEMC_Net_VE
    (MEMC_Net_VE.py:349-425).
  * full, no BatchNorm in pool/unpool blocks: MEMC_Net_star
    (MEMC_Net_star.py:204-262, conv_relu_maxpool :313-327 has BN commented).
  * thin (one conv per block): MEMC_Net_s (MEMC_Net_s.py:192-239).
"""

import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.nn import layers as L
from memcnet_tpu.nn import init as I
from memcnet_tpu.ops.pallas import conv_kernel as CK


def _conv_maybe_fast(cur, w, b, fuse_relu):
    """MEASURED NEGATIVE (r5): routing the MonoNet walk's small-C convs
    through the Pallas band conv does NOT help in-model (C<=64 gate: 126.9 ms
    vs 126.5 baseline; C<=32: 142.3 — partial routing breaks XLA's cross-op
    layout choices and adds per-conv NCHW<->(H,C,W) prep).  The dual-walk
    block-diagonal convs already sit at ~20-25% MXU in XLA's fused layouts,
    unlike SPyNet's 7x7 stacks at ~4-12% where the same kernel wins 34 ms
    (models/spynet.py).  Kept as the dispatch point with the kernel disabled;
    flip MEMCNET_MONONET_PALLAS=1 to re-measure."""
    import os

    if (os.environ.get("MEMCNET_MONONET_PALLAS")
            and CK.use_fast_conv(cur) and w.shape[1] <= 64 and w.shape[2] == 3):
        return CK.conv2d_small_op(cur, w, b, relu=fuse_relu), fuse_relu
    return L.conv2d(cur, w, b, stride=1, padding=1), False


def _blocks_to_specs(blocks, with_bn):
    """blocks: list of ('c', cin, cout) | ('cp', cin, cout) | ('cu', cin, cout)
    | ('uc', cin, cout).  'cu' is conv-relu[-bn]-upsample (MEMC_Net.py:308-321);
    'uc' is the MEMC_Net_s ordering upsample-conv-relu-bn (MEMC_Net_s.py:312-325),
    where the skip-add lands *before* the conv.  Returns flat spec list
    [(kind, flat_idx, meta)] mirroring ModuleList order."""
    specs = []
    i = 0
    for kind, cin, cout in blocks:
        if kind == "uc":
            specs.append(("upsample", i, None)); i += 1
        specs.append(("conv", i, (cin, cout))); i += 1
        specs.append(("relu", i, None)); i += 1
        if kind in ("cp", "cu", "uc"):
            if with_bn:
                specs.append(("bn", i, cout)); i += 1
            if kind == "cp":
                specs.append(("maxpool", i, None)); i += 1
            elif kind == "cu":
                specs.append(("upsample", i, None)); i += 1
    return specs


def mononet5_specs(channel_in, variant="full", with_bn=True):
    """Trunk specs. channel_in is the *per-frame* channel count; the first conv
    consumes channel_in * 2 (two stacked frames), as in get_MonoNet5."""
    c2 = channel_in * 2
    if variant == "full":
        blocks = [
            ("c", c2, 32), ("c", 32, 32), ("cp", 32, 32),
            ("c", 32, 64), ("cp", 64, 64),
            ("c", 64, 128), ("cp", 128, 128),
            ("c", 128, 256), ("cp", 256, 256),
            ("c", 256, 512), ("cp", 512, 512),
            ("c", 512, 512), ("c", 512, 512),
            ("cu", 512, 512), ("c", 512, 256),
            ("cu", 256, 256), ("c", 256, 128),
            ("cu", 128, 128), ("c", 128, 64),
            ("cu", 64, 64), ("c", 64, 32),
            ("cu", 32, 32), ("c", 32, 16),
        ]
    elif variant == "thin":  # MEMC_Net_s.py:192-239
        blocks = [
            ("c", c2, 16), ("cp", 16, 32),
            ("cp", 32, 64),
            ("cp", 64, 128),
            ("cp", 128, 256),
            ("cp", 256, 512),
            ("c", 512, 512),
            ("uc", 512, 256),
            ("uc", 256, 128),
            ("uc", 128, 64),
            ("uc", 64, 32),
            ("uc", 32, 16),
        ]
    else:
        raise ValueError(variant)
    return _blocks_to_specs(blocks, with_bn)


def branch_specs(channel_out):
    """conv_relu_conv branch: Conv(16,16) / ReLU / Conv(16,out)."""
    return [("conv", 0, (16, 16)), ("relu", 1, None), ("conv", 2, (16, channel_out))]


def rectify_specs(channel_in):
    """get_RectifyNet2 (MEMC_Net.py:240-250): 7x conv_relu(->64) + final conv to 3."""
    blocks = [("c", channel_in, 64)] + [("c", 64, 64)] * 6
    specs = _blocks_to_specs(blocks, with_bn=False)
    i = specs[-1][1] + 1
    specs.append(("conv", i, (64, 3)))
    return specs


def init_specs(key, specs, prefix, init_fn=I.kaiming_uniform, dtype=jnp.float32):
    params = {}
    for kind, idx, meta in specs:
        if kind == "conv":
            cin, cout = meta
            key, k1 = jr.split(key)
            params[f"{prefix}.{idx}.weight"] = init_fn(k1, (cout, cin, 3, 3), dtype)
            params[f"{prefix}.{idx}.bias"] = jnp.zeros((cout,), dtype)
        elif kind == "bn":
            ch = meta
            params[f"{prefix}.{idx}.weight"] = jnp.ones((ch,), dtype)
            params[f"{prefix}.{idx}.bias"] = jnp.zeros((ch,), dtype)
            params[f"{prefix}.{idx}.running_mean"] = jnp.zeros((ch,), dtype)
            params[f"{prefix}.{idx}.running_var"] = jnp.ones((ch,), dtype)
    return params


def forward_dual_path(params, prefix_a, prefix_b, specs, x,
                      training=False, bn_updates=None):
    """Two identical-spec networks on the SAME input as one grouped walk.

    The filter and occlusion MonoNets (and the paired conv_relu_conv
    branches) share their architecture and input, so each pair of convs runs
    as ONE feature_group_count=2 convolution — same arithmetic, half the op
    count.  This matters on TPU because MonoNet's small convs are per-op
    overhead-bound (~0.5-1 ms each at 720p regardless of FLOPs; measured
    v5e), so two 25-op walks cost ~45 ms while one grouped walk costs ~25.
    Returns (out_a, out_b).
    """
    stack = []
    cur = jnp.concatenate([x, x], axis=1)
    relu_done = False
    for si, (kind, idx, meta) in enumerate(specs):
        if kind == "conv":
            wa = params[f"{prefix_a}.{idx}.weight"]
            wb = params[f"{prefix_b}.{idx}.weight"]
            O, Ci = wa.shape[0], wa.shape[1]
            # BLOCK-DIAGONAL dense weights, NOT feature_group_count=2: XLA
            # TPU's grouped conv is pathological here (+150 ms over separate
            # convs at 720p; measured v5e), while the dense zeros are free —
            # these channel counts pad to the 128-lane MXU tile anyway.
            w = jnp.zeros((2 * O, 2 * Ci) + wa.shape[2:], wa.dtype)
            w = w.at[:O, :Ci].set(wa).at[O:, Ci:].set(wb)
            b = jnp.concatenate(
                [params[f"{prefix_a}.{idx}.bias"], params[f"{prefix_b}.{idx}.bias"]], axis=0
            )
            fuse = si + 1 < len(specs) and specs[si + 1][0] == "relu"
            cur, relu_done = _conv_maybe_fast(cur, w, b, fuse)
        elif kind == "relu":
            if not relu_done:
                cur = L.relu(cur)
            relu_done = False
        elif kind == "bn":
            g, bb, m, v = (
                jnp.concatenate(
                    [params[f"{prefix_a}.{idx}.{n}"], params[f"{prefix_b}.{idx}.{n}"]], axis=0
                )
                for n in ("weight", "bias", "running_mean", "running_var")
            )
            if training:
                # Per-channel batch stats over the concatenated channels are
                # exactly the two nets' separate stats (channels independent).
                cur, nm, nv = L.batch_norm_train(cur, g, bb, m, v)
                if bn_updates is not None:
                    h = nm.shape[0] // 2
                    bn_updates[f"{prefix_a}.{idx}.running_mean"] = nm[:h]
                    bn_updates[f"{prefix_b}.{idx}.running_mean"] = nm[h:]
                    bn_updates[f"{prefix_a}.{idx}.running_var"] = nv[:h]
                    bn_updates[f"{prefix_b}.{idx}.running_var"] = nv[h:]
            else:
                cur = L.batch_norm_eval(cur, g, bb, m, v)
        elif kind == "maxpool":
            stack.append(cur)
            cur = L.max_pool2d(cur, 2)
        elif kind == "upsample":
            cur = L.upsample_bilinear(cur, 2) + stack.pop()
        else:
            raise ValueError(kind)
    assert not stack
    half = cur.shape[1] // 2
    return cur[:, :half], cur[:, half:]


def forward_single_path(params, prefix, specs, x, training=False, bn_updates=None):
    """The stack-walk of MEMC_Net.forward_singlePath (MEMC_Net.py:154-178):
    push the tensor entering each pool, add the popped one after each
    upsample. (The 'offset' concat mode is dead in shipped models — every
    call site passes 'filter'/'occlusion'/None.)

    With ``training=True``, BatchNorm layers use batch statistics
    (nn.BatchNorm2d train mode) and, if ``bn_updates`` is a dict, record
    their updated running stats into it keyed by parameter name."""
    stack = []
    cur = x
    relu_done = False
    for si, (kind, idx, _meta) in enumerate(specs):
        if kind == "conv":
            fuse = si + 1 < len(specs) and specs[si + 1][0] == "relu"
            cur, relu_done = _conv_maybe_fast(
                cur, params[f"{prefix}.{idx}.weight"],
                params.get(f"{prefix}.{idx}.bias"), fuse)
        elif kind == "relu":
            if not relu_done:
                cur = L.relu(cur)
            relu_done = False
        elif kind == "bn":
            if training:
                cur, nm, nv = L.batch_norm_train(
                    cur, params[f"{prefix}.{idx}.weight"],
                    params[f"{prefix}.{idx}.bias"],
                    params[f"{prefix}.{idx}.running_mean"],
                    params[f"{prefix}.{idx}.running_var"])
                if bn_updates is not None:
                    bn_updates[f"{prefix}.{idx}.running_mean"] = nm
                    bn_updates[f"{prefix}.{idx}.running_var"] = nv
            else:
                cur = L.p_bn(params, f"{prefix}.{idx}", cur)
        elif kind == "maxpool":
            stack.append(cur)
            cur = L.max_pool2d(cur, 2)
        elif kind == "upsample":
            cur = L.upsample_bilinear(cur, 2) + stack.pop()
        else:
            raise ValueError(kind)
    assert not stack
    return cur
