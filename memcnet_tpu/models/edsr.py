"""EDSR rectifier backbone (networks/EDSR/EDSR.py:8-52, common.py:24-43).

Head conv -> n_resblocks ResBlocks (no BN, conv-relu-conv + skip) -> body tail
conv -> final conv to 3 channels.  NOTE: the global residual is commented out
in the reference (`# res += x`, EDSR.py:47) — reproduced here.
Keys: head.0.*, body.{i}.body.{0,2}.*, body.{n}.* (tail conv of the body
Sequential), tail.0.*.
"""

import jax.numpy as jnp
import jax.random as jr

from memcnet_tpu.nn import layers as L
from memcnet_tpu.nn import init as I


def init_params(key, n_colors, n_resblocks=10, n_feats=128, prefix="rectifyNet",
                init_fn=I.kaiming_uniform, dtype=jnp.float32):
    p = {}

    def conv(k1, name, cin, cout):
        p[f"{prefix}.{name}.weight"] = init_fn(k1, (cout, cin, 3, 3), dtype)
        p[f"{prefix}.{name}.bias"] = jnp.zeros((cout,), dtype)

    key, k1 = jr.split(key)
    conv(k1, "head.0", n_colors, n_feats)
    for i in range(n_resblocks):
        key, k1, k2 = jr.split(key, 3)
        conv(k1, f"body.{i}.body.0", n_feats, n_feats)
        conv(k2, f"body.{i}.body.2", n_feats, n_feats)
    key, k1 = jr.split(key)
    conv(k1, f"body.{n_resblocks}", n_feats, n_feats)
    key, k1 = jr.split(key)
    conv(k1, "tail.0", n_feats, 3)
    return p


def forward(params, x, n_resblocks=10, prefix="rectifyNet"):
    h = L.p_conv(params, f"{prefix}.head.0", x, padding=1)
    res = h
    for i in range(n_resblocks):
        r = L.p_conv(params, f"{prefix}.body.{i}.body.0", res, padding=1)
        r = L.relu(r)
        r = L.p_conv(params, f"{prefix}.body.{i}.body.2", r, padding=1)
        res = res + r  # ResBlock skip (common.py:39-43, res_scale=1)
    res = L.p_conv(params, f"{prefix}.body.{n_resblocks}", res, padding=1)
    # no global residual: EDSR.py:47 `# res += x`
    return L.p_conv(params, f"{prefix}.tail.0", res, padding=1)
