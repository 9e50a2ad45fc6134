"""Weight initializers reproducing the reference's torch init distributions.

  * kaiming_uniform(a=0, mode='fan_in'): MEMC_Net / _s / _VE convs
    (MEMC_Net.py:56) — bound = sqrt(3) * sqrt(2 / fan_in).
  * xavier_uniform: MEMC_Net_star convs (MEMC_Net_star.py:64) —
    bound = sqrt(6 / (fan_in + fan_out)).
  * normal(0, 0.02/n), n = kh*kw*out_ch: FlowNetS convs (FlowNetS.py:67-72).
  * resnet_msra: normal(0, sqrt(2/n)): ResNet conv1 (Resnet_conv1.py:233-236).
  * BatchNorm: weight=1, bias=0; biases zero everywhere.
"""

import math

import jax
import jax.numpy as jnp


def _fans(shape):
    # conv OIHW: fan_in = I*kh*kw, fan_out = O*kh*kw
    o, i, kh, kw = shape
    rf = kh * kw
    return i * rf, o * rf


def kaiming_uniform(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    gain = math.sqrt(2.0)
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def flownets_normal(key, shape, dtype=jnp.float32):
    # shape OIHW (conv) or IOHW (conv-transpose); n = kh*kw*out_channels
    if len(shape) == 4:
        kh, kw = shape[2], shape[3]
    else:
        raise ValueError(shape)
    out_ch = shape[0]
    n = kh * kw * out_ch
    return jax.random.normal(key, shape, dtype) * (0.02 / n)


def flownets_normal_iohw(key, shape, dtype=jnp.float32):
    kh, kw = shape[2], shape[3]
    out_ch = shape[1]
    n = kh * kw * out_ch
    return jax.random.normal(key, shape, dtype) * (0.02 / n)


def resnet_msra(key, shape, dtype=jnp.float32):
    o, i, kh, kw = shape
    n = kh * kw * o
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)
