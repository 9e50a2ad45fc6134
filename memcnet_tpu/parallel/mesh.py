"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md section 2.4); distribution is a
new first-class subsystem here.  Axes:

  * ``data`` — DP/GOP parallelism: frame pairs (interpolation) or 7-frame
    windows (enhancement) sharded across chips.
  * ``tile`` — the SP analogue for video CNNs: the W pixel axis sharded across
    chips. Convolutions are spatially partitioned by XLA's SPMD partitioner
    (automatic internal halo exchange over ICI); the warp ops' data-dependent
    gathers/scatters resolve through collective-permute/all-gather emitted by
    GSPMD, with the explicit shard_map halo-exchange path in
    memcnet_tpu.parallel.tiling as the tuned alternative.

Factory ``make_mesh(n)`` factorizes n chips into (data, tile) with tile
capped so each W shard stays >= 64 px (the FlowNetS downsampling footprint).
"""

import math

import jax
from jax.sharding import AxisType, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, *, max_tile=4, devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    tile = math.gcd(n, max_tile)
    data = n // tile
    # Auto axis types: classic GSPMD propagation (handles convs' internal halo
    # exchange and non-divisible dims), vs jax-0.9's default Explicit mode
    # which rejects data-dependent gathers on sharded axes.
    return jax.make_mesh(
        (data, tile), ("data", "tile"), devices=devices,
        axis_types=(AxisType.Auto, AxisType.Auto),
    )


def frame_sharding(mesh):
    """(B, C, H, W): batch over data, width over tile."""
    return NamedSharding(mesh, P("data", None, None, "tile"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_frames(mesh, *arrays):
    s = frame_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out
