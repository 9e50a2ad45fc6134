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
import jax.numpy as jnp
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


def make_mesh_2d(n_devices=None, *, tile_h=2, tile_w=2, devices=None):
    """(data, tile_h, tile) mesh for 2-D spatial tiling (SURVEY.md section
    2.4's planned (tile_h, tile_w) axes).  720p frames are wider than tall,
    so W-only tiling caps spatial scale-out at ~4 shards; an 8-chip spatial
    config needs H x W."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (tile_h * tile_w) == 0, (n, tile_h, tile_w)
    data = n // (tile_h * tile_w)
    return jax.make_mesh(
        (data, tile_h, tile_w), ("data", "tile_h", "tile"), devices=devices,
        axis_types=(AxisType.Auto,) * 3,
    )


def frame_sharding_2d(mesh):
    """(B, C, H, W): batch over data, height over tile_h, width over tile."""
    return NamedSharding(mesh, P("data", None, "tile_h", "tile"))


def frame_sharding(mesh):
    """(B, C, H, W): batch over data, width over tile."""
    return NamedSharding(mesh, P("data", None, None, "tile"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_frames(mesh, *arrays):
    s = frame_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def _zero1_leaf_sharding(mesh, shape):
    """Shard the largest dim divisible by the whole mesh; replicate others."""
    n = mesh.size
    axes = tuple(mesh.axis_names)
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % n == 0 and shape[d] >= n:
            spec = [None] * len(shape)
            spec[d] = axes
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def zero1_sharding(mesh, tree):
    """ZeRO-1 shardings for an optimizer-state (or grads) pytree: each
    param-shaped leaf is 1D-sharded over ALL mesh devices on its largest
    evenly-divisible dim; scalars/indivisible leaves replicate.

    With opt-state placed this way (and the train step jitted with matching
    in/out shardings), GSPMD turns the optimizer update into
    reduce-scatter(grads) -> per-shard update -> all-gather(params): the
    update math and the first/second-moment memory drop by mesh.size.  On a
    TPU slice this is the standard optimizer-state sharding recipe; on the
    8-virtual-device CPU dryrun it removes ~8x replicated Adamax work (which
    dominated wall time: ~7.7 s/device for the 70M-param flagship)."""
    return jax.tree.map(
        lambda leaf: _zero1_leaf_sharding(mesh, jnp.shape(leaf)), tree
    )


def mesh_barrier(mesh):
    """Run one trivial psum over every mesh axis and block on it.

    Aligns all participants' executor threads through a first, cheap
    rendezvous before a heavy SPMD program runs: on oversubscribed CPU hosts
    (N virtual devices >> cores) the skew between devices reaching the first
    collective inside a long program otherwise eats into XLA's hard 40 s CPU
    rendezvous deadline."""
    from functools import partial

    from jax import shard_map

    names = tuple(mesh.axis_names)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(names), out_specs=P())
    def _psum(x):
        y = jnp.sum(x)
        for n in names:
            y = jax.lax.psum(y, n)
        return y

    x = jnp.arange(mesh.size, dtype=jnp.float32)
    return float(jax.block_until_ready(_psum(x)))
