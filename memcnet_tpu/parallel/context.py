"""Spatial-tiling dispatch context.

The reference is single-GPU, so its ops never see sharded inputs; here the
warp/projection ops are the only parts of the model whose *data-dependent*
gathers/scatters GSPMD cannot partition without whole-frame collectives
(reshaping the W-sharded (B,C,H,W) into (B,C,H*W) forces an all-to-all /
all-gather reshard).  Entering ``spatial_tiling(mesh)`` while *tracing* a
jitted model makes ``filter_interp_warp`` / ``flow_project`` dispatch to the
explicit shard_map halo-exchange implementations in
``memcnet_tpu.parallel.tiling`` — which communicate only O(halo) boundary
bands over ICI ``ppermute`` — instead of the global XLA formulations.

Usage (see __graft_entry__.dryrun_multichip for the canonical sharded step)::

    mesh = make_mesh(8)                     # (data, tile)
    with spatial_tiling(mesh, halo=16):
        out = jax.jit(step, in_shardings=..., ...)(params, ...)

The context is consulted at *trace time* (ops are plain functions, not
jit-cached), so the same model code serves both the single-chip and the
sharded program.
"""

import threading
from contextlib import contextmanager
from dataclasses import dataclass

import jax


@dataclass(frozen=True)
class TilingContext:
    mesh: "jax.sharding.Mesh"
    axis: str = "tile"          # mesh axis sharding the W pixel dimension
    batch_axis: str = "data"    # mesh axis sharding the batch dimension
    halo: int = 64              # columns exchanged with ring neighbors
    axis_h: str = None          # optional mesh axis sharding the H dimension
    halo_h: int = None          # rows exchanged (defaults to `halo`)


_state = threading.local()


def active_tiling():
    """The innermost active TilingContext, or None."""
    return getattr(_state, "ctx", None)


@contextmanager
def spatial_tiling(mesh, *, axis="tile", batch_axis="data", halo=64,
                   axis_h=None, halo_h=None):
    """Dispatch warp/projection ops to the shard_map tiled implementations
    while tracing under this context (SP analogue, SURVEY.md section 2.4).
    Pass ``axis_h`` for a 2-D (tile_h, tile_w) spatial grid."""
    prev = active_tiling()
    _state.ctx = TilingContext(mesh, axis, batch_axis, halo, axis_h, halo_h)
    try:
        yield _state.ctx
    finally:
        _state.ctx = prev
