"""Pallas TPU kernel for the flow-projection hole fill.

The XLA formulation (ops/projection._directional_fill) lowers its three
masked associative scans to ~200 sliced/padded combine rounds over whole
(B, 2, H, W) planes — ~7 ms of the 720p step (r4 trace: 3.5 ms slice +
3.1 ms pad inside _global_flow_project).  Here the same scans run in VMEM:

  * grid = (B, H/TH) row bands, top to bottom.
  * left/right searches: lane-axis log-doubling scans (roll + iota mask),
    11 rounds at W=1408 — all on (TH, Wp) vregs.
  * up search: 3 sublane log-doubling rounds inside the band, then a carry
    row merged from the previous band (scratch persists across grid steps;
    reset at each batch element's first band).  The reference's dead
    down-scan (my_lib_kernel.cu:1799) is reproduced by not computing it;
    the opt-in fixed down-scan stays on the XLA path.

Semantics identical to _directional_fill(avg, cnt, fix_down_scan_bug=False):
holes (count == 0) take the average of the nearest projected value to the
left, right, and above (inclusive scans; a hole's own contribution is
vacuous since has=False there).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memcnet_tpu.ops.pallas.scatter_kernel import _ceil_to

TH = 8


def _shift_scan(h, vx, vy, s, axis, size, reverse=False):
    """One log-doubling combine round: merge state shifted by +s (or -s when
    reverse) along `axis`; out-of-range contributions are masked.  `h` is a
    0/1 f32 mask (tpu roll is 32-bit only, so no bool rolls)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, axis)
    if reverse:
        ok = idx < size - s
        amt = size - s
    else:
        ok = idx >= s
        amt = s
    hs = jnp.where(ok, pltpu.roll(h, amt, axis=axis), 0.0)
    vxs = pltpu.roll(vx, amt, axis=axis)
    vys = pltpu.roll(vy, amt, axis=axis)
    have = h > 0.0
    vx = jnp.where(have, vx, vxs)
    vy = jnp.where(have, vy, vys)
    h = jnp.maximum(h, hs)
    return h, vx, vy


def _fill_kernel(nb, Wp, avg_ref, cnt_ref, out_ref, carry_ref):
    band = pl.program_id(1)

    # f32 compare: Mosaic has no bf16 comparison on this target
    has = cnt_ref[0].astype(jnp.float32) > 0.0  # (TH, Wp)
    hf = has.astype(jnp.float32)
    vx = avg_ref[0, 0].astype(jnp.float32)
    vy = avg_ref[0, 1].astype(jnp.float32)
    zx = jnp.where(has, vx, 0.0)
    zy = jnp.where(has, vy, 0.0)

    # left search: nearest valid at-or-left of each lane
    hl, vxl, vyl = hf, zx, zy
    s = 1
    while s < Wp:
        hl, vxl, vyl = _shift_scan(hl, vxl, vyl, s, 1, Wp)
        s *= 2
    # right search
    hr, vxr, vyr = hf, zx, zy
    s = 1
    while s < Wp:
        hr, vxr, vyr = _shift_scan(hr, vxr, vyr, s, 1, Wp, reverse=True)
        s *= 2
    # up search: in-band sublane scan, then the carry from the bands above
    hu, vxu, vyu = hf, zx, zy
    s = 1
    while s < TH:
        hu, vxu, vyu = _shift_scan(hu, vxu, vyu, s, 0, TH)
        s *= 2

    @pl.when(band == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    cvx = carry_ref[1]
    cvy = carry_ref[2]
    haveu = hu > 0.0
    vxu = jnp.where(haveu, vxu, cvx[None])
    vyu = jnp.where(haveu, vyu, cvy[None])
    hu = jnp.maximum(hu, carry_ref[0][None])
    carry_ref[0] = hu[TH - 1]
    carry_ref[1] = vxu[TH - 1]
    carry_ref[2] = vyu[TH - 1]

    num_x = jnp.zeros_like(vx)
    num_y = jnp.zeros_like(vy)
    den = jnp.zeros_like(vx)
    for hd, vxd, vyd in ((hl, vxl, vyl), (hr, vxr, vyr), (hu, vxu, vyu)):
        w = jnp.minimum(hd, 1.0)
        num_x = num_x + vxd * w
        num_y = num_y + vyd * w
        den = den + w
    hole = jnp.logical_and(jnp.logical_not(has), den > 0.0)
    safe = jnp.where(den > 0.0, den, 1.0)
    fx = jnp.where(hole, num_x / safe, vx)
    fy = jnp.where(hole, num_y / safe, vy)
    out_ref[0, 0] = fx.astype(out_ref.dtype)
    out_ref[0, 1] = fy.astype(out_ref.dtype)


def fill_holes(avg, cnt, *, interpret=False):
    """Pallas hole fill; equals _directional_fill(avg, cnt, False).

    avg: (B, 2, H, W); cnt: (B, H, W).  Returns (B, 2, H, W) in avg dtype.
    """
    B, K, H, W = avg.shape
    assert K == 2, avg.shape
    Wp = _ceil_to(W, 128)
    Hp = _ceil_to(H, TH)
    nb = Hp // TH
    avg_p = jnp.pad(avg, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    cnt_p = jnp.pad(cnt, ((0, 0), (0, Hp - H), (0, Wp - W)))  # pads: has=False

    out = pl.pallas_call(
        lambda a, c, o, carry: _fill_kernel(nb, Wp, a, c, o, carry),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, K, TH, Wp), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wp), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, TH, Wp), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, Hp, Wp), avg.dtype),
        scratch_shapes=[pltpu.VMEM((3, Wp), jnp.float32)],
        interpret=interpret,
    )(avg_p, cnt_p)
    return out[:, :, :H, :W]
