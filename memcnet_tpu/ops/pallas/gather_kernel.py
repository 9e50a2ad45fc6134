"""Pallas TPU band-gather kernel: the small-channel dual of scatter_kernel.

The window kernel (warp_kernel.py) puts channels on the 128-lane dimension —
right for the model's merged C=67 warps, but a C=3 warp (SPyNet grid_sample,
bilinear image warps) wastes 42x of every tap FMA on lane padding.  This
kernel keeps W on the lanes instead and processes the output in (TH=8, W)
row bands, exploiting the same smooth-flow structure as the scatter kernel:

  * Per output band, the occupied integer offset rectangle
    [dy_lo..dy_hi] x [dx_lo..dx_hi] over valid pixels is tiny
    (plan_bands, shared with scatter_kernel).
  * The source rows a band reads live in a window of R rows anchored at the
    TH-ALIGNED row 8*(i + q), q = floor(dy_lo/8) — so the HBM->VMEM window
    DMA has a legal (8-aligned) dynamic sublane start, no roll-residue
    arithmetic needed on the copy.
  * Per occupied offset bucket (dyk, dxk): two rolls align the window so
    tap (j, i) becomes a STATIC slice; fs^2 masked FMAs accumulate
    out[p] += wtap[j,i](p) * src(y + dy + j, x + dx + i).

Semantics: identical to warp_kernel's — the caller provides per-pixel tap
base offsets dy/dx, fused tap weights (zeroed where invalid), and a validity
mask; out-of-budget bands flip plan["ok"] and the caller falls back to XLA.
The caller must pad the SOURCE so that every tap of every valid pixel is
in-bounds in padded coordinates (grid_sample's zero ring; filter_interp's
edge pad), and pass dy/dx in padded-row/col coordinates minus the output
coordinate.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memcnet_tpu.ops.pallas.scatter_kernel import MAXB, R, TH, _ceil_to, plan_bands  # noqa: F401


def gather_ok(plan, filter_size):
    """plan["ok"] tightened for the gather window geometry.

    Derivation.  Band i needs source rows 8i+dy ... 8i+(TH-1)+dy+(fs-1) for
    dy in [dy_lo, dy_hi]; in window coordinates (rows relative to the anchor
    8*(i+q), q = floor(dy_lo/TH)) the needed range is
    [dylo_off, dylo_off + (TH-1) + (ny-1) + (fs-1)].  The R-row window covers
    it iff

        dylo_off + ny <= R - TH - filter_size + 2.                       (*)

    Anchor clipping cannot weaken (*): if the anchor clips at the TOP
    (anchor > Hsp-R), the window becomes [Hsp-R, Hsp) and every needed row is
    >= anchor > Hsp-R and <= Hsp-1 by the caller's padding contract (all taps
    in-bounds), so coverage is automatic; if it clips at the BOTTOM
    (anchor <= -TH), the highest needed row is anchor + dylo_off + TH + ny +
    fs - 3 <= ny + fs + TH - 4 < R under (*).  (gather_bands pads Hsp to a
    TH multiple >= R so the top-clip bound hi == Hsp - R is exact.)

    plan["ok"]'s ny bound is the SCATTER window's geometry, not ours, so only
    the bucket budget is inherited; (*) is the exact gather-side condition."""
    budget = R - TH - filter_size + 2
    return (jnp.all(plan["n"] <= MAXB)
            & jnp.all(plan["dylo_off"] + plan["ny"] <= budget))


def _gather_kernel(fs, nb, W, Wsp,
                   row0_f, ny_f, nx_f, dylo_f, dxlo_f,  # scalar prefetch (G,)
                   src_hbm, wtap_ref, dyr_ref, dxr_ref,  # inputs
                   out_ref,                              # (1, C, TH, Wp)
                   win_ref, acc_ref, sem):               # scratch
    g = pl.program_id(0)

    def start_dma(slot, gg):
        row0 = pl.multiple_of(row0_f[gg], TH)
        return pltpu.make_async_copy(
            src_hbm.at[gg // nb, :, pl.ds(row0, R), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_dma(0, g).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    start_dma(slot, g).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    winf = win_ref[slot].astype(jnp.float32)  # (C, R, Wsp)
    nx = nx_f[g]
    dylo = dylo_f[g]
    dxlo = dxlo_f[g]
    dyr = dyr_ref[0]
    dxr = dxr_ref[0]
    C = winf.shape[0]

    def dy_row(dyk, _):
        rowm = dyr == dyk
        # bring window row (dylo + dyk + j + y) to row (j + y)
        sv = dylo + dyk
        rolled_v = pltpu.roll(winf, R - sv, axis=1)

        @pl.when(jnp.any(rowm))
        def _():
            def dx_bucket(dxk, _):
                m = rowm & (dxr == dxk)

                @pl.when(jnp.any(m))
                def _():
                    # bring window col (pad + dxlo + dxk + i + x) to (i + x);
                    # dx_lo is already in padded-col coordinates
                    sh = dxlo + dxk
                    sh = jnp.where(sh < 0, sh + Wsp, sh)
                    rolled = pltpu.roll(rolled_v, Wsp - sh, axis=2)
                    a = acc_ref[:]
                    for j in range(fs):
                        for i in range(fs):
                            w = wtap_ref[0, j * fs + i] * m.astype(jnp.float32)
                            tap = rolled[:, j:j + TH, i:i + W]
                            a = a + w[None] * tap
                    acc_ref[:] = a

                return 0

            jax.lax.fori_loop(0, nx, dx_bucket, 0)

        return 0

    jax.lax.fori_loop(0, ny_f[g], dy_row, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def gather_bands(src_padded, wtap, plan, *, filter_size, out_w, interpret=False):
    """Run the band-gather kernel.

    src_padded: (B, C, Hsp, Wsp) source, pre-padded by the caller so that
      (a) every tap of every valid pixel is in-bounds, and (b) row index
      (output_row + dy + j) + the caller's row offset is covered by
      [0, Hsp) for every window anchor (Hsp >= H + R rows of margin below,
      TH above — see _grid_sample_fast for the worked example).  dy/dx fed
      to plan_bands must be PADDED-coordinate tap bases minus the OUTPUT
      coordinate.
    wtap: (B, fs^2, H, W) fused tap weights (f32, zeroed where invalid).
    plan: plan_bands(dy, dx, valid) on the (B, H, W) output grid.
    out_w: output width (<= W lanes of the padded source).
    Returns (B, C, H, out_w) in src dtype.
    """
    fs = filter_size
    B, C, Hsp, Wsp = src_padded.shape
    _, fs2, H, W = wtap.shape
    assert fs2 == fs * fs
    nb = plan["nb"]
    G = B * nb

    # Self-pad the source to the kernel's geometry so the contract is
    # uncheatable: lanes to a 128 multiple >= Wp + fs (the kernel's static
    # tap slices read up to Wp + fs - 1 rolled lanes; extra lanes are masked
    # by zero tap weights), rows to a TH multiple >= R (window size; extra
    # zero rows are never read for valid pixels).  The caller still owns the
    # SEMANTIC padding contract: every tap of every valid pixel in-bounds.
    Wp = _ceil_to(W, 128)
    want_w = _ceil_to(max(Wsp, Wp + fs), 128)
    want_h = _ceil_to(max(Hsp, R), TH)
    if want_w != Wsp or want_h != Hsp:
        src_padded = jnp.pad(
            src_padded, ((0, 0), (0, 0), (0, want_h - Hsp), (0, want_w - Wsp)))
        Hsp, Wsp = want_h, want_w
    # TH-aligned window anchor, clipped into the padded source with an
    # 8-aligned bound; the clip residue rides into dylo so window-row
    # arithmetic stays exact (every needed row is in [0, Hsp) by the
    # caller's padding contract)
    anchor = (TH * (jnp.arange(nb, dtype=jnp.int32)[None] + plan["q"])).reshape(G)
    hi = max(((Hsp - R) // TH) * TH, 0)
    row0_f = jnp.clip(anchor, 0, hi).astype(jnp.int32)
    ny_f = plan["ny"].reshape(G).astype(jnp.int32)
    nx_f = plan["nx"].reshape(G).astype(jnp.int32)
    dylo_f = (plan["dylo_off"].reshape(G) + (anchor - row0_f)).astype(jnp.int32)
    dxlo_f = plan["dx_lo"].reshape(G).astype(jnp.int32)

    pad_hw = ((0, 0), (0, 0), (0, 0), (0, Wp - W))
    wtap_p = jnp.pad(wtap.astype(jnp.float32), pad_hw)
    dyr = jnp.pad(plan["dy_rel"], ((0, 0), (0, 0), (0, Wp - W)), constant_values=-1)
    dxr = jnp.pad(plan["dx_rel"], ((0, 0), (0, 0), (0, Wp - W)), constant_values=-1)

    def wtap_idx(g, *_refs):
        return g // nb, 0, g - (g // nb) * nb, 0

    def map_idx(g, *_refs):
        return g // nb, g - (g // nb) * nb, 0

    def out_idx(g, *_refs):
        return g // nb, 0, g - (g // nb) * nb, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
            pl.BlockSpec((1, fs * fs, TH, Wp), wtap_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wp), map_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wp), map_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TH, Wp), out_idx, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, R, Wsp), src_padded.dtype),
            pltpu.VMEM((C, TH, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kern(r0s, nys, nxs, dylos, dxlos, src, wt, dyrr, dxrr, out, win, acc, sem):
        _gather_kernel(fs, nb, Wp, Wsp, r0s, nys, nxs, dylos, dxlos,
                       src, wt, dyrr, dxrr, out, win, acc, sem)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, C, H, Wp), src_padded.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row0_f, ny_f, nx_f, dylo_f, dxlo_f, src_padded, wtap_p, dyr, dxr)
    return out[..., :out_w]
