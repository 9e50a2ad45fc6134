"""Pallas TPU kernel for the flow-projection base scatter.

Reference semantics: my_package/src/my_lib_kernel.cu:1630-1694 (the atomicAdd
scatter); this kernel replaces the XLA scatter-add inside
``memcnet_tpu.ops.projection._scatter4`` on the inference path.

Why a kernel: XLA lowers scatter to a scalar-core loop (~45-65 ns per update
descriptor; PERF.md), so the 720p base scatter (2M updates for the two flow
directions) costs ~90 ms — the single largest stage of the frame after round
2.  But video flows are SMOOTH: within an 8-row band of source pixels, the
integer landing offsets (dy, dx) = (floor(y+fy)-y, floor(x+fx)-x) occupy a
tiny rectangle of distinct values.  That turns the scatter into a handful of
*uniform shifted adds* per band — fully vectorizable on the VPU:

  * The source is processed in (TH=8, W) row bands (grid = B * H/TH).
  * Per band, XLA precomputes (plan_bands) the occupied offset rectangle
    [dy_lo..dy_hi] x [dx_lo..dx_hi] over VALID pixels, and per-pixel offsets
    relative to the rectangle minimum (sentinel -1 for invalid pixels, whose
    payload is pre-zeroed anyway).
  * The kernel loops over the ny*nx occupied offset buckets (dynamic
    ``fori_loop``; smooth flows occupy 1-6).  Bucket (dyk, dxk)'s
    contribution is the masked payload rolled by dxk lanes and dyk sublanes
    into a per-band output window of R rows — two ``pltpu.roll``s and an add,
    no per-element work.  Rolled-in wraparound lanes are provably zero:
    a valid pixel's landing column ixL = x + dx is in [0, W), so any element
    that wraps carries zero payload.
  * Windows are anchored at the TH-aligned row 8*(i + q), q = floor(dy_lo/8)
    (scalar-prefetched), so the XLA combine step is ONE scatter-add of
    B * H/TH * (R/TH) contiguous (3, TH, W)-blocks — descriptor count ~1k,
    not ~2M.

Exactness: values are bit-identical to a f32 scatter-add whenever every
band's dy-spread fits the R-row window and its bucket count fits MAXB
(plan["ok"]); the caller falls back to the XLA scatter for the whole batch
otherwise (lax.cond), so the public op stays exact for ALL inputs.  The
kernel accumulates in f32 (the payload dtype the projection math uses).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8          # source band rows (one f32 sublane tile)
R = 48          # output window rows per band (must be a multiple of TH)
MAXB = 1024     # bucket budget per band before whole-batch fallback


def _ceil_to(x, m):
    return -(-x // m) * m


def band_budgets():
    """(max dy spread, max buckets) a band can serve in-kernel.

    The window must hold rows [dylo_off, dylo_off + ny - 1 + TH) with
    dylo_off = dy_lo - 8*floor(dy_lo/8) <= 7, hence ny <= R - TH - 6.
    """
    return R - TH - 6, MAXB


def plan_bands(dy, dx, valid):
    """Per-band offset stats (all XLA reductions, ~free).

    dy/dx: (B, H, W) int32 landing offsets (source pixel (y, x) scatters into
    base cell (y + dy, x + dx)); valid: (B, H, W) bool.  Invalid pixels are
    excluded from the min/max (their payload is zero) and get sentinel -1
    relative offsets no bucket matches.
    """
    B, H, W = dy.shape
    assert H % TH == 0, (H, TH)
    nb = H // TH
    big = jnp.int32(1 << 20)

    def band_minmax(a):
        lo = jnp.where(valid, a, big).reshape(B, nb, TH, W).min(axis=(2, 3))
        hi = jnp.where(valid, a, -big).reshape(B, nb, TH, W).max(axis=(2, 3))
        return lo, hi

    dy_lo, dy_hi = band_minmax(dy)
    dx_lo, dx_hi = band_minmax(dx)
    any_valid = valid.reshape(B, nb, TH, W).any(axis=(2, 3))
    ny = jnp.where(any_valid, dy_hi - dy_lo + 1, 0)
    nx = jnp.where(any_valid, dx_hi - dx_lo + 1, 0)
    max_ny, max_b = band_budgets()
    n = ny * nx
    ok = jnp.all(ny <= max_ny) & jnp.all(n <= max_b)

    # TH-aligned window anchor: band i's window covers output rows
    # [8*(i + q), 8*(i + q) + R)
    q = jnp.where(any_valid, jnp.floor_divide(dy_lo, TH), 0)
    dylo_off = jnp.where(any_valid, dy_lo - TH * q, 0)  # in [0, TH)

    rep = lambda t: jnp.repeat(t, TH, axis=1).reshape(B, nb * TH, 1)
    dy_rel = jnp.where(valid, dy - rep(dy_lo).reshape(B, H, 1), -1)
    dx_rel = jnp.where(valid, dx - rep(dx_lo).reshape(B, H, 1), -1)
    return dict(
        q=q, dylo_off=dylo_off, dx_lo=dx_lo, ny=ny, nx=nx, n=n, ok=ok,
        dy_rel=dy_rel.astype(jnp.int32), dx_rel=dx_rel.astype(jnp.int32),
        nb=nb,
    )


def _scatter_kernel(nb, Wp,
                    ny_f, nx_f, dylo_f, dxlo_f,  # scalar prefetch (G,)
                    pay_ref, dyr_ref, dxr_ref,   # (1,P,TH,Wp), (1,TH,Wp) x2
                    out_ref,                     # (1,P,R,Wp)
                    hacc_ref):                   # scratch (P,TH,Wp) f32
    g = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    nx = nx_f[g]
    dylo = dylo_f[g]
    dxlo = dxlo_f[g]
    pay = pay_ref[0]
    dyr = dyr_ref[0]
    dxr = dxr_ref[0]
    P = pay.shape[0]

    # Two-level bucket walk: the inner dx loop accumulates this dy-row's
    # horizontally-rolled contributions on the small (P, TH, Wp) scratch; the
    # R-row window placement (pad + sublane roll, the expensive part) happens
    # once per occupied dy value instead of once per (dy, dx) bucket.
    def dy_row(dyk, _):
        rowm = dyr == dyk

        @pl.when(jnp.any(rowm))
        def _():
            hacc_ref[:] = jnp.zeros_like(hacc_ref)

            def dx_bucket(dxk, _):
                m = rowm & (dxr == dxk)

                @pl.when(jnp.any(m))
                def _():
                    pm = pay * m.astype(jnp.float32)[None]   # (P, TH, Wp)
                    # lane roll: pixel x -> column x + dx_lo + dxk
                    # (wrapped-in lanes provably carry zero payload)
                    sh = dxlo + dxk
                    sh = jnp.where(sh < 0, sh + Wp, sh)
                    hacc_ref[:] = hacc_ref[:] + pltpu.roll(pm, sh, axis=2)

                return 0

            jax.lax.fori_loop(0, nx, dx_bucket, 0)
            # sublane roll into the R-row window at dylo_off + dyk (>= 0)
            pm = jnp.concatenate(
                [hacc_ref[:], jnp.zeros((P, R - TH, Wp), jnp.float32)], axis=1
            )
            out_ref[0] = out_ref[0] + pltpu.roll(pm, dylo + dyk, axis=1)

        return 0

    jax.lax.fori_loop(0, ny_f[g], dy_row, 0)


def scatter_bands(payload, plan, *, interpret=False):
    """Run the banded scatter kernel and combine windows.

    payload: (B, P, H, W) f32, pre-masked (zero where invalid).
    plan: output of ``plan_bands``.
    Returns (B, P, H, W) f32 — the base scatter-add result.
    """
    B, P, H, W = payload.shape
    nb = plan["nb"]
    Wp = _ceil_to(W, 128)  # lane-pad so in-kernel rolls see the true width
    G = B * nb
    J = R // TH

    pad_w = ((0, 0), (0, 0), (0, 0), (0, Wp - W))
    pay_p = jnp.pad(payload.astype(jnp.float32), pad_w)
    dyr = jnp.pad(plan["dy_rel"], ((0, 0), (0, 0), (0, Wp - W)),
                  constant_values=-1)
    dxr = jnp.pad(plan["dx_rel"], ((0, 0), (0, 0), (0, Wp - W)),
                  constant_values=-1)

    ny_f = plan["ny"].reshape(G).astype(jnp.int32)
    nx_f = plan["nx"].reshape(G).astype(jnp.int32)
    dylo_f = plan["dylo_off"].reshape(G).astype(jnp.int32)
    dxlo_f = plan["dx_lo"].reshape(G).astype(jnp.int32)

    def pay_idx(g, *_refs):
        return g // nb, 0, g - (g // nb) * nb, 0

    def map_idx(g, *_refs):
        return g // nb, g - (g // nb) * nb, 0

    def out_idx(g, *_refs):
        return g, 0, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, P, TH, Wp), pay_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wp), map_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wp), map_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, R, Wp), out_idx, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, TH, Wp), jnp.float32)],
    )

    def kern(ny_s, nx_s, dylo_s, dxlo_s, pay, dyrr, dxrr, out, hacc):
        _scatter_kernel(nb, Wp, ny_s, nx_s, dylo_s, dxlo_s, pay, dyrr, dxrr,
                        out, hacc)

    win = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, P, R, Wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ny_f, nx_f, dylo_f, dxlo_f, pay_p, dyr, dxr)

    # Combine: window group j of band (b, i) is a (P, TH, Wp) block of output
    # band index i + q + j.  Valid data always lands in [0, nb); the window
    # overhang is zero, so clip targets into a padded extent and crop.
    offs = J  # padding bands on each side
    nbe = nb + 2 * offs
    q = plan["q"]  # (B, nb)
    i_idx = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
    j_idx = jnp.arange(J, dtype=jnp.int32)[None, None, :]
    tgt = i_idx + q[:, :, None] + j_idx + offs           # (B, nb, J)
    tgt = jnp.clip(tgt, 0, nbe - 1)  # clipped targets only ever carry zeros

    blocks = win.reshape(B, nb, P, J, TH, Wp).transpose(0, 1, 3, 2, 4, 5)
    out_ext = jnp.zeros((B, nbe, P, TH, Wp), jnp.float32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    out_ext = out_ext.at[
        jnp.broadcast_to(bidx, tgt.shape), tgt
    ].add(blocks, mode="promise_in_bounds")
    out = out_ext[:, offs:offs + nb].transpose(0, 2, 1, 3, 4)
    return out.reshape(B, P, H, Wp)[..., :W]
