"""Pallas TPU kernels for filter-interpolation warping (the system's hot op).

Reference semantics: my_package/src/my_lib_kernel.cu:1087-1218 (forward).

Three generations live here, newest last; the INFERENCE PATH is the HCW
band kernel (`filter_interp_warp_bands_hcw` — W on vector lanes, channels
on sublanes, one contiguous full-width window DMA per 8-row band, x-shifts
as one-hot matmuls on the MXU).  The per-tile window kernel
(`filter_interp_warp_tiles`) and the NHWC band kernel
(`filter_interp_warp_bands`) are kept for A/B runs and as the measured
record of why the layout ended up where it did (PERF.md r2-r4).

Why a kernel at all: the XLA formulation is bound by the TPU gather engine
(~50 ns per patch descriptor and ~50-90 GB/s effective — PERF.md), because it
fetches the fs*fs*C-byte tap footprint per output pixel from HBM.  For real
video flows neighboring pixels' footprints overlap almost entirely, so the
same bytes are fetched ~fs^2 times.  This kernel reads each source byte ~once:

  * The output is tiled into (TH, TW) = (8, 128) pixel tiles (one vreg of
    pixels; channels ride the lane dimension).
  * Per tile, ONE strided DMA copies a (SH, SW, C) source window from HBM
    into VMEM (double-buffered across the grid so the copy overlaps compute).
    The window position is data-dependent (it follows the flow), so it is
    supplied per-tile via scalar prefetch, computed cheaply in XLA.
  * In VMEM, the per-pixel gather becomes a loop over the tile's occupied
    integer flow-offset rectangle [dy_lo..dy_hi] x [dx_lo..dx_hi] (a dynamic
    ``fori_loop``; smooth flows occupy 1-4 offsets per tile).  For each
    offset, the fs^2 taps are uniform dynamic slices of the window, FMA'd
    with the (precomputed) tap weights masked to the pixels at that offset.
    Empty offsets cost two compares (``pl.when`` skips the taps).

Exactness: the kernel is bit-exact to the reference semantics whenever every
tile's offset spread (over its VALID pixels) fits the static window budget
(SH - TH - fs + 2 rows, SW - TW - fs + 2 cols).  The caller checks the
budget at runtime (``plan["ok"]``) and falls back to the XLA path for the
whole frame otherwise (``jax.lax.cond``), so the public op stays exact for
ALL inputs.  Out-of-range/invalid pixels (|f| >= frame/2 or landing outside)
carry zeroed weights and are excluded from the window planning; the caller's
passthrough select restores them, identical to the XLA path.

Layout notes (v5e measurements drove these choices):
  * Channels-last windows make each DMA row a contiguous SW*C-byte run and
    put C on vector lanes, so tap FMAs vectorize across channels.
  * The source image is padded generously (edge mode) so window starts never
    need clamping for in-budget tiles — clamping would silently misalign the
    offset->slice arithmetic (the tap slice for bucket dyk starts at row
    dyk - dy_lo, which is only right if r0 == ty0 + dy_lo + PAD_TOP exactly).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile: one (sublane x lane) vreg of pixels.
TH, TW = 8, 128
# VMEM window per tile (rows x cols of the padded source, channels-last).
SH, SW = 32, 192


def _ceil_to(x, m):
    return -(-x // m) * m


def _sublane(dtype):
    """Sublane tile size for dtype — dynamic column offsets into tiled
    memrefs (DMA starts, slab starts) must be multiples of this."""
    return 32 // jnp.dtype(dtype).itemsize


def _slab_width(dtype):
    # covers rotate residue (< sublane) + fs-1 tap columns + TW
    return TW + 2 * _sublane(dtype)


def kernel_budgets(filter_size, dtype=jnp.float32):
    """Max per-tile integer-offset spreads the kernel window can serve.

    Rows: the bucket slab reads rows [dyk, dyk + TH + fs - 1).  Columns: the
    slab start is rounded down to the dtype's sublane tile (Mosaic tiled-
    memref alignment: 8 for f32, 16 for bf16) and spans _slab_width columns;
    the worst-case DMA alignment residue eats into the column budget.
    """
    by = SH - TH - filter_size + 1
    bx = SW - _slab_width(dtype)
    return by, bx


def _warp_kernel(fs, grid_n, out_dtype,
                 r0f, c0f, sxf, nxf, nyxf,  # scalar prefetch (G,)
                 img_hbm, wtap_ref, dyr_ref, dxr_ref,  # inputs
                 out_ref,  # output (TH, TW, C)
                 win_ref, acc_ref, sem):  # scratch
    g = pl.program_id(0)

    sub = _sublane(win_ref.dtype)

    def start_dma(slot, gg):
        # c0f entries are sublane-aligned by construction (launch side);
        # assert it for Mosaic's tiled-memref slice legality check.
        c = pl.multiple_of(c0f[gg], sub)
        return pltpu.make_async_copy(
            img_hbm.at[gg // grid_n, pl.ds(r0f[gg], SH), pl.ds(c, SW), :],
            win_ref.at[slot],
            sem.at[slot],
        )

    # Double-buffered window fetch: wait for the window started at the
    # previous grid step, after kicking off the next tile's window.
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_dma(0, g).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    start_dma(slot, g).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    nx = nxf[g]
    sx = sxf[g]  # window content offset from the sublane-aligned DMA start
    dyr = dyr_ref[:]  # (TH, TW) int32, offsets relative to the tile minimum
    dxr = dxr_ref[:]

    def bucket(k, _):
        dyk = k // nx
        dxk = k - dyk * nx
        match = (dyr == dyk) & (dxr == dxk)

        @pl.when(jnp.any(match))
        def _():
            m = match.astype(jnp.float32)
            # Mosaic requires dynamic sublane (window column) offsets to be
            # 8-aligned: load ONE aligned slab covering all fs^2 taps, rotate
            # by the sub-8 residue (tpu.dynamic_rotate), then the taps are
            # static slices.
            dxs = dxk + sx
            width = _slab_width(win_ref.dtype)
            qa = pl.multiple_of((dxs // sub) * sub, sub)
            r = dxs - qa
            slab = win_ref[slot, pl.ds(dyk, TH + fs - 1), pl.ds(qa, width), :]
            # f32 before the rotate: tpu.dynamic_rotate is 32-bit only, and
            # the FMAs accumulate in f32 regardless.  The shift is the
            # NON-NEGATIVE equivalent of -r: dynamic negative rotate amounts
            # miscompile silently on v5e (measured; static ones are rejected
            # with "shift must be non-negative").
            slab = pltpu.roll(slab.astype(jnp.float32), width - r, axis=1)
            a = acc_ref[:]
            for j in range(fs):
                for i in range(fs):
                    w = wtap_ref[j * fs + i] * m  # (TH, TW)
                    tap = slab[j:j + TH, i:i + TW, :]
                    a = a + w[:, :, None] * tap
            acc_ref[:] = a

        return 0

    jax.lax.fori_loop(0, nyxf[g], bucket, 0)
    out_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Band-window variant: one full-width window DMA per (TH-row) band, tiles
# walked by an in-kernel loop.
#
# Why: the per-tile window pipeline above costs ~10 us/tile of Pallas grid
# machinery at 720p (1056 tiles -> ~10 ms of the ~18 ms/warp; measured on
# v5e via the dmaonly ablation in tools/bench_warp_ablate2.py).  A band
# window is ONE contiguous HBM block (full padded rows), so 96 band DMAs
# replace 1056 strided window DMAs, and the column budget disappears
# entirely (the window spans every column a valid pixel can touch), leaving
# only a per-band row budget + a per-tile bucket-count cap.  The per-tile
# compute (offset-bucket rolls + fs^2 masked FMAs) is unchanged, with a
# no-mask fast path for single-bucket tiles (smooth/production flows).
# ---------------------------------------------------------------------------

BSH = 40  # band window rows: row budget = BSH - TH - fs + 2 (=30 at fs=4)
BUCKET_CAP = 48  # per-tile ny*nx beyond which the XLA fallback wins (perf)


def _warp_band_kernel(fs, nb, ntw, SH, out_dtype,
                      row0_f, dylo_f, qa0_f, r0_f, nx_f, nyx_f,  # prefetch
                      img_hbm, wtap_ref, dyr_ref, dxr_ref,       # inputs
                      out_ref,                                   # (1, ntw*TH, TW, Cp)
                      win_ref, acc_ref, sem):                    # scratch
    g = pl.program_id(0)
    sub = _sublane(win_ref.dtype)
    width = _slab_width(win_ref.dtype)

    def start_dma(slot, gg):
        return pltpu.make_async_copy(
            img_hbm.at[gg // nb, pl.ds(row0_f[gg], SH), :, :],
            win_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_dma(0, g).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    start_dma(slot, g).wait()

    def tile(t, _):
        base = g * ntw + t
        nyx = nyx_f[base]

        def wk_plane(k):
            # wtap layout (fs2, ntw, TH) flattened on dim 1
            return wtap_ref[0, pl.ds((k * ntw + t) * TH, TH), :]

        def slab_for(dyk, dxk):
            q = ((r0_f[base] + dxk) // sub) * sub
            qa = pl.multiple_of(qa0_f[base] + q, sub)
            r = r0_f[base] + dxk - q
            slab = win_ref[slot, pl.ds(dylo_f[base] + dyk, TH + fs - 1),
                           pl.ds(qa, width), :]
            # f32 before the rotate (tpu.dynamic_rotate is 32-bit only); the
            # non-negative equivalent of -r (see _warp_kernel)
            return pltpu.roll(slab.astype(jnp.float32), width - r, axis=1)

        def fma(slab, wsel):
            a = jnp.zeros_like(acc_ref)
            for j in range(fs):
                for i in range(fs):
                    w = wsel(j * fs + i)
                    tap = slab[j:j + TH, i:i + TW, :]
                    a = a + w[:, :, None] * tap
            acc_ref[:] = acc_ref[:] + a

        acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(nyx == 1)
        def _():
            # Single offset bucket: every valid pixel matches (dy_rel, dx_rel)
            # == (0, 0) and invalid pixels carry zero tap weights, so the
            # match mask is the identity -> skip it (the production regime:
            # smooth flows land almost every tile here).
            fma(slab_for(0, 0), wk_plane)

        @pl.when(nyx > 1)
        def _():
            nx = nx_f[base]
            dyrt = dyr_ref[0, pl.ds(t * TH, TH), :]
            dxrt = dxr_ref[0, pl.ds(t * TH, TH), :]

            def bucket(k, _c):
                dyk = k // nx
                dxk = k - dyk * nx
                match = (dyrt == dyk) & (dxrt == dxk)

                @pl.when(jnp.any(match))
                def _():
                    m = match.astype(jnp.float32)
                    fma(slab_for(dyk, dxk), lambda kk: wk_plane(kk) * m)

                return 0

            jax.lax.fori_loop(0, nyx, bucket, 0)

        out_ref[0, pl.ds(t * TH, TH), :, :] = acc_ref[:].astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, ntw, tile, 0)


def plan_tiles(dy, dx, valid, filter_size, dtype=jnp.float32):
    """Per-tile offset stats for the kernel (all XLA reductions, ~free).

    dy/dx: (B, H, W) int32 integer tap-base offsets (tap (j, i) of pixel
    (y, x) reads source (y + dy + j, x + dx + i)); valid: (B, H, W) bool.
    Invalid pixels are excluded from the min/max so an out-of-range flow at
    a frame border cannot blow the budget of an otherwise-smooth tile.
    """
    fs = filter_size
    B, H, W = dy.shape
    Hp, Wp = _ceil_to(H, TH), _ceil_to(W, TW)
    pad = ((0, 0), (0, Hp - H), (0, Wp - W))
    dy = jnp.pad(dy, pad)
    dx = jnp.pad(dx, pad)
    valid = jnp.pad(valid, pad)  # padded pixels -> False
    nth, ntw = Hp // TH, Wp // TW

    big = jnp.int32(1 << 20)

    def tile_minmax(a):
        lo = jnp.where(valid, a, big).reshape(B, nth, TH, ntw, TW).min(axis=(2, 4))
        hi = jnp.where(valid, a, -big).reshape(B, nth, TH, ntw, TW).max(axis=(2, 4))
        return lo, hi

    dy_lo, dy_hi = tile_minmax(dy)
    dx_lo, dx_hi = tile_minmax(dx)
    ny = jnp.maximum(dy_hi - dy_lo + 1, 0)  # 0 for tiles with no valid pixel
    nx = jnp.maximum(dx_hi - dx_lo + 1, 0)
    by, bx = kernel_budgets(fs, dtype)
    ok = jnp.all(ny <= by + 1) & jnp.all(nx <= bx + 1)

    rep = lambda t: jnp.repeat(jnp.repeat(t, TH, axis=1), TW, axis=2)
    # Invalid pixels get a sentinel relative offset no bucket ever matches
    # (their weights are zero anyway; this also keeps them out by identity).
    dy_rel = jnp.where(valid, dy - rep(dy_lo), -1)
    dx_rel = jnp.where(valid, dx - rep(dx_lo), -1)
    return dict(
        dy_lo=dy_lo, dx_lo=dx_lo, ny=ny, nx=nx, ok=ok,
        dy_rel=dy_rel.astype(jnp.int32), dx_rel=dx_rel.astype(jnp.int32),
        nth=nth, ntw=ntw, Hp=Hp, Wp=Wp,
    )


# Image padding margins (beyond the fs-wide edge replication the reference's
# per-tap border clamp needs).  Chosen so window starts
# r0 = ty0 + dy_lo + PAD_TOP are provably within [0, HP - SH] for every tile
# with a valid pixel:
#   * y + dy = iy + 1 - half >= 1 - half >= -1 for iy >= 0, and the tile
#     minimum can sit up to TH-1 rows above its pixel, so
#     ty0 + dy_lo >= -1 - (TH - 1) - half and PAD_TOP = TH + fs covers it.
#   * ty0 + dy_lo <= y + dy <= H, so PAD_BOT = SH + fs keeps r0 + SH <= HP.
# Columns are analogous with TW/SW.
def _pads(fs):
    return (TH + fs, SH + fs), (TW + fs, SW + fs)


def filter_interp_warp_tiles(image_nhwc, wtap, plan, *, filter_size=4,
                             interpret=False):
    """Run the tiled kernel.

    image_nhwc: (B, H, W, C) unpadded source; wtap: (B, fs*fs, H, W) fused
    tap weights (filt * quadrant blend, zeroed where invalid); plan: output
    of ``plan_tiles``.  Returns (B, H, W, C) accumulator in image dtype
    (the caller applies the validity/passthrough select).
    """
    fs = filter_size
    B, H, W, C = image_nhwc.shape
    nth, ntw, Hp, Wp = plan["nth"], plan["ntw"], plan["Hp"], plan["Wp"]
    (pt, pb), (pleft, pr) = _pads(fs)
    # Channels pad to the 128-lane tile: Mosaic's HBM memref slicing (the
    # window DMA) requires the minormost slice extent to be a lane multiple.
    Cp = _ceil_to(C, 128)
    img_p = jnp.pad(image_nhwc, ((0, 0), (pt, pb), (pleft, pr), (0, Cp - C)),
                    mode="edge")
    HP, WP = img_p.shape[1], img_p.shape[2]

    ty0 = jnp.arange(nth, dtype=jnp.int32)[None, :, None] * TH
    tx0 = jnp.arange(ntw, dtype=jnp.int32)[None, None, :] * TW
    # In-budget tiles never hit these clips (see _pads); the clip guards
    # valid-pixel-free tiles whose sentinel minima are huge.
    r0 = jnp.clip(ty0 + plan["dy_lo"] + pt, 0, HP - SH)
    c0 = jnp.clip(tx0 + plan["dx_lo"] + pleft, 0, WP - SW)
    # DMA column starts must be sublane-aligned (HBM/VMEM memrefs are
    # (sublane,128)-tiled per dtype); the residue rides into the kernel's
    # bucket column math.
    sub = _sublane(image_nhwc.dtype)
    c0a = (c0 // sub) * sub
    sx = c0 - c0a

    G = B * nth * ntw
    grid_n = nth * ntw
    r0f = r0.reshape(G).astype(jnp.int32)
    c0f = c0a.reshape(G).astype(jnp.int32)
    sxf = sx.reshape(G).astype(jnp.int32)
    nxf = plan["nx"].reshape(G).astype(jnp.int32)
    nyxf = (plan["ny"] * plan["nx"]).reshape(G).astype(jnp.int32)

    pad_hw = ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
    wtap_p = jnp.pad(wtap.astype(jnp.float32), pad_hw)

    def tidx(g):
        b = g // grid_n
        r = g - b * grid_n
        return b, r // ntw, r - (r // ntw) * ntw

    def wtap_idx(g, *_refs):
        b, th, tw = tidx(g)
        return b, 0, th, tw

    def map_idx(g, *_refs):
        return tidx(g)

    def out_idx(g, *_refs):
        b, th, tw = tidx(g)
        return b, th, tw, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img_p stays in HBM
            pl.BlockSpec((1, fs * fs, TH, TW), wtap_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), map_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), map_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, TW, Cp), out_idx, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SH, SW, Cp), img_p.dtype),
            pltpu.VMEM((TH, TW, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kern(r0s, c0s, sxs, nxs, nyxs, img, wt, dyr, dxr, out, win, acc, sem):
        _warp_kernel(fs, grid_n, image_nhwc.dtype,
                     r0s, c0s, sxs, nxs, nyxs, img,
                     wt.at[0], dyr.at[0], dxr.at[0], out.at[0],
                     win, acc, sem)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, Cp), image_nhwc.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        # The default 16 MB scoped-vmem budget rejects tall tiles (the
        # unrolled 16-tap FMA chain's stack); v5e has 128 MB of VMEM and the
        # window scratch + accumulator are nowhere near it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(r0f, c0f, sxf, nxf, nyxf, img_p, wtap_p, plan["dy_rel"], plan["dx_rel"])
    return out[:, :H, :W, :C]


def _warp_band_hcw_kernel(fs, nb, ntw, SH, out_dtype,
                          row0_f, dylo_f, r0c_f, nx_f, nyx_f,   # prefetch
                          img_hbm, wtap_ref, dyr_ref, dxr_ref,  # inputs
                          out_ref,                              # (1, ntw*TH, Cp, TW)
                          win_ref, acc_ref, sem):               # scratch
    """HCW-layout band kernel: window rows are (Cp, W) planes with W on the
    VECTOR LANES and channels on sublanes.

    Why this layout (v5e ablation, tools /tmp band ablation r4): in the
    channels-on-lanes kernel every tap FMA needs the (TH, TW) weight plane
    relaid from lanes onto sublanes — a per-tap transpose costing ~7 ms of
    an 23 ms warp call.  Here ``w[:, None, :]`` broadcasts across the
    sublane (channel) axis natively.  The cost moves to fs lane-rolls per
    bucket (x-alignment must now be done in the lane dimension), which are
    cheaper, and the model-side NCHW<->NHWC transposes disappear (input is
    (B, H, C, W) — one cheap middle-axis swap from NCHW).
    """
    g = pl.program_id(0)
    LW = 3 * TW  # per-tile lane window: covers |dx| <= TW - fs

    def start_dma(slot, gg):
        return pltpu.make_async_copy(
            img_hbm.at[gg // nb, pl.ds(row0_f[gg], SH), :, :],
            win_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_dma(0, g).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        start_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    start_dma(slot, g).wait()

    def tile(t, _):
        base = g * ntw + t
        nyx = nyx_f[base]
        # window lanes [(t+1)*TW, (t+4)*TW): lane xr of roll i reads absolute
        # padded col 2*TW + (x + dx + i) (launcher pads PL = 2*TW columns
        # left), i.e. rel col TW + xr + dx + i -> roll base r = TW + dx + i
        ls = pl.multiple_of((t + 1) * TW, TW)

        def wk_plane(k):
            return wtap_ref[0, pl.ds((k * ntw + t) * TH, TH), :]  # (TH, TW)

        def rolled_slabs(dyk, dxk):
            # x-alignment as fs one-hot shift MATMULS on the (otherwise idle)
            # MXU instead of f32 lane rolls on the VPU: S_i = rows @ M_i with
            # M_i[v, w] = (v == w + r + i) selects lane w from window lane
            # w + r + i — exact (one-hot bf16 matmul accumulates a single
            # product per output, in f32), overlaps with the VPU tap FMAs,
            # and skips the explicit f32 window expansion the 32-bit-only
            # roll needed.  2x on the smooth-flow call (v5e ablation).
            rows = win_ref[slot, pl.ds(dylo_f[base] + dyk, TH + fs - 1), :,
                           pl.ds(ls, LW)]  # (TH+fs-1, Cp, LW) source dtype
            r0 = r0c_f[base] + dxk
            v = jax.lax.broadcasted_iota(jnp.int32, (LW, TW), 0)
            w_ = jax.lax.broadcasted_iota(jnp.int32, (LW, TW), 1)
            # f32 sources need HIGHEST: the default TPU matmul truncates f32
            # operands to bf16, which broke the fp32 A/B exactness in r4
            # (identity warp maxerr 2^-9).  The 3-way bf16 split of HIGHEST
            # reconstructs the one-hot selection exactly; bf16 sources are
            # exact on the default path (single product per output, f32 acc).
            prec = (jax.lax.Precision.HIGHEST
                    if rows.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
            return [
                jax.lax.dot_general(
                    rows, (v == w_ + (r0 + i)).astype(rows.dtype),
                    (((2,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (TH+fs-1, Cp, TW)
                for i in range(fs)
            ]

        def fma(slabs, wsel):
            a = jnp.zeros_like(acc_ref)  # (TH, Cp, TW)
            for j in range(fs):
                for i in range(fs):
                    w = wsel(j * fs + i)            # (TH, TW), lanes = TW
                    tap = slabs[i][j:j + TH]  # (TH, Cp, TW), already TW lanes
                    a = a + w[:, None, :] * tap     # broadcast over sublanes
            acc_ref[:] = acc_ref[:] + a

        acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(nyx == 1)
        def _():
            fma(rolled_slabs(0, 0), wk_plane)

        @pl.when(nyx > 1)
        def _():
            nx = nx_f[base]
            dyrt = dyr_ref[0, pl.ds(t * TH, TH), :]
            dxrt = dxr_ref[0, pl.ds(t * TH, TH), :]

            def bucket(k, _c):
                dyk = k // nx
                dxk = k - dyk * nx
                match = (dyrt == dyk) & (dxrt == dxk)

                @pl.when(jnp.any(match))
                def _():
                    m = match.astype(jnp.float32)
                    fma(rolled_slabs(dyk, dxk), lambda kk: wk_plane(kk) * m)

                return 0

            jax.lax.fori_loop(0, nyx, bucket, 0)

        # write only the real channels (Co = ceil8(C) <= Cp): the padded
        # lanes' zeros are never consumed and the trim nearly halves the
        # output HBM traffic + the XLA-side channel slice at C=67
        Co = out_ref.shape[2]
        out_ref[0, pl.ds(t * TH, TH), :, :] = acc_ref[:, :Co].astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, ntw, tile, 0)


def _warp_band_hcw2_kernel(fs, nb, ntw, SH, out_dtype, cps,
                           row0_f, dylo_f, r0c_f, nx_f, nyx_f,       # prefetch
                           *refs):                                   # see below
    """HCW band kernel v2: tap weights are built IN-KERNEL from the raw
    filter planes and the (alpha, beta) subpixel fractions, both read in
    their NATURAL (B, C, nth, TH, Wp) layout (a free bitcast-reshape of
    NCHW).  This deletes the launcher-side fused-weight computation and its
    fs^2-plane pad/reshape/transpose remap (~2 ms/warp of XLA data movement
    at 720p, r5 trace).  Validity rides the dy_rel >= 0 sentinel.  bf16
    sources round the weight product to bf16 before the FMA — exactly the
    XLA fallback's weight cast (warp.py _xla_forward).

    MULTI-IMAGE: ``cps`` lists each source's padded channel count.  The N
    images arrive as SEPARATE HBM refs (no XLA-side channel concat), DMA
    into stacked sublane ranges of one shared window, share the one
    shift-matmul + FMA pass, and leave as N separate outputs (no XLA-side
    channel slicing — the model gets warped image and warped context as
    distinct tensors)."""
    n_img = len(cps)
    imgs = refs[:n_img]
    filt_ref, ab_ref, dyr_ref, dxr_ref = refs[n_img:n_img + 4]
    outs = refs[n_img + 4:2 * n_img + 4]
    win_ref, acc_ref, sem = refs[2 * n_img + 4:]
    coffs = [sum(cps[:i]) for i in range(n_img + 1)]

    g = pl.program_id(0)
    LW = 3 * TW
    half = fs // 2

    def start_dma(slot, gg, i):
        return pltpu.make_async_copy(
            imgs[i].at[gg // nb, pl.ds(row0_f[gg], SH), :, :],
            win_ref.at[slot, :, pl.ds(coffs[i], cps[i]), :],
            sem.at[slot, i])

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for i in range(n_img):
            start_dma(0, g, i).start()

    @pl.when(g + 1 < pl.num_programs(0))
    def _():
        for i in range(n_img):
            start_dma(jax.lax.rem(g + 1, 2), g + 1, i).start()

    for i in range(n_img):
        start_dma(slot, g, i).wait()

    bf16_round = jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)

    def tile(t, _):
        base = g * ntw + t
        nyx = nyx_f[base]
        ls = pl.multiple_of((t + 1) * TW, TW)
        lo = pl.multiple_of(t * TW, TW)

        alpha = ab_ref[0, 0, 0, :, pl.ds(lo, TW)].astype(jnp.float32)
        beta = ab_ref[0, 1, 0, :, pl.ds(lo, TW)].astype(jnp.float32)
        dyrt = dyr_ref[0, 0, :, pl.ds(lo, TW)]
        dxrt = dxr_ref[0, 0, :, pl.ds(lo, TW)]
        wy = (1.0 - beta, beta)
        wx = (1.0 - alpha, alpha)

        def wk_plane(k):
            j, i = k // fs, k - (k // fs) * fs
            w = (filt_ref[0, k, 0, :, pl.ds(lo, TW)].astype(jnp.float32)
                 * wy[1 if j >= half else 0] * wx[1 if i >= half else 0])
            if bf16_round:
                w = w.astype(jnp.bfloat16).astype(jnp.float32)
            return w

        def rolled_slabs(dyk, dxk):
            rows = win_ref[slot, pl.ds(dylo_f[base] + dyk, TH + fs - 1), :,
                           pl.ds(ls, LW)]
            r0 = r0c_f[base] + dxk
            v = jax.lax.broadcasted_iota(jnp.int32, (LW, TW), 0)
            w_ = jax.lax.broadcasted_iota(jnp.int32, (LW, TW), 1)
            prec = (jax.lax.Precision.HIGHEST
                    if rows.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
            return [
                jax.lax.dot_general(
                    rows, (v == w_ + (r0 + i)).astype(rows.dtype),
                    (((2,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)
                for i in range(fs)
            ]

        def fma(slabs, wsel):
            a = jnp.zeros_like(acc_ref)
            for j in range(fs):
                for i in range(fs):
                    w = wsel(j * fs + i)
                    tap = slabs[i][j:j + TH]
                    a = a + w[:, None, :] * tap
            acc_ref[:] = acc_ref[:] + a

        acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(nyx == 1)
        def _():
            # single bucket: validity no longer pre-zeroed into the weights,
            # so mask on the >= 0 sentinel (invalid pixels carry rel = -1)
            m = (dyrt >= 0).astype(jnp.float32)
            fma(rolled_slabs(0, 0), lambda kk: wk_plane(kk) * m)

        @pl.when(nyx > 1)
        def _():
            nx = nx_f[base]

            def bucket(k, _c):
                dyk = k // nx
                dxk = k - dyk * nx
                match = (dyrt == dyk) & (dxrt == dxk)

                @pl.when(jnp.any(match))
                def _():
                    m = match.astype(jnp.float32)
                    fma(rolled_slabs(dyk, dxk), lambda kk: wk_plane(kk) * m)

                return 0

            jax.lax.fori_loop(0, nyx, bucket, 0)

        for i in range(n_img):
            outs[i][0, pl.ds(t * TH, TH), :, :] = (
                acc_ref[:, coffs[i]:coffs[i + 1]].astype(out_dtype))
        return 0

    jax.lax.fori_loop(0, ntw, tile, 0)


def plan_band_tiles(dy, dx, valid, filter_size, dtype=jnp.float32, sh=BSH):
    """Band-kernel plan: per-tile offset stats (plan_tiles) + per-band window
    anchors and the band-geometry ok gate.  All XLA reductions."""
    fs = filter_size
    _B, H, _W = dy.shape
    p = plan_tiles(dy, dx, valid, fs, dtype)
    B, nth, ntw = p["dy_lo"].shape
    pt = TH + fs
    HP = pt + H + sh + fs
    sub = _sublane(dtype)
    big = jnp.int32(1 << 20)

    live = p["ny"] > 0
    ty0 = jnp.arange(nth, dtype=jnp.int32)[None, :, None] * TH
    rowneed = jnp.where(live, pt + ty0 + p["dy_lo"], big)
    row0 = jnp.clip(rowneed.min(axis=2), 0, HP - sh)  # (B, nth)
    dylo_off = jnp.where(live, pt + ty0 + p["dy_lo"] - row0[:, :, None], 0)

    budget = sh - TH - fs + 2
    ok = (jnp.all(jnp.where(live, dylo_off + p["ny"], 0) <= budget)
          & jnp.all(jnp.where(live, p["ny"] * p["nx"], 0) <= BUCKET_CAP))

    pl_cols = TW + fs  # left pad; guarantees qa >= 0 (see launcher docstring)
    tx0 = jnp.arange(ntw, dtype=jnp.int32)[None, None, :] * TW
    dxs0 = jnp.where(live, pl_cols + tx0 + p["dx_lo"], 0)
    qa0 = (dxs0 // sub) * sub
    r0 = dxs0 - qa0

    # HCW-kernel column fields: roll base r = TW + dx (left pad 2*TW; the
    # per-tile lane window [t*TW, t*TW + 3*TW) covers |dx| <= TW - fs)
    dx_hi = p["dx_lo"] + p["nx"] - 1
    hcw_ok = (ok
              & jnp.all(jnp.where(live, -p["dx_lo"], 0) <= TW - fs)
              & jnp.all(jnp.where(live, dx_hi, 0) <= TW - fs))
    r0c = jnp.clip(jnp.where(live, TW + p["dx_lo"], 0), 0, 2 * TW)

    G = B * nth
    return dict(
        p,
        band_ok=ok,
        hcw_ok=hcw_ok,
        row0=row0.reshape(G),
        dylo=dylo_off.reshape(G * ntw),
        qa0=qa0.reshape(G * ntw),
        r0=r0.reshape(G * ntw),
        r0c=r0c.reshape(G * ntw),
        nyx=(p["ny"] * p["nx"]).reshape(G * ntw),
        nxf=jnp.maximum(p["nx"], 1).reshape(G * ntw),
        pt=pt, pl_cols=pl_cols, HP=HP, sh=sh,
    )


def filter_interp_warp_bands(image_nhwc, wtap, plan, *, filter_size=4,
                             interpret=False):
    """Run the band-window kernel; returns (B, C, H, W) NCHW accumulator.

    image_nhwc: (B, H, W, C) unpadded source; wtap: (B, fs*fs, H, W) fused
    tap weights (zeroed where invalid); plan: ``plan_band_tiles`` output.
    Only valid when plan["band_ok"] (callers gate with lax.cond).

    Geometry invariants (holding whenever band_ok):
      * rows: window [row0, row0 + sh) covers every tap row of every valid
        pixel in the band — dylo_off + ny <= sh - TH - fs + 2, and row0
        never clips (PT = TH + fs, PB = sh + fs margins).
      * cols: the window spans the full padded width, so ANY horizontal
        offset of a valid pixel is in-window: the aligned slab start
        qa = align_down(PL + tx0 + dx_lo + dxk) satisfies qa >= 0 (because
        PL = TW + fs >= TW + half - 1 and tap columns of valid pixels are
        >= 1 - half) and qa + slab_width <= WSP (because tap columns are
        <= W + fs and WSP rounds PL + W + slab_width up to a lane tile).
        There is NO column budget — only the row budget and the per-tile
        BUCKET_CAP perf gate.
    """
    fs = filter_size
    B, H, W, C = image_nhwc.shape
    nth, ntw, Hp, Wp = plan["nth"], plan["ntw"], plan["Hp"], plan["Wp"]
    sh, pt, pl_cols, HP = plan["sh"], plan["pt"], plan["pl_cols"], plan["HP"]
    sub = _sublane(image_nhwc.dtype)
    width = _slab_width(image_nhwc.dtype)
    Cp = _ceil_to(C, 128)
    WSP = _ceil_to(pl_cols + W + width + sub, 128)
    img_p = jnp.pad(
        image_nhwc,
        ((0, 0), (pt, HP - pt - H), (pl_cols, WSP - pl_cols - W), (0, Cp - C)),
        mode="edge")

    G = B * nth

    # wtap -> (G, fs2*ntw*TH, TW): tap plane (k, tile t) is rows
    # [(k*ntw + t)*TH, +TH) — an untiled-dim slice, legal at any dynamic
    # offset.  Same trick for the offset maps.
    wtap_p = jnp.pad(wtap.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    wtap_r = (wtap_p.reshape(B, fs * fs, nth, TH, ntw, TW)
              .transpose(0, 2, 1, 4, 3, 5).reshape(G, fs * fs * ntw * TH, TW))

    def remap(m):
        return (m.reshape(B, nth, TH, ntw, TW)
                .transpose(0, 1, 3, 2, 4).reshape(G, ntw * TH, TW))

    dyr = remap(plan["dy_rel"])
    dxr = remap(plan["dx_rel"])

    def band_idx(g, *_refs):
        return g, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img_p stays in HBM
            pl.BlockSpec((1, fs * fs * ntw * TH, TW), band_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntw * TH, TW), band_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntw * TH, TW), band_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ntw * TH, TW, Cp),
                               lambda g, *_r: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sh, WSP, Cp), img_p.dtype),
            pltpu.VMEM((TH, TW, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kern(r0s, dylos, qa0s, r0cs, nxs, nyxs, img, wt, dyrr, dxrr,
             out, win, acc, sem):
        _warp_band_kernel(fs, nth, ntw, sh, image_nhwc.dtype,
                          r0s, dylos, qa0s, r0cs, nxs, nyxs,
                          img, wt, dyrr, dxrr, out, win, acc, sem)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, ntw * TH, TW, Cp), image_nhwc.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(plan["row0"], plan["dylo"], plan["qa0"], plan["r0"], plan["nxf"],
      plan["nyx"], img_p, wtap_r, dyr, dxr)
    # (B, nb, ntw, TH, TW, Cp) -> NCHW in one fused transpose
    out = (out.reshape(B, nth, ntw, TH, TW, Cp)
           .transpose(0, 5, 1, 3, 2, 4).reshape(B, Cp, Hp, Wp))
    return out[:, :C, :H, :W]


def filter_interp_warp_bands_hcw2(images, filt, alpha, beta, plan, *,
                                  filter_size=4, interpret=False):
    """v2 HCW launcher: passes the RAW filter + (alpha, beta) fractions in
    natural layout (free bitcast reshapes of NCHW) and lets the kernel build
    the tap weights — no fused-weight fusion, no fs^2-plane remap, no
    dy/dx remaps (see _warp_band_hcw2_kernel).

    ``images`` is a LIST of NCHW sources sharing the flow/filter (e.g. the
    frame and its 64-ch context): each is padded/transposed separately (no
    channel concat) and warped in one shared kernel pass; returns the list
    of warped NCHW outputs (no channel slicing)."""
    fs = filter_size
    B, _, H, W = images[0].shape
    dt = images[0].dtype
    nth, ntw, Hp, Wp = plan["nth"], plan["ntw"], plan["Hp"], plan["Wp"]
    sh, pt, HP = plan["sh"], plan["pt"], plan["HP"]
    sub = _sublane(dt)
    cps = [_ceil_to(im.shape[1], sub) for im in images]
    Cp = sum(cps)
    PL = 2 * TW
    WSP = _ceil_to(Wp + 3 * TW, TW)

    imgs_p = []
    for im, cp in zip(images, cps):
        p = jnp.pad(im, ((0, 0), (0, cp - im.shape[1]), (0, 0), (0, 0)))
        p = jnp.pad(p, ((0, 0), (0, 0), (pt, HP - pt - H), (PL, WSP - PL - W)),
                    mode="edge")
        imgs_p.append(p.transpose(0, 2, 1, 3))  # (B, HP, cp, WSP)

    G = B * nth
    pad_hw = ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
    filt_r = jnp.pad(filt, pad_hw).reshape(B, fs * fs, nth, TH, Wp)
    ab_r = jnp.pad(
        jnp.stack([alpha, beta], axis=1).astype(jnp.float32), pad_hw
    ).reshape(B, 2, nth, TH, Wp)
    dyr = plan["dy_rel"].reshape(B, nth, TH, Wp)
    dxr = plan["dx_rel"].reshape(B, nth, TH, Wp)

    def bmap5(g, *_refs):
        return g // nth, 0, g % nth, 0, 0

    def bmap4(g, *_refs):
        return g // nth, g % nth, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(images) + [
            pl.BlockSpec((1, fs * fs, 1, TH, Wp), bmap5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 1, TH, Wp), bmap5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, Wp), bmap4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TH, Wp), bmap4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ntw * TH, cp, TW), lambda g, *_r: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for cp in cps
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sh, Cp, WSP), dt),
            pltpu.VMEM((TH, Cp, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, len(images))),
        ],
    )

    def kern(r0s, dylos, r0cs, nxs, nyxs, *refs):
        _warp_band_hcw2_kernel(fs, nth, ntw, sh, dt, tuple(cps),
                               r0s, dylos, r0cs, nxs, nyxs, *refs)

    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((G, ntw * TH, cp, TW), dt)
                   for cp in cps],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(plan["row0"], plan["dylo"], plan["r0c"], plan["nxf"], plan["nyx"],
      *imgs_p, filt_r, ab_r, dyr, dxr)
    res = []
    for im, cp, out in zip(images, cps, outs):
        C = im.shape[1]
        o = (out.reshape(B, nth, ntw, TH, cp, TW)
             .transpose(0, 4, 1, 3, 2, 5).reshape(B, cp, Hp, Wp))
        res.append(o[:, :C, :H, :W])
    return res


def filter_interp_warp_bands_hcw(image_nchw, wtap, plan, *, filter_size=4,
                                 interpret=False):
    """Run the HCW band kernel directly on NCHW input; returns NCHW.

    Geometry: columns are padded by PL = 2*TW on the left so the per-tile
    lane window [t*TW, t*TW + 3*TW) covers every tap column of every valid
    pixel whenever plan["hcw_ok"] (|dx| <= TW - fs per tile); rows as in
    ``filter_interp_warp_bands``.  Lane roll i of bucket (dyk, dxk) aligns
    lane xr with absolute padded column 2*TW + x + dx + i (r = TW + dx + i
    relative to the window start t*TW + ... see _warp_band_hcw_kernel).
    """
    fs = filter_size
    B, C, H, W = image_nchw.shape
    nth, ntw, Hp, Wp = plan["nth"], plan["ntw"], plan["Hp"], plan["Wp"]
    sh, pt, HP = plan["sh"], plan["pt"], plan["HP"]
    # Channels ride the SUBLANE axis in this layout, so they only need the
    # dtype's sublane tile (8 f32 / 16 bf16), not a 128-lane pad: C=67 runs
    # at Cp=72/80 instead of 128 — ~1.6x less window DMA + FMA + shift-matmul
    # work (the NHWC kernels' 128 pad was a lanes-minormost constraint).
    Cp = _ceil_to(C, _sublane(image_nchw.dtype))
    Co = Cp  # output channel trim (sublane-aligned)
    PL = 2 * TW
    WSP = _ceil_to(Wp + 3 * TW, TW)  # lane window of the last tile must fit
    # C zero-pad first, then spatial edge pad (edge rows/cols of the zero
    # channels stay zero), then NCHW -> (B, H, Cp, W) middle-axis swap.
    img_p = jnp.pad(image_nchw, ((0, 0), (0, Cp - C), (0, 0), (0, 0)))
    img_p = jnp.pad(img_p,
                    ((0, 0), (0, 0), (pt, HP - pt - H), (PL, WSP - PL - W)),
                    mode="edge")
    img_p = img_p.transpose(0, 2, 1, 3)  # (B, HP, Cp, WSP)

    G = B * nth
    # wtap rides in the SOURCE dtype: bf16 runs halve the 66 MB weight-plane
    # pipeline (and match the XLA fallback, which casts weights to the patch
    # dtype before its einsum — warp.py _xla_forward); f32 parity runs keep
    # f32 end to end.
    wtap_p = jnp.pad(wtap.astype(image_nchw.dtype),
                     ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
    wtap_r = (wtap_p.reshape(B, fs * fs, nth, TH, ntw, TW)
              .transpose(0, 2, 1, 4, 3, 5).reshape(G, fs * fs * ntw * TH, TW))

    def remap(m):
        return (m.reshape(B, nth, TH, ntw, TW)
                .transpose(0, 1, 3, 2, 4).reshape(G, ntw * TH, TW))

    dyr = remap(plan["dy_rel"])
    dxr = remap(plan["dx_rel"])

    def band_idx(g, *_refs):
        return g, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img_p stays in HBM
            pl.BlockSpec((1, fs * fs * ntw * TH, TW), band_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntw * TH, TW), band_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntw * TH, TW), band_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ntw * TH, Co, TW),
                               lambda g, *_r: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sh, Cp, WSP), img_p.dtype),
            pltpu.VMEM((TH, Cp, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kern(r0s, dylos, r0cs, nxs, nyxs, img, wt, dyrr, dxrr,
             out, win, acc, sem):
        _warp_band_hcw_kernel(fs, nth, ntw, sh, image_nchw.dtype,
                              r0s, dylos, r0cs, nxs, nyxs,
                              img, wt, dyrr, dxrr, out, win, acc, sem)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, ntw * TH, Co, TW), image_nchw.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(plan["row0"], plan["dylo"], plan["r0c"], plan["nxf"], plan["nyx"],
      img_p, wtap_r, dyr, dxr)
    # (B, nb, ntw, TH, Co, TW) -> NCHW in one fused transpose
    out = (out.reshape(B, nth, ntw, TH, Co, TW)
           .transpose(0, 4, 1, 3, 2, 5).reshape(B, Co, Hp, Wp))
    return out[:, :C, :H, :W]
