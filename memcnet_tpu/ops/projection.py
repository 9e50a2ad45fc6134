"""Flow projection ops: scatter a forward flow to the intermediate time step.

TPU-native formulation: the reference's atomicAdd scatter
(my_lib_kernel.cu:1630-1694) becomes an XLA scatter-add (``.at[].add``), which
on TPU is deterministic (fixed combine order) — a strict improvement over the
nondeterministic-FP-order CUDA atomics, with identical values.

Reference semantics (file:line under /root/reference/my_package/src/):
  * scatter: each source pixel p with flow f lands at x2 = p + f; if
    0 <= x2 <= W-1 and 0 <= y2 <= H-1, scatter **-f** (and +1 to a counter)
    into the 4 integer neighbors (T/B x L/R), with R/B clamped to the border —
    when clamped, the same cell receives the contribution twice, which we
    reproduce (my_lib_kernel.cu:1664-1690).
  * averaging: divide by the counter where it is > 0 (:1696-1739).
  * fillhole (eval only; FlowProjectionLayer.py:15 sets fillhole=1 iff the
    input does not require grad): for count==0 pixels, scan left/right/up/down
    for the nearest projected pixel and average the found values (:1742-1836).
    The reference's down-scan is dead code — ``while(down_temp = 0.0f && ...)``
    at :1799 assigns instead of comparing, so the loop never runs.  We
    reproduce that bug by default for numeric parity with shipped weights and
    expose ``fix_down_scan_bug=True`` to enable the (intended) 4th direction.
  * backward (:1837-1901): grad_f(p) = -sum_{4 neighbors} g[n]/count[n].
    Autodiff of this forward produces exactly that (count has no gradient —
    it is a function of integer landing cells only), so no custom VJP needed.

Also here: DepthFlowProjectionLayer (my_lib_kernel.cu:2053-2516) — DAIN-style
depth-weighted projection — and WeightedFlowProjectionLayer (:2518-3024) —
brightness-constancy-gated projection. Both reuse the same scatter machinery.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp


def _landing_cells(flow):
    """Integer neighbor cells + validity for flow (B,2,H,W)."""
    B, two, H, W = flow.shape
    assert two == 2, f"flow must have 2 channels, got {two}"
    dt = flow.dtype
    xs = jnp.arange(W, dtype=dt)[None, None, :]
    ys = jnp.arange(H, dtype=dt)[None, :, None]
    fx, fy = flow[:, 0], flow[:, 1]
    x2 = xs + fx
    y2 = ys + fy
    valid = (x2 >= 0.0) & (y2 >= 0.0) & (x2 <= W - 1.0) & (y2 <= H - 1.0)
    ixL = jnp.clip(x2.astype(jnp.int32), 0, W - 1)
    iyT = jnp.clip(y2.astype(jnp.int32), 0, H - 1)
    ixR = jnp.minimum(ixL + 1, W - 1)
    iyB = jnp.minimum(iyT + 1, H - 1)
    return valid, ixL, ixR, iyT, iyB


def _shift_fold_last(a, axis):
    """Shift +1 along `axis` folding the last slice onto itself — the linear
    image of "scatter to min(i+1, L-1)": contributions that would fall off
    the border land on the border instead (my_lib_kernel.cu:1668-1669
    ixR/iyB clamps)."""
    L = a.shape[axis]
    shifted = jnp.roll(a, 1, axis=axis)
    # zero the wrapped-in first slice, fold the (pre-shift) last slice back
    first = [slice(None)] * a.ndim
    first[axis] = slice(0, 1)
    last = [slice(None)] * a.ndim
    last[axis] = slice(L - 1, L)
    shifted = shifted.at[tuple(first)].set(0.0)
    return shifted.at[tuple(last)].add(a[tuple(last)])


def _base_scatter_xla(payload, lin, H, W):
    """One XLA scatter-add of all payload planes into the base cells.

    TPU note: XLA scatter costs ~65 ns per update descriptor (a scalar-core
    loop; measured v5e), so descriptor count is everything: channels-last so
    each update writes one contiguous (K+1)-slice; indices are pre-clipped
    in-bounds, so promising it removes the per-update bounds check."""
    B, P = payload.shape[:2]
    upd = payload.reshape(B, P, -1).transpose(0, 2, 1)
    base = jnp.zeros((B, H * W, P), payload.dtype)
    base = base.at[jnp.arange(B)[:, None], lin].add(upd, mode="promise_in_bounds")
    return base.transpose(0, 2, 1).reshape(B, P, H, W)


@lru_cache(maxsize=None)
def _fast_base_scatter(H, W, interpret=False):
    """custom_vjp base scatter: forward runs the Pallas banded bucket-scatter
    (ops/pallas/scatter_kernel.py) with in-graph whole-batch XLA fallback for
    over-budget flows; backward is the exact transpose of the linear
    scatter-add (a gather of the cotangent at the landing cells — identical
    to autodiff of the XLA path, and to the reference backward's
    grad-at-landing-cells structure, my_lib_kernel.cu:1837-1901)."""
    from memcnet_tpu.ops.pallas import scatter_kernel as sk

    def impl(payload, dy, dx, valid, lin):
        plan = sk.plan_bands(dy, dx, valid)

        def pallas_branch(_):
            out = sk.scatter_bands(payload.astype(jnp.float32), plan,
                                   interpret=interpret)
            return out.astype(payload.dtype)

        def xla_branch(_):
            return _base_scatter_xla(payload, lin, H, W)

        return jax.lax.cond(plan["ok"], pallas_branch, xla_branch, None)

    @jax.custom_vjp
    def op(payload, dy, dx, valid, lin):
        return impl(payload, dy, dx, valid, lin)

    def fwd(payload, dy, dx, valid, lin):
        return impl(payload, dy, dx, valid, lin), lin

    def bwd(lin, g):
        B, P = g.shape[:2]
        gp = jnp.take_along_axis(
            g.reshape(B, P, H * W), lin[:, None, :], axis=2,
            mode="promise_in_bounds",
        )
        # the fast path requires the source grid == target grid (H, W)
        return gp.reshape(B, P, H, W), None, None, None, None

    op.defvjp(fwd, bwd)
    return op


_FORCE_INTERPRET = False  # tests: run the Pallas scatter path interpreted on CPU


def _scatter_use_pallas(Hs, Ws, H, W):
    from memcnet_tpu.ops.pallas.scatter_kernel import TH
    from memcnet_tpu.ops.warp import _use_pallas

    if Hs != H or Ws != W or Hs % TH != 0:
        return False
    return _FORCE_INTERPRET or _use_pallas()


def _scatter4(values, weights, valid, ixL, ixR, iyT, iyB, H, W):
    """Scatter-add `values` (B,K,H,W) and `weights` (B,H,W) into the 4 landing
    neighbors. Returns (out (B,K,H,W), count (B,H,W)).

    Only the base scatter is a real scatter — the 4 landing cells are the
    base cell (iyT, ixL) plus CONSTANT (0/1, 0/1) offsets, so the three
    neighbors are border-folding shifts of its result (4x fewer updates;
    260 ms -> ~70 ms for B=2 at 720p).  On TPU the base scatter itself runs
    the Pallas banded bucket-scatter (vectorized shifted adds instead of
    XLA's ~65 ns/update scalar loop) with exact whole-batch fallback."""
    B, K, Hs, Ws = values.shape  # source grid may be narrower than the
    # (H, W) target grid (tiled projection scatters into a halo-extended
    # buffer, parallel/tiling.tiled_flow_project)
    payload = jnp.concatenate([values, weights[:, None]], axis=1)
    payload = jnp.where(valid[:, None], payload, 0.0)
    lin = (iyT * W + ixL).reshape(B, Hs * Ws)
    if _scatter_use_pallas(Hs, Ws, H, W):
        ys = jnp.arange(Hs, dtype=jnp.int32)[None, :, None]
        xs = jnp.arange(Ws, dtype=jnp.int32)[None, None, :]
        S = _fast_base_scatter(H, W, _FORCE_INTERPRET)(
            payload, iyT - ys, ixL - xs, valid, lin)
    else:
        S = _base_scatter_xla(payload, lin, H, W)
    T = S + _shift_fold_last(S, axis=3)   # + (iyT, ixR)
    out = T + _shift_fold_last(T, axis=2)  # + (iyB, ixL/ixR)
    return out[:, :K], out[:, K]


def _last_valid_scan(has, vals, axis, reverse=False):
    """Propagate the nearest valid value along `axis` (gather-free: the value
    rides the scan instead of being fetched by index afterwards)."""

    def combine(a, b):
        ah, av = a
        bh, bv = b
        return jnp.logical_or(bh, ah), jnp.where(bh, bv, av)

    h, v = jax.lax.associative_scan(combine, (has, vals), axis=axis, reverse=reverse)
    return h, v


def _directional_fill(avg_flow, count, fix_down_scan_bug):
    """Masked directional 'nearest projected value' fill for count==0 holes.

    The reference's per-pixel while-loop searches (my_lib_kernel.cu:1780-1802)
    become four masked associative scans carrying (seen_valid, value).  On
    TPU the default (dead down-scan) case runs the Pallas fill kernel
    (ops/pallas/fill_kernel.py) — the XLA associative scans lower to ~200
    slice/pad rounds costing ~7 ms at 720p; gradients (never taken in
    practice: fillhole is eval-only) route through the XLA formulation."""
    if not fix_down_scan_bug and avg_flow.shape[1] == 2 and _scatter_use_pallas(
            avg_flow.shape[2], avg_flow.shape[3], avg_flow.shape[2], avg_flow.shape[3]):
        return _fast_fill(_FORCE_INTERPRET)(avg_flow, count)
    return _directional_fill_xla(avg_flow, count, fix_down_scan_bug)


def _fast_fill(interpret=False, _cache={}):
    if interpret not in _cache:
        import jax as _jax

        @_jax.custom_vjp
        def op(avg, cnt):
            from memcnet_tpu.ops.pallas.fill_kernel import fill_holes

            return fill_holes(avg, cnt, interpret=interpret)

        def fwd(avg, cnt):
            from memcnet_tpu.ops.pallas.fill_kernel import fill_holes

            # Pallas fill for the training value too (fill is eval-only in
            # the reference, but VE-style pipelines may differentiate through
            # it); backward stays the XLA scans' exact VJP.
            return fill_holes(avg, cnt, interpret=interpret), (avg, cnt)

        def bwd(res, g):
            _, vjp = _jax.vjp(
                lambda a, c: _directional_fill_xla(a, c, False), *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        _cache[interpret] = op
    return _cache[interpret]


def _directional_fill_xla(avg_flow, count, fix_down_scan_bug):
    has = jnp.broadcast_to((count > 0.0)[:, None], avg_flow.shape)

    dirs = [
        _last_valid_scan(has, avg_flow, axis=3),                  # left
        _last_valid_scan(has, avg_flow, axis=3, reverse=True),    # right
        _last_valid_scan(has, avg_flow, axis=2),                  # up
    ]
    if fix_down_scan_bug:
        dirs.append(_last_valid_scan(has, avg_flow, axis=2, reverse=True))
    # else: reference my_lib_kernel.cu:1799 `while(down_temp = 0.0f && ...)`
    # never executes the down search -> weight and value are both 0.

    num = jnp.zeros_like(avg_flow)
    den = jnp.zeros_like(avg_flow)
    for exists, val in dirs:
        w = exists.astype(avg_flow.dtype)
        num = num + val * w
        den = den + w
    hole = (~has) & (den > 0.0)
    filled = num / jnp.where(den > 0.0, den, 1.0)
    return jnp.where(hole, filled, avg_flow)


def flow_project(flow, *, fillhole=False, fix_down_scan_bug=False):
    """Project forward flow F_{t->t+1} to time t (negated-average scatter).

    Args:
      flow: (B, 2, H, W).
      fillhole: fill count==0 holes from neighbors (eval-time only in the
        reference, FlowProjectionLayer.py:15).
      fix_down_scan_bug: enable the down-direction scan the reference
        accidentally disabled (my_lib_kernel.cu:1799).

    Under an active ``parallel.spatial_tiling`` context the op dispatches to
    the shard_map scatter-reduce implementation (W sharded over the tile axis;
    halo spill rides ppermute; the tiled fill always reproduces the
    reference's dead down-scan).
    """
    from memcnet_tpu.parallel.context import active_tiling

    t = active_tiling()
    if t is not None:
        if fix_down_scan_bug:
            raise NotImplementedError(
                "fix_down_scan_bug is not supported on the tiled projection path"
            )
        from memcnet_tpu.parallel.tiling import tiled_flow_project

        return tiled_flow_project(
            t.mesh, flow, halo=t.halo, fillhole=fillhole,
            axis=t.axis, batch_axis=t.batch_axis,
            axis_h=t.axis_h, halo_h=t.halo_h,
        )
    return _global_flow_project(flow, fillhole=fillhole, fix_down_scan_bug=fix_down_scan_bug)


@partial(jax.jit, static_argnames=("fillhole", "fix_down_scan_bug"))
def _global_flow_project(flow, *, fillhole=False, fix_down_scan_bug=False):
    B, _, H, W = flow.shape
    valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
    out, cnt = _scatter4(-flow, jnp.ones_like(flow[:, 0]), valid, ixL, ixR, iyT, iyB, H, W)
    avg = out / jnp.where(cnt > 0.0, cnt, 1.0)[:, None]
    if fillhole:
        avg = _directional_fill(avg, cnt, fix_down_scan_bug)
    return avg


def _gather_neighbors(planes, iy, ix, W):
    """Gather `planes` (B,P,H,W) at per-pixel integer cells (iy, ix)."""
    B, P = planes.shape[:2]
    lin = (iy * W + ix).reshape(B, 1, -1)
    g = jnp.take_along_axis(
        planes.reshape(B, P, -1), lin, axis=2, mode="promise_in_bounds")
    return g.reshape(planes.shape)


def _depth_project_core(flow, depth):
    B, _, H, W = flow.shape
    valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
    d = depth[:, 0]
    out, cnt = _scatter4(-flow * depth, d, valid, ixL, ixR, iyT, iyB, H, W)
    avg = out / jnp.where(cnt > 0.0, cnt, 1.0)[:, None]
    return avg, cnt


@jax.custom_vjp
def _depth_project(flow, depth):
    return _depth_project_core(flow, depth)


def _depth_project_fwd(flow, depth):
    avg, cnt = _depth_project_core(flow, depth)
    return (avg, cnt), (flow, depth, avg, cnt)


def _depth_project_bwd(res, cot):
    """The reference's hand-derived backward (my_lib.c:1751-1877, CUDA
    :2270-2380), which is NOT the true gradient of the forward: the depth
    gradient uses (f(p) - avg[n]) where autodiff of avg = -sum(d*f)/sum(d)
    would give (f(p) + avg[n]).  Replicated exactly for training parity.
    count==0 divisions (possible only where depth == 0 everywhere that lands
    on a cell) are guarded to 0 instead of the reference's inf."""
    flow, depth, avg, cnt = res
    g, _ = cot  # no gradient flows through the count output
    B, _, H, W = flow.shape
    valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
    gdivc = g / jnp.where(cnt > 0.0, cnt, 1.0)[:, None]
    planes = jnp.concatenate([gdivc, avg], axis=1)  # (B,4,H,W)
    gflow = jnp.zeros_like(flow)
    gdepth = jnp.zeros_like(depth[:, 0])
    for iy, ix in ((iyT, ixL), (iyT, ixR), (iyB, ixL), (iyB, ixR)):
        got = _gather_neighbors(planes, iy, ix, W)
        gc, av = got[:, :2], got[:, 2:]
        gflow = gflow - gc * depth
        gdepth = gdepth - jnp.sum(gc * (flow - av), axis=1)
    m = valid
    return (jnp.where(m[:, None], gflow, 0.0),
            jnp.where(m[:, None], gdepth[:, None], 0.0))


_depth_project.defvjp(_depth_project_fwd, _depth_project_bwd)


@partial(jax.jit, static_argnames=("fillhole",))
def depth_flow_project(flow, depth, *, fillhole=False):
    """Depth-weighted flow projection (DAIN-style).

    Reference: DepthFlowProjectionLayer, my_lib.c:1637-1751 (CUDA
    my_lib_kernel.cu:2053-2516).  Each source pixel scatters depth(p) * -f(p)
    and depth(p) into the 4 landing neighbors; the average is the
    depth-weighted mean of -f.  Backward replicates the reference's
    hand-derived gradient (see _depth_project_bwd).  Fillhole uses the shared
    directional fill with the reference's dead down-scan (the N7 CUDA fill has
    the same assignment-instead-of-compare bug at my_lib_kernel.cu:2227).
    No Python call site ships in the reference (exported capability only,
    SURVEY.md N7).

    Args:
      flow: (B,2,H,W);  depth: (B,1,H,W) positive weights.
    Returns:
      projected flow (B,2,H,W).
    """
    avg, cnt = _depth_project(flow, depth)
    if fillhole:
        avg = _directional_fill(avg, cnt, False)
    return avg


@partial(jax.jit, static_argnames=("fillhole",))
def weighted_flow_project(flow, frame1, frame2, *, threshold=20.0 / 255.0, fillhole=False):
    """Brightness-constancy-gated flow projection.

    Reference: WeightedFlowProjectionLayer, my_lib.c:1879-2030 (CUDA
    my_lib_kernel.cu:2518-3024).  Per source pixel p with in-range landing
    point p+f: sample frame2 at the NEAREST pixel of p+2f (int cast of the
    [0, W-1]-clamped coordinate, my_lib.c:1959-1960), photometric error
    err = mean_c |frame1(p,c) - frame2(nn,c)| + 1e-8; only pixels with
    err <= threshold scatter.  Gated pixels scatter plain -f with a +1 count
    AND the raw err into a separate weight plane; output and weight plane are
    both divided by the count (my_lib.c:2005-2016).  Backward (autodiff here)
    = -sum_n g[n]/count[n] over gated pixels = the reference's hand backward
    (my_lib.c:2030-2160).  Fillhole (GPU-only in the reference, with the dead
    down-scan bug at my_lib_kernel.cu:2732) fills the flow output's holes.
    Exported capability only in the reference (SURVEY.md N8).

    Args:
      flow: (B,2,H,W); frame1, frame2: (B,3,H,W).
    Returns:
      (projected flow (B,2,H,W), weight plane (B,1,H,W)).
    """
    B, _, H, W = flow.shape
    dt = flow.dtype
    xs = jnp.arange(W, dtype=dt)[None, None, :]
    ys = jnp.arange(H, dtype=dt)[None, :, None]
    x3 = jnp.clip(xs + 2.0 * flow[:, 0], 0.0, W - 1.0).astype(jnp.int32)
    y3 = jnp.clip(ys + 2.0 * flow[:, 1], 0.0, H - 1.0).astype(jnp.int32)
    samp = _gather_neighbors(frame2, y3, x3, W)
    diff = jnp.abs(frame1 - samp)
    # accumulate |d|/3 per channel in the reference's order (my_lib.c:1965-1971)
    err = diff[:, 0] / 3.0 + diff[:, 1] / 3.0 + diff[:, 2] / 3.0 + 1e-8

    valid, ixL, ixR, iyT, iyB = _landing_cells(flow)
    gate = valid & (err <= threshold)
    payload = jnp.concatenate([-flow, err[:, None]], axis=1)
    out, cnt = _scatter4(payload, jnp.ones_like(err), gate, ixL, ixR, iyT, iyB, H, W)
    den = jnp.where(cnt > 0.0, cnt, 1.0)
    avg = out[:, :2] / den[:, None]
    wavg = out[:, 2:] / den[:, None]
    if fillhole:
        avg = _directional_fill(avg, cnt, False)
    return avg, wavg
