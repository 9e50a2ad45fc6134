"""Slow numpy loop oracles transcribing the reference kernels' semantics.

These play the role the reference's single-threaded CPU mirror (my_lib.c)
played for its CUDA kernels (SURVEY.md N13) — an independent, obviously-correct
implementation the vectorized XLA ops and Pallas kernels are tested against.
Each function documents the my_lib_kernel.cu lines it transcribes.
"""

import numpy as np


def filter_interp_oracle(image, flow, filt, filter_size=4):
    """my_lib_kernel.cu:1087-1218 (FilterInterpolationLayer forward)."""
    B, C, H, W = image.shape
    fs = filter_size
    out = np.zeros_like(image)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx = flow[b, 0, h, w]
                fy = flow[b, 1, h, w]
                x2 = w + fx
                y2 = h + fy
                if (
                    x2 >= 0 and y2 >= 0 and x2 <= W - 1 and y2 <= H - 1
                    and abs(fx) < W / 2.0 and abs(fy) < H / 2.0
                ):
                    ix2_L = int(x2) + 1 - fs // 2
                    iy2_T = int(y2) + 1 - fs // 2
                    ix2_R = ix2_L + fs
                    iy2_B = iy2_T + fs
                    alpha = x2 - int(x2)
                    beta = y2 - int(y2)
                    for c in range(C):
                        TL = TR = BL = BR = 0.0
                        for fj in range(iy2_T, iy2_B):
                            _fj = min(max(0, fj), H - 1)
                            for fi in range(ix2_L, ix2_R):
                                _fi = min(max(0, fi), W - 1)
                                v = image[b, c, _fj, _fi] * filt[
                                    b, (fj - iy2_T) * fs + (fi - ix2_L), h, w
                                ]
                                if fj <= int(y2):
                                    if fi <= int(x2):
                                        TL += v
                                    else:
                                        TR += v
                                else:
                                    if fi <= int(x2):
                                        BL += v
                                    else:
                                        BR += v
                        out[b, c, h, w] = (
                            (1 - alpha) * (1 - beta) * TL
                            + alpha * (1 - beta) * TR
                            + (1 - alpha) * beta * BL
                            + alpha * beta * BR
                        )
                else:
                    out[b, :, h, w] = image[b, :, h, w]
    return out


def bilinear_warp_oracle(image, flow):
    """my_lib_kernel.cu:507-576 (InterpolationLayer forward)."""
    B, C, H, W = image.shape
    out = np.zeros_like(image)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                x2 = w + flow[b, 0, h, w]
                y2 = h + flow[b, 1, h, w]
                if 0 <= x2 < W and 0 <= y2 < H:
                    ixL = int(x2)
                    iyT = int(y2)
                    ixR = min(ixL + 1, W - 1)
                    iyB = min(iyT + 1, H - 1)
                    a = x2 - ixL
                    bb = y2 - iyT
                    out[b, :, h, w] = (
                        (1 - a) * (1 - bb) * image[b, :, iyT, ixL]
                        + a * (1 - bb) * image[b, :, iyT, ixR]
                        + (1 - a) * bb * image[b, :, iyB, ixL]
                        + a * bb * image[b, :, iyB, ixR]
                    )
    return out


def flow_project_oracle(flow, fillhole=False, fix_down_scan_bug=False):
    """my_lib_kernel.cu:1630-1836 (scatter :1630-1694, averaging :1696-1739,
    fillhole :1742-1836 with the dead down-scan at :1799)."""
    B, _, H, W = flow.shape
    out = np.zeros_like(flow)
    cnt = np.zeros((B, H, W), flow.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx = flow[b, 0, h, w]
                fy = flow[b, 1, h, w]
                x2 = w + fx
                y2 = h + fy
                if 0 <= x2 <= W - 1 and 0 <= y2 <= H - 1:
                    ixL = int(x2)
                    iyT = int(y2)
                    ixR = min(ixL + 1, W - 1)
                    iyB = min(iyT + 1, H - 1)
                    for iy in (iyT, iyB):
                        for ix in (ixL, ixR):
                            out[b, 0, iy, ix] += -fx
                            out[b, 1, iy, ix] += -fy
                            cnt[b, iy, ix] += 1
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if cnt[b, h, w] > 0:
                    out[b, :, h, w] /= cnt[b, h, w]
    if fillhole:
        filled = out.copy()
        for b in range(B):
            for h in range(H):
                for w in range(W):
                    if cnt[b, h, w] > 0:
                        continue
                    # directional scans as in the kernel
                    lo, lt = w, 0.0
                    while lt == 0.0 and lo - 1 >= 0:
                        lo -= 1
                        lt = cnt[b, h, lo]
                    ro, rt = w, 0.0
                    while rt == 0.0 and ro + 1 <= W - 1:
                        ro += 1
                        rt = cnt[b, h, ro]
                    uo, ut = h, 0.0
                    while ut == 0.0 and uo - 1 >= 0:
                        uo -= 1
                        ut = cnt[b, uo, w]
                    do_, dt = h, 0.0
                    if fix_down_scan_bug:
                        while dt == 0.0 and do_ + 1 <= H - 1:
                            do_ += 1
                            dt = cnt[b, do_, w]
                    # else: reference bug — down search never runs (cu:1799)
                    if lt + rt + ut + dt <= 0.0:
                        continue
                    lt, rt, ut, dt = (
                        1.0 if lt > 0 else 0.0,
                        1.0 if rt > 0 else 0.0,
                        1.0 if ut > 0 else 0.0,
                        1.0 if dt > 0 else 0.0,
                    )
                    den = lt + rt + ut + dt
                    for ch in range(2):
                        filled[b, ch, h, w] = (
                            lt * out[b, ch, h, lo]
                            + rt * out[b, ch, h, ro]
                            + ut * out[b, ch, uo, w]
                            + dt * out[b, ch, do_, w]
                        ) / den
        out = filled
    return out


def depth_flow_project_oracle(flow, depth):
    """my_lib.c:1637-1751 (DepthFlowProjectionLayer forward, no fillhole on
    the CPU path) -> (out, count)."""
    B, _, H, W = flow.shape
    out = np.zeros_like(flow)
    cnt = np.zeros((B, H, W), flow.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx = flow[b, 0, h, w]
                fy = flow[b, 1, h, w]
                x2 = w + fx
                y2 = h + fy
                if 0 <= x2 <= W - 1 and 0 <= y2 <= H - 1:
                    ixL = int(x2)
                    iyT = int(y2)
                    ixR = min(ixL + 1, W - 1)
                    iyB = min(iyT + 1, H - 1)
                    d = depth[b, 0, h, w]
                    for iy in (iyT, iyB):
                        for ix in (ixL, ixR):
                            out[b, 0, iy, ix] += -d * fx
                            out[b, 1, iy, ix] += -d * fy
                            cnt[b, iy, ix] += d
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if cnt[b, h, w] > 0:
                    out[b, :, h, w] /= cnt[b, h, w]
    return out, cnt


def weighted_flow_project_oracle(flow, frame1, frame2, threshold):
    """my_lib.c:1879-2030 (WeightedFlowProjectionLayer forward, no fillhole
    on the CPU path) -> (out, weight, count)."""
    B, _, H, W = flow.shape
    out = np.zeros_like(flow)
    wgt = np.zeros((B, H, W), flow.dtype)
    cnt = np.zeros((B, H, W), flow.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx = flow[b, 0, h, w]
                fy = flow[b, 1, h, w]
                x2 = w + fx
                y2 = h + fy
                if 0 <= x2 <= W - 1 and 0 <= y2 <= H - 1:
                    x3 = int(max(min(w + 2.0 * fx, W - 1.0), 0.0))
                    y3 = int(max(min(h + 2.0 * fy, H - 1.0), 0.0))
                    err = 0.0
                    for c in range(3):
                        err += abs(frame1[b, c, h, w] - frame2[b, c, y3, x3]) / 3.0
                    err += 1e-8
                    if err <= threshold:
                        ixL = int(x2)
                        iyT = int(y2)
                        ixR = min(ixL + 1, W - 1)
                        iyB = min(iyT + 1, H - 1)
                        for iy in (iyT, iyB):
                            for ix in (ixL, ixR):
                                out[b, 0, iy, ix] += -fx
                                out[b, 1, iy, ix] += -fy
                                wgt[b, iy, ix] += err
                                cnt[b, iy, ix] += 1.0
    for b in range(B):
        for h in range(H):
            for w in range(W):
                if cnt[b, h, w] > 0:
                    out[b, :, h, w] /= cnt[b, h, w]
                    wgt[b, h, w] /= cnt[b, h, w]
    return out, wgt, cnt


def separable_conv_oracle(image, vert, horiz):
    """my_lib_kernel.cu:285-337 (SeparableConvLayer forward)."""
    B, C, H, W = image.shape
    fs = vert.shape[1]
    oH, oW = H - fs + 1, W - fs + 1
    out = np.zeros((B, C, oH, oW), image.dtype)
    for b in range(B):
        for h in range(oH):
            for w in range(oW):
                for c in range(C):
                    acc = 0.0
                    for j in range(fs):
                        for i in range(fs):
                            acc += (
                                image[b, c, h + j, w + i]
                                * vert[b, j, h, w]
                                * horiz[b, i, h, w]
                            )
                    out[b, c, h, w] = acc
    return out


def separable_conv_flow_oracle(vert, horiz):
    """my_lib_kernel.cu:19-84 (SeparableConvFlowLayer forward)."""
    B, fs, oH, oW = vert.shape
    out = np.zeros((B, 2, oH, oW), vert.dtype)
    for b in range(B):
        for h in range(oH):
            for w in range(oW):
                for (ch, k) in ((1, vert), (0, horiz)):
                    s = 0.0
                    c = 0.0
                    for j in range(fs):
                        c += j * k[b, j, h, w]
                        s += k[b, j, h, w]
                    val = c / s - (fs - 1.0) / 2.0 if s != 0.0 else 0.0
                    out[b, ch, h, w] = val if abs(s) > 0.0 else -2000.0
    return out


def occlusion_weight_oracle(frame1, frame2, flow, lambda_e=0.02):
    """my_lib_kernel.cu:3026-3126 (WeightLayer forward), Nw=3."""
    B, C, H, W = frame1.shape
    out = np.zeros((B, 1, H, W), frame1.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx, fy = flow[b, 0, h, w], flow[b, 1, h, w]
                x2, y2 = w + fx, h + fy
                if not (0.0 <= x2 <= W - 1 and 0.0 <= y2 <= H - 1):
                    out[b, 0, h, w] = 1e-4
                    continue
                ixL, iyT = int(x2), int(y2)
                ixR, iyB = min(ixL + 1, W - 1), min(iyT + 1, H - 1)
                a, be = x2 - ixL, y2 - iyT
                err = 0.0
                for m in (-1, 0, 1):
                    p1m = min(max(0, m + h), H - 1)
                    for n in (-1, 0, 1):
                        p1n = min(max(0, n + w), W - 1)
                        mT = min(max(0, m + iyT), H - 1)
                        nL = min(max(0, n + ixL), W - 1)
                        mB = min(max(0, m + iyB), H - 1)
                        nR = min(max(0, n + ixR), W - 1)
                        for c in range(C):
                            tgt = (
                                (1 - a) * (1 - be) * frame2[b, c, mT, nL]
                                + a * (1 - be) * frame2[b, c, mT, nR]
                                + (1 - a) * be * frame2[b, c, mB, nL]
                                + a * be * frame2[b, c, mB, nR]
                            )
                            err += abs(frame1[b, c, p1m, p1n] - tgt)
                err /= C * 9.0
                out[b, 0, h, w] = (1 - err / lambda_e) ** 2
    return out


def pixel_splat_oracle(values, flow, flow_weights, sigma_d=1.0):
    """my_lib_kernel.cu:3398-3473 + :3689-3755 (PixelValue/PixelWeight fwd)."""
    B, C, H, W = values.shape
    out_v = np.zeros((B, C, H, W), values.dtype)
    out_w = np.zeros((B, 1, H, W), values.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx, fy = flow[b, 0, h, w], flow[b, 1, h, w]
                x2, y2 = w + fx / 2.0, h + fy / 2.0
                if not (0.0 <= x2 <= W - 1 and 0.0 <= y2 <= H - 1):
                    continue
                ixL, iyT = int(x2), int(y2)
                a, be = x2 - ixL, y2 - iyT
                fw = flow_weights[b, 0, h, w]
                for m in range(-1, 3):
                    for n in range(-1, 3):
                        pm = min(max(0, m + iyT), H - 1)
                        pn = min(max(0, n + ixL), W - 1)
                        g = 1.0 - ((be - m) ** 2 + (a - n) ** 2) / (2 * sigma_d**2)
                        g = g * g
                        out_w[b, 0, pm, pn] += fw * g
                        for c in range(C):
                            out_v[b, c, pm, pn] += fw * g * values[b, c, h, w]
    return out_v, out_w


def reliable_weight_oracle(flow, sigma_d=1.0):
    """my_lib_kernel.cu:3967-4045 (ReliableWeightLayer forward)."""
    B, _, H, W = flow.shape
    out = np.zeros((B, 1, H, W), flow.dtype)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                fx, fy = flow[b, 0, h, w], flow[b, 1, h, w]
                x2, y2 = w + fx / 2.0, h + fy / 2.0
                if not (0.0 <= x2 <= W - 1 and 0.0 <= y2 <= H - 1):
                    continue
                ixL, iyT = int(x2), int(y2)
                a, be = x2 - ixL, y2 - iyT
                for m in range(-1, 3):
                    for n in range(-1, 3):
                        pm = min(max(0, m + iyT), H - 1)
                        pn = min(max(0, n + ixL), W - 1)
                        g = 1.0 - ((be - m) ** 2 + (a - n) ** 2) / (2 * sigma_d**2)
                        out[b, 0, pm, pn] += g * g
    return out
