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
