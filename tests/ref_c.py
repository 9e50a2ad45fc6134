"""Golden oracle: the REFERENCE's own CPU arithmetic, compiled from its
checkout and called through ctypes.

The reference implements every op twice (CUDA + a single-threaded C mirror,
my_lib.c — SURVEY.md N13).  Compiling that C mirror in place (with the tiny
TH shim in ref_c_shim/TH.h) gives a bit-authoritative parity bar that does
not depend on our own hand transcriptions in tests/oracles.py: the JAX ops
are checked against the reference's actual code.

Build is on demand and cached next to this file; tests skip gracefully when
gcc or the reference checkout is unavailable.
"""

import ctypes
import os
import subprocess

REF_SRC = "/root/reference/my_package/src/my_lib.c"
_HERE = os.path.dirname(os.path.abspath(__file__))
_SHIM = os.path.join(_HERE, "ref_c_shim")
_SO = os.path.join(_SHIM, "ref_my_lib.so")


def available():
    if not os.path.exists(REF_SRC):
        return False
    try:
        _lib()
        return True
    except Exception:
        return False


_cached = None


def _lib():
    global _cached
    if _cached is not None:
        return _cached
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(REF_SRC):
        cmd = ["gcc", "-O2", "-shared", "-fPIC", "-I", _SHIM, REF_SRC, "-o", _SO, "-lm"]
        subprocess.run(cmd, check=True, capture_output=True)
    _cached = ctypes.CDLL(_SO)
    return _cached


class _THFloatTensor(ctypes.Structure):
    _fields_ = [
        ("size", ctypes.c_long * 8),
        ("stride", ctypes.c_long * 8),
        ("data", ctypes.POINTER(ctypes.c_float)),
    ]


def _th(arr):
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.float32)
    t = _THFloatTensor()
    strides = [s // 4 for s in arr.strides]
    for i in range(arr.ndim):
        t.size[i] = arr.shape[i]
        t.stride[i] = strides[i]
    t.data = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    return t, arr


def filter_interp_forward(image, flow, filt):
    """FilterInterpolationLayer_cpu_forward (my_lib.c:904)."""
    import numpy as np

    t1, a1 = _th(image)
    t2, a2 = _th(flow)
    t3, a3 = _th(filt)
    out = np.zeros_like(a1)
    to, ao = _th(out)
    rc = _lib().FilterInterpolationLayer_cpu_forward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3), ctypes.byref(to))
    assert rc == 0, f"reference returned error {rc}"
    return ao


def flow_project_forward(flow, fillhole):
    """FlowProjectionLayer_cpu_forward (my_lib.c:1447)."""
    import numpy as np

    t1, a1 = _th(flow)
    B, _, H, W = a1.shape
    count = np.zeros((B, 1, H, W), np.float32)
    out = np.zeros_like(a1)
    tc, ac = _th(count)
    to, ao = _th(out)
    rc = _lib().FlowProjectionLayer_cpu_forward(
        ctypes.byref(t1), ctypes.byref(tc), ctypes.byref(to),
        ctypes.c_int(1 if fillhole else 0))
    assert rc == 0, f"reference returned error {rc}"
    return ao


def depth_flow_project_forward(flow, depth):
    """DepthFlowProjectionLayer_cpu_forward (my_lib.c:1637) -> (out, count).

    The CPU path has no fillhole (my_lib.c:1744 prints 'Not implemented');
    always called with fillhole=0."""
    import numpy as np

    t1, a1 = _th(flow)
    t2, a2 = _th(depth)
    B, _, H, W = a1.shape
    count = np.zeros((B, 1, H, W), np.float32)
    out = np.zeros_like(a1)
    tc, ac = _th(count)
    to, ao = _th(out)
    rc = _lib().DepthFlowProjectionLayer_cpu_forward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(tc), ctypes.byref(to),
        ctypes.c_int(0))
    assert rc == 0, f"reference returned error {rc}"
    return ao, ac


def depth_flow_project_backward(flow, depth, count, output, gout):
    """DepthFlowProjectionLayer_cpu_backward (my_lib.c:1751) ->
    (grad_flow, grad_depth)."""
    import numpy as np

    t1, a1 = _th(flow)
    t2, a2 = _th(depth)
    tc, ac = _th(count)
    to, ao = _th(output)
    tg, ag = _th(gout)
    g1, g2 = np.zeros_like(a1), np.zeros_like(a2)
    tg1, ag1 = _th(g1)
    tg2, ag2 = _th(g2)
    rc = _lib().DepthFlowProjectionLayer_cpu_backward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(tc), ctypes.byref(to),
        ctypes.byref(tg), ctypes.byref(tg1), ctypes.byref(tg2))
    assert rc == 0, f"reference returned error {rc}"
    return ag1, ag2


def weighted_flow_project_forward(flow, frame1, frame2, threshold):
    """WeightedFlowProjectionLayer_cpu_forward (my_lib.c:1879) ->
    (out, weight, count); CPU path has no fillhole."""
    import numpy as np

    t1, a1 = _th(flow)
    t2, a2 = _th(frame1)
    t3, a3 = _th(frame2)
    B, _, H, W = a1.shape
    count = np.zeros((B, 1, H, W), np.float32)
    weight = np.zeros((B, 1, H, W), np.float32)
    out = np.zeros_like(a1)
    tc, ac = _th(count)
    tw, aw = _th(weight)
    to, ao = _th(out)
    fn = _lib().WeightedFlowProjectionLayer_cpu_forward
    fn.argtypes = [ctypes.POINTER(_THFloatTensor)] * 6 + [
        ctypes.c_int, ctypes.c_float]
    fn.restype = ctypes.c_int
    rc = fn(ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3),
            ctypes.byref(tc), ctypes.byref(tw), ctypes.byref(to),
            0, threshold)
    assert rc == 0, f"reference returned error {rc}"
    return ao, aw, ac


def weighted_flow_project_backward(flow, frame1, frame2, count, weight, gout,
                                   threshold):
    """WeightedFlowProjectionLayer_cpu_backward (my_lib.c:2030) -> grad_flow."""
    import numpy as np

    t1, a1 = _th(flow)
    t2, a2 = _th(frame1)
    t3, a3 = _th(frame2)
    tc, ac = _th(count)
    tw, aw = _th(weight)
    tg, ag = _th(gout)
    g1 = np.zeros_like(a1)
    tg1, ag1 = _th(g1)
    fn = _lib().WeightedFlowProjectionLayer_cpu_backward
    fn.argtypes = [ctypes.POINTER(_THFloatTensor)] * 7 + [ctypes.c_float]
    fn.restype = ctypes.c_int
    rc = fn(ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3),
            ctypes.byref(tc), ctypes.byref(tw), ctypes.byref(tg),
            ctypes.byref(tg1), threshold)
    assert rc == 0, f"reference returned error {rc}"
    return ag1


def filter_interp_backward(image, flow, filt, gout):
    """FilterInterpolationLayer_cpu_backward (my_lib.c:1082) ->
    (grad_image, grad_flow, grad_filt)."""
    import numpy as np

    t1, a1 = _th(image)
    t2, a2 = _th(flow)
    t3, a3 = _th(filt)
    tg, ag = _th(gout)
    g1, g2, g3 = np.zeros_like(a1), np.zeros_like(a2), np.zeros_like(a3)
    tg1, ag1 = _th(g1)
    tg2, ag2 = _th(g2)
    tg3, ag3 = _th(g3)
    rc = _lib().FilterInterpolationLayer_cpu_backward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3), ctypes.byref(tg),
        ctypes.byref(tg1), ctypes.byref(tg2), ctypes.byref(tg3))
    assert rc == 0, f"reference returned error {rc}"
    return ag1, ag2, ag3


def separable_conv_backward(image, vert, horiz, gout):
    """SeparableConvLayer_cpu_backward (my_lib.c:340) ->
    (grad_image, grad_vert, grad_horiz)."""
    import numpy as np

    t1, a1 = _th(image)
    t2, a2 = _th(vert)
    t3, a3 = _th(horiz)
    tg, ag = _th(gout)
    g1, g2, g3 = np.zeros_like(a1), np.zeros_like(a2), np.zeros_like(a3)
    tg1, ag1 = _th(g1)
    tg2, ag2 = _th(g2)
    tg3, ag3 = _th(g3)
    rc = _lib().SeparableConvLayer_cpu_backward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3), ctypes.byref(tg),
        ctypes.byref(tg1), ctypes.byref(tg2), ctypes.byref(tg3))
    assert rc == 0, f"reference returned error {rc}"
    return ag1, ag2, ag3


def _floats(lib, name, n_ptr, n_float):
    fn = getattr(lib, name)
    fn.argtypes = [ctypes.POINTER(_THFloatTensor)] * n_ptr + [ctypes.c_float] * n_float
    fn.restype = ctypes.c_int
    return fn


def weight_layer_forward(frame1, frame2, flow, lambda_e):
    """WeightLayer_cpu_forward (my_lib.c:2251); lambda_v is dead, Nw=3."""
    import numpy as np

    t1, a1 = _th(frame1)
    t2, a2 = _th(frame2)
    t3, a3 = _th(flow)
    out = np.zeros((a1.shape[0], 1, a1.shape[2], a1.shape[3]), np.float32)
    to, ao = _th(out)
    fn = _floats(_lib(), "WeightLayer_cpu_forward", 4, 3)
    rc = fn(ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3),
            ctypes.byref(to), lambda_e, 0.0, 3.0)
    assert rc == 0, f"reference returned error {rc}"
    return ao


def weight_layer_backward(frame1, frame2, flow, out, gout, lambda_e):
    """WeightLayer_cpu_backward (my_lib.c:2419) -> (g_frame1, g_frame2, g_flow)."""
    import numpy as np

    t1, a1 = _th(frame1)
    t2, a2 = _th(frame2)
    t3, a3 = _th(flow)
    to, ao = _th(out)
    tg, ag = _th(gout)
    g1, g2, g3 = np.zeros_like(a1), np.zeros_like(a2), np.zeros_like(a3)
    tg1, ag1 = _th(g1)
    tg2, ag2 = _th(g2)
    tg3, ag3 = _th(g3)
    fn = _floats(_lib(), "WeightLayer_cpu_backward", 8, 3)
    rc = fn(ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(t3),
            ctypes.byref(to), ctypes.byref(tg),
            ctypes.byref(tg1), ctypes.byref(tg2), ctypes.byref(tg3),
            lambda_e, 0.0, 3.0)
    assert rc == 0, f"reference returned error {rc}"
    return ag1, ag2, ag3


def pixel_value_backward(values, flow, flow_weights, gout, sigma_d):
    """PixelValueLayer_cpu_backward (my_lib.c:2742) ->
    (g_values, g_flow, g_flow_weights); tao_r dead, Prowindow=2."""
    import numpy as np

    t1, a1 = _th(values)
    t3, a3 = _th(flow)
    tw, aw = _th(flow_weights)
    tg, ag = _th(gout)
    g1, g3, gw = np.zeros_like(a1), np.zeros_like(a3), np.zeros_like(aw)
    tg1, ag1 = _th(g1)
    tg3, ag3 = _th(g3)
    tgw, agw = _th(gw)
    fn = _floats(_lib(), "PixelValueLayer_cpu_backward", 7, 3)
    rc = fn(ctypes.byref(t1), ctypes.byref(t3), ctypes.byref(tw),
            ctypes.byref(tg), ctypes.byref(tg1), ctypes.byref(tg3),
            ctypes.byref(tgw), sigma_d, 0.0, 2.0)
    assert rc == 0, f"reference returned error {rc}"
    return ag1, ag3, agw


def pixel_weight_backward(flow, flow_weights, out, gout, sigma_d,
                          threshold=-1.0):
    """PixelWeightLayer_cpu_backward (my_lib.c:3008) -> (g_flow, g_fw).

    threshold < 0 disables the reference's small-denominator gradient gate
    (grads skipped where forward output < threshold), giving the plain
    transpose autodiff computes."""
    import numpy as np

    t3, a3 = _th(flow)
    tw, aw = _th(flow_weights)
    to, ao = _th(out)
    tg, ag = _th(gout)
    g3, gw = np.zeros_like(a3), np.zeros_like(aw)
    tg3, ag3 = _th(g3)
    tgw, agw = _th(gw)
    fn = _floats(_lib(), "PixelWeightLayer_cpu_backward", 6, 4)
    rc = fn(ctypes.byref(t3), ctypes.byref(tw), ctypes.byref(to),
            ctypes.byref(tg), ctypes.byref(tg3), ctypes.byref(tgw),
            threshold, sigma_d, 0.0, 2.0)
    assert rc == 0, f"reference returned error {rc}"
    return ag3, agw


def reliable_weight_backward(flow, out, gout, sigma_d, threshold=-1.0):
    """ReliableWeightLayer_cpu_backward (my_lib.c:3289) -> g_flow."""
    import numpy as np

    t3, a3 = _th(flow)
    to, ao = _th(out)
    tg, ag = _th(gout)
    g3 = np.zeros_like(a3)
    tg3, ag3 = _th(g3)
    fn = _floats(_lib(), "ReliableWeightLayer_cpu_backward", 4, 4)
    rc = fn(ctypes.byref(t3), ctypes.byref(to), ctypes.byref(tg),
            ctypes.byref(tg3), threshold, sigma_d, 0.0, 2.0)
    assert rc == 0, f"reference returned error {rc}"
    return ag3


def bilinear_warp_forward(image, flow):
    """InterpolationLayer_cpu_forward (my_lib.c:440; C must be 3)."""
    import numpy as np

    t1, a1 = _th(image)
    t2, a2 = _th(flow)
    out = np.zeros_like(a1)
    to, ao = _th(out)
    rc = _lib().InterpolationLayer_cpu_forward(
        ctypes.byref(t1), ctypes.byref(t2), ctypes.byref(to))
    assert rc == 0, f"reference returned error {rc}"
    return ao
