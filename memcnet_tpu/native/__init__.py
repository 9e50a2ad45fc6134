"""ctypes binding for the native host-runtime library (yuv_native.cpp).

Compile-on-demand: the shared library is built with g++ into this directory
the first time it is needed (and rebuilt when the source changes, keyed by
mtime+size).  Everything degrades gracefully — ``available()`` returns False
and callers fall back to the pure-numpy implementations in
memcnet_tpu/data/yuv.py, which double as the test oracle.

This is the framework's counterpart to the reference's native build
(my_package/build.py + install.bash) — except the device compute here is
JAX/XLA/Pallas, so the native layer owns only the host data path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "yuv_native.cpp")
_LIB = os.path.join(_DIR, "libmemcnet_native.so")
_STAMP = os.path.join(_DIR, ".build_stamp")

_lock = threading.Lock()
_lib = None
_tried = False


def _src_stamp():
    st = os.stat(_SRC)
    return f"{st.st_mtime_ns}:{st.st_size}"


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(_STAMP, "w") as f:
        f.write(_src_stamp())


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            fresh = os.path.exists(_LIB) and os.path.exists(_STAMP) and \
                open(_STAMP).read() == _src_stamp()
            if not fresh:
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.yuv420_to_rgb.argtypes = [u8p, u8p, u8p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.rgb_to_yuv420.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u8p, u8p, u8p]
        lib.rgb_to_y.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.yuv_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.yuv_reader_open.restype = ctypes.c_void_p
        lib.yuv_reader_num_frames.argtypes = [ctypes.c_void_p]
        lib.yuv_reader_num_frames.restype = ctypes.c_int64
        lib.yuv_reader_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.yuv_reader_read_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.yuv_reader_read_rgb.restype = ctypes.c_int
        lib.yuv_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def yuv420_to_rgb(y, u, v):
    """(H,W) u8 Y + (H/2,W/2) u8 U,V planes -> (H,W,3) u8 RGB."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    h, w = y.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.yuv420_to_rgb(_u8p(y), _u8p(u), _u8p(v), h, w, _u8p(out))
    return out


def rgb_to_yuv420(rgb):
    """(H,W,3) u8 RGB -> ((H,W), (H/2,W/2), (H/2,W/2)) u8 planes."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    y = np.empty((h, w), np.uint8)
    u = np.empty((h // 2, w // 2), np.uint8)
    v = np.empty((h // 2, w // 2), np.uint8)
    lib.rgb_to_yuv420(_u8p(rgb), h, w, _u8p(y), _u8p(u), _u8p(v))
    return y, u, v


def rgb_to_y(rgb):
    """(H,W,3) u8 RGB -> (H,W) u8 Y plane (demo_HD720p PSNR-Y protocol)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((h, w), np.uint8)
    lib.rgb_to_y(_u8p(rgb), h, w, _u8p(out))
    return out


class NativeYUVReader:
    """Prefetching YUV420 stream reader (background pread thread in C++).

    API mirrors memcnet_tpu.data.yuv.YUVRead's read(offset) -> (rgb, ok);
    `stride` hints the access pattern so the worker stages frame+stride
    during this frame's conversion (demo_HD720p reads step 2).
    """

    def __init__(self, path, h, w, stride=1):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._h = np.empty(0)  # placate linters
        self.h, self.w = h, w
        self.stride = stride
        self._handle = lib.yuv_reader_open(str(path).encode(), h, w)
        if not self._handle:
            raise OSError(f"cannot open {path}")

    def num_frames(self):
        return int(self._lib.yuv_reader_num_frames(self._handle))

    def prefetch(self, frame):
        self._lib.yuv_reader_prefetch(self._handle, frame)

    def read(self, frame):
        out = np.empty((self.h, self.w, 3), np.uint8)
        ok = self._lib.yuv_reader_read_rgb(self._handle, frame, self.stride, _u8p(out))
        return (out, True) if ok else (None, False)

    def close(self):
        if self._handle:
            self._lib.yuv_reader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
