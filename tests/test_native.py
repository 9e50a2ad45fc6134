"""Native C++ host-runtime tests: YUV conversions and the prefetching reader
must match the pure-numpy implementations in memcnet_tpu/data/yuv.py (the
oracle), byte-for-byte on the uint8 outputs up to 1 ulp of float64 rounding.
"""

import numpy as np
import pytest

from memcnet_tpu import native
from memcnet_tpu.data.yuv import YUVRead, YUVWrite
from memcnet_tpu.metrics.quality import y_channel_u8

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def write_stream(path, frames_yuv):
    """frames_yuv: list of (y (H,W), u (H/2,W/2), v (H/2,W/2)) uint8."""
    with open(path, "wb") as f:
        for y, u, v in frames_yuv:
            y.tofile(f)
            u.tofile(f)
            v.tofile(f)


def rand_frame(rng, h, w):
    return (
        rng.randint(0, 256, (h, w)).astype(np.uint8),
        rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
        rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
    )


class TestConversions:
    def test_yuv420_to_rgb_matches_python(self, rng, tmp_path):
        h, w = 16, 24
        y, u, v = rand_frame(rng, h, w)
        write_stream(tmp_path / "s.yuv", [(y, u, v)])
        ref = YUVRead(tmp_path / "s.yuv", h, w)
        want, ok = ref.read(0)
        ref.close()
        assert ok
        got = native.yuv420_to_rgb(y, u, v)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"max diff {diff.max()}"
        assert (diff > 0).mean() < 1e-3

    def test_rgb_to_yuv420_matches_python(self, rng, tmp_path):
        h, w = 16, 24
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        wr = YUVWrite(tmp_path / "o.yuv")
        wr.write(rgb)
        wr.close()
        raw = np.fromfile(tmp_path / "o.yuv", np.uint8)
        want_y = raw[: h * w].reshape(h, w)
        want_u = raw[h * w : h * w + h * w // 4].reshape(h // 2, w // 2)
        want_v = raw[h * w + h * w // 4 :].reshape(h // 2, w // 2)
        y, u, v = native.rgb_to_yuv420(rgb)
        for got, want in ((y, want_y), (u, want_u), (v, want_v)):
            diff = np.abs(got.astype(int) - want.astype(int))
            assert diff.max() <= 1

    def test_rgb_to_y_matches_python(self, rng):
        rgb = rng.randint(0, 256, (12, 14, 3)).astype(np.uint8)
        got = native.rgb_to_y(rgb)
        want = y_channel_u8(rgb)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


class TestNativeReader:
    def test_matches_python_reader(self, rng, tmp_path):
        h, w = 16, 24
        frames = [rand_frame(rng, h, w) for _ in range(5)]
        write_stream(tmp_path / "s.yuv", frames)

        ref = YUVRead(tmp_path / "s.yuv", h, w)
        rd = native.NativeYUVReader(tmp_path / "s.yuv", h, w, stride=2)
        assert rd.num_frames() == ref.num_frames() == 5
        for i in [0, 2, 4, 1, 3, 0]:  # strided + random revisit
            want, ok1 = ref.read(i)
            got, ok2 = rd.read(i)
            assert ok1 and ok2
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        rd.close()
        ref.close()

    def test_eof(self, rng, tmp_path):
        h, w = 8, 8
        write_stream(tmp_path / "s.yuv", [rand_frame(rng, h, w)])
        rd = native.NativeYUVReader(tmp_path / "s.yuv", h, w)
        out, ok = rd.read(1)
        assert not ok and out is None
        rd.close()

    def test_prefetch_path(self, rng, tmp_path):
        h, w = 8, 8
        frames = [rand_frame(rng, h, w) for _ in range(4)]
        write_stream(tmp_path / "s.yuv", frames)
        rd = native.NativeYUVReader(tmp_path / "s.yuv", h, w, stride=1)
        rd.prefetch(0)
        ref = YUVRead(tmp_path / "s.yuv", h, w)
        for i in range(4):  # sequential: each read staged by the previous one
            got, ok = rd.read(i)
            want, _ = ref.read(i)
            assert ok
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        rd.close()
        ref.close()
