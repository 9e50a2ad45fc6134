"""Tests for .flo I/O and flow color visualization (reference Flow2Color trees)."""

import numpy as np
import pytest

from memcnet_tpu.utils.flowviz import (
    compute_color,
    flow_to_color,
    make_color_wheel,
    read_flo,
    write_flo,
)


def reference_compute_color(u, v):
    """Direct transcription of PYTHON_Flow2Color/computeColor.py:57-90."""
    u = np.array(u, np.float64, copy=True)
    v = np.array(v, np.float64, copy=True)
    nanIdx = np.isnan(u) | np.isnan(v)
    u[nanIdx] = 0
    v[nanIdx] = 0
    colorwheel = make_color_wheel()
    ncols = colorwheel.shape[0]
    rad = np.sqrt(u * u + v * v)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.int32(np.floor(fk))
    k1 = k0 + 1
    k1[k1 == ncols] = 0
    f = fk - k0
    img = np.zeros([u.shape[0], u.shape[1], 3])
    for i in range(colorwheel.shape[1]):
        temp = colorwheel[:, i]
        col0 = temp[k0] / 255
        col1 = temp[k1] / 255
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        idx = rad > 1
        col[idx] = col[idx] * 0.75
        img[:, :, i] = np.uint8(np.floor(255 * col * (1 - nanIdx)).clip(0.0, 255.0))
    return img


class TestFloIO:
    def test_roundtrip(self, tmp_path, rng):
        flow = rng.randn(5, 7, 2).astype(np.float32)
        p = tmp_path / "x.flo"
        write_flo(flow, p)
        got = read_flo(p)
        np.testing.assert_array_equal(got, flow)

    def test_header_layout(self, tmp_path):
        # byte-level contract: PIEH tag, int32 w, int32 h, float32 payload
        flow = np.zeros((3, 4, 2), np.float32)
        flow[1, 2] = (1.5, -2.5)
        p = tmp_path / "x.flo"
        write_flo(flow, p)
        raw = p.read_bytes()
        assert raw[:4] == b"PIEH"
        assert np.frombuffer(raw[:4], np.float32)[0] == 202021.25
        w, h = np.frombuffer(raw[4:12], np.int32)
        assert (w, h) == (4, 3)
        payload = np.frombuffer(raw[12:], np.float32).reshape(3, 4, 2)
        assert payload[1, 2, 0] == 1.5 and payload[1, 2, 1] == -2.5

    def test_bad_tag_rejected(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"XXXX" + b"\0" * 16)
        with pytest.raises(ValueError, match="bad tag"):
            read_flo(p)


class TestFlowToColor:
    def test_matches_reference_transcription(self, rng):
        u = rng.randn(8, 9) * 0.7
        v = rng.randn(8, 9) * 0.7
        got = compute_color(u, v)
        want = reference_compute_color(u, v)
        np.testing.assert_array_equal(got, want.astype(np.uint8))

    def test_zero_flow_is_white(self):
        img = flow_to_color(np.zeros((4, 4, 2), np.float32))
        assert img.dtype == np.uint8
        # rad==0 -> col = 1 everywhere -> 255 (floor of 255*1.0)
        assert np.all(img == 255)

    def test_unknown_flow_is_black(self):
        flow = np.ones((4, 4, 2), np.float32)
        flow[0, 0] = 1e10
        img = flow_to_color(flow)
        assert np.all(img[0, 0] == 0)

    def test_max_flow_pins_normalization(self, rng):
        flow = rng.randn(6, 6, 2).astype(np.float32)
        a = flow_to_color(flow, max_flow=10.0)
        b = flow_to_color(flow * 2, max_flow=20.0)
        np.testing.assert_allclose(
            a.astype(int), b.astype(int), atol=1
        )  # same direction/radius ratios -> same colors (up to rounding)
