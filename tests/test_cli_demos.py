"""End-to-end CLI demo tests on synthetic datasets (CPU, tiny frames).

These drive the actual entry points — argument parsing, dataset walking,
padding, model forward, metric computation, artifact writing — the way the
reference's demos were its de-facto integration tests (SURVEY.md section 4).
"""

import os

import numpy as np
import imageio.v2 as iio
import pytest


def write_png(path, h, w, seed):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    iio.imwrite(path, rng.randint(0, 256, (h, w, 3)).astype(np.uint8))


@pytest.fixture()
def middlebury_dirs(tmp_path):
    data = tmp_path / "other-data"
    gt = tmp_path / "other-gt-interp"
    for i, name in enumerate(["Alpha", "Beta"]):
        write_png(str(data / name / "frame10.png"), 64, 96, 10 * i)
        write_png(str(data / name / "frame11.png"), 64, 96, 10 * i + 1)
        write_png(str(gt / name / "frame10i11.png"), 64, 96, 10 * i + 2)
    return str(data), str(gt)


class TestDemoMiddlebury:
    def test_end_to_end(self, middlebury_dirs, tmp_path):
        from memcnet_tpu.cli import demo_middlebury

        data, gt = middlebury_dirs
        out = tmp_path / "results"
        results = demo_middlebury.main([
            "--data-dir", data, "--gt-dir", gt, "--out-dir", str(out),
            "--net-name", "MEMC_Net_star",
        ])
        assert len(results) == 2
        for name, ie, p in results:
            assert np.isfinite(ie) and np.isfinite(p)
        # artifacts: interpolated frame + diff image per sequence
        uid_dir = next((out).iterdir())
        for name in ("Alpha", "Beta"):
            files = os.listdir(uid_dir / name)
            assert "frame10i11.png" in files
            assert any(f.startswith("frame10i11_diff") for f in files)


class TestDtypePlumbing:
    def test_bf16_demo_computes_in_bf16(self, middlebury_dirs, tmp_path):
        """--dtype bfloat16 must reach the compute path, not just the params
        (VERDICT r3 #9: the demos used to hardcode fp32 inputs)."""
        import jax.numpy as jnp

        from memcnet_tpu.cli.runner import PaddedInterp, build_model, cfg_jnp_dtype
        from memcnet_tpu.utils.config import Config

        cfg = Config(net_name="MEMC_Net_star", dtype="bfloat16")
        model, params = build_model(cfg)
        assert cfg_jnp_dtype(cfg) == jnp.bfloat16
        fwd = PaddedInterp(model, params, save_which=cfg.save_which,
                           dtype=cfg_jnp_dtype(cfg))
        rng = np.random.RandomState(0)
        x0 = rng.rand(3, 64, 96).astype(np.float32)
        x2 = rng.rand(3, 64, 96).astype(np.float32)
        out, _aux = fwd(x0, x2)
        assert fwd.last_out_dtype == jnp.bfloat16
        assert out.dtype == np.float32 and np.isfinite(out).all()


class TestDemoHD720p:
    def test_end_to_end(self, tmp_path, rng):
        from memcnet_tpu.cli import demo_hd720p
        from memcnet_tpu.data.yuv import YUVWrite

        h, w = 64, 128
        src = tmp_path / "in.yuv"
        wr = YUVWrite(str(src))
        for i in range(7):
            wr.write(rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
        wr.close()

        out = tmp_path / "hd-results"
        psnr_avg, ssim_avg = demo_hd720p.main([
            "--yuv", str(src), "--height", str(h), "--width", str(w),
            "--frames", "6", "--out-dir", str(out),
            "--net-name", "MEMC_Net_star",
        ])
        assert np.isfinite(psnr_avg) and np.isfinite(ssim_avg)
        uid_dir = next(out.iterdir())
        files = os.listdir(uid_dir)
        assert "in.yuv" in files
        assert any(f.endswith("_psnr_Y.txt") for f in files)
        assert any(f.endswith("_ssim_Y.txt") for f in files)
        # output stream holds 2 frames (GT + reconstructed) per processed pair
        n_pairs = len(open(uid_dir / [f for f in files if f.endswith("_psnr_Y.txt")][0]).readlines())
        out_bytes = os.path.getsize(uid_dir / "in.yuv")
        assert out_bytes == n_pairs * 2 * (h * w + 2 * (h // 2) * (w // 2))


class TestDemoVimeoVE:
    @pytest.mark.skipif(
        not os.path.isdir("/root/reference/vimeo_video_enhancement_test"),
        reason="reference fixtures not mounted",
    )
    def test_end_to_end_one_sequence(self, tmp_path):
        from memcnet_tpu.cli import demo_vimeo_ve

        out = tmp_path / "ve-results"
        p, s = demo_vimeo_ve.main([
            "--root", "/root/reference/vimeo_video_enhancement_test",
            "--out-dir", str(out), "--limit", "1", "--task", "denoise",
        ])
        assert np.isfinite(p) and np.isfinite(s)
        assert (out / "metrics.txt").exists()
        assert (out / "00001" / "0266" / "im4.png").exists()
