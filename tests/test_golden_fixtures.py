"""Golden tests over the reference repo's shipped Vimeo enhancement fixtures
(vimeo_video_enhancement_test/, 2 videos x sr/dn/db degradations + targets).

These pin (a) the data-layer + metric protocol on real files, and (b) golden
degraded-input-vs-target PSNR values that are weight-independent — the same
regression role the reference's demo metric printouts played (SURVEY.md
section 4 "golden-metric integration runs").
"""

import os

import numpy as np
import pytest

FIXTURES = "/root/reference/vimeo_video_enhancement_test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def seqs():
    with open(os.path.join(FIXTURES, "sep_testlist.txt")) as f:
        return [line.strip() for line in f if line.strip()]


def _task_available(task):
    """The reference ships the deblock dir as dead symlinks into the authors'
    /tmp4 scratch — skip tasks whose fixture files aren't actually readable."""
    from memcnet_tpu.data.vimeo90k import TASK_DIRS

    probe = os.path.join(FIXTURES, TASK_DIRS[task], "00001", "0266", "im4.png")
    return os.path.exists(probe)  # follows symlinks


def _require(task):
    if not _task_available(task):
        pytest.skip(f"{task} fixtures are dead symlinks in the reference")


class TestLoader:
    def test_testlist_matches_reference(self, seqs):
        assert seqs == ["00001/0266", "00001/0268", "00096/0866", "00096/0865"]

    @pytest.mark.parametrize("task", ["denoise", "sr", "deblock"])
    def test_window_shapes(self, task, seqs):
        from memcnet_tpu.data.vimeo90k import load_window

        _require(task)

        frames, target = load_window(FIXTURES, seqs[0], task)
        assert len(frames) == 7
        assert frames[0].shape == target.shape == (3, 256, 448)
        assert frames[0].dtype == np.float32
        assert 0.0 <= frames[0].min() and frames[0].max() <= 1.0

    def test_dataset_iterates_all(self, seqs):
        from memcnet_tpu.data import Vimeo_90K_dn

        ds = Vimeo_90K_dn(FIXTURES, paths=seqs)
        items = list(ds)
        assert len(items) == 4
        for frames, target, path in items:
            assert len(frames) == 7 and path in seqs


class TestGoldenDegradationPSNR:
    """PSNR(degraded im4, target im4) on the 0-255 scale of the demo protocol
    (demo_Vimeo_VE.py:154-160) — weight-free values that pin loader + metric."""

    # exact values pinned r5 (VERDICT r4 weak #4): the loader + metric are
    # bit-deterministic, so numeric drift in either fails here instead of
    # waiting for a human to read PERF.md.  Sequence order = sorted paths.
    GOLDEN = {
        "denoise": [22.422521378240475, 23.202354783672206,
                    23.937922647711964, 23.757108511439327],
        "sr": [29.11745649780235, 26.28503900687075,
               33.136941812255756, 32.112894697376056],
        "deblock": None,  # fixture symlinks dead in the reference checkout
    }

    @pytest.mark.parametrize("task", ["denoise", "sr", "deblock"])
    def test_degraded_psnr_reproducible(self, task, seqs):
        from memcnet_tpu.data.vimeo90k import load_window
        from memcnet_tpu.metrics import psnr

        _require(task)

        vals = []
        for s in seqs:
            frames, target = load_window(FIXTURES, s, task)
            vals.append(float(psnr(frames[3] * 255.0, target * 255.0)))
        want = self.GOLDEN[task]
        if want is not None:
            # order-independent: the seqs fixture's directory order is
            # filesystem-dependent, the VALUES are the pinned artifact
            np.testing.assert_allclose(sorted(vals), sorted(want),
                                       rtol=0, atol=1e-9)
        else:
            assert all(10.0 < v < 60.0 for v in vals), (task, vals)
        # determinism: reloading gives bit-identical metrics
        frames2, target2 = load_window(FIXTURES, seqs[0], task)
        assert psnr(frames2[3] * 255.0, target2 * 255.0) == vals[0]


class TestVEProtocolSmoke:
    def test_ve_forward_on_fixture_crop(self, seqs):
        """End-to-end MEMC_Net_VE on a real fixture window (128x128 crop,
        random weights): exercises the demo_Vimeo_VE protocol path."""
        import jax.numpy as jnp
        import jax.random as jr

        from memcnet_tpu import models as M
        from memcnet_tpu.data.vimeo90k import load_window
        from memcnet_tpu.metrics import psnr, ssim

        frames, target = load_window(FIXTURES, seqs[0], "denoise")
        crop = [jnp.asarray(f[None, :, :128, :128]) for f in frames]
        model = M.get_model("MEMC_Net_VE")
        params = model.init_params(jr.PRNGKey(0))
        out = model.forward(params, crop)
        out = np.asarray(out)[0]
        assert out.shape == (3, 128, 128)
        assert np.isfinite(out).all()
        p = psnr(np.clip(out, 0, 1) * 255.0, target[:, :128, :128] * 255.0)
        s = ssim(np.clip(out, 0, 1).transpose(1, 2, 0), target[:, :128, :128].transpose(1, 2, 0),
                 multichannel=True, data_range=1.0)
        assert np.isfinite(p) and -1.0 <= s <= 1.0


class TestForwardChecksumGuard:
    """Small-geometry analogue of the bench checksum (VERDICT r4 weak #4):
    MEMC_Net_star forward sums at a fixed seed, pinned so numeric drift in
    any op on the star path fails CI instead of silently moving PERF.md's
    hardware checksum.  f32 on CPU; tolerance covers reduction-order noise
    across XLA releases, not semantic drift."""

    def test_star_forward_checksum(self):
        import jax.numpy as jnp
        import jax.random as jr

        from memcnet_tpu import models as M

        model = M.get_model("MEMC_Net_star")
        params = model.init_params(jr.PRNGKey(0))
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
        x2 = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
        (interp, rect), *_ = model.forward(params, x0, x2)
        np.testing.assert_allclose(float(jnp.sum(interp)), 397.3996887207031,
                                   rtol=2e-5)
        np.testing.assert_allclose(float(jnp.sum(rect)), 17026.98046875,
                                   rtol=2e-5)
