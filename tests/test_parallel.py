"""Multi-device tests on the 8-device virtual CPU mesh: mesh construction,
DP+SP sharded forward, and the shard_map halo-exchange tiled warp vs the
global op."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.sharding import PartitionSpec as P

from memcnet_tpu.ops import filter_interp_warp
from memcnet_tpu.parallel.mesh import frame_sharding, make_mesh, replicated
from memcnet_tpu.parallel.tiling import tiled_filter_interp_warp


class TestMesh:
    def test_factorization(self):
        mesh = make_mesh(8)
        assert dict(mesh.shape) == {"data": 2, "tile": 4}
        mesh = make_mesh(8, max_tile=1)
        assert dict(mesh.shape) == {"data": 8, "tile": 1}
        mesh = make_mesh(1)
        assert dict(mesh.shape) == {"data": 1, "tile": 1}


class TestTiledWarp:
    @pytest.mark.parametrize("halo", [16, 32])
    def test_matches_global(self, rng, halo):
        mesh = make_mesh(8, max_tile=4)
        B, C, H, W = 2, 3, 32, 256
        image = rng.rand(B, C, H, W).astype(np.float32)
        # flows within the halo budget
        flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 2 * (halo - 6)
        filt = rng.rand(B, 16, H, W).astype(np.float32)

        want = np.asarray(filter_interp_warp(image, flow, filt))
        got = np.asarray(tiled_filter_interp_warp(mesh, image, flow, filt, halo=halo))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_out_of_budget_flow_clamped(self, rng):
        # |fx| beyond the halo budget is clamped — outputs stay finite and
        # invalid pixels still pass through.
        mesh = make_mesh(8, max_tile=4)
        B, C, H, W = 1, 3, 16, 256
        image = rng.rand(B, C, H, W).astype(np.float32)
        flow = np.full((B, 2, H, W), 300.0, np.float32)
        filt = rng.rand(B, 16, H, W).astype(np.float32)
        out = np.asarray(tiled_filter_interp_warp(mesh, image, flow, filt, halo=16))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, image)  # everything invalid -> passthrough


class TestShardedForward:
    def test_dp_sp_forward(self, rng):
        from memcnet_tpu import models as M

        mesh = make_mesh(8)
        model = M.get_model("MEMC_Net")
        params = jax.device_put(model.init_params(jr.PRNGKey(0)), replicated(mesh))
        fsh = frame_sharding(mesh)
        x0 = jax.device_put(rng.rand(2, 3, 128, 512).astype(np.float32), fsh)
        x2 = jax.device_put(rng.rand(2, 3, 128, 512).astype(np.float32), fsh)
        fwd = jax.jit(lambda p, a, b: model.forward(p, a, b)[0][1], out_shardings=fsh)
        out = jax.block_until_ready(fwd(params, x0, x2))
        assert out.shape == (2, 3, 128, 512)
        assert np.isfinite(np.asarray(out)).all()


class TestTiledFlowProject:
    @pytest.mark.parametrize("fillhole", [False, True])
    def test_matches_global(self, rng, fillhole):
        from memcnet_tpu.ops import flow_project
        from memcnet_tpu.parallel.tiling import tiled_flow_project

        mesh = make_mesh(8, max_tile=4)
        B, H, W = 2, 32, 256
        halo = 16
        # flows within the halo budget horizontally; vertical unrestricted
        flow = np.stack(
            [
                (rng.rand(B, H, W) - 0.5) * 2 * (halo - 2),
                (rng.rand(B, H, W) - 0.5) * 2 * 20,
            ],
            axis=1,
        ).astype(np.float32)

        want = np.asarray(flow_project(flow, fillhole=fillhole))
        got = np.asarray(tiled_flow_project(mesh, flow, halo=halo, fillhole=fillhole))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_cross_shard_fill(self, rng):
        """A hole in one shard must fill from a projection in ANOTHER shard
        (the ring-carried scan continuation)."""
        from memcnet_tpu.ops import flow_project
        from memcnet_tpu.parallel.tiling import tiled_flow_project

        mesh = make_mesh(8, max_tile=4)
        B, H, W = 1, 8, 256
        # zero flow everywhere -> every cell hit (no holes); then make a hole
        # band by pointing a whole shard's flows out of frame (invalid ->
        # nothing scatters there from itself, and neighbors' zero flows do
        # not reach it) — the fill must import values across the boundary.
        flow = np.zeros((B, 2, H, W), np.float32)
        flow[:, 1, :, 64:128] = 1000.0  # shard 1 pixels scatter nowhere
        want = np.asarray(flow_project(flow, fillhole=True))
        got = np.asarray(tiled_flow_project(mesh, flow, halo=16, fillhole=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # sanity: the hole region is actually filled with the neighbors' value
        assert np.all(np.isfinite(got))


class TestTiled2D:
    """(tile_h, tile_w) 2-D spatial grid (VERDICT r3 #6 / SURVEY section 2.4
    planned axes): halo exchange both axes, projection spill in 2-D with
    corner routing, fill scans carried both ways."""

    def _mesh(self):
        from memcnet_tpu.parallel.mesh import make_mesh_2d

        return make_mesh_2d(8, tile_h=2, tile_w=2)  # data=2, tile_h=2, tile=2

    def test_mesh_factory(self):
        mesh = self._mesh()
        assert dict(mesh.shape) == {"data": 2, "tile_h": 2, "tile": 2}

    @pytest.mark.parametrize("halo", [16, 32])
    def test_warp_matches_global(self, rng, halo):
        mesh = self._mesh()
        B, C, H, W = 2, 3, 64, 128
        image = rng.rand(B, C, H, W).astype(np.float32)
        flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 2 * (halo - 6)
        filt = rng.rand(B, 16, H, W).astype(np.float32)
        want = np.asarray(filter_interp_warp(image, flow, filt))
        got = np.asarray(tiled_filter_interp_warp(
            mesh, image, flow, filt, halo=halo, axis_h="tile_h",
            batch_axis="data"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("fillhole", [False, True])
    def test_project_matches_global(self, rng, fillhole):
        from memcnet_tpu.ops import flow_project
        from memcnet_tpu.parallel.tiling import tiled_flow_project

        mesh = self._mesh()
        B, H, W = 2, 64, 128
        flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 20.0
        want = np.asarray(flow_project(flow, fillhole=fillhole))
        got = np.asarray(tiled_flow_project(
            mesh, flow, halo=16, fillhole=fillhole, axis_h="tile_h",
            batch_axis="data"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_project_cross_shard_vertical_fill(self, rng):
        """A hole in the bottom H shard must fill from a projection that
        lives only in the top H shard (up-scan carried across tile_h)."""
        from memcnet_tpu.ops import flow_project
        from memcnet_tpu.parallel.tiling import tiled_flow_project

        mesh = self._mesh()
        B, H, W = 2, 64, 128
        # all flows land in the top-left corner region -> most cells are
        # holes; vertical fill must cross the H shard boundary
        flow = np.zeros((B, 2, H, W), np.float32)
        flow[:, 0] = -np.arange(W)[None, None, :] % 7
        flow[:, 1] = -np.arange(H)[None, :, None] + 5.0
        flow[:, 1] = np.clip(flow[:, 1], -14.0, 14.0)
        want = np.asarray(flow_project(flow, fillhole=True))
        got = np.asarray(tiled_flow_project(
            mesh, flow, halo=16, fillhole=True, axis_h="tile_h",
            batch_axis="data"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_spatial_tiling_context_2d(self, rng):
        """The op-level dispatch honors axis_h under the context."""
        from memcnet_tpu.parallel.context import spatial_tiling
        from memcnet_tpu.ops import flow_project

        mesh = self._mesh()
        B, H, W = 2, 64, 128
        flow = (rng.rand(B, 2, H, W).astype(np.float32) - 0.5) * 10.0
        want = np.asarray(flow_project(flow, fillhole=True))
        with spatial_tiling(mesh, halo=16, axis_h="tile_h"):
            got = np.asarray(flow_project(flow, fillhole=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
