"""Real multi-process distribution (VERDICT r3 #5): two OS processes, each a
JAX process of a 2-process CPU cluster, split one HD-style stream by GOPs
(demo_hd720p --multihost), write disjoint `.part` segments plus a shared
journal, and the stitched output is byte-identical to a 1-process run.

This exercises the only distribution layer no virtual-device dryrun can:
jax.distributed.initialize with process_count > 1, GopScheduler ownership,
part-file output, journal sharing, and parallel.gop.stitch_parts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


H, W, FRAMES, GOP_LEN = 64, 96, 12, 6
NET = "MEMC_Net"  # conv RectifyNet keeps the CPU forward cheap


def _write_stream(path, rng):
    from memcnet_tpu.data.yuv import YUVWrite

    wr = YUVWrite(str(path))
    for _ in range(FRAMES + 1):
        wr.write(rng.randint(0, 256, (H, W, 3)).astype(np.uint8))
    wr.close()


def _demo_args(src, out_dir, journal):
    return [
        "--yuv", str(src), "--height", str(H), "--width", str(W),
        "--frames", str(FRAMES), "--out-dir", str(out_dir),
        "--gop-len", str(GOP_LEN), "--net-name", NET,
        "--journal", str(journal), "--uid", "mh",
    ]


def test_two_process_gop_split_matches_single_process(tmp_path, rng):
    src = tmp_path / "in.yuv"
    _write_stream(src, rng)

    # -- baseline: single process, same frames ------------------------------
    from memcnet_tpu.cli import demo_hd720p

    base_out = tmp_path / "base"
    demo_hd720p.main(_demo_args(src, base_out, tmp_path / "base.journal"))
    base_dir = base_out / "mh"
    base_yuv = (base_dir / "in.yuv").read_bytes()
    base_psnr = sorted(float(x) for x in
                       (base_dir / "in.yuv_psnr_Y.txt").read_text().split())

    # -- 2-process run -------------------------------------------------------
    mh_out = tmp_path / "mh"
    journal = tmp_path / "mh.journal"
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "memcnet_tpu.cli.demo_hd720p",
             *_demo_args(src, mh_out, journal), "--multihost"],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1100)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"process failed:\n{out}\n{err[-3000:]}"
    assert any("process 0/2" in err for _, _, err in outs)
    assert any("process 1/2" in err for _, _, err in outs)

    gen_dir = mh_out / "mh"
    part0, part1 = gen_dir / "in.yuv.part0", gen_dir / "in.yuv.part1"
    assert part0.exists() and part1.exists()
    # both hosts did real, disjoint work
    assert part0.stat().st_size > 0 and part1.stat().st_size > 0
    assert part0.stat().st_size + part1.stat().st_size == len(base_yuv)

    # shared journal holds every GOP exactly once
    gids = [int(x) for x in (journal).read_text().split()]
    from memcnet_tpu.parallel.gop import split_gops, stitch_parts

    assert sorted(gids) == [g.gop_id for g in split_gops(FRAMES + 1, GOP_LEN, 2)]

    # per-frame PSNR set identical to the single-process run
    mh_psnr = sorted(float(x) for x in
                     (gen_dir / "in.yuv_psnr_Y.txt").read_text().split())
    np.testing.assert_allclose(mh_psnr, base_psnr, rtol=0, atol=1e-9)

    # stitched stream byte-identical to the single-process output
    stitched = gen_dir / "stitched.yuv"
    stitch_parts([str(part0), str(part1)], str(stitched),
                 n_frames=FRAMES + 1, height=H, width=W, gop_len=GOP_LEN)
    assert stitched.read_bytes() == base_yuv


def test_stitch_parts_rejects_truncation(tmp_path):
    from memcnet_tpu.parallel.gop import split_gops, stitch_parts

    frame_bytes = H * W * 3 // 2
    gops = split_gops(FRAMES + 1, GOP_LEN, 2)
    # build synthetic parts with one byte missing from the last gop
    parts = [tmp_path / "a.part0", tmp_path / "b.part1"]
    sizes = [0, 0]
    for g in gops:
        sizes[g.gop_id % 2] += len(g.pairs()) * 2 * frame_bytes
    parts[0].write_bytes(b"x" * sizes[0])
    parts[1].write_bytes(b"y" * (sizes[1] - 1))
    with pytest.raises(ValueError, match="truncated"):
        stitch_parts([str(parts[0]), str(parts[1])], str(tmp_path / "out.yuv"),
                     n_frames=FRAMES + 1, height=H, width=W, gop_len=GOP_LEN)
