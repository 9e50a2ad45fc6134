"""Streaming HD 2x interpolation over YUV420 files (reference demo_HD720p.py):
read frames 0..100 step 2, interpolate the mid frame, write GT + reconstructed
frames to an output stream, Y-channel PSNR/SSIM per frame with per-file logs.

  python -m memcnet_tpu.cli.demo_hd720p --yuv input.yuv --height 720 \
      --width 1280 --out-dir ./HD-results --net-name MEMC_Net_star

Unlike the reference's serial loop (demo_HD720p.py:68-151), the stream is cut
into GOPs (parallel.gop.GopScheduler): independent, journaled, restartable
work units distributed round-robin across hosts.  `--multihost` initializes
the JAX distributed runtime (jax.distributed.initialize) so N hosts, each
with its own chips, split one stream; `--journal` makes completions durable
so a crashed host's GOPs can be re-run.  `--trace-dir` wraps the run in a
jax.profiler trace (XProf), and StageTimers report proc/total per item
(the reference's AverageMeter protocol, demo_Vimeo_VE.py:97-98).
"""

import argparse
import os
import random
import sys

from memcnet_tpu.cli.runner import PaddedInterp, build_model, cfg_jnp_dtype
from memcnet_tpu.data import YUVRead, YUVWrite
from memcnet_tpu.metrics import AverageMeter, interp_error, psnr, ssim, to_uint8_frame, y_channel_u8
from memcnet_tpu.parallel.gop import GopScheduler
from memcnet_tpu.utils.config import add_config_args, config_from_args
from memcnet_tpu.utils.tracing import StageTimers, device_trace


def run(cfg, yuv_path, height, width, out_dir, frames=100, step=2, *,
        gop_len=16, journal=None, trace_dir=None, uid=None):
    model, params = build_model(cfg)
    fwd = PaddedInterp(model, params, save_which=cfg.save_which, dtype=cfg_jnp_dtype(cfg))

    sched = GopScheduler(frames + 1, gop_len=gop_len, step=step,
                         journal_path=journal)
    uid = uid or str(random.randint(0, 100000))
    gen_dir = os.path.join(out_dir, uid)
    os.makedirs(gen_dir, exist_ok=True)
    name = os.path.basename(yuv_path)

    # native prefetching reader when the C++ runtime is built; numpy fallback
    from memcnet_tpu import native

    if native.available():
        reader = native.NativeYUVReader(yuv_path, height, width, stride=step)
    else:
        reader = YUVRead(yuv_path, height, width)
    # each host writes its own stream segment file (GOPs are disjoint)
    suffix = f".part{sched.process_index}" if sched.process_count > 1 else ""
    writer = YUVWrite(os.path.join(gen_dir, name + suffix))

    ie_m, psnr_m, ssim_m = AverageMeter(), AverageMeter(), AverageMeter()
    timers = StageTimers()
    pending = sched.pending()
    done0, total0 = sched.progress()
    print(f"host {sched.process_index}/{sched.process_count}: "
          f"{len(pending)} pending GOPs ({done0}/{total0} journaled done)",
          file=sys.stderr)

    with device_trace(trace_dir):
        for gop in pending:
            for i0, i2, imid in gop.pairs():
                with timers.item():
                    f0, ok0 = reader.read(i0)
                    f2, ok2 = reader.read(i2)
                    gt, okg = reader.read(imid)
                    if not (ok0 and ok2 and okg):
                        break
                    x0 = f0.transpose(2, 0, 1).astype("float32") / 255.0
                    x2 = f2.transpose(2, 0, 1).astype("float32") / 255.0
                    with timers.model():
                        out, _ = fwd(x0, x2)
                    rec_u8 = to_uint8_frame(out)
                    writer.write(f0)
                    writer.write(rec_u8)

                    rec_y = y_channel_u8(rec_u8)
                    gt_y = y_channel_u8(gt)
                    ie = interp_error(rec_y, gt_y)
                    p = psnr(rec_y, gt_y)
                    s = ssim(rec_y, gt_y, multichannel=False)
                    ie_m.update(ie)
                    psnr_m.update(p)
                    ssim_m.update(s)
                    print(f"frame {imid}: interpolation error / PSNR : {round(ie, 4)} ,\t psnr {round(p, 4)},\t ssim {round(s, 5)}")
                    with open(os.path.join(gen_dir, name + "_psnr_Y.txt"), "a+") as fh:
                        fh.write(f"{p}\n")
                    with open(os.path.join(gen_dir, name + "_ssim_Y.txt"), "a+") as fh:
                        fh.write(f"{s}\n")
            sched.mark_done(gop)
    print(f"The average interpolation error / PSNR for all images are : "
          f"{round(ie_m.avg, 4)},\t psnr {round(psnr_m.avg, 4)},\t ssim {round(ssim_m.avg, 4)}")
    print(timers.summary(), file=sys.stderr)
    reader.close()
    writer.close()
    return psnr_m.avg, ssim_m.avg


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_config_args(ap)
    ap.add_argument("--yuv", required=True)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out-dir", default="./HD720p-results")
    ap.add_argument("--gop-len", type=int, default=16,
                    help="frames per restartable GOP work unit")
    ap.add_argument("--journal", default=None,
                    help="completion journal path (enables crash restart)")
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler (XProf) trace here")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize the JAX distributed runtime "
                         "(JAX_COORDINATOR_ADDRESS etc. or TPU metadata)")
    args = ap.parse_args(argv)
    if args.multihost:
        import jax

        # The session image's sitecustomize force-registers the axon TPU
        # backend ahead of JAX_PLATFORMS; honor the env explicitly so a
        # CPU-platform multi-process run (JAX_PLATFORMS=cpu, coordinator via
        # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID) works.
        if os.environ.get("JAX_PLATFORMS"):
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        # jax 0.9 only auto-detects process topology on managed clusters
        # (TPU metadata, SLURM, ...); for plain multi-process launches pass
        # the three standard env vars through explicitly.
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        print(f"distributed runtime up: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices",
              file=sys.stderr)
    cfg = config_from_args(args)
    return run(cfg, args.yuv, args.height, args.width, args.out_dir,
               args.frames, gop_len=args.gop_len, journal=args.journal,
               trace_dir=args.trace_dir, uid=cfg.uid)


if __name__ == "__main__":
    main()
