"""Vimeo-90K video-enhancement demo (reference demo_Vimeo_VE.py): 7-frame
windows -> enhanced im4; per-image PSNR/SSIM (RGB, multichannel) + timers;
metrics.txt summary.

Works out of the box against the fixture subset shipped in the reference
checkout (vimeo_video_enhancement_test/, 4 sequences):
  python -m memcnet_tpu.cli.demo_vimeo_ve \
      --root /root/reference/vimeo_video_enhancement_test --task denoise
"""

import argparse
import contextlib
import os
import time

import imageio.v2 as iio

from memcnet_tpu.cli.runner import PaddedVE, build_model, cfg_jnp_dtype
from memcnet_tpu.data import Vimeo90K
from memcnet_tpu.metrics import AverageMeter, interp_error, psnr, ssim, to_uint8_frame
from memcnet_tpu.utils.config import add_config_args, config_from_args


def run(cfg, root, out_dir, limit=None, trace_dir=None):
    from memcnet_tpu.utils.tracing import device_trace

    model, params = build_model(cfg)
    fwd = PaddedVE(model, params, dtype=cfg_jnp_dtype(cfg))

    ie_m, psnr_m, ssim_m = AverageMeter(), AverageMeter(), AverageMeter()
    proc_t, tot_t = AverageMeter(), AverageMeter()
    ds = Vimeo90K(root, cfg.task or "denoise")
    end = time.time()
    metrics = ""
    stack = contextlib.ExitStack()
    stack.enter_context(device_trace(trace_dir))
    for i, (frames, target, path) in enumerate(ds):
        if limit is not None and i >= limit:
            break
        t0 = time.time()
        out = fwd(frames)
        proc_t.update(time.time() - t0)
        tot_t.update(time.time() - end)
        end = time.time()

        rec_u8 = to_uint8_frame(out)
        if out_dir:
            d = os.path.join(out_dir, path)
            os.makedirs(d, exist_ok=True)
            iio.imwrite(os.path.join(d, "im4.png"), rec_u8)
        gt_u8 = to_uint8_frame(target)
        ie = interp_error(rec_u8, gt_u8)
        p = psnr(rec_u8, gt_u8)
        s = ssim(rec_u8, gt_u8, multichannel=True)
        ie_m.update(ie)
        psnr_m.update(p)
        ssim_m.update(s)
        print(f"{path}: interpolation error / PSNR : {round(ie, 4)} ,\t psnr {round(p, 4)},\t ssim {round(s, 5)}")
        print(f"Per Image Processing Total time (I/O + processing) : {tot_t.avg}")
        print(f"Per Image Processing Total time (processing) : {proc_t.avg}")
        metrics = (f"The average interpolation error / PSNR for all images are : "
                   f"{round(ie_m.avg, 4)},\t  psnr {round(psnr_m.avg, 4)},\t  ssim {round(ssim_m.avg, 4)}")
        print(metrics)
    stack.close()
    if out_dir and metrics:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
            f.write(metrics + "\n")
    return psnr_m.avg, ssim_m.avg


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_config_args(ap)
    ap.add_argument("--root", default="/root/reference/vimeo_video_enhancement_test")
    ap.add_argument("--out-dir", default="./Vimeo-VE-results")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler (XProf) trace here")
    args = ap.parse_args(argv)
    cfg = config_from_args(args, net_name="MEMC_Net_VE")
    return run(cfg, args.root, args.out_dir, args.limit, trace_dir=args.trace_dir)


if __name__ == "__main__":
    main()
