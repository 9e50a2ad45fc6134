"""Middlebury 'other' interpolation demo — the reference's primary entry
point (demo_MiddleBury.py), reproduced protocol-for-protocol: per-sequence
frame10/frame11 -> frame10i11, pad-to-x128, per-image interpolation error +
PSNR against ground truth, running averages, diff-image artifacts.

Usage:
  python -m memcnet_tpu.cli.demo_middlebury --data-dir .../other-data \
      --gt-dir .../other-gt-interp --out-dir ./results \
      --net-name MEMC_Net_star --pretrained MEMC-Net_star_best.pth
"""

import argparse
import contextlib
import os
import random
import sys
import time

import numpy as np
import imageio.v2 as iio

from memcnet_tpu.cli.runner import PaddedInterp, build_model, cfg_jnp_dtype
from memcnet_tpu.data import MiddleburyOther
from memcnet_tpu.metrics import AverageMeter, interp_error, psnr, to_uint8_frame
from memcnet_tpu.utils.config import add_config_args, config_from_args


def run(cfg, data_dir, gt_dir, out_dir, trace_dir=None):
    from memcnet_tpu.utils.tracing import StageTimers, device_trace

    model, params = build_model(cfg)
    fwd = PaddedInterp(model, params, save_which=cfg.save_which, dtype=cfg_jnp_dtype(cfg))

    uid = str(random.randint(0, 100000))
    gen_dir = os.path.join(out_dir, uid)
    os.makedirs(gen_dir, exist_ok=True)
    print(f"The unique id for current testing is: {uid}")

    meter = AverageMeter()
    timers = StageTimers()
    results = []
    stack = contextlib.ExitStack()
    stack.enter_context(device_trace(trace_dir))
    for x0, x1, gt, name in MiddleburyOther(data_dir, gt_dir):
        t_item = time.time()
        with timers.model():
            out, _aux = fwd(x0, x1)
        rec_u8 = to_uint8_frame(out)
        os.makedirs(os.path.join(gen_dir, name), exist_ok=True)
        out_path = os.path.join(gen_dir, name, "frame10i11.png")
        iio.imwrite(out_path, rec_u8)
        if gt is None:
            continue
        gt_u8 = to_uint8_frame(gt)
        ie = interp_error(rec_u8, gt_u8)
        p = psnr(rec_u8, gt_u8)
        meter.update(ie, 1)
        results.append((name, ie, p))
        print(f"{name}: interpolation error / PSNR : {round(ie, 4)} / {round(p, 4)}")
        print(f"The average interpolation error for all images is : {round(meter.avg, 4)}")
        diff = (128.0 + rec_u8.astype(np.float64) - gt_u8.astype(np.float64)).astype("uint8")
        iio.imwrite(os.path.join(gen_dir, name, f"frame10i11_diff{ie:.4f}.png"), diff)
        timers.total.update(time.time() - t_item)
    stack.close()
    print(timers.summary(), file=sys.stderr)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_config_args(ap)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--gt-dir", default=None)
    ap.add_argument("--out-dir", default="./MiddleBury-results")
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler (XProf) trace here")
    args = ap.parse_args(argv)
    cfg = config_from_args(args)
    if cfg.net_name == "MEMC_Net_VE":
        sys.exit("use demo_vimeo_ve for the enhancement model")
    return run(cfg, args.data_dir, args.gt_dir, args.out_dir,
               trace_dir=args.trace_dir)


if __name__ == "__main__":
    main()
