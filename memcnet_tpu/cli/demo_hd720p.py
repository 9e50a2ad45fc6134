"""Streaming HD 2x interpolation over YUV420 files (reference demo_HD720p.py):
read frames 0..100 step 2, interpolate the mid frame, write GT + reconstructed
frames to an output stream, Y-channel PSNR/SSIM per frame with per-file logs.

  python -m memcnet_tpu.cli.demo_hd720p --yuv input.yuv --height 720 \
      --width 1280 --out-dir ./HD-results --net-name MEMC_Net_star
"""

import argparse
import os
import random

from memcnet_tpu.cli.runner import PaddedInterp, build_model
from memcnet_tpu.data import YUVRead, YUVWrite
from memcnet_tpu.metrics import AverageMeter, interp_error, psnr, ssim, to_uint8_frame, y_channel_u8
from memcnet_tpu.utils.config import add_config_args, config_from_args


def run(cfg, yuv_path, height, width, out_dir, frames=100, step=2):
    model, params = build_model(cfg)
    fwd = PaddedInterp(model, params, save_which=cfg.save_which)

    uid = str(random.randint(0, 100000))
    gen_dir = os.path.join(out_dir, uid)
    os.makedirs(gen_dir, exist_ok=True)
    name = os.path.basename(yuv_path)

    # native prefetching reader when the C++ runtime is built; numpy fallback
    from memcnet_tpu import native

    if native.available():
        reader = native.NativeYUVReader(yuv_path, height, width, stride=step)
    else:
        reader = YUVRead(yuv_path, height, width)
    writer = YUVWrite(os.path.join(gen_dir, name))

    ie_m, psnr_m, ssim_m = AverageMeter(), AverageMeter(), AverageMeter()
    for index in range(0, frames, step):
        f0, ok0 = reader.read(index)
        f2, ok2 = reader.read(index + step)
        gt, okg = reader.read(index + 1)
        if not (ok0 and ok2 and okg):
            break
        x0 = f0.transpose(2, 0, 1).astype("float32") / 255.0
        x2 = f2.transpose(2, 0, 1).astype("float32") / 255.0
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
        print(f"frame {index + 1}: interpolation error / PSNR : {round(ie, 4)} ,\t psnr {round(p, 4)},\t ssim {round(s, 5)}")
        with open(os.path.join(gen_dir, name + "_psnr_Y.txt"), "a+") as fh:
            fh.write(f"{p}\n")
        with open(os.path.join(gen_dir, name + "_ssim_Y.txt"), "a+") as fh:
            fh.write(f"{s}\n")
    print(f"The average interpolation error / PSNR for all images are : "
          f"{round(ie_m.avg, 4)},\t psnr {round(psnr_m.avg, 4)},\t ssim {round(ssim_m.avg, 4)}")
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
    args = ap.parse_args(argv)
    cfg = config_from_args(args)
    return run(cfg, args.yuv, args.height, args.width, args.out_dir, args.frames)


if __name__ == "__main__":
    main()
