"""Vimeo-90K enhancement datasets (sr / denoise / deblock).

Reference: datasets_benchmark/listdatasets.py:13-104 and the registry modules
Vimeo_90K_{sr,dn,db}.  Each sample is a 7-frame window from a task-specific
degraded directory plus the clean center target im4.png:

  denoise -> sequences_sigma20_byMTLB/        (listdatasets.py:17-18)
  sr      -> sequences_blur_byMTLB/           (:19-20)
  deblock -> input_H264qp37_byFFmpeg/         (:21-22)
  target  -> target/im4.png                   (:23,37)

Frames return as float32 [0,1], (3,H,W) each.  A lightweight iterable with
optional double-buffered prefetch replaces torch DataLoader workers.
"""

import os
import threading
import queue as _queue

import numpy as np
import imageio.v2 as iio

TASK_DIRS = {
    "denoise": "sequences_sigma20_byMTLB",
    "sr": "sequences_blur_byMTLB",
    "deblock": "input_H264qp37_byFFmpeg",
}


def _read_frame(path):
    im = iio.imread(path)
    return np.transpose(im, (2, 0, 1)).astype("float32") / 255.0


def load_window(root, im_path, task):
    """One 7-frame window + target (Vimeo_90K_loader, listdatasets.py:13-77)."""
    root_input = os.path.join(root, TASK_DIRS[task], im_path)
    root_target = os.path.join(root, "target", im_path)
    frames = [_read_frame(os.path.join(root_input, f"im{i + 1}.png")) for i in range(7)]
    target = _read_frame(os.path.join(root_target, "im4.png"))
    return frames, target


def list_sequences(root, task):
    """All <video>/<seq> paths present in the task input dir."""
    base = os.path.join(root, TASK_DIRS[task])
    out = []
    for vid in sorted(os.listdir(base)):
        vdir = os.path.join(base, vid)
        if not os.path.isdir(vdir):
            continue
        for seq in sorted(os.listdir(vdir)):
            if os.path.isdir(os.path.join(vdir, seq)):
                out.append(os.path.join(vid, seq))
    return out


class Vimeo90K:
    """Iterable dataset: yields (frames[7], target, path)."""

    def __init__(self, root, task, paths=None, prefetch=2):
        assert task in TASK_DIRS, task
        self.root = root
        self.task = task
        self.paths = paths if paths is not None else list_sequences(root, task)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        frames, target = load_window(self.root, self.paths[i], self.task)
        return frames, target, self.paths[i]

    def __iter__(self):
        if self.prefetch <= 0:
            for i in range(len(self)):
                yield self[i]
            return
        q = _queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            for i in range(len(self)):
                q.put(self[i])
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def Vimeo_90K_sr(root, **kw):
    return Vimeo90K(root, "sr", **kw)


def Vimeo_90K_dn(root, **kw):
    return Vimeo90K(root, "denoise", **kw)


def Vimeo_90K_db(root, **kw):
    return Vimeo90K(root, "deblock", **kw)
