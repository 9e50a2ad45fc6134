"""Pad-to-multiple-of-128 geometry shared by all demos
(demo_MiddleBury.py:96-117): if a side is not a multiple of 128, pad up to the
next multiple split evenly (extra pixel to the right/bottom); if it already
is, add a fixed 32-px border.  Replication padding."""

import numpy as np


def pad_plan(height, width, multiple=128, border=32):
    if width % multiple != 0:
        wp = ((width // multiple) + 1) * multiple
        left = (wp - width) // 2
        right = wp - width - left
    else:
        left = right = border
    if height % multiple != 0:
        hp = ((height // multiple) + 1) * multiple
        top = (hp - height) // 2
        bottom = hp - height - top
    else:
        top = bottom = border
    return left, right, top, bottom


def pad_frame(x, plan):
    """x: (..., H, W); replication pad."""
    left, right, top, bottom = plan
    pads = [(0, 0)] * (x.ndim - 2) + [(top, bottom), (left, right)]
    return np.pad(x, pads, mode="edge")


def unpad_frame(x, plan, height, width):
    left, _right, top, _bottom = plan
    return x[..., top:top + height, left:left + width]
