"""Dataset registry mirroring datasets_benchmark.__all__
(datasets_benchmark/__init__.py:18)."""

from memcnet_tpu.data.middlebury import MiddleburyOther
from memcnet_tpu.data.padding import pad_frame, pad_plan, unpad_frame
from memcnet_tpu.data.vbm4d import VBM4D, BayesSR
from memcnet_tpu.data.vimeo90k import (
    Vimeo90K,
    Vimeo_90K_db,
    Vimeo_90K_dn,
    Vimeo_90K_sr,
)
from memcnet_tpu.data.yuv import YUVRead, YUVWrite

DATASETS = {
    "Vimeo_90K_sr": Vimeo_90K_sr,
    "Vimeo_90K_dn": Vimeo_90K_dn,
    "Vimeo_90K_db": Vimeo_90K_db,
    "VBM4D": VBM4D,
}

__all__ = [
    "MiddleburyOther", "VBM4D", "BayesSR", "Vimeo90K", "Vimeo_90K_sr",
    "Vimeo_90K_dn", "Vimeo_90K_db", "YUVRead", "YUVWrite", "DATASETS",
    "pad_frame", "pad_plan", "unpad_frame",
]
