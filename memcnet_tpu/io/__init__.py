from memcnet_tpu.io.pth_import import import_pth, import_state_dict, load_pth_state_dict
from memcnet_tpu.io.checkpoint import load as load_checkpoint, save as save_checkpoint
from memcnet_tpu.io.t7_import import import_spynet_t7, load_t7_tensor, save_t7_tensor

__all__ = ["import_pth", "import_state_dict", "load_pth_state_dict",
           "load_checkpoint", "save_checkpoint",
           "import_spynet_t7", "load_t7_tensor", "save_t7_tensor"]
