from memcnet_tpu.io.pth_import import import_pth, import_state_dict, load_pth_state_dict
from memcnet_tpu.io.checkpoint import load as load_checkpoint, save as save_checkpoint

__all__ = ["import_pth", "import_state_dict", "load_pth_state_dict", "load_checkpoint", "save_checkpoint"]
