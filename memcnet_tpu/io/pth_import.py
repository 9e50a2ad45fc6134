"""One-time .pth -> flat-param importer.

Because memcnet_tpu keeps parameters as a flat dict with exactly the reference
PyTorch state-dict names and layouts (conv OIHW / conv-transpose IOHW — see
memcnet_tpu.nn.layers), import is a name-for-name tensor copy.  The
filter-update-load idiom of the demos (tolerate missing/extra keys,
demo_MiddleBury.py:45-51) is reproduced, with a strict mode for CI.

torch is only needed at import time (CPU build suffices); the converted
checkpoint is saved with orbax for native reload (memcnet_tpu.io.checkpoint).
"""

import numpy as np
import jax.numpy as jnp


def load_pth_state_dict(path):
    """Load a .pth file into a {name: np.ndarray} dict (CPU, no CUDA)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    out = {}
    for k, v in data.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def import_state_dict(params, state, *, strict=False, dtype=None):
    """Overlay `state` ({name: array}) onto flat `params`.

    Mirrors the demos' partial-load: keys absent from `params` are dropped,
    params without a matching key keep their init values.  strict=True
    requires an exact 1:1 match (modulo torch's num_batches_tracked
    bookkeeping entries).  Shape mismatches always raise.
    """
    state = {k: v for k, v in state.items() if not k.endswith("num_batches_tracked")}
    loaded, skipped = [], []
    new_params = dict(params)
    for k, v in state.items():
        if k in new_params:
            cur = new_params[k]
            if tuple(cur.shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch for {k}: params {cur.shape} vs pth {v.shape}")
            new_params[k] = jnp.asarray(v, dtype or cur.dtype)
            loaded.append(k)
        else:
            skipped.append(k)
    missing = [k for k in params if k not in state]
    if strict and (skipped or missing):
        raise KeyError(f"strict import: extra keys {skipped[:5]}..., missing keys {missing[:5]}...")
    return new_params, {"loaded": loaded, "skipped": skipped, "missing": missing}


def import_pth(params, path, *, strict=False, dtype=None):
    return import_state_dict(params, load_pth_state_dict(path), strict=strict, dtype=dtype)
