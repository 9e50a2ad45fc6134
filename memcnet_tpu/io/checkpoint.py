"""Native checkpointing via orbax (replaces torch.load/save .pth flows,
SURVEY.md section 5 'Checkpoint / resume').  Saves flat param dicts and
optionally optimizer state for resumable training — a capability the
reference lacked (inference-only weight loading)."""

import os

import orbax.checkpoint as ocp


def save(path, params, opt_state=None, step=None):
    path = os.path.abspath(path)
    ckpt = {"params": params}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    if step is not None:
        ckpt["step"] = step
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    return path


def load(path):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)
