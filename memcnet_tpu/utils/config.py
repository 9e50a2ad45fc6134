"""Plain dataclass config — replaces the reference's my_args.py argparse
module with import-time side effects (my_args.py:76-122).  No I/O at import;
explicit run-dir creation on demand (uid dirs, log.txt/args.txt) via
make_run_dir for protocol parity."""

import dataclasses
import datetime
import json
import os
import random
from typing import Optional, Sequence


@dataclasses.dataclass
class Config:
    net_name: str = "MEMC_Net"                 # my_args.py:14
    dataset_name: str = "Vimeo_90K_sr"         # :19
    dataset_path: str = ""
    seed: int = 1
    batch_size: int = 1                        # :31
    channels: int = 3
    filter_size: int = 4                       # :34
    task: Optional[str] = None                 # sr | denoise | deblock (:38)
    task_param: Sequence[float] = (4.0,)
    save_which: int = 1                        # 0=interp, 1=rectified (:43)
    pretrained: Optional[str] = None           # .pth or orbax dir (:61)
    uid: Optional[str] = None
    save_path: str = "./model_weights"
    dtype: str = "float32"                     # float32 | bfloat16
    # trainer (documented upstream hyperparams, my_args.py:41-59)
    lr: float = 2e-3
    num_epoch: int = 100
    epsilon: float = 1e-6
    alpha: Sequence[float] = (1.0, 0.0)

    def make_run_dir(self):
        uid = self.uid or str(random.randint(0, 100000))
        stamp = datetime.datetime.now().strftime("%a-%b-%d-%H:%M")
        run_dir = os.path.join(self.save_path, f"{uid}-{stamp}")
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "args.txt"), "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=str)
        return run_dir


_COERCERS = {
    "int": int,
    "float": float,
    "str": str,
    "bool": lambda v: v if isinstance(v, bool) else v.lower() in ("1", "true", "yes"),
    "Optional[str]": str,
    "Optional[int]": int,
    "Optional[float]": float,
    # comma-separated CLI form, e.g. --alpha 1.0,0.0 / --task-param 4
    "Sequence[float]": lambda v: v if isinstance(v, (tuple, list))
    else tuple(float(x) for x in str(v).split(",") if x != ""),
    "Sequence[int]": lambda v: v if isinstance(v, (tuple, list))
    else tuple(int(x) for x in str(v).split(",") if x != ""),
}


def _type_key(t):
    """Normalize a dataclass field annotation (object or string form) to the
    _COERCERS key."""
    if isinstance(t, str):
        return t.replace("typing.", "")
    if getattr(t, "__origin__", None) is None and hasattr(t, "__name__"):
        return t.__name__  # plain classes: int, float, str, bool
    return str(t).replace("typing.", "")  # typing generics keep their args


def _coerce(field, value):
    ty = _COERCERS.get(_type_key(field.type))
    if ty is None:
        raise TypeError(
            f"Config field {field.name!r} has unhandled type {field.type!r}; "
            "add a coercer to utils.config._COERCERS"
        )
    return ty(value)


def add_config_args(parser):
    for f in dataclasses.fields(Config):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool":
            parser.add_argument(name, default=None, choices=("true", "false"))
        else:
            parser.add_argument(name, default=None)
    return parser


def config_from_args(args, **overrides):
    kw = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        kw[f.name] = _coerce(f, v)
    kw.update(overrides)
    return Config(**kw)
