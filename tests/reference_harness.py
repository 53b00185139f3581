"""Harness to run the UPSTREAM reference's torch networks on CPU for
numeric parity tests.

The reference (/root/reference) depends on `easydict`, `path`, CUDA
torch, and its compiled `essential_matrix` extension — none available
here. This module shims exactly enough to import and run the pure-torch
flow/depth networks in eval mode. Nothing from the reference is copied;
it is imported read-only, and every test using it must skip when the
reference checkout is absent.
"""

from __future__ import annotations

import pathlib
import sys
import types

REFERENCE_ROOT = "/root/reference"

_loaded_cfg = None


class EasyDict(dict):
    """Attribute-dict shim for the reference's `easydict` dependency.

    Items and attributes stay in sync in BOTH directions: the reference's
    `_merge_a_into_b` assigns via `b[k] = v` and reads via `cfg.K`.
    """

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            setattr(self, k, v)

    def __setattr__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            v = EasyDict(v)
        super().__setattr__(k, v)
        super().__setitem__(k, v)

    def __setitem__(self, k, v):
        self.__setattr__(k, v)

    __getattr__ = dict.__getitem__


def reference_available() -> bool:
    return pathlib.Path(REFERENCE_ROOT, "lib", "config.py").is_file()


def load_reference(yaml_name: str = "kitti.yml"):
    """Import the reference with shims; merge its KITTI recipe; return cfg.

    Idempotent — the reference's config is process-global, so repeated
    calls return the already-merged cfg.
    """
    global _loaded_cfg
    if _loaded_cfg is not None:
        return _loaded_cfg

    emod = types.ModuleType("easydict")
    emod.EasyDict = EasyDict
    sys.modules.setdefault("easydict", emod)
    pmod = types.ModuleType("path")
    pmod.Path = pathlib.Path
    sys.modules.setdefault("path", pmod)
    # models/__init__ imports SFMnet -> the compiled CUDA RANSAC
    # extension; stub it (only the pure-torch networks are exercised)
    sys.modules.setdefault(
        "essential_matrix", types.ModuleType("essential_matrix")
    )
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import torch
    import yaml

    # FlowRegression/warp hardcode CUDA placement
    # (DICL_shallow.py:303,307,506); neutralize for CPU runs
    torch.cuda.current_device = lambda: torch.device("cpu")
    torch.Tensor.cuda = lambda self, *a, **k: self

    if "torchvision" not in sys.modules:
        # torchvision is absent; KITTI_loader only uses
        # ColorJitter.get_params for train-time photometric aug
        class _ColorJitter:
            @staticmethod
            def get_params(*a, **k):
                return lambda img: img

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ColorJitter = _ColorJitter
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    try:
        import cv2

        if not hasattr(cv2, "xfeatures2d"):
            # SIFT graduated out of xfeatures2d in modern OpenCV; SURF is
            # patent-gated and absent — stub it (never invoked in tests)
            cv2.xfeatures2d = types.SimpleNamespace(
                SIFT_create=cv2.SIFT_create, SURF_create=cv2.SIFT_create
            )
    except ImportError:
        pass

    from lib import config as ref_config

    with open(pathlib.Path(REFERENCE_ROOT, "cfgs", yaml_name)) as f:
        d = yaml.safe_load(f)
    # drop keys whose in-repo default is None (data paths): the
    # reference's merge type-checks against the default's type
    d = {k: v for k, v in d.items()
         if k in ref_config.cfg and ref_config.cfg[k] is not None}
    ref_config._merge_a_into_b(EasyDict(d), ref_config.cfg)
    _loaded_cfg = ref_config.cfg
    return _loaded_cfg


def install_minieigen_shim():
    """Stub the `minieigen` dependency of demon_metrics.py (Quaternion /
    Vector3) with the small numpy subset `compute_motion_errors` uses."""
    import math

    import numpy as np

    class Vector3:
        def __init__(self, x, y, z):
            self.v = np.array([x, y, z], dtype=np.float64)

        def norm(self):
            return float(np.linalg.norm(self.v))

        def normalize(self):
            self.v = self.v / np.linalg.norm(self.v)

        def dot(self, o):
            return float(self.v @ o.v)

        def __sub__(self, o):
            return Vector3(*(self.v - o.v))

    class Quaternion:
        def __init__(self, angle, axis):  # minieigen AngleAxis ctor
            half = 0.5 * float(angle)
            a = axis.v / max(np.linalg.norm(axis.v), 1e-300)
            self.q = np.concatenate([[math.cos(half)],
                                     math.sin(half) * a])

        def angularDistance(self, o):
            d = abs(float(self.q @ o.q))
            return 2.0 * math.acos(min(1.0, d))

    mod = types.ModuleType("minieigen")
    mod.Vector3 = Vector3
    mod.Quaternion = Quaternion
    sys.modules.setdefault("minieigen", mod)


def bn_eval_train_returns(module):
    """Put `module` in train() (for the multi-output return path) but force
    every BatchNorm back to eval so running stats are used."""
    import torch

    module.train()
    for mod in module.modules():
        if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            mod.eval()
    return module
