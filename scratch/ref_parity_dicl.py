"""E2E parity: reference DICL_shallow (torch CPU) vs our DICLFlow with the
ported state dict. Requires /root/reference."""
import sys
import types

import numpy as np


class EasyDict(dict):
    """Attribute-dict shim for the reference's `easydict` dependency.

    Keeps items and attributes in sync in BOTH directions: the reference's
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


def load_reference_cfg():
    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules.setdefault("easydict", mod)
    import pathlib

    pmod = types.ModuleType("path")
    pmod.Path = pathlib.Path
    sys.modules.setdefault("path", pmod)
    # the reference models/__init__ imports SFMnet -> the CUDA RANSAC
    # extension; stub it (we only run the torch flow/depth networks)
    sys.modules.setdefault("essential_matrix", types.ModuleType(
        "essential_matrix"))
    sys.path.insert(0, "/root/reference")
    import yaml

    from lib import config as ref_config

    with open("/root/reference/cfgs/kitti.yml") as f:
        d = yaml.safe_load(f)
    # drop keys whose in-repo default is None (data paths): the reference's
    # merge type-checks against the default's type
    d = {k: v for k, v in d.items()
         if k in ref_config.cfg and ref_config.cfg[k] is not None}
    ref_config._merge_a_into_b(EasyDict(d), ref_config.cfg)
    return ref_config.cfg


refcfg = load_reference_cfg()

import torch

# the reference hardcodes CUDA placement inside FlowRegression/warp
# (DICL_shallow.py:303,307,506); neutralize for the CPU parity run
torch.cuda.current_device = lambda: torch.device("cpu")
torch.Tensor.cuda = lambda self, *a, **k: self

torch.manual_seed(0)
from models.DICL_shallow import DICL_shallow

tm = DICL_shallow().eval()
# /128-padded (main.py:315-338) and large enough that the level-6 feature
# map (H/64 x W/64) exceeds the +-3 displacement search range
B, H, W = 1, 256, 384
x = torch.rand(B, 6, H, W) * 2 - 1
with torch.no_grad():
    tout = tm(x)
tflow = tout[0].numpy()  # (B, 2, H, W)
tent = tout[1].numpy()
print("ref DICL out:", tflow.shape, tent.shape,
      float(np.abs(tflow).mean()))

sd = {f"flow_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.dicl import DICLFlow
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti().flow
net = DICLFlow(cfg)
pair = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
variables = net.init(jax.random.PRNGKey(0), pair, False)
entries = tp.dicl_entries("flow_estimator", "")
ported, report = tp.apply_entries(sd, variables, entries)
print("missing:", report["missing"][:6])
unused = sorted(set(sd) - set(report["consumed"]))
print("unused torch keys:", unused[:6], f"({len(unused)})")
assert not report["missing"]

jflow, jent = net.apply(ported, pair, False)
jflow = np.asarray(jflow).transpose(0, 3, 1, 2)
jent = np.asarray(jent).transpose(0, 3, 1, 2)
dflow = np.abs(jflow - tflow)
epe = np.sqrt(((jflow - tflow) ** 2).sum(1)).mean()
print(f"flow: max|d|={dflow.max():.3e} epe={epe:.3e} "
      f"ref_scale={np.abs(tflow).max():.3f}")
dent = np.abs(jent - tent)
print(f"entropy: max|d|={dent.max():.3e} ref_scale={np.abs(tent).max():.3f}")

# --- per-level: reference train-return path (TRAIN_FLOW + module.train())
# with every BatchNorm forced back to eval so running stats match ours
refcfg.TRAIN_FLOW = True
tm.train()
for mod in tm.modules():
    if isinstance(mod, torch.nn.BatchNorm2d):
        mod.eval()
with torch.no_grad():
    tlvls = [t.numpy() for t in tm(x)]
refcfg.TRAIN_FLOW = False
# SUP_RAW_FLOW order fine->coarse: flow2, raw2, flow3, raw3, ..., flow6, raw6
jlvls, _ = net.apply(ported, pair, False, all_iters=True)
jlvls = np.asarray(jlvls)  # ours: coarse->fine [raw6, flow6, raw5, ..., flow2]
from deep_sfm_revisited_tpu.models.dicl import resize_bilinear

names = ["flow2", "raw2", "flow3", "raw3", "flow4", "raw4", "flow5", "raw5",
         "flow6", "raw6"]
strides = [4, 4, 8, 8, 16, 16, 32, 32, 64, 64]
# jax stack index for each ref output (coarse->fine, raw before ctx)
jidx = {"raw6": 0, "flow6": 1, "raw5": 2, "flow5": 3, "raw4": 4, "flow4": 5,
        "raw3": 6, "flow3": 7, "raw2": 8, "flow2": 9}
import jax.numpy as jnp2

for name, s, t in zip(names, strides, tlvls):
    # apply OUR post-processing to the ref level flow: *stride, resize to
    # full res — so the comparison isolates the in-model computation
    tref = jnp2.asarray(t.transpose(0, 2, 3, 1)) * s
    tref = np.asarray(resize_bilinear(tref, (H, W)))
    j = jlvls[jidx[name]]
    d = np.abs(j - tref)
    print(f"  {name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"scale={np.abs(tref).max():.2f}")
