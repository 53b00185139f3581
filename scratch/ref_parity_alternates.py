"""E2E parity: reference PANet / REGNet / REG2D / DISPNET (torch CPU) vs
ours with ported state dicts."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

WHICH = os.environ.get("WHICH", "PANET").upper()
NLABEL = 8
B, H, W = 1, 128, 192

torch.manual_seed(0)
if WHICH == "PANET":
    from models.PANet import PANet as RefNet
elif WHICH == "REGNET":
    from models.REGNet import REGNet as RefNet
elif WHICH == "REG2D":
    from models.REG2D import REG2D as RefNet
else:
    from models.DISPNET import DISPNET as RefNet

if os.environ.get("ONE_SCALE"):
    refcfg.SCALE_MIN = 1.0
    refcfg.SCALE_MAX = 1.01
    refcfg.SCALE_STEP = 0.1

tm = RefNet(NLABEL, refcfg.MIN_DEPTH).eval()
with torch.no_grad():
    for m in tm.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
            m.weight.mul_(0.5)

ref_t = torch.rand(B, 3, H, W) * 2 - 1
tgt_t = torch.rand(B, 3, H, W) * 2 - 1
K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
ang = 0.03
R = torch.tensor([
    [np.cos(ang), -np.sin(ang), 0.0],
    [np.sin(ang), np.cos(ang), 0.0],
    [0.0, 0.0, 1.0],
])
t = torch.tensor([0.7, 0.1, 0.7])
pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()

kwargs = {}
if WHICH == "DISPNET":
    # DISPNET derives the epipolar direction from E (DISPNET.py:137-141)
    tx = torch.tensor([[0.0, -t[2], t[1]],
                       [t[2], 0.0, -t[0]],
                       [-t[1], t[0], 0.0]])
    kwargs["E_mat"] = (tx.float() @ R.float())[None]
with torch.no_grad():
    touts = tm(ref_t, [tgt_t], pose.clone(), K, torch.inverse(K), **kwargs)
t_init = touts[0].numpy() if touts[0] is not None else None
t_depth = touts[1].numpy()
print(f"ref {WHICH}:", t_depth.shape, float(np.abs(t_depth).mean()))

sd = {f"depth_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models import depth_alternates as alt
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti(nlabel=NLABEL).depth
if os.environ.get("ONE_SCALE"):
    cfg = cfg.__class__(**{**cfg.__dict__, "scale_min": 1.0,
                           "scale_max": 1.01, "scale_step": 0.1})
net = {"PANET": alt.PANet, "REGNET": alt.REGNet, "REG2D": alt.REG2D,
       "DISPNET": alt.DISPNET}[WHICH](cfg, dtype=jnp.float32)
entries_fn = {"PANET": tp.panet_entries, "REGNET": tp.regnet_entries,
              "REG2D": tp.reg2d_entries, "DISPNET": tp.dispnet_entries}[WHICH]

jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None]
jpose = jnp.asarray(pose.numpy())
jK = jnp.asarray(K.numpy())
jKi = jnp.asarray(torch.inverse(K).numpy())
variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jpose, jK, jKi,
                     False)
ported, report = tp.apply_entries(sd, variables, entries_fn("depth_estimator", ""))
print("missing:", report["missing"][:6])
leftover = sorted(k for k in set(sd) - set(report["consumed"])
                  if "num_batches_tracked" not in k)
print("unused:", leftover[:8], f"({len(leftover)})")
assert not report["missing"]

j_init, j_depth = net.apply(ported, jref, jtgt, jpose, jK, jKi, False)


def cmp(name, a, b):
    a = a.reshape(a.shape[0], a.shape[-2], a.shape[-1])
    b = np.asarray(b).reshape(a.shape)
    d = np.abs(a - b)
    print(f"{name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"scale={np.abs(a).max():.3f}")


if t_init is not None and j_init is not None:
    cmp("depth_init", t_init, j_init)
cmp("depth", t_depth, j_depth)
