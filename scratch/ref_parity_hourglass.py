"""Isolate the PSNet hourglass: same input, ported weights, compare
after each dres block."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

torch.manual_seed(0)
from models.PSNet import PSNet as RefPSNet

NLABEL, h4, w4 = 8, 32, 48
tm = RefPSNet(NLABEL, refcfg.MIN_DEPTH).eval()
with torch.no_grad():
    for m in tm.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
            m.weight.mul_(0.5)

cost_t = torch.rand(1, 64, NLABEL, h4, w4) * 0.3 - 0.15

# stepwise torch chain capturing every convbn PRE-relu output, matching
# our ConvBN3D_k intermediates (dres0 = cb,relu,cb,relu; dres1..4 =
# cb,relu,cb (+residual); classify = cb,relu,conv3d)
tsteps = []  # pre-relu convbn outputs in our ConvBN3D index order
with torch.no_grad():
    a = tm.dres0[0](cost_t); tsteps.append(a.clone())
    a = tm.dres0[2](torch.relu(a)); tsteps.append(a.clone())
    c = torch.relu(a)
    for name in ("dres1", "dres2", "dres3", "dres4"):
        blk = getattr(tm, name)
        r = blk[0](c); tsteps.append(r.clone())
        r = blk[2](torch.relu(r)); tsteps.append(r.clone())
        c = c + r
    a = tm.classify[0](c); tsteps.append(a.clone())
    t_out = tm.classify[2](torch.relu(a))

sd = {f"depth_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.psnet import Hourglass3D
from deep_sfm_revisited_tpu.utils import torch_port as tp

net = Hourglass3D(dtype=jnp.float32)
x = jnp.asarray(cost_t.numpy().transpose(0, 2, 3, 4, 1))  # NDHWC
variables = net.init(jax.random.PRNGKey(0), x, False)
# reuse the full-psnet entry table, keeping only hourglass rows and
# stripping the module prefix to fit the standalone tree
entries = [
    (kind, tkey, fpath.replace("Hourglass3D_0/", ""))
    for kind, tkey, fpath in tp.psnet_entries("depth_estimator", "")
    if "Hourglass3D_0" in fpath
]
ported, report = tp.apply_entries(sd, variables, entries)
assert not report["missing"], report["missing"][:8]

(jout), state = net.apply(ported, x, False, capture_intermediates=True,
                          mutable=["intermediates"])
inter = state["intermediates"]


def j_convbn(i):
    return np.asarray(inter[f"ConvBN3D_{i}"]["__call__"][0])


def tnp(t):
    return t.numpy().transpose(0, 2, 3, 4, 1)


def cmp(name, a, b):
    d = np.abs(a - b)
    print(f"{name}: max|d|={d.max():.3e} mean={d.mean():.3e} "
          f"scale={np.abs(a).max():.3f}")


for i, t in enumerate(tsteps):
    cmp(f"ConvBN3D_{i} (pre-relu)", tnp(t), j_convbn(i))
cmp("hourglass out", tnp(t_out), np.asarray(jout))
