"""E2E parity: reference CVPMVS (torch CPU) vs ours with ported weights."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

torch.manual_seed(0)
from models.CVPMVS import CVPMVS as RefNet

tm = RefNet().eval()
with torch.no_grad():
    for m in tm.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d,
                          torch.nn.ConvTranspose3d)):
            m.weight.mul_(0.6)

B, H, W = 1, 64, 96
ref_t = torch.rand(B, 3, H, W) * 2 - 1
tgt_t = torch.rand(B, 3, H, W) * 2 - 1
K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
ang = 0.03
R = torch.tensor([
    [np.cos(ang), -np.sin(ang), 0.0],
    [np.sin(ang), np.cos(ang), 0.0],
    [0.0, 0.0, 1.0],
]).float()
t = torch.tensor([0.7, 0.1, 0.7])
pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()  # (1,1,3,4)
with torch.no_grad():
    tlist, tdepth = tm(ref_t, [tgt_t], pose.clone(), K, torch.inverse(K))
print("ref CVPMVS:", [tuple(x.shape) for x in tlist], tuple(tdepth.shape),
      float(tdepth.abs().mean()))

sd = {f"depth_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.cvpmvs import CVPMVS
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti(nlabel=8).depth
net = CVPMVS(cfg, dtype=jnp.float32)
jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None]
jpose = jnp.asarray(pose.numpy())
jK = jnp.asarray(K.numpy())
jKi = jnp.asarray(torch.inverse(K).numpy())
variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jpose, jK, jKi,
                     False)
ported, report = tp.apply_entries(
    sd, variables, tp.cvpmvs_entries("depth_estimator", ""))
print("missing:", report["missing"][:6])
leftover = sorted(k for k in set(sd) - set(report["consumed"])
                  if "num_batches_tracked" not in k)
print("unused:", leftover[:8], f"({len(leftover)})")
assert not report["missing"]

j_init, j_depth = net.apply(ported, jref, jtgt, jpose, jK, jKi, False)
a = tdepth.numpy().reshape(np.asarray(j_depth).shape)
d = np.abs(a - np.asarray(j_depth))
print(f"depth(final): max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
      f"scale={np.abs(a).max():.3f}")
# the coarse-level estimate too (tlist[-1] after the reversal is coarsest)
a0 = tlist[-1].numpy()
print("coarse ref shape:", a0.shape)
