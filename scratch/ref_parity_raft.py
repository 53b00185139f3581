"""E2E parity: reference RAFT (torch CPU, 24 eval iters) vs ours with the
ported state dict (BGR permute folded into conv1)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

torch.manual_seed(0)
sys.path.insert(0, "/root/reference/models/RAFT/core")
from models.RAFT.core.raft import RAFT as RefRAFT

tm = RefRAFT().eval()
B, H, W = 1, 128, 192
x = torch.rand(B, 6, H, W) * 2 - 1
with torch.no_grad():
    tflow, _ = tm(x)
tflow = tflow.numpy()
print("ref RAFT:", tflow.shape, float(np.abs(tflow).mean()))

sd = {f"flow_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.raft import RAFT
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti().flow
cfg = cfg.__class__(**{**cfg.__dict__, "raft_iters_eval": 24})
net = RAFT(cfg)
pair = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
variables = net.init(jax.random.PRNGKey(0), pair, False)
entries = [
    (kind, tkey, fpath.replace("flow_net/", ""))
    for kind, tkey, fpath in tp.raft_entries("flow_estimator", "flow_net")
]
ported, report = tp.apply_entries(sd, variables, entries)
print("missing:", report["missing"][:6])
leftover = sorted(k for k in set(sd) - set(report["consumed"])
                  if "num_batches_tracked" not in k)
print("unused:", leftover[:6], f"({len(leftover)})")
assert not report["missing"]

jflow, _ = net.apply(ported, pair, False)
jflow = np.asarray(jflow).transpose(0, 3, 1, 2)
d = np.abs(jflow - tflow)
print(f"flow: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
      f"scale={np.abs(tflow).max():.3f}")
