"""E2E parity: reference ResNet pose regressor vs ours."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

load_reference()
import torch

torch.manual_seed(0)
from models.PoseNet import Bottleneck, ResNet

tm = ResNet(Bottleneck, [3, 4, 6, 3]).eval()
B, H, W = 2, 64, 96
flow_t = torch.randn(B, 2, H, W) * 3
conf_t = torch.rand(B, 1, H, W)
ref_t = torch.rand(B, 3, H, W) * 2 - 1
tgt_t = torch.rand(B, 3, H, W) * 2 - 1
with torch.no_grad():
    tpose = tm(flow_t, conf_t, ref_t, tgt_t).numpy()
print("ref:", tpose.shape, tpose[0])

sd = {f"posenet.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.posenet import ResNetPose
from deep_sfm_revisited_tpu.utils import torch_port as tp

net = ResNetPose()


def j(t):
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


variables = net.init(jax.random.PRNGKey(0), j(flow_t), j(ref_t), j(tgt_t),
                     j(conf_t), False)
entries = [
    (kind, tkey, fpath.replace("pose_net/", ""))
    for kind, tkey, fpath in tp.resnetpose_entries("posenet", "pose_net")
]
ported, report = tp.apply_entries(sd, variables, entries)
print("missing:", report["missing"][:6])
leftover = sorted(k for k in set(sd) - set(report["consumed"])
                  if "num_batches_tracked" not in k)
print("unused:", leftover[:8], f"({len(leftover)})")
assert not report["missing"]

jpose = np.asarray(net.apply(ported, j(flow_t), j(ref_t), j(tgt_t),
                             j(conf_t), False))
d = np.abs(jpose - tpose)
print(f"pose: max|d|={d.max():.3e} scale={np.abs(tpose).max():.4f}")
print("jax:", jpose[0])
