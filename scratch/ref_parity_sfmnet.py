"""Composite SFMnet parity on the POSENET route (the only pose path
runnable without the CUDA extension): DICL flow -> PlainPose -> PSNet."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
refcfg.POSE_EST = "POSENET"
refcfg.MIXED_PREC = False  # autocast is CUDA-only; numerics unchanged
import torch

torch.manual_seed(0)
from models.SFMnet import SFMnet as RefSFMnet

NLABEL = 8
tm = RefSFMnet(NLABEL, refcfg.MIN_DEPTH).eval()
B, H, W = 1, 256, 384
ref_t = torch.rand(B, 3, H, W) * 2 - 1
tgt_t = torch.rand(B, 3, H, W) * 2 - 1
K = torch.tensor([[[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]]])
ang = 0.02
R = torch.tensor([
    [np.cos(ang), -np.sin(ang), 0.0],
    [np.sin(ang), np.cos(ang), 0.0],
    [0.0, 0.0, 1.0],
]).float()
t = torch.tensor([0.6, 0.1, 0.6])
pose_gt = torch.cat([R, t[:, None]], dim=1)[None].float()  # (1, 3, 4)

# The POSENET branch of the shipped reference forward crashes
# (UnboundLocalError: E_mat never assigned on that branch,
# SFMnet.py:133-166) — so chain its components manually, exactly as the
# forward would: flow -> posenet -> RT2Pose -> depth.
from models.SFMnet import RT2Pose

with torch.no_grad():
    tflow, tconf = tm.flow_estimator(torch.cat((ref_t, tgt_t), dim=1))
    t_rt = tm.posenet(tflow, tconf, ref_t, tgt_t)
    tP = RT2Pose(t_rt)
    t_init, tdepth = tm.depth_estimator(
        ref_t, [tgt_t], tP.unsqueeze(1).clone(), K, torch.inverse(K))
tflow, tP, tdepth = tflow.numpy(), tP.numpy(), tdepth.numpy()
print("ref SFMnet (manual posenet chain):", tflow.shape, tP.shape,
      tdepth.shape, float(np.abs(tdepth).mean()))

# GT-pose route runs through the REAL reference forward
with torch.no_grad():
    touts_gt = tm(ref_t, tgt_t, K, pose_gt=pose_gt.clone(),
                  use_gt_pose=True)
tdepth_gt = touts_gt[2].numpy()

sd = {k: v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti(nlabel=NLABEL).override(**{
    "flow.estimator": "DICL",
    "pose.estimator": "POSENET",
})
net = SFMNet(cfg, dtype=jnp.float32)
jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))
jK = jnp.asarray(K.numpy())
jpose = jnp.asarray(pose_gt.numpy())
variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jK, pose_gt=jpose,
                     key=jax.random.PRNGKey(1))
ported, report = tp.convert_reference_checkpoint(
    sd, variables, flow="DICL", depth="PSNET", pose="POSENET")
print("missing:", report["missing"][:6])
unused = [k for k in report["unused"] if "num_batches_tracked" not in k]
print("unused:", unused[:8], f"({len(unused)})")
assert not report["missing"]

out = net.apply(ported, jref, jtgt, jK, pose_gt=jpose,
                key=jax.random.PRNGKey(2))


def cmp(name, a, b):
    b = np.asarray(b).reshape(np.asarray(a).shape)
    d = np.abs(a - b)
    print(f"{name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"scale={np.abs(a).max():.3f}")


cmp("flow", tflow.transpose(0, 2, 3, 1),
    np.asarray(out["flow"]))
cmp("pose", tP, np.asarray(out["pose"]))
cmp("depth", tdepth.reshape(B, H, W), np.asarray(out["depth"]))

out_gt = net.apply(ported, jref, jtgt, jK, pose_gt=jpose,
                   use_gt_pose=True, key=jax.random.PRNGKey(2))
cmp("depth (gt pose)", tdepth_gt.reshape(B, H, W),
    np.asarray(out_gt["depth"]))
