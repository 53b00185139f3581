"""E2E parity: reference PSNet (torch CPU) vs our PSNet with the ported
state dict."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

torch.manual_seed(0)
from models.PSNet import PSNet as RefPSNet

NLABEL = 8
tm = RefPSNet(NLABEL, refcfg.MIN_DEPTH).eval()
# fresh-init activations explode (~1e8 by the hourglass: eval-mode BN uses
# unit running stats, so nothing normalizes) which turns the comparison
# into amplified-noise soup; scale conv weights down to keep O(1) signals
with torch.no_grad():
    for m in tm.modules():
        if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d,
                          torch.nn.ConvTranspose2d)):
            m.weight.mul_(0.5)
B, H, W = 1, 128, 192
ref_t = torch.rand(B, 3, H, W) * 2 - 1
tgt_t = torch.rand(B, 3, H, W) * 2 - 1
K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
K_inv = torch.inverse(K)
import os

ang = 0.0 if os.environ.get("IDENTITY_POSE") else 0.03
R = torch.tensor([
    [np.cos(ang), -np.sin(ang), 0.0],
    [np.sin(ang), np.cos(ang), 0.0],
    [0.0, 0.0, 1.0],
])
t = (torch.tensor([0.0, 0.0, 0.0]) if os.environ.get("IDENTITY_POSE")
     else torch.tensor([0.7, 0.1, 0.7]))
pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()  # (1,1,3,4)
captures = {}


def _hook(name):
    def fn(mod, inp, out):
        captures.setdefault(name, []).append(out.detach().clone())
    return fn


tm.feature_extraction.register_forward_hook(_hook("spp"))
tm.classify.register_forward_hook(_hook("classify"))
if hasattr(tm, "convs"):
    tm.convs.register_forward_hook(_hook("ctx"))

with torch.no_grad():
    tout = tm(ref_t, [tgt_t], pose.clone(), K, K_inv)
t_init, t_depth = [o.numpy() for o in tout]
print("ref PSNet:", t_init.shape, t_depth.shape,
      float(np.abs(t_depth).mean()))

sd = {f"depth_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg = SfMConfig.kitti(nlabel=NLABEL)
# the reference rescales pose translation inside PSNet when RESCALE_DEPTH
# (PSNet.py:135-136); mirror it (SFMNet wires this from train.rescale_depth)
net = PSNet(cfg.depth, norm_target=float(refcfg.NORM_TARGET),
            dtype=jnp.float32)
jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None]
jpose = jnp.asarray(pose.numpy())
jK = jnp.asarray(K.numpy())
jKi = jnp.asarray(K_inv.numpy())
variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jpose, jK, jKi,
                     False)
entries = tp.psnet_entries("depth_estimator", "")
ported, report = tp.apply_entries(sd, variables, entries)
print("missing:", report["missing"][:6])
unused = sorted(k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k)
print("unused (non-bookkeeping):", unused[:6], f"({len(unused)})")
assert not report["missing"]

(j_init, j_depth), state = net.apply(
    ported, jref, jtgt, jpose, jK, jKi, False,
    capture_intermediates=True, mutable=["intermediates"],
)
j_init, j_depth = np.asarray(j_init), np.asarray(j_depth)

inter = state["intermediates"]


def leaf(path):
    n = inter
    for p in path:
        n = n[p]
    return np.asarray(n["__call__"][0])


def cmp(name, a, b):
    d = np.abs(a - b)
    print(f"  {name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"scale={np.abs(a).max():.3f} shapes={a.shape}{b.shape}")


# stage 1: SPP features (ref call order: [ref, tgt] stacked for us; torch
# calls feature_extraction twice)
j_spp = leaf(("SPPFeatureExtractor_0",))  # (2B, h4, w4, 32)
t_spp_ref = captures["spp"][0].numpy().transpose(0, 2, 3, 1)
t_spp_tgt = captures["spp"][1].numpy().transpose(0, 2, 3, 1)
cmp("spp(ref)", t_spp_ref, j_spp[:B])
cmp("spp(tgt)", t_spp_tgt, j_spp[B:])

# stage 2: plane-sweep warped target features, computed from the TORCH
# features on both sides so the comparison isolates the warp itself
from deep_sfm_revisited_tpu.ops.camera import plane_sweep_warp as jwarp
from models.inverse_warp import inverse_warp as t_inverse_warp

K4_t = K.clone()
K4_t[:, :2, :] = K4_t[:, :2, :] / 4
K4i_t = torch.inverse(K4_t)
pose_sc = pose.clone()
if refcfg.RESCALE_DEPTH:
    pose_sc[:, 0, :, -1:] = pose_sc[:, 0, :, -1:] * refcfg.NORM_TARGET
t_feat = captures["spp"][1]  # NCHW target features
h4, w4 = t_feat.shape[2], t_feat.shape[3]
t_warps = []
for i in range(NLABEL):
    dpl = refcfg.MIN_DEPTH * NLABEL / (i + 1)
    dmap = torch.full((1, h4, w4), float(dpl))
    with torch.no_grad():
        t_warps.append(
            t_inverse_warp(t_feat, dmap, pose_sc[:, 0], K4_t, K4i_t).numpy()
        )
t_warp = np.stack(t_warps, axis=1).transpose(0, 1, 3, 4, 2)  # (B,D,h4,w4,C)
labels = jnp.arange(1, NLABEL + 1, dtype=jnp.float32)
plane_depths = refcfg.MIN_DEPTH * NLABEL / labels
j_warp = np.asarray(jwarp(
    jnp.asarray(t_feat.numpy().transpose(0, 2, 3, 1)), plane_depths,
    jnp.asarray(pose_sc[:, 0].numpy()), jnp.asarray(K4_t.numpy()),
    jnp.asarray(K4i_t.numpy()),
))
cmp("warp(from torch feats)", t_warp, j_warp)

# stage 3: hourglass output (pre-upsample logits)
j_hg = leaf(("Hourglass3D_0",))  # (B, D, h4, w4, 1)
t_hg = captures["classify"][0].numpy()  # (B, 1, D, h4, w4)
cmp("hourglass", t_hg[:, 0], j_hg[..., 0])
for di in range(NLABEL):
    d = np.abs(t_hg[:, 0, di] - j_hg[:, di, ..., 0])
    print(f"    plane {di}: max|d|={d.max():.3e} mean={d.mean():.3e}")
# spatial: interior vs border (exclude 2-pixel frame)
d_all = np.abs(t_hg[:, 0] - j_hg[..., 0])
print(f"    interior max={d_all[:, :, 2:-2, 2:-2].max():.3e} "
      f"border max={d_all.max():.3e}")

# stage 4: context output
if "ctx" in captures and "ContextNet_0" in inter:
    j_ctx = leaf(("ContextNet_0",))  # (B, D, h4, w4, 1)
    t_ctx = np.stack([c.numpy() for c in captures["ctx"]], axis=2)
    cmp("context", t_ctx[:, 0], j_ctx[..., 0])
print("jax PSNet:", j_init.shape, j_depth.shape,
      float(np.abs(j_depth).mean()))
for name, a, b in (("depth_init", t_init, j_init),
                   ("depth", t_depth, j_depth)):
    a = a.reshape(a.shape[0], a.shape[-2], a.shape[-1])
    b = b.reshape(b.shape[0], b.shape[-2], b.shape[-1])
    d = np.abs(a - b)
    rel = d / np.maximum(np.abs(a), 1e-6)
    # depth = c / softargmax amplifies f32 noise where softargmax -> 0;
    # inverse depth is the regression's linear output — compare that
    ia, ib = 1.0 / np.maximum(a, 1e-9), 1.0 / np.maximum(b, 1e-9)
    di = np.abs(ia - ib)
    print(f"{name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
          f"maxrel={rel.max():.3e} scale={np.abs(a).max():.2f} | "
          f"invdepth max|d|={di.max():.3e} mean={di.mean():.3e} "
          f"iscale={np.abs(ia).max():.3f}")
