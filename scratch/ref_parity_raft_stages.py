"""Stage-wise RAFT parity: fnet/cnet, corr pyramid lookup at iter 1,
update block, convex upsample — driving the reference's components
manually for full control."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tests")
from reference_harness import load_reference

refcfg = load_reference()
import torch

torch.manual_seed(0)
sys.path.insert(0, "/root/reference/models/RAFT/core")
from models.RAFT.core.raft import RAFT as RefRAFT  # noqa: E402 (sets paths)
from corr import CorrBlock  # noqa: E402
from raft_utils import coords_grid  # noqa: E402

tm = RefRAFT().eval()
B, H, W = 1, 128, 192
x = torch.rand(B, 6, H, W) * 2 - 1
im1, im2 = x[:, :3], x[:, 3:]
perm = [2, 1, 0]
im1p, im2p = im1[:, perm].contiguous(), im2[:, perm].contiguous()

with torch.no_grad():
    fmap1, fmap2 = tm.fnet([im1p, im2p])
    corr_fn = CorrBlock(fmap1, fmap2, radius=4)
    cnet = tm.cnet(im1p)
    net_t, inp_t = torch.split(cnet, [128, 128], dim=1)
    net_t, inp_t = torch.tanh(net_t), torch.relu(inp_t)
    coords0 = coords_grid(B, H // 8, W // 8)
    coords1 = coords0.clone()
    corr_t = corr_fn(coords1)
    flow_t = coords1 - coords0
    net2_t, mask_t, dflow_t = tm.update_block(net_t, inp_t, corr_t, flow_t)
    coords1b = coords1 + dflow_t
    up_t = tm.upsample_flow(coords1b - coords0, mask_t)

sd = {f"flow_estimator.{k}": v.numpy() for k, v in tm.state_dict().items()}

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.raft import RAFT
from deep_sfm_revisited_tpu.utils import torch_port as tp

cfg0 = SfMConfig.kitti().flow
cfg = cfg0.__class__(**{**cfg0.__dict__, "raft_iters_eval": 1})
net = RAFT(cfg)
pair = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
variables = net.init(jax.random.PRNGKey(0), pair, False)
entries = [
    (kind, tkey, fpath.replace("flow_net/", ""))
    for kind, tkey, fpath in tp.raft_entries("flow_estimator", "flow_net")
]
ported, report = tp.apply_entries(sd, variables, entries)
assert not report["missing"], report["missing"][:8]

(jflow, _), state = net.apply(ported, pair, False,
                              capture_intermediates=True,
                              mutable=["intermediates"])
inter = state["intermediates"]


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    print(f"{name}: max|d|={d.max():.3e} mean={d.mean():.3e} "
          f"scale={np.abs(a).max():.3f} {a.shape}")


j_f = np.asarray(inter["fnet"]["__call__"][0])  # (2B, h, w, 256)
cmp("fmap1", fmap1.numpy().transpose(0, 2, 3, 1), j_f[:B])
cmp("fmap2", fmap2.numpy().transpose(0, 2, 3, 1), j_f[B:])
j_c = np.asarray(inter["cnet"]["__call__"][0])
cmp("cnet", cnet.numpy().transpose(0, 2, 3, 1), j_c)

def walk(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from walk(v, p)
        else:
            yield p, v


cmp("final up flow (1 iter)", up_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(jflow))

# ---- manual single iteration with our components on TORCH tensors
from deep_sfm_revisited_tpu.models.raft import (
    UpdateBlock,
    convex_upsample,
    correlation_pyramid,
    lookup_correlation,
)

f1 = jnp.asarray(fmap1.numpy().transpose(0, 2, 3, 1))
f2 = jnp.asarray(fmap2.numpy().transpose(0, 2, 3, 1))
pyr = correlation_pyramid(f1, f2, 4, 4)
h8, w8 = H // 8, W // 8
gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                      jnp.arange(w8, dtype=jnp.float32), indexing="ij")
c0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, h8, w8, 2))
corr_j = lookup_correlation(pyr, c0, 4)
cmp("corr lookup", corr_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(corr_j))

ub = UpdateBlock(128)
net_j0 = jnp.asarray(net_t.numpy().transpose(0, 2, 3, 1))
inp_j = jnp.asarray(inp_t.numpy().transpose(0, 2, 3, 1))
corr_tj = jnp.asarray(corr_t.numpy().transpose(0, 2, 3, 1))
flow_j = jnp.asarray(flow_t.numpy().transpose(0, 2, 3, 1))
ub_vars = {"params": ported["params"]["UpdateBlock_0"]}
net2_j, mask_j, dflow_j = ub.apply(ub_vars, net_j0, inp_j, corr_tj, flow_j)
cmp("dflow (torch inputs)", dflow_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(dflow_j))
cmp("net2 (torch inputs)", net2_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(net2_j))
cmp("mask (torch inputs)", mask_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(mask_j))
up_j = convex_upsample(
    jnp.asarray((coords1b - coords0).numpy().transpose(0, 2, 3, 1)),
    jnp.asarray(mask_t.numpy().transpose(0, 2, 3, 1)),
)
cmp("convex upsample (torch inputs)", up_t.numpy().transpose(0, 2, 3, 1),
    np.asarray(up_j))
