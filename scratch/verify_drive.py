"""Verify-skill steps 2+3: composite SFMNet forward + zero-flow probe."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.ops.essential import ransac_pose

cfg = SfMConfig().override(**{
    "flow.raft_iters_train": 2,
    "flow.raft_iters_eval": 2,
    "depth.nlabel": 8,
    "pose.num_hypotheses": 16,
    "pose.ransac_iter": 1,
    "pose.num_correspondences": 128,
    "pose.polish_iters": 2,
})
model = SFMNet(cfg, dtype=jnp.bfloat16)
b, h, w = 1, 64, 96
key = jax.random.PRNGKey(0)
ref = jax.random.uniform(key, (b, h, w, 3), jnp.float32, -1, 1)
target = jnp.roll(ref, 2, axis=2)
K = jnp.broadcast_to(
    jnp.asarray([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], jnp.float32),
    (b, 3, 3))
variables = jax.jit(
    lambda r, t, k: model.init(jax.random.PRNGKey(0), r, t, k,
                               key=jax.random.PRNGKey(1))
)(ref, target, K)
out = jax.jit(
    lambda v, r, t, k: model.apply(v, r, t, k, key=jax.random.PRNGKey(2))
)(variables, ref, target, K)
depth, pose = out["depth"], out["pose"]
assert depth.shape == (b, h, w), depth.shape
assert bool(jnp.all(jnp.isfinite(depth))), "non-finite depth"
assert pose.shape == (b, 3, 4), pose.shape
tn = float(jnp.linalg.norm(pose[0, :, 3]))
assert abs(tn - 1.0) < 1e-3, f"translation not unit: {tn}"
print(f"composite forward OK: depth finite {depth.shape}, |t|={tn:.6f}")

# step 3: zero-flow (no parallax) must return finite P, not crash
u = jnp.linspace(5, w - 5, 16)
v = jnp.linspace(5, h - 5, 16)
uu, vv = jnp.meshgrid(u, v)
pts = jnp.stack([uu.ravel(), vv.ravel()], -1)[None]  # (1, 256, 2)
Kinv = jnp.linalg.inv(K)
norm = (jnp.einsum(
    "bij,bnj->bni", Kinv,
    jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1),
)[..., :2]).astype(jnp.float64)
out3 = ransac_pose(norm, norm, jax.random.PRNGKey(3), num_hypotheses=16,
                   ransac_iter=1)
assert bool(jnp.all(jnp.isfinite(out3["P"]))), "non-finite P on zero flow"
print(f"zero-flow probe OK: P finite, inliers={int(out3['inliers'][0])}")
