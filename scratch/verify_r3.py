"""Verify recipe steps 1-3 (CPU): pose recovery, composite forward, zero-flow."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.ops.camera import pose2flow
from deep_sfm_revisited_tpu.ops.essential import ransac_pose
from deep_sfm_revisited_tpu.ops.flow_ops import sample_correspondences

# --- 1. synthetic pose recovery ---
H, W = 64, 96
K = jnp.asarray([[[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]]])
rng = np.random.default_rng(0)
ang = 0.05
R = np.asarray([
    [np.cos(ang), -np.sin(ang), 0],
    [np.sin(ang), np.cos(ang), 0],
    [0, 0, 1.0],
])
t = np.asarray([0.4, 0.1, 0.9])
t = t / np.linalg.norm(t)
pose = jnp.asarray(np.concatenate([R, t[:, None]], 1), jnp.float32)[None]
depth = jnp.asarray(4.0 + 2.0 * rng.random((1, H, W)), jnp.float32)
flow = pose2flow(depth, pose, K, jnp.linalg.inv(K))
x1, x2 = sample_correspondences(
    flow.astype(jnp.float64), jnp.linalg.inv(K).astype(jnp.float64),
    num_points=256, margin=4, key=jax.random.PRNGKey(0))
out = ransac_pose(x1, x2, jax.random.PRNGKey(1), num_hypotheses=64,
                  ransac_iter=2)
P = np.asarray(out["P"][0])
rot_err = np.degrees(np.arccos(np.clip((np.trace(P[:, :3] @ R.T) - 1) / 2, -1, 1)))
t_err = np.degrees(np.arccos(np.clip(abs(P[:, 3] @ t), -1, 1)))
inl = float(out["inliers"][0]) / 256
print(f"1. pose recovery: rot_err={rot_err:.4f}deg t_err={t_err:.4f}deg inliers={inl:.2%}")
assert rot_err < 0.5 and t_err < 1.0 and inl > 0.9

# --- 2. composite forward ---
cfg = SfMConfig().override(**{
    "flow.raft_iters_eval": 2, "depth.nlabel": 8,
    "pose.num_hypotheses": 16, "pose.num_correspondences": 128,
})
model = SFMNet(cfg)
ref = jnp.asarray(rng.random((1, H, W, 3), np.float32) * 2 - 1)
tgt = jnp.asarray(rng.random((1, H, W, 3), np.float32) * 2 - 1)
variables = jax.jit(
    lambda r, tg, k: model.init(jax.random.PRNGKey(0), r, tg, k,
                                key=jax.random.PRNGKey(0))
)(ref, tgt, K)
o = jax.jit(
    lambda v, r, tg, k: model.apply(v, r, tg, k, key=jax.random.PRNGKey(2))
)(variables, ref, tgt, K)
assert o["depth"].shape == (1, H, W) and np.isfinite(np.asarray(o["depth"])).all()
assert o["pose"].shape == (1, 3, 4)
tn = float(jnp.linalg.norm(o["pose"][0, :3, 3]))
print(f"2. composite forward: depth {o['depth'].shape} finite, |t|={tn:.4f}")
assert abs(tn - 1.0) < 1e-3

# --- 3. zero-flow probe ---
zf = jnp.zeros((1, H, W, 2), jnp.float64)
z1, z2 = sample_correspondences(zf, jnp.linalg.inv(K).astype(jnp.float64),
                                num_points=128, margin=4,
                                key=jax.random.PRNGKey(0))
zo = ransac_pose(z1, z2, jax.random.PRNGKey(1), num_hypotheses=16,
                 ransac_iter=1)
assert np.isfinite(np.asarray(zo["P"])).all()
print("3. zero-flow probe: finite P, no crash")
print("CPU verify steps PASSED")
