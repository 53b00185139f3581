"""Verify recipe steps 1-3: synthetic pose recovery, composite forward,
zero-flow probe. CPU platform."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.ops.camera import pose2flow
from deep_sfm_revisited_tpu.ops.essential import ransac_pose
from deep_sfm_revisited_tpu.ops.flow_ops import sample_correspondences
from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix

# ---- 1. synthetic pose recovery through the full correspondence path
B, H, W = 1, 96, 128
K = jnp.asarray([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]],
                jnp.float64)
K_inv = jnp.linalg.inv(K)
R = angle_to_matrix(jnp.asarray([[0.02, -0.03, 0.01]], jnp.float64))  # (1,3,3)
t = jnp.asarray([[0.8, 0.1, 0.6]], jnp.float64)
t = t / jnp.linalg.norm(t)
pose = jnp.concatenate([R, t[..., None]], axis=-1)  # (1,3,4)
depth = 8.0 + 2.0 * jax.random.uniform(jax.random.PRNGKey(0), (B, H, W),
                                       jnp.float64)
flow = pose2flow(depth.astype(jnp.float32), pose.astype(jnp.float32),
                 K.astype(jnp.float32), K_inv.astype(jnp.float32))
x1, x2 = sample_correspondences(flow.astype(jnp.float64), K_inv, 512,
                                margin=6, key=jax.random.PRNGKey(1))
out = ransac_pose(x1, x2, jax.random.PRNGKey(2), num_hypotheses=64,
                  ransac_iter=1, threshold=1e-4, polish=True, polish_iters=5)
P = np.asarray(out["P"])[0]
r_err = np.degrees(np.arccos(np.clip((np.trace(P[:, :3] @ np.asarray(R[0]).T) - 1) / 2, -1, 1)))
t_est = P[:, 3] / np.linalg.norm(P[:, 3])
t_err = np.degrees(np.arccos(np.clip(abs(float(t_est @ np.asarray(t[0]))), -1, 1)))
inl = float(out["inliers"][0]) / 512
print(f"1. pose recovery: rot_err={r_err:.4f} deg  t_err={t_err:.4f} deg  inliers={inl:.2%}")
assert r_err < 0.5 and t_err < 1.0 and inl > 0.9, "pose recovery failed"

# ---- 2. composite forward (tiny config)
cfg = SfMConfig().override(**{
    "flow.raft_iters_eval": 2, "depth.nlabel": 8,
    "pose.num_hypotheses": 16, "pose.ransac_iter": 1,
    "pose.num_correspondences": 128, "pose.polish_iters": 2,
})
model = SFMNet(cfg, dtype=jnp.bfloat16)
ref = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3), jnp.float32, -1, 1)
tgt = jnp.roll(ref, 2, axis=2)
Kf = jnp.asarray([[[80.0, 0, 48.0], [0, 80.0, 32.0], [0, 0, 1]]], jnp.float32)
variables = jax.jit(
    lambda r, t_, k: model.init(jax.random.PRNGKey(4), r, t_, k,
                                key=jax.random.PRNGKey(5))
)(ref, tgt, Kf)
o = jax.jit(lambda v, r, t_, k: model.apply(v, r, t_, k,
                                            key=jax.random.PRNGKey(6)))(
    variables, ref, tgt, Kf)
assert o["depth"].shape == (1, 64, 96), o["depth"].shape
assert o["pose"].shape == (1, 3, 4)
assert bool(jnp.all(jnp.isfinite(o["depth"]))), "non-finite depth"
tn = float(jnp.linalg.norm(o["pose"][0, :3, 3]))
print(f"2. composite forward: depth finite, |t|={tn:.4f}")
assert abs(tn - 1.0) < 1e-3

# ---- 3. zero-flow probe
z1, z2 = sample_correspondences(jnp.zeros((1, 64, 96, 2), jnp.float64),
                                jnp.linalg.inv(Kf.astype(jnp.float64)), 128,
                                key=jax.random.PRNGKey(7))
oz = ransac_pose(z1, z2, jax.random.PRNGKey(8), num_hypotheses=16,
                 ransac_iter=1, threshold=1e-4, polish=True, polish_iters=2)
assert bool(jnp.all(jnp.isfinite(oz["P"]))), "zero-flow P not finite"
print("3. zero-flow probe: finite P, no crash")
print("VERIFY 1-3 OK")
