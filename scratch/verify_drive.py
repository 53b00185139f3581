"""Verify-skill drive: synthetic pose recovery + composite forward + probe."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.ops.camera import pose2flow
from deep_sfm_revisited_tpu.ops.essential import ransac_pose
from deep_sfm_revisited_tpu.ops.flow_ops import sample_correspondences

# 1. synthetic pose recovery
rng = np.random.default_rng(0)
H, W = 64, 96
K = jnp.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
ang = 0.05
R = jnp.asarray(
    [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
)
t = jnp.asarray([0.6, 0.1, 0.79])
t = t / jnp.linalg.norm(t)
depth = jnp.asarray(5.0 + 3.0 * rng.random((1, H, W)))
pose = jnp.concatenate([R, t[:, None]], axis=1)[None]  # (1, 3, 4)
flow = pose2flow(depth, pose, K[None], jnp.linalg.inv(K)[None])
pts1, pts2 = sample_correspondences(
    flow, jnp.linalg.inv(K)[None], 512, key=jax.random.PRNGKey(1)
)
out = ransac_pose(
    pts1, pts2, jax.random.PRNGKey(2), num_hypotheses=64, ransac_iter=1,
    polish_iters=3,
)
P, inl = out["P"], out["inliers"]
R_est, t_est = P[0, :3, :3], P[0, :3, 3]
rot_err = np.degrees(
    np.arccos(np.clip((np.trace(R_est.T @ R) - 1) / 2, -1, 1))
)
t_err = np.degrees(
    np.arccos(np.clip(abs(float(t_est @ t) / np.linalg.norm(t_est)), -1, 1))
)
print(f"pose recovery: rot_err={rot_err:.4f} deg t_err={t_err:.4f} deg "
      f"inliers={float(inl[0]):.0f}/512")
assert rot_err < 0.5 and t_err < 1.0, "pose recovery failed"

# 3. zero-flow probe
z1, z2 = sample_correspondences(
    jnp.zeros((1, H, W, 2)), jnp.linalg.inv(K)[None], 256,
    key=jax.random.PRNGKey(3),
)
zout = ransac_pose(z1, z2, jax.random.PRNGKey(4), num_hypotheses=16,
                   ransac_iter=1, polish_iters=2)
assert bool(jnp.all(jnp.isfinite(zout["P"]))), "zero-flow probe non-finite P"
print("zero-flow probe: finite P OK")

# 2. composite forward on the tiny config
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

cfg = SfMConfig().override(**{
    "flow.raft_iters_train": 2, "flow.raft_iters_eval": 2,
    "depth.nlabel": 8, "pose.num_hypotheses": 16,
    "pose.ransac_iter": 1, "pose.num_correspondences": 128,
    "pose.polish_iters": 2,
})
model = SFMNet(cfg, dtype=jnp.bfloat16)
ref = jax.random.uniform(jax.random.PRNGKey(5), (1, H, W, 3), jnp.float32, -1, 1)
tgt = jnp.roll(ref, 2, axis=2)
variables = jax.jit(
    lambda r, t_, k: model.init(jax.random.PRNGKey(0), r, t_, k,
                                key=jax.random.PRNGKey(1))
)(ref, tgt, K[None])
out = jax.jit(
    lambda v, r, t_, k: model.apply(v, r, t_, k, key=jax.random.PRNGKey(2))
)(variables, ref, tgt, K[None])
d, p = out["depth"], out["pose"]
assert d.shape == (1, H, W) and bool(jnp.all(jnp.isfinite(d))), d.shape
assert p.shape == (1, 3, 4) and bool(jnp.all(jnp.isfinite(p)))
tn = float(jnp.linalg.norm(p[0, :3, 3]))
print(f"composite forward: depth {d.shape} finite, pose |t|={tn:.3f}")
assert abs(tn - 1.0) < 1e-3, "pose translation not unit-normalized"
print("VERIFY DRIVE OK")
