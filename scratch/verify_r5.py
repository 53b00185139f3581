"""Round-5 /verify drive: public-API end-to-end on CPU (recipe steps 1-3, 5)."""
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

# 1. synthetic pose recovery: known R,t -> rigid flow -> ransac
B, H, W = 1, 64, 96
f = 80.0
K = jnp.asarray([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]])
K_inv = jnp.linalg.inv(K)
depth = 5.0 + 2.0 * jax.random.uniform(jax.random.PRNGKey(0), (B, H, W))
angle = jnp.asarray([[0.03, -0.02, 0.01]])
from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix as euler_to_matrix

R = euler_to_matrix(angle)
t = jnp.asarray([[0.3, -0.1, 0.6]])
t = t / jnp.linalg.norm(t)
pose = jnp.concatenate([R, t[..., None]], axis=-1)
flow = pose2flow(depth, pose, K, K_inv)
conf = jnp.ones((B, H, W, 1))
x1, x2, nv = sample_correspondences(
    flow, K_inv, 512, margin=4, key=jax.random.PRNGKey(1), conf=conf)
out = ransac_pose(x1, x2, jax.random.PRNGKey(2), num_hypotheses=128,
                  ransac_iter=1, polish_iters=5, solve_dtype=jnp.float32)
P = out["P"]
r_err = np.degrees(np.arccos(np.clip((np.trace(
    np.asarray(P[0, :, :3]).T @ np.asarray(R[0])) - 1) / 2, -1, 1)))
t_est = np.array(P[0, :, 3]); t_est = t_est / np.linalg.norm(t_est)
t_err = np.degrees(np.arccos(np.clip(abs(float(t_est @ np.asarray(t[0]))),
                                     -1, 1)))
frac = float(out["inliers"][0]) / 512
print(f"1. pose recovery: rot_err {r_err:.4f} deg, trans_err {t_err:.4f} "
      f"deg, inliers {frac:.2%}")
assert r_err < 0.5 and t_err < 1.0 and frac > 0.9

# 2. composite SFMNet forward, tiny config
cfg = SfMConfig().override(**{
    "flow.raft_iters_eval": 2, "depth.nlabel": 8,
    "pose.num_hypotheses": 16, "pose.num_correspondences": 128,
    "depth.remat": False, "train.mixed_prec": False})
net = SFMNet(cfg)
ref = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3))
tgt = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 96, 3))
variables = jax.jit(net.init)(jax.random.PRNGKey(5), ref, tgt, K,
                              key=jax.random.PRNGKey(6))
o = jax.jit(lambda v, r, tg, k, kk: net.apply(v, r, tg, k, key=kk))(
    variables, ref, tgt, K, jax.random.PRNGKey(7))
d, p = o["depth"], o["pose"]
assert d.shape == (1, 64, 96) and bool(jnp.all(jnp.isfinite(d)))
assert p.shape == (1, 3, 4) and abs(
    float(jnp.linalg.norm(p[0, :, 3])) - 1.0) < 1e-5
print(f"2. SFMNet fwd: depth {d.shape} finite, pose unit-trans OK")

# 3. zero-flow probe: degenerate pair must stay finite
xz1, xz2, _ = sample_correspondences(
    jnp.zeros_like(flow), K_inv, 256, margin=4,
    key=jax.random.PRNGKey(8), conf=conf)
oz = ransac_pose(xz1, xz2, jax.random.PRNGKey(9), num_hypotheses=64,
                 ransac_iter=1, polish_iters=3, solve_dtype=jnp.float32)
assert bool(jnp.all(jnp.isfinite(oz["P"])))
print("3. zero-flow probe: finite P OK")

# 5. multichip dryrun
import __graft_entry__ as g

g.dryrun_multichip(8)
print("5. dryrun_multichip(8) OK")
print("VERIFY PASS")
