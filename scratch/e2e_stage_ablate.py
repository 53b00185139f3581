"""End-to-end stage attribution at the EXACT bench config.

Times three jits: flow-only, flow+pose, full forward. Differences give
honest stage costs (one sync read each).
"""
import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

B, H, W = 1, 384, 1280
ITERS = 6
cfg = SfMConfig.kitti(nlabel=128).override(**{
    "pose.num_hypotheses": 512,
    "pose.ransac_iter": 5, "pose.num_correspondences": 1024,
    "pose.polish_iters": 5})
model = SFMNet(cfg, dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
ref = jax.random.uniform(key, (B, H, W, 3), jnp.float32, -1, 1)
target = jnp.roll(ref, 3, axis=2)
K = jnp.broadcast_to(jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]], jnp.float32), (B, 3, 3))
variables = jax.jit(lambda r, t, k: model.init(jax.random.PRNGKey(1), r, t, k, key=jax.random.PRNGKey(2)))(ref[:, :128, :384], target[:, :128, :384], K)


def timeit(name, fn, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        float(f(variables, ref, target, K))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(f(variables, ref, target, K))
    print(f"{name:22s} {(time.perf_counter()-t0)/ITERS*1000:8.1f} ms", flush=True)


def fwd(v, r, t, k, upto):
    out = model.apply(v, r, t, k, key=jax.random.PRNGKey(3),
                      method=None)
    if upto == "flow":
        return jnp.sum(jnp.abs(out["flow"]))
    if upto == "pose":
        return jnp.sum(jnp.abs(out["pose"])) + jnp.sum(jnp.abs(out["flow"]))
    return jnp.sum(out["depth"]) + jnp.sum(jnp.abs(out["pose"]))

timeit("flow only", lambda v, r, t, k: fwd(v, r, t, k, "flow"))
timeit("flow + pose", lambda v, r, t, k: fwd(v, r, t, k, "pose"))
timeit("FULL", lambda v, r, t, k: fwd(v, r, t, k, "full"))
