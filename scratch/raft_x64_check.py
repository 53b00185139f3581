"""Does jax_enable_x64 slow the composed RAFT? 24-iter RAFT standalone."""
import sys, time
import jax
if "x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.raft import RAFT

B, H, W = 1, 384, 1280
cfg = SfMConfig.kitti(nlabel=128).override(**{"flow.raft_iters_eval": 24}).flow
model = RAFT(cfg, dtype=jnp.bfloat16)
pair = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 6), jnp.float32, -1, 1)
mv = jax.jit(lambda x: model.init(jax.random.PRNGKey(3), x, False))(pair[:, :128, :256])

def f(v, x):
    fl, _ = model.apply(v, x, False)
    return jnp.sum(jnp.abs(fl))
fj = jax.jit(f)
for _ in range(2): float(fj(mv, pair))
t0 = time.perf_counter()
for _ in range(6): float(fj(mv, pair))
print(("x64" if "x64" in sys.argv else "f32"), "RAFT-24: %.1f ms" % ((time.perf_counter()-t0)/6*1000))
