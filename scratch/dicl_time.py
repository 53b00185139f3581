"""DICL eval-shape timing (the reference's default flow estimator)."""
import time
import jax
import jax.numpy as jnp
from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.dicl import DICLFlow

B, H, W = 1, 384, 1280
cfg = SfMConfig.kitti().flow
model = DICLFlow(cfg, dtype=jnp.bfloat16)
pair = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 6), jnp.float32, -1, 1)
mv = jax.jit(lambda x: model.init(jax.random.PRNGKey(3), x, False))(pair[:, :128, :256])

def f(v, x):
    fl, en = model.apply(v, x, False)
    return jnp.sum(jnp.abs(fl)) + jnp.sum(jnp.abs(en))
fj = jax.jit(f)
for _ in range(2): float(fj(mv, pair))
t0 = time.perf_counter()
for _ in range(6): float(fj(mv, pair))
print("DICL eval fwd: %.1f ms" % ((time.perf_counter()-t0)/6*1000))
