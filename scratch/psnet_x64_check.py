"""PSNet full forward, x64 on/off, standalone at bench shape."""
import sys, time
import jax
if "x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet

B, H, W = 1, 384, 1280
cfg = SfMConfig.kitti(nlabel=128)
net = PSNet(cfg.depth, norm_target=0.6, dtype=jnp.bfloat16)
img = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32, -1, 1)
K = jnp.asarray([[[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]]], jnp.float32)
Ki = jnp.linalg.inv(K)
pose = jnp.concatenate([jnp.eye(3)[None], jnp.asarray([[[0.54],[0.0],[0.1]]])], -1).astype(jnp.float32)
pv = jax.jit(lambda r, t: net.init(jax.random.PRNGKey(1), r, t[:, None], pose[:, None], K, Ki, False))(img[:, :128, :384], img[:, :128, :384])

def f(v, r, t):
    di, d = net.apply(v, r, t[:, None], pose[:, None], K, Ki, False)
    return jnp.sum(d)
fj = jax.jit(f)
for _ in range(2): float(fj(pv, img, img))
t0 = time.perf_counter()
for _ in range(6): float(fj(pv, img, img))
print(("x64" if "x64" in sys.argv else "f32"),
      "PSNet full: %.1f ms" % ((time.perf_counter()-t0)/6*1000))
