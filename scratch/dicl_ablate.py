"""DICL eval-forward sub-stage attribution at the flagship shape.

Stage table (PERF.md) has DICL at 20.3 ms/pair but no internal split.
Estimate: the level-2 (96x320, 49-displacement) MatchingNet is ~510
GFLOP ~ 6.5 ms at the measured 42% conv efficiency; where are the other
~14 ms? Measures, each as its own jitted program with a fused scalar
sync (floor ~25 ms subtracted via an empty-read baseline):

  a. full DICLFlow forward
  b. FeatureGA on the batched frame pair (the shared U-net)
  c. MatchingNet level-2 alone on a pre-folded (49, 96, 320, 64) input
  d. shifted_pairs + fold at level 2 (stack build traffic)
  e. one context_net level at 96x320x38 (x5 levels in the real net)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.dicl import (
    DICLFlow, FeatureGA, MatchingNet, shifted_pairs,
)

B, H, W = 1, 384, 1280
d = jnp.bfloat16
cfg = SfMConfig.kitti().flow
key = jax.random.PRNGKey(0)

def timed(name, fn, *args, iters=8, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:7.1f} ms", flush=True)
    return dt

# read-floor baseline: trivial program, same sync pattern
zero = jnp.zeros((), jnp.float32)
floor = timed("read floor (empty program)", lambda z: z + 1.0, zero)

# a. full DICL
model = DICLFlow(cfg, dtype=d)
pair = jax.random.uniform(key, (B, H, W, 6), jnp.float32, -1, 1)
mv = jax.jit(lambda x: model.init(jax.random.PRNGKey(3), x, False))(
    pair[:, :128, :256])
timed("a. DICLFlow full fwd", lambda x: model.apply(mv, x, False)[0], pair)

# b. feature U-net on both frames (batched, as the eval path does)
feat = FeatureGA(dtype=d)
fv = jax.jit(lambda x: feat.init(jax.random.PRNGKey(4), x, False))(
    pair[:, :128, :256, :3])
both = jnp.concatenate([pair[..., :3], pair[..., 3:]], axis=0)
timed("b. FeatureGA both frames", lambda x: feat.apply(fv, x, False)[0], both)

# c. level-2 MatchingNet on the folded displacement batch
m2 = MatchingNet(dtype=d)
folded = jax.random.uniform(key, (49, H // 4, W // 4, 64), d, -1, 1)
m2v = jax.jit(lambda x: m2.init(jax.random.PRNGKey(5), x, False))(
    folded[:2, :32, :64])
timed("c. MatchingNet level-2 (49, 96, 320, 64)",
      lambda x: m2.apply(m2v, x, False), folded)

# d. stack build at level 2
xf = jax.random.uniform(key, (B, H // 4, W // 4, 32), d, -1, 1)
yf = jax.random.uniform(key, (B, H // 4, W // 4, 32), d, -1, 1)
def build(x, y):
    s = shifted_pairs(x, y, 3)
    return s.reshape(49, H // 4, W // 4, 64)
timed("d. shifted_pairs+fold level 2", build, xf, yf)

# e. one context net at level 2 shape (the real model runs 5, at
#    strides 4..64 -> level 2 dominates)
from deep_sfm_revisited_tpu.models.dicl import BasicConv
from flax import linen as nn
class Ctx(nn.Module):
    @nn.compact
    def __call__(self, h, train=False):
        for c, dil in ((64, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)):
            h = BasicConv(c, 3, 1, dilation=dil, dtype=d)(h, train)
        return nn.Conv(2, (3, 3), padding=1, dtype=d)(h)
ctx = Ctx()
cin = jax.random.uniform(key, (B, H // 4, W // 4, 38), d, -1, 1)
cv = jax.jit(lambda x: ctx.init(jax.random.PRNGKey(6), x))(cin[:, :32, :64])
timed("e. context net level 2 (96, 320, 38)",
      lambda x: ctx.apply(cv, x), cin)

print(f"(floor above ~{floor:.1f} ms is included in every line)", flush=True)
