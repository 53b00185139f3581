"""DICL sub-stage attribution, round 4: the unattributed ~8 ms.

Round-2 attribution (scratch/dicl_ablate.py) covered full fwd ~16-20 ms,
FeatureGA ~3.0, level-2 MatchingNet ~5.1, stack build ~0, one context
net ~0.3, leaving "levels 3-6 + warps + resizes" unmeasured. This times
every remaining component at its true per-level shape (B=1, 384x1280):

  * MatchingNet at levels 3..6 (folded 49-way displacement batches at
    strides 8..64);
  * warp_flow of the level features before each cost volume (levels
    5,4,3,2 warp the target features by the upsampled flow);
  * context nets at each level's resolution (38-ch input);
  * flow_regression + flow_entropy at level 2 (the big softmax);
  * the resize family: x_img -> each level (context-net guidance),
    up_flow level-to-level, and the final flow/entropy upsample to
    (384, 1280);
  * smooth_cost 1x1 at level 2.

Run on the chip: python scratch/dicl_ablate2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.dicl import (
    BasicConv,
    MatchingNet,
    flow_entropy,
    flow_regression,
    resize_bilinear,
    shifted_pairs,
    warp_flow,
)
import flax.linen as nn

B, H, W = 1, 384, 1280
d = jnp.bfloat16
cfg = SfMConfig.kitti().flow
md = 3
S2 = (2 * md + 1) ** 2
key = jax.random.PRNGKey(0)


def timed(name, fn, *args, iters=8, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:7.2f} ms", flush=True)
    return dt


zero = jnp.zeros((), jnp.float32)
floor = timed("read floor (empty program)", lambda z: z + 1.0, zero)

m = MatchingNet(dtype=d)
lvl_shapes = {2: (96, 320), 3: (48, 160), 4: (24, 80), 5: (12, 40),
              6: (6, 20)}
total_match = 0.0
for lvl in (3, 4, 5, 6):
    hc, wc = lvl_shapes[lvl]
    folded = jax.random.uniform(key, (B * S2, hc, wc, 64), jnp.float32,
                                -1, 1).astype(d)
    mv = jax.jit(lambda x: m.init(jax.random.PRNGKey(1), x, False))(folded)
    t = timed(f"MatchingNet level {lvl} ({hc}x{wc} x49)",
              lambda v, x: m.apply(v, x, False), mv, folded)
    total_match += max(t - floor, 0)

# warps: level features warped by up_flow before the cost volume
total_warp = 0.0
for lvl in (5, 4, 3, 2):
    hc, wc = lvl_shapes[lvl]
    yf = jax.random.uniform(key, (B, hc, wc, 32), jnp.float32).astype(d)
    fl = jax.random.normal(key, (B, hc, wc, 2), jnp.float32)
    t = timed(f"warp_flow level {lvl} ({hc}x{wc}x32)",
              lambda y, f: warp_flow(y, f), yf, fl)
    total_warp += max(t - floor, 0)

# context nets at every level (38-ch input, 6 dilated convs + head)


class Ctx(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = x
        for c, dil in ((64, 1), (128, 2), (128, 4), (96, 8), (64, 16),
                       (32, 1)):
            h = BasicConv(c, 3, 1, dilation=dil, dtype=d)(h, False)
        return nn.Conv(2, (3, 3), padding=1, dtype=d)(h)


total_ctx = 0.0
ctx = Ctx()
for lvl in (2, 3, 4, 5, 6):
    hc, wc = lvl_shapes[lvl]
    fin = jax.random.uniform(key, (B, hc, wc, 38), jnp.float32).astype(d)
    cv = jax.jit(lambda x: ctx.init(jax.random.PRNGKey(2), x))(fin)
    t = timed(f"context net level {lvl} ({hc}x{wc}x38)",
              lambda v, x: ctx.apply(v, x), cv, fin)
    total_ctx += max(t - floor, 0)

# regression + entropy + smooth at level 2
cost2 = jax.random.normal(key, (B, S2, 96, 320), jnp.float32)
t_reg = timed("flow_regression level 2", lambda c: flow_regression(c, md),
              cost2) - floor
t_ent = timed("flow_entropy level 2", flow_entropy, cost2) - floor

smooth = nn.Conv(S2, (1, 1), use_bias=False, dtype=d)
sv = jax.jit(lambda x: smooth.init(jax.random.PRNGKey(3), x))(
    jnp.moveaxis(cost2, 1, -1).astype(d))
t_sm = timed("smooth_cost 1x1 level 2",
             lambda v, c: smooth.apply(
                 v, jnp.moveaxis(c, 1, -1).astype(d)), sv, cost2) - floor

# resizes
x_img = jax.random.uniform(key, (B, H, W, 3), jnp.float32).astype(d)
total_rs = 0.0
for lvl in (2, 3, 4, 5, 6):
    hc, wc = lvl_shapes[lvl]
    t = timed(f"resize x_img -> level {lvl}",
              lambda x, hw=(hc, wc): resize_bilinear(x, hw), x_img)
    total_rs += max(t - floor, 0)
fl2 = jax.random.normal(key, (B, 96, 320, 2), jnp.float32)
t_up = timed("final flow resize 96x320 -> 384x1280",
             lambda f: resize_bilinear(f, (H, W)), fl2) - floor
ent2 = jax.random.uniform(key, (B, 96, 320, 1), jnp.float32)
t_upe = timed("final entropy resize -> 384x1280",
              lambda f: resize_bilinear(f, (H, W)), ent2) - floor

print(f"\nsums (floor-subtracted): matching 3-6 {total_match:.2f} ms, "
      f"warps {total_warp:.2f}, contexts(all) {total_ctx:.2f}, "
      f"regress {max(t_reg, 0):.2f}, entropy {max(t_ent, 0):.2f}, "
      f"smooth {max(t_sm, 0):.2f}, guidance resizes {total_rs:.2f}, "
      f"final upsamples {max(t_up, 0) + max(t_upe, 0):.2f}", flush=True)
