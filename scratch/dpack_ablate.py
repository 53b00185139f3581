"""D-packed hourglass timing at the bench shape (B=1, 384x1280, D=128).

Compares dpack=1 (current: Cout=32 at 25% MXU lanes) vs dpack=4 (packed
(G+2)/3 = 2x FLOPs at 100% lanes -> expected ~2x). One fused sync scalar
per iteration (~25 ms read floor on axon — compare deltas, not absolutes).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.psnet import Hourglass3D
from deep_sfm_revisited_tpu.models.submodules import dpack

B, H, W, D = 1, 384, 1280, 128
h4, w4 = H // 4, W // 4
ITERS = 6


def timeit(name, fn, *args, warmup=2):
    def scalarized(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32)))
                   for o in jax.tree.leaves(out))
    sc = jax.jit(scalarized)
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
cost = jax.random.uniform(key, (B, D, h4, w4, 64), jnp.bfloat16, -1, 1)
cost_p = jax.jit(lambda c: dpack(c, 4))(cost)

hg1 = Hourglass3D(dtype=jnp.bfloat16, dpack=1)
hgh = Hourglass3D(dtype=jnp.bfloat16, dpack=4, dpack_mode="halo")
hgt = Hourglass3D(dtype=jnp.bfloat16, dpack=4, dpack_mode="tridiag")
hv = jax.jit(lambda c: hg1.init(jax.random.PRNGKey(2), c[:, :8, :32, :64],
                                False))(cost)

y1 = jax.jit(lambda v, c: hg1.apply(v, c, False))(hv, cost)
for name, hg in [("halo", hgh), ("tridiag", hgt)]:
    y4 = jax.jit(lambda v, c, h=hg: h.apply(v, c, False))(hv, cost_p)
    rel = float(
        jnp.max(jnp.abs(y1.astype(jnp.float32) - y4.astype(jnp.float32)))
        / (float(jnp.max(jnp.abs(y1.astype(jnp.float32)))) + 1e-9))
    print(f"{name}-vs-unpacked max rel diff: {rel:.2e}", flush=True)

timeit("Hourglass3D dpack=1 (current)", lambda v, c: hg1.apply(v, c, False),
       hv, cost)
timeit("Hourglass3D dpack=4 halo", lambda v, c: hgh.apply(v, c, False),
       hv, cost_p)
timeit("Hourglass3D dpack=4 tridiag", lambda v, c: hgt.apply(v, c, False),
       hv, cost_p)
