"""Clean (scan-protocol) hourglass comparison: unpacked vs D-packed tridiag.

The 2026-08-19 per-call ablate read 77.9 vs 76.7 ms with a ~25 ms
read floor per iteration — a delta inside the noise. This version runs
each mode over 4 DISTINCT cost volumes inside one program (no hoisting)
and reads one scalar: per-iteration noise ~6 ms -> ~1 ms.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.psnet import Hourglass3D
from deep_sfm_revisited_tpu.models.submodules import dpack

B, D, h4, w4 = 1, 128, 96, 320
NVOL = 4
REPS = 6

key = jax.random.PRNGKey(0)
costs = jax.random.uniform(key, (NVOL, B, D, h4, w4, 64), jnp.bfloat16, -1, 1)
costs_p = jax.jit(jax.vmap(lambda c: dpack(c, 4)))(costs)

hg1 = Hourglass3D(dtype=jnp.bfloat16, dpack=1)
hgt = Hourglass3D(dtype=jnp.bfloat16, dpack=4, dpack_mode="tridiag")
hv = jax.jit(lambda c: hg1.init(jax.random.PRNGKey(2), c[:, :8, :32, :64],
                                False))(costs[0])


def bench(name, hg, cs):
    def run(v, cs):
        def body(acc, c):
            y = hg.apply(v, c, False)
            return acc + jnp.sum(jnp.abs(y.astype(jnp.float32))), None
        tot, _ = jax.lax.scan(body, 0.0, cs)
        return tot

    f = jax.jit(run)
    for _ in range(2):
        float(f(hv, cs))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(f(hv, cs))
    dt = (time.perf_counter() - t0) / (REPS * NVOL) * 1000
    print(f"{name:36s} {dt:7.1f} ms/volume (scan of {NVOL})", flush=True)


bench("Hourglass3D unpacked", hg1, costs)
bench("Hourglass3D dpack=4 tridiag", hgt, costs_p)
