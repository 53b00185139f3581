"""Time the RANSAC pose path: f64 vs f32 candidate pipeline (flagship
protocol: B=1, H=512x5, N=1024)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops.essential import ransac_pose

ITERS = 8
B, N = 1, 1024

key = jax.random.PRNGKey(0)
x1 = jax.random.uniform(key, (B, N, 2), jnp.float64, -0.5, 0.5)
# quasi-rigid target points (translation + noise) so RANSAC has structure
x2 = x1 + 0.01 + 1e-3 * jax.random.normal(jax.random.PRNGKey(1), (B, N, 2),
                                          jnp.float64)


def run(tag, solve_dtype):
    f = jax.jit(lambda a, b: ransac_pose(
        a, b, jax.random.PRNGKey(7), num_hypotheses=512, ransac_iter=5,
        polish_iters=5, solve_dtype=solve_dtype,
    )["P"])
    sc = jax.jit(lambda a, b: jnp.sum(f(a, b).astype(jnp.float32)))
    for _ in range(2):
        float(sc(x1, x2))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(x1, x2))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"ransac_pose [{tag}]: {dt:.1f} ms (incl ~25 ms read floor)",
          flush=True)


run("f64 solve", None)
run("f32 solve", jnp.float32)
