"""Two-stage Sampson scoring on-chip A/B (scan protocol, distinct inputs).

Times the FULL ransac_pose at the product protocol (B=1, 512x5, N=1024,
f32 candidates, mixed polish) with single-stage scoring vs the round-5
two-stage pre-filter (score_subset strided points, rescore score_topk
survivors) — the batched analogue of kernel_functions.cu:187-214.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import essential as es

B, N = 1, 1024
HYP, RITER = 512, 5
SCAN_N = 16
REPS = 4
F32 = jnp.float32


def scan_time(name, fn, stacked_args, floor=0.0, warmup=1):
    def prog(args):
        def body(acc, a):
            out = fn(*a)
            return acc + sum(
                jnp.sum(jnp.abs(o.astype(F32))) for o in jax.tree.leaves(out)
            ), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), F32), args)
        return acc

    jfn = jax.jit(prog)
    for _ in range(warmup):
        float(jfn(stacked_args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(jfn(stacked_args))
    dt = (time.perf_counter() - t0) / REPS * 1000
    per = (dt - floor) / SCAN_N
    print(f"{name:52s} {per:8.3f} ms   (prog {dt:7.1f})", flush=True)
    return dt


key = jax.random.PRNGKey(0)


def make_pair(k):
    k1, k2 = jax.random.split(k)
    pts = jax.random.normal(k1, (B, N, 3), jnp.float64) * jnp.asarray(
        [2.0, 1.0, 0.5]) + jnp.asarray([0.0, 0.0, 8.0])
    R = es.exp_so3(jnp.asarray([0.02, -0.03, 0.01], jnp.float64))
    t = jnp.asarray([0.8, 0.1, 0.6], jnp.float64)
    p2 = pts @ R.T + t
    x1 = pts[..., :2] / pts[..., 2:]
    x2 = p2[..., :2] / p2[..., 2:]
    return x1 + 1e-4 * jax.random.normal(k2, x1.shape, jnp.float64), x2


keys = jax.random.split(key, SCAN_N)
X1, X2 = jax.vmap(make_pair)(keys)
RKEYS = jax.random.split(jax.random.PRNGKey(9), SCAN_N)

print(f"protocol: B={B} H={HYP}x{RITER} N={N} scan={SCAN_N} reps={REPS}")
floor = scan_time("FLOOR (identity body)", lambda a, b, k: (a,),
                  (X1, X2, RKEYS))

kw = dict(num_hypotheses=HYP, ransac_iter=RITER, polish=True,
          solve_dtype=F32)
scan_time("ransac_pose single-stage (current)",
          lambda a, b, k: es.ransac_pose(a, b, k, **kw),
          (X1, X2, RKEYS), floor)
for M, K in [(128, 512), (128, 256), (64, 512), (256, 512)]:
    scan_time(f"ransac_pose two-stage M={M} K={K}",
              lambda a, b, k, M=M, K=K: es.ransac_pose(
                  a, b, k, score_subset=M, score_topk=K, **kw),
              (X1, X2, RKEYS), floor)
