"""Isolate MXU efficiency of hourglass conv lowerings (bench shape).

Variants (all bf16, f32 accumulate, one fused sync scalar per iter,
~25 ms read floor — compare deltas):
  a. tap conv      (128, 96, 320, 32) -> 32, 3x3   [current: 3 of these/layer]
  b. halo conv     (32, 96, 320, 192) -> 128, 3x3  [dpack=4 halo-dense]
  c. core conv     (32, 96, 320, 128) -> 128, 3x3  [dpack=4 tri-diag core]
  d. pure GEMM     (983040, 1728) @ (1728, 128)    [matmul upper bound]
  e. halo concat   packed (32,96,320,128) -> (...,192)  [bandwidth only]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 8


def timeit(name, fn, *args, flops=None, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    eff = f"  {flops / (dt - 25) / 1e9:7.1f} TFLOP/s(-floor)" if flops else ""
    print(f"{name:44s} {dt:8.1f} ms{eff}", flush=True)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


key = jax.random.PRNGKey(0)
xa = jax.random.uniform(key, (128, 96, 320, 32), jnp.bfloat16, -1, 1)
ka = jax.random.uniform(key, (3, 3, 32, 32), jnp.bfloat16, -1, 1)
fa = 2 * 128 * 96 * 320 * 9 * 32 * 32
timeit("a. tap conv 32->32 (BD=128)", conv, xa, ka, flops=fa)

xb = jax.random.uniform(key, (32, 96, 320, 192), jnp.bfloat16, -1, 1)
kb = jax.random.uniform(key, (3, 3, 192, 128), jnp.bfloat16, -1, 1)
fb = 2 * 32 * 96 * 320 * 9 * 192 * 128
timeit("b. halo conv 192->128 (nb=32)", conv, xb, kb, flops=fb)

xc = jax.random.uniform(key, (32, 96, 320, 128), jnp.bfloat16, -1, 1)
kc = jax.random.uniform(key, (3, 3, 128, 128), jnp.bfloat16, -1, 1)
fc = 2 * 32 * 96 * 320 * 9 * 128 * 128
timeit("c. core conv 128->128 (nb=32)", conv, xc, kc, flops=fc)

A = jax.random.uniform(key, (983040, 1728), jnp.bfloat16, -1, 1)
Bm = jax.random.uniform(key, (1728, 128), jnp.bfloat16, -1, 1)
fd = 2 * 983040 * 1728 * 128
timeit("d. GEMM 983040x1728x128", lambda a, b: a @ b, A, Bm, flops=fd)

# wider-N GEMM: is N=128 itself the limit?
Bm4 = jax.random.uniform(key, (1728, 512), jnp.bfloat16, -1, 1)
fd4 = 2 * 983040 * 1728 * 512
timeit("d4. GEMM 983040x1728x512", lambda a, b: a @ b, A, Bm4, flops=fd4)


def halo(x):
    left = jnp.pad(x[:-1, ..., 96:], ((1, 0), (0, 0), (0, 0), (0, 0)))
    right = jnp.pad(x[1:, ..., :32], ((0, 1), (0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([left, x, right], axis=-1)


timeit("e. halo concat 128->192ch (bw only)", halo, xc)
