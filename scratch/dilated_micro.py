"""Dilated-conv lowering micro: direct rhs_dilation vs space-to-batch.

DepthContextNet runs 3x3 convs with dilation 1..16 at FULL resolution
(384x1280, 128ch); measured ~10 ms for ~0.5 TFLOP => ~51 TFLOP/s. If XLA
lowers dilation poorly, space-to-batch (dilated conv == dense conv on an
r x r pixel-phase decomposition) may be faster.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
H, W, C = 384, 1280, 128
R = 8  # dilation rate to test


def timeit(name, fn, *args, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.1f} ms", flush=True)


key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (1, H, W, C), jnp.bfloat16, -1, 1)
k = jax.random.uniform(key, (3, 3, C, C), jnp.bfloat16, -1, 1)


def direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(R, R), (R, R)], rhs_dilation=(R, R),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2b(x, k):
    B, H_, W_, C_ = x.shape
    # (B, H/R, R, W/R, R, C) -> (B*R*R, H/R, W/R, C)
    xr = x.reshape(B, H_ // R, R, W_ // R, R, C_)
    xr = xr.transpose(0, 2, 4, 1, 3, 5).reshape(B * R * R, H_ // R, W_ // R, C_)
    y = jax.lax.conv_general_dilated(
        xr, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(B, R, R, H_ // R, W_ // R, C_).transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(B, H_, W_, C_)


y1 = jax.jit(direct)(x, k)
y2 = jax.jit(s2b)(x, k)
d = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
print(f"s2b-vs-direct max abs diff: {d:.2e}", flush=True)

timeit(f"3x3 dil={R} direct (128ch, 384x1280)", direct, x, k)
timeit(f"3x3 dil={R} space-to-batch", s2b, x, k)

# dense baseline for reference
def dense(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

timeit("3x3 dil=1 dense (same FLOPs)", dense, x, k)
