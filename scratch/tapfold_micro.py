"""Re-measure the 3-tap N-fold under the 2026-08-19 toolchain.

PERF.md dead-ends lists "Cout=96 fused tap conv: 119 vs 83 ms" from an
earlier code state (suspected reshape-transpose in that variant). This
version shift-adds channel-block VIEWS (no reshape): conv with
k96 = concat([k0,k1,k2], out-ch) -> (BD, H, W, 96); then
y[d] = G[d+1, 0:32] + G[d, 32:64] + G[d-1, 64:96].
Identical HBM traffic to the 3-conv form, 3x the output lanes (96 vs 32).

Compares one LAYER (12 of these make the hourglass) with BN+relu absent
(isolate the conv+shift-add).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 8
B, D, H, W, C = 1, 128, 96, 320, 32


def timeit(name, fn, *args, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.1f} ms", flush=True)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B * D, H, W, C), jnp.bfloat16, -1, 1)
k3 = jax.random.uniform(key, (3, 3, 3, C, C), jnp.bfloat16, -1, 1)


def layer_3conv(x, k3):
    outs = [conv(x, k3[i]).reshape(B, D, H, W, C) for i in range(3)]
    z = jnp.zeros_like(outs[0][:, :1])
    y = (jnp.concatenate([z, outs[0][:, :-1]], axis=1) + outs[1]
         + jnp.concatenate([outs[2][:, 1:], z], axis=1))
    return y


def layer_fold(x, k3):
    k96 = jnp.concatenate([k3[0], k3[1], k3[2]], axis=-1)  # (3,3,C,3C)
    g = conv(x, k96).reshape(B, D, H, W, 3 * C)
    z = jnp.zeros_like(g[:, :1, ..., :C])
    y = (jnp.concatenate([z, g[:, :-1, ..., :C]], axis=1)
         + g[..., C:2 * C]
         + jnp.concatenate([g[:, 1:, ..., 2 * C:], z], axis=1))
    return y


y1 = jax.jit(layer_3conv)(x, k3)
y2 = jax.jit(layer_fold)(x, k3)
rel = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
print(f"fold-vs-3conv max abs diff: {rel:.2e}", flush=True)

timeit("layer: 3 separate N=32 convs (current)", layer_3conv, x, k3)
timeit("layer: one N=96 conv + view shift-add", layer_fold, x, k3)

# stacked x4 to push compute above the read floor
def stack(f):
    def g(x, k3):
        y = x
        for _ in range(4):
            y = f(y.reshape(B * D, H, W, C), k3).reshape(B * D, H, W, C)
        return y
    return g


timeit("4-layer stack: 3-conv form", stack(layer_3conv), x, k3)
timeit("4-layer stack: N=96 fold", stack(layer_fold), x, k3)
