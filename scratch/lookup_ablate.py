"""Correlation-lookup formulation A/B at bench shape (48x160 @ 1/8).

a) current: one-hot row/col selection matmuls
b) row-gather: take_along_axis rows, then col one-hot matmul
c) row-gather both: rows, then gather S columns from each (Q,S,Wp) row set
   via a second take_along_axis on a transposed view
"""
import time

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.raft import correlation_pyramid, lookup_correlation

B, H, W = 1, 48, 160
R = 4
ITERS = 8

key = jax.random.PRNGKey(0)
f1 = jax.random.normal(key, (B, H, W, 256), jnp.bfloat16)
f2 = jnp.roll(f1, 3, axis=2)
pyr = jax.jit(lambda a, b: correlation_pyramid(a, b, 4, R))(f1, f2)
coords = jnp.broadcast_to(
    jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                           jnp.arange(H, dtype=jnp.float32))[0:2], -1)[None],
    (B, H, W, 2)) + 1.37


def timeit(name, fn, *args, warmup=2):
    def scal(*a):
        return jnp.sum(jnp.abs(fn(*a).astype(jnp.float32)))
    sc = jax.jit(scal)
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    print(f"{name:34s} {(time.perf_counter()-t0)/ITERS*1000:8.1f} ms", flush=True)


def lookup_rowgather(pyramid, coords, radius):
    pyramid, pad = pyramid
    B, H, W, _ = coords.shape
    r = radius
    S = 2 * r + 2
    Q = B * H * W
    flat = coords.reshape(Q, 2)
    offs = jnp.arange(S)
    out = []
    for i, img in enumerate(pyramid):
        Hp, Wp = img.shape[1], img.shape[2]
        Hl, Wl = Hp - 2 * pad, Wp - 2 * pad
        c = flat / (2.0 ** i)
        cx = jnp.clip(c[:, 0], -(r + 2.0), Wl + r + 1.0)
        cy = jnp.clip(c[:, 1], -(r + 2.0), Hl + r + 1.0)
        x0 = jnp.floor(cx - r)
        y0 = jnp.floor(cy - r)
        fx = (cx - r) - x0
        fy = (cy - r) - y0
        yi = (y0 + pad).astype(jnp.int32)[:, None] + offs[None]  # (Q, S)
        xi = (x0 + pad).astype(jnp.int32)[:, None] + offs[None]
        rows = jnp.take_along_axis(img, yi[..., None], axis=1)  # (Q,S,Wp)
        oh_x = jax.nn.one_hot(xi, Wp, dtype=img.dtype)  # (Q,S,Wp)
        patch = jnp.einsum("qtw,qsw->qst", oh_x, rows).astype(jnp.float32)
        fx_ = fx[:, None, None]
        fy_ = fy[:, None, None]
        win = ((1 - fy_) * (1 - fx_) * patch[:, :S - 1, :S - 1]
               + (1 - fy_) * fx_ * patch[:, :S - 1, 1:]
               + fy_ * (1 - fx_) * patch[:, 1:, :S - 1]
               + fy_ * fx_ * patch[:, 1:, 1:])
        out.append(win.reshape(B, H, W, -1))
    return jnp.concatenate(out, axis=-1)


levels, pad = pyr

def cur(c, *lv):
    return lookup_correlation((list(lv), pad), c, R)

def rg(c, *lv):
    return lookup_rowgather((list(lv), pad), c, R)

a = jax.jit(cur)(coords, *levels)
b = jax.jit(rg)(coords, *levels)
print("parity b vs a:", float(jnp.max(jnp.abs(a - b))), flush=True)

timeit("one-hot both (current)", cur, coords, *levels)
timeit("row-gather + col one-hot", rg, coords, *levels)
