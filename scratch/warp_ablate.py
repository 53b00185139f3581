"""Plane-sweep warp gather cost probe at the real shape:
feat (1, 96, 320, 32), D=128 planes -> 3.93M queries x 4 bilinear taps.

Variants: f32 vs bf16 gather source; fused valid-mask; and a row-pair
gather (pad W by 1, fold x-pair into channels so 2 taps come back per
gather row).
"""
import time

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import camera as C

B, H, W, Ch = 1, 96, 320, 32
D = 128


def timeit(name, fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
feat = jax.random.normal(key, (B, H, W, Ch), jnp.float32)
K = jnp.asarray([[[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1]]], jnp.float32)
K_inv = jnp.linalg.inv(K)
pose = jnp.concatenate(
    [jnp.eye(3, dtype=jnp.float32),
     jnp.asarray([[0.6], [0.05], [0.2]], jnp.float32)], axis=1)[None]
depths = 0.5 * 128 / jnp.arange(1, D + 1, dtype=jnp.float32)

coords = C.plane_sweep_coords(depths, pose, K, K_inv, H, W)  # (B,D,H,W,2)
coords = jax.jit(lambda c: c)(coords)


def warp_f32(feat, coords):
    return C.bilinear_sample(feat, coords)


def warp_bf16(feat, coords):
    return C.bilinear_sample(feat.astype(jnp.bfloat16), coords)


def warp_rowpair(feat, coords):
    """Pad W by 1; gather rows of 2*C (x0 and x0+1 together): halves the
    gather row count. Exact same math."""
    B_, H_, W_, C_ = feat.shape
    fp = jnp.pad(feat, ((0, 0), (0, 0), (0, 1), (0, 0)))  # (B,H,W+1,C)
    out_shape = coords.shape[:-1] + (C_,)
    xy = coords.reshape(B_, -1, 2).astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]
    valid = (x >= 0) & (x <= W_ - 1) & (y >= 0) & (y <= H_ - 1)
    x = jnp.clip(x, 0.0, W_ - 1)
    y = jnp.clip(y, 0.0, H_ - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    y1 = jnp.minimum(y0 + 1, H_ - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    # flat over (H, W+1) picking 2C consecutive channels
    # row index r = y*(W+1)+x0 selects [x0, x0+1] as a 2C slice of a
    # (B, H*(W+1), C)->(B, H*(W+1)//? ) ... use stride trick: view the
    # padded image as (B, H*(W+1), C) and gather rows r and r+1 folded:
    # reshape to (B, H*(W+1)*C) then dynamic rows are not contiguous for
    # take_along_axis -> instead gather from (B, N, C) with idx r giving
    # x0 column, and build x1 = shift of the SAME gather by reusing the
    # padded layout: rows r+1 == x0+1 (same y, since x0 <= W-1 < W).
    flat = fp.reshape(B_, H_ * (W_ + 1), C_)
    pair = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=-1)  # (B,N-1,2C)

    def gather2(yy):
        idx = (yy * (W_ + 1) + x0).astype(jnp.int32)
        g = jnp.take_along_axis(pair, idx[..., None], axis=1, mode="clip")
        return g[..., :C_], g[..., C_:]

    v00, v01 = gather2(y0)
    v10, v11 = gather2(y1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = (top * (1 - wy) + bot * wy) * valid[..., None]
    return out.reshape(out_shape).astype(feat.dtype)


# parity
r0 = jax.jit(warp_f32)(feat, coords)
r2 = jax.jit(warp_rowpair)(feat, coords)
print("rowpair parity:", float(jnp.max(jnp.abs(r0 - r2))), flush=True)

timeit("warp f32 (4 taps)", jax.jit(warp_f32), feat, coords)
timeit("warp bf16 (4 taps)", jax.jit(warp_bf16), feat, coords)
timeit("warp rowpair (2 gathers)", jax.jit(warp_rowpair), feat, coords)
timeit("warp rowpair bf16",
       jax.jit(lambda f, c: warp_rowpair(f.astype(jnp.bfloat16), c)),
       feat, coords)
