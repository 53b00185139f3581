"""Probe: phase-decomposed fused softargmax regression vs the shipped
upsample->softmax->soft-argmax path (models/psnet.py regress()).

The bilinear half-pixel x4 upsample has s*s=16 phase-periodic 2x2-tap
weights, and softmax/soft-argmax act per OUTPUT pixel, so the regression
can run per phase at COARSE resolution and interleave — never writing
the (B, D, H, W) f32 volume (251 MB at recipe shape). Same math, less
HBM traffic. This times both on the chip (scan over distinct volumes +
one read) and checks numerical equality.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B, D, h4, w4 = 1, 128, 96, 320
H, W = 384, 1280
MIN_DEPTH = 0.5
ITERS = 16


def regress_current(vol):
    from deep_sfm_revisited_tpu.models.submodules import (
        resize_bilinear,
        soft_argmax_disparity,
    )

    v = vol.astype(jnp.float32).reshape(B * D, h4, w4, 1)
    v = resize_bilinear(v, (H, W), align_corners=False)
    v = v.reshape(B, D, H, W)
    prob = jax.nn.softmax(v, axis=1)
    disp = soft_argmax_disparity(prob, D)
    return MIN_DEPTH * D / (disp + 1e-16)


def regress_fused(vol):
    v = vol.astype(jnp.float32)  # (B, D, h4, w4)
    sy, sx = H // h4, W // w4

    def shift(dy, dx):
        a = v
        if dy == -1:
            a = jnp.concatenate([a[:, :, :1], a[:, :, :-1]], axis=2)
        elif dy == 1:
            a = jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)
        if dx == -1:
            a = jnp.concatenate([a[:, :, :, :1], a[:, :, :, :-1]], axis=3)
        elif dx == 1:
            a = jnp.concatenate([a[:, :, :, 1:], a[:, :, :, -1:]], axis=3)
        return a

    idx = jnp.arange(1, D + 1, dtype=jnp.float32)[None, :, None, None]
    phases = []
    for a in range(sy):
        offy = (a + 0.5) / sy - 0.5
        ya = -1 if offy < 0 else 0
        fy = offy - ya
        for b in range(sx):
            offx = (b + 0.5) / sx - 0.5
            xb = -1 if offx < 0 else 0
            fx = offx - xb
            pv = ((1 - fy) * (1 - fx) * shift(ya, xb)
                  + (1 - fy) * fx * shift(ya, xb + 1)
                  + fy * (1 - fx) * shift(ya + 1, xb)
                  + fy * fx * shift(ya + 1, xb + 1))
            m = jnp.max(pv, axis=1, keepdims=True)
            e = jnp.exp(pv - m)
            se = jnp.sum(e, axis=1)
            sd = jnp.sum(e * idx, axis=1)
            phases.append(sd / se)  # (B, h4, w4) expected disparity
    grid = jnp.stack(phases, axis=-1).reshape(B, h4, w4, sy, sx)
    disp = grid.transpose(0, 1, 3, 2, 4).reshape(B, H, W)
    return MIN_DEPTH * D / (disp + 1e-16)


def timed(fn, vols, label):
    @jax.jit
    def run(vols):
        def body(c, vv):
            return c + jnp.sum(fn(vv)), None

        tot, _ = jax.lax.scan(body, 0.0, vols)
        return tot

    float(run(vols))  # compile+warm
    float(run(vols))
    t0 = time.perf_counter()
    float(run(vols))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{label}: {dt:.2f} ms/call", flush=True)
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    vols = jnp.asarray(rng.standard_normal((ITERS, B, D, h4, w4)),
                       jnp.float32)
    a = np.asarray(jax.jit(regress_current)(vols[0]))
    b = np.asarray(jax.jit(regress_fused)(vols[0]))
    err = np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-6))
    print(f"max rel diff fused vs current: {err:.2e}", flush=True)
    t_cur = timed(regress_current, vols, "current regress")
    t_fus = timed(regress_fused, vols, "fused   regress")
    print(f"saving per regress call: {t_cur - t_fus:.2f} ms "
          f"(x2 calls per forward)", flush=True)
