"""Round-5: the pose-glue cost — sample_correspondences at the eval
protocol (B=1, 384x1280 f64 flow, 4096 candidates -> 1024 points).

The round-5 change runs the selection math (grid, conf gather, Gumbel
scores, top_k sort) in f32; before, everything inherited the f64 flow
dtype — including a 4096-wide float-pair top_k sort. Scan protocol, one
fused scalar read.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import flow_ops

B, H, W = 1, 384, 1280
N, OS = 1024, 4
SCAN_N = 8
REPS = 4
F32, F64 = jnp.float32, jnp.float64


def old_sampler(flow, K_inv, key, conf):
    """The pre-round-5 form: selection math in the flow dtype (f64)."""
    b, h, w, _ = flow.shape
    k_grid, k_gumbel = jax.random.split(key)
    n_cand = N * OS
    pts = flow_ops._candidate_grid(b, h, w, 10, n_cand, flow.dtype,
                                   k_grid)
    pts_i = jnp.round(pts).astype(jnp.int32)
    idx = pts_i[..., 1] * w + pts_i[..., 0]
    ent = conf.reshape(b, h * w).astype(flow.dtype)
    e = jnp.take_along_axis(ent, idx, axis=1)
    wgt = jnp.clip(1.0 - e, 0.0, 1.0)
    good = e < 0.7
    num_good = jnp.sum(good, axis=1)
    use_conf = (num_good >= 20)[:, None]
    score = jnp.where(use_conf, jnp.log(wgt + 1e-6), 0.0)
    u = jax.random.uniform(k_gumbel, score.shape, flow.dtype, 1e-12, 1.0)
    score = score - jnp.log(-jnp.log(u))
    _, top = jax.lax.top_k(score, N)
    pts_i = jnp.take_along_axis(pts_i, top[..., None], axis=1)
    idx = jnp.take_along_axis(idx, top, axis=1)
    flat = flow.reshape(b, h * w, 2)
    f = jnp.take_along_axis(flat, idx[..., None], axis=1)
    p1 = pts_i.astype(flow.dtype)
    p2 = p1 + f
    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    n1 = jnp.einsum("bij,bnj->bni", K_inv, h1)
    n2 = jnp.einsum("bij,bnj->bni", K_inv, h2)
    return n1[..., :2], n2[..., :2], num_good


def scan_time(name, fn, args, floor=0.0):
    def prog(a):
        def body(acc, x):
            out = fn(*x)
            return acc + sum(jnp.sum(jnp.abs(o.astype(F32)))
                             for o in jax.tree.leaves(out)), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), F32), a)
        return acc
    jfn = jax.jit(prog)
    float(jfn(args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(jfn(args))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:42s} {(dt - floor)/SCAN_N:8.3f} ms  (prog {dt:7.1f})",
          flush=True)
    return dt


key = jax.random.PRNGKey(0)
flows = jax.random.normal(key, (SCAN_N, B, H, W, 2), F64) * 5.0
confs = jax.random.uniform(jax.random.fold_in(key, 1),
                           (SCAN_N, B, H, W, 1), F32)
import numpy as _np

# no f64 linalg kernels on TPU: invert on host
K_inv = jnp.broadcast_to(jnp.asarray(_np.linalg.inv(_np.asarray(
    [[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])), F64),
    (B, 3, 3))
keys = jax.random.split(jax.random.fold_in(key, 2), SCAN_N)

floor = scan_time("FLOOR", lambda f: (jnp.sum(f),), (flows,))
scan_time("sampler OLD (f64 selection)",
          lambda f, c, k: old_sampler(f, K_inv, k, c),
          (flows, confs, keys), floor)
scan_time("sampler NEW (f32 selection)",
          lambda f, c, k: flow_ops.sample_correspondences(
              f, K_inv, N, margin=10, key=k, conf=c),
          (flows, confs, keys), floor)
