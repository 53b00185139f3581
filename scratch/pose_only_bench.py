"""Pose-only (odometry workload) throughput: flow + RANSAC, no depth.

The reference's cfg.RECORD_POSE / save_pose path (`main.py:504-530,
636-703`, SFMnet returns early at `models/SFMnet.py:157-158`). Our
SFMNet mirrors it with cfg.record_pose=True.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

B, H, W = 1, 384, 1280
WARMUP, ITERS = 2, 10

cfg = SfMConfig.kitti(nlabel=128).override(**{
    "pose.num_hypotheses": 512,
    "pose.ransac_iter": 5,
    "pose.num_correspondences": 1024,
    "pose.polish_iters": 5,
    "record_pose": True,
})
model = SFMNet(cfg, dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
ref = jax.random.uniform(key, (B, H, W, 3), jnp.float32, -1, 1)
target = jnp.roll(ref, 3, axis=2)
K = jnp.broadcast_to(
    jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                jnp.float32), (B, 3, 3))

variables = jax.jit(
    lambda r, t, k: model.init(jax.random.PRNGKey(0), r, t, k,
                               key=jax.random.PRNGKey(1))
)(ref, target, K)


def fwd(v, r, t, k, key):
    out = SFMNet(cfg, dtype=jnp.bfloat16).apply(v, r, t, k, key=key)
    return out["pose"]


fj = jax.jit(fwd)
sc = jax.jit(lambda *a: jnp.sum(fj(*a).astype(jnp.float32)))

keys = jax.random.split(jax.random.PRNGKey(2), WARMUP + ITERS)
for i in range(WARMUP):
    float(sc(variables, ref, target, K, keys[i]))
# read-overlap protocol: dispatch all, then read
outs = [sc(variables, ref, target, K, keys[WARMUP + i]) for i in range(ITERS)]
t0 = time.perf_counter()
outs = [sc(variables, ref, target, K, keys[WARMUP + i]) for i in range(ITERS)]
for o in outs:
    float(o)
dt = (time.perf_counter() - t0) / ITERS
print(f"pose-only (DICL + 512x5 RANSAC, f32 solve): {dt*1000:.1f} ms/pair "
      f"= {1/dt:.1f} pairs/s", flush=True)


# --- tunnel-overhead control: 10 pairs inside ONE program (lax.scan) ----
def fwd_scan(v, r, t, k, keys):
    def body(c, kk):
        out = SFMNet(cfg, dtype=jnp.bfloat16).apply(v, r, t, k, key=kk)
        return c + jnp.sum(out["pose"].astype(jnp.float32)), None
    tot, _ = jax.lax.scan(body, 0.0, keys)
    return tot


fs = jax.jit(fwd_scan)
kk = jax.random.split(jax.random.PRNGKey(9), ITERS)
float(fs(variables, ref, target, K, kk))
t0 = time.perf_counter()
float(fs(variables, ref, target, K, kk))
dt = (time.perf_counter() - t0) / ITERS
print(f"pose-only, {ITERS} pairs in ONE program (scan): {dt*1000:.1f} "
      f"ms/pair = {1/dt:.1f} pairs/s", flush=True)


# --- hoisting control: DISTINCT image pairs per scan iteration ----------
# (with identical inputs XLA can hoist the loop-invariant flow net out of
# the scan, faking the per-pair cost)
refs = jax.random.uniform(jax.random.PRNGKey(11), (ITERS, B, H, W, 3),
                          jnp.float32, -1, 1)
tgts = jnp.roll(refs, 3, axis=3)


def fwd_scan2(v, rs, ts, k, keys):
    def body(c, inp):
        r, t, kk = inp
        out = SFMNet(cfg, dtype=jnp.bfloat16).apply(v, r, t, k, key=kk)
        return c + jnp.sum(out["pose"].astype(jnp.float32)), None
    tot, _ = jax.lax.scan(body, 0.0, (rs, ts, keys))
    return tot


fs2 = jax.jit(fwd_scan2)
float(fs2(variables, refs, tgts, K, kk))
t0 = time.perf_counter()
float(fs2(variables, refs, tgts, K, kk))
dt = (time.perf_counter() - t0) / ITERS
print(f"pose-only, {ITERS} DISTINCT pairs in ONE program: {dt*1000:.1f} "
      f"ms/pair = {1/dt:.1f} pairs/s", flush=True)
