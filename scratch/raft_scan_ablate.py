"""RAFT composed-scan attribution (PERF.md optimization-queue #4).

Round-1 measured ~2.2 ms/iteration for the composed 12-iter GRU scan vs
~0.9 ms summing standalone component timings (one lookup + one update
block), and the gap was never attributed ("needs an XProf trace"). This
closes it without XProf by ablating INSIDE the scan: each variant runs
the full 24-iteration eval scan (carry-dependent, so nothing hoists)
with one component neutralized, and the deltas attribute the per-iter
cost on the actual composed program:

  full body            = lookup + GRU update (+ flow head)
  frozen-corr body     = zeros corr (removes the 4-level bilinear gather)
  lookup-only body     = corr computed, GRU replaced by a cheap carry
                         update that still consumes corr (keeps coords
                         evolving so the lookup cannot hoist)

Standalone one-shot lookup / update timings are printed alongside — the
round-1 "component sum" — so the composed-vs-components gap is measured
in one place.

Run on the chip: python scratch/raft_scan_ablate.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import flax.linen as nn

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.raft import (
    BasicEncoder,
    UpdateBlock,
    correlation_pyramid,
    lookup_correlation,
)

B, H, W = 1, 384, 1280
ITERS = 24  # the reference's hardcoded eval iterations (raft.py:84-87)
REPS = 6
cfg = SfMConfig.kitti(nlabel=128).flow
d = jnp.bfloat16
key = jax.random.PRNGKey(0)


def timed(name, fn, *args, reps=REPS, warmup=2):
    sc = jax.jit(lambda *a: jnp.sum(jnp.abs(fn(*a).astype(jnp.float32))))
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


zero = jnp.zeros((), jnp.float32)
floor = timed("read floor (empty program)", lambda z: z + 1.0, zero)

pair = jax.random.uniform(key, (B, H, W, 6), jnp.float32, -1, 1)
ref, tgt = pair[..., :3].astype(d), pair[..., 3:].astype(d)
h, w = H // 8, W // 8

fnet = BasicEncoder(256, "instance", d, name="fnet")
fv = jax.jit(lambda x: fnet.init(jax.random.PRNGKey(1), x, False))(
    ref[:, :128, :256])
fmaps = jax.jit(lambda v, x: fnet.apply(v, x, False))(
    fv, jnp.concatenate([ref, tgt], axis=0))
f1, f2 = fmaps[:B], fmaps[B:]
pyr = jax.jit(lambda a, b: correlation_pyramid(
    a, b, cfg.raft_corr_levels, cfg.raft_corr_radius))(f1, f2)
pyr = jax.tree_util.tree_map(lambda x: x, pyr)

hid = cfg.raft_hidden_dim
upd = UpdateBlock(hid, d)
net0 = jnp.zeros((B, h, w, hid), d)
inp0 = jnp.zeros((B, h, w, cfg.raft_context_dim), d)
uv = jax.jit(lambda n, i, c, f: upd.init(jax.random.PRNGKey(2), n, i, c, f,
                                         need_mask=False))(
    net0, inp0, jnp.zeros((B, h, w, 4 * (2 * cfg.raft_corr_radius + 1) ** 2), d),
    jnp.zeros((B, h, w, 2), d))

gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                      jnp.arange(w, dtype=jnp.float32), indexing="ij")
coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, h, w, 2))

ncorr = 4 * (2 * cfg.raft_corr_radius + 1) ** 2

# --- standalone components (the round-1 "component sum") ---------------
coords_x = coords0 + 0.37
timed("standalone: ONE corr lookup",
      lambda p, c: lookup_correlation(p, c, cfg.raft_corr_radius),
      pyr, coords_x)
corr_x = jax.jit(lambda p, c: lookup_correlation(
    p, c, cfg.raft_corr_radius))(pyr, coords_x).astype(d)
timed("standalone: ONE update block",
      lambda v, n, i, c, f: upd.apply(v, n, i, c, f, need_mask=False)[0],
      uv, net0, inp0, corr_x, jnp.zeros((B, h, w, 2), d))


# --- composed scans ----------------------------------------------------
def make_scan(body):
    def run(uv, pyrr, net, coords):
        def step(carry, _):
            return body(uv, pyrr, carry), None

        (net_f, coords_f), _ = jax.lax.scan(
            step, (net, coords), None, length=ITERS)
        return coords_f

    return run


def full_body(uv, pyrr, carry):
    net, coords1 = carry
    corr = lookup_correlation(pyrr, coords1, cfg.raft_corr_radius).astype(d)
    flow = (coords1 - coords0).astype(d)
    net, _, dflow = upd.apply(uv, net, inp0, corr, flow, need_mask=False)
    return (net, coords1 + dflow.astype(jnp.float32))


def frozen_corr_body(uv, pyrr, carry):
    net, coords1 = carry
    corr = jnp.zeros((B, h, w, ncorr), d) + coords1.mean().astype(d) * 0
    flow = (coords1 - coords0).astype(d)
    net, _, dflow = upd.apply(uv, net, inp0, corr, flow, need_mask=False)
    return (net, coords1 + dflow.astype(jnp.float32))


def lookup_only_body(uv, pyrr, carry):
    net, coords1 = carry
    corr = lookup_correlation(pyrr, coords1, cfg.raft_corr_radius)
    # cheap carry update that consumes corr so the lookup can't hoist
    delta = 0.01 * jnp.tanh(corr[..., :2].astype(jnp.float32))
    return (net, coords1 + delta)


t_full = timed("scan-24: full body", make_scan(full_body),
               uv, pyr, net0, coords0)
t_fro = timed("scan-24: frozen corr (no lookup)", make_scan(frozen_corr_body),
              uv, pyr, net0, coords0)
t_lk = timed("scan-24: lookup only (no GRU)", make_scan(lookup_only_body),
             uv, pyr, net0, coords0)

print(f"\nper-iter (floor-subtracted): "
      f"full {(t_full - floor) / ITERS:.2f} ms, "
      f"update-side {(t_fro - floor) / ITERS:.2f} ms, "
      f"lookup-side {(t_lk - floor) / ITERS:.2f} ms", flush=True)
