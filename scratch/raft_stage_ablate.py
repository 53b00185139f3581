"""RAFT stage timing at bench shape (B=1, 384x1280), honest single-sync.

Stages: encoders, correlation pyramid, one GRU step, full 12-iter scan,
convex upsample, full RAFT forward.
"""
import time

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.raft import (
    RAFT, BasicEncoder, UpdateBlock, correlation_pyramid, lookup_correlation,
    convex_upsample,
)

B, H, W = 1, 384, 1280
ITERS = 6
cfg = SfMConfig.kitti(nlabel=128).override(**{"flow.raft_iters_eval": 12}).flow
d = jnp.bfloat16


def timeit(name, fn, *args, warmup=2):
    def scalarized(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in jax.tree.leaves(out) if hasattr(o, 'astype'))
    sc = jax.jit(scalarized)
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)


key = jax.random.PRNGKey(0)
pair = jax.random.uniform(key, (B, H, W, 6), jnp.float32, -1, 1)

fnet = BasicEncoder(256, "instance", d, name="fnet")
fv = jax.jit(lambda x: fnet.init(jax.random.PRNGKey(1), x, False))(pair[:, :128, :256, :3])
both = jnp.concatenate([pair[..., :3], pair[..., 3:]], axis=0).astype(d)
timeit("fnet encoder (2 imgs)", lambda v, x: fnet.apply(v, x, False), fv, both)

fmaps = jax.jit(lambda v, x: fnet.apply(v, x, False))(fv, both)
f1, f2 = fmaps[:B], fmaps[B:]
timeit("correlation pyramid", lambda a, b: correlation_pyramid(a, b, cfg.raft_corr_levels, cfg.raft_corr_radius), f1, f2)

pyr = jax.jit(lambda a, b: correlation_pyramid(a, b, cfg.raft_corr_levels, cfg.raft_corr_radius))(f1, f2)
h, w = H // 8, W // 8
gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
coords = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, h, w, 2)) + 1.5
timeit("lookup_correlation x1", lambda p, c: lookup_correlation(p, c, cfg.raft_corr_radius), pyr, coords)

upd = UpdateBlock(cfg.raft_hidden_dim, d)
net0 = jnp.zeros((B, h, w, cfg.raft_hidden_dim), d)
inp0 = jnp.zeros((B, h, w, cfg.raft_context_dim), d)
corr0 = jax.jit(lambda p, c: lookup_correlation(p, c, cfg.raft_corr_radius))(pyr, coords).astype(d)
uv = jax.jit(lambda n, i, c, f: upd.init(jax.random.PRNGKey(2), n, i, c, f))(net0, inp0, corr0, jnp.zeros((B, h, w, 2), d))
timeit("update block x1", lambda v, n, i, c, f: upd.apply(v, n, i, c, f), uv, net0, inp0, corr0, jnp.zeros((B, h, w, 2), d))

flow_lr = jnp.zeros((B, h, w, 2), jnp.float32)
mask = jnp.zeros((B, h, w, 576), jnp.float32)
timeit("convex upsample x1", convex_upsample, flow_lr, mask)

model = RAFT(cfg, dtype=d)
mv = jax.jit(lambda x: model.init(jax.random.PRNGKey(3), x, False))(pair[:, :128, :256])
timeit("RAFT FULL (12 iters)", lambda v, x: model.apply(v, x, False), mv, pair)
