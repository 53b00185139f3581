"""Bisect the full-RAFT gap: fixed cost vs per-iteration cost, lookup impl,
and encoder norm cost."""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models import raft as R

B, H, W = 1, 384, 1280


def timeit(name, fn, *args, warmup=2, iters=4):
    for _ in range(warmup):
        out = fn(*args)
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), out, 0.0)
        float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), out, 0.0)
        float(s)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt


def lookup_onehot(pyr, coords, radius):
    pyramid, pad = pyr
    B_, H_, W_, _ = coords.shape
    r = radius
    S = 2 * r + 2
    Q = B_ * H_ * W_
    flat = coords.reshape(Q, 2)
    out = []
    offs = jnp.arange(S)
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
        yi = (y0 + pad).astype(jnp.int32)[:, None] + offs[None]
        xi = (x0 + pad).astype(jnp.int32)[:, None] + offs[None]
        oh_y = jax.nn.one_hot(yi, Hp, dtype=jnp.bfloat16)
        oh_x = jax.nn.one_hot(xi, Wp, dtype=jnp.bfloat16)
        rows = jnp.einsum("qsh,qhw->qsw", oh_y, img)
        patch = jnp.einsum("qtw,qsw->qst", oh_x, rows).astype(jnp.float32)
        fx_ = fx[:, None, None]
        fy_ = fy[:, None, None]
        win = ((1 - fy_) * (1 - fx_) * patch[:, :S - 1, :S - 1]
               + (1 - fy_) * fx_ * patch[:, :S - 1, 1:]
               + fy_ * (1 - fx_) * patch[:, 1:, :S - 1]
               + fy_ * fx_ * patch[:, 1:, 1:])
        out.append(win.reshape(B_, H_, W_, -1))
    return jnp.concatenate(out, axis=-1)


pair = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 6), jnp.float32, -1, 1)


def build(iters):
    cfg = SfMConfig.kitti(nlabel=128).override(**{"flow.raft_iters_eval": iters})
    model = R.RAFT(cfg.flow, jnp.bfloat16)
    rvars = jax.jit(model.init)(jax.random.PRNGKey(5), pair[:, :128, :384])
    return model, rvars


orig_lookup = R.lookup_correlation

model12, rvars = build(12)
model1, _ = build(1)

timeit("full RAFT iters=1 (dyn_slice)",
       jax.jit(lambda v, p: model1.apply(v, p)[0]), rvars, pair)
timeit("full RAFT iters=12 (dyn_slice)",
       jax.jit(lambda v, p: model12.apply(v, p)[0]), rvars, pair)

R.lookup_correlation = lookup_onehot
timeit("full RAFT iters=1 (one-hot)",
       jax.jit(lambda v, p: model1.apply(v, p)[0]), rvars, pair)
timeit("full RAFT iters=12 (one-hot)",
       jax.jit(lambda v, p: model12.apply(v, p)[0]), rvars, pair)
R.lookup_correlation = orig_lookup

# encoder norm cost
enc_in = R.BasicEncoder(256, "instance", jnp.bfloat16)
enc_no = R.BasicEncoder(256, "none", jnp.bfloat16)
ev_in = jax.jit(enc_in.init)(jax.random.PRNGKey(4), pair[..., :3])
ev_no = jax.jit(enc_no.init)(jax.random.PRNGKey(4), pair[..., :3])
timeit("encoder instance-norm", jax.jit(lambda v, x: enc_in.apply(v, x)),
       ev_in, pair[..., :3])
timeit("encoder no-norm", jax.jit(lambda v, x: enc_no.apply(v, x)),
       ev_no, pair[..., :3])

# convex upsample cost
flow_lr = jnp.zeros((B, H // 8, W // 8, 2), jnp.float32)
mask = jnp.zeros((B, H // 8, W // 8, 576), jnp.float32)
timeit("convex upsample", jax.jit(R.convex_upsample), flow_lr, mask)
