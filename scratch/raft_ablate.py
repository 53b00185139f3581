"""Ablation timings for the RAFT pipeline on the real TPU.

Isolates: encoders+pyramid | correlation lookup (dynamic_slice vs
take_along_axis) | GRU/conv stack | full model. Sync via device->host
scalar reads (block_until_ready unreliable on this platform).
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models import raft as R

B, H, W = 1, 384, 1280
h, w = H // 8, W // 8
C = 256
RADIUS = 4
LEVELS = 4
ITERS = 12

key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, warmup=2, iters=6):
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
    print(f"{name:34s} {dt:9.1f} ms", flush=True)
    return dt


# ---- inputs
f1 = jax.random.normal(key, (B, h, w, C), jnp.float32)
f2 = jax.random.normal(jax.random.PRNGKey(1), (B, h, w, C), jnp.float32)
_gx, _gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32))
coords = jnp.broadcast_to(jnp.stack([_gx, _gy], axis=-1)[None], (B, h, w, 2))
pair = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 6), jnp.float32, -1, 1)

pyr_fn = jax.jit(lambda a, b: R.correlation_pyramid(a, b, LEVELS, RADIUS)[0])
pyramid = pyr_fn(f1, f2)
pad = 2 * RADIUS + 3

timeit("pyramid (allpairs+pad+pool)", pyr_fn, f1, f2)


# ---- lookup variants, 12 dependent iterations each
def loop_lookup(lookup):
    def run(pyr, c):
        def body(i, c):
            win = lookup((pyr, pad), c, RADIUS)
            return c + win[..., :2].astype(jnp.float32) * 1e-3
        return jax.lax.fori_loop(0, ITERS, body, c)
    return jax.jit(run)


def lookup_taa(pyr, coords, radius):
    pyramid, pad = pyr
    B_, H_, W_, _ = coords.shape
    r = radius
    S = 2 * r + 2
    Q = B_ * H_ * W_
    flat = coords.reshape(Q, 2)
    out = []
    offs = jnp.arange(S)
    for i, img in enumerate(pyramid):
        Hl, Wl = img.shape[1] - 2 * pad, img.shape[2] - 2 * pad
        c = flat / (2.0 ** i)
        cx = jnp.clip(c[:, 0], -(r + 2.0), Wl + r + 1.0)
        cy = jnp.clip(c[:, 1], -(r + 2.0), Hl + r + 1.0)
        x0 = jnp.floor(cx - r)
        y0 = jnp.floor(cy - r)
        fx = (cx - r) - x0
        fy = (cy - r) - y0
        xi = (x0 + pad).astype(jnp.int32)
        yi = (y0 + pad).astype(jnp.int32)
        rows = jnp.take_along_axis(
            img, (yi[:, None] + offs[None])[:, :, None], axis=1)  # (Q,S,Wp)
        patch = jnp.take_along_axis(
            rows, (xi[:, None] + offs[None])[:, None, :], axis=2
        ).astype(jnp.float32)  # (Q,S,S)
        fx_ = fx[:, None, None]
        fy_ = fy[:, None, None]
        win = ((1 - fy_) * (1 - fx_) * patch[:, :S - 1, :S - 1]
               + (1 - fy_) * fx_ * patch[:, :S - 1, 1:]
               + fy_ * (1 - fx_) * patch[:, 1:, :S - 1]
               + fy_ * fx_ * patch[:, 1:, 1:])
        out.append(win.reshape(B_, H_, W_, -1))
    return jnp.concatenate(out, axis=-1)


def lookup_onehot(pyr, coords, radius):
    """Gather-free: one-hot row/col matmuls (MXU) instead of gathers."""
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
        yi = (y0 + pad).astype(jnp.int32)[:, None] + offs[None]  # (Q,S)
        xi = (x0 + pad).astype(jnp.int32)[:, None] + offs[None]
        oh_y = jax.nn.one_hot(yi, Hp, dtype=jnp.bfloat16)  # (Q,S,Hp)
        oh_x = jax.nn.one_hot(xi, Wp, dtype=jnp.bfloat16)  # (Q,S,Wp)
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


timeit("lookup x12 (dynamic_slice)", loop_lookup(R.lookup_correlation),
       pyramid, coords)
timeit("lookup x12 (take_along_axis)", loop_lookup(lookup_taa),
       pyramid, coords)
timeit("lookup x12 (one-hot matmul)", loop_lookup(lookup_onehot),
       pyramid, coords)

# ---- conv stack only (corr input derived from carry, no lookup)
cfg = SfMConfig.kitti(nlabel=128).flow
update = R.UpdateBlock(cfg.raft_hidden_dim, jnp.bfloat16)
net0 = jnp.zeros((B, h, w, 128), jnp.bfloat16)
inp0 = jnp.zeros((B, h, w, 128), jnp.bfloat16)
ncorr = LEVELS * (2 * RADIUS + 1) ** 2
uvars = update.init(jax.random.PRNGKey(3), net0, inp0,
                    jnp.zeros((B, h, w, ncorr), jnp.bfloat16),
                    jnp.zeros((B, h, w, 2), jnp.bfloat16))


def convs_only(variables, net):
    def body(i, carry):
        net, c1 = carry
        corr = jnp.broadcast_to(net[..., :1], net.shape[:3] + (ncorr,))
        net, mask, dflow = update.apply(variables, net, inp0, corr,
                                        (c1 - coords).astype(jnp.bfloat16))
        return (net, c1 + dflow.astype(jnp.float32))
    return jax.lax.fori_loop(0, ITERS, body, (net, coords))


timeit("update-block convs x12", jax.jit(convs_only), uvars, net0)

# ---- encoders
enc = R.BasicEncoder(256, "instance", jnp.bfloat16, name="fnet")
evars = jax.jit(enc.init)(jax.random.PRNGKey(4), pair[..., :3])
timeit("fnet encoder (1 image)", jax.jit(lambda v, x: enc.apply(v, x)),
       evars, pair[..., :3])

# ---- full model
model_cfg = SfMConfig.kitti(nlabel=128).override(**{"flow.raft_iters_eval": ITERS})
model = R.RAFT(model_cfg.flow, jnp.bfloat16)
rvars = jax.jit(model.init)(jax.random.PRNGKey(5), pair[:, :128, :384])
timeit("full RAFT-12 fwd", jax.jit(lambda v, p: model.apply(v, p)[0]),
       rvars, pair, warmup=2, iters=4)
