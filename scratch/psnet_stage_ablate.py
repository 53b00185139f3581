"""PSNet stage timing at the bench shape (B=1, 384x1280, nlabel=128).

Single fused sync scalar per iteration (one device->host read ~25 ms on
axon — subtract it mentally). Stages: SPP features, plane-sweep warp,
hourglass, ContextNet, regress upsample+softargmax, full PSNet.
"""
import time

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet, Hourglass3D, ContextNet
from deep_sfm_revisited_tpu.models.submodules import SPPFeatureExtractor, resize_bilinear
from deep_sfm_revisited_tpu.ops.camera import plane_sweep_warp

B, H, W, D = 1, 384, 1280, 128
h4, w4 = H // 4, W // 4
ITERS = 6


def timeit(name, fn, *args, warmup=2):
    def scalarized(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in jax.tree.leaves(out))
    sc = jax.jit(scalarized)
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)


key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (B, H, W, 3), jnp.float32, -1, 1)
K4 = jnp.asarray([[[718.856 / 4, 0, 607.19 / 4], [0, 718.856 / 4, 185.2 / 4], [0, 0, 1]]], jnp.float32)
K4_inv = jnp.linalg.inv(K4)
pose = jnp.concatenate([jnp.eye(3)[None], jnp.asarray([[[0.54], [0.0], [0.1]]])], -1).astype(jnp.float32)

feat = SPPFeatureExtractor(dtype=jnp.bfloat16)
fv = jax.jit(lambda i: feat.init(jax.random.PRNGKey(1), i, False))(img[:, :128, :384])
tgt_feat = jax.jit(lambda v, i: feat.apply(v, i, False))(fv, img)
timeit("SPP features (1 img)", lambda v, i: feat.apply(v, i, False), fv, img)

depths = 0.5 * 128 / jnp.arange(1, D + 1, dtype=jnp.float32)
warped = jax.jit(lambda f: plane_sweep_warp(f, depths, pose[:, ], K4, K4_inv))(tgt_feat)
timeit("plane_sweep_warp D=128", lambda f: plane_sweep_warp(f, depths, pose, K4, K4_inv), tgt_feat)

cost = jnp.concatenate([jnp.broadcast_to(tgt_feat[:, None], warped.shape), warped], -1)
hg = Hourglass3D(dtype=jnp.bfloat16)
hv = jax.jit(lambda c: hg.init(jax.random.PRNGKey(2), c[:, :8, :32, :64], False))(cost)
timeit("Hourglass3D", lambda v, c: hg.apply(v, c, False), hv, cost)

costs = jax.jit(lambda v, c: hg.apply(v, c, False))(hv, cost)
ctx = ContextNet(1, False, dtype=jnp.bfloat16)
ctx_in = jnp.concatenate([jnp.broadcast_to(tgt_feat[:, None], warped.shape), jnp.broadcast_to(costs, warped.shape[:-1] + (1,))], -1)
cv = jax.jit(lambda c: ctx.init(jax.random.PRNGKey(3), c[:, :8, :32, :64], False))(ctx_in)
timeit("ContextNet (full D)", lambda v, c: ctx.apply(v, c, False), cv, ctx_in)


def regress(vol):
    v = vol[..., 0].astype(jnp.float32).reshape(B * D, h4, w4, 1)
    v = resize_bilinear(v, (H, W)).reshape(B, D, H, W)
    prob = jax.nn.softmax(v, axis=1)
    disp = jnp.sum(prob * jnp.arange(1, D + 1, dtype=jnp.float32)[None, :, None, None], 1)
    return 0.5 * D / (disp + 1e-16)


timeit("regress upsample+softargmax", regress, costs)

cfg = SfMConfig.kitti(nlabel=128)
net = PSNet(cfg.depth, norm_target=0.6, dtype=jnp.bfloat16)
pv = jax.jit(lambda r, t: net.init(jax.random.PRNGKey(4), r, t[:, None], pose, K4 * jnp.asarray([4.0, 4.0, 1.0])[:, None], jnp.linalg.inv(K4 * jnp.asarray([4.0, 4.0, 1.0])[:, None]), False))(img[:, :128, :384], img[:, :128, :384])
Kfull = K4 * jnp.asarray([4.0, 4.0, 1.0])[:, None]
timeit("PSNet FULL fwd (both outputs)", lambda v, r, t: net.apply(v, r, t[:, None], pose, Kfull, jnp.linalg.inv(Kfull), False), pv, img, img)
timeit("PSNet FULL fwd (depth only)", lambda v, r, t: net.apply(v, r, t[:, None], pose, Kfull, jnp.linalg.inv(Kfull), False)[1], pv, img, img)
