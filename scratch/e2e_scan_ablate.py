"""Clean (scan-protocol) end-to-end stage attribution at the bench config.

Times DICL-only, RAFT-24-only, and the full pipeline, each over DISTINCT
pairs inside one program. Combined with pose-only (30.8 ms,
pose_only_bench.py): stage deltas without per-call channel artifacts.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.dicl import DICLFlow
from deep_sfm_revisited_tpu.models.raft import RAFT
from deep_sfm_revisited_tpu.models.sfmnet import SFMNet
from deep_sfm_revisited_tpu.utils.profiling import throughput

B, H, W = 1, 384, 1280
N = 8

key = jax.random.PRNGKey(0)
refs = jax.random.uniform(key, (N, B, H, W, 3), jnp.float32, -1, 1)
tgts = jnp.roll(refs, 3, axis=3)
pairs = jnp.concatenate([refs, tgts], axis=-1)
K = jnp.broadcast_to(
    jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                jnp.float32), (B, 3, 3))

kitti = SfMConfig.kitti(nlabel=128).override(**{
    "pose.num_hypotheses": 512, "pose.ransac_iter": 5,
    "pose.num_correspondences": 1024, "pose.polish_iters": 5,
})

# DICL-only
dicl = DICLFlow(kitti.flow, dtype=jnp.bfloat16)
dv = jax.jit(lambda p: dicl.init(jax.random.PRNGKey(1), p, False))(
    pairs[0][:, :128, :256])
dt = throughput(lambda p: dicl.apply(dv, p, False)[0], pairs, reps=4)
print(f"DICL-only: {dt*1000:.1f} ms/pair", flush=True)

# RAFT-24-only
raft = RAFT(kitti.flow, dtype=jnp.bfloat16)
rv = jax.jit(lambda p: raft.init(jax.random.PRNGKey(1), p))(
    pairs[0][:, :128, :256])
dt = throughput(lambda p: raft.apply(rv, p)[0], pairs, reps=4)
print(f"RAFT-24-only: {dt*1000:.1f} ms/pair", flush=True)

# full pipeline
model = SFMNet(kitti, dtype=jnp.bfloat16)
mv = jax.jit(lambda r, t, k: model.init(jax.random.PRNGKey(1), r, t, k,
                                        key=jax.random.PRNGKey(2)))(
    refs[0][:, :128, :384], tgts[0][:, :128, :384], K)
keys = jax.random.split(jax.random.PRNGKey(3), N)
dt = throughput(
    lambda inp: model.apply(mv, inp[0], inp[1], K, key=inp[2])["depth"],
    (refs, tgts, keys), reps=2,
)
print(f"full pipeline: {dt*1000:.1f} ms/pair", flush=True)
