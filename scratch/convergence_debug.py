import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

import __graft_entry__ as g
from deep_sfm_revisited_tpu.train.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

cfg = g._tiny_cfg(nlabel=8, hyps=8, iters=1, ncorr=64, flow="RAFT")
cfg = cfg.override(use_gt_pose=True, **{"train.lr": 3e-3})

b, h, w = 2, 48, 64
rng = np.random.default_rng(0)
ref = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
depth_gt = (1.2 + 1.8 * rng.random((b, h, w))).astype(np.float32)
pose = np.concatenate(
    [np.eye(3, dtype=np.float32),
     np.asarray([[0.0], [0.0], [0.6]], np.float32)], axis=1)
batch = {
    "ref": jnp.asarray(ref),
    "target": jnp.asarray(np.roll(ref, 2, axis=2)),
    "intrinsics": jnp.broadcast_to(
        jnp.asarray([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                    jnp.float32), (b, 3, 3)),
    "pose_gt": jnp.broadcast_to(jnp.asarray(pose), (b, 3, 4)),
    "depth_gt": jnp.asarray(depth_gt),
}

model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_shape=(b, h, w),
                                  steps_per_epoch=100)
ev = make_eval_step(model, cfg)
m0, _ = ev(state, batch, jax.random.PRNGKey(9))
print("before:", {k: round(float(v), 4) for k, v in m0.items()},
      flush=True)

step = make_train_step(model, cfg)
key = jax.random.PRNGKey(1)
for i in range(60):
    key, ks = jax.random.split(key)
    state, metrics = step(state, batch, ks)
    if i % 10 == 0:
        print(i, "loss", round(float(metrics["loss"]), 4), flush=True)

m1, _ = ev(state, batch, jax.random.PRNGKey(9))
print("after:", {k: round(float(v), 4) for k, v in m1.items()},
      flush=True)
