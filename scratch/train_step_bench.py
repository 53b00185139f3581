"""Training-step throughput at the reference TRAIN_SIZE [256,768].

b=2, nlabel=64, DICL frozen (fix_flownet), RANSAC pose online, depth
loss. (The b=4 / nlabel=128 recipe variant exceeded the remote compile
helper's limits — see PERF.md.)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import __graft_entry__ as g
from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.train.trainer import create_train_state, make_train_step

import sys
B, H, W = int(sys.argv[1]) if len(sys.argv) > 1 else 1, 256, 768
cfg = SfMConfig.kitti(nlabel=128).override(**{
    "train.fix_flownet": True,
    "pose.num_hypotheses": 512,
    "pose.ransac_iter": 5,
    "pose.num_correspondences": 1024,
    "pose.polish_iters": 5,
    "depth.remat": "--no-remat" not in sys.argv,
})
model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_shape=(B, H, W), steps_per_epoch=100)
step = make_train_step(model, cfg)
batch = g._batch(B, H, W)

s2, m = step(state, batch, jax.random.PRNGKey(1))
float(m["loss"])
s3, m = step(s2, batch, jax.random.PRNGKey(2))
float(m["loss"])
t0 = time.perf_counter()
N = 4
s = s3
for i in range(N):
    s, m = step(s, batch, jax.random.PRNGKey(3 + i))
    float(m["loss"])
dt = (time.perf_counter() - t0) / N
print("train step b=%d %dx%d nlabel=128 remat=%s: %.0f ms  (%.2f pairs/s/chip)"
      % (B, H, W, cfg.depth.remat, dt * 1000, B / dt))


# scan-protocol variant: chain N steps inside ONE program (state is the
# scan carry), one scalar read — removes the per-step dispatch/read
# channel cost from the measurement (PERF.md "Tunnel dispatch overhead")
def steps_scanned(state, batch, keys):
    def body(st, kk):
        st2, mm = step(st, batch, kk)
        return st2, mm["loss"]
    st, losses = jax.lax.scan(body, state, keys)
    return jnp.sum(losses)


scanned = jax.jit(steps_scanned)
keys = jax.random.split(jax.random.PRNGKey(7), N)
float(scanned(s, batch, keys))
t0 = time.perf_counter()
float(scanned(s, batch, keys))
dt = (time.perf_counter() - t0) / N
print("train step (scan of %d) b=%d nlabel=128 remat=%s: %.0f ms  "
      "(%.2f pairs/s/chip)" % (N, B, cfg.depth.remat, dt * 1000, B / dt))
