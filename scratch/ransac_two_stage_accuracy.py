"""Two-stage scoring accuracy study at the product protocol (on chip).

16 synthetic scenes (noise 1e-4..1e-3 normalized ~ 0.1..1 px at f=1000,
30% outliers), 512x5 hypotheses, N=1024, f32 candidates + mixed polish:
compare final rotation / translation-angle errors of single-stage vs
two-stage (M=128, K=512) scoring. The subset pre-filter only has to keep
the eventual winner inside the top-K for the result to match.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.ops import essential as es
from deep_sfm_revisited_tpu.ops import rotations as rot

B, N = 1, 1024
HYP, RITER = 512, 5
SCENES = 16


def make_pair(k, noise):
    k1, k2, k3 = jax.random.split(k, 3)
    pts = jax.random.normal(k1, (N, 3), jnp.float64) * jnp.asarray(
        [2.0, 1.0, 0.5]) + jnp.asarray([0.0, 0.0, 8.0])
    w = jax.random.normal(k3, (3,), jnp.float64) * 0.03
    R = es.exp_so3(w)
    t = jnp.asarray([0.8, 0.1, 0.6], jnp.float64)
    p2 = pts @ R.T + t
    x1 = pts[..., :2] / pts[..., 2:]
    x2 = p2[..., :2] / p2[..., 2:]
    x1 = x1 + noise * jax.random.normal(k2, x1.shape, jnp.float64)
    # 30% outliers: scramble x2 rows
    n_out = int(0.3 * N)
    x2 = x2.at[:n_out].set(x2[:n_out][::-1] + 0.05)
    return x1, x2, R, t


def errors(out, R, t):
    P = out["P"][0]
    r = float(rot.rotation_angular_error(P[:, :3], R))
    td = P[:, 3] / jnp.linalg.norm(P[:, 3])
    te = float(jnp.arccos(jnp.clip(jnp.dot(td, t), -1, 1)))
    return r, te


kw = dict(num_hypotheses=HYP, ransac_iter=RITER, threshold=1e-4,
          polish=True, solve_dtype=jnp.float32)
f_single = jax.jit(lambda a, b, k: es.ransac_pose(a, b, k, **kw))
f_two = jax.jit(lambda a, b, k: es.ransac_pose(
    a, b, k, score_subset=128, score_topk=512, **kw))

rows = []
for s in range(SCENES):
    noise = [1e-4, 3e-4, 1e-3][s % 3]
    x1, x2, R, t = make_pair(jax.random.PRNGKey(s), noise)
    rk = jax.random.PRNGKey(1000 + s)
    o1 = f_single(x1[None], x2[None], rk)
    o2 = f_two(x1[None], x2[None], rk)
    r1, t1 = errors(o1, R, t)
    r2, t2 = errors(o2, R, t)
    rows.append((noise, r1, t1, int(o1["inliers"][0]), r2, t2,
                 int(o2["inliers"][0])))
    print(f"seed {s:2d} noise {noise:.0e}  single r={np.degrees(r1):7.4f} "
          f"t={np.degrees(t1):7.4f} inl={rows[-1][3]:4d} |  two r="
          f"{np.degrees(r2):7.4f} t={np.degrees(t2):7.4f} "
          f"inl={rows[-1][6]:4d}", flush=True)

a = np.asarray(rows)
print(f"\nmedian rot err deg: single {np.degrees(np.median(a[:, 1])):.5f} "
      f"two {np.degrees(np.median(a[:, 4])):.5f}")
print(f"median trans err deg: single {np.degrees(np.median(a[:, 2])):.5f} "
      f"two {np.degrees(np.median(a[:, 5])):.5f}")
print(f"max rot err deg: single {np.degrees(a[:, 1].max()):.5f} "
      f"two {np.degrees(a[:, 4].max()):.5f}")
