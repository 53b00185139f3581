"""Accuracy study: f32 vs f64 five-point candidate pipeline in RANSAC.

Synthetic scenes (the N10 harness protocol): random R (up to ~23 deg),
unit t, 3D points, projected matches with Gaussian noise sigma and an
outlier fraction. Compare final (post-polish) rotation/translation errors
with solve_dtype f64 (reference) vs f32. CPU run: true IEEE f32/f64 —
representative of TPU numerics.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.ops.essential import ransac_pose

rng = np.random.default_rng(0)


def scene(n=1024, sigma=0.001, outlier=0.3):
    # random rotation via axis-angle
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    ang = rng.uniform(0.02, 0.4)
    K_ = np.eye(3)
    s, c = np.sin(ang), np.cos(ang)
    sk = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    R = np.eye(3) + s * sk + (1 - c) * sk @ sk
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform([-2, -2, 4], [2, 2, 12], size=(n, 3))
    x1 = X[:, :2] / X[:, 2:]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:]
    x1 += rng.normal(size=x1.shape) * sigma
    x2 += rng.normal(size=x2.shape) * sigma
    m = rng.random(n) < outlier
    x2[m] = rng.uniform(-0.5, 0.5, size=(m.sum(), 2))
    return x1, x2, R, t


def errs(P, R, t):
    Re, te = np.asarray(P[:, :3]), np.asarray(P[:, 3])
    rot = np.degrees(np.arccos(np.clip((np.trace(Re.T @ R) - 1) / 2, -1, 1)))
    tr = np.degrees(np.arccos(np.clip(
        abs(float(te @ t) / (np.linalg.norm(te) + 1e-12)), -1, 1)))
    return rot, tr


def run(solve_dtype, scenes):
    out = []
    for (x1, x2, R, t) in scenes:
        res = ransac_pose(
            jnp.asarray(x1, jnp.float64)[None], jnp.asarray(x2, jnp.float64)[None],
            jax.random.PRNGKey(7), num_hypotheses=512, ransac_iter=5,
            polish_iters=5, solve_dtype=solve_dtype,
        )
        out.append(errs(np.asarray(res["P"][0]), R, t)
                   + (int(res["inliers"][0]),))
    return out


CASES = [
    ("clean sigma=1e-3 out=0.3", dict(sigma=0.001, outlier=0.3)),
    ("noisy sigma=5e-3 out=0.5", dict(sigma=0.005, outlier=0.5)),
    ("hard  sigma=1e-2 out=0.6", dict(sigma=0.01, outlier=0.6)),
]

for name, kw in CASES:
    scenes = [scene(**kw) for _ in range(6)]
    r64 = run(None, scenes)
    r32 = run(jnp.float32, scenes)
    for tag, rr in [("f64", r64), ("f32", r32)]:
        rot = np.array([x[0] for x in rr])
        tr = np.array([x[1] for x in rr])
        inl = np.array([x[2] for x in rr])
        print(f"{name} [{tag}] rot med/max {np.median(rot):.4f}/{rot.max():.4f} "
              f"deg; t med/max {np.median(tr):.4f}/{tr.max():.4f} deg; "
              f"inl med {np.median(inl):.0f}", flush=True)
