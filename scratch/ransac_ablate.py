"""RANSAC sub-stage timing at the bench configuration (B=1, H=512, N=1024).

Times, on the real TPU: sampling+nullspace, constraint assembly, 10x20
Gauss-Jordan, degree-10 root finding, back-substitution (full solver),
f32 Sampson scoring, cheirality decompose, IRLS polish, and the whole
ransac_pose. Sync by device->host scalar read.
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import essential as es
from deep_sfm_revisited_tpu.ops.linalg64 import gauss_solve, nullspace
from deep_sfm_revisited_tpu.ops.polyroots import real_roots

B, H, N = 1, 2560, 1024
ITERS = 6


def timeit(name, fn, *args, warmup=2):
    fn_j = jax.jit(fn)

    # ONE device->host scalar read per iteration: every read costs ~25 ms
    # on the remote platform, so the sync scalar is fused into the jit.
    def scalarized(*a):
        out = fn_j(*a)
        return out, sum(
            jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in jax.tree.leaves(out)
        )

    sc_j = jax.jit(scalarized)
    for _ in range(warmup):
        out, s = sc_j(*args)
        float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, s = sc_j(*args)
        float(s)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:36s} {dt:9.1f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
# realistic correspondences: synthetic two-view scene
k1, k2, k3 = jax.random.split(key, 3)
pts = jax.random.normal(k1, (B, N, 3), jnp.float64) * jnp.asarray([2.0, 1.0, 0.5]) + jnp.asarray([0.0, 0.0, 8.0])
R = es.exp_so3(jnp.asarray([0.02, -0.03, 0.01], jnp.float64))
t = jnp.asarray([0.8, 0.1, 0.6], jnp.float64)
p2 = pts @ R.T + t
x1 = pts[..., :2] / pts[..., 2:]
x2 = p2[..., :2] / p2[..., 2:]
x1 = x1 + 1e-4 * jax.random.normal(k2, x1.shape, jnp.float64)

idx = jax.random.randint(k3, (B, H, 5), 0, N)
flat = idx.reshape(B, H * 5, 1)
s1 = jnp.take_along_axis(x1, flat, axis=1).reshape(B, H, 5, 2)
s2 = jnp.take_along_axis(x2, flat, axis=1).reshape(B, H, 5, 2)

ones = jnp.ones_like(s1[..., :1])
q1 = jnp.concatenate([s1, ones], axis=-1)
q2 = jnp.concatenate([s2, ones], axis=-1)
A = jnp.einsum("...ni,...nj->...nij", q2, q1).reshape(q1.shape[:-1] + (9,))

basis = timeit("nullspace 5x9 (f64)", lambda A: nullspace(A, 4), A)
EB = basis.reshape(basis.shape[:-1] + (3, 3))
M = timeit("constraint matrix 10x20 (f64)", es._constraint_matrix, EB)
L, Rm = M[..., es._COLS_FIRST], M[..., es._COLS_LAST]
Rb = timeit("gauss-jordan 10x(10+10) (f64)", gauss_solve, L, Rm)

# reconstruct the degree-10 polynomial exactly as five_point_candidates
def make_poly(Rb):
    e, f, g, h, i_, j_ = (Rb[..., k, :] for k in range(4, 10))

    def split(row):
        return row[..., 2::-1], row[..., 5:2:-1], row[..., 9:5:-1]

    def minus_z(pa, pb):
        n = pa.shape[-1]
        out = jnp.zeros(pa.shape[:-1] + (n + 1,), pa.dtype)
        out = out.at[..., :n].add(pa)
        out = out.at[..., 1:n + 1].add(-pb)
        return out

    ex, ey, e1 = split(e); fx, fy, f1 = split(f)
    gx, gy, g1 = split(g); hx, hy, h1 = split(h)
    ix, iy, i1 = split(i_); jx, jy, j1 = split(j_)
    kx, ky, k1_ = minus_z(ex, fx), minus_z(ey, fy), minus_z(e1, f1)
    lx, ly, l1 = minus_z(gx, hx), minus_z(gy, hy), minus_z(g1, h1)
    mx, my, m1 = minus_z(ix, jx), minus_z(iy, jy), minus_z(i1, j1)
    pm = es._polymul
    return (pm(kx, pm(ly, m1) - pm(l1, my))
            - pm(ky, pm(lx, m1) - pm(l1, mx))
            + pm(k1_, pm(lx, my) - pm(ly, mx)))

p_det = timeit("poly assembly (f64)", make_poly, Rb)
timeit("real_roots deg-10 (current)", lambda p: real_roots(p, 10), p_det)

E, valid = timeit("five_point_candidates TOTAL", es.five_point_candidates, s1, s2)
Ef = E.reshape(B, H * 10, 3, 3)
timeit("sampson scoring f32 (5120xN)", lambda Ef, x1, x2: es.sampson_error(
    Ef.astype(jnp.float32), x1[:, None].astype(jnp.float32), x2[:, None].astype(jnp.float32)), Ef, x1, x2)
timeit("decompose+cheirality (winner)", es.decompose_essential, Ef[:, 0], x1, x2)
timeit("polish 5 iters", lambda E0, x1, x2: jax.vmap(
    lambda e, a, b: es.polish_essential(e, a, b, iters=5))(E0, x1, x2), Ef[:, 0], x1, x2)
timeit("ransac_pose TOTAL", lambda x1, x2: es.ransac_pose(
    x1, x2, jax.random.PRNGKey(1), num_hypotheses=512, ransac_iter=5,
    polish=True, polish_iters=5), x1, x2)
