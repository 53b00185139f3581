"""Round-5 RANSAC re-ablation at the CURRENT pipeline state.

The round-1 sub-stage table (PERF.md "Measurement methodology") predates
the f32 candidate pipeline, the mixed-precision polish, and the 512x5
protocol. This measures the sub-stages as they actually run in the
product path today: five_point_candidates at solve_dtype=f32 on
H=512*5=2560 hypotheses, f32 Sampson scoring over 25600 candidates x
1024 points, mixed polish (9 f32 GN iters + 1 f64), and ransac_pose
TOTAL exactly as models/sfmnet.py calls it.

Sync protocol: one fused device->host scalar read per iteration
(PERF.md: block_until_ready returns early on this platform).
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import essential as es
from deep_sfm_revisited_tpu.ops.linalg64 import gauss_solve, nullspace
from deep_sfm_revisited_tpu.ops.polyroots import real_roots

B, N = 1, 1024
HYP, RITER = 512, 5
H = HYP * RITER
ITERS = 6
F32 = jnp.float32


def timeit(name, fn, *args, warmup=2):
    fn_j = jax.jit(fn)

    def scalarized(*a):
        out = fn_j(*a)
        return out, sum(
            jnp.sum(jnp.abs(o.astype(jnp.float32)))
            for o in jax.tree.leaves(out)
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
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
pts = jax.random.normal(k1, (B, N, 3), jnp.float64) * jnp.asarray(
    [2.0, 1.0, 0.5]
) + jnp.asarray([0.0, 0.0, 8.0])
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
s1f, s2f = s1.astype(F32), s2.astype(F32)

ones = jnp.ones_like(s1f[..., :1])
q1 = jnp.concatenate([s1f, ones], axis=-1)
q2 = jnp.concatenate([s2f, ones], axis=-1)
A = jnp.einsum("...ni,...nj->...nij", q2, q1).reshape(q1.shape[:-1] + (9,))

print(f"protocol: B={B} H={H} (={HYP}x{RITER}) N={N} solve=f32 "
      f"polish=mixed(9xf32+1xf64)")
basis = timeit("nullspace 5x9 (f32)", lambda A: es._nullspace4(A), A)
EB = basis.reshape(basis.shape[:-1] + (3, 3))
M = timeit("constraint matrix 10x20 (f32)", es._constraint_matrix, EB)
L, Rm = M[..., es._COLS_FIRST], M[..., es._COLS_LAST]
Rb = timeit("gauss-jordan 10x(10+10) (f32)", gauss_solve, L, Rm)


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


p_det = timeit("poly assembly (f32)", make_poly, Rb)
timeit("real_roots deg-10 (f32 in/out)", lambda p: real_roots(p, 10), p_det)

E, valid = timeit("five_point_candidates TOTAL (f32)",
                  es.five_point_candidates, s1f, s2f)
Ef = E.astype(jnp.float64).reshape(B, H * 10, 3, 3)
timeit("sampson scoring f32 (25600xN)",
       lambda Ef, x1, x2: es.sampson_error(
           Ef.astype(F32), x1[:, None].astype(F32),
           x2[:, None].astype(F32)), Ef, x1, x2)
timeit("decompose+cheirality (winner, f64)", es.decompose_essential,
       Ef[:, 0], x1, x2)
timeit("polish mixed 10 iters (9 f32 + 1 f64)",
       lambda E0, x1, x2: jax.vmap(
           lambda e, a, b: es.polish_essential(
               e, a, b, iters=10, coarse_dtype=F32))(E0, x1, x2),
       Ef[:, 0], x1, x2)
timeit("ransac_pose TOTAL (product args)",
       lambda x1, x2: es.ransac_pose(
           x1, x2, jax.random.PRNGKey(1), num_hypotheses=HYP,
           ransac_iter=RITER, polish=True, polish_iters=10,
           solve_dtype=F32), x1, x2)
