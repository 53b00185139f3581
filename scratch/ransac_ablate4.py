"""Round-5 RANSAC re-ablation, SCAN PROTOCOL (distinct inputs).

ransac_ablate3's per-call numbers sit inside the ~25 ms read floor.
Here every stage runs under lax.scan over SCAN_N distinct inputs inside
ONE program with one fused scalar read; ms/stage = (t - floor)/SCAN_N
with the floor measured by an empty scan of the same shape. Distinct
inputs prevent XLA from hoisting the body (PERF.md "Tunnel dispatch
overhead").
"""
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import essential as es
from deep_sfm_revisited_tpu.ops.linalg64 import gauss_solve
from deep_sfm_revisited_tpu.ops.polyroots import real_roots

B, N = 1, 1024
HYP, RITER = 512, 5
H = HYP * RITER
SCAN_N = 16
REPS = 4
F32 = jnp.float32


def scan_time(name, fn, stacked_args, floor=0.0, warmup=1):
    """stacked_args: pytree with leading SCAN_N axis."""

    def prog(args):
        def body(acc, a):
            out = fn(*a)
            return acc + sum(
                jnp.sum(jnp.abs(o.astype(F32))) for o in jax.tree.leaves(out)
            ), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), F32), args)
        return acc

    jfn = jax.jit(prog)
    for _ in range(warmup):
        float(jfn(stacked_args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(jfn(stacked_args))
    dt = (time.perf_counter() - t0) / REPS * 1000
    per = (dt - floor) / SCAN_N
    print(f"{name:44s} {per:8.3f} ms   (prog {dt:7.1f})", flush=True)
    return dt


key = jax.random.PRNGKey(0)


def make_pair(k):
    k1, k2 = jax.random.split(k)
    pts = jax.random.normal(k1, (B, N, 3), jnp.float64) * jnp.asarray(
        [2.0, 1.0, 0.5]) + jnp.asarray([0.0, 0.0, 8.0])
    R = es.exp_so3(jnp.asarray([0.02, -0.03, 0.01], jnp.float64))
    t = jnp.asarray([0.8, 0.1, 0.6], jnp.float64)
    p2 = pts @ R.T + t
    x1 = pts[..., :2] / pts[..., 2:]
    x2 = p2[..., :2] / p2[..., 2:]
    return x1 + 1e-4 * jax.random.normal(k2, x1.shape, jnp.float64), x2


keys = jax.random.split(key, SCAN_N)
X1, X2 = jax.vmap(make_pair)(keys)  # (SCAN_N, B, N, 2)

idx = jax.random.randint(key, (SCAN_N, B, H, 5), 0, N)
flat = idx.reshape(SCAN_N, B, H * 5, 1)
S1 = jnp.take_along_axis(X1, flat, axis=2).reshape(SCAN_N, B, H, 5, 2)
S2 = jnp.take_along_axis(X2, flat, axis=2).reshape(SCAN_N, B, H, 5, 2)
S1f, S2f = S1.astype(F32), S2.astype(F32)

ones = jnp.ones_like(S1f[..., :1])
Q1 = jnp.concatenate([S1f, ones], axis=-1)
Q2 = jnp.concatenate([S2f, ones], axis=-1)
A = jnp.einsum("...ni,...nj->...nij", Q2, Q1).reshape(Q1.shape[:-1] + (9,))

print(f"protocol: B={B} H={H} N={N} scan={SCAN_N} reps={REPS}")
floor = scan_time("FLOOR (identity body)", lambda x: (x,), (A,))
print(f"floor program: {floor:.1f} ms")

basis = jax.vmap(es._nullspace4)(A)
EB = basis.reshape(basis.shape[:-1] + (3, 3))
M = jax.vmap(es._constraint_matrix)(EB)
L, Rm = M[..., es._COLS_FIRST], M[..., es._COLS_LAST]
Rb = jax.vmap(lambda l, r: gauss_solve(l, r))(L, Rm)

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


P_det = make_poly(Rb)

scan_time("nullspace 5x9 (f32)", lambda a: (es._nullspace4(a),), (A,),
          floor)
scan_time("constraint matrix 10x20 (f32)",
          lambda eb: (es._constraint_matrix(eb),), (EB,), floor)
scan_time("gauss-jordan 10x(10+10) (f32)",
          lambda l, r: (gauss_solve(l, r),), (L, Rm), floor)
scan_time("poly assembly (f32)", lambda rb: (make_poly(rb),), (Rb,),
          floor)
scan_time("real_roots deg-10 (f32)", lambda p: real_roots(p, 10),
          (P_det,), floor)
scan_time("five_point_candidates TOTAL (f32)",
          es.five_point_candidates, (S1f, S2f), floor)
scan_time("gauss-jordan PIVOT-FREE (f32, round-5)",
          lambda l, r: (gauss_solve(l, r, pivot=False),), (L, Rm),
          floor)
scan_time("real_roots 12-bisect/5-newton (round-5)",
          lambda p: real_roots(p, 10, bisect_iters=12, newton_iters=5),
          (P_det,), floor)
scan_time("five_point_candidates FAST (round-5)",
          lambda a, b: es.five_point_candidates(a, b, fast=True),
          (S1f, S2f), floor)

E, valid = jax.vmap(es.five_point_candidates)(S1f, S2f)
Ef = E.astype(jnp.float64).reshape(SCAN_N, B, H * 10, 3, 3)
scan_time("sampson scoring f32 (25600xN)",
          lambda ef, x1, x2: (es.sampson_error(
              ef.astype(F32), x1[:, None].astype(F32),
              x2[:, None].astype(F32)),), (Ef, X1, X2), floor)
E0 = Ef[:, :, 0]
scan_time("decompose+cheirality (winner, f64)",
          lambda e, x1, x2: es.decompose_essential(e, x1, x2),
          (E0, X1, X2), floor)
scan_time("polish mixed 10 iters (9 f32 + 1 f64)",
          lambda e, x1, x2: (jax.vmap(
              lambda ee, a, b: es.polish_essential(
                  ee, a, b, iters=10, coarse_dtype=F32))(e, x1, x2),),
          (E0, X1, X2), floor)
scan_time("ransac_pose TOTAL (product args)",
          lambda x1, x2, k: tuple(es.ransac_pose(
              x1, x2, k, num_hypotheses=HYP, ransac_iter=RITER,
              polish=True, polish_iters=10, solve_dtype=F32).values()),
          (X1, X2, keys), floor)
