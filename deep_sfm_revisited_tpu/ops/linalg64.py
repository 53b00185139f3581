"""Small-matrix float64 linear algebra from elementary ops.

TPU's XLA backend implements no f64 LU/QR/SVD/eigh kernels ("Only F32 and
C64 types are implemented in LuDecomposition"), but elementary f64
arithmetic works. The essential-matrix engine needs only tiny fixed-size
factorizations (5x9 nullspace, 10x10 solve, 3x3 symmetric eig, 6x6 solve),
so we implement them with statically-unrolled partial-pivot elimination,
Householder reflections, and cyclic Jacobi sweeps — fully batched over
leading dims, identical numerics on CPU and TPU.

This mirrors what the reference's CUDA does per thread
(`null_space_solve_5x9` `essential_matrix_5pt.cu:538-678`, `solve_5x5`
`polish_E.cu:340`, Givens `Edecomp` `polish_E.cu:147-244`), re-expressed
as vectorized batch math instead of per-thread scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_solve(A: jnp.ndarray, B: jnp.ndarray,
                pivot: bool = True) -> jnp.ndarray:
    """Solve A X = B by Gauss-Jordan.

    A (..., n, n), B (..., n, m), static n/m; returns (..., n, m).
    Exactly-singular systems return finite garbage, NOT inf/nan (the
    zero pivot is substituted with 1 to keep the batch finite) — do not
    rely on non-finiteness to detect degeneracy. The RANSAC callers are
    safe either way: a garbage candidate simply loses the Sampson vote,
    and near-singular systems (the realistic case) still blow up to
    values the downstream validity masks reject.

    `pivot=True`: partial pivoting (the default — numerically safe).
    `pivot=False`: one up-front row equilibration (divide each row by
    its max |entry|) then straight pivot-free elimination — removes the
    n sequential argmax/row-swap chains, which are pure latency on TPU
    (round-5 RANSAC re-ablation). Use only where a rare ill-conditioned
    system is tolerable, e.g. the RANSAC candidate pipeline, where a
    garbage candidate simply loses the Sampson vote.
    """
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., n, n+m)
    if not pivot:
        scale = jnp.max(jnp.abs(A), axis=-1, keepdims=True)
        M = M / jnp.maximum(scale, jnp.asarray(1e-30, A.dtype))
        for k in range(n):
            pivval = M[..., k, k]
            safe = jnp.where(jnp.abs(pivval) > 0, pivval, 1.0)
            row_k = M[..., k, :] / safe[..., None]
            M = M.at[..., k, :].set(row_k)
            factor = M[..., :, k]
            factor = factor.at[..., k].set(0.0)
            M = M - factor[..., :, None] * row_k[..., None, :]
        return M[..., :, n:]
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        piv = jnp.argmax(col, axis=-1)  # (...,)
        # swap rows k <-> piv (batched, branch-free)
        row_k = M[..., k, :]
        row_piv = jnp.take_along_axis(M, piv[..., None, None], axis=-2)[..., 0, :]
        is_piv = rows[..., :, None] == piv[..., None, None]  # (..., n, 1)
        M = M.at[..., k, :].set(row_piv)
        M = jnp.where(is_piv & (rows[:, None] != k), row_k[..., None, :], M)
        # normalize pivot row, eliminate everywhere else
        pivval = M[..., k, k]
        safe = jnp.where(jnp.abs(pivval) > 0, pivval, 1.0)
        M = M.at[..., k, :].divide(safe[..., None])
        factor = M[..., :, k]
        factor = factor.at[..., k].set(0.0)
        M = M - factor[..., :, None] * M[..., k, :][..., None, :]
    return M[..., :, n:]


def nullspace(A: jnp.ndarray, null_dim: int) -> jnp.ndarray:
    """Orthonormal right-nullspace basis via Householder QR of A^T.

    A (..., r, c) with r + null_dim == c; returns (..., null_dim, c) whose
    rows are orthonormal and satisfy A n^T = 0 (exactly, up to roundoff,
    for any A of full row rank).
    """
    M = jnp.swapaxes(A, -1, -2)  # (..., c, r)
    c, r = M.shape[-2], M.shape[-1]
    assert r + null_dim == c
    idx = jnp.arange(c)
    vs = []
    for k in range(r):
        x = M[..., :, k]
        x = jnp.where(idx >= k, x, 0.0)
        sigma = jnp.linalg.norm(x, axis=-1)
        sign = jnp.where(x[..., k] >= 0, 1.0, -1.0)
        v = x.at[..., k].add(sign * sigma)
        vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v / jnp.where(vnorm > 0, vnorm, 1.0)
        vs.append(v)
        # H M = M - 2 v (v^T M)
        M = M - 2.0 * v[..., :, None] * jnp.einsum("...c,...cr->...r", v, M)[..., None, :]
    # last null_dim columns of Q = H_0 ... H_{r-1} e_j, j >= r
    N = jnp.zeros(A.shape[:-2] + (c, null_dim), A.dtype)
    N = N + jnp.eye(c, dtype=A.dtype)[:, r:]
    for v in reversed(vs):
        N = N - 2.0 * v[..., :, None] * jnp.einsum("...c,...cm->...m", v, N)[..., None, :]
    return jnp.swapaxes(N, -1, -2)


def eigh3x3(S: jnp.ndarray, sweeps: int = 8):
    """Symmetric 3x3 eigendecomposition by cyclic Jacobi rotations.

    S (..., 3, 3) symmetric; returns (w, V) with ascending eigenvalues
    w (..., 3) and orthonormal columns V (..., 3, 3). Replaces
    `jnp.linalg.eigh` (no f64 TPU kernel) for the E E^T factorization.
    """
    A = S
    V = jnp.zeros_like(S) + jnp.eye(3, dtype=S.dtype)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            app = A[..., p, p]
            aqq = A[..., q, q]
            apq = A[..., p, q]
            # Jacobi rotation zeroing A[p, q].
            # TPU's emulated f64 is a float pair with float32 exponent
            # range: constants below ~1e-38 flush to zero and
            # sqrt(inf) == NaN, so (a) the zero threshold must be
            # representable and (b) sqrt(1 + tau^2) must never overflow —
            # for large |tau| use the asymptotic t = 1/(2 tau) instead.
            nonzero = jnp.abs(apq) > 1e-30
            tau = (aqq - app) / (2.0 * jnp.where(nonzero, apq, 1.0))
            big = jnp.abs(tau) > 1e8
            tau_safe = jnp.where(big, 1.0, tau)
            t_small = jnp.where(tau_safe >= 0, 1.0, -1.0) / (
                jnp.abs(tau_safe) + jnp.sqrt(1.0 + tau_safe * tau_safe)
            )
            t = jnp.where(big, 1.0 / (2.0 * jnp.where(big, tau, 1.0)), t_small)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            c = jnp.where(nonzero, c, 1.0)
            s = jnp.where(nonzero, s, 0.0)
            G = jnp.zeros_like(A) + jnp.eye(3, dtype=A.dtype)
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            A = jnp.swapaxes(G, -1, -2) @ A @ G
            V = V @ G
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    # ascending sort of 3 values with a static 3-exchange network
    for i, j in ((0, 1), (1, 2), (0, 1)):
        swap = w[..., i] > w[..., j]
        wi, wj = w[..., i], w[..., j]
        w = w.at[..., i].set(jnp.where(swap, wj, wi))
        w = w.at[..., j].set(jnp.where(swap, wi, wj))
        vi, vj = V[..., :, i], V[..., :, j]
        V = V.at[..., :, i].set(jnp.where(swap[..., None], vj, vi))
        V = V.at[..., :, j].set(jnp.where(swap[..., None], vi, vj))
    return w, V


def det3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Explicit 3x3 determinant (jnp.linalg.det lowers to f64 LU on TPU)."""
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )
