"""Fixed-shape real-root finding for degree-10 polynomials.

TPU-native replacement for the reference's Sturm-sequence bisection root
finder (`RANSAC_FiveP/essential_matrix/sturm.cu:450-677`), which runs per
CUDA thread with data-dependent recursion. On TPU everything must be
fixed-shape and jit-able, so we use:

  1. a tangent-mapped sign-change sweep: sample z = tan(theta) on a dense
     theta grid covering the whole real line, evaluating the *homogenized*
     polynomial P(s, c) = sum_i a_i s^i c^(n-i) (bounded — no overflow for
     |z| -> inf, unlike Horner);
  2. fixed-count bisection in theta on each bracketing interval;
  3. a few Newton polish steps in z for full f64 accuracy.

Up to `max_roots` roots are returned with a validity mask (the five-point
problem has <= 10 real roots, matching the CUDA code's fixed candidate
budget, `essential_matrix_5pt.cu:955`). Tangential (even-multiplicity)
roots produce no sign change and are skipped — they correspond to
degenerate essential-matrix candidates that RANSAC would discard anyway.

Everything is batched over leading dims and differentiable (though the
RANSAC path stops gradients, as the reference detaches its poses,
`models/SFMnet.py:272`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# number of theta samples for bracketing; 10 roots over (-pi/2, pi/2) are
# generically well separated at this resolution.
_GRID = 512
# Bracketing runs in float32: TPU f64 is a software-emulated float pair
# (~10x per op, worse for sin/cos), and a bisection bracket only needs
# sign information — 26 halvings reach f32's theta resolution, after
# which the f64 Newton polish below restores full precision (quadratic:
# ~1e-6 relative -> ~1e-12 -> ~1e-16 in two steps; 4 for margin). This
# halves the sequential depth of the root finder AND moves every step
# from emulated f64 to native f32.
_BISECT_ITERS = 26
_NEWTON_ITERS = 4


def _eval_homogeneous(coeffs: jnp.ndarray, s: jnp.ndarray, c: jnp.ndarray):
    """Evaluate P(s, c) = sum_i a_i s^i c^(n-i), coeffs lowest-power-first.

    coeffs (..., n+1); s, c broadcastable against (..., K). Returns (..., K).
    """
    n = coeffs.shape[-1] - 1
    # Horner in (s/c) without dividing: accumulate from highest power of s.
    out = coeffs[..., n, None] * jnp.ones_like(s)
    for i in range(n - 1, -1, -1):
        out = out * s + coeffs[..., i, None] * c ** (n - i)
    return out


def real_roots(coeffs: jnp.ndarray, max_roots: int = 10,
               bisect_iters: int | None = None,
               newton_iters: int | None = None):
    """All (odd-multiplicity) real roots of a polynomial, fixed shape.

    coeffs: (..., n+1) lowest-power-first. Returns (roots, valid):
    roots (..., max_roots) float, valid (..., max_roots) bool.

    `bisect_iters`/`newton_iters` override the default schedule — the
    RANSAC candidate path uses a shorter bisection + one extra Newton
    step (round-5: the bisection chain is pure latency; Newton converges
    quadratically from the ~1.5e-6-theta bracket 12 halvings leave).
    """
    dtype = coeffs.dtype
    n_bisect = _BISECT_ITERS if bisect_iters is None else bisect_iters
    n_newton = _NEWTON_ITERS if newton_iters is None else newton_iters
    # scale-normalize for conditioning (ref normalizes too, sturm.cu:570-587)
    scale = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)
    coeffs = coeffs / jnp.maximum(scale, 1e-30)  # 1e-300 flushes to 0 on TPU f64

    # bisection dtype: f32 when the input is f64 (see note on
    # _BISECT_ITERS). The SIGN SWEEP stays in the input dtype — it is one
    # fully parallel pass (cheap even emulated), and an f32 sweep can miss
    # sign changes whose inter-sample magnitudes sit below f32 evaluation
    # noise (close root pairs of near-degenerate samples).
    bdtype = jnp.float32 if dtype == jnp.float64 else dtype
    bcoeffs = coeffs.astype(bdtype)

    half_pi = jnp.asarray(jnp.pi / 2, bdtype)
    eps = jnp.asarray(1e-7, bdtype)
    theta = jnp.linspace(-half_pi + eps, half_pi - eps, _GRID).astype(bdtype)
    s, c = jnp.sin(theta).astype(dtype), jnp.cos(theta).astype(dtype)
    vals = _eval_homogeneous(coeffs, s, c)  # (..., GRID), full precision

    sign = jnp.sign(vals)
    # a bracket at i means sign change between theta[i] and theta[i+1]
    change = (sign[..., :-1] * sign[..., 1:]) < 0  # (..., GRID-1)
    idx = jnp.broadcast_to(
        jnp.arange(_GRID - 1), change.shape
    )
    marked = jnp.where(change, idx, _GRID)  # non-brackets pushed to the end
    order = jnp.sort(marked, axis=-1)[..., :max_roots]  # first max_roots brackets
    valid = order < _GRID
    safe = jnp.minimum(order, _GRID - 2)

    lo = jnp.take(theta, safe)
    hi = jnp.take(theta, safe + 1)
    # seed with the f64 endpoint value cast down: the bisection only uses
    # its SIGN, and within a true bracket a near-zero f32 sign flip can
    # at worst bias the halving — the f64 Newton polish recovers
    f_lo = jnp.take_along_axis(vals, safe, axis=-1).astype(bdtype)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = _eval_homogeneous(bcoeffs, jnp.sin(mid), jnp.cos(mid))
        go_right = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
        f_lo = jnp.where(go_right, f_mid, f_lo)
        return lo, hi, f_lo

    lo, hi, _ = jax.lax.fori_loop(0, n_bisect, body, (lo, hi, f_lo))
    # tan in the target dtype (f32 tan near +-pi/2 would waste the bracket)
    roots = jnp.tan((0.5 * (lo + hi)).astype(dtype))

    # Newton polish in z for the last bits of precision
    n = coeffs.shape[-1] - 1
    powers = jnp.arange(n + 1, dtype=dtype)
    dcoeffs = coeffs[..., 1:] * powers[1:]

    def horner(cf, z):
        out = jnp.zeros_like(z)
        for i in range(cf.shape[-1] - 1, -1, -1):
            out = out * z + cf[..., i, None]
        return out

    for _ in range(n_newton):
        p = horner(coeffs, roots)
        dp = horner(dcoeffs, roots)
        step = p / jnp.where(jnp.abs(dp) > 1e-30, dp, 1.0)
        # only take well-behaved steps (stay inside the bracket scale)
        ok = jnp.abs(step) < (jnp.abs(roots) + 1.0)
        roots = roots - jnp.where(ok, step, 0.0)

    roots = jnp.where(valid, roots, 0.0)
    return roots, valid
