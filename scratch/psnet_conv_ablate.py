"""PSNet 3D-conv formulation ablation at the real cost-volume shape.

Compares mathematically identical formulations of a 3x3x3 conv stack:
  a) native NDHWC 3D conv (current Hourglass3D)
  b) D-shift + channel-concat + (1,3,3) conv (3x input channels)
  c) fold D into batch, three 2D convs summed with D shifts
All at (B=1, D=128, H=96, W=320), 64->32 then 32->32 x11 like the
hourglass, bf16.
"""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

B, D, H, W = 1, 128, 96, 320
ITERS = 4


def timeit(name, fn, *args, warmup=2, iters=ITERS):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} {dt:9.1f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, D, H, W, 64), jnp.bfloat16)

# weight stacks: 12 convs (64->32, then 11x 32->32), K (3,3,3,Cin,32)
ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                        (3, 3, 3, 64 if i == 0 else 32, 32),
                        jnp.bfloat16) * 0.05
      for i in range(12)]


def conv3d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)


def native(x):
    for k in ks:
        x = nn.relu(conv3d(x, k))
    return x


def dshift_concat(x):
    for k in ks:
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xc = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
        # (1,3,3) conv with 3*Cin channels == the 3x3x3 conv
        kc = jnp.concatenate([k[0], k[1], k[2]], axis=2)[None]  # (1,3,3,3Cin,32)
        x = nn.relu(jax.lax.conv_general_dilated(
            xc, kc, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16))
    return x


def folded2d(x):
    b, dd, hh, ww, _ = x.shape
    for k in ks:
        x2 = x.reshape(b * dd, hh, ww, x.shape[-1])
        outs = []
        for dz in range(3):
            outs.append(jax.lax.conv_general_dilated(
                x2, k[dz], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16).reshape(b, dd, hh, ww, 32))
        # y[d] = conv(x[d-1],k0) + conv(x[d],k1) + conv(x[d+1],k2)
        z = jnp.zeros((b, 1, hh, ww, 32), jnp.bfloat16)
        x = nn.relu(
            jnp.concatenate([z, outs[0][:, :-1]], axis=1)
            + outs[1]
            + jnp.concatenate([outs[2][:, 1:], z], axis=1))
    return x


# parity check on tiny shape (cpu-ish small, still on device)
xs = x[:, :8, :16, :32]
r0 = jax.jit(native)(xs)
r1 = jax.jit(dshift_concat)(xs)
r2 = jax.jit(folded2d)(xs)
print("parity b vs a:", float(jnp.max(jnp.abs(r1.astype(jnp.float32) - r0.astype(jnp.float32)))), flush=True)
print("parity c vs a:", float(jnp.max(jnp.abs(r2.astype(jnp.float32) - r0.astype(jnp.float32)))), flush=True)

timeit("native 3D conv x12", jax.jit(native), x)
timeit("D-shift concat (1,3,3) x12", jax.jit(dshift_concat), x)
timeit("folded-batch 2D x3 x12", jax.jit(folded2d), x)


def folded2d_fused(x):
    """One conv with 3F output channels (k0|k1|k2 concat along Cout), then
    depth-shift sum: same math, one implicit GEMM with N=96 instead of
    three with N=32 (MXU lanes are 128-wide; N=32 caps utilization at 25%)."""
    b, dd, hh, ww, _ = x.shape
    for k in ks:
        F = k.shape[-1]
        x2 = x.reshape(b * dd, hh, ww, x.shape[-1])
        kc = jnp.concatenate([k[0], k[1], k[2]], axis=-1)  # (3,3,Cin,3F)
        y = jax.lax.conv_general_dilated(
            x2, kc, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        ).reshape(b, dd, hh, ww, 3, F)
        y0, y1, y2 = y[..., 0, :], y[..., 1, :], y[..., 2, :]
        z = jnp.zeros((b, 1, hh, ww, F), jnp.bfloat16)
        x = nn.relu(
            jnp.concatenate([z, y0[:, :-1]], axis=1)
            + y1
            + jnp.concatenate([y2[:, 1:], z], axis=1))
    return x


r3 = jax.jit(folded2d_fused)(xs)
print("parity d vs a:", float(jnp.max(jnp.abs(r3.astype(jnp.float32) - r0.astype(jnp.float32)))), flush=True)
timeit("folded fused Cout=96 x12", jax.jit(folded2d_fused), x)
