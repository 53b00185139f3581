"""Round-5 experiment: fold DICL's level 3-6 matcher invocations into
one grouped conv per layer (VERDICT round-4 'next' #2b).

The matchers at levels 3-6 cost 4.29 ms (dicl_ablate2) at tiny spatial
sizes (48x160 .. 6x20 for the 384x1280 eval shape) — launch-bound, not
FLOP-bound. Candidate fix: pack the four levels into ONE canvas of the
largest level's size, with each level's 2C=64 features in its own
channel group, and run each matcher layer as a single
feature_group_count=4 conv with per-level weights. Launch count per
layer drops 4 -> 1; FLOP count rises to 4 x level-3 area (every group
convolves the full canvas) ~= 3x the true work.

This probe times the exact matcher conv structure (BasicConv stack of
MatchingShallow_down: 96 s1 / 128 s2 / 128 s1 / 64 s1 / deconv 32 s2 /
1 s1; BN folded into the conv at eval) in both forms on the chip.

Sync: one fused scalar read per iteration (scan over ITERS distinct
inputs is unnecessary here — each form is a single program timed
identically, floor cancels in the comparison).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

F32 = jnp.float32
B49 = 49  # displacement-folded batch at B=1
# level spatial sizes for 384x1280 eval: strides 8, 16, 32, 64
SIZES = [(48, 160), (24, 80), (12, 40), (6, 20)]
L = len(SIZES)
CIN = 64
ITERS = 8

# matcher layer specs: (cout, stride, deconv)
LAYERS = [(96, 1, False), (128, 2, False), (128, 1, False),
          (64, 1, False), (32, 2, True), (1, 1, False)]


def make_weights(key, groups):
    ws = []
    cin = CIN
    for cout, stride, deconv in LAYERS:
        key, k = jax.random.split(key)
        if deconv:
            w = jax.random.normal(k, (4, 4, cin, cout), F32) * 0.05
        else:
            w = jax.random.normal(k, (3, 3, cin, cout), F32) * 0.05
        ws.append(w)
        cin = cout
    return ws


def conv(x, w, stride, deconv, groups=1):
    if deconv:
        return lax.conv_transpose(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def sequential(inputs, weight_sets):
    outs = []
    for x, ws in zip(inputs, weight_sets):
        h = x
        for (cout, stride, deconv), w in zip(LAYERS, ws):
            h = jnp.maximum(conv(h, w, stride, deconv), 0.0)
        outs.append(h)
    return sum(jnp.sum(o) for o in outs)


def folded(canvas, gws):
    """canvas (B49, H3, W3, L*CIN); per-layer grouped weights."""
    h = canvas
    for (cout, stride, deconv), w in zip(LAYERS, gws):
        if deconv:
            # grouped conv_transpose is unsupported on some backends:
            # emulate with input dilation in a grouped forward conv
            hd = jnp.zeros(
                (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                h.dtype).at[:, ::2, ::2, :].set(h)
            h = jnp.maximum(conv(hd, w, 1, False, groups=L), 0.0)
        else:
            h = jnp.maximum(conv(h, w, stride, deconv, groups=L), 0.0)
    return jnp.sum(h)


def timeit(name, fn, *args, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(jfn(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
weight_sets = [make_weights(jax.random.fold_in(key, i), 1)
               for i in range(L)]
inputs = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                            (B49, h, w, CIN), F32)
          for i, (h, w) in enumerate(SIZES)]

# folded form: pack each level into the top-left of the big canvas,
# one channel group per level
H3, W3 = SIZES[0]
canvas = jnp.zeros((B49, H3, W3, L * CIN), F32)
for i, x in enumerate(inputs):
    h, w = SIZES[i]
    canvas = canvas.at[:, :h, :w, i * CIN:(i + 1) * CIN].set(x)
gws = []
for li in range(len(LAYERS)):
    gws.append(jnp.concatenate([weight_sets[l][li] for l in range(L)],
                               axis=-1))

# floor reference: an empty-ish program
timeit("floor (sum of one input)", lambda x: jnp.sum(x), inputs[0])
timeit("sequential 4 matchers (current)", sequential,
       inputs, weight_sets)
timeit("folded grouped-conv matcher", folded, canvas, gws)
