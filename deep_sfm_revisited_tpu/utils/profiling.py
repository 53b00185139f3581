"""Profiling / tracing utilities.

TPU-native replacement for the reference's minimal timing scaffolding
(wall-clock `AverageMeter`s `main.py:297-298,309,425`, the never-populated
`time_dict` plumbed out of SFMnet `models/SFMnet.py:17-18,172`, and the
commented-out CUDA kernel timers `essential_matrix.cu:103,154,166`):

  * `stage_timer` — a context decorator measuring device-synchronized
    wall time per pipeline stage (block_until_ready, so the async
    dispatch gap doesn't hide kernel time);
  * `trace` — wraps `jax.profiler.trace` to dump an XPlane trace viewable
    in TensorBoard/XProf (the principled replacement for ad-hoc timers:
    fusion decisions and HBM stalls are visible per-op);
  * `annotate` — `jax.profiler.TraceAnnotation` passthrough so pipeline
    stages (flow / ransac / depth) are labeled inside device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimes:
    """Accumulates per-stage device-synchronized timings (the working
    version of the reference's `time_dict`)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }

    def __repr__(self):
        return " ".join(
            f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.summary().items())
        )


def throughput(fn, inputs, *, reps: int = 3, warmup: int = 2) -> float:
    """Honest per-item wall time of `fn` over a batch of DISTINCT inputs.

    Runs all items of `inputs` (a pytree whose leaves have a leading
    item axis) through `fn` inside ONE jitted program via `lax.scan`,
    synchronizes with a single device->host scalar read, and returns
    seconds per item (best practice distilled from bench.py):

      * one program per measurement — on remote-device platforms every
        program dispatch costs a host round-trip (~27 ms on the axon
        tunnel) and `block_until_ready` can return early, so per-call
        timing measures the channel, not the chip;
      * the inputs MUST be distinct per item — with loop-invariant
        inputs XLA hoists the invariant subgraph out of the scan and
        the number is fake (measured: 15 vs 31 ms/pair on the
        flow+RANSAC pose path);
      * the scalar read is a true data dependency on every iteration.
    """
    import jax.numpy as jnp

    n = jax.tree_util.tree_leaves(inputs)[0].shape[0]

    @jax.jit
    def run(inputs):
        def body(acc, item):
            out = fn(item)
            s = sum(
                jnp.sum(jnp.abs(o.astype(jnp.float32)))
                for o in jax.tree_util.tree_leaves(out)
            )
            return acc + s, None

        tot, _ = jax.lax.scan(body, 0.0, inputs)
        return tot

    for _ in range(warmup):
        float(run(inputs))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(inputs))
    return (time.perf_counter() - t0) / (reps * n)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace to `log_dir` (open with TensorBoard's profile tab)."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Label a region inside device traces."""
    return jax.profiler.TraceAnnotation(name)
