"""Time the SHIPPED train/validate loops on the real chip (VERDICT r3 #1).

Round 2's scan-protocol numbers (206 ms/step train @256x768, 155 ms/pair
eval @384x1280, PERF.md) were measured in scratch harnesses; the product
loops paid ~25 ms/read x leaves + ~27 ms/dispatch per step. This drives
the ACTUAL `train_epoch` / `validate` (train/loop.py) with ChainedStep /
ChainedEval over in-memory loaders of DISTINCT recipe-shaped batches and
reports wall-clock ms/step + ms/pair for direct comparison.

Run: python scratch/tpu_product_loop_timing.py [train|eval|both]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.train.loop import train_epoch, validate
from deep_sfm_revisited_tpu.train.trainer import (
    ChainedEval,
    ChainedStep,
    create_train_state,
)
from deep_sfm_revisited_tpu.utils.retry import run_with_backend_retry

RECIPE = {
    "pose.num_hypotheses": 512,
    "pose.ransac_iter": 5,
    "pose.num_correspondences": 1024,
    "pose.polish_iters": 5,
}


def synth_batches(n, b, h, w, seed=0, with_raw_hw=False):
    """n DISTINCT collated host batches at the given shape."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ref = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
        batch = {
            "ref": ref,
            "target": np.roll(ref, 3, axis=2),
            "intrinsics": np.broadcast_to(
                np.asarray([[718.856, 0, w / 2], [0, 718.856, h / 2],
                            [0, 0, 1]], np.float32), (b, 3, 3)).copy(),
            "pose_gt": np.broadcast_to(
                np.concatenate([np.eye(3, dtype=np.float32),
                                np.asarray([[0.54], [0.0], [0.1]],
                                           np.float32)], axis=1),
                (b, 3, 4)).copy(),
            "depth_gt": (2.0 + 6.0 * rng.random((b, h, w))).astype(
                np.float32),
        }
        if with_raw_hw:
            batch["raw_hw"] = np.asarray([[370, 1224]] * b, np.int32)
        out.append(batch)
    return out


def time_train(n_steps=32, chain=4):
    cfg = SfMConfig.kitti(nlabel=128).override(**RECIPE)
    b, (h, w) = 1, cfg.data.train_size
    print(f"[train] recipe: b={b} {h}x{w} nlabel=128 chain={chain}",
          flush=True)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, h, w),
        steps_per_epoch=1000)
    step = ChainedStep(model, cfg)
    warm = synth_batches(chain, b, h, w, seed=1)
    t0 = time.perf_counter()
    state, _ = train_epoch(warm, state, step, 0, jax.random.PRNGKey(1),
                           chain=chain, print_freq=10**6)
    print(f"[train] warmup (compile) {time.perf_counter()-t0:.1f}s",
          flush=True)
    batches = synth_batches(n_steps, b, h, w, seed=2)
    t0 = time.perf_counter()
    state, avg_loss = train_epoch(batches, state, step, 1,
                                  jax.random.PRNGKey(2), chain=chain,
                                  print_freq=20)
    dt = time.perf_counter() - t0
    ms = 1000 * dt / n_steps
    print(f"[train] PRODUCT train_epoch: {ms:.1f} ms/step "
          f"({n_steps} steps, {dt:.2f}s, loss {avg_loss:.4f}) — "
          f"scan-protocol reference 201-206 ms/step", flush=True)
    return ms


def time_eval(n_pairs=32, chain=8):
    cfg = SfMConfig.kitti(nlabel=128).override(**RECIPE)
    b, h, w = 1, 384, 1280
    print(f"[eval] recipe: b={b} {h}x{w} nlabel=128 chain={chain}",
          flush=True)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, 128, 384),
        steps_per_epoch=1000)
    ev = ChainedEval(model, cfg)
    warm = synth_batches(chain, b, h, w, seed=1, with_raw_hw=True)
    t0 = time.perf_counter()
    validate(warm, state, ev, jax.random.PRNGKey(1), chain=chain)
    print(f"[eval] warmup (compile) {time.perf_counter()-t0:.1f}s",
          flush=True)
    batches = synth_batches(n_pairs, b, h, w, seed=2, with_raw_hw=True)
    t0 = time.perf_counter()
    res = validate(batches, state, ev, jax.random.PRNGKey(2), chain=chain)
    dt = time.perf_counter() - t0
    ms = 1000 * dt / n_pairs
    print(f"[eval] PRODUCT validate: {ms:.1f} ms/pair "
          f"({n_pairs} pairs, {dt:.2f}s, abs_rel {res['abs_rel']:.4f}) — "
          f"scan-protocol reference 155 ms/pair", flush=True)
    return ms


def _stack_device(batches):
    import numpy as np

    return {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0]}


def time_train_device_fed(n_steps=32, chain=4, print_freq=20):
    """The loop MACHINERY number: windows pre-staged on device, so the
    host->device transfer (PCIe on a real TPU host; the HTTP tunnel
    here — a platform artifact) is excluded. Replicates train_epoch's
    dispatch/read cadence exactly: one chained dispatch per window, one
    acc read per print window."""
    cfg = SfMConfig.kitti(nlabel=128).override(**RECIPE)
    b, (h, w) = 1, cfg.data.train_size
    print(f"[train-dev] b={b} {h}x{w} nlabel=128 chain={chain}",
          flush=True)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, h, w),
        steps_per_epoch=1000)
    step = ChainedStep(model, cfg)
    host = synth_batches(n_steps, b, h, w, seed=2)
    windows = [_stack_device(host[i:i + chain])
               for i in range(0, n_steps, chain)]
    one = {k: np.asarray(v[0]) for k, v in windows[0].items()}
    # round 4: the production loop always carries the per-step loss ring
    # (trace); time the same configuration
    acc = step.init_acc(state, one, trace=print_freq + 2 * chain)
    names = step.metric_names(state, one)
    key = jax.random.PRNGKey(1)
    # warmup: one window (compile) + one read
    key, ks = jax.random.split(key)
    state, acc = step(state, windows[0], ks, acc)
    _ = np.asarray(jax.device_get(acc))
    t0 = time.perf_counter()
    done = 0
    next_read = print_freq
    for wdw in windows:
        key, ks = jax.random.split(key)
        state, acc = step(state, wdw, ks, acc)
        done += chain
        if done >= next_read:
            _ = np.asarray(jax.device_get(acc))
            next_read += print_freq
    vals = np.asarray(jax.device_get(acc))
    dt = time.perf_counter() - t0
    ms = 1000 * dt / n_steps
    loss = vals[list(names).index("loss")] / (n_steps + chain)
    print(f"[train-dev] loop machinery: {ms:.1f} ms/step "
          f"({n_steps} steps, {dt:.2f}s, loss {loss:.3f}) — "
          f"scan-protocol reference 201-206 ms/step", flush=True)
    return ms


def time_eval_device_fed(n_pairs=32, chain=8, print_freq=20):
    cfg = SfMConfig.kitti(nlabel=128).override(**RECIPE)
    b, h, w = 1, 384, 1280
    print(f"[eval-dev] b={b} {h}x{w} nlabel=128 chain={chain}",
          flush=True)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(b, 128, 384),
        steps_per_epoch=1000)
    ev = ChainedEval(model, cfg)
    host = synth_batches(n_pairs, b, h, w, seed=2, with_raw_hw=True)
    windows = [_stack_device(host[i:i + chain])
               for i in range(0, n_pairs, chain)]
    one = {k: np.asarray(v[0]) for k, v in windows[0].items()}
    sums, count = ev.init_acc(state, one)
    names = ev.metric_names(state, one)
    key = jax.random.PRNGKey(1)
    key, ks = jax.random.split(key)
    sums, count = ev(state, windows[0], ks, sums, count)
    _ = np.asarray(jax.device_get(sums))
    t0 = time.perf_counter()
    done = 0
    next_read = print_freq
    for wdw in windows:
        key, ks = jax.random.split(key)
        sums, count = ev(state, wdw, ks, sums, count)
        done += chain
        if done >= next_read:
            _ = np.asarray(jax.device_get(sums))
            next_read += print_freq
    vals = np.asarray(jax.device_get(sums))
    c = float(count)
    dt = time.perf_counter() - t0
    ms = 1000 * dt / n_pairs
    ar = vals[list(names).index("abs_rel")] / c
    print(f"[eval-dev] loop machinery: {ms:.1f} ms/pair "
          f"({n_pairs} pairs, {dt:.2f}s, abs_rel {ar:.4f}) — "
          f"scan-protocol reference 155 ms/pair", flush=True)
    return ms


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    print("backend:", jax.default_backend(), flush=True)
    if what in ("eval", "both"):
        run_with_backend_retry(lambda: time_eval(), label="eval-timing")
    if what in ("train", "both"):
        run_with_backend_retry(lambda: time_train(), label="train-timing")
    if what in ("eval-dev", "dev"):
        run_with_backend_retry(lambda: time_eval_device_fed(),
                               label="eval-dev-timing")
    if what in ("train-dev", "dev"):
        run_with_backend_retry(lambda: time_train_device_fed(),
                               label="train-dev-timing")
