"""Host-side training / evaluation loops.

Rebuild of the reference driver (`main()` `main.py:122`, `train_epoch`
`main.py:295`, `validate` `main.py:460`): epoch loops around the jitted
step functions of train/trainer.py, with device-mesh batch placement,
random photometric noise injection (`main.py:315-317`), per-epoch Orbax
checkpoints with best-tracking (`main.py:287-288`), JSONL metric logging
(≙ TensorBoard scalars `main.py:390-450`), and the Eigen-protocol
aggregate report (`main.py:630`).

Production paths are CHAINED (ChainedStep / ChainedEval): K steps fuse
into one compiled program per dispatch, photometric noise runs inside
the program, and metrics accumulate ON DEVICE — the host reads one small
array per logging window instead of one ~25 ms device->host read per
metric leaf per step (the round-2 channel-overhead finding; see
PERF.md "Measurement methodology"). Plain single-step callables are
still accepted for tests and ad-hoc drivers.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.parallel.mesh import make_mesh, shard_batch
from deep_sfm_revisited_tpu.train.trainer import (
    ChainedEval,
    ChainedStep,
    TrainState,
    add_image_noise,
    create_train_state,
)
from deep_sfm_revisited_tpu.utils.logging import AverageMeter, MetricLogger

__all__ = [
    "add_image_noise", "train_epoch", "validate", "fit",
]


def _filter_arrays(batch: Dict[str, np.ndarray]):
    return {k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}


def _to_device(batch: Dict[str, np.ndarray], mesh=None, axis: int = 0):
    """Place a host batch (or a (chain, batch, ...) stack when axis=1)."""
    keep = _filter_arrays(batch)
    if mesh is not None:
        if jax.process_count() > 1:
            # multi-host: each process holds its loader shard; assemble
            # mesh-global arrays (device_put can't address remote chips)
            from deep_sfm_revisited_tpu.parallel.multihost import (
                global_batch,
            )

            return global_batch(keep, mesh, axis=axis)
        return shard_batch(keep, mesh, axis=axis)
    return jax.tree_util.tree_map(jnp.asarray, keep)


def _stack_window(buf):
    """Stack a window of collated host batches along a new chain axis."""
    keep = _filter_arrays(buf[0])
    return {k: np.stack([b[k] for b in buf]) for k in keep}


def _emit_images(metric_logger, prefix, host_batch, flow, depth, step):
    """Write the reference's TensorBoard image panes (input, flow RGB,
    pred/GT depth colormaps ≙ main.py:429-447) — host-side conversions,
    off the step path."""
    from deep_sfm_revisited_tpu.utils.viz import (
        depth_to_colormap,
        flow_to_rgb,
    )

    ref = np.asarray(host_batch["ref"][0], np.float32)
    img = ((np.clip(ref, -1.0, 1.0) * 0.5 + 0.5) * 255).astype(np.uint8)
    metric_logger.image(f"{prefix}/input", img, step)
    metric_logger.image(f"{prefix}/flow",
                        flow_to_rgb(np.asarray(flow[0], np.float32)), step)
    metric_logger.image(
        f"{prefix}/depth_pred",
        depth_to_colormap(np.asarray(depth[0], np.float32)), step)
    if "depth_gt" in host_batch:
        metric_logger.image(
            f"{prefix}/depth_gt",
            depth_to_colormap(np.asarray(host_batch["depth_gt"][0],
                                         np.float32)), step)


def train_epoch(
    loader,
    state: TrainState,
    step_fn,
    epoch: int,
    key: jax.Array,
    logger=None,
    metric_logger: Optional[MetricLogger] = None,
    mesh=None,
    print_freq: int = 20,
    chain: int = 1,
):
    """One epoch (≙ `train_epoch`, main.py:295-450).

    `step_fn` is a ChainedStep (production: K fused steps per dispatch,
    on-device metric sums) or a plain jitted single-step callable
    (legacy/tests: per-step host reads)."""
    if isinstance(step_fn, ChainedStep):
        return _train_epoch_chained(
            loader, state, step_fn, epoch, key, logger, metric_logger,
            mesh, print_freq, max(chain, 1),
        )
    losses = AverageMeter()
    batch_time = AverageMeter()
    data_time = AverageMeter()
    end = time.time()
    for i, host_batch in enumerate(loader):
        data_time.update(time.time() - end)
        key, k_noise, k_step = jax.random.split(key, 3)
        batch = _to_device(host_batch, mesh)
        batch = add_image_noise(batch, k_noise)
        state, metrics = step_fn(state, batch, k_step)
        loss = float(metrics["loss"])
        losses.update(loss, n=host_batch["ref"].shape[0])
        batch_time.update(time.time() - end)
        end = time.time()
        step = int(state.step)
        if metric_logger is not None:
            metric_logger.scalars(
                {k: float(v) for k, v in metrics.items()}, step
            )
        if logger is not None and i % print_freq == 0:
            logger.info(
                f"Epoch: [{epoch}][{i}/{len(loader)}]\t"
                f"Time {batch_time}\t Data {data_time}\t Loss {losses}"
            )
    return state, losses.avg


def _train_epoch_chained(
    loader, state, step, epoch, key, logger, metric_logger, mesh,
    print_freq, chain,
):
    nb = len(loader)
    losses = AverageMeter()
    step_time = AverageMeter()
    names = None
    acc = None
    n_names = 0
    # per-step loss ring capacity: the largest possible logging window
    # (boundary logic below) plus one chain of slack
    trace_cap = max(print_freq, chain) + 2 * chain
    buf = []
    done = 0            # steps dispatched so far this epoch
    prev_read = None    # (steps, cumulative sums) at the last read
    last_host = None    # most recent host batch (for image panes)
    img_done = 0        # image_freq periods already emitted
    window_t0 = time.time()

    def read_and_log(force=False):
        nonlocal prev_read, window_t0
        # ONE device->host read of the fused metric vector (sums + the
        # per-step loss ring + cursor)
        vals = np.asarray(jax.device_get(acc), np.float64)
        p_steps, p_vals = prev_read
        dn = done - p_steps
        if dn <= 0:
            return
        mean = {k: (vals[j] - p_vals[j]) / dn
                for j, k in enumerate(names)}
        dt = (time.time() - window_t0) / dn
        step_time.update(dt, n=dn)
        losses.update(mean["loss"], n=dn)
        gstep = epoch * nb + done
        if metric_logger is not None:
            # window means at the window-end step, PLUS each step's own
            # loss from the on-device ring (round-3 weak #4: a loss
            # spike inside a window must stay visible)
            metric_logger.scalars(mean, gstep)
            m = min(dn, trace_cap)
            pos = int(round(vals[-1]))
            ring = vals[n_names:-1]
            idx = (pos - m + np.arange(m)) % trace_cap
            for j, lv in enumerate(ring[idx]):
                metric_logger.scalar("loss_step", lv, gstep - m + 1 + j)
            # image panes every image_freq steps (one extra inference
            # forward; single-host only — an unsharded ad-hoc program on
            # a multi-host mesh would desync the processes)
            nonlocal img_done
            if (step.image_freq > 0 and last_host is not None
                    and jax.process_count() == 1
                    and done // step.image_freq > img_done):
                img_done = done // step.image_freq
                key_img = jax.random.PRNGKey(gstep)
                one = {k: jnp.asarray(v) for k, v in last_host.items()}
                flow, depth = step.viz_outputs(state, one, key_img)
                _emit_images(metric_logger, "train", last_host, flow,
                             depth, gstep)
        if logger is not None:
            logger.info(
                f"Epoch: [{epoch}][{done}/{nb}]\t"
                f"Time/step {dt:.3f}s\t Loss {mean['loss']:.4f} "
                f"({losses.avg:.4f})"
            )
        prev_read = (done, vals)
        window_t0 = time.time()

    for i, host_batch in enumerate(loader):
        buf.append(host_batch)
        last_host = _filter_arrays(host_batch)
        if len(buf) < chain and i < nb - 1:
            continue
        stacked = _stack_window(buf)
        batches = _to_device(stacked, mesh, axis=1)
        if acc is None:
            one = {k: v[0] for k, v in stacked.items()}
            names = step.metric_names(state, one)
            n_names = len(names)
            acc = step.init_acc(state, one, trace=trace_cap)
            prev_read = (0, np.zeros(n_names))
        key, ks = jax.random.split(key)
        state, acc = step(state, batches, ks, acc)
        done += len(buf)
        buf = []
        boundary = (done % max(print_freq, chain)) < chain
        if done >= nb or (boundary and done >= chain):
            read_and_log()
    return state, losses.avg


def validate(
    loader,
    state: TrainState,
    eval_fn,
    key: jax.Array,
    logger=None,
    mesh=None,
    print_freq: int = 20,
    cross_host: bool = False,
    chain: int = 1,
    metric_logger: Optional[MetricLogger] = None,
):
    """Eigen-protocol depth evaluation (≙ `validate`, main.py:460-631).

    With `cross_host=True` (multi-host eval: each process runs its
    loader shard), the final metrics are globally reduced over all
    processes — every host returns the same full-eval-set averages.
    `eval_fn` is a ChainedEval (production) or a plain jitted
    (state, batch, key) -> (metrics, out) callable (legacy/tests)."""
    if isinstance(eval_fn, ChainedEval):
        return _validate_chained(
            loader, state, eval_fn, key, logger, mesh, print_freq,
            cross_host, max(chain, 1), metric_logger,
        )
    meters: Dict[str, AverageMeter] = {}
    for i, host_batch in enumerate(loader):
        key, k = jax.random.split(key)
        batch = _to_device(host_batch, mesh)
        metrics, _ = eval_fn(state, batch, k)
        n = (float(np.sum(host_batch["sample_valid"]))
             if "sample_valid" in host_batch
             else host_batch["ref"].shape[0])
        for name, v in metrics.items():
            meters.setdefault(name, AverageMeter()).update(float(v), n)
        if logger is not None and i % print_freq == 0:
            logger.info(
                f"Test: [{i}/{len(loader)}]\t"
                f"abs_rel {meters['abs_rel']}"
            )
    if cross_host:
        from deep_sfm_revisited_tpu.parallel.multihost import (
            reduce_metric_sums,
        )

        final = reduce_metric_sums(
            {k: m.sum for k, m in meters.items()},
            {k: m.count for k, m in meters.items()},
        )
    else:
        final = {k: m.avg for k, m in meters.items()}
    if logger is not None:
        logger.info(
            " ".join(f"{k} {v:.4f}" for k, v in sorted(final.items()))
        )
    return final


def _validate_chained(
    loader, state, ev, key, logger, mesh, print_freq, cross_host, chain,
    metric_logger=None,
):
    nb = len(loader)
    names = None
    sums = count = None
    buf = []
    done = 0
    next_print = 0
    img_done = 0

    def flush(key, sums, count, buf):
        stacked = _stack_window(buf)
        batches = _to_device(stacked, mesh, axis=1)
        key, k = jax.random.split(key)
        sums, count = ev(state, batches, k, sums, count)
        return key, sums, count

    def shapes_of(b):
        return tuple(sorted((k, v.shape) for k, v in
                            _filter_arrays(b).items()))

    for i, host_batch in enumerate(loader):
        # windows must be shape-uniform (one compiled program per
        # (window, shapes) combo); KITTI eval pads everything to one
        # shape, synthetic suites may not — flush on change
        if buf and shapes_of(host_batch) != shapes_of(buf[0]):
            if jax.process_count() > 1:
                # each dispatch is a GLOBAL collective program: hosts
                # whose loader shards hit shape changes at different
                # indices would dispatch different program sequences and
                # hang the collective. Fail loudly instead (ADVICE r3);
                # multi-host eval requires a shape-uniform (padded) set.
                raise RuntimeError(
                    "multi-host validate saw a batch-shape change "
                    f"(batch {i}): per-host flush schedules would "
                    "desync the collective. Pad the eval set to one "
                    "shape (data.pad_multiple) for multi-host runs."
                )
            key, sums, count = flush(key, sums, count, buf)
            done += len(buf)
            buf = []
        buf.append(host_batch)
        if names is None:
            one = _filter_arrays(host_batch)
            names = ev.metric_names(state, one)
            sums, count = ev.init_acc(state, one)
        if len(buf) == chain or i == nb - 1:
            key, sums, count = flush(key, sums, count, buf)
            done += len(buf)
            buf = []
        if logger is not None and done >= next_print and done > 0:
            v = np.asarray(jax.device_get(sums), np.float64)
            c = float(count)
            ia = names.index("abs_rel")
            logger.info(f"Test: [{done}/{nb}]\t abs_rel {v[ia] / c:.4f}")
            next_print = done + print_freq
        if (metric_logger is not None and ev.image_freq > 0
                and jax.process_count() == 1
                and done // ev.image_freq > img_done):
            # eval image panes (≙ the test-writer emits, main.py:600s):
            # one extra inference forward per image_freq pairs
            img_done = done // ev.image_freq
            hb = _filter_arrays(host_batch)
            one = {k: jnp.asarray(v_) for k, v_ in hb.items()}
            flow, depth = ev.viz_outputs(state, one,
                                         jax.random.PRNGKey(done))
            _emit_images(metric_logger, "test", hb, flow, depth, done)
    v = np.asarray(jax.device_get(sums), np.float64)
    c = float(count)
    if cross_host:
        from deep_sfm_revisited_tpu.parallel.multihost import (
            reduce_metric_sums,
        )

        final = reduce_metric_sums(
            {k: float(v[j]) for j, k in enumerate(names)},
            {k: c for k in names},
        )
    else:
        final = {k: float(v[j]) / max(c, 1e-12)
                 for j, k in enumerate(names)}
    if logger is not None:
        logger.info(
            " ".join(f"{k} {val:.4f}" for k, val in sorted(final.items()))
        )
    return final


def fit(
    cfg: SfMConfig,
    train_loader,
    val_loader=None,
    out_dir: str = "output",
    sample_shape=None,
    restore_fn=None,
    start_epoch: int = 0,
):
    """Full training run (≙ `main()`, main.py:122-291).

    `restore_fn(state) -> state` applies checkpoint / subtree / ported
    restores to the freshly-initialized state before training — the
    driver's --pretrained / --pretrained-flow / --pretrained-depth /
    --pretrained-torch wiring (≙ main.py:200-245). `start_epoch` resumes
    the epoch loop (and thus the milestone LR schedule position via the
    restored optimizer step) mid-run (≙ main.py:90-91,266).
    """
    import os

    from deep_sfm_revisited_tpu.train.checkpoint import save_checkpoint
    from deep_sfm_revisited_tpu.utils.logging import create_logger

    out = os.path.join(out_dir, cfg.tag)
    os.makedirs(out, exist_ok=True)
    logger = create_logger(out, cfg.tag)
    # effective-config dump at run start (≙ main.py:140-142 logging the
    # full merged cfg + save_config_to_file); the file round-trips via
    # config_from_yaml for exact run reproduction
    from deep_sfm_revisited_tpu.config import save_config

    if jax.process_index() == 0:
        cfg_text = save_config(cfg, os.path.join(out, "config.yaml"))
        logger.info("effective config:\n" + cfg_text)
    mlog = MetricLogger(out, "train")
    mlog_val = MetricLogger(out, "test") if val_loader is not None else None

    rng = jax.random.PRNGKey(cfg.train.seed)
    shape = sample_shape or (
        cfg.train.batch_size, *cfg.data.train_size
    )
    # a mesh is needed for model parallelism AND for any multi-host run
    # (global-batch assembly requires a global mesh even for pure DP);
    # built BEFORE the state so the long-axis shardings (RANSAC
    # hypotheses/points, plane-sweep D) wire into the model
    mesh = (make_mesh(cfg.mesh)
            if cfg.mesh.model_parallel > 1 or jax.process_count() > 1
            else None)
    model, state = create_train_state(
        cfg, rng, sample_shape=shape, steps_per_epoch=len(train_loader),
        mesh=mesh,
    )
    if restore_fn is not None:
        state = restore_fn(state)
    if mesh is not None and jax.process_count() == 1:
        # pin the replicated layout explicitly (multi-host keeps the
        # compiler-inferred replication; device_put across a global mesh
        # can't address remote chips)
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = ChainedStep(model, cfg)
    eval_fn = ChainedEval(model, cfg)

    best = np.inf
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    for epoch in range(start_epoch, cfg.train.epochs):
        key, k_ep, k_val = jax.random.split(key, 3)
        state, avg_loss = train_epoch(
            train_loader, state, step_fn, epoch, k_ep, logger, mlog, mesh,
            cfg.train.print_freq, chain=cfg.train.chain_steps,
        )
        metric = avg_loss
        if val_loader is not None:
            results = validate(val_loader, state, eval_fn, k_val, logger,
                               mesh, cfg.train.print_freq,
                               cross_host=jax.process_count() > 1,
                               chain=cfg.train.eval_chain_steps,
                               metric_logger=mlog_val)
            metric = results["abs_rel"]
            if mlog_val is not None:
                mlog_val.scalars(results, epoch)
        is_best = metric < best
        best = min(metric, best)
        # ALL processes call save: orbax's CheckpointManager is itself a
        # collective in multiprocess mode (internal sync_global_devices on
        # directory creation/finalize) — a process-0-only call deadlocks
        # on mismatched barrier order. save_checkpoint adds the commit
        # barrier so no process races into a restore of this checkpoint.
        save_checkpoint(os.path.join(out, "ckpt"), state, epoch, is_best)
    return state
