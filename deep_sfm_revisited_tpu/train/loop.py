"""Host-side training / evaluation loops.

Rebuild of the reference driver (`main()` `main.py:122`, `train_epoch`
`main.py:295`, `validate` `main.py:460`): epoch loops around the jitted
step functions of train/trainer.py, with device-mesh batch placement,
random photometric noise injection (`main.py:315-317`), per-epoch Orbax
checkpoints with best-tracking (`main.py:287-288`), JSONL metric logging
(≙ TensorBoard scalars `main.py:390-450`), and the Eigen-protocol
aggregate report (`main.py:630`).
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
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from deep_sfm_revisited_tpu.utils.logging import AverageMeter, MetricLogger


def _to_device(batch: Dict[str, np.ndarray], mesh=None):
    keep = {k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype.kind in "biufc"}
    if mesh is not None:
        if jax.process_count() > 1:
            # multi-host: each process holds its loader shard; assemble
            # mesh-global arrays (device_put can't address remote chips)
            from deep_sfm_revisited_tpu.parallel.multihost import (
                global_batch,
            )

            return global_batch(keep, mesh)
        return shard_batch(keep, mesh)
    return jax.tree_util.tree_map(jnp.asarray, keep)


def add_image_noise(batch, key, max_std=3.0 / 255):
    """Random gaussian photometric noise (≙ `main.py:315-317`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    std = jax.random.uniform(k1, (), jnp.float32, 0.0, max_std)
    out = dict(batch)
    for k, kk in (("ref", k2), ("target", k3)):
        out[k] = jnp.clip(
            batch[k] + std * jax.random.normal(kk, batch[k].shape, jnp.float32),
            -1.0, 1.0,
        )
    return out


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
):
    """One epoch (≙ `train_epoch`, main.py:295-450)."""
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


def validate(
    loader,
    state: TrainState,
    eval_fn,
    key: jax.Array,
    logger=None,
    mesh=None,
    print_freq: int = 20,
    cross_host: bool = False,
):
    """Eigen-protocol depth evaluation (≙ `validate`, main.py:460-631).

    With `cross_host=True` (multi-host eval: each process runs its
    loader shard), the final metrics are globally reduced over all
    processes — every host returns the same full-eval-set averages."""
    meters: Dict[str, AverageMeter] = {}
    for i, host_batch in enumerate(loader):
        key, k = jax.random.split(key)
        batch = _to_device(host_batch, mesh)
        metrics, _ = eval_fn(state, batch, k)
        n = host_batch["ref"].shape[0]
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
    mlog = MetricLogger(out, "train")

    rng = jax.random.PRNGKey(cfg.train.seed)
    shape = sample_shape or (
        cfg.train.batch_size, *cfg.data.train_size
    )
    model, state = create_train_state(
        cfg, rng, sample_shape=shape, steps_per_epoch=len(train_loader)
    )
    if restore_fn is not None:
        state = restore_fn(state)
    # a mesh is needed for model parallelism AND for any multi-host run
    # (global-batch assembly requires a global mesh even for pure DP)
    mesh = (make_mesh(cfg.mesh)
            if cfg.mesh.model_parallel > 1 or jax.process_count() > 1
            else None)
    step_fn = make_train_step(model, cfg)
    eval_fn = make_eval_step(model, cfg)

    best = np.inf
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    for epoch in range(start_epoch, cfg.train.epochs):
        key, k_ep, k_val = jax.random.split(key, 3)
        state, avg_loss = train_epoch(
            train_loader, state, step_fn, epoch, k_ep, logger, mlog, mesh,
            cfg.train.print_freq,
        )
        metric = avg_loss
        if val_loader is not None:
            results = validate(val_loader, state, eval_fn, k_val, logger,
                               mesh, cfg.train.print_freq,
                               cross_host=jax.process_count() > 1)
            metric = results["abs_rel"]
        is_best = metric < best
        best = min(metric, best)
        # ALL processes call save: orbax's CheckpointManager is itself a
        # collective in multiprocess mode (internal sync_global_devices on
        # directory creation/finalize) — a process-0-only call deadlocks
        # on mismatched barrier order. save_checkpoint adds the commit
        # barrier so no process races into a restore of this checkpoint.
        save_checkpoint(os.path.join(out, "ckpt"), state, epoch, is_best)
    return state
