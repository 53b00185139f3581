"""Flow-estimator pretraining.

The reference *references* a flow-pretraining path (`cfg.TRAIN_FLOW`
gating SFMnet to flow-only forward, `models/SFMnet.py:98-100`, driven by
a `flow_training.train_flow` module that is absent from the repo —
SURVEY.md §2.8). This module is that path, built for real: supervised
flow training over the standard benchmark mix (data/flow_datasets.py)
with the RAFT sequence loss or DICL multiscale loss, plus optional
unsupervised photometric terms (train/losses.py).

The trained flow params drop into the SfM composite via
`train/checkpoint.py::restore_subtree(..., 'flow_net')` — the
`--pretrained-flow` flow of the reference (`main.py:222-233`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core

from deep_sfm_revisited_tpu.config import FlowConfig
from deep_sfm_revisited_tpu.train.losses import (
    flow_epe,
    flow_sequence_loss,
    multiscale_flow_loss,
)
from deep_sfm_revisited_tpu.train.trainer import TrainState

# per-level weights of the DICL multiscale loss (cfgs/kitti.yml
# MultiScale_W) in the REFERENCE'S order: fine -> coarse, (refined, raw)
# per level — the reference training return is
# (flow2, raw_flow2, ..., flow6, raw_flow6) (DICL_shallow.py:660-663).
# Our all_iters stack is coarse -> fine with (raw, refined) per level
# ("best prediction last", shared with RAFT), i.e. the exact REVERSE:
# slice to the stack length first, then reverse.
DICL_LEVEL_WEIGHTS = (1.0, 0.8, 0.75, 0.6, 0.5, 0.4, 0.5, 0.4, 0.5, 0.4)
# per-level |gt| gates (cfgs/kitti.yml VALID_RANGE + USE_VALID_RANGE=True,
# lib/config.py:335), same reference ordering: 372 px gates the finest
# level (cumulative CTF capacity 12+24+48+96+192), 192 px the coarsest
# (stride-64 search range 3). Pixels beyond a level's range are zeroed
# (but still counted) in that level's mean.
DICL_VALID_RANGE = ((372, 372), (372, 372), (360, 360), (360, 360),
                    (336, 336), (336, 336), (288, 288), (288, 288),
                    (192, 192), (192, 192))


def build_flow_model(cfg: FlowConfig, dtype=jnp.bfloat16):
    if cfg.estimator == "RAFT":
        from deep_sfm_revisited_tpu.models.raft import RAFT

        return RAFT(cfg, dtype=dtype)
    if cfg.estimator == "DICL":
        from deep_sfm_revisited_tpu.models.dicl import DICLFlow

        return DICLFlow(cfg, dtype=dtype)
    if cfg.estimator == "PWC":
        from deep_sfm_revisited_tpu.models.pwcnet import PWCDCNet

        return PWCDCNet(cfg, dtype=dtype)
    raise NotImplementedError(cfg.estimator)


def create_flow_state(
    cfg: FlowConfig,
    rng: jax.Array,
    sample_shape: Tuple[int, int, int],
    lr: float = 4e-4,
    total_steps: int = 100_000,
    weight_decay: float = 1e-5,
    dtype=jnp.bfloat16,
):
    """Model + AdamW with the RAFT one-cycle schedule."""
    model = build_flow_model(cfg, dtype)
    b, h, w = sample_shape
    dummy = jnp.zeros((b, h, w, 6), jnp.float32)
    variables = jax.jit(lambda d: model.init(rng, d))(dummy)
    sched = optax.linear_onecycle_schedule(total_steps, lr, pct_start=0.05)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        opt_state=tx.init(params),
        tx=tx,
    )
    return model, state


def make_flow_train_step(model, cfg: FlowConfig, gamma: float = 0.8):
    """One supervised flow step on batch dict(ref, target, flow_gt,
    flow_valid)."""

    def loss_fn(params, batch_stats, batch):
        pair = jnp.concatenate([batch["ref"], batch["target"]], axis=-1)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pair, train=True, all_iters=True, mutable=["batch_stats"],
        )
        preds = out[0]
        valid = batch.get("flow_valid")
        if cfg.estimator == "DICL":
            L = preds.shape[0]
            loss = multiscale_flow_loss(
                list(preds), batch["flow_gt"],
                DICL_LEVEL_WEIGHTS[:L][::-1], valid,
                valid_range=DICL_VALID_RANGE[:L][::-1],
            )
        else:
            loss = flow_sequence_loss(preds, batch["flow_gt"], valid,
                                      gamma=gamma)
        epe = flow_epe(preds[-1], batch["flow_gt"], valid)
        return loss, (epe, mutated["batch_stats"])

    @jax.jit
    def step(state: TrainState, batch):
        (loss, (epe, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return state, {"loss": loss, "epe": epe}

    return step


FLOW_METRIC_NAMES = ("epe", "loss")


def make_flow_train_step_acc(model, cfg: FlowConfig, gamma: float = 0.8):
    """Accumulating variant used by flow_fit: metrics sum into a device
    vector (FLOW_METRIC_NAMES order) instead of per-step host reads —
    the same channel-cost fix as ChainedStep (train/trainer.py), kept
    single-step because flow pretraining is not the flagship path."""
    base = make_flow_train_step(model, cfg, gamma)

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(state: TrainState, batch, acc):
        state, metrics = base(state, batch)
        vec = jnp.stack([metrics[k].astype(jnp.float32)
                         for k in FLOW_METRIC_NAMES])
        return state, acc + vec

    return step


def flow_fit(
    cfg: FlowConfig,
    train_loader,
    out_dir: str,
    sample_shape: Tuple[int, int, int],
    val_dataset=None,
    lr: float = 4e-4,
    epochs: int = 1,
    seed: int = 0,
    dtype=jnp.bfloat16,
    eval_pad_multiple: int = 64,
    eval_max_items: int | None = None,
    print_freq: int = 20,
):
    """Flow-pretraining driver: the runnable version of the reference's
    MISSING `flow_training.train_flow` module (`main.py:251` imports it
    lazily; the file does not exist — SURVEY.md §2.8). Epoch loop over a
    BatchLoader of flow samples (data/flow_datasets.py), per-epoch Orbax
    checkpoints with best-EPE tracking, optional EPE/F1 validation
    (train/flow_eval.py). The resulting checkpoint drops into the SfM
    composite via the CLI's --pretrained-flow subtree restore.
    """
    import os

    import numpy as np

    from deep_sfm_revisited_tpu.train.checkpoint import save_checkpoint
    from deep_sfm_revisited_tpu.utils.logging import (
        AverageMeter,
        MetricLogger,
        create_logger,
    )

    os.makedirs(out_dir, exist_ok=True)
    logger = create_logger(out_dir, "flow")
    mlog = MetricLogger(out_dir, "flow_train")

    steps_total = max(len(train_loader) * epochs, 1)
    model, state = create_flow_state(
        cfg, jax.random.PRNGKey(seed), sample_shape, lr=lr,
        total_steps=steps_total, dtype=dtype,
    )
    step_fn = make_flow_train_step_acc(model, cfg)

    best = np.inf
    for epoch in range(epochs):
        losses = AverageMeter()
        nb = len(train_loader)
        # on-device metric accumulation: one vector read per print
        # window instead of one ~25 ms read per metric per step (the
        # same channel-cost fix the SfM loops got, train/loop.py)
        acc = jnp.zeros((len(FLOW_METRIC_NAMES),), jnp.float32)
        prev = np.zeros(len(FLOW_METRIC_NAMES))
        prev_steps = 0
        bsz = 1
        for i, host_batch in enumerate(train_loader):
            batch = {k: jnp.asarray(v) for k, v in host_batch.items()
                     if hasattr(v, "dtype") and v.dtype.kind in "biufc"}
            bsz = host_batch["ref"].shape[0]
            state, acc = step_fn(state, batch, acc)
            if (i + 1) % print_freq == 0 or i == nb - 1:
                vals = np.asarray(jax.device_get(acc), np.float64)
                dn = (i + 1) - prev_steps
                mean = {k: (vals[j] - prev[j]) / dn
                        for j, k in enumerate(FLOW_METRIC_NAMES)}
                losses.update(mean["loss"], n=dn * bsz)
                mlog.scalars(mean, epoch * nb + i + 1)
                prev, prev_steps = vals, i + 1
        metric = losses.avg
        if val_dataset is not None:
            from deep_sfm_revisited_tpu.train.flow_eval import (
                evaluate_flow_dataset,
            )

            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            @jax.jit
            def fwd(pair):
                flow, _ = model.apply(variables, pair, train=False)
                return flow

            res = evaluate_flow_dataset(
                fwd, val_dataset, pad_multiple=eval_pad_multiple,
                max_items=eval_max_items,
            )
            logger.info(f"epoch {epoch}: loss {losses.avg:.4f} "
                        f"epe {res['epe']:.4f} f1 {res['f1_all']:.2f}")
            metric = res["epe"]
        else:
            logger.info(f"epoch {epoch}: loss {losses.avg:.4f}")
        is_best = metric < best
        best = min(metric, best)
        save_checkpoint(os.path.join(out_dir, "ckpt"), state, epoch,
                        is_best)
    return model, state
