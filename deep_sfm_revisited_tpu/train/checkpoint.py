"""Checkpointing with partial (sub-tree) restore.

Rebuild of `save_checkpoint` (`main.py:772-775`: per-epoch
checkpoint{epoch} + model_best copy) and the reference's strict=False
partial state loading with key-rewrite shims for flow-only / depth-only
checkpoints (`main.py:200-242`). Orbax handles the pytree serialization;
partial restore merges a stored sub-tree (e.g. only `flow_net`) into an
existing params tree — the TPU equivalent of `load_state_dict(...,
strict=False)`.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(
    directory: str,
    state: Any,
    epoch: int,
    is_best: bool = False,
) -> None:
    """Write {params, batch_stats, opt_state, step} for an epoch; mirror
    to `model_best/` when best (≙ main.py:772-775)."""
    mgr = _mgr(directory)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    if jax.process_count() > 1:
        # commit barrier: orbax finalizes (tmp-dir rename) on process 0;
        # without this a peer can reach a restore before the rename lands
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"dsfm_ckpt_commit_{epoch}")
    if is_best:
        if jax.process_index() == 0:
            best = os.path.join(directory, "model_best")
            src = os.path.join(directory, str(epoch))
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(src, best)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"dsfm_ckpt_best_{epoch}")


def restore_checkpoint(
    directory: str,
    state: Any,
    epoch: Optional[int] = None,
) -> Any:
    """Restore a full TrainState (latest epoch by default)."""
    mgr = _mgr(directory)
    epoch = epoch if epoch is not None else mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(target))
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def restore_params(directory: str, epoch: Optional[int] = None) -> dict:
    """Restore only {params, batch_stats} (no optimizer state) — for
    inference-time loading where no TrainState exists."""
    mgr = _mgr(directory)
    epoch = epoch if epoch is not None else mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore())
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def restore_subtree(
    directory: str,
    state: Any,
    subtree: str,
    epoch: Optional[int] = None,
) -> Any:
    """Merge one stored params sub-tree (e.g. 'flow_net' or 'depth_net')
    into `state`, leaving everything else untouched — the partial-load
    path of `--pretrained-flow` / `--pretrained-depth`
    (≙ main.py:222-242, incl. its prefix-stripping shim).

    Accepts BOTH checkpoint layouts: a full SfM composite checkpoint
    (params contain the named subtree) and a standalone net checkpoint
    written by the flow-pretraining driver (params ARE the subtree) — the
    analog of the reference's `flow_estimator.`-prefix-strip shim
    (main.py:226-233)."""
    mgr = _mgr(directory)
    epoch = epoch if epoch is not None else mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    # raw (target-free) restore: the stored tree may be a standalone net
    # whose structure differs from the composite state
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore())
    rp = restored["params"]
    rs = restored.get("batch_stats", {}) or {}
    if subtree in rp:
        sub_params, sub_stats = rp[subtree], rs.get(subtree)
    else:
        sub_params, sub_stats = rp, (rs if rs else None)

    import jax.numpy as jnp

    def _like(stored, current):
        return jax.tree_util.tree_map(
            lambda s, c: jnp.asarray(s, dtype=c.dtype), stored, current
        )

    params = dict(state.params)
    params[subtree] = _like(sub_params, state.params[subtree])
    stats = dict(state.batch_stats)
    if sub_stats is not None and subtree in state.batch_stats:
        stats[subtree] = _like(sub_stats, state.batch_stats[subtree])
    return state.replace(params=type(state.params)(params),
                         batch_stats=type(state.batch_stats)(stats))
