"""Mesh construction + sharding specs."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_sfm_revisited_tpu.config import MeshConfig


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build the (data, model) mesh.

    data_parallel == -1 takes every device not claimed by model_parallel.
    Works for the 1-chip bench, the 8-device CPU test mesh, and multi-host
    slices (jax.devices() is global after jax.distributed.initialize).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(cfg.model_parallel, 1)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}"
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Batch sharding over the data axis. `axis` selects which array
    dimension is the batch (axis=1 for (chain, batch, ...) stacks fed to
    the chained train step)."""
    return NamedSharding(mesh, P(*([None] * axis), mesh.axis_names[0]))


def hyp_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, hypothesis, ...) sharding: batch over data, hypotheses over
    model — the RANSAC candidate axis (ops.essential.ransac_pose)."""
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
