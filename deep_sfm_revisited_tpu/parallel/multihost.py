"""Multi-host initialization and cross-host array assembly.

No reference counterpart (the reference is strictly single-process,
SURVEY.md §2.7); this is the TPU-native scale-out path: one python
process per host, `jax.distributed.initialize` over DCN, a global mesh
spanning every chip, per-host data loading (data/loader.py shard_id /
num_shards) assembled into global arrays with
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (env-driven on TPU pods; explicit args for
    manual setups). Safe to call single-host (no-op).

    MUST run before anything touches the XLA backend — in particular it
    must not itself call jax.devices()/process_count() first (that
    initializes the backend and jax.distributed.initialize then refuses;
    caught by tests/test_multihost.py)."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already joined a distributed job
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host / unmanaged environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def barrier(name: str) -> None:
    """Cross-process sync point (single-host: no-op).

    Used where one process runs a long single-host job (the CLI pose
    tools) while the others wait: an explicit named barrier parks them in
    a deliberate collective instead of the jax.distributed shutdown path,
    whose coordination-service heartbeat timeouts a long eval could
    outlive."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_shard_info() -> Dict[str, int]:
    """(shard_id, num_shards) for the data loader on this host."""
    return {
        "shard_id": jax.process_index(),
        "num_shards": jax.process_count(),
    }


def reduce_metric_sums(sums: Dict[str, float],
                       counts: Dict[str, float]) -> Dict[str, float]:
    """Global weighted averages from per-host (sum, count) meter pairs.

    Multi-host evaluation shards the eval set over processes
    (data/loader.py shard striding); each host's AverageMeters then hold
    only its shard. This all-gathers every host's (sum, count) vectors
    and returns the global metric averages, identical on all hosts.
    Single-process: plain local averages (no collective). The reference
    has no counterpart (single-process, `validate` main.py:460-631).
    """
    keys = sorted(sums)
    vec = np.asarray(
        [sums[k] for k in keys] + [counts[k] for k in keys], np.float64
    )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # gather as an (hi, lo) f32 float-pair so the full f64 meter sums
        # survive the collective without depending on jax_enable_x64
        # (a plain f32 pack would lose precision vs the single-host
        # AverageMeter path on large eval sets)
        hi = vec.astype(np.float32)
        lo = (vec - hi).astype(np.float32)
        g = np.asarray(
            multihost_utils.process_allgather(np.stack([hi, lo])),
            np.float64,
        )  # (P, 2, 2n)
        vec = (g[:, 0] + g[:, 1]).sum(axis=0)
    n = len(keys)
    return {
        k: float(vec[i] / max(vec[n + i], 1e-12))
        for i, k in enumerate(keys)
    }


def global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                 axis: int = 0):
    """Assemble per-host numpy batches into mesh-global jax.Arrays.

    The batch axis (`axis`; 1 for (chain, batch, ...) stacks fed to the
    chained train step) is sharded over the mesh's first axis; each host
    contributes its local slice (the standard
    make_array_from_process_local_data flow).
    """
    sharding = NamedSharding(
        mesh, P(*([None] * axis), mesh.axis_names[0])
    )
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }
