"""Device-mesh + sharding helpers (SURVEY.md §2.7).

The reference's only parallelism is single-process `torch.nn.DataParallel`
(`main.py:219`); its `DISTRIBUTED` flag is dead (`lib/config.py:322`).
The TPU-native design scales through a 2-D `jax.sharding.Mesh`:

  * `data` axis — frame pairs (DP): batch inputs sharded, gradients
    reduced by the psum XLA inserts for the replicated-param jit;
  * `model` axis — the long inner axes the reference serializes on one
    GPU: RANSAC hypotheses (512 CUDA threads -> sharded candidate axis,
    global argmax over chips) and plane-sweep depth planes (the cost
    volume's D axis; XLA partitions the 3D convolutions with halo
    exchange).

Everything rides XLA collectives over ICI; no NCCL/MPI translation.
"""

from deep_sfm_revisited_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    hyp_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
