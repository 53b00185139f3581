"""deep_sfm_revisited_tpu — a TPU-native two-view Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jytime/Deep-SfM-Revisited (CVPR 2021): dense optical-flow matching,
batched five-point RANSAC essential-matrix pose estimation (replacing the
reference's CUDA extension `RANSAC_FiveP/` with vmapped fixed-shape JAX),
and plane-sweep stereo depth, composed into an end-to-end pipeline that
trains/evaluates on KITTI depth + odometry and shards over TPU meshes.

Layering mirrors SURVEY.md §1:
  ops/       L1+L2: geometry, the essential-matrix engine, warping, correlation
  models/    L3+L4: flow / depth / pose networks and the SfM composite
  data/      L5:    KITTI pipelines and paired transforms
  train/     L0+L7: losses, metrics, the training/eval loops
  parallel/  mesh + sharding helpers (no reference counterpart; DataParallel only)
  utils/     visualization, logging
"""

import jax

# The five-point essential-matrix solver requires float64 (the reference
# forces .double() before entering its CUDA kernels, models/SFMnet.py:265-270,
# epipolar_utils.py:73). We enable x64 globally and keep every network in
# explicit float32/bfloat16; weak typing keeps python scalars from promoting.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
