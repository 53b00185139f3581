"""Losses, metrics, training/eval loops (reference layers L0 + L7)."""

from deep_sfm_revisited_tpu.train.losses import (  # noqa: F401
    depth_training_loss,
    flow_epe,
    flow_sequence_loss,
    pose_regression_loss,
    smooth_l1,
)
from deep_sfm_revisited_tpu.train.metrics import (  # noqa: F401
    depth_metrics,
    eigen_crop_mask,
    median_scale_align,
    motion_errors,
)
