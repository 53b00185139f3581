"""Visualization + logging utilities (reference layer L0)."""

from deep_sfm_revisited_tpu.utils.viz import (  # noqa: F401
    depth_to_colormap,
    flow_to_rgb,
    flow_to_rgb_raw,
)
from deep_sfm_revisited_tpu.utils.logging import (  # noqa: F401
    AverageMeter,
    MetricLogger,
    create_logger,
)
