"""KITTI data pipelines (reference layer L5, SURVEY.md §2.2).

Host-side numpy: datasets index frame pairs and decode/augment on CPU
worker threads; batches cross to device once per step as one pinned
transfer (the reference uses torch DataLoader workers, `main.py:186-189`).
"""

from deep_sfm_revisited_tpu.data.kitti import (  # noqa: F401
    KittiRawDataset,
    KittiVODataset,
    compute_delta_rt,
    load_calib_intrinsics,
    load_vo_poses,
)
from deep_sfm_revisited_tpu.data.transforms import (  # noqa: F401
    Compose,
    Normalize,
    RandomCrop,
    CenterCrop,
    RandomZoom,
)
from deep_sfm_revisited_tpu.data.loader import BatchLoader  # noqa: F401
