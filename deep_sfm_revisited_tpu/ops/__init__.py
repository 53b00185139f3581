"""Geometry + essential-matrix ops (reference layers L1-L2, SURVEY.md §1)."""

from deep_sfm_revisited_tpu.ops.rotations import (  # noqa: F401
    angle_to_matrix,
    matrix_to_angle,
    exp_so3,
    quat_to_matrix,
    matrix_to_quat,
    pose_vec2mat,
    pose_to_rt,
    rt_to_pose,
    invert_pose,
    compose_pose,
)
from deep_sfm_revisited_tpu.ops.camera import (  # noqa: F401
    pixel_grid,
    pixel2cam,
    cam2pixel,
    inverse_warp,
    pose2flow,
    bilinear_sample,
)
from deep_sfm_revisited_tpu.ops.flow_ops import (  # noqa: F401
    flow2coord,
    coord2flow,
    flow2depth,
    sample_correspondences,
)
from deep_sfm_revisited_tpu.ops.essential import (  # noqa: F401
    five_point_candidates,
    six_point_candidate,
    decompose_essential,
    essential_from_rt,
    sampson_error,
    ransac_pose,
    polish_essential,
)
