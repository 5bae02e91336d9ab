from visualslam_tpu.geometry.camera import normalized, project, unproject  # noqa: F401
from visualslam_tpu.geometry.epipolar import (  # noqa: F401
    decompose_essential,
    eight_point,
    recover_pose,
    sampson_error,
    triangulate,
)
from visualslam_tpu.geometry.ransac import estimate_relative_pose, ransac_essential  # noqa: F401
from visualslam_tpu.geometry import se3  # noqa: F401
