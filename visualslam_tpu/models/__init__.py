from visualslam_tpu.models.types import Features, Keypoints, Matches  # noqa: F401
from visualslam_tpu.models.pyramid import ScaleSpace, build_pyramid, build_pyramid_jit  # noqa: F401
from visualslam_tpu.models.harris import detect_harris, detect_harris_jit  # noqa: F401
