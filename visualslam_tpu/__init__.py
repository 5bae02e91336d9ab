"""tpu-slam: a TPU-native visual SLAM / SfM engine in JAX/XLA/Pallas.

Built from scratch against the capability surface of the reference CPU
pipeline (JacobYoung115/VisualSLAM, see SURVEY.md): Gaussian scale-space
pyramids, Harris + DoG/SIFT keypoint detection, SIFT/ORB description,
descriptor matching, epipolar two-view reconstruction, sliding-window
bundle adjustment, and pose-graph optimization — with pjit/shard_map
distribution over TPU meshes.

Package layout (SURVEY.md §7 build plan):
  utils/     config tree, masked fixed-capacity sets, padding, profiling
  ops/       compute kernels (XLA + Pallas): blur, gradients, NMS, histograms,
             descriptor sampling, tiled distance matrices
  models/    pyramid builder + detector/descriptor frontends (Harris, SIFT, ORB)
  geometry/  SE(3), epipolar geometry, RANSAC, triangulation
  backend/   bundle adjustment (Schur/GN), pose-graph optimization
  parallel/  mesh/sharding helpers, distributed BA assembly
  slam/      tracking loop, keyframe policy, map state, checkpointing
  io/        dataset IO (KITTI-style), serialization, native bindings
"""

__version__ = "0.2.0"

# Persistent XLA compilation cache: TPU compiles in this environment go
# through a remote tunnel (~20-40 s per program); caching them on disk makes
# every process after the first start hot. No-op if the user already set one.
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    # TPU programs only: XLA:CPU caches AOT kernels whose machine-feature
    # strings don't round-trip (prefer-no-scatter pseudo-features), which
    # spams errors and risks SIGILL on reload — and CPU compiles are fast
    # anyway.
    if "cpu" != str(_jax.config.jax_platforms or "").split(",")[0]:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from visualslam_tpu.utils.config import (  # noqa: F401
    PyramidConfig,
    HarrisConfig,
    SiftConfig,
    OrbConfig,
    MatchConfig,
    RansacConfig,
    BAConfig,
    SlamConfig,
)
