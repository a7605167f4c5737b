"""dvo_tpu — TPU-native semi-dense direct visual odometry.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C++ implementation (KYabuuchi/direct-visual-odometry: semi-dense visual
odometry for a monocular camera, Engel/Sturm/Cremers ICCV 2013), re-designed
TPU-first:

- pure-functional pytrees instead of shared-mutable ``cv::Mat``;
- static shapes + validity masks instead of ``INVALID`` sentinel scalars;
- ``lax.scan`` Gauss-Newton iterations with convergence masking instead of
  wall-clock loop exits;
- MXU one-hot-matmul bilinear sampling and Pallas kernels for both hot
  loops (photometric GN normal equations; epipolar depth search fused with
  the Gaussian depth-filter update), each with an XLA twin — the default
  backend per operating point is chosen by measurement (bench_kernels.py);
- a ``jax.sharding.Mesh`` keyframe/tile-sharded mapping and windowed
  bundle-adjustment layer the reference never had.

Layout (mirrors SURVEY.md §2 component inventory):
  dvo_tpu.lie       — SE(3)/SO(3) (reference include/math/se3.hpp)
  dvo_tpu.config    — every constant of the reference as a typed dataclass
  dvo_tpu.ops       — image pyramid, gradients, sampling, warping, depth filter
  dvo_tpu.models    — frame pytrees, tracker, mapper, odometry, bundle adjust
  dvo_tpu.parallel  — device-mesh sharding of mapping / BA
  dvo_tpu.utils     — dataset loaders, trajectory IO, ATE evaluation, timing
  dvo_tpu.native    — C++ data-plane (PNG decode, undistort, prefetch loader)
"""

from dvo_tpu.config import DVOConfig, PyramidConfig, TrackerConfig, MapperConfig

__all__ = ["DVOConfig", "PyramidConfig", "TrackerConfig", "MapperConfig"]
__version__ = "0.1.0"
