"""legoloam_tpu — a TPU-native LiDAR SLAM engine with the capabilities of LeGO-LOAM.

A from-scratch rebuild of the LeGO-LOAM pipeline (Shan & Englot, IROS 2018;
reference C++ at /root/reference) as a library of pure jitted JAX functions over
dense fixed-shape arrays, designed for TPU:

  * ``ops/``      — per-scan kernels: projection, segmentation, de-skew, features,
                    voxel/NN search, batched LM linear algebra.
  * ``models/``   — the pipeline stages: two-step LM odometry, scan-to-map
                    optimization, pose graph + loop closure, pose fusion.
  * ``parallel/`` — mesh/sharding utilities and the distributed pose-graph solve.
  * ``utils/``    — synthetic worlds, dataset IO, trajectory metrics, profiling.

The reference's four ROS processes become jitted stages passing device arrays;
its PCL/OpenCV/gtsam dependencies are re-implemented from scratch on TPU
primitives (see SURVEY.md §2 for the component-by-component mapping).
"""

import jax as _jax

# Geometry demands true float32 matmuls.  On TPU the MXU's DEFAULT matmul
# precision truncates f32 operands to bfloat16 (8 significand bits): a single
# `transform_points` at 70 m world coordinates then carries ~0.1 m of
# quantization error (measured on v5e — vs ~1e-5 at f32), which smears every
# keyframe cloud, corrupts the scan-to-map feedback, and turns long
# trajectories into runaway drift (found via the ring-world divergence,
# tools/diag_map.py: CPU clean, TPU diverging).  The hot large matmuls (kNN
# distance passes, normal-equation assembly) already request
# Precision.HIGHEST explicitly; this sets the same default for every other
# dot/einsum in the library — they are small or bandwidth-bound, so the cost
# is nil.  Callers wanting bf16 for an op can still pass `precision=` there.
_jax.config.update("jax_default_matmul_precision", "high")

from . import config                                              # noqa: E402
from .config import DEFAULT, PipelineConfig, SensorConfig         # noqa: E402

__version__ = "0.1.0"
__all__ = ["config", "DEFAULT", "PipelineConfig", "SensorConfig"]
