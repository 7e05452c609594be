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

from . import config
from .config import DEFAULT, PipelineConfig, SensorConfig

__version__ = "0.1.0"
__all__ = ["config", "DEFAULT", "PipelineConfig", "SensorConfig"]
