"""Pose fusion — TransformFusion rebuilt.

Reference behavior: ``src/transformFusion.cpp`` (254 LoC): on every 10 Hz
odometry pose, compose it with the latest (before-mapping -> after-mapping)
correction and publish the high-rate fused pose.  The reference spends ~90 of
those lines on the closed-form Euler composition ``transformAssociateToMap``
(transformFusion.cpp:94-179); with rotation matrices the whole node is the
one-liner below.
"""

from __future__ import annotations

import jax

from ..ops import se3
from ..ops.se3 import Pose


@jax.jit
def fuse(odom_pose: Pose, t_bef: Pose, t_aft: Pose) -> Pose:
    """Fused pose at odometry rate with mapping accuracy:
    ``T_aft ∘ T_bef⁻¹ ∘ T_odom`` (transformFusion.cpp:181-216)."""
    return se3.project_through_correction(odom_pose, t_bef, t_aft)
