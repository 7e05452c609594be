"""Block-mode odometry must produce results identical to per-scan streaming
(same math, different program packing — pipeline.odometry_scan_block)."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import odometry as odom, pipeline
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


def test_block_matches_streaming():
    scene = synthetic.default_scene()
    n = 6
    poses = synthetic.circle_trajectory(n, radius=20.0, angular_rate=0.0075)
    scans = []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[min(k + 1, n - 1)], poses.t[min(k + 1, n - 1)])
        scans.append(synthetic.raycast_scan(
            scene, pk, DEFAULT.sensor, next_pose=nxt, motion=k + 1 < n))

    # Streaming.
    st1 = odom.init_state(DEFAULT.odom, DEFAULT.feat)
    stream_poses = []
    for s in scans:
        st1, out = pipeline.odometry_scan_step(st1, *s, DEFAULT)
        stream_poses.append(np.asarray(out.pose.t))

    # One block of 6.
    st2 = odom.init_state(DEFAULT.odom, DEFAULT.feat)
    block = tuple(jnp.stack([scans[i][j] for i in range(n)]) for j in range(3))
    st2, outs = pipeline.odometry_scan_block(st2, *block, DEFAULT)
    block_poses = np.asarray(outs.pose.t)

    # Same math; XLA may reassociate float ops across the two compile
    # boundaries (elementwise rotation expansion fuses differently).
    np.testing.assert_allclose(block_poses, np.stack(stream_poses), atol=5e-5)
    np.testing.assert_allclose(np.asarray(st2.xi), np.asarray(st1.xi),
                               atol=5e-5)
