"""IMU-enabled pipeline tests: de-skew + seeded initial guess + attitude blend
(the full featureAssociation IMU path, SURVEY.md §2.2)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import pipeline
from legoloam_tpu.ops import deskew, se3
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import metrics, synthetic

CFG = DEFAULT.replace(mapping=dataclasses.replace(
    DEFAULT.mapping, max_keyframes=64, submap_corner_cap=4096,
    submap_surf_cap=8192, scan_corner_cap=1024, scan_surf_cap=4096))


def test_make_imu_consistent_with_deskew_integration():
    """integrate_imu(make_imu(traj)) must reproduce the trajectory's velocity
    and attitude (the two modules are inverses)."""
    n = 10
    poses = synthetic.circle_trajectory(n, radius=15.0, angular_rate=0.01)
    ts, rpy, acc, gyro = synthetic.make_imu(poses, scan_period=0.1)
    w = deskew.ImuWindow(time=ts, rpy=rpy, acc=acc, gyro=gyro,
                         valid=jnp.ones(ts.shape[0], bool))
    integ = deskew.integrate_imu(w)
    # Acceleration integration recovers the velocity CHANGE only (the sensor
    # starts already moving and integration starts from rest — the reference
    # has the identical limitation, featureAssociation.cpp:392-429).  On the
    # circle, |v(t) - v(0)| = 2 v sin(theta/2).
    mid = ts.shape[0] // 2
    v = 15.0 * 0.01 / 0.1
    theta_mid = 0.01 * (n - 1) / 2
    expected_dv = 2 * v * np.sin(theta_mid / 2)
    got_dv = float(jnp.linalg.norm(integ.velo[mid]))
    assert abs(got_dv - expected_dv) < 0.5 * expected_dv + 0.05
    # Attitude yaw advances with the trajectory.
    yaw_end = float(integ.rpy[-1, 2])
    assert abs(yaw_end - 0.01 * (n - 1)) < 0.02


def test_slam_with_imu_runs_and_is_accurate():
    scene = synthetic.default_scene()
    n = 12
    poses = synthetic.circle_trajectory(n, radius=18.0, angular_rate=0.009)
    ts, rpy, acc, gyro = synthetic.make_imu(poses, scan_period=0.1)
    w = deskew.ImuWindow(time=ts, rpy=rpy, acc=acc, gyro=gyro,
                         valid=jnp.ones(ts.shape[0], bool))
    integ = deskew.integrate_imu(w)

    scans = []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[min(k + 1, n - 1)], poses.t[min(k + 1, n - 1)])
        scans.append(synthetic.raycast_scan(scene, pk, CFG.sensor,
                                            next_pose=nxt, motion=k + 1 < n))

    state = pipeline.init_slam_state(CFG)
    fused = []
    for k, s in enumerate(scans):
        state, out = pipeline.slam_scan_step(
            state, *s, CFG, k * 0.1,
            run_mapping=(k % CFG.mapping_every == 0),
            imu_integral=integ)
        fused.append(np.asarray(out.fused_pose.t))
    fused = np.array(fused)
    assert np.all(np.isfinite(fused))
    gt = np.asarray(poses.t)[1:]
    ate = float(metrics.ate_rmse(jnp.asarray(fused[:-1]), jnp.asarray(gt)))
    assert ate < 0.2, f"IMU-enabled pipeline ATE {ate:.3f}"


def test_imu_xi_seed_matches_motion():
    """The IMU-derived initial guess must approximate the true scan twist."""
    n = 6
    poses = synthetic.circle_trajectory(n, radius=15.0, angular_rate=0.012)
    ts, rpy, acc, gyro = synthetic.make_imu(poses, scan_period=0.1)
    w = deskew.ImuWindow(time=ts, rpy=rpy, acc=acc, gyro=gyro,
                         valid=jnp.ones(ts.shape[0], bool))
    integ = deskew.integrate_imu(w)
    dsk = deskew.deskew_image(
        jnp.zeros((16, 1800, 3)), jnp.zeros((16, 1800)),
        jnp.zeros((16, 1800), bool), jnp.float32(0.2), integ)
    seed = pipeline.imu_xi_seed(dsk, 0.1)
    gt = se3.se3_log(se3.relative(Pose(poses.R[2], poses.t[2]),
                                  Pose(poses.R[3], poses.t[3])))
    # The ROTATION seed comes from the gyro and must match the true motion;
    # the translation seed is velocity-from-rest (deviation only — see above)
    # so it is NOT compared against absolute motion.
    np.testing.assert_allclose(np.asarray(seed[:3]), np.asarray(gt[:3]),
                               atol=0.02)
