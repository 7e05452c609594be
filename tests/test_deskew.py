"""IMU integration and de-skew tests against closed-form motion."""

import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import VLP16
from legoloam_tpu.ops import deskew, projection, se3
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


def _window(times, rpy, acc, gyro):
    n = len(times)
    L = max(64, ((n + 63) // 64) * 64)
    pad = L - n
    return deskew.ImuWindow(
        time=jnp.pad(jnp.asarray(times, jnp.float32), (0, pad),
                     constant_values=times[-1] + 1e3),
        rpy=jnp.pad(jnp.asarray(rpy, jnp.float32), ((0, pad), (0, 0))),
        acc=jnp.pad(jnp.asarray(acc, jnp.float32), ((0, pad), (0, 0))),
        gyro=jnp.pad(jnp.asarray(gyro, jnp.float32), ((0, pad), (0, 0))),
        valid=jnp.arange(L) < n,
    )


def test_integration_constant_acceleration():
    """Level sensor accelerating at 2 m/s² in +x: velocity ramps, shift is
    quadratic (AccumulateIMUShiftAndRotation semantics)."""
    ts = np.arange(0.0, 0.5, 0.005)
    n = len(ts)
    a = 2.0
    rpy = np.zeros((n, 3))
    acc = np.tile([a, 0.0, deskew.GRAVITY], (n, 1))  # specific force incl. gravity
    gyro = np.zeros((n, 3))
    integ = deskew.integrate_imu(_window(ts, rpy, acc, gyro))
    v = np.asarray(integ.velo)[n - 1]
    s = np.asarray(integ.shift)[n - 1]
    t_total = ts[-1] - ts[0]
    np.testing.assert_allclose(v, [a * t_total, 0, 0], atol=0.02)
    np.testing.assert_allclose(s, [0.5 * a * t_total**2, 0, 0], atol=0.02)


def test_deskew_identity_when_static():
    ts = np.arange(0.0, 0.3, 0.005)
    n = len(ts)
    integ = deskew.integrate_imu(
        _window(ts, np.zeros((n, 3)),
                np.tile([0, 0, deskew.GRAVITY], (n, 1)), np.zeros((n, 3))))
    xyz = jnp.ones((16, 1800, 3))
    rel = jnp.broadcast_to(jnp.linspace(0, 1, 1800)[None, :], (16, 1800))
    out = deskew.deskew_image(xyz, rel, jnp.ones((16, 1800), bool),
                              jnp.float32(0.1), integ)
    np.testing.assert_allclose(np.asarray(out.xyz), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.ang_delta), 0.0, atol=1e-6)


def test_deskew_removes_rotational_distortion():
    """Sensor pitching at constant rate over a flat plane: raw scan has
    z-smeared ground points; after de-skew all ground points return to the
    start-frame plane z = -h."""
    h = 0.8
    scene = synthetic.Scene(
        boxes=jnp.zeros((1, 6), jnp.float32).at[0].set(
            jnp.array([900.0, 900.0, 0.0, 901.0, 901.0, 1.0])),
        cylinders=jnp.zeros((1, 4), jnp.float32).at[0].set(
            jnp.array([900.0, 0.0, 0.1, 1.0])),
    )
    rate = 0.6  # rad/s pitch — strong distortion over the 0.1 s scan
    pose0 = Pose(jnp.eye(3), jnp.array([0.0, 0.0, h]))
    pose1 = Pose(se3.rot_y(jnp.float32(rate * 0.1)), jnp.array([0.0, 0.0, h]))
    pts, valid, ring = synthetic.raycast_scan(
        scene, pose0, VLP16, next_pose=pose1, motion=True)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)

    # Raw distortion: late-scan ground points are off the z=-h plane.
    raw_z = np.asarray(img.xyz[..., 2])[np.asarray(img.valid)]
    assert np.abs(raw_z + h).max() > 0.05

    ts = np.arange(-0.05, 0.25, 0.005)
    n = len(ts)
    rpy = np.stack([np.zeros(n), np.maximum(ts, 0.0) * rate, np.zeros(n)], 1)
    # Specific force for a sensor pitching at constant rate ~ just gravity
    # reaction rotated into the sensor frame.
    acc = np.stack([-deskew.GRAVITY * np.sin(rpy[:, 1]), np.zeros(n),
                    deskew.GRAVITY * np.cos(rpy[:, 1])], 1)
    gyro = np.stack([np.zeros(n), np.full(n, rate) * (ts >= 0), np.zeros(n)], 1)
    integ = deskew.integrate_imu(_window(ts, rpy, acc, gyro))

    out = deskew.deskew_image(img.xyz, img.rel_time, img.valid, jnp.float32(0.0),
                              integ)
    fixed_z = np.asarray(out.xyz[..., 2])[np.asarray(img.valid)]
    assert np.abs(fixed_z + h).max() < 0.02
    np.testing.assert_allclose(np.asarray(out.ang_delta), [0, rate * 0.1, 0],
                               atol=0.01)


def test_deskew_removes_nonlinear_translation():
    """Acceleration from rest: a point measured at scan end must be shifted by
    0.5*a*T² (the constant-velocity deviation), rotations untouched."""
    ts = np.arange(0.0, 0.2, 0.005)
    n = len(ts)
    a = 3.0
    acc = np.tile([a, 0.0, deskew.GRAVITY], (n, 1))
    integ = deskew.integrate_imu(
        _window(ts, np.zeros((n, 3)), acc, np.zeros((n, 3))))
    xyz = jnp.zeros((16, 1800, 3)).at[:, :, 0].set(10.0)
    rel = jnp.ones((16, 1800))  # all points at scan end
    out = deskew.deskew_image(xyz, rel, jnp.ones((16, 1800), bool),
                              jnp.float32(0.0), integ)
    expected_shift = 0.5 * a * 0.1**2
    np.testing.assert_allclose(
        np.asarray(out.xyz[..., 0]), 10.0 + expected_shift, atol=2e-3)
