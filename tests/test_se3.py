"""Geometry core tests (SURVEY.md §7 step 1): the reference's Euler composition
formulas are the trickiest correctness hazard; we property-test our matrix/tangent
ops against brute-force composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.ops import se3
from legoloam_tpu.ops.se3 import Pose


def random_pose(key, scale_t=5.0):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,)) * 1.2
    t = jax.random.normal(k2, (3,)) * scale_t
    return Pose(se3.so3_exp(w), t)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compose_inverse_roundtrip(seed):
    key = jax.random.PRNGKey(seed)
    a = random_pose(jax.random.fold_in(key, 0))
    b = random_pose(jax.random.fold_in(key, 1))
    ab = se3.compose(a, b)
    b2 = se3.compose(se3.inverse(a), ab)
    np.testing.assert_allclose(b2.R, b.R, atol=1e-5)
    np.testing.assert_allclose(b2.t, b.t, atol=1e-5)
    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(ident.R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (64, 3))
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-9)
    w = w * jnp.linspace(1e-8, 3.0, 64)[:, None]  # includes near-zero & near-pi
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-4)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    xi = jax.random.normal(key, (32, 6))
    # log∘exp is the identity only within the injectivity radius ‖w‖ < π.
    wn = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi = xi.at[:, :3].multiply(jnp.minimum(1.0, 2.8 / jnp.maximum(wn, 1e-9)))
    p = se3.se3_exp(xi)
    xi2 = se3.se3_log(p)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_transform_points_matches_matrix():
    key = jax.random.PRNGKey(5)
    p = random_pose(key)
    pts = jax.random.normal(jax.random.fold_in(key, 1), (100, 3))
    out = se3.transform_points(p, pts)
    expected = (np.asarray(p.R) @ np.asarray(pts).T).T + np.asarray(p.t)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_euler_roundtrip():
    rolls = jnp.array([0.1, -0.4, 0.0])
    pitches = jnp.array([0.2, 0.9, -1.2])
    yaws = jnp.array([-2.0, 0.5, 3.0])
    R = se3.euler_zyx_to_mat(rolls, pitches, yaws)
    r, p, y = se3.mat_to_euler_zyx(R)
    np.testing.assert_allclose(np.asarray(r), np.asarray(rolls), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pitches), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yaws), atol=1e-6)


def test_project_through_correction():
    """transformAssociateToMap ≡ T_aft ∘ T_bef⁻¹ ∘ T_now: if odometry moved
    bef→now, the corrected pose must equal aft composed with that motion."""
    key = jax.random.PRNGKey(6)
    bef = random_pose(jax.random.fold_in(key, 0))
    aft = random_pose(jax.random.fold_in(key, 1))
    delta = random_pose(jax.random.fold_in(key, 2), scale_t=0.5)
    now = se3.compose(bef, delta)
    out = se3.project_through_correction(now, bef, aft)
    expected = se3.compose(aft, delta)
    np.testing.assert_allclose(out.R, expected.R, atol=1e-5)
    np.testing.assert_allclose(out.t, expected.t, atol=1e-4)


def test_camera_frame_swap_roundtrip():
    """lidar↔camera swap (featureAssociation.cpp:500-502) is an involution and
    maps axes x→z, y→x, z→y as the reference does."""
    key = jax.random.PRNGKey(7)
    p = random_pose(key)
    p2 = se3.camera_to_lidar(se3.lidar_to_camera(p))
    np.testing.assert_allclose(p2.R, p.R, atol=1e-6)
    np.testing.assert_allclose(p2.t, p.t, atol=1e-6)
    # Pure forward translation in lidar (x) becomes forward (z) in camera.
    fwd = Pose(jnp.eye(3), jnp.array([1.0, 2.0, 3.0]))
    cam = se3.lidar_to_camera(fwd)
    np.testing.assert_allclose(np.asarray(cam.t), [2.0, 3.0, 1.0], atol=1e-6)


def test_so3_interp_endpoints_and_midpoint():
    a = se3.rot_z(jnp.float32(0.0))
    b = se3.rot_z(jnp.float32(1.0))
    mid = se3.so3_interp(a, b, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(mid), np.asarray(se3.rot_z(jnp.float32(0.5))),
                               atol=1e-6)
