"""Solver-stack parity: the JAX two-step LM (models/odometry.py) vs the NumPy
oracle port of the reference's solver (oracle/numpy_odometry.py) on single
scan pairs under the REFERENCE preset.

This extends the cell-for-cell frontend oracle (tests/test_oracle_parity.py)
one stage deeper: both solvers consume the IDENTICAL feature clouds (the JAX
frontend's picks and the JAX odometry state's warped "last" clouds) and the
same constant-velocity seed, and the recovered SE(3) scan motions are
asserted close — to each other AND to ground truth.

The comparison runs WARM-STARTED (the pipeline's steady-state regime: every
solve is seeded with the previous twist, updateInitialGuess,
featureAssociation.cpp:1639-1664).  Cold-start transients genuinely differ
by design: the reference's Jacobian drops the per-point interpolation factor
s (featureAssociation.cpp:1301-1322 uses pointOri and full-transform
derivatives), so its effective per-iteration step is ``damping`` where the
JAX solver's exact chain-rule Jacobian (J = s·[...]) yields
``damping / mean(s)`` ≈ 2.3x — same fixed point, different approach rate;
near the fixed point (warm start) the difference vanishes, which is what
this test pins.  Agreement is at the solved-motion level: the production
solver re-parametrizes as an se(3) twist and searches correspondences by
full-cloud ring-class argmin where the oracle keeps the reference's Euler
6-vector + index-window scans (with the ported quirks, see
numpy_odometry.py docstring), so per-correspondence equality is not
expected.
"""

import jax
import numpy as np
import pytest

from legoloam_tpu.config import REFERENCE
from legoloam_tpu.models import odometry as odom
from legoloam_tpu.oracle import numpy_odometry as orc
from legoloam_tpu.ops import features as feat_ops
from legoloam_tpu.ops import projection, se3, segmentation
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic

CFG = REFERENCE
SENSOR = CFG.sensor


def _feats(pts, valid, ring):
    img = projection.project_scan(pts, valid, SENSOR, ring=ring)
    seg = segmentation.segment(img, SENSOR, CFG.seg)
    return feat_ops.extract_features(img, seg, SENSOR, CFG.feat)


def _compact(cloud):
    v = np.asarray(cloud.valid)
    return (np.asarray(cloud.xyz)[v], np.asarray(cloud.ring)[v],
            np.asarray(cloud.rel_time)[v])


def _rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def test_seed_roundtrip():
    """_seed_to_transform must invert the transformCur -> SE(3) map."""
    rng = np.random.RandomState(3)
    for _ in range(10):
        w = 0.2 * rng.randn(3)
        ang = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = (np.eye(3) + np.sin(ang) / max(ang, 1e-12) * K
             + (1 - np.cos(ang)) / max(ang, 1e-12) ** 2 * K @ K)
        t = 0.5 * rng.randn(3)
        tc = orc._seed_to_transform(R, t)
        R_c = orc._rot_y(-tc[1]) @ orc._rot_x(-tc[0]) @ orc._rot_z(-tc[2])
        R_back = orc._P.T @ R_c @ orc._P
        t_back = orc._P.T @ (-R_c @ tc[3:6])
        np.testing.assert_allclose(R_back, R, atol=1e-12)
        np.testing.assert_allclose(t_back, t, atol=1e-12)


@pytest.mark.parametrize("k", [3, 4])
def test_two_step_lm_parity(k):
    """Warm-started scan pair (k, k+1) on the courtyard arc: JAX twist solve
    vs the NumPy reference-rules solve, fed the same feature clouds, last
    clouds, and constant-velocity seed, must agree in SE(3) and both must be
    near the ground-truth inter-scan motion."""
    scene = synthetic.default_scene()
    n = 6
    poses = synthetic.circle_trajectory(n, radius=20.0, angular_rate=0.0075)
    scans = []
    for i in range(n - 1):
        pts, valid, ring = synthetic.raycast_scan(
            scene, Pose(poses.R[i], poses.t[i]), SENSOR,
            next_pose=Pose(poses.R[i + 1], poses.t[i + 1]), motion=True,
            noise_key=jax.random.PRNGKey(i), noise_sigma=0.005)
        scans.append(_feats(pts, valid, ring))

    # Warm up the JAX odometry through scan k, then solve the (k, k+1) pair.
    state = odom.init_state(CFG.odom, CFG.feat)
    for i in range(k):
        state, _, _ = odom.odometry_step(state, scans[i], CFG.odom)
    state2, _, diag = odom.odometry_step(state, scans[k], CFG.odom)
    xi = np.asarray(state2.xi, np.float64)
    M = se3.se3_exp(jax.numpy.asarray(xi))
    R_jax, t_jax = np.asarray(M.R, np.float64), np.asarray(M.t, np.float64)

    # Oracle: same last clouds (the JAX state's — scan k's broad picks warped
    # to scan end), same queries (scan k+1's sharp/flat picks), same seed
    # (the state's constant-velocity prior).
    lc_xyz, lc_ring, _ = _compact(state.last_corner)
    ls_xyz, ls_ring, _ = _compact(state.last_surf)
    q_flat, _, q_flat_s = _compact(scans[k].flat)
    q_sharp, _, q_sharp_s = _compact(scans[k].sharp)
    Ms = se3.se3_exp(state.xi)
    seed = (np.asarray(Ms.R, np.float64), np.asarray(Ms.t, np.float64))
    R_np, t_np, info = orc.two_step_lm(
        q_flat, q_flat_s, ls_xyz, ls_ring,
        q_sharp, q_sharp_s, lc_xyz, lc_ring,
        nearest_sq_dist=CFG.odom.nearest_sq_dist,
        max_iterations=CFG.odom.max_iterations,
        seed=seed)

    assert info["n_surf"] >= 30 and info["n_corner"] >= 10

    # Ground-truth scan motion: scan-end frame -> scan-start frame of the
    # pair's second scan.
    gt = se3.relative(Pose(poses.R[k], poses.t[k]),
                      Pose(poses.R[k + 1], poses.t[k + 1]))
    R_gt, t_gt = np.asarray(gt.R, np.float64), np.asarray(gt.t, np.float64)

    # Solver-vs-solver: same inputs and seed.  Residual gap budget (measured
    # k=3: 1.6 cm): the oracle's 25x0.05 schedule leaves a ~28% transient
    # where the exact-Jacobian solver leaves ~4%, plus a ~7 mm lateral
    # fixed-point difference from the correspondence-rule differences (quirk
    # bound / ring-class vs index-window).  3 cm on a 15 cm motion still
    # pins what the oracle is for: frame swaps, DOF splits, Jacobian signs,
    # robust-weight/degeneracy semantics.
    assert _rot_angle_deg(R_jax, R_np) < 0.1, _rot_angle_deg(R_jax, R_np)
    assert np.linalg.norm(t_jax - t_np) < 0.03, (t_jax, t_np)

    # Both-vs-ground-truth.
    for R_e, t_e, who in ((R_jax, t_jax, "jax"), (R_np, t_np, "oracle")):
        assert _rot_angle_deg(R_e, R_gt) < 0.3, who
        assert np.linalg.norm(t_e - t_gt) < 0.05, (who, t_e, t_gt)


def test_oracle_gates():
    """updateTransformation's entry gate (featureAssociation.cpp:1668-1669):
    too-small last clouds -> the seed motion unchanged (identity here)."""
    R, t, info = orc.two_step_lm(
        np.zeros((5, 3)), np.zeros(5),
        np.zeros((50, 3)), np.zeros(50),     # surf last < 100
        np.zeros((5, 3)), np.zeros(5),
        np.zeros((20, 3)), np.zeros(20),
        )
    np.testing.assert_allclose(R, np.eye(3), atol=1e-15)
    np.testing.assert_allclose(t, np.zeros(3), atol=1e-15)
    assert info["n_surf"] == 0
