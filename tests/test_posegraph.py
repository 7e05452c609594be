"""Pose-graph optimizer tests (SURVEY.md §4): chain + single loop factor vs
closed-form expectations."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import PoseGraphConfig
from legoloam_tpu.models import posegraph
from legoloam_tpu.ops import se3
from legoloam_tpu.ops.se3 import Pose

CFG = PoseGraphConfig()
M = 32  # node capacity


def chain_from_measurements(meas_R, meas_t, n):
    """Integrate chain measurements into absolute poses."""
    R = [np.eye(3, dtype=np.float32)]
    t = [np.zeros(3, np.float32)]
    for k in range(1, n):
        R.append(R[-1] @ np.asarray(meas_R[k]))
        t.append(R[-2] @ np.asarray(meas_t[k]) + t[-1])
    return np.stack(R), np.stack(t)


def pad_chain(meas_R, meas_t, n):
    cR = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy()
    ct = jnp.zeros((M, 3))
    cR = cR.at[:n].set(jnp.asarray(meas_R))
    ct = ct.at[:n].set(jnp.asarray(meas_t))
    return cR, ct


def test_consistent_chain_is_fixed_point():
    """Perfect measurements + init at the integrated poses: optimize must not
    move anything."""
    n = 10
    key = jax.random.PRNGKey(0)
    meas_R = [np.eye(3, dtype=np.float32)]
    meas_t = [np.zeros(3, np.float32)]
    for k in range(1, n):
        w = 0.1 * jax.random.normal(jax.random.fold_in(key, k), (3,))
        meas_R.append(np.asarray(se3.so3_exp(w)))
        meas_t.append(np.array([1.0, 0.1, 0.0], np.float32))
    R0, t0 = chain_from_measurements(meas_R, meas_t, n)
    cR, ct = pad_chain(np.stack(meas_R), np.stack(meas_t), n)
    R = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy().at[:n].set(R0)
    t = jnp.zeros((M, 3)).at[:n].set(t0)
    loops = posegraph.init_loop_factors(8)
    prior = Pose(jnp.asarray(R0[0]), jnp.asarray(t0[0]))
    R_out, t_out = posegraph.optimize(R, t, jnp.int32(n), cR, ct, loops, prior,
                                      CFG)
    np.testing.assert_allclose(np.asarray(t_out[:n]), t0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(R_out[:n]), R0, atol=1e-3)


def test_perturbed_init_recovers_chain():
    """Same chain, init poses perturbed: GN must pull them back to the
    measurement-consistent trajectory (unique due to the prior anchor)."""
    n = 8
    meas_R = np.stack([np.eye(3, dtype=np.float32)] * n)
    meas_t = np.stack([np.array([1.0, 0.0, 0.0], np.float32)] * n)
    meas_t[0] = 0
    R0, t0 = chain_from_measurements(meas_R, meas_t, n)
    key = jax.random.PRNGKey(1)
    R = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy().at[:n].set(R0)
    t_pert = t0 + 0.3 * np.asarray(jax.random.normal(key, (n, 3)))
    t_pert[0] = t0[0]
    t = jnp.zeros((M, 3)).at[:n].set(t_pert)
    cR, ct = pad_chain(meas_R, meas_t, n)
    loops = posegraph.init_loop_factors(8)
    prior = Pose(jnp.eye(3), jnp.zeros(3))
    R_out, t_out = posegraph.optimize(R, t, jnp.int32(n), cR, ct, loops, prior,
                                      CFG)
    np.testing.assert_allclose(np.asarray(t_out[:n]), t0, atol=5e-3)


def test_loop_closure_distributes_drift():
    """Square loop with per-edge yaw drift: a loop factor with the TRUE
    relative pose must pull the endpoint back toward the start."""
    n = 21
    drift = 0.03  # rad of yaw error per edge
    meas_R, meas_t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    for k in range(1, n):
        turn = np.pi / 2 if k % 5 == 0 else 0.0
        Rk = np.asarray(se3.rot_z(jnp.float32(turn + drift)))
        meas_R.append(Rk.astype(np.float32))
        meas_t.append(np.array([2.0, 0.0, 0.0], np.float32))
    R0, t0 = chain_from_measurements(meas_R, meas_t, n)
    drift_err = np.linalg.norm(t0[n - 1] - np.zeros(3))
    assert drift_err > 0.5  # the square doesn't close due to drift

    cR, ct = pad_chain(np.stack(meas_R), np.stack(meas_t), n)
    R = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy().at[:n].set(R0)
    t = jnp.zeros((M, 3)).at[:n].set(t0)
    loops = posegraph.init_loop_factors(8)
    # True loop: node n-1 coincides with node 0 (identity relative pose is not
    # exact here; use ground-truth square: after 20 edges of the drift-free
    # square the pose returns to start).
    gt_rel = Pose(jnp.eye(3), jnp.zeros(3))  # x_0⁻¹ x_{n-1} should be identity
    # Variance 1e-6: a tight, repeatedly-confirmed loop (the reference
    # accumulates one fitness~0.3 factor per revisit second; one strong factor
    # stands in for that pile here).  At weaker weights the solver correctly
    # leaves part of the gap open — that's the weight-ratio equilibrium, not a
    # solver failure (verified by sweeping variance down to 1e-8 -> exact
    # closure).
    loops = posegraph.add_loop_factor(loops, 0, n - 1, gt_rel, jnp.float32(1e-6))
    prior = Pose(jnp.eye(3), jnp.zeros(3))
    R_out, t_out = posegraph.optimize(R, t, jnp.int32(n), cR, ct, loops, prior,
                                      CFG)
    end_err = np.linalg.norm(np.asarray(t_out[n - 1]))
    assert end_err < 0.1 * drift_err, f"loop not closed: {end_err:.3f}"
    # Start stays anchored.
    assert np.linalg.norm(np.asarray(t_out[0])) < 1e-2


def test_optimize_empty_graph_is_noop():
    R = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy()
    t = jnp.zeros((M, 3))
    cR, ct = pad_chain(np.stack([np.eye(3, dtype=np.float32)] * 2),
                       np.zeros((2, 3), np.float32), 2)
    loops = posegraph.init_loop_factors(4)
    prior = Pose(jnp.eye(3), jnp.zeros(3))
    R_out, t_out = posegraph.optimize(R, t, jnp.int32(1), cR, ct, loops, prior,
                                      CFG)
    assert np.all(np.isfinite(np.asarray(t_out)))
    np.testing.assert_allclose(np.asarray(t_out[0]), 0.0, atol=1e-4)
