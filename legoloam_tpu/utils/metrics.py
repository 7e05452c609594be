"""Trajectory evaluation: ATE / RPE.

The reference publishes no accuracy numbers (SURVEY.md §6); BASELINE.json makes
ATE RMSE vs a reference trajectory the acceptance metric, so these are the
canonical implementations used by tests and benchmarks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import se3
from ..ops.se3 import Pose


def umeyama_alignment(est: jnp.ndarray, ref: jnp.ndarray, with_scale: bool = False):
    """Least-squares rigid alignment est -> ref over (N, 3) positions.

    Returns (R, t, s) minimizing ||s R est + t - ref||².
    """
    mu_e = est.mean(axis=0)
    mu_r = ref.mean(axis=0)
    e = est - mu_e
    r = ref - mu_r
    cov = r.T @ e / est.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3)
    S = S.at[2, 2].set(jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt)))
    R = U @ S @ Vt
    if with_scale:
        var_e = (e * e).sum() / est.shape[0]
        s = jnp.trace(jnp.diag(D) @ S) / var_e
    else:
        s = jnp.float32(1.0)
    t = mu_r - s * R @ mu_e
    return R, t, s


def ate_rmse(est_pos: jnp.ndarray, ref_pos: jnp.ndarray, align: bool = True):
    """Absolute trajectory error RMSE over (N, 3) positions."""
    if align:
        R, t, s = umeyama_alignment(est_pos, ref_pos)
        est_pos = (s * (R @ est_pos.T)).T + t
    err = est_pos - ref_pos
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))


def rpe(est: Pose, ref: Pose, delta: int = 1):
    """Relative pose error over pose batches (leading dim = time).

    Returns (trans_rmse, rot_rmse_rad)."""
    def rel(p: Pose):
        a = Pose(p.R[:-delta], p.t[:-delta])
        b = Pose(p.R[delta:], p.t[delta:])
        return se3.relative(a, b)

    d_est = rel(est)
    d_ref = rel(ref)
    e = se3.relative(d_ref, d_est)
    t_err = jnp.sqrt(jnp.mean(jnp.sum(e.t * e.t, axis=-1)))
    w = se3.so3_log(e.R)
    r_err = jnp.sqrt(jnp.mean(jnp.sum(w * w, axis=-1)))
    return t_err, r_err
