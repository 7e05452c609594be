"""SE(3) pose-graph optimizer — the gtsam/iSAM2 replacement.

Reference usage: ``src/mapOptmization.cpp:36-47,229-232,347-350,939-942,
1375-1399,1456-1478`` — a prior factor on the first keyframe, a between-factor
chain along the trajectory, loop-closure between-factors with ICP-fitness
noise, incremental ``isam->update()`` after every keyframe, and ``correctPoses``
rewriting the keyframe store after a loop closes.

Design (TPU-first, SURVEY.md §7 hard-part 5): instead of reproducing iSAM2's
Bayes-tree incremental bookkeeping — pointer-chasing the TPU cannot execute —
we re-solve the full graph with matrix-free Gauss-Newton + block-Jacobi
preconditioned conjugate gradients.  Every factor's contribution to the
Hessian-vector product is a batched 6x6 block op + segment_sum scatter; there
is no sparse matrix, no elimination ordering, no allocation.  At <=20K poses a
full re-solve is sub-millisecond-scale device work and strictly MORE accurate
than incremental relinearization.  This formulation is also the distribution
point: shard the factor axis and psum the reductions (parallel/posegraph_dist).

Parameterization: right-multiplicative tangent updates x <- x·exp(δ) with the
standard first-order between-factor Jacobians J_j = I, J_i = -Ad(T_j⁻¹ T_i)
(exact as residuals -> 0, the regime GN operates in).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import PoseGraphConfig
from ..ops import se3
from ..ops.se3 import Pose


class LoopFactors(NamedTuple):
    """Fixed-cap loop-closure between-factors: measurement Z = T_i⁻¹ T_j."""

    i: jax.Array        # (L,) int32 from-node
    j: jax.Array        # (L,) int32 to-node
    R: jax.Array        # (L, 3, 3)
    t: jax.Array        # (L, 3)
    var: jax.Array      # (L,) isotropic VARIANCE (ICP fitness, mapOpt.cpp:932-934)
    valid: jax.Array    # (L,)
    count: jax.Array    # ()
    # Accepted closures discarded because the factor store was full, plus
    # factors invalidated by keyframe decimation (no-silent-caps discipline;
    # gtsam's graph is unbounded, mapOptmization.cpp:939 — here the cap is a
    # compile-time shape, so drivers watch this and raise max_loop_factors).
    dropped: jax.Array  # () int32


def init_loop_factors(cap: int) -> LoopFactors:
    return LoopFactors(
        i=jnp.zeros(cap, jnp.int32), j=jnp.zeros(cap, jnp.int32),
        R=jnp.broadcast_to(jnp.eye(3), (cap, 3, 3)).copy(),
        t=jnp.zeros((cap, 3)), var=jnp.ones(cap),
        valid=jnp.zeros(cap, bool), count=jnp.int32(0),
        dropped=jnp.int32(0))


def add_loop_factor(lf: LoopFactors, i, j, meas: Pose, variance) -> LoopFactors:
    k = lf.count
    ok = k < lf.i.shape[0]

    def w(arr, val):
        return jnp.where(ok, arr.at[k].set(val), arr)

    return LoopFactors(
        i=w(lf.i, jnp.int32(i)), j=w(lf.j, jnp.int32(j)),
        R=w(lf.R, meas.R), t=w(lf.t, meas.t), var=w(lf.var, variance),
        valid=w(lf.valid, True),
        count=k + jnp.where(ok, 1, 0).astype(jnp.int32),
        dropped=lf.dropped + jnp.where(ok, 0, 1).astype(jnp.int32))


def _adjoint(p: Pose) -> jax.Array:
    """SE(3) adjoint for [w; v] twist ordering: [[R, 0], [ [t]x R, R ]]."""
    R = p.R
    tx = se3.hat(p.t)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([se3.mat3_mul(tx, R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _between_residual(xi_pose: Pose, xj_pose: Pose, Z: Pose):
    """r = log(Z⁻¹ x_i⁻¹ x_j), batched."""
    E = se3.compose(se3.inverse(Z), se3.relative(xi_pose, xj_pose))
    return se3.se3_log(E)


class _Factors(NamedTuple):
    """All between-factors (chain + loops) in one batched layout."""

    i: jax.Array
    j: jax.Array
    R: jax.Array
    t: jax.Array
    w: jax.Array      # (F, 6) diagonal information weights 1/variance
    valid: jax.Array


def _assemble_factors(
    chain_R, chain_t, n_nodes, lf: LoopFactors, cfg: PoseGraphConfig, max_nodes
) -> _Factors:
    """Chain factor k connects (k-1, k) with stored measurement; loops append."""
    m = chain_R.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    chain_valid = (idx >= 1) & (idx < n_nodes)
    ci = idx - 1
    cj = idx
    cw = jnp.broadcast_to(
        jnp.array([1.0 / cfg.odom_rot_var] * 3
                  + [1.0 / cfg.odom_trans_var] * 3), (m, 6))
    lw = (1.0 / jnp.maximum(lf.var, 1e-9))[:, None] * jnp.ones((1, 6))
    return _Factors(
        i=jnp.concatenate([jnp.maximum(ci, 0), lf.i]),
        j=jnp.concatenate([cj, lf.j]),
        R=jnp.concatenate([chain_R, lf.R], axis=0),
        t=jnp.concatenate([chain_t, lf.t], axis=0),
        w=jnp.concatenate([cw, lw], axis=0),
        valid=jnp.concatenate([chain_valid, lf.valid]),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize(
    R: jax.Array, t: jax.Array, n_nodes: jax.Array,
    chain_R: jax.Array, chain_t: jax.Array,
    loops: LoopFactors,
    prior: Pose,
    cfg: PoseGraphConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Full GN+PCG re-solve.  R/t: (M, 3, 3)/(M, 3) node estimates (rows >=
    n_nodes inert); chain_R/chain_t: (M, ...) between measurement from node
    k-1 to k (row 0 unused); prior anchors node 0.

    Returns updated (R, t)."""
    M = R.shape[0]
    node_ok = jnp.arange(M) < n_nodes
    factors = _assemble_factors(chain_R, chain_t, n_nodes, loops, cfg, M)
    w_prior = jnp.array([1.0 / cfg.prior_rot_var] * 3
                        + [1.0 / cfg.prior_trans_var] * 3)

    def gn_body(_, Rt):
        R_cur, t_cur = Rt
        xi_p = Pose(R_cur[factors.i], t_cur[factors.i])
        xj_p = Pose(R_cur[factors.j], t_cur[factors.j])
        Z = Pose(factors.R, factors.t)
        r = _between_residual(xi_p, xj_p, Z)              # (F, 6)
        Ji = -_adjoint(se3.relative(xj_p, xi_p))          # (F, 6, 6)
        fw = jnp.where(factors.valid[:, None], factors.w, 0.0)  # (F, 6)

        # Prior residual on node 0: log(prior⁻¹ x_0).
        r0 = se3.se3_log(se3.compose(se3.inverse(prior),
                                     Pose(R_cur[0], t_cur[0])))

        def rhs():
            """b = Σ Jᵀ W r (gradient), shape (M, 6)."""
            wr = r * fw
            contrib_j = wr
            contrib_i = jnp.einsum("fab,fb->fa", jnp.swapaxes(Ji, -1, -2), wr)
            b = jax.ops.segment_sum(contrib_j, factors.j, num_segments=M)
            b = b + jax.ops.segment_sum(contrib_i, factors.i, num_segments=M)
            return b.at[0].add(w_prior * r0)

        def hvp(v):
            """H v with H = Σ Jᵀ W J + prior, v: (M, 6)."""
            vi = v[factors.i]
            vj = v[factors.j]
            Jv = jnp.einsum("fab,fb->fa", Ji, vi) + vj     # (F, 6)
            Jv = Jv * fw
            out = jax.ops.segment_sum(Jv, factors.j, num_segments=M)
            out = out + jax.ops.segment_sum(
                jnp.einsum("fab,fb->fa", jnp.swapaxes(Ji, -1, -2), Jv),
                factors.i, num_segments=M)
            out = out.at[0].add(w_prior * v[0])
            return jnp.where(node_ok[:, None], out, v)  # inert rows: identity

        # Block-Jacobi preconditioner: per-node 6x6 diagonal blocks.
        # i-side block: Jiᵀ W Ji;  j-side block: diag(W).
        JtJ_i = jnp.einsum("fba,fb,fbc->fac", Ji, fw, Ji)
        blocks = jax.ops.segment_sum(JtJ_i, factors.i, num_segments=M)
        eye6 = jnp.eye(6)
        blocks = blocks + jax.ops.segment_sum(
            jax.vmap(jnp.diag)(fw), factors.j, num_segments=M)
        blocks = blocks.at[0].add(jnp.diag(w_prior))
        blocks = blocks + 1e-6 * eye6
        blocks_inv = jnp.linalg.inv(blocks)

        def precond(v):
            return jnp.einsum("mab,mb->ma", blocks_inv, v)

        b = -rhs()

        # PCG with relative-residual tolerance exit: stop when
        # ‖r‖² <= pcg_tol·‖b‖² or after pcg_iters iterations.
        b2 = jnp.sum(b * b)

        def pcg_cond(st):
            i, x, rr, p, rz = st
            return (i < cfg.pcg_iters) & (jnp.sum(rr * rr)
                                          > cfg.pcg_tol * b2)

        def pcg_body(st):
            i, x, rr, p, rz = st
            Hp = hvp(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-30)
            x = x + alpha * p
            rr = rr - alpha * Hp
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return i + 1, x, rr, p, rz_new

        x0 = jnp.zeros((M, 6))
        z0 = precond(b)
        st = (jnp.int32(0), x0, b, z0, jnp.sum(b * z0))
        _, x, _, _, _ = jax.lax.while_loop(pcg_cond, pcg_body, st)

        delta = jnp.where(node_ok[:, None], x, 0.0)
        upd = se3.se3_exp(delta)
        R_new = se3.mat3_mul(R_cur, upd.R)   # exact f32 (se3.mat3_mul)
        t_new = se3.rotate_vec(R_cur, upd.t) + t_cur
        return R_new, t_new

    R_out, t_out = jax.lax.fori_loop(0, cfg.gn_iters, gn_body, (R, t))
    return R_out, t_out
