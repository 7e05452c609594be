"""Distributed pose-graph solve: factors sharded over the mesh, reductions via
psum — the "Schur-complement over collectives" backend of BASELINE.json.

The single-chip optimizer (``models/posegraph.py``) is already matrix-free:
every Hessian-vector product is batched per-factor work + segment_sum onto the
node axis.  Distribution is therefore embarrassingly direct:

  * factor arrays are sharded over the ``data`` mesh axis (shard_map);
  * each device computes its shard's contribution to Jᵀr, Hv, and the
    block-Jacobi preconditioner;
  * one ``psum`` per reduction makes the node-axis results replicated;
  * the PCG state (node-sized, tiny relative to factors) stays replicated.

This is the keyframe-axis sharding SURVEY.md §5 calls the analogue of
sequence parallelism over the trajectory axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import PoseGraphConfig
from ..models import posegraph as pg
from ..models.posegraph import LoopFactors
from ..ops import se3
from ..ops.se3 import Pose


def optimize_sharded(
    R: jax.Array, t: jax.Array, n_nodes: jax.Array,
    chain_R: jax.Array, chain_t: jax.Array,
    loops: LoopFactors,
    prior: Pose,
    cfg: PoseGraphConfig,
    mesh: Mesh,
    axis: str = "data",
):
    """Same contract as ``models.posegraph.optimize`` but with the factor axis
    sharded over ``mesh``.  Results are bit-stable w.r.t. device count up to
    float reduction order."""
    M = R.shape[0]
    factors = pg._assemble_factors(chain_R, chain_t, n_nodes, loops, cfg, M)
    n_dev = mesh.shape[axis]
    F = factors.i.shape[0]
    pad = (-F) % n_dev

    def pad_f(a):
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width)

    fi = pad_f(factors.i)
    fj = pad_f(factors.j)
    fR = pad_f(factors.R)
    ft = pad_f(factors.t)
    fww = pad_f(jnp.where(factors.valid[:, None], factors.w, 0.0))

    w_prior = jnp.array([1.0 / cfg.prior_rot_var] * 3
                        + [1.0 / cfg.prior_trans_var] * 3)
    node_ok = jnp.arange(M) < n_nodes

    fspec = P(axis)
    rspec = P()  # replicated

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(fspec, fspec, fspec, fspec, fspec, rspec, rspec),
        out_specs=(rspec, rspec),
        check_vma=False,
    )
    def solve(fi, fj, fR, ft, fw, R0, t0):
        def gn_body(_, Rt):
            R_cur, t_cur = Rt
            xi_p = Pose(R_cur[fi], t_cur[fi])
            xj_p = Pose(R_cur[fj], t_cur[fj])
            Z = Pose(fR, ft)
            r = pg._between_residual(xi_p, xj_p, Z)
            Ji = -pg._adjoint(se3.relative(xj_p, xi_p))
            r0 = se3.se3_log(se3.compose(se3.inverse(prior),
                                         Pose(R_cur[0], t_cur[0])))

            def reduce_nodes(vals_j, vals_i):
                out = jax.ops.segment_sum(vals_j, fj, num_segments=M)
                out = out + jax.ops.segment_sum(vals_i, fi, num_segments=M)
                return jax.lax.psum(out, axis)

            wr = r * fw
            b = reduce_nodes(wr, jnp.einsum("fab,fb->fa",
                                            jnp.swapaxes(Ji, -1, -2), wr))
            b = b.at[0].add(w_prior * r0)

            def hvp(v):
                Jv = (jnp.einsum("fab,fb->fa", Ji, v[fi]) + v[fj]) * fw
                out = reduce_nodes(
                    Jv, jnp.einsum("fab,fb->fa", jnp.swapaxes(Ji, -1, -2), Jv))
                out = out.at[0].add(w_prior * v[0])
                return jnp.where(node_ok[:, None], out, v)

            JtJ_i = jnp.einsum("fba,fb,fbc->fac", Ji, fw, Ji)
            blocks = jax.ops.segment_sum(JtJ_i, fi, num_segments=M)
            blocks = blocks + jax.ops.segment_sum(
                jax.vmap(jnp.diag)(fw), fj, num_segments=M)
            blocks = jax.lax.psum(blocks, axis)
            blocks = blocks.at[0].add(jnp.diag(w_prior))
            blocks = blocks + 1e-6 * jnp.eye(6)
            blocks_inv = jnp.linalg.inv(blocks)

            def precond(v):
                return jnp.einsum("mab,mb->ma", blocks_inv, v)

            bneg = -b
            b2 = jnp.sum(bneg * bneg)

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

            z0 = precond(bneg)
            st = (jnp.int32(0), jnp.zeros((M, 6)), bneg, z0,
                  jnp.sum(bneg * z0))
            _, x, _, _, _ = jax.lax.while_loop(pcg_cond, pcg_body, st)

            delta = jnp.where(node_ok[:, None], x, 0.0)
            upd = se3.se3_exp(delta)
            R_new = se3.mat3_mul(R_cur, upd.R)   # exact f32 (se3.mat3_mul)
            t_new = se3.rotate_vec(R_cur, upd.t) + t_cur
            return R_new, t_new

        return jax.lax.fori_loop(0, cfg.gn_iters, gn_body, (R0, t0))

    return solve(fi, fj, fR, ft, fww, R, t)
