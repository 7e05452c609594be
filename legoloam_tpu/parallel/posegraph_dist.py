"""Distributed pose-graph solve: the NODE/LINK axis sharded over the mesh —
the trajectory-axis sequence parallelism of SURVEY.md §5.

The single-chip optimizer (``models/posegraph.py``) works in LINK SPACE:
chain factors are block-diagonal (applied factored, Bᵀ(W⊙(Bv))), loop factors
are rank-6 terms over contiguous link ranges reached through prefix sums, and
CG is preconditioned by the exact chain inverse.  Distribution follows the
axes of that math:

  * node/link arrays (poses, chain measurements, CG vectors) are sharded
    over the mesh axis; all per-link work (residuals, adjoints, block
    matvecs) is local;
  * the chain residual's x_{k-1} at each shard boundary arrives by
    ``ppermute`` halo exchange;
  * prefix sums become the classic distributed scan: local cumsum +
    ``all_gather`` of per-shard totals + prefix offset;
  * loop factors are global, tiny (L <= 256) objects: their linearization
    runs replicated against an ``all_gather`` of the poses, and their
    range-scatter terms are sliced back to the local shard;
  * CG dot products are local partials + ``psum``.

Same contract and same math as ``models.posegraph.optimize`` — results are
bit-stable w.r.t. device count up to float reduction order
(tests/test_sharding.py::test_distributed_posegraph_matches_single_device).
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
    """Same contract as ``models.posegraph.optimize`` with the node/link axis
    sharded over ``mesh``."""
    M = R.shape[0]
    n_dev = mesh.shape[axis]
    assert M % n_dev == 0, (M, n_dev)

    W_c = jnp.array([1.0 / cfg.odom_rot_var] * 3
                    + [1.0 / cfg.odom_trans_var] * 3)
    W_p = jnp.array([1.0 / cfg.prior_rot_var] * 3
                    + [1.0 / cfg.prior_trans_var] * 3)

    l_lo = jnp.minimum(loops.i, loops.j)
    l_hi = jnp.maximum(loops.i, loops.j)
    sgn = jnp.where(loops.j >= loops.i, 1.0, -1.0)
    wl6 = jnp.where(loops.valid,
                    1.0 / jnp.maximum(loops.var, 1e-9), 0.0)[:, None] \
        * jnp.ones((1, 6))

    nspec = P(axis)
    rspec = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(nspec, nspec, nspec, nspec,
                  rspec, rspec, rspec, rspec, rspec),
        out_specs=(nspec, nspec),
        check_vma=False,
    )
    def solve(Rl, tl, cRl, ctl, lR, lt, priR, prit, li_lj):
        li, lj = li_lj
        m_loc = Rl.shape[0]
        me = jax.lax.axis_index(axis)
        idx_g = me * m_loc + jnp.arange(m_loc, dtype=jnp.int32)
        node_ok = idx_g < n_nodes
        chain_ok = (idx_g >= 1) & (idx_g < n_nodes)
        inert = ~node_ok
        is0 = idx_g == 0
        fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]

        def dist_cumsum(v):
            """Global inclusive prefix sum along the sharded node axis."""
            local = jnp.cumsum(v, axis=0)
            totals = jax.lax.all_gather(local[-1], axis)     # (n_dev, 6)
            pre = jnp.where((jnp.arange(n_dev) < me)[:, None], totals, 0.0)
            return local + jnp.sum(pre, axis=0)

        def gn_body(_, Rt):
            Rl_c, tl_c = Rt
            # Halo: previous node's pose from the left neighbor (junk on
            # device 0's row 0, which is chain-invalid anyway).
            haloR = jax.lax.ppermute(Rl_c[-1], axis, fwd)
            halot = jax.lax.ppermute(tl_c[-1], axis, fwd)
            Rprev = jnp.concatenate([haloR[None], Rl_c[:-1]], axis=0)
            tprev = jnp.concatenate([halot[None], tl_c[:-1]], axis=0)

            x_self = Pose(Rl_c, tl_c)
            r_c = pg._between_residual(Pose(Rprev, tprev), x_self,
                                       Pose(cRl, ctl))
            r_c = jnp.where(chain_ok[:, None], r_c, 0.0)
            B = pg._adjoint(se3.inverse(x_self))
            B_inv = pg._adjoint(x_self)

            r_p = se3.se3_log(se3.compose(
                se3.inverse(Pose(priR, prit)), x_self))   # rowwise broadcast
            Wrow = jnp.where(chain_ok[:, None], W_c[None, :], 0.0)
            Wrow = jnp.where((is0 & (n_nodes > 0))[:, None],
                             W_p[None, :], Wrow)
            Winv_row = jnp.where(Wrow > 0,
                                 1.0 / jnp.maximum(Wrow, 1e-30), 0.0)
            r_rows = jnp.where(is0[:, None], r_p, r_c)

            def D_apply(v):
                return jnp.einsum("mab,ma->mb", B,
                                  Wrow * jnp.einsum("mab,mb->ma", B, v))

            def D_inv_apply(v):
                return jnp.einsum("mab,mb->ma", B_inv,
                                  Winv_row * jnp.einsum("mab,ma->mb",
                                                        B_inv, v))

            # Loop linearization against the gathered (tiny) global poses.
            R_all = jax.lax.all_gather(Rl_c, axis, tiled=True)   # (M, 3, 3)
            t_all = jax.lax.all_gather(tl_c, axis, tiled=True)
            x_i = Pose(R_all[li], t_all[li])
            x_j = Pose(R_all[lj], t_all[lj])
            r_l = pg._between_residual(x_i, x_j, Pose(lR, lt))
            B_l = pg._adjoint(se3.inverse(x_j))

            def range_scatter_local(vals):
                """Σ_l 1[lo<m<=hi]·vals_l, returned for the LOCAL rows
                (replicated boundary-diff cumsum over global M, sliced)."""
                d = jnp.zeros((M + 1, 6))
                d = d.at[l_lo + 1].add(vals)
                d = d.at[l_hi + 1].add(-vals)
                full = jnp.cumsum(d, axis=0)[:M]
                return jax.lax.dynamic_slice_in_dim(full, me * m_loc, m_loc)

            g = jnp.einsum("mab,ma->mb", B, Wrow * r_rows)
            a_l = sgn[:, None] * jnp.einsum("lab,la->lb", B_l, wl6 * r_l)
            g = g + range_scatter_local(a_l)
            g = jnp.where(inert[:, None], 0.0, g)

            def gdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), axis)

            def hvp(v):
                out = D_apply(v)
                Qv = dist_cumsum(jnp.where(node_ok[:, None], v, 0.0))
                Q_all = jax.lax.all_gather(Qv, axis, tiled=True)  # (M, 6)
                S = Q_all[l_hi] - Q_all[l_lo]
                y = jnp.einsum("lab,la->lb", B_l,
                               wl6 * jnp.einsum("lab,lb->la", B_l, S))
                out = out + range_scatter_local(y)
                return jnp.where(inert[:, None], v, out)

            def precond(v):
                return jnp.where(inert[:, None], v, D_inv_apply(v))

            b = -g
            b2 = gdot(b, b)

            def pcg_cond(st):
                i, x, rr, p, rz, rr2 = st
                return (i < cfg.pcg_iters) & (rr2 > cfg.pcg_tol * b2)

            def pcg_body(st):
                i, x, rr, p, rz, _ = st
                Hp = hvp(p)
                alpha = rz / jnp.maximum(gdot(p, Hp), 1e-30)
                x = x + alpha * p
                rr = rr - alpha * Hp
                z = precond(rr)
                rz_new = gdot(rr, z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p = z + beta * p
                return i + 1, x, rr, p, rz_new, gdot(rr, rr)

            x0 = jnp.zeros((m_loc, 6))
            z0 = precond(b)
            st = (jnp.int32(0), x0, b, z0, gdot(b, z0), b2)
            _, du, _, _, _, _ = jax.lax.while_loop(pcg_cond, pcg_body, st)

            du = jnp.where(node_ok[:, None], du, 0.0)
            v = dist_cumsum(du)
            v = jnp.where(node_ok[:, None], v, 0.0)
            upd = se3.se3_exp(v)
            R_new = se3.mat3_mul(upd.R, Rl_c)
            t_new = se3.rotate_vec(upd.R, tl_c) + upd.t
            return R_new, t_new

        return jax.lax.fori_loop(0, cfg.gn_iters, gn_body, (Rl, tl))

    return solve(R, t, chain_R, chain_t, loops.R, loops.t,
                 prior.R, prior.t, (loops.i, loops.j))
