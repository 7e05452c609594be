"""Pallas TPU kernel for brute-force k-NN (k small, e.g. 5).

The XLA path (``voxel.knn``) is k fused matmul->mask->argmin passes, each
recomputing the full (Q, R) distance matrix; at mapping sizes
(8192 x 32768, k=5) the distance arithmetic is ~60% of the work and is paid
k times.  This kernel computes each (TQ, RC) distance tile ONCE on the MXU,
extracts the tile's k minima from VMEM, and merges them into a running
per-query top-k — the distance arithmetic is paid once and the extraction
passes run on a VMEM-resident tile.

Matches ``voxel.knn`` semantics: squared Euclidean distances, invalid refs
pre-moved to a far sentinel by the caller, exactly co-distant references
collapse to one pick (same caveat as the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _knn_kernel(qT_ref, qsq_ref, refT_ref, rsq_ref, d_out, i_out, *,
                k: int, rc: int, r_n: int, tq: int):
    qT = qT_ref[:]            # (3, TQ)
    qsq = qsq_ref[:]          # (1, TQ)

    n_chunks = r_n // rc

    def chunk_body(c, carry):
        best_d, best_i = carry
        refc = refT_ref[:, pl.ds(c * rc, rc)]        # (3, RC)
        rsqc = rsq_ref[:, pl.ds(c * rc, rc)]         # (1, RC)
        prod = jax.lax.dot_general(
            qT, refc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (TQ, RC)
        d = qsq.T - 2.0 * prod + rsqc                 # (TQ, RC)
        # Extract the chunk's k minima (distance tile stays in VMEM).
        prev = jnp.full((tq, 1), -jnp.inf)
        cds, cis = [], []
        for _ in range(k):
            d_eff = d + (d <= prev) * _BIG
            m = jnp.min(d_eff, axis=1, keepdims=True)
            a = jnp.argmin(d_eff, axis=1).reshape(tq, 1)
            cds.append(m)
            cis.append(a + c * rc)
            prev = m
        # Merge running top-k with the chunk's top-k (2k candidates).
        cand_d = jnp.concatenate([best_d] + cds, axis=1)     # (TQ, 2k)
        cand_i = jnp.concatenate([best_i] + cis, axis=1)
        colid = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
        prev = jnp.full((tq, 1), -jnp.inf)
        nds, nis = [], []
        for _ in range(k):
            d_eff = cand_d + (cand_d <= prev) * _BIG
            m = jnp.min(d_eff, axis=1, keepdims=True)
            sel = jnp.argmin(d_eff, axis=1).reshape(tq, 1)
            # one-hot select (Mosaic's gather doesn't cover take_along_axis)
            idx = jnp.sum(jnp.where(colid == sel, cand_i, 0), axis=1,
                          keepdims=True)
            nds.append(m)
            nis.append(idx)
            prev = m
        return jnp.concatenate(nds, axis=1), jnp.concatenate(nis, axis=1)

    best_d, best_i = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        (jnp.full((tq, k), jnp.float32(_BIG)), jnp.zeros((tq, k), jnp.int32)))
    d_out[:] = best_d
    i_out[:] = best_i


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "rc", "interpret"))
def knn_pallas(query: jax.Array, q_valid: jax.Array, ref: jax.Array,
               r_valid: jax.Array, k: int = 5, tq: int = 256,
               rc: int = 2048, interpret: bool = False):
    """Drop-in replacement for ``voxel.knn`` (same contract) built on the
    single-distance-pass kernel."""
    q_n, r_n = query.shape[0], ref.shape[0]
    assert q_n % tq == 0 and r_n % rc == 0, (q_n, tq, r_n, rc)
    ref_m = jnp.where(r_valid[:, None], ref, 1e6)
    r_sq = jnp.sum(ref_m * ref_m, axis=-1)
    q_sq = jnp.sum(query * query, axis=-1)

    grid = (q_n // tq,)
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, rc=rc, r_n=r_n, tq=tq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r_n), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_n), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tq, k), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_n, k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k), jnp.int32),
        ),
        interpret=interpret,
    )(query.T, q_sq[None, :], ref_m.T, r_sq[None, :])

    d = d + jnp.where(q_valid, 0.0, _BIG)[:, None]
    return jnp.maximum(d, 0.0), i
