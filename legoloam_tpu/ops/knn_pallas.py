"""Pallas TPU kernel for brute-force k-NN (k small, e.g. 5) with AABB culling.

The XLA path (``voxel.knn``) is k fused matmul->mask->argmin passes, each
recomputing the full (Q, R) distance matrix; at mapping sizes
(8192 x 32768, k=5) the distance arithmetic is ~60% of the work and is paid
k times.  This kernel:

  * computes each (TQ, RC) distance tile ONCE on the MXU and keeps it in VMEM;
  * packs each distance and its reference index into ONE int32 (positive-f32
    bit patterns are monotonic, so the low mantissa bits can carry the index)
    — top-k extraction is then k pure min-reductions instead of k
    min+argmin+one-hot passes;
  * culls reference chunks by axis-aligned bounding box: a chunk whose AABB is
    farther than ``gate`` from the query tile's AABB cannot contribute a
    neighbor that passes the caller's distance gate, so its distance tile is
    never computed.  With both point sets sorted spatially (voxel_downsample's
    Morton ordering) a query tile touches only a handful of chunks.

Exactness contract: results equal brute-force 5-NN for every query whose true
k-th neighbor lies within ``gate`` meters; beyond the gate, distances are
only guaranteed to exceed ``gate`` (the caller's acceptance test
``d[:, k-1] < gate**2`` — mapOptmization.cpp:1101,1183 — is therefore
decided identically).  Distances carry a 2^-9 relative quantization from the
index packing (the low 15 mantissa bits hold the reference index).

Matches ``voxel.knn`` semantics otherwise: squared Euclidean distances,
invalid refs pre-moved to a far sentinel, ties collapse by packed order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_IMAX = 2**31 - 1       # plain ints: jnp scalars would be captured constants
_IMIN = -2**31


def _knn_kernel(qT_ref, qsq_ref, refT_ref, rsq_ref, lo_ref, hi_ref,
                d_out, i_out, best_scr, *,
                k: int, rc: int, r_n: int, tq: int, gate_sq: float,
                idx_bits: int):
    qT = qT_ref[:]            # (3, TQ)
    qsq = qsq_ref[:]          # (1, TQ)
    idx_mask = (1 << idx_bits) - 1

    # Query-tile AABB (invalid queries sit at the far sentinel and only
    # loosen the boundary tile).
    qlo = [jnp.min(qT[j:j + 1, :]) for j in range(3)]
    qhi = [jnp.max(qT[j:j + 1, :]) for j in range(3)]

    best_scr[:] = jnp.full((tq, k), _IMAX, jnp.int32)

    n_chunks = r_n // rc

    def chunk_body(c, carry):
        # Chunk AABB distance to the query tile AABB (scalars, SMEM).
        mind = jnp.float32(0.0)
        for j in range(3):
            gap = jnp.maximum(jnp.maximum(qlo[j] - hi_ref[c, j],
                                          lo_ref[c, j] - qhi[j]), 0.0)
            mind = mind + gap * gap

        @pl.when(mind <= gate_sq)
        def _():
            refc = refT_ref[:, pl.ds(c * rc, rc)]        # (3, RC)
            rsqc = rsq_ref[:, pl.ds(c * rc, rc)]         # (1, RC)
            # precision=HIGHEST is load-bearing: the MXU's default bf16
            # truncation of f32 inputs puts ~0.4% relative error on q·r,
            # and the ||q||² - 2q·r + ||r||² decomposition cancels
            # catastrophically — at 60 m from the origin q·r ~ 3600 m², so
            # bf16 injects multi-m² noise into NEAR-neighbor distances and
            # the 5-NN sets are wrong (this silently diverged the whole
            # mapping pipeline; XLA's own K=3 matmuls lower to full-f32 VPU
            # code, which is why the non-Pallas path was unaffected).
            prod = jax.lax.dot_general(
                qT, refc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (TQ, RC)
            d = jnp.maximum(qsq.T - 2.0 * prod + rsqc, 0.0)
            # Pack distance (high bits) + global ref index (low idx_bits).
            colid = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + c * rc
            db = jax.lax.bitcast_convert_type(d, jnp.int32)
            packed = (db & ~idx_mask) | colid
            # k ordered min passes over the chunk (packed ints are unique).
            prev = jnp.full((tq, 1), _IMIN, jnp.int32)
            cands = []
            for _ in range(k):
                eff = jnp.where(packed <= prev, _IMAX, packed)
                m = jnp.min(eff, axis=1, keepdims=True)
                cands.append(m)
                prev = m
            # Merge running top-k with the chunk's top-k (packed domain).
            cand = jnp.concatenate([best_scr[:]] + cands, axis=1)  # (TQ, 2k)
            prev = jnp.full((tq, 1), _IMIN, jnp.int32)
            outs = []
            for _ in range(k):
                eff = jnp.where(cand <= prev, _IMAX, cand)
                m = jnp.min(eff, axis=1, keepdims=True)
                outs.append(m)
                prev = m
            best_scr[:] = jnp.concatenate(outs, axis=1)

        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    best = best_scr[:]
    d_out[:] = jnp.where(best == _IMAX, jnp.float32(_BIG),
                         jax.lax.bitcast_convert_type(best & ~idx_mask,
                                                      jnp.float32))
    i_out[:] = best & idx_mask


@functools.partial(jax.jit,
                   static_argnames=("k", "tq", "rc", "gate", "interpret"))
def knn_pallas(query: jax.Array, q_valid: jax.Array, ref: jax.Array,
               r_valid: jax.Array, k: int = 5, tq: int = 256,
               rc: int = 512, gate: float | None = None,
               interpret: bool = False):
    """Drop-in replacement for ``voxel.knn`` (same contract) built on the
    single-distance-pass culled kernel.

    ``gate``: acceptance radius in meters — neighbors are exact wherever the
    true k-th neighbor is closer than this; pass None for fully exact
    (disables culling).  Culling only pays off when both point sets are
    spatially sorted (``voxel_downsample(..., spatial_order=True)``)."""
    q_n, r_n = query.shape[0], ref.shape[0]
    assert q_n % tq == 0 and r_n % rc == 0, (q_n, tq, r_n, rc)
    assert r_n <= (1 << 16), r_n   # index packing uses <=16 mantissa bits
    idx_bits = (r_n - 1).bit_length()
    # Recenter both point sets by the valid-reference AABB center: the
    # ||q||²-2q·r+||r||² cancellation error scales with the SQUARE of the
    # coordinate magnitude (measured: ~1% wrong 5-NN sets at 60-90 m world
    # offsets), so working in submap-local coordinates (±extent/2) makes the
    # selection offset-independent.  Distances are translation-invariant.
    lo_v = jnp.min(jnp.where(r_valid[:, None], ref, jnp.inf), axis=0)
    hi_v = jnp.max(jnp.where(r_valid[:, None], ref, -jnp.inf), axis=0)
    c = jnp.where(jnp.any(r_valid), 0.5 * (lo_v + hi_v), 0.0)
    ref = ref - c[None, :]
    query = query - c[None, :]
    ref_m = jnp.where(r_valid[:, None], ref, 1e6)
    query_m = jnp.where(q_valid[:, None], query, 2e6)
    r_sq = jnp.sum(ref_m * ref_m, axis=-1)
    q_sq = jnp.sum(query_m * query_m, axis=-1)

    # Per-chunk reference AABBs (tiny XLA reduce).
    lo = ref_m.reshape(r_n // rc, rc, 3).min(axis=1)
    hi = ref_m.reshape(r_n // rc, rc, 3).max(axis=1)
    gate_sq = float(gate) ** 2 if gate is not None else _BIG

    grid = (q_n // tq,)
    d, i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, rc=rc, r_n=r_n, tq=tq,
                          gate_sq=gate_sq, idx_bits=idx_bits),
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
            pl.BlockSpec((r_n // rc, 3), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r_n // rc, 3), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
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
        scratch_shapes=[pltpu.VMEM((tq, k), jnp.int32)],
        interpret=interpret,
    )(query_m.T, q_sq[None, :], ref_m.T, r_sq[None, :], lo, hi)

    # Exact-distance refinement: the kernel's ||q||²-2q·r+||r||² MXU pass
    # carries catastrophic-cancellation noise that grows with the distance
    # from the coordinate origin (measured ~0.37 m² at 90 m world offset
    # even at HIGHEST precision — tools/check_tpu_kernels.py), and the
    # packed-int scores quantize at 2^-idx_bits-of-mantissa.  Recomputing
    # the k selected candidates' distances in the DIFFERENCE form (exact to
    # f32 ulp at any offset) and re-sorting makes the returned distances and
    # the caller's acceptance gate (d[:, k-1] < gate², mapOptmization.cpp:
    # 1101,1183) offset-independent; selection noise can only swap
    # near-equidistant candidates at the quantization scale.
    nn = ref_m[i]                                # (Q, k, 3)
    diff = query_m[:, None, :] - nn
    d_exact = jnp.sum(diff * diff, axis=-1)
    d_exact = jnp.where(d >= _BIG, jnp.float32(_BIG), d_exact)
    order = jnp.argsort(d_exact, axis=1)
    d = jnp.take_along_axis(d_exact, order, axis=1)
    i = jnp.take_along_axis(i, order, axis=1)
    d = d + jnp.where(q_valid, 0.0, _BIG)[:, None]
    return jnp.maximum(d, 0.0), i
