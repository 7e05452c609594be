"""Voxel-grid downsampling and nearest-neighbor search — the PCL replacements.

Reference usage:
  * PCL ``VoxelGrid`` (leaf 0.2/0.4/1.0): ``src/featureAssociation.cpp:225``,
    ``src/mapOptmization.cpp:249-257``  -> ``voxel_downsample`` here.
  * PCL ``KdTreeFLANN`` K-NN / radius search: ``src/featureAssociation.cpp:
    1054,1165``, ``src/mapOptmization.cpp:1099,1181,1006,825,771``
    -> ``knn`` here (tiled brute force on the MXU).

Why brute force instead of a KD-tree or grid hash: at this problem's sizes
(queries <= 8K, references <= 64K) the full distance matrix is a few dozen MXU
matmul tiles — microseconds of systolic-array work — while tree traversal is
branchy scalar code TPUs execute catastrophically badly.  The classic
||q - r||² = ||q||² + ||r||² - 2 q·r decomposition turns the whole search into
one batched matmul + top-k, tiled to bound memory.  A Pallas fused
distance+top-k kernel is the planned upgrade for the map-sized search.

Voxel downsampling is sort-based and exact up to 32-bit hash birthday
collisions (expected < 0.05 colliding voxel pairs at 20K occupied voxels):
points sort by voxel hash, segment boundaries define voxels, segment means are
the output.  Deterministic, unlike scatter-add orderings.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _hash_voxel(ijk: jax.Array) -> jax.Array:
    """3D integer coords -> 32-bit hash (spatial hashing constants from
    Teschner et al. 2003, the standard grid-hash primes)."""
    p1, p2, p3 = jnp.uint32(73856093), jnp.uint32(19349663), jnp.uint32(83492791)
    u = ijk.astype(jnp.uint32)
    return (u[..., 0] * p1) ^ (u[..., 1] * p2) ^ (u[..., 2] * p3)


@functools.partial(jax.jit, static_argnames=("cap",))
def voxel_downsample(
    points: jax.Array, valid: jax.Array, leaf: jax.Array | float, cap: int
) -> Tuple[jax.Array, jax.Array]:
    """Centroid-per-voxel downsampling (PCL VoxelGrid equivalent).

    points: (N, 3), valid: (N,) bool, leaf: scalar edge length.
    Returns (out (cap, 3), out_valid (cap,)).  If more than ``cap`` voxels are
    occupied the highest-hash voxels are dropped (deterministic).
    """
    ijk = jnp.floor(points / leaf).astype(jnp.int32)
    h = jnp.where(valid, _hash_voxel(ijk), jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(h)
    hs = h[order]
    ps = points[order]
    vs = valid[order]
    new_group = jnp.concatenate([jnp.array([True]), hs[1:] != hs[:-1]]) & vs
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gid = jnp.where(vs & (gid < cap) & (gid >= 0), gid, cap)
    sums = jax.ops.segment_sum(
        jnp.where(vs[:, None], ps, 0.0), gid, num_segments=cap + 1
    )[:cap]
    counts = jax.ops.segment_sum(vs.astype(jnp.float32), gid,
                                 num_segments=cap + 1)[:cap]
    out_valid = counts > 0
    out = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(out_valid[:, None], out, 0.0), out_valid


@functools.partial(jax.jit, static_argnames=("cap",))
def voxel_downsample_with_payload(
    points: jax.Array, payload: jax.Array, valid: jax.Array,
    leaf: jax.Array | float, cap: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """As ``voxel_downsample`` but also averages a per-point payload (K,) or
    (K, D) over each voxel (used to carry ring ids / timestamps through)."""
    ijk = jnp.floor(points / leaf).astype(jnp.int32)
    h = jnp.where(valid, _hash_voxel(ijk), jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(h)
    hs, ps, vs = h[order], points[order], valid[order]
    pay = payload[order]
    new_group = jnp.concatenate([jnp.array([True]), hs[1:] != hs[:-1]]) & vs
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gid = jnp.where(vs & (gid < cap) & (gid >= 0), gid, cap)
    vf = vs.astype(jnp.float32)
    sums = jax.ops.segment_sum(ps * vf[:, None], gid, num_segments=cap + 1)[:cap]
    pay2 = pay if pay.ndim > 1 else pay[:, None]
    psums = jax.ops.segment_sum(pay2 * vf[:, None], gid, num_segments=cap + 1)[:cap]
    counts = jax.ops.segment_sum(vf, gid, num_segments=cap + 1)[:cap]
    out_valid = counts > 0
    c = jnp.maximum(counts, 1.0)
    out = jnp.where(out_valid[:, None], sums / c[:, None], 0.0)
    outp = jnp.where(out_valid[:, None], psums / c[:, None], 0.0)
    if payload.ndim == 1:
        outp = outp[:, 0]
    return out, outp, out_valid


BIG = jnp.float32(1e30)


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "r_tile"))
def knn(
    query: jax.Array,
    q_valid: jax.Array,
    ref: jax.Array,
    r_valid: jax.Array,
    k: int,
    q_tile: int = 512,
    r_tile: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest references for each query, by squared Euclidean distance.

    query: (Q, 3), ref: (R, 3) with validity masks.  Returns
    (sq_dists (Q, k), indices (Q, k)); invalid refs never appear (distance BIG),
    invalid queries get all-BIG rows.  Tiled so peak memory is q_tile*r_tile.
    """
    q_n, r_n = query.shape[0], ref.shape[0]
    q_pad = (-q_n) % q_tile
    r_pad = (-r_n) % r_tile
    q = jnp.pad(query, ((0, q_pad), (0, 0)))
    qv = jnp.pad(q_valid, (0, q_pad))
    r = jnp.pad(ref, ((0, r_pad), (0, 0)))
    rv = jnp.pad(r_valid, (0, r_pad))

    r_sq = jnp.sum(r * r, axis=-1)
    n_rt = r.shape[0] // r_tile

    def per_qtile(q_blk, qv_blk):
        q_sq = jnp.sum(q_blk * q_blk, axis=-1)

        def scan_rt(carry, rt):
            best_d, best_i = carry
            r_blk = jax.lax.dynamic_slice_in_dim(r, rt * r_tile, r_tile)
            rv_blk = jax.lax.dynamic_slice_in_dim(rv, rt * r_tile, r_tile)
            rsq_blk = jax.lax.dynamic_slice_in_dim(r_sq, rt * r_tile, r_tile)
            # (q_tile, r_tile) distance tile — one MXU matmul.
            d = (
                q_sq[:, None]
                - 2.0 * jnp.dot(q_blk, r_blk.T, preferred_element_type=jnp.float32)
                + rsq_blk[None, :]
            )
            d = jnp.where(rv_blk[None, :], d, BIG)
            td, ti = jax.lax.top_k(-d, k)
            ti = ti + rt * r_tile
            # Merge running best with tile best.
            md = jnp.concatenate([best_d, -td], axis=1)
            mi = jnp.concatenate([best_i, ti], axis=1)
            nd, sel = jax.lax.top_k(-md, k)
            ni = jnp.take_along_axis(mi, sel, axis=1)
            return (-nd, ni), None

        init = (jnp.full((q_tile, k), BIG), jnp.zeros((q_tile, k), jnp.int32))
        (bd, bi), _ = jax.lax.scan(scan_rt, init, jnp.arange(n_rt))
        bd = jnp.where(qv_blk[:, None], bd, BIG)
        return bd, bi

    qb = q.reshape(-1, q_tile, 3)
    qvb = qv.reshape(-1, q_tile)
    dists, idxs = jax.lax.map(lambda ab: per_qtile(*ab), (qb, qvb))
    dists = dists.reshape(-1, k)[:q_n]
    idxs = idxs.reshape(-1, k)[:q_n]
    dists = jnp.maximum(dists, 0.0)  # clamp matmul-form negatives near zero
    return dists, idxs
