"""Voxel grid-hash fixed-radius k-NN — the map-scale KD-tree replacement.

BASELINE.json's north star calls for "KD-tree correspondence replaced by
grid-hash neighbor search on device"; this is that component.  The reference
uses PCL KdTreeFLANN 5-NN over the submap every mapping iteration
(``src/mapOptmization.cpp:1099,1181``) with a 1 m acceptance gate
(``nn_max_dist``, mapOptmization.cpp:1101,1183) — so neighbors only ever
matter within a fixed radius, which is exactly what a voxel hash answers.

Build (once per submap): points bucket into a ``(table, bucket_cap)`` layout
by sort + rank-within-cell (deterministic, no racy scatters).  Query: gather
the 27 neighboring cells' buckets, compute candidate distances elementwise,
then k iterated argmin passes (no top_k — see ops/voxel.py for the axon
backend pathology that rules it out).

Hash collisions merely add far-away candidates that the distance gate removes;
the only approximation is bucket overflow (cells holding more than bucket_cap
points drop the excess), which at the mapping voxel leaf sizes (0.2/0.4 m
downsampled input, 1 m cells) stays far below the default cap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .masking import masked_fill, masked_fill_u32

BIG = jnp.float32(1e30)
_FAR = jnp.float32(1e6)


def _hash_cells(ijk: jax.Array, table: int) -> jax.Array:
    p1, p2, p3 = jnp.uint32(73856093), jnp.uint32(19349663), jnp.uint32(83492791)
    u = ijk.astype(jnp.uint32)
    h = (u[..., 0] * p1) ^ (u[..., 1] * p2) ^ (u[..., 2] * p3)
    return (h & jnp.uint32(table - 1)).astype(jnp.int32)


class HashGrid(NamedTuple):
    pts: jax.Array     # (T*C, 3) bucketed points; empty slots at _FAR
    idx: jax.Array     # (T*C,) original point index (0 for empty slots)
    valid: jax.Array   # (T*C,)
    cell: jax.Array    # () cell edge length


@functools.partial(jax.jit, static_argnames=("table", "bucket_cap"))
def build_grid(
    points: jax.Array, valid: jax.Array, cell: jax.Array | float,
    table: int = 1 << 15, bucket_cap: int = 32,
) -> HashGrid:
    """Bucket (N, 3) points into the hash table.  Deterministic (sort-based)."""
    n = points.shape[0]
    key = masked_fill(_hash_cells(jnp.floor(points / cell).astype(jnp.int32),
                                  table), valid, table)
    order = jnp.argsort(key)
    ks = key[order]
    vs = valid[order]
    # Rank within each key group.
    new_group = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    iota = jnp.arange(n, dtype=jnp.int32)
    starts = jax.ops.segment_min(iota, gid, num_segments=n + 1)
    rank = iota - starts[gid]
    slot = ks * bucket_cap + rank
    ok = vs & (rank < bucket_cap) & (ks < table)
    slot = masked_fill(slot, ok, table * bucket_cap)

    flat_pts = jnp.full((table * bucket_cap + 1, 3), _FAR)
    flat_pts = flat_pts.at[slot].set(points[order], mode="drop")
    flat_idx = jnp.zeros(table * bucket_cap + 1, jnp.int32)
    flat_idx = flat_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    flat_valid = jnp.zeros(table * bucket_cap + 1, bool)
    flat_valid = flat_valid.at[slot].set(ok, mode="drop")
    return HashGrid(pts=flat_pts[:-1], idx=flat_idx[:-1],
                    valid=flat_valid[:-1], cell=jnp.asarray(cell, jnp.float32))


_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


@functools.partial(jax.jit, static_argnames=("k", "table", "bucket_cap"))
def query_knn(
    grid: HashGrid, query: jax.Array, q_valid: jax.Array, k: int,
    table: int = 1 << 15, bucket_cap: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest bucketed points within ~one cell radius of each query.

    Returns (sq_dists (Q, k), original indices (Q, k)); candidates beyond the
    covered 3x3x3 cell neighborhood never appear (complete for radius <= cell).
    """
    qn = query.shape[0]
    base = jnp.floor(query / grid.cell).astype(jnp.int32)
    cand_d = []
    cand_i = []
    for off in _OFFSETS:
        cell_key = _hash_cells(base + jnp.array(off, jnp.int32)[None, :], table)
        slot0 = cell_key * bucket_cap
        gather_idx = slot0[:, None] + jnp.arange(bucket_cap, dtype=jnp.int32)
        pts = grid.pts[gather_idx]            # (Q, C, 3)
        d = jnp.sum((query[:, None, :] - pts) ** 2, axis=-1)
        cand_d.append(d)
        cand_i.append(grid.idx[gather_idx])
    d = jnp.concatenate(cand_d, axis=1)       # (Q, 27*C)
    oi = jnp.concatenate(cand_i, axis=1)
    ds, is_ = [], []
    for _ in range(k):
        am = jnp.argmin(d, axis=1).astype(jnp.int32)
        picked = jnp.take_along_axis(oi, am[:, None], axis=1)[:, 0]
        ds.append(jnp.min(d, axis=1))
        is_.append(picked)
        # Mask out EVERY copy of the winner (neighbor cells that hash-collide
        # into one bucket duplicate points).  The candidate set is ~864 wide,
        # well under the axon big-layer degradation threshold, so the compare
        # layer is safe here.
        d = d + (oi == picked[:, None]) * BIG
    dists = jnp.stack(ds, axis=1)
    idxs = jnp.stack(is_, axis=1)
    dists = dists + masked_fill(jnp.zeros_like(dists), q_valid[:, None], BIG)
    return dists, idxs
