"""Pallas TPU kernel for curvature features + sectioned greedy picks.

Replaces the XLA middle of ``features.extract_features`` — curvature,
occlusion/parallel-beam masking, and the 24 greedy pick trips (top-2/20 edge,
top-4 planar per ring-section with ±5 neighbor suppression,
``src/featureAssociation.cpp:621-784``) — with ONE VMEM-resident kernel over
the (N_SCAN, H) compacted grids.  The XLA lowering of the trip loop makes
~500 small HBM-bounced ops; here everything stays on-chip.

Layout notes:
  * Lane grids are SECTION-MAJOR: row ``j*N + r`` is (ring r, section j), so
    the 6-section repeat is a concat of full (N, W) tiles and the per-ring OR
    of lane picks is 6 static row-slices — both tile-aligned (N = 16 rows =
    2 f32 sublane tiles).
  * Horizontal shifts are circular ``pltpu.roll``; wrap contamination is
    impossible because picks live in [sp, ep] ⊂ [halfwin, count-halfwin-1]
    and the padding tail carries the same semantics as the XLA path's
    constant fill (ranges are 0 / not in_ring there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SENT = 1e30


def _pad_w(h: int) -> int:
    return ((h + _LANE - 1) // _LANE) * _LANE


def _pick_kernel(rng_ref, col_ref, ground_ref, count_ref, label_out, *,
                 w: int, n: int, sections: int, halfwin: int,
                 edge_trips: int, edge_sharp: int, surf_trips: int,
                 edge_threshold: float, surf_threshold: float,
                 occl_col_gap: int, occl_range_jump: float,
                 parallel_frac: float):
    f32 = jnp.float32
    rng = rng_ref[:]                    # (n, w) compacted ranges, 0 invalid
    col = col_ref[:].astype(f32)        # compacted column ids
    ground = ground_ref[:] != 0
    count = count_ref[:]                # (n, w) per-ring count broadcast

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, w), dimension=1)
    in_ring = pos < count

    def shr(a, k, fill):
        """XLA-_shift semantics: result[j] = a[j+k] (look right), edge cells
        take ``fill`` — a circular roll with the wrapped positions masked
        (exactness matters when w == h, e.g. the 1024-column OS1 configs).
        Mosaic's rotate only handles 32-bit lanes, so bool masks ride i32."""
        edge = (pos < w - k) if k >= 0 else (pos >= -k)
        if a.dtype == jnp.bool_:
            r = pltpu.roll(a.astype(jnp.int32), (-k) % w, axis=1) != 0
            return r & edge if fill is False else r | ~edge
        r = pltpu.roll(a, (-k) % w, axis=1)
        return jnp.where(edge, r, a.dtype.type(fill))

    # ---- calculateSmoothness ----
    acc = -2.0 * halfwin * rng
    for k in range(1, halfwin + 1):
        acc = acc + shr(rng, k, 0.0) + shr(rng, -k, 0.0)
    curvature = acc * acc
    curv_ok = in_ring & (pos >= halfwin) & (pos < count - halfwin)

    # ---- markOccludedPoints ----
    rng_r = shr(rng, 1, 0.0)
    col_r = shr(col, 1, 10.0 ** 6)
    both = in_ring & shr(in_ring, 1, False)
    col_close = both & (jnp.abs(col_r - col) < occl_col_gap)
    occl_self = col_close & (rng > rng_r + occl_range_jump)
    occl_next = col_close & (rng_r > rng + occl_range_jump)
    picked = jnp.zeros((n, w), bool)
    for k in range(0, 6):
        picked = picked | shr(occl_self, k, False) \
            | shr(occl_next, -(k + 1), False)
    diff_prev = jnp.abs(shr(rng, -1, 0.0) - rng)
    diff_next = jnp.abs(rng_r - rng)
    parallel = (
        in_ring
        & (diff_prev > parallel_frac * rng)
        & (diff_next > parallel_frac * rng)
    )
    picked = (picked | parallel) & in_ring

    # ---- section bounds, lane grids (section-major: row = j*n + r) ----
    nl = n * sections
    lpos = jax.lax.broadcasted_iota(jnp.int32, (nl, w), dimension=1)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (nl, w), dimension=0)
    j = lrow // n
    cnt96 = jnp.concatenate([count] * sections, axis=0)
    s = halfwin
    e = cnt96 - halfwin - 1
    sp = (s * (sections - j) + e * j) // sections
    ep = (s * (sections - 1 - j) + e * (j + 1)) // sections - 1
    ep = jnp.where(j == sections - 1, e - 1, ep)
    in_sec = (lpos >= sp) & (lpos <= ep) & (ep >= sp) & (e > s)

    gap = jnp.abs(col_r - col) > occl_col_gap

    def rep(a):
        return jnp.concatenate([a] * sections, axis=0)

    curv96 = rep(curvature)

    def lane_pick(mask, sign):
        # Tie-break = LOWEST index with the extreme value (jnp.arg{min,max}'s
        # first-occurrence rule; Mosaic's arg-reductions break ties
        # differently, so select the index explicitly).  Ties are common:
        # perfectly flat ground has curvature exactly 0.
        m96 = rep(mask) & in_sec
        if sign > 0:
            v = jnp.where(m96, curv96, f32(-_SENT))
            m = jnp.max(v, axis=1, keepdims=True)
            ok = m > -1e29
        else:
            v = jnp.where(m96, curv96, f32(_SENT))
            m = jnp.min(v, axis=1, keepdims=True)
            ok = m < 1e29
        pick = jnp.min(jnp.where(v == m, lpos, w), axis=1, keepdims=True)
        onehot = in_sec & (lpos == pick) & ok
        out = onehot[0:n]
        for jj in range(1, sections):
            out = out | onehot[jj * n:(jj + 1) * n]
        return out

    def suppress(picked_grid, pick_grid):
        picked_grid = picked_grid | pick_grid
        chain_r = pick_grid
        chain_l = pick_grid
        for _ in range(halfwin):
            chain_r = shr(chain_r & ~gap, -1, False)
            chain_l = shr(chain_l, 1, False) & ~gap
            picked_grid = picked_grid | chain_r | chain_l
        return picked_grid

    label = jnp.zeros((n, w), jnp.int32)

    edge_ok = curv_ok & ~ground & (curvature > edge_threshold)
    for t in range(edge_trips):
        pick_grid = lane_pick(edge_ok & ~picked, sign=+1)
        lab = 2 if t < edge_sharp else 1
        label = jnp.where(pick_grid, jnp.int32(lab), label)
        picked = suppress(picked, pick_grid)

    surf_ok = curv_ok & ground & (curvature < surf_threshold)
    for t in range(surf_trips):
        pick_grid = lane_pick(surf_ok & ~picked, sign=-1)
        label = jnp.where(pick_grid, jnp.int32(-1), label)
        picked = suppress(picked, pick_grid)

    label_out[:] = label


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pick_labels_pallas(rng_c: jax.Array, col_c: jax.Array,
                       ground_c: jax.Array, count: jax.Array, cfg,
                       interpret: bool = False) -> jax.Array:
    """Dense (N_SCAN, H) int32 feature-label grid (2 sharp / 1 less-sharp /
    -1 flat / 0 rest) from compacted per-ring channels.  ``cfg`` is a
    FeatureConfig."""
    n, h = rng_c.shape
    w = _pad_w(h)

    def pad(a, fill):
        return jnp.pad(a, ((0, 0), (0, w - h)), constant_values=fill)

    count_bc = jnp.broadcast_to(count[:, None].astype(jnp.int32), (n, h))
    out = pl.pallas_call(
        functools.partial(
            _pick_kernel, w=w, n=n, sections=cfg.sections,
            halfwin=cfg.curvature_halfwin,
            edge_trips=cfg.edge_less_per_section,
            edge_sharp=cfg.edge_per_section,
            surf_trips=cfg.surf_per_section,
            edge_threshold=cfg.edge_threshold,
            surf_threshold=cfg.surf_threshold,
            occl_col_gap=cfg.occlusion_col_gap,
            occl_range_jump=cfg.occlusion_range_jump,
            parallel_frac=cfg.parallel_beam_frac),
        out_shape=jax.ShapeDtypeStruct((n, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pad(rng_c, 0.0), pad(col_c.astype(jnp.int32), 10 ** 6),
      pad(ground_c.astype(jnp.int32), 0), pad(count_bc, 0))
    return out[:, :h]
