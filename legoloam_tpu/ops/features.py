"""Curvature features: smoothness, occlusion masks, sectioned edge/planar picks.

Reference behavior: ``src/featureAssociation.cpp:621-784``
(``calculateSmoothness``, ``markOccludedPoints``, ``extractFeatures``).

The reference works on the COMPACTED segmented cloud (ring-by-ring contiguous,
``src/imageProjection.cpp:319-355``) with per-ring start/end indices carrying
5-point guard bands.  We reproduce that layout as a fixed-shape per-ring
compaction: each ring's segmented cells are sorted to the front in column order
(one argsort of a (N_SCAN, H) key — no dynamic shapes), so curvature windows,
section arithmetic, and neighbor suppression all match the reference
semantics while staying dense.

The greedy pick loops (top-2 / top-20 edges, top-4 planar per section, each
pick suppressing +-5 compacted neighbors up to a >10-column gap,
featureAssociation.cpp:699-767) become a fixed-trip argmax/argmin loop
vectorized over all (ring x section) lanes at once: per trip, every lane picks
its best remaining candidate and scatters the suppression window.  This is
exactly the reference's selection order (both pick in curvature order; the
suppression sets are identical), with all 96 lanes running in parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig, SensorConfig
from .projection import RangeImage
from .segmentation import Segmentation
from .masking import masked_fill
from .voxel import voxel_downsample_with_payload


class FeatureCloud(NamedTuple):
    """Fixed-capacity feature point set."""

    xyz: jax.Array       # (cap, 3)
    ring: jax.Array      # (cap,) float32 ring index
    rel_time: jax.Array  # (cap,) scan-relative time in [0, 1]
    valid: jax.Array     # (cap,) bool

    @property
    def count(self):
        return jnp.sum(self.valid)


class ScanFeatures(NamedTuple):
    sharp: FeatureCloud        # cornerPointsSharp     (label 2)
    less_sharp: FeatureCloud   # cornerPointsLessSharp (label 1, superset)
    flat: FeatureCloud         # surfPointsFlat        (label -1, ground only)
    less_flat: FeatureCloud    # surfPointsLessFlat    (0.2 m downsampled rest)
    outlier: FeatureCloud      # thinned invalid-cluster points (outlierCloud;
                               # mapping folds these into the surf map)


def _compact_rings(img: RangeImage, seg: Segmentation):
    """Per-ring stable compaction of segmented cells into column order.

    Returns dict of (N_SCAN, H) arrays in compacted layout + per-ring counts.
    Position i of ring r holds that ring's i-th segmented point; tail entries
    (i >= count[r]) are invalid.
    """
    n, h = img.rng.shape
    cols = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
    key = jnp.where(seg.segmented, cols, cols + h)  # segmented first, col order
    perm = jnp.argsort(key, axis=1)

    def g(a):
        return jnp.take_along_axis(a, perm, axis=1)

    count = jnp.sum(seg.segmented, axis=1).astype(jnp.int32)
    return {
        "xyz": jnp.take_along_axis(img.xyz, perm[..., None], axis=1),
        "rng": g(img.rng),
        "col": g(cols),
        "ground": g(seg.seg_ground_flag),
        "rel": g(img.rel_time),
        "seg": g(seg.segmented),
    }, count


def _shift(a, k, fill):
    """Shift along axis 1 by k (positive = look right), constant fill."""
    if k == 0:
        return a
    if k > 0:
        return jnp.concatenate(
            [a[:, k:], jnp.full(a.shape[:1] + (k,) + a.shape[2:], fill, a.dtype)],
            axis=1)
    return jnp.concatenate(
        [jnp.full(a.shape[:1] + (-k,) + a.shape[2:], fill, a.dtype), a[:, :k]],
        axis=1)


@functools.partial(jax.jit, static_argnames=("sensor", "cfg"))
def extract_features(
    img: RangeImage,
    seg: Segmentation,
    sensor: SensorConfig,
    cfg: FeatureConfig,
    xyz_deskewed: jax.Array | None = None,
) -> ScanFeatures:
    """Full feature extraction.  ``xyz_deskewed`` (N, H, 3) optionally replaces
    the raw cell coordinates (after IMU de-skew), matching the reference's
    ordering where ``adjustDistortion`` precedes feature extraction; curvature
    always uses the PRE-deskew projection ranges exactly like the reference
    (segMsg ranges, featureAssociation.cpp:624-629)."""
    n, h = img.rng.shape
    c, count = _compact_rings(img, seg)
    if xyz_deskewed is not None:
        # Re-apply the compaction permutation to the deskewed coordinates.
        cols = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
        key = jnp.where(seg.segmented, cols, cols + h)
        perm = jnp.argsort(key, axis=1)
        c["xyz"] = jnp.take_along_axis(xyz_deskewed, perm[..., None], axis=1)

    idx = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
    in_ring = idx < count[:, None]
    rng = jnp.where(in_ring, c["rng"], 0.0)

    # ---- calculateSmoothness (featureAssociation.cpp:621-641) ----
    halfwin = cfg.curvature_halfwin
    acc = -2.0 * halfwin * rng
    for k in range(1, halfwin + 1):
        acc = acc + _shift(rng, k, 0.0) + _shift(rng, -k, 0.0)
    curvature = acc * acc
    curv_ok = in_ring & (idx >= halfwin) & (idx < count[:, None] - halfwin)

    # ---- markOccludedPoints (featureAssociation.cpp:643-678) ----
    rng_r = _shift(rng, 1, 0.0)
    col_r = _shift(c["col"], 1, 10 ** 6)
    both = in_ring & (_shift(in_ring, 1, False))
    col_close = both & (jnp.abs(col_r - c["col"]) < cfg.occlusion_col_gap)
    occl_self = col_close & (rng > rng_r + cfg.occlusion_range_jump)
    occl_next = col_close & (rng_r > rng + cfg.occlusion_range_jump)
    picked = jnp.zeros((n, h), bool)
    # occl_self at i marks i-5..i; occl_next at i marks i+1..i+6.
    for k in range(0, 6):
        picked = picked | _shift(occl_self, k, False)       # i = j+k marks j
        picked = picked | _shift(occl_next, -(k + 1), False)
    diff_prev = jnp.abs(_shift(rng, -1, 0.0) - rng)
    diff_next = jnp.abs(rng_r - rng)
    parallel = (
        in_ring
        & (diff_prev > cfg.parallel_beam_frac * rng)
        & (diff_next > cfg.parallel_beam_frac * rng)
    )
    picked = picked | parallel
    picked = picked & in_ring

    # ---- extractFeatures (featureAssociation.cpp:680-784) ----
    # Section boundaries in compacted indices with 5-pt guards:
    # s = 5, e = count - 6 (the reference's startRingIndex/endRingIndex).
    s = jnp.full((n,), halfwin, jnp.int32)
    e = count - halfwin - 1
    j = jnp.arange(cfg.sections, dtype=jnp.int32)
    sp = (s[:, None] * (cfg.sections - j) + e[:, None] * j) // cfg.sections
    ep = (s[:, None] * (cfg.sections - 1 - j) + e[:, None] * (j + 1)) \
        // cfg.sections - 1
    ep = ep.at[:, -1].set(e - 1)  # featureAssociation.cpp:695
    sec_ok = (sp <= ep) & (e[:, None] > s[:, None])  # ring has enough points

    # Lane layout: (n * sections,) flattened ring-section pairs.
    lanes_ring = jnp.repeat(jnp.arange(n, dtype=jnp.int32), cfg.sections)
    sec_lo = sp.reshape(-1)
    sec_hi = ep.reshape(-1)
    lane_ok = sec_ok.reshape(-1)
    n_lanes = n * cfg.sections

    # Per-index section membership mask per lane would be (96, H); build the
    # candidate value per lane on the fly from the global (n, h) grids.
    gap = jnp.abs(col_r - c["col"]) > cfg.occlusion_col_gap  # between i and i+1
    flat_idx = idx + jnp.arange(n, dtype=jnp.int32)[:, None] * h

    SENT = jnp.float32(1e30)  # finite sentinel (arithmetic masking; masking.py)

    def lane_values(mask_grid, values_grid, sign):
        """(n_lanes, h) candidate values restricted to each lane's span."""
        fill = -SENT if sign > 0 else SENT
        v = masked_fill(values_grid, mask_grid, fill)
        v = jnp.repeat(v, cfg.sections, axis=0)  # (n_lanes, h)
        pos = jnp.broadcast_to(jnp.arange(h), (n_lanes, h))
        in_sec = (pos >= sec_lo[:, None]) & (pos <= sec_hi[:, None]) \
            & lane_ok[:, None]
        return masked_fill(v, in_sec, fill)

    def suppress(picked_flat, lane_pick_idx, lane_valid):
        """Scatter the reference's +-5 suppression window for each lane's pick,
        stopping at >10-column gaps (featureAssociation.cpp:721-732)."""
        base = lanes_ring * h + lane_pick_idx
        picked_flat = picked_flat.at[jnp.where(lane_valid, base, n * h)].set(
            True, mode="drop")
        gap_flat = gap.reshape(-1)
        chain_r = lane_valid
        chain_l = lane_valid
        for l in range(1, 6):
            # right: stop if gap between (ind+l-1, ind+l)
            chain_r = chain_r & ~gap_flat[jnp.clip(base + l - 1, 0, n * h - 1)]
            tgt = jnp.where(chain_r & (lane_pick_idx + l < h), base + l, n * h)
            picked_flat = picked_flat.at[tgt].set(True, mode="drop")
            chain_l = chain_l & ~gap_flat[jnp.clip(base - l, 0, n * h - 1)]
            tgt = jnp.where(chain_l & (lane_pick_idx - l >= 0), base - l, n * h)
            picked_flat = picked_flat.at[tgt].set(True, mode="drop")
        return picked_flat

    picked_flat = picked.reshape(-1)
    label = jnp.zeros(n * h, jnp.int8)  # 2 sharp, 1 less-sharp, -1 flat

    # Edge picks: descending curvature, non-ground, curvature > edgeThreshold.
    for t in range(cfg.edge_less_per_section):
        mask = (
            curv_ok & ~picked_flat.reshape(n, h) & ~c["ground"]
            & (curvature > cfg.edge_threshold)
        )
        vals = lane_values(mask, curvature, sign=+1)
        pick = jnp.argmax(vals, axis=1).astype(jnp.int32)
        pick_val = jnp.take_along_axis(vals, pick[:, None], axis=1)[:, 0]
        ok = pick_val > -1e29
        lab = jnp.int8(2) if t < cfg.edge_per_section else jnp.int8(1)
        base = lanes_ring * h + pick
        label = label.at[jnp.where(ok, base, n * h)].set(lab, mode="drop")
        picked_flat = suppress(picked_flat, pick, ok)

    # Planar picks: ascending curvature, GROUND ONLY, curvature < surfThreshold
    # (featureAssociation.cpp:736-749).
    for t in range(cfg.surf_per_section):
        mask = (
            curv_ok & ~picked_flat.reshape(n, h) & c["ground"]
            & (curvature < cfg.surf_threshold)
        )
        vals = lane_values(mask, curvature, sign=-1)
        pick = jnp.argmin(vals, axis=1).astype(jnp.int32)
        pick_val = jnp.take_along_axis(vals, pick[:, None], axis=1)[:, 0]
        ok = pick_val < 1e29
        base = lanes_ring * h + pick
        label = label.at[jnp.where(ok, base, n * h)].set(jnp.int8(-1),
                                                         mode="drop")
        picked_flat = suppress(picked_flat, pick, ok)

    label = label[: n * h].reshape(n, h)

    ring_f = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[:, None], (n, h))

    def gather_cloud(mask, cap):
        """Compact a dense (n, h) mask into a fixed-cap FeatureCloud."""
        mflat = mask.reshape(-1)
        order = jnp.argsort(~mflat)  # True first, stable
        take = order[:cap]
        ok = mflat[take]
        return FeatureCloud(
            xyz=jnp.where(ok[:, None], c["xyz"].reshape(-1, 3)[take], 0.0),
            ring=jnp.where(ok, ring_f.reshape(-1)[take], 0.0),
            rel_time=jnp.where(ok, c["rel"].reshape(-1)[take], 0.0),
            valid=ok,
        )

    sharp = gather_cloud(label == 2, cfg.max_sharp)
    less_sharp = gather_cloud(label >= 1, cfg.max_less_sharp)
    flat = gather_cloud(label == -1, cfg.max_flat)

    # Less-flat: every segmented point with label <= 0 (includes flat picks),
    # voxel-downsampled at 0.2 m (featureAssociation.cpp:771-783).
    lf_mask = in_ring & (label <= 0)
    payload = jnp.stack([ring_f, c["rel"]], axis=-1).reshape(-1, 2)
    pts, pay, v = voxel_downsample_with_payload(
        c["xyz"].reshape(-1, 3), payload, lf_mask.reshape(-1),
        cfg.less_flat_leaf, cfg.max_less_flat,
    )
    less_flat = FeatureCloud(xyz=pts, ring=pay[:, 0], rel_time=pay[:, 1], valid=v)

    # Outlier cloud (imageProjection.cpp:328-335): gathered straight from the
    # DENSE image (these cells are not part of the ring compaction).
    xyz_src = img.xyz if xyz_deskewed is None else xyz_deskewed
    out_flat = seg.outlier.reshape(-1)
    order = jnp.argsort(~out_flat)
    take = order[: cfg.max_outlier]
    ok = out_flat[take]
    outlier = FeatureCloud(
        xyz=jnp.where(ok[:, None], xyz_src.reshape(-1, 3)[take], 0.0),
        ring=jnp.where(ok, ring_f.reshape(-1)[take], 0.0),
        rel_time=jnp.where(ok, img.rel_time.reshape(-1)[take], 0.0),
        valid=ok,
    )

    return ScanFeatures(sharp=sharp, less_sharp=less_sharp, flat=flat,
                        less_flat=less_flat, outlier=outlier)
