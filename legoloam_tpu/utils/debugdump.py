"""Per-scan debug-dump stream — the RViz debug publishers, offline.

The reference streams seven-plus intermediate clouds per stage to RViz and
gates each behind ``getNumSubscribers() != 0`` so unwatched topics cost
nothing (``src/imageProjection.cpp:463-507``, ``src/mapOptmization.cpp:
692-800``, global map at 0.2 Hz).  The rebuild's equivalent: a
subscriber-gated npz stream — when enabled, every Nth scan re-runs the
frontend with debug capture and writes one compressed npz of the stage
internals (range image, ground mask, cluster labels, curvature, pick
labels, feature clouds) plus mapping diagnostics; when disabled (default),
zero cost on the hot path, exactly like an unsubscribed topic.

View offline with ``python tools/view_debug.py out/debug/scan_000123.npz``
(renders the dense planes to PPM images with no extra dependencies).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np


@functools.partial(jax.jit, static_argnames=("cfg",))
def capture_frontend(points, valid, ring, cfg):
    """Re-run the frontend on one scan, returning the dense stage internals
    (the reference's fullCloud / groundCloud / segmentedCloudPure /
    outlierCloud debug set, imageProjection.cpp:463-507, plus the feature
    pick labels)."""
    from ..ops import features as feat_ops
    from ..ops import projection, segmentation

    img = projection.project_scan(points, valid, cfg.sensor, ring=ring)
    seg = segmentation.segment(img, cfg.sensor, cfg.seg)
    feat_cfg = cfg.feat
    if feat_cfg.picks_backend != "xla":
        import dataclasses
        feat_cfg = dataclasses.replace(feat_cfg, picks_backend="xla")
    feats, dbg = feat_ops.extract_features(img, seg, cfg.sensor, feat_cfg,
                                           return_debug=True)
    return {
        "range": img.rng,                   # (N, H) f32, 0 where no return
        "xyz": img.xyz,                     # (N, H, 3)
        "img_valid": img.valid,             # (N, H)
        "ground": seg.ground,               # (N, H) ground mask
        "labels": seg.label,                # (N, H) cluster labels
        "segmented": seg.segmented,         # (N, H) kept-for-features mask
        "outlier": seg.outlier,             # (N, H) thinned outlier mask
        "curvature": dbg.curvature,         # (N, H) compacted layout
        "pick_label": dbg.label,            # (N, H) 2/1/-1/0 compacted
        "sharp_xyz": feats.sharp.xyz, "sharp_valid": feats.sharp.valid,
        "flat_xyz": feats.flat.xyz, "flat_valid": feats.flat.valid,
        "feat_overflow": feats.overflow,
    }


class DebugDumper:
    """Subscriber-gated dump driver.

    ``DebugDumper(out_dir, every=50)`` then ``maybe_dump(k, scan, cfg,
    state=..., diag=...)`` inside the replay loop.  ``enabled=False`` (or
    ``out_dir=None``) makes every call a no-op — the unsubscribed-topic
    case.  Each dump re-runs the frontend (the hot path's own outputs stay
    untouched, no extra residency between dumps) and stores mapping-state
    scalars when given."""

    def __init__(self, out_dir: Optional[str], every: int = 50,
                 enabled: bool = True):
        self.out_dir = out_dir
        self.every = max(int(every), 1)
        self.enabled = bool(enabled) and out_dir is not None
        if self.enabled:
            os.makedirs(out_dir, exist_ok=True)

    def due(self, k: int) -> bool:
        return self.enabled and k % self.every == 0

    def maybe_dump(self, k: int, scan, cfg, state=None, diag=None) -> bool:
        if not self.due(k):
            return False
        pts, valid, ring = scan
        rec = {name: np.asarray(arr)
               for name, arr in capture_frontend(pts, valid, ring,
                                                 cfg).items()}
        if state is not None:
            kf = state.mapping.kf
            n_kf = int(kf.count)
            rec["kf_t"] = np.asarray(kf.t[:max(n_kf, 1)])
            rec["kf_count"] = n_kf
            rec["kf_overflow"] = int(kf.overflow)
            cache = getattr(state.mapping, "cache", None)
            if cache is not None:
                # Submap occupancy (the reference's surround-map publish,
                # mapOptmization.cpp:715-722).
                rec["submap_corner_occ"] = int(np.asarray(
                    cache.c_valid.sum()))
                rec["submap_surf_occ"] = int(np.asarray(cache.s_valid.sum()))
                rec["submap_origin"] = np.asarray(cache.origin)
            rec["loop_count"] = int(state.loops.count)
            rec["loop_dropped"] = int(state.loops.dropped)
        if diag is not None:
            for f in diag._fields:
                rec[f"diag_{f}"] = np.asarray(getattr(diag, f))
        path = os.path.join(self.out_dir, f"scan_{k:06d}.npz")
        with open(path, "wb") as f:
            np.savez_compressed(f, **rec)
        return True
