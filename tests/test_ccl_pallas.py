"""Pallas CCL kernel vs the XLA segmented-scan path: identical partitions.

Runs the kernel in interpreter mode on the CPU test mesh; on TPU the same
code compiles natively (segmentation.segment selects it automatically).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.ops import projection, segmentation
from legoloam_tpu.ops.ccl_pallas import label_propagation_pallas
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


def _partitions(labels, seeds):
    """Canonical partition representation: for each seed cell, the minimum
    flat index sharing its label (root-invariant)."""
    labels = np.asarray(labels).reshape(-1)
    seeds = np.asarray(seeds).reshape(-1)
    canon = {}
    rep = np.full(labels.shape, -1, np.int64)
    for i in np.nonzero(seeds)[0]:
        l = labels[i]
        if l not in canon:
            canon[l] = i
        rep[i] = canon[l]
    return rep


@pytest.mark.parametrize("scan_idx", [0, 1])
def test_pallas_ccl_matches_xla_partition(scan_idx):
    cfg = DEFAULT
    scene = synthetic.default_scene()
    pose = Pose(jnp.eye(3), jnp.array([0.4 * scan_idx, 0.1 * scan_idx, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, cfg.sensor)
    img = projection.project_scan(pts, valid, cfg.sensor, ring=ring)
    ground = segmentation.ground_removal(img, cfg.sensor, cfg.seg)
    seeds = img.valid & ~ground
    conn_h, conn_v = segmentation._connectivity(img, cfg.sensor, cfg.seg)

    lab_xla = segmentation._label_propagation(seeds, conn_h, conn_v,
                                              cfg.seg.ccl_max_iters)
    lab_pl, rmin, rmax = label_propagation_pallas(
        seeds, conn_h, conn_v, cfg.seg.ccl_max_iters, interpret=True)

    # Labels are root ids; compare the induced partitions, which is what
    # downstream validity/statistics consume.
    rep_xla = _partitions(lab_xla, seeds)
    rep_pl = _partitions(lab_pl, seeds)
    assert (rep_xla == rep_pl).all()
    # Non-seed cells keep the sentinel in both.
    n_cells = seeds.size
    assert (np.asarray(lab_pl).reshape(-1)[~np.asarray(seeds).reshape(-1)]
            == n_cells).all()

    # In-kernel ring extrema must equal exact per-partition reductions.
    labs = np.asarray(lab_pl).reshape(-1)
    s = np.asarray(seeds).reshape(-1)
    ring = np.repeat(np.arange(seeds.shape[0]), seeds.shape[1])
    rmin_np = np.asarray(rmin).reshape(-1)
    rmax_np = np.asarray(rmax).reshape(-1)
    import collections
    lo = collections.defaultdict(lambda: 10 ** 9)
    hi = collections.defaultdict(lambda: -1)
    for i in np.nonzero(s)[0]:
        lo[labs[i]] = min(lo[labs[i]], ring[i])
        hi[labs[i]] = max(hi[labs[i]], ring[i])
    for i in np.nonzero(s)[0]:
        assert rmin_np[i] == lo[labs[i]], (i, rmin_np[i], lo[labs[i]])
        assert rmax_np[i] == hi[labs[i]], (i, rmax_np[i], hi[labs[i]])


def test_segment_pallas_path_matches_xla_path():
    """Full segment() parity: the pallas-CCL path (with in-kernel ring stats)
    must produce the same masks as the XLA path."""
    import dataclasses
    cfg = DEFAULT
    scene = synthetic.default_scene()
    pose = Pose(jnp.eye(3), jnp.array([1.0, -0.5, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, cfg.sensor)
    img = projection.project_scan(pts, valid, cfg.sensor, ring=ring)
    seg_xla = segmentation.segment(
        img, cfg.sensor, dataclasses.replace(cfg.seg, ccl_backend="xla"))
    seg_pl = segmentation.segment(
        img, cfg.sensor, dataclasses.replace(cfg.seg, ccl_backend="pallas"))
    for field in ["ground", "segmented", "outlier", "seg_ground_flag"]:
        a, b = getattr(seg_xla, field), getattr(seg_pl, field)
        assert (np.asarray(a) == np.asarray(b)).all(), field
    assert int(seg_xla.n_clusters) == int(seg_pl.n_clusters)


def test_pallas_ccl_wraparound_cluster():
    """A wall crossing the column-wrap seam must become ONE cluster."""
    cfg = DEFAULT
    n, h = cfg.sensor.n_scan, cfg.sensor.horizon_scan
    seeds = jnp.zeros((n, h), bool)
    # Rows 8-10, columns 1795..1799 + 0..4 (crossing the seam).
    colmask = (jnp.arange(h) >= h - 5) | (jnp.arange(h) < 5)
    seeds = seeds.at[8:11, :].set(colmask[None, :])
    conn_h = seeds & jnp.roll(seeds, -1, axis=1)
    conn_v = seeds[:-1] & seeds[1:]
    lab, rmin, rmax = label_propagation_pallas(seeds, conn_h, conn_v, 6,
                                               interpret=True)
    labs = np.asarray(lab)[np.asarray(seeds)]
    assert (labs == labs[0]).all(), "seam-crossing cluster fragmented"
    assert (np.asarray(rmin)[np.asarray(seeds)] == 8).all()
    assert (np.asarray(rmax)[np.asarray(seeds)] == 10).all()
