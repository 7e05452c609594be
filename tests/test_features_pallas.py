"""Pallas pick kernel vs the XLA dense-trip path: identical feature sets."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT, OS1_16
from legoloam_tpu.ops import features, projection, segmentation
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


def _extract_both(sensor, feat_cfg):
    cfg = DEFAULT
    scene = synthetic.default_scene()
    pose = Pose(jnp.eye(3), jnp.array([1.5, -0.7, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, sensor)
    img = projection.project_scan(pts, valid, sensor, ring=ring)
    seg = segmentation.segment(img, sensor, cfg.seg)
    f_xla = features.extract_features(
        img, seg, sensor, dataclasses.replace(feat_cfg, picks_backend="xla"))
    f_pl = features.extract_features(
        img, seg, sensor, dataclasses.replace(feat_cfg, picks_backend="pallas"))
    return f_xla, f_pl


@pytest.mark.parametrize("sensor_name", ["vlp16", "os1_16"])
def test_pallas_picks_match_xla(sensor_name):
    sensor = DEFAULT.sensor if sensor_name == "vlp16" else OS1_16
    f_xla, f_pl = _extract_both(sensor, DEFAULT.feat)

    # Edge picks have well-separated curvature values -> exact parity; the
    # same goes for the label<=0 complement (less_flat) and outliers.
    for name in ["sharp", "less_sharp", "less_flat", "outlier"]:
        a = getattr(f_xla, name)
        b = getattr(f_pl, name)
        assert (np.asarray(a.valid) == np.asarray(b.valid)).all(), name
        assert np.allclose(np.asarray(a.xyz), np.asarray(b.xyz)), name
        assert np.allclose(np.asarray(a.ring), np.asarray(b.ring)), name

    # Flat (ground) picks: perfectly flat ground has curvature ~0 and the two
    # compilations fuse the curvature sum differently (FMA contraction), so
    # the f32 LSBs — and therefore the tie order among equally-flat cells —
    # differ (the reference's unstable std::sort has the same property,
    # featureAssociation.cpp:699).  With the boosted default pick counts the
    # ground sections run dry, so differently-placed suppression chains can
    # also shift per-ring COUNTS by a pick or two.  The contract is
    # structural: near-identical per-ring pick counts, every pick on a ground
    # ring.  (Any flat subset of a plane constrains the surf solver's
    # [roll, pitch, z] identically, so pick positions are immaterial.)
    a, b = f_xla.flat, f_pl.flat
    na, nb = int(a.valid.sum()), int(b.valid.sum())
    assert abs(na - nb) <= max(4, na // 50)
    ra = np.asarray(a.ring)[np.asarray(a.valid)].astype(int)
    rb = np.asarray(b.ring)[np.asarray(b.valid)].astype(int)
    ha = np.bincount(ra, minlength=sensor.n_scan)
    hb = np.bincount(rb, minlength=sensor.n_scan)
    assert (np.abs(ha - hb) <= 4).all(), (ha.tolist(), hb.tolist())
    for rows in (ra, rb):
        # every flat pick lies on a ground ring of this scene
        assert (rows < sensor.ground_scan_ind + 1).all()
    assert int(f_pl.sharp.valid.sum()) > 0
    assert int(f_pl.flat.valid.sum()) > 0


@pytest.mark.parametrize("sensor_name", ["vlp16", "os1_16"])
def test_pallas_picks_exact_at_reference_counts(sensor_name):
    """At the reference's pick counts (2 sharp / 4 flat per section,
    featureAssociation.cpp:709,747) ground candidates are plentiful, no
    section runs dry, and the two backends must produce the IDENTICAL
    feature sets — the kernel-correctness anchor."""
    sensor = DEFAULT.sensor if sensor_name == "vlp16" else OS1_16
    fc = dataclasses.replace(DEFAULT.feat, edge_per_section=2,
                             surf_per_section=4)
    f_xla, f_pl = _extract_both(sensor, fc)
    for name in ["sharp", "less_sharp", "flat", "less_flat", "outlier"]:
        a = getattr(f_xla, name)
        b = getattr(f_pl, name)
        assert (np.asarray(a.valid) == np.asarray(b.valid)).all(), name
        assert np.allclose(np.asarray(a.ring), np.asarray(b.ring)), name
