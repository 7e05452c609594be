"""Pallas pick kernel vs the XLA dense-trip path: identical feature sets."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT, OS1_16
from legoloam_tpu.ops import features, projection, segmentation
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


@pytest.mark.parametrize("sensor_name", ["vlp16", "os1_16"])
def test_pallas_picks_match_xla(sensor_name):
    cfg = DEFAULT
    sensor = cfg.sensor if sensor_name == "vlp16" else OS1_16
    scene = synthetic.default_scene()
    pose = Pose(jnp.eye(3), jnp.array([1.5, -0.7, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, sensor)
    img = projection.project_scan(pts, valid, sensor, ring=ring)
    seg = segmentation.segment(img, sensor, cfg.seg)

    f_xla = features.extract_features(
        img, seg, sensor, dataclasses.replace(cfg.feat, picks_backend="xla"))
    f_pl = features.extract_features(
        img, seg, sensor,
        dataclasses.replace(cfg.feat, picks_backend="pallas"))

    # Edge picks have well-separated curvature values -> exact parity; the
    # same goes for the label<=0 complement (less_flat) and outliers.
    for name in ["sharp", "less_sharp", "less_flat", "outlier"]:
        a = getattr(f_xla, name)
        b = getattr(f_pl, name)
        assert (np.asarray(a.valid) == np.asarray(b.valid)).all(), name
        assert np.allclose(np.asarray(a.xyz), np.asarray(b.xyz)), name
        assert np.allclose(np.asarray(a.ring), np.asarray(b.ring)), name

    # Flat (ground) picks: perfectly flat ground has curvature ~0 up to f32
    # summation order, which differs between the Mosaic and XLA compilations,
    # so equally-flat cells may swap (the reference's unstable std::sort has
    # the same property, featureAssociation.cpp:699).  The contract is
    # structural: same number of picks from the same rings, all on ground.
    a, b = f_xla.flat, f_pl.flat
    assert (np.asarray(a.valid) == np.asarray(b.valid)).all()
    assert (np.asarray(a.ring) == np.asarray(b.ring)).all()
    gz = np.asarray(seg.ground)
    for cloud in (a, b):
        v = np.asarray(cloud.valid)
        rows = np.asarray(cloud.ring)[v].astype(int)
        # every flat pick lies on a ground ring of this scene
        assert (rows < sensor.ground_scan_ind + 1).all()
    assert int(f_pl.sharp.valid.sum()) > 0
    assert int(f_pl.flat.valid.sum()) > 0
