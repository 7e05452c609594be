"""Projection + segmentation tests against analytically-known synthetic scenes
(SURVEY.md §4 "golden-scan unit tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import VLP16, SegmentationConfig
from legoloam_tpu.ops import projection, segmentation
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scan():
    scene = synthetic.default_scene()
    pose = Pose(jnp.eye(3), jnp.array([0.0, 0.0, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, VLP16)
    return pts, valid, ring


@pytest.fixture(scope="module")
def img(scan):
    pts, valid, ring = scan
    return projection.project_scan(pts, valid, VLP16, ring=ring)


def test_projection_shape_and_masks(img):
    assert img.rng.shape == (16, 1800)
    assert img.xyz.shape == (16, 1800, 3)
    v = np.asarray(img.valid)
    # The courtyard scene: lower rings all hit ground/walls; plenty of returns.
    assert v.sum() > 10000
    r = np.asarray(img.rng)
    assert np.all(np.isfinite(r[v]))
    assert np.all(r[v] >= VLP16.min_range)
    assert np.all(np.isinf(r[~v]))


def test_projection_column_mapping(img, scan):
    """Column formula (imageProjection.cpp:233-242): each valid cell's stored
    point must project back to its own column."""
    v = np.asarray(img.valid)
    xyz = np.asarray(img.xyz)
    rows, cols = np.nonzero(v)
    x, y = xyz[rows, cols, 0], xyz[rows, cols, 1]
    horizon = np.degrees(np.arctan2(x, y))
    col2 = (-np.round((horizon - 90.0) / VLP16.ang_res_x_deg)).astype(int) + 900
    col2 = np.where(col2 >= 1800, col2 - 1800, col2)
    assert np.mean(col2 == cols) > 0.999


def test_projection_ring_consistency(img):
    """Each cell's stored elevation must match its ring's beam angle."""
    v = np.asarray(img.valid)
    xyz = np.asarray(img.xyz)
    rows, cols = np.nonzero(v)
    elev = np.degrees(
        np.arctan2(xyz[rows, cols, 2] - 0.0,
                   np.hypot(xyz[rows, cols, 0], xyz[rows, cols, 1]))
    )
    # Beam angles are sensor-frame; points are sensor-frame here (pose only
    # shifted z, but raycast returns sensor-frame coords) so exact match.
    expected = -15.0 + 2.0 * rows
    np.testing.assert_allclose(elev, expected, atol=0.2)


def test_projection_min_range_drop():
    pts = jnp.array([[0.5, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
    valid = jnp.array([True, True])
    ring = jnp.array([7, 7], jnp.int32)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)
    assert int(img.valid.sum()) == 1  # the 0.5 m point is dropped (min_range=1)


def test_projection_closest_wins():
    """Two points in the same cell: the closer one must be kept (deterministic
    improvement over the reference's last-write-wins)."""
    pts = jnp.array([[10.0, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
    valid = jnp.array([True, True])
    ring = jnp.array([7, 7], jnp.int32)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)
    v = np.asarray(img.valid)
    assert v.sum() == 1
    r, c = np.argwhere(v)[0]
    np.testing.assert_allclose(np.asarray(img.rng)[r, c], 5.0, atol=1e-5)


def test_ground_removal_flat_world(img):
    """With sensor at 0.8 m over a flat courtyard, the bottom rings hitting the
    plane must be flagged ground; wall hits must not."""
    seg_cfg = SegmentationConfig()
    ground = segmentation.ground_removal(img, VLP16, seg_cfg)
    g = np.asarray(ground)
    xyz = np.asarray(img.xyz)
    v = np.asarray(img.valid)
    z = xyz[..., 2]
    true_ground = v & (np.abs(z + 0.8) < 0.05)  # plane z=0 is at z=-0.8 sensor-frame
    # Most plane points in rings 0..7 should be marked.
    in_rows = np.zeros_like(g)
    in_rows[: VLP16.ground_scan_ind + 1] = True
    recall = g[true_ground & in_rows].mean() if (true_ground & in_rows).any() else 0
    assert recall > 0.9
    # No wall (vertical surface) points marked ground.
    wall = v & (z > 0.3)
    assert g[wall].mean() < 0.01


def test_segmentation_clusters_valid(img):
    seg = segmentation.segment(img, VLP16, SegmentationConfig())
    lab = np.asarray(seg.label)
    segm = np.asarray(seg.segmented)
    v = np.asarray(img.valid)
    # Walls and buildings form valid clusters -> many segmented non-ground points.
    assert (segm & ~np.asarray(seg.seg_ground_flag)).sum() > 1000
    # Labels of segmented non-ground cells are real roots (not sentinels).
    core = segm & ~np.asarray(seg.seg_ground_flag)
    assert np.all(lab[core] >= 0)
    assert np.all(lab[core] < 16 * 1800)
    assert int(seg.n_clusters) >= 4  # several walls/buildings visible
    # Ground cells excluded from clustering.
    assert np.all(lab[np.asarray(seg.ground)] == -1)


def test_segmentation_pole_is_small_valid_cluster():
    """A lone pole: few points but spanning >=3 rings -> valid by the line rule
    (imageProjection.cpp:448-451)."""
    scene = synthetic.Scene(
        boxes=jnp.zeros((1, 6), jnp.float32).at[0].set(
            jnp.array([500, 500, 0, 501, 501, 1])),  # far away, irrelevant
        cylinders=jnp.array([[4.0, 0.0, 0.12, 4.0]], jnp.float32),
    )
    pose = Pose(jnp.eye(3), jnp.array([0.0, 0.0, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, VLP16)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)
    seg = segmentation.segment(img, VLP16, SegmentationConfig())
    xyz = np.asarray(img.xyz)
    v = np.asarray(img.valid)
    pole = v & (np.abs(xyz[..., 0] - 4.0) < 0.3) & (np.abs(xyz[..., 1]) < 0.3) \
        & (xyz[..., 2] > -0.7)
    assert pole.sum() >= 3
    segm = np.asarray(seg.segmented)
    assert segm[pole].mean() > 0.9


def test_segmentation_isolated_specks_are_outliers():
    """Single floating points (no neighbors) must be invalid clusters."""
    # A scan with a few isolated returns: place 3 points manually.
    pts = jnp.array(
        [[10.0, 0.0, 1.0], [8.0, 5.0, 1.5], [-7.0, -3.0, 2.0]], jnp.float32
    )
    valid = jnp.ones(3, bool)
    ring = jnp.array([10, 11, 12], jnp.int32)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)
    seg = segmentation.segment(img, VLP16, SegmentationConfig())
    assert int(seg.n_clusters) == 0
    assert not bool(np.asarray(seg.segmented).any())
    lab = np.asarray(seg.label)
    assert np.all(lab[np.asarray(img.valid)] == segmentation.OUTLIER_LABEL)


def test_projection_empty_scan():
    """All-invalid scan: every output masked, rel_time exactly zero (the
    empty-scan guard), segmentation survives with zero clusters."""
    p = VLP16.n_points
    pts = jnp.zeros((p, 3), jnp.float32)
    valid = jnp.zeros((p,), bool)
    ring = jnp.zeros((p,), jnp.int32)
    img = projection.project_scan(pts, valid, VLP16, ring=ring)
    assert not bool(jnp.any(img.valid))
    np.testing.assert_array_equal(np.asarray(img.rel_time), 0.0)
    assert np.all(np.isfinite(np.asarray(img.xyz)))
    seg = segmentation.segment(img, VLP16, SegmentationConfig())
    assert int(seg.n_clusters) == 0
    assert not bool(jnp.any(seg.segmented))
