"""Voxel downsample + brute-force KNN tests (the PCL VoxelGrid/KdTreeFLANN
replacements, SURVEY.md §2 N1/N2)."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.ops import voxel


def test_voxel_downsample_centroids():
    # Two clusters of 4 points each in distinct 1m voxels + 1 isolated point.
    pts = jnp.array(
        [
            [0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.1, 0.2], [0.2, 0.1, 0.1],
            [5.1, 5.1, 0.1], [5.2, 5.3, 0.2], [5.3, 5.2, 0.1], [5.2, 5.2, 0.2],
            [9.5, 0.5, 0.5],
        ],
        jnp.float32,
    )
    valid = jnp.ones(9, bool)
    out, ov = voxel.voxel_downsample(pts, valid, 1.0, cap=16)
    got = np.asarray(out)[np.asarray(ov)]
    assert got.shape[0] == 3
    expected = {
        (0.2, 0.125, 0.15),
        (5.2, 5.2, 0.15),
        (9.5, 0.5, 0.5),
    }
    for e in expected:
        assert np.min(np.abs(got - np.array(e)).sum(axis=1)) < 1e-4


def test_voxel_downsample_respects_validity():
    pts = jnp.array([[0.1, 0.1, 0.1], [100.0, 100.0, 100.0]], jnp.float32)
    valid = jnp.array([True, False])
    out, ov = voxel.voxel_downsample(pts, valid, 1.0, cap=8)
    assert int(ov.sum()) == 1
    np.testing.assert_allclose(np.asarray(out)[np.asarray(ov)][0],
                               [0.1, 0.1, 0.1], atol=1e-5)


def test_voxel_downsample_empty():
    pts = jnp.zeros((10, 3))
    out, ov = voxel.voxel_downsample(pts, jnp.zeros(10, bool), 0.5, cap=8)
    assert int(ov.sum()) == 0


def test_knn_matches_bruteforce_numpy():
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (300, 3)) * 20
    r = jax.random.uniform(jax.random.fold_in(key, 1), (5000, 3)) * 20
    qv = jnp.ones(300, bool)
    rv = jnp.ones(5000, bool)
    d, i = voxel.knn(q, qv, r, rv, k=5, q_tile=128, r_tile=1024)
    dn = np.asarray(d)
    inn = np.asarray(i)
    # NumPy reference.
    full = ((np.asarray(q)[:, None, :] - np.asarray(r)[None, :, :]) ** 2).sum(-1)
    ref_i = np.argsort(full, axis=1)[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(dn, ref_d, atol=1e-3)
    # Indices can differ on exact ties; distances must match.
    match = (np.sort(inn, 1) == np.sort(ref_i, 1)).mean()
    assert match > 0.999


def test_knn_masks():
    q = jnp.array([[0.0, 0.0, 0.0]])
    r = jnp.array([[1.0, 0, 0], [0.5, 0, 0], [2.0, 0, 0]])
    rv = jnp.array([True, False, True])  # the closest ref is invalid
    d, i = voxel.knn(q, jnp.ones(1, bool), r, rv, k=2)
    np.testing.assert_allclose(np.asarray(d[0]), [1.0, 4.0], atol=1e-5)
    assert list(np.asarray(i[0])) == [0, 2]
    # Invalid query -> BIG distances.
    d2, _ = voxel.knn(q, jnp.zeros(1, bool), r, rv, k=2)
    assert np.all(np.asarray(d2) > 1e29)


def test_voxel_downsample_overflow_counted():
    """Occupied voxels beyond the cap are dropped AND counted
    (no-silent-caps; voxel.voxel_downsample return_overflow)."""
    # 100 points in 100 distinct 1m voxels, cap 64 -> 36 dropped.
    pts = jnp.stack([jnp.arange(100.0) * 2.0, jnp.zeros(100),
                     jnp.zeros(100)], axis=-1)
    out, ok, overflow = voxel.voxel_downsample(
        pts, jnp.ones(100, bool), 1.0, 64, origin=jnp.zeros(3),
        return_overflow=True)
    assert int(ok.sum()) == 64
    assert int(overflow) == 36
    # Under the cap: zero overflow.
    _, ok2, of2 = voxel.voxel_downsample(
        pts, jnp.ones(100, bool), 1.0, 128, origin=jnp.zeros(3),
        return_overflow=True)
    assert int(ok2.sum()) == 100 and int(of2) == 0
