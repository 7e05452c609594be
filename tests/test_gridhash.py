"""Grid-hash k-NN vs brute force: complete within one cell radius."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.ops import gridhash, voxel


def test_gridhash_matches_bruteforce_within_radius():
    key = jax.random.PRNGKey(0)
    # Dense enough that most queries have 5 neighbors within the 1 m cell.
    r = jax.random.uniform(key, (5000, 3)) * jnp.array([10.0, 10.0, 4.0])
    q = jax.random.uniform(jax.random.fold_in(key, 1), (800, 3)) \
        * jnp.array([10.0, 10.0, 4.0])
    rv = jnp.ones(5000, bool)
    qv = jnp.ones(800, bool)
    cell = 1.0
    grid = gridhash.build_grid(r, rv, cell)
    gd, gi = gridhash.query_knn(grid, q, qv, k=5)
    bd, bi = voxel.knn(q, qv, r, rv, k=5)
    gd, gi, bd, bi = map(np.asarray, (gd, gi, bd, bi))
    # Wherever brute force finds 5 NN all within the cell radius, the grid
    # must agree exactly.
    covered = bd[:, 4] < cell * cell
    assert covered.sum() > 400  # the scene is dense enough for the test to bite
    np.testing.assert_allclose(gd[covered], bd[covered], atol=1e-4)
    assert (gi[covered] == bi[covered]).mean() > 0.999


def test_gridhash_respects_validity():
    r = jnp.array([[0.5, 0.5, 0.5], [0.6, 0.5, 0.5], [0.4, 0.5, 0.5]])
    rv = jnp.array([True, False, True])
    grid = gridhash.build_grid(r, rv, 1.0)
    d, i = gridhash.query_knn(grid, jnp.array([[0.5, 0.5, 0.5]]),
                              jnp.ones(1, bool), k=2)
    # The invalid middle point must not appear.
    got = set(np.asarray(i[0]).tolist())
    assert 1 not in got
    np.testing.assert_allclose(np.asarray(d[0, 0]), 0.0, atol=1e-6)


def test_gridhash_empty():
    r = jnp.zeros((10, 3))
    grid = gridhash.build_grid(r, jnp.zeros(10, bool), 1.0)
    d, i = gridhash.query_knn(grid, jnp.zeros((4, 3)), jnp.ones(4, bool), k=3)
    assert np.all(np.asarray(d) > 1e9)  # nothing within range
