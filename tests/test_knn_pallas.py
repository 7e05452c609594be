"""Pallas single-distance-pass k-NN vs the XLA multi-pass path."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.ops.knn_pallas import knn_pallas
from legoloam_tpu.ops.voxel import knn


def test_knn_pallas_matches_xla():
    key = jax.random.PRNGKey(3)
    kq, kr, kv = jax.random.split(key, 3)
    q = jax.random.uniform(kq, (512, 3), minval=-30, maxval=30)
    r = jax.random.uniform(kr, (4096, 3), minval=-30, maxval=30)
    qv = jnp.ones((512,), bool).at[7].set(False)
    rv = jax.random.uniform(kv, (4096,)) > 0.1

    d_x, i_x = knn(q, qv, r, rv, k=5)
    d_p, i_p = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=1024, interpret=True)

    assert np.allclose(np.asarray(d_x), np.asarray(d_p), rtol=1e-5,
                       atol=1e-3), np.abs(np.asarray(d_x - d_p)).max()
    # Indices match wherever distances are unique (random floats: everywhere).
    assert (np.asarray(i_x) == np.asarray(i_p)).mean() > 0.999


def test_knn_pallas_invalid_query_rows():
    q = jnp.zeros((256, 3))
    r = jnp.ones((2048, 3))
    qv = jnp.zeros((256,), bool)
    rv = jnp.ones((2048,), bool)
    d, i = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=2048, interpret=True)
    assert bool((d > 1e29).all())
