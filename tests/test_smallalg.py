"""Closed-form 3x3/6x6 linear algebra vs jnp.linalg references."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.ops import smallalg


def _spd(key, n, d):
    A = jax.random.normal(key, (n, d, d))
    return A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(d)


def test_solve3_matches_linalg():
    key = jax.random.PRNGKey(0)
    A = _spd(key, 64, 3)
    b = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
    x = smallalg.solve3(A, b)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)


def test_solve3_singular_returns_zero():
    A = jnp.zeros((2, 3, 3))
    b = jnp.ones((2, 3))
    x = smallalg.solve3(A, b)
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_inv3_matches_linalg():
    key = jax.random.PRNGKey(2)
    A = _spd(key, 32, 3)
    np.testing.assert_allclose(
        np.asarray(smallalg.inv3(A)), np.asarray(jnp.linalg.inv(A)), atol=1e-4)


def test_eigvalsh3_matches_linalg():
    key = jax.random.PRNGKey(3)
    A = _spd(key, 128, 3)
    ev = smallalg.eigvalsh3(A)
    ev_ref = jnp.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_ref), rtol=1e-4,
                               atol=1e-4)


def test_eigh3x3_reconstruction_and_orthonormality():
    key = jax.random.PRNGKey(4)
    A = _spd(key, 128, 3)
    ev, V = smallalg.eigh3x3(A)
    # Orthonormal columns.
    VtV = jnp.swapaxes(V, -1, -2) @ V
    np.testing.assert_allclose(np.asarray(VtV),
                               np.broadcast_to(np.eye(3), (128, 3, 3)),
                               atol=1e-5)
    # A = V diag(ev) Vᵀ.
    recon = V @ (ev[..., None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), rtol=1e-3,
                               atol=1e-3)


def test_eigh3x3_repeated_eigenvalues():
    """Scalar and axis-aligned degenerate matrices must still produce an
    orthonormal basis."""
    A = jnp.stack([
        2.0 * jnp.eye(3),                                   # triple
        jnp.diag(jnp.array([1.0, 1.0, 5.0])),               # double low
        jnp.diag(jnp.array([1.0, 5.0, 5.0])),               # double high
    ])
    ev, V = smallalg.eigh3x3(A)
    VtV = jnp.swapaxes(V, -1, -2) @ V
    np.testing.assert_allclose(np.asarray(VtV),
                               np.broadcast_to(np.eye(3), (3, 3, 3)),
                               atol=1e-5)
    # fp32 Cardano roots carry ~4e-4 error exactly at repeated eigenvalues.
    recon = V @ (ev[..., None] * jnp.swapaxes(V, -1, -2))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=5e-3)


def test_solve6_spd_matches_linalg():
    key = jax.random.PRNGKey(5)
    A = _spd(key, 32, 6)
    b = jax.random.normal(jax.random.fold_in(key, 1), (32, 6))
    x = smallalg.solve6_spd(A, b)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3,
                               atol=2e-3)
