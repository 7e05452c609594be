"""Pallas single-distance-pass culled k-NN vs the XLA multi-pass path.

The kernel packs the reference index into the low mantissa bits of the f32
distance (knn_pallas.py docstring), so distances are quantized DOWNWARD by at
most 2^-(23 - idx_bits) relative — 2^-11 at 4096 refs.  Index picks can
differ from the exact path only where two neighbors are within that
quantization of each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.ops.knn_pallas import knn_pallas
from legoloam_tpu.ops.voxel import knn


def _rand_sets(n_q=512, n_r=4096):
    key = jax.random.PRNGKey(3)
    kq, kr, kv = jax.random.split(key, 3)
    q = jax.random.uniform(kq, (n_q, 3), minval=-30, maxval=30)
    r = jax.random.uniform(kr, (n_r, 3), minval=-30, maxval=30)
    qv = jnp.ones((n_q,), bool).at[7].set(False)
    rv = jax.random.uniform(kv, (n_r,)) > 0.1
    return q, qv, r, rv


def test_knn_pallas_matches_xla():
    q, qv, r, rv = _rand_sets()
    d_x, i_x = knn(q, qv, r, rv, k=5)
    d_p, i_p = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=1024, interpret=True)

    dx, dp = np.asarray(d_x), np.asarray(d_p)
    m = dx < 1e20
    # Quantization rounds down, never up, and by at most 2^-11 relative.
    assert (dp[m] <= dx[m] + 1e-6).all()
    rel = np.abs(dx[m] - dp[m]) / np.maximum(dx[m], 1e-9)
    assert rel.max() < 2.0 ** -10, rel.max()
    # Indices match except at sub-quantization ties.
    assert (np.asarray(i_x) == np.asarray(i_p)).mean() > 0.99


def test_knn_pallas_gated_culling_exact_within_gate():
    """With a gate, results must be exact for every query whose true 5th
    neighbor is inside the gate — regardless of reference ordering."""
    q, qv, r, rv = _rand_sets()
    d_x, i_x = knn(q, qv, r, rv, k=5)
    # Spatially sort the references (what voxel_downsample's Morton order
    # provides in production) so culling actually skips chunks.
    order = jnp.argsort(r[:, 0] + 1000.0 * jnp.floor(r[:, 1] / 5.0))
    r_s, rv_s = r[order], rv[order]
    d_g, i_g = knn_pallas(q, qv, r_s, rv_s, k=5, tq=256, rc=512, gate=5.0,
                          interpret=True)
    dx = np.asarray(d_x)
    dg = np.asarray(d_g)
    back = np.asarray(order)[np.asarray(i_g)]     # sorted idx -> original idx
    gate_rows = (dx[:, 4] < 25.0) & np.asarray(qv)
    # Same 5th-NN gate decision as exact search on every gated row.
    rel = np.abs(dx[gate_rows] - dg[gate_rows]) / np.maximum(
        dx[gate_rows], 1e-9)
    assert rel.max() < 2.0 ** -10, rel.max()
    assert (back[gate_rows] == np.asarray(i_x)[gate_rows]).mean() > 0.99


def test_knn_pallas_gate_decision_matches():
    """The caller's acceptance test d[:,4] < gate² must be decided
    identically with and without culling."""
    q, qv, r, rv = _rand_sets(n_q=256, n_r=2048)
    d_x, _ = knn(q, qv, r, rv, k=5)
    d_g, _ = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=512, gate=1.0,
                        interpret=True)
    acc_x = np.asarray(d_x[:, 4]) < 1.0
    acc_g = np.asarray(d_g[:, 4]) < 1.0
    assert (acc_x == acc_g).all()


def test_knn_pallas_invalid_query_rows():
    q = jnp.zeros((256, 3))
    r = jnp.ones((2048, 3))
    qv = jnp.zeros((256,), bool)
    rv = jnp.ones((2048,), bool)
    d, i = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=2048, interpret=True)
    assert bool((d > 1e29).all())


def test_knn_pallas_all_refs_invalid():
    q = jnp.zeros((256, 3))
    r = jnp.ones((2048, 3))
    qv = jnp.ones((256,), bool)
    rv = jnp.zeros((2048,), bool)
    d, i = knn_pallas(q, qv, r, rv, k=5, tq=256, rc=512, gate=1.0,
                      interpret=True)
    # No candidate inside the gate -> 5th distance must fail the gate.
    assert bool((d[:, 4] >= 1.0).all())
