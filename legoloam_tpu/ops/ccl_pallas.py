"""Pallas TPU kernel for connected-component label propagation + stats.

The XLA path (``segmentation._label_propagation``) lowers each segmented
min-scan to log-depth slice/concat chains that bounce the (N_SCAN, H) label
grid through HBM a few hundred times per scan.  The grid is ~115 KB — it fits
in VMEM ~100x over — so this kernel keeps labels, connectivity masks, and the
scan carry entirely on-chip and runs ALL sweeps in one launch: the only HBM
traffic is one read of the inputs and one write of the results.

Alongside the labels the kernel propagates each component's MIN and MAX ring
index with the same connectivity gating (min-/max-combine travel exactly the
same paths as the min-label), so the cluster ring-span validity statistic
(imageProjection.cpp:436-446) comes out of the kernel for free instead of
costing segment reductions in XLA; 4-connected components occupy a contiguous
ring interval, so span = rmax - rmin + 1 equals the reference's distinct-ring
count.

Algorithm (identical equivalence classes as the XLA path, converges at least
as fast): per sweep
  1. forward + backward segmented scans along rows (Hillis-Steele with
     ``pltpu.roll``; runs are cut at the column-wrap seam),
  2. a seam merge (combine across the wrap edge) followed by a second
     fwd+bwd pass, which together reproduce the circular-run semantics the
     XLA path gets from array doubling,
  3. downward + upward segmented scans along columns.
Applying the scans SEQUENTIALLY (each on the previous result) instead of
min-combining parallel scans only accelerates convergence: labels decrease
monotonically and every decrease travels a real connectivity path.

Reference behavior being replaced: queue BFS ``labelComponents``
(``src/imageProjection.cpp:370-460``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_w(h: int) -> int:
    return ((h + _LANE - 1) // _LANE) * _LANE


def _ccl_kernel(lab_ref, rmax_ref, cfwd_ref, cbwd_ref, cdown_ref,
                cup_ref, seam_ref, lab_out, rmax_out, *,
                sweeps: int, h: int, big: int):
    n, w = lab_ref.shape
    bigv = jnp.int32(big)
    negv = jnp.int32(-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, w), dimension=1)
    seam_cols = (col == 0) | (col == h - 1)

    # TWO planes propagate in lockstep (label min-combine, ring-max
    # max-combine).  The ring MIN needs no plane at all: labels are root
    # flat indices, the root is the component's minimum flat index, and
    # row-major order puts that in the component's minimum ring — so
    # rmin == label // h, derived for free after convergence.
    def combine_all(planes, shifted, conn):
        lab = jnp.minimum(planes[0], jnp.where(conn, shifted[0], bigv))
        rmx = jnp.maximum(planes[1], jnp.where(conn, shifted[1], negv))
        return (lab, rmx)

    def scan(planes, c_init, axis, size, fwd):
        c = c_init
        d = 1
        while d < size:
            s = d if fwd else size - d      # positive-only circular shifts
            shifted = tuple(pltpu.roll(p, s, axis=axis) for p in planes)
            conn = c != 0
            planes = combine_all(planes, shifted, conn)
            c = c & pltpu.roll(c, s, axis=axis)
            d *= 2
        return planes

    planes = (lab_ref[:], rmax_ref[:])
    cfwd = cfwd_ref[:]
    cbwd = cbwd_ref[:]
    cdown = cdown_ref[:]
    cup = cup_ref[:]
    seam = seam_ref[:] != 0     # (n, w) broadcast seam-connectivity flag

    def one_sweep(planes):
        planes = scan(planes, cfwd, 1, w, True)
        planes = scan(planes, cbwd, 1, w, False)
        # Seam merge: rows whose wrap edge is connected share the combined
        # value of their two seam cells; the second fwd+bwd pass spreads it
        # through both border runs (= circular-run semantics).
        lab, rmx = planes
        sl = jnp.min(jnp.where(seam_cols, lab, bigv), axis=1, keepdims=True)
        sx = jnp.max(jnp.where(seam_cols, rmx, negv), axis=1, keepdims=True)
        on = seam & seam_cols
        planes = (
            jnp.where(on, jnp.minimum(lab, sl), lab),
            jnp.where(on, jnp.maximum(rmx, sx), rmx),
        )
        planes = scan(planes, cfwd, 1, w, True)
        planes = scan(planes, cbwd, 1, w, False)
        planes = scan(planes, cdown, 0, n, True)
        planes = scan(planes, cup, 0, n, False)
        return planes

    # Sweep to FIXPOINT (``sweeps`` is an upper bound): at the fixpoint the
    # partition equals the reference BFS's connected components exactly —
    # same contract as segmentation._label_propagation.  The convergence
    # check is one on-chip compare+reduce per sweep; realistic scans stop
    # after <= 6 sweeps.
    def cond(st):
        _, i, changed = st
        return changed & (i < sweeps)

    def body(st):
        planes, i, _ = st
        new = one_sweep(planes)
        return new, i + 1, jnp.any(new[0] != planes[0])

    planes, _, _ = jax.lax.while_loop(
        cond, body, (one_sweep(planes), jnp.int32(1), jnp.bool_(True)))

    lab_out[:] = planes[0]
    rmax_out[:] = planes[1]


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def label_propagation_pallas(seed_mask: jax.Array, conn_h: jax.Array,
                             conn_v: jax.Array, sweeps: int,
                             interpret: bool = False):
    """Label propagation + per-component ring extrema in one VMEM-resident
    kernel.  Same label contract as ``segmentation._label_propagation`` (root
    flat-index labels; non-seeds get n_cells); additionally returns per-cell
    (ring_min, ring_max) over the cell's component, read back from each
    component's ROOT cell so the statistic is consistent with the final
    partition."""
    n, h = seed_mask.shape
    w = _pad_w(h)
    n_cells = n * h
    big = n_cells

    labels = jnp.where(
        seed_mask,
        jnp.arange(n_cells, dtype=jnp.int32).reshape(n, h),
        jnp.int32(big),
    )
    ring = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, h))
    rmax0 = jnp.where(seed_mask, ring, -1)

    conn_h = conn_h & seed_mask & jnp.roll(seed_mask, -1, axis=1)
    conn_v = conn_v & seed_mask[:-1] & seed_mask[1:]

    # Linear-run connectivity carries: cfwd[j] = connected to column j-1
    # (seam blocked — handled by the in-kernel merge); cbwd[j] = to j+1.
    cfwd = jnp.roll(conn_h, 1, axis=1).at[:, 0].set(False)
    cbwd = conn_h.at[:, h - 1].set(False)
    f = jnp.zeros((1, h), bool)
    cdown = jnp.concatenate([f, conn_v], axis=0)   # connected to row above
    cup = jnp.concatenate([conn_v, f], axis=0)     # connected to row below
    seam = jnp.broadcast_to(conn_h[:, h - 1:h], (n, h))  # wrap connectivity

    def pad(a, fill):
        return jnp.pad(a.astype(jnp.int32), ((0, 0), (0, w - h)),
                       constant_values=fill)

    shp = jax.ShapeDtypeStruct((n, w), jnp.int32)
    lab, rmx = pl.pallas_call(
        functools.partial(_ccl_kernel, sweeps=sweeps, h=h, big=big),
        out_shape=(shp, shp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(pad(labels, big), pad(rmax0, -1), pad(cfwd, 0),
      pad(cbwd, 0), pad(cdown, 0), pad(cup, 0), pad(seam, 0))

    labels = lab[:, :h]
    # Pointer-jump compression canonicalizes stragglers to their root
    # (shared with the XLA path).
    flat = jnp.concatenate([labels.reshape(-1), jnp.array([big])])
    flat = flat[flat[:n_cells]]
    flat = jnp.concatenate([flat, jnp.array([big])])[flat]
    labels = flat[:n_cells]
    # Ring MIN is structural: labels are root flat ids and the root (the
    # component's minimum flat index, row-major) sits in the minimum ring,
    # so rmin == label // h; non-seeds (label == n*h) land on the sentinel
    # value n, matching the XLA fallback's neutral.  Ring MAX reads from
    # the component root's propagated plane.
    ring_min = (labels // h).reshape(n, h)
    rmx_flat = jnp.concatenate([rmx[:, :h].reshape(-1), jnp.array([-1])])
    ring_max = rmx_flat[labels].reshape(n, h)
    return labels.reshape(n, h), ring_min, ring_max
