"""Arithmetic masking helpers — workarounds for the axon TPU backend's
pathological ``select`` handling.

Measured behavior (2026-08, axon + TPU v5 lite): executing any program that
contains a ``select`` (jnp.where) over an array of roughly >=1M elements costs
~27 ms AND permanently degrades every subsequent dispatch in the process to a
~27 ms floor (normal dispatch: ~0.1 ms).  Fused matmul+broadcast chains,
sorts, top_k, gathers, and scatters at the same sizes are unaffected.

The fix is to express large masked fills arithmetically (multiply-add), which
lowers to plain VPU mul/add.  Fill values must be FINITE (0 * inf = NaN).
Small selects (< ~100K elements) are fine and kept as jnp.where for clarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_fill(x: jax.Array, keep: jax.Array, fill) -> jax.Array:
    """x where keep else fill, as arithmetic: x*m + fill*(1-m).

    keep broadcasts against x; fill must be finite.  Works for float and int
    dtypes (int path uses multiply in the same dtype)."""
    m = keep.astype(x.dtype)
    return x * m + jnp.asarray(fill, x.dtype) * (1 - m)


def masked_fill_u32(x: jax.Array, keep: jax.Array, fill) -> jax.Array:
    m = keep.astype(jnp.uint32)
    return x * m + jnp.uint32(fill) * (jnp.uint32(1) - m)
