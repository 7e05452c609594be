"""Data-parallel frontend: independent scans fanned out over the mesh.

The per-scan frontend (projection -> segmentation -> features) has no
cross-scan state, so offline/batch workloads (map building from a recorded
sequence, BASELINE.json config 3) process ``n_devices`` scans per step: the
batch axis is sharded over the ``data`` mesh axis and XLA runs each scan's
pipeline on its own chip with zero communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..models.pipeline import process_scan


def make_batched_frontend(cfg: PipelineConfig, mesh: Mesh, axis: str = "data"):
    """Returns a jitted function (points (B,P,3), valid (B,P), ring (B,P)) ->
    ScanFeatures batched on axis 0, with the batch sharded over the mesh."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    batched = jax.vmap(lambda p, v, r: process_scan(p, v, r, cfg))
    fn = jax.jit(
        batched,
        in_shardings=(shard, shard, shard),
    )
    return fn
