#!/usr/bin/env python
"""Micro-bench of sort/scatter/segment_sum primitives at submap sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timed(name, fn, *a, iters=20):
    r = fn(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    _sync(r)
    print(f"{name:52s} {(time.perf_counter() - t0) / iters * 1e3:9.3f} ms")
    return r


def main():
    N = 50 * 8192            # submap surf input size
    T = 65536
    key = jax.random.PRNGKey(0)
    h = jax.random.randint(key, (N,), 0, 1 << 30).astype(jnp.uint32)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 100.0
    gid = (h % (1 << 15)).astype(jnp.int32)
    slot = (h % T).astype(jnp.int32)
    packed = (h.astype(jnp.uint32) << jnp.uint32(2)).astype(jnp.uint32)

    timed("argsort u32 (409K)", jax.jit(lambda x: jnp.argsort(x)), h)
    timed("sort u32 (409K)", jax.jit(lambda x: jnp.sort(x)), h)
    timed("segment_sum 409K->32K (4ch)",
          jax.jit(lambda p, g: jax.ops.segment_sum(
              jnp.concatenate([p, jnp.ones((N, 1))], 1), g,
              num_segments=(1 << 15) + 1)), pts, gid)
    timed("scatter-min u32 409K->65K",
          jax.jit(lambda s, v: jnp.full((T,), jnp.uint32(0xFFFFFFFF)
                                        ).at[s].min(v)), slot, packed)
    timed("scatter-add 409K->65K (4ch)",
          jax.jit(lambda s, p: jnp.zeros((T, 4)).at[s].add(
              jnp.concatenate([p, jnp.ones((N, 1))], 1))), slot, pts)
    timed("cumsum 65K", jax.jit(lambda v: jnp.cumsum(v)),
          jnp.ones((T,), jnp.int32))
    timed("gather 32K from 65K",
          jax.jit(lambda i: pts[:T][i]),
          jnp.arange(1 << 15, dtype=jnp.int32))
    # one-hot matmul alternative for segment ops? too big here. skip.


if __name__ == "__main__":
    main()
