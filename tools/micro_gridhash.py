#!/usr/bin/env python
"""Micro-bench: gridhash build+query vs brute-force kNN at mapping sizes."""

import argparse
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
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:9.3f} ms")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.ops import gridhash
    from legoloam_tpu.ops.knn_pallas import knn_pallas
    from legoloam_tpu.ops.voxel import knn

    key = jax.random.PRNGKey(0)
    # Surf sizes: 8192 queries, 32768 refs spread over a 100m x 100m x 10m box
    # at ~0.4m spacing (realistic submap density).
    ref_s = jax.random.uniform(key, (32768, 3)) * jnp.array([100.0, 100.0, 10.0])
    q_s = jax.random.uniform(jax.random.PRNGKey(1), (8192, 3)) * \
        jnp.array([100.0, 100.0, 10.0])
    rv = jnp.ones(32768, bool)
    qv = jnp.ones(8192, bool)

    ref_c = ref_s[:8192]
    q_c = q_s[:2048]
    rvc = rv[:8192]
    qvc = qv[:2048]

    build = jax.jit(lambda p, v: gridhash.build_grid(p, v, 1.0))
    g_s = timed("build_grid surf (32768)", build, ref_s, rv)
    g_c = timed("build_grid corner (8192)", build, ref_c, rvc)

    q5 = jax.jit(lambda g, q, v: gridhash.query_knn(g, q, v, 5))
    timed("query_knn surf (8192q)", q5, g_s, q_s, qv)
    timed("query_knn corner (2048q)", q5, g_c, q_c, qvc)

    timed("knn_pallas surf (8192x32768)",
          jax.jit(lambda q, v, r, rv_: knn_pallas(q, v, r, rv_, k=5)),
          q_s, qv, ref_s, rv)
    timed("knn_pallas corner (2048x8192)",
          jax.jit(lambda q, v, r, rv_: knn_pallas(q, v, r, rv_, k=5)),
          q_c, qvc, ref_c, rvc)

    # correctness cross-check vs brute force within the 1m gate
    d_g, i_g = q5(g_s, q_s, qv)
    d_b, i_b = knn(q_s, qv, ref_s, rv, k=5)
    gate = np.asarray(d_b[:, 4]) < 1.0
    dg = np.asarray(d_g)[gate]
    db = np.asarray(d_b)[gate]
    print("gated queries:", gate.sum(), "/", gate.size,
          " max |d_grid - d_brute| on gated:", np.abs(dg - db).max())


if __name__ == "__main__":
    main()
