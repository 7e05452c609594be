#!/usr/bin/env python
"""Micro-benchmarks of primitive op costs on the current backend, each inside
a 32-iteration lax.scan with a data dependency (carry threads through the op)
so nothing hoists, divided out per call."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as _np


def _sync(out):
    """Real device sync: jax.block_until_ready is a NO-OP on the axon
    backend (verified 2026-08-18); fetching a scalar to host is the only
    reliable barrier."""
    leaf = jax.tree.leaves(out)[0]
    _np.asarray(jax.tree.leaves(out)[-1]); _np.asarray(leaf)
    return out

L = 32


def timed(name, prog, args):
    out = prog(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = prog(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / (10 * L) * 1e3
    print(f"{name:44s} {ms:8.3f} ms")


def dep_scan(body):
    """scan with scalar carry threaded through the op output."""
    @jax.jit
    def prog(tick, *args):
        def f(c, _):
            r = body(c, *args)
            return r, ()
        c, _ = jax.lax.scan(f, tick, None, length=L)
        return c
    return prog


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    key = jax.random.PRNGKey(0)
    x28k = jax.random.uniform(key, (28800,))
    u28k = (x28k * 4e9).astype(jnp.uint32)
    i28k = (x28k * 28799).astype(jnp.int32)
    pts = jax.random.uniform(key, (28800, 3))
    g1800 = jax.random.uniform(key, (16, 1800))
    tick = jnp.float32(0.0)

    cases = [
        ("argsort 28.8K u32",
         lambda c, u: jnp.argsort(u + c.astype(jnp.uint32)).sum().astype(
             jnp.float32) * 1e-9 + c * 0, (u28k,)),
        ("sort 28.8K u32",
         lambda c, u: jnp.sort(u + c.astype(jnp.uint32)).sum().astype(
             jnp.float32) * 1e-9 + c * 0, (u28k,)),
        ("segment_sum 28.8K -> 8K",
         lambda c, x, i: jax.ops.segment_sum(
             x + c, i % 8192, num_segments=8193).sum() * 1e-9 + c * 0,
         (x28k, i28k)),
        ("segment_sum 28.8K -> 28.8K",
         lambda c, x, i: jax.ops.segment_sum(
             x + c, i, num_segments=28801).sum() * 1e-9 + c * 0,
         (x28k, i28k)),
        ("segment_min 28.8K -> 131K",
         lambda c, x, i: jax.ops.segment_min(
             x + c, (i * 4) % 131072, num_segments=131072).min() * 0 + c,
         (x28k, i28k)),
        ("scatter-set 28.8K -> 28.8K",
         lambda c, x, i: jnp.zeros(28801).at[i].set(x + c).sum() * 1e-9
         + c * 0, (x28k, i28k)),
        ("gather 28.8K from 28.8K",
         lambda c, x, i: (x + c)[i].sum() * 1e-9 + c * 0, (x28k, i28k)),
        ("cumsum 28.8K",
         lambda c, x: jnp.cumsum(x + c).sum() * 1e-12 + c * 0, (x28k,)),
        ("cumsum 131K",
         lambda c, x: jnp.cumsum(jnp.tile(x + c, 5)).sum() * 1e-12 + c * 0,
         (x28k,)),
        ("matmul 512x3 @ 3x8192 + argmin",
         lambda c, p: jnp.argmin(
             (p[:512] + c) @ p[:8192].T, axis=1).sum().astype(jnp.float32)
         * 1e-9 + c * 0, (pts,)),
        ("elementwise (16,1800) x40",
         lambda c, a: sum(
             jnp.sin(a + c + k).sum() for k in range(40)) * 1e-12 + c * 0,
         (g1800,)),
        ("take_along_axis (16,1800) x5",
         lambda c, a, i: sum(
             jnp.take_along_axis(a + c + k, i[:28800].reshape(16, 1800) % 1800,
                                 axis=1).sum() for k in range(5)) * 1e-12
         + c * 0, (g1800, i28k)),
    ]
    for name, body, a in cases:
        timed(name, dep_scan(body), (tick, *a))

    # big-carry scan: does a ~350KB carry cost per iteration?
    big = {
        "a": jnp.zeros((8192, 3)), "b": jnp.zeros((2048, 3)),
        "c": jnp.zeros((8192,)), "d": jnp.zeros((2048,), bool),
    }

    @jax.jit
    def carry_prog(state, x):
        def f(st, _):
            st2 = {k: v + x.sum() * 0 + 1e-9 for k, v in st.items()
                   if k != "d"}
            st2["d"] = st["d"]
            return st2, st2["a"][0, 0]
        return jax.lax.scan(f, state, None, length=L)

    timed("big-carry scan (350KB updated/iter)", carry_prog, (big, x28k))


if __name__ == "__main__":
    main()
