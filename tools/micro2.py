#!/usr/bin/env python
"""Op-count scaling probe: time a jitted program with K CHAINED (data-
dependent, unfusable) instances of one primitive; the slope vs K is the
per-op cost on this backend."""

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


def timed(prog, args, reps=20):
    out = prog(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = prog(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def chain(kind, k):
    @jax.jit
    def prog(x, i):
        a, ii = x, i
        for _ in range(k):
            if kind == "argsort":
                ii = jnp.argsort(a)
                a = a + ii.astype(jnp.float32) * 1e-9
            elif kind == "segment_sum":
                s = jax.ops.segment_sum(a, ii, num_segments=28801)[:28800]
                a = a + s * 1e-9
            elif kind == "gather":
                a = a + a[ii] * 1e-9
            elif kind == "scatter":
                a = a + jnp.zeros(28801).at[ii].set(a).sum() * 1e-12
            elif kind == "matmul":
                p = a[:512 * 3].reshape(512, 3)
                q = a[:8192 * 3].reshape(8192, 3)
                m = jnp.argmin(p @ q.T, axis=1).sum()
                a = a + m.astype(jnp.float32) * 1e-9
            elif kind == "cumsum":
                a = a + jnp.cumsum(a) * 1e-12
            elif kind == "ew":   # 20 fused elementwise each
                for _ in range(20):
                    a = jnp.sin(a * 1.0001)
        return a.sum()
    return prog


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (28800,))
    i = (jax.random.uniform(key, (28800,)) * 28799).astype(jnp.int32)
    print(f"{'kind':12s} {'K=2':>8s} {'K=16':>8s} {'per-op us':>10s}")
    for kind in ["argsort", "segment_sum", "gather", "scatter", "matmul",
                 "cumsum", "ew"]:
        t2 = timed(chain(kind, 2), (x, i))
        t16 = timed(chain(kind, 16), (x, i))
        slope = (t16 - t2) / 14 * 1e3
        print(f"{kind:12s} {t2:8.3f} {t16:8.3f} {slope:10.1f}")


if __name__ == "__main__":
    main()
