#!/usr/bin/env python
"""Ablation timing of the mapping step internals on the real device."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as _np


def _sync(out):
    _np.asarray(jax.tree.leaves(out)[-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import mapping, odometry as odom, pipeline
    from legoloam_tpu.ops import se3
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.ops.voxel import knn, voxel_downsample
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    scene = synthetic.default_scene()

    # Build a realistic map state: run ~30 scans of SLAM so the keyframe
    # store is populated.
    state = pipeline.init_slam_state(cfg)
    poses = synthetic.circle_trajectory(31, radius=20.0, angular_rate=0.0075)
    out = None
    for k in range(30):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[k + 1], poses.t[k + 1])
        pts, valid, ring = synthetic.raycast_scan(scene, pk, cfg.sensor,
                                                  next_pose=nxt, motion=True)
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0))
    _sync(state.mapping.kf.count)
    print("keyframes:", int(state.mapping.kf.count))

    ms = state.mapping
    oc, os_, oo = state.odom.last_corner, state.odom.last_surf, \
        state.odom.last_outlier
    opose = out.odom_pose

    def timed(name, fn, *a):
        r = fn(*a)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        _sync(r)
        print(f"{name:34s} {(time.perf_counter() - t0) / args.iters * 1e3:9.2f} ms")

    # mapping_step donates its state arg (the 500 MB keyframe store aliases
    # in place) — time it by CHAINING states instead of reusing one.
    chain = {"ms": jax.tree.map(jnp.copy, ms)}

    def chained_step():
        new_ms, T, diag = mapping.mapping_step(
            chain["ms"], oc, os_, oo, opose, jnp.float32(3.0), cfg.mapping)
        chain["ms"] = new_ms
        return T

    timed("mapping_step (full)", chained_step)

    sub = jax.jit(lambda kf, c: mapping.extract_submap(kf, c, cfg.mapping))
    timed("extract_submap", lambda: sub(ms.kf, opose.t))

    (sub_c, sub_cv), (sub_s, sub_sv) = sub(ms.kf, opose.t)

    vds = jax.jit(lambda x, v: voxel_downsample(
        x, v, cfg.mapping.surf_leaf, cfg.mapping.scan_surf_cap))
    surf_all = jnp.concatenate([os_.xyz, oo.xyz], axis=0)
    surf_all_ok = jnp.concatenate([os_.valid, oo.valid], axis=0)
    timed("downsample current scan (surf)", lambda: vds(surf_all, surf_all_ok))

    c_pts, c_ok = voxel_downsample(oc.xyz, oc.valid, cfg.mapping.corner_leaf,
                                   cfg.mapping.scan_corner_cap)
    s_pts, s_ok = vds(surf_all, surf_all_ok)

    knn_s = jax.jit(lambda q, qv, r, rv: knn(q, qv, r, rv, k=5))
    timed("knn surf 8192x32768 k=5 (1 call)",
          lambda: knn_s(s_pts, s_ok, sub_s, sub_sv))
    timed("knn corner 2048x8192 k=5 (1 call)",
          lambda: knn_s(c_pts, c_ok, sub_c, sub_cv))

    s2m = jax.jit(lambda g, c, cv, s, sv: mapping.scan_to_map(
        g, c, cv, s, sv, sub_c, sub_cv, sub_s, sub_sv, cfg.mapping))
    timed("scan_to_map LM (<=10 iters)",
          lambda: s2m(opose, c_pts, c_ok, s_pts, s_ok))


if __name__ == "__main__":
    main()
