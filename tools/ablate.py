#!/usr/bin/env python
"""Ablation timing of the REAL state-threaded block program (bench.py's block
mode) — the trustworthy way to attribute time on device, since separately
jitted stages can be distorted by loop-invariant code motion.

Each variant runs the same lax.scan-over-B-scans structure with one piece
disabled; deltas vs 'full' attribute the cost.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import odometry as odom
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops import features as feat_ops
    from legoloam_tpu.ops import projection, segmentation
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    scene = synthetic.default_scene()
    poses = synthetic.circle_trajectory(args.block + 1, radius=20.0,
                                        angular_rate=0.0075)
    scans = []
    for k in range(args.block):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[k + 1], poses.t[k + 1])
        scans.append(synthetic.raycast_scan(scene, pk, cfg.sensor,
                                            next_pose=nxt, motion=True))
    batch = tuple(jnp.stack([scans[i][j] for i in range(args.block)])
                  for j in range(3))
    batch = jax.tree.map(jax.device_put, batch)
    state0 = odom.init_state(cfg.odom, cfg.feat)

    def run(prog, state):
        out = prog(state, *batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = prog(state, *batch)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (args.iters * args.block) * 1e3

    import functools

    # --- full step (reference point) ---
    full = functools.partial(pipeline.odometry_scan_block, cfg=cfg)
    state1, _ = full(state0, *batch)

    # --- frontend only: projection+segmentation+features, odometry skipped ---
    @jax.jit
    def frontend_only(state, points, valid, ring):
        def body(st, scan):
            pts, v, r = scan
            feats = pipeline.process_scan(pts, v, r, cfg)
            # tie a scalar into the carry so nothing is DCE'd or hoisted
            tick = st + jnp.sum(feats.sharp.xyz) + jnp.sum(feats.less_flat.xyz)
            return tick, feats.sharp.valid.sum()
        return jax.lax.scan(body, jnp.float32(0.0) * state.xi[0],
                            (points, valid, ring))

    # --- frontend without segmentation (projection+features on fake seg) ---
    @jax.jit
    def frontend_noseg(state, points, valid, ring):
        def body(st, scan):
            pts, v, r = scan
            img = projection.project_scan(pts, v, cfg.sensor, ring=r)
            n, h = cfg.sensor.n_scan, cfg.sensor.horizon_scan
            cols = jnp.arange(h)[None, :]
            seg = segmentation.Segmentation(
                ground=img.valid & (jnp.arange(n)[:, None] < 7),
                label=jnp.where(img.valid, 1, -1).astype(jnp.int32),
                segmented=img.valid,
                outlier=img.valid & (cols % 5 == 0),
                seg_ground_flag=img.valid & (jnp.arange(n)[:, None] < 7)
                                & (cols % 5 == 0),
                n_clusters=jnp.int32(1),
            )
            feats = feat_ops.extract_features(img, seg, cfg.sensor, cfg.feat)
            tick = st + jnp.sum(feats.sharp.xyz) + jnp.sum(feats.less_flat.xyz)
            return tick, feats.sharp.valid.sum()
        return jax.lax.scan(body, jnp.float32(0.0) * state.xi[0],
                            (points, valid, ring))

    # --- frontend with label propagation but CONSTANT validity stats ---
    @jax.jit
    def frontend_novalid(state, points, valid, ring):
        from legoloam_tpu.ops.ccl_pallas import label_propagation_pallas

        def body(st, scan):
            pts, v, r = scan
            img = projection.project_scan(pts, v, cfg.sensor, ring=r)
            ground = segmentation.ground_removal(img, cfg.sensor, cfg.seg)
            seeds = img.valid & ~ground
            ch, cv = segmentation._connectivity(img, cfg.sensor, cfg.seg)
            labels = label_propagation_pallas(seeds, ch, cv,
                                              cfg.seg.ccl_max_iters)
            n, h = cfg.sensor.n_scan, cfg.sensor.horizon_scan
            cols = jnp.arange(h)[None, :]
            cell_ok = seeds & (labels < n * h)
            ground_kept = ground & ((cols % 5 == 0) | (cols <= 5)
                                    | (cols >= h - 5))
            seg = segmentation.Segmentation(
                ground=ground, label=labels, segmented=cell_ok | ground_kept,
                outlier=seeds & (cols % 5 == 0) & ~cell_ok,
                seg_ground_flag=ground_kept, n_clusters=jnp.int32(1))
            feats = feat_ops.extract_features(img, seg, cfg.sensor, cfg.feat)
            tick = st + jnp.sum(feats.sharp.xyz) + jnp.sum(feats.less_flat.xyz)
            return tick, feats.sharp.valid.sum()
        return jax.lax.scan(body, jnp.float32(0.0) * state.xi[0],
                            (points, valid, ring))

    # --- LM with 1 iteration (attributes the per-iteration solve+knn cost) ---
    cfg_lm1 = cfg.replace(odom=cfg.odom.__class__(
        **{**cfg.odom.__dict__, "max_iterations": 1}))
    lm1 = functools.partial(pipeline.odometry_scan_block, cfg=cfg_lm1)

    # --- LM with 2 iterations ---
    cfg_lm2 = cfg.replace(odom=cfg.odom.__class__(
        **{**cfg.odom.__dict__, "max_iterations": 2}))
    lm2 = functools.partial(pipeline.odometry_scan_block, cfg=cfg_lm2)

    rows = [
        ("full (5 LM iters)", run(full, state1)),
        ("frontend only", run(frontend_only, state1)),
        ("frontend, no CCL", run(frontend_noseg, state1)),
        ("frontend, no validity", run(frontend_novalid, state1)),
        ("full, 1 LM iter", run(lm1, state1)),
        ("full, 2 LM iters", run(lm2, state1)),
    ]
    print(f"{'variant':24s} {'ms/scan':>9s}")
    for name, ms in rows:
        print(f"{name:24s} {ms:9.3f}")


if __name__ == "__main__":
    main()
