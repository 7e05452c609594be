#!/usr/bin/env python
"""Diagnose full-SLAM behavior on the ring world: per-scan error decomposition
(odometry vs mapped vs fused, rotation error of the mapping correction)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=450)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--radius", type=float, default=30.0)
    ap.add_argument("--angular-rate", type=float, default=0.009)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--world", default="loop", choices=["loop", "courtyard"])
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import dataclasses

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops import se3
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import metrics, synthetic

    cfg = DEFAULT
    if args.loop:
        cfg = cfg.replace(loop=dataclasses.replace(cfg.loop, enabled=True))
    scene = (synthetic.loop_scene() if args.world == "loop"
             else synthetic.default_scene())
    n = args.scans
    poses = synthetic.circle_trajectory(n + 1, radius=args.radius,
                                        angular_rate=args.angular_rate)
    ray = jax.jit(lambda pk_R, pk_t, nx_R, nx_t: synthetic.raycast_scan(
        scene, Pose(pk_R, pk_t), cfg.sensor,
        next_pose=Pose(nx_R, nx_t), motion=True))

    state = pipeline.init_slam_state(cfg)
    sched = pipeline.LoopScheduler(cfg)
    fused = []
    for k in range(n):
        pts, valid, ring = ray(poses.R[k], poses.t[k],
                               poses.R[k + 1], poses.t[k + 1])
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0),
            run_loop=sched.due(0.1 * k))
        fused.append(out.fused_pose.t)
        if k < 40 or k % 10 == 0:
            gt = Pose(poses.R[k], poses.t[k])
            e_f = float(np.linalg.norm(np.asarray(out.fused_pose.t)
                                       - np.asarray(gt.t)))
            e_o = float(np.linalg.norm(np.asarray(out.odom_pose.t)
                                       - np.asarray(gt.t)))
            # Rotation error of fused and odometry vs ground truth.
            rf = np.degrees(float(jnp.linalg.norm(se3.so3_log(
                jnp.asarray(gt.R).T @ jnp.asarray(out.fused_pose.R)))))
            ro = np.degrees(float(jnp.linalg.norm(se3.so3_log(
                jnp.asarray(gt.R).T @ jnp.asarray(out.odom_pose.R)))))
            mapped = k % cfg.mapping_every == 0
            print(f"k={k:4d} kf={int(state.mapping.kf.count):3d} "
                  f"map={int(mapped)} |e_odo|={e_o:7.3f} ({ro:6.2f} deg) "
                  f"|e_fused|={e_f:7.3f} ({rf:6.2f} deg) "
                  f"loops={int(state.loops.count)}", flush=True)
    fused = np.asarray(jnp.stack(fused))
    gt = np.asarray(poses.t)[: fused.shape[0]]
    print("final ATE", float(metrics.ate_rmse(jnp.asarray(fused),
                                              jnp.asarray(gt))))


if __name__ == "__main__":
    main()
