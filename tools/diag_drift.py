#!/usr/bin/env python
"""Per-scan odometry increment error along a trajectory.

Prints, in 10-scan bins, the mean translation / rotation error of the
per-scan relative pose (estimate vs ground truth) plus the heading error —
separates 'noise per scan' from 'systematic drift that compounds'.

Usage: python tools/diag_drift.py [--scans 150] [--backend cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=150)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--world", default="courtyard",
                    choices=["courtyard", "loop"])
    ap.add_argument("--radius", type=float, default=None)
    ap.add_argument("--angular-rate", type=float, default=0.009)
    ap.add_argument("--no-motion", action="store_true",
                    help="raycast WITHOUT motion distortion")
    ap.add_argument("--conv0", action="store_true",
                    help="disable LM early-convergence freeze, 8 iters")
    ap.add_argument("--odom-iters", type=int, default=None)
    ap.add_argument("--damping", type=float, default=None)
    args = ap.parse_args()
    if args.radius is None:
        args.radius = 30.0 if args.world == "loop" else 26.0
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import dataclasses

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    if args.conv0 or args.odom_iters or args.damping:
        o = cfg.odom
        if args.conv0:
            o = dataclasses.replace(o, conv_rot_deg=0.0, conv_trans_cm=0.0,
                                    max_iterations=args.odom_iters or 8)
        elif args.odom_iters:
            o = dataclasses.replace(o, max_iterations=args.odom_iters)
        if args.damping:
            o = dataclasses.replace(o, step_damping=args.damping)
        cfg = cfg.replace(odom=o)
    scene = (synthetic.loop_scene() if args.world == "loop"
             else synthetic.default_scene())
    n = args.scans
    poses = synthetic.circle_trajectory(n + 1, radius=args.radius,
                                        angular_rate=args.angular_rate)
    motion = not args.no_motion
    ray = jax.jit(lambda pk_R, pk_t, nx_R, nx_t: synthetic.raycast_scan(
        scene, Pose(pk_R, pk_t), cfg.sensor,
        next_pose=Pose(nx_R, nx_t) if motion else None, motion=motion))

    state = pipeline.init_slam_state(cfg)
    est_R, est_t = [], []
    for k in range(n):
        pts, valid, ring = ray(poses.R[k], poses.t[k],
                               poses.R[k + 1], poses.t[k + 1])
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0))
        est_R.append(np.asarray(out.odom_pose.R))
        est_t.append(np.asarray(out.odom_pose.t))
    eR = np.stack(est_R); et = np.stack(est_t)
    gR = np.asarray(poses.R)[:n]; gt = np.asarray(poses.t)[:n]

    # per-scan increments:  T_{k-1}^-1 T_k
    def rel(R, t):
        dR = np.einsum("kij,kil->kjl", R[:-1], R[1:])      # R_{k-1}^T R_k
        dt = np.einsum("kij,ki->kj", R[:-1],
                       t[1:] - t[:-1])                      # R^T (t_k - t_{k-1})
        return dR, dt

    dRe, dte = rel(eR, et)
    dRg, dtg = rel(gR, gt)
    terr = np.linalg.norm(dte - dtg, axis=1)
    tr = np.clip((np.einsum("kij,kij->k", dRe, dRg) - 1) / 2, -1, 1)
    rerr = np.degrees(np.arccos(tr))
    # absolute heading error of the accumulated pose, with axis decomposition
    # (error rotation expressed in the SENSOR frame: R_gtᵀ R_est)
    hR = np.einsum("kij,kil->kjl", gR, eR)
    htr = np.clip((np.trace(hR, axis1=1, axis2=2) - 1) / 2, -1, 1)
    herr = np.degrees(np.arccos(htr))
    hax = np.stack([hR[:, 2, 1] - hR[:, 1, 2],
                    hR[:, 0, 2] - hR[:, 2, 0],
                    hR[:, 1, 0] - hR[:, 0, 1]], axis=1) * 0.5
    hax_deg = np.degrees(np.arcsin(np.clip(hax, -1, 1)))
    pos_err = np.linalg.norm(et - gt, axis=1)

    print(f"{'bin':>8} {'d_t err (m)':>12} {'d_R err (deg)':>13} "
          f"{'|heading| deg':>13} {'|pos| m':>9}")
    for b in range(0, n - 1, 10):
        e = min(b + 10, n - 1)
        ax = hax_deg[b:e].mean(0)
        print(f"{b:4d}-{e:3d} {terr[b:e].mean():12.4f} "
              f"{rerr[b:e].mean():13.4f} {herr[b:e].mean():13.3f} "
              f"{pos_err[b:e].mean():9.3f}"
              f"   err_rpy=({ax[0]:+.3f},{ax[1]:+.3f},{ax[2]:+.3f})deg")
    print(f"mean twist err {terr.mean():.4f} m  {rerr.mean():.4f} deg; "
          f"final pos err {pos_err[-1]:.3f} m")


if __name__ == "__main__":
    main()
