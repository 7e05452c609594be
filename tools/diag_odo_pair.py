#!/usr/bin/env python
"""Isolated two-scan odometry solve: fixed-point bias by axis.

Raycasts two consecutive poses on the loop world (optionally undistorted),
builds features, and runs the two-step LM with a GROUND-TRUTH seed against a
CLEAN (unwarped) reference cloud.  Whatever twist error remains at the fixed
point is pure measurement-model bias — per-axis, per toggle:

  --no-motion      undistorted scans
  --zero-reltime   kill the query-side warp (rel_time = 0 everywhere)
  --seed zero|gt   start from rest or from the true twist

Usage: python tools/diag_odo_pair.py [--no-motion] [--zero-reltime]
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
    ap.add_argument("--backend", default=None)
    ap.add_argument("--no-motion", action="store_true")
    ap.add_argument("--deskew-off", action="store_true",
                    help="with --no-motion: run the pipeline's rigid-scan "
                         "convention (deskew=False, rel_time=1 full-pose "
                         "warp) instead of leaving the azimuth warp model "
                         "on — the apples-to-apples rigid experiment")
    ap.add_argument("--zero-reltime", action="store_true")
    ap.add_argument("--seed", default="gt", choices=["gt", "zero"])
    ap.add_argument("--world", default="loop", choices=["loop", "circuit"])
    ap.add_argument("--k", type=int, default=20,
                    help="scan index along the circle")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--damping", type=float, default=None)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="per-range Gaussian noise sigma (m) — for chasing "
                         "the noiseless-vs-noisy accuracy paradox")
    ap.add_argument("--noise-seed", type=int, default=0)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import dataclasses

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import odometry as odom
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops import se3
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    o = dataclasses.replace(cfg.odom, max_iterations=args.iters,
                            conv_rot_deg=0.0, conv_trans_cm=0.0)
    if args.damping is not None:
        o = dataclasses.replace(o, step_damping=args.damping)
    cfg = cfg.replace(odom=o)

    if args.world == "circuit":
        scene = synthetic.circuit_scene(100.0)
        poses = synthetic.circuit_trajectory(args.k + 3, half=100.0)
    else:
        scene = synthetic.loop_scene()
        poses = synthetic.circle_trajectory(args.k + 3, radius=30.0,
                                            angular_rate=0.009)
    kA, kB = args.k, args.k + 1
    motion = not args.no_motion

    def scan(k):
        kw = {}
        if args.noise > 0:
            kw = dict(noise_key=jax.random.PRNGKey(args.noise_seed + k),
                      noise_sigma=args.noise)
        return synthetic.raycast_scan(
            scene, Pose(poses.R[k], poses.t[k]), cfg.sensor,
            next_pose=Pose(poses.R[k + 1], poses.t[k + 1]) if motion else None,
            motion=motion, **kw)

    if args.deskew_off:
        cfg = cfg.replace(deskew=False)
    fa = pipeline.process_scan(*scan(kA), cfg)
    fb = pipeline.process_scan(*scan(kB), cfg)

    if args.zero_reltime:
        def zrt(fc):
            return fc._replace(rel_time=jnp.zeros_like(fc.rel_time))
        fa = jax.tree.map(lambda x: x, fa)
        fb = fb._replace(flat=zrt(fb.flat), sharp=zrt(fb.sharp))

    # Clean reference: scan A's broad features in A's SCAN-END frame.  For
    # motion data warp with the TRUE twist (no estimation error); for static
    # data the unwarped cloud already is the end frame.
    if motion:
        xi_a_gt = se3.se3_log(se3.relative(Pose(poses.R[kA], poses.t[kA]),
                                           Pose(poses.R[kA + 1],
                                                poses.t[kA + 1])))
        last_corner = odom._warp_to_end(xi_a_gt, fa.less_sharp)
        last_surf = odom._warp_to_end(xi_a_gt, fa.less_flat)
    elif args.deskew_off:
        # deskew=False semantics: rel_time==1 everywhere, warp_to_end is the
        # identity — the reference clouds are scan A's features as-is.
        last_corner = fa.less_sharp
        last_surf = fa.less_flat
    else:
        last_corner = fa.less_sharp._replace(rel_time=jnp.zeros_like(
            fa.less_sharp.rel_time))
        last_surf = fa.less_flat._replace(rel_time=jnp.zeros_like(
            fa.less_flat.rel_time))

    # Ground-truth twist: sensor-frame motion A -> B.
    # Scan clouds are in the SCAN-END frame when motion=True (deskewed-by-
    # construction raycast), scan-pose frame when motion=False.
    TA = Pose(poses.R[kA + (1 if motion else 0)],
              poses.t[kA + (1 if motion else 0)])
    TB = Pose(poses.R[kB + (1 if motion else 0)],
              poses.t[kB + (1 if motion else 0)])
    xi_gt = se3.se3_log(se3.relative(TA, TB))
    xi0 = xi_gt if args.seed == "gt" else jnp.zeros(6)

    xi_a, it_a, n_surf = odom._lm_loop(
        fb.flat, last_surf, xi0, cfg.odom, odom._find_surf_corr,
        odom._SURF_DOF, is_line=False)
    xi_b, it_b, n_corner = odom._lm_loop(
        fb.sharp, last_corner, xi_a, cfg.odom, odom._find_corner_corr,
        odom._CORNER_DOF, is_line=True)

    ea = np.asarray(xi_a - xi_gt)
    print(f"  surf-step BIAS rot_deg=({np.degrees(ea[0]):+.4f},"
          f"{np.degrees(ea[1]):+.4f},{np.degrees(ea[2]):+.4f}) "
          f"t=({ea[3]:+.4f},{ea[4]:+.4f},{ea[5]:+.4f})")
    e = np.asarray(xi_b - xi_gt)
    print(f"k={kA} motion={motion} zero_reltime={args.zero_reltime} "
          f"seed={args.seed} iters={args.iters} "
          f"n_surf={int(n_surf)} n_corner={int(n_corner)}")
    print(f"  xi_gt  = rot_deg=({np.degrees(float(xi_gt[0])):+.4f},"
          f"{np.degrees(float(xi_gt[1])):+.4f},{np.degrees(float(xi_gt[2])):+.4f}) "
          f"t=({float(xi_gt[3]):+.4f},{float(xi_gt[4]):+.4f},{float(xi_gt[5]):+.4f})")
    print(f"  BIAS   = rot_deg=({np.degrees(e[0]):+.4f},"
          f"{np.degrees(e[1]):+.4f},{np.degrees(e[2]):+.4f}) "
          f"t=({e[3]:+.4f},{e[4]:+.4f},{e[5]:+.4f})")


if __name__ == "__main__":
    main()
