#!/usr/bin/env python
"""Long-horizon SLAM evaluation on the attached device.

Runs N synthetic scans (raycast against the courtyard world with exact ground
truth) through the full pipeline and reports ATE RMSE for odometry-only,
odometry+mapping (fused), and optionally +loop closure — the BASELINE.json
config 2/3/4 evidence in a world where no reference datasets ship.

Usage: python tools/eval_long.py [--scans 500] [--loop] [--imu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=500)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--imu", action="store_true",
                    help="feed synthetic IMU (de-skew + initial guess)")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--world", default="courtyard",
                    choices=["courtyard", "loop", "circuit"],
                    help="courtyard: 50x40 m block (stay <= ~120 scans at the"
                         " default radius or the path exits the walls); loop:"
                         " 90x90 m ring world built for full revisit laps;"
                         " circuit: ~766 m rounded-square course LARGER than"
                         " the submap radius (real loop-closure regime,"
                         " ~957 scans/lap)")
    ap.add_argument("--radius", type=float, default=None)
    ap.add_argument("--angular-rate", type=float, default=0.009)
    ap.add_argument("--traj", default="circle", choices=["circle", "figure8"],
                    help="figure8: equal left/right turning (cancels "
                         "rotation-coupled sampling bias; revisits origin)")
    ap.add_argument("--save", default=None,
                    help="write trajectories (fused/odom/mapped/gt R+t) to NPZ")
    ap.add_argument("--set-map", action="append", default=[], metavar="K=V",
                    help="override MappingConfig fields, e.g. "
                         "--set-map ground_anchor=0 --set-map prior_trans_std=0")
    ap.add_argument("--set-odo", action="append", default=[], metavar="K=V",
                    help="override OdometryConfig fields, e.g. "
                         "--set-odo max_iterations=10")
    ap.add_argument("--circuit-half", type=float, default=100.0,
                    help="circuit world half-size (100 -> ~766 m lap; 200 "
                         "-> ~1570 m lap, enough drift to exceed the "
                         "scan-to-map gate at re-entry)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="per-range Gaussian noise sigma in meters (realistic"
                         " VLP-16: ~0.03); drives drift for loop-closure evals")
    args = ap.parse_args()
    if args.radius is None:
        args.radius = 30.0 if args.world == "loop" else 26.0
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import dataclasses

    from legoloam_tpu import config
    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import metrics, synthetic

    cfg = DEFAULT
    if args.loop:
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, enabled=True))
    if args.set_map:
        cfg = cfg.replace(
            mapping=config.apply_overrides(cfg.mapping, args.set_map))
    if args.set_odo:
        cfg = cfg.replace(odom=config.apply_overrides(cfg.odom, args.set_odo))

    scene = (synthetic.loop_scene() if args.world == "loop"
             else synthetic.circuit_scene(args.circuit_half)
             if args.world == "circuit"
             else synthetic.default_scene())
    n = args.scans
    if args.world == "circuit":
        poses = synthetic.circuit_trajectory(n + 1, half=args.circuit_half)
    elif args.traj == "figure8":
        # radius 8 keeps the lobes clear of the courtyard's interior
        # buildings; the loop world's central block rules figure8 out there.
        poses = synthetic.figure8_trajectory(n + 1, radius=8.0)
    else:
        poses = synthetic.circle_trajectory(n + 1, radius=args.radius,
                                            angular_rate=args.angular_rate)

    integ = None
    if args.imu:
        from legoloam_tpu.ops import deskew
        ts, rpy, acc, gyro = synthetic.make_imu(poses, scan_period=0.1)
        w = deskew.ImuWindow(time=ts, rpy=rpy, acc=acc, gyro=gyro,
                             valid=jnp.ones(ts.shape[0], bool))
        integ = deskew.integrate_imu(w)

    if args.noise > 0:
        ray = jax.jit(lambda pk_R, pk_t, nx_R, nx_t, key: synthetic.raycast_scan(
            scene, Pose(pk_R, pk_t), cfg.sensor,
            next_pose=Pose(nx_R, nx_t), motion=True,
            noise_key=key, noise_sigma=args.noise))
        keys = jax.random.split(jax.random.PRNGKey(0), n)
    else:
        ray = jax.jit(lambda pk_R, pk_t, nx_R, nx_t: synthetic.raycast_scan(
            scene, Pose(pk_R, pk_t), cfg.sensor,
            next_pose=Pose(nx_R, nx_t), motion=True))

    state = pipeline.init_slam_state(cfg)
    sched = pipeline.LoopScheduler(cfg)
    fused, odoms = [], []
    fused_R, odom_R, mapped_t = [], [], []
    t0 = time.perf_counter()
    for k in range(n):
        if args.noise > 0:
            pts, valid, ring = ray(poses.R[k], poses.t[k],
                                   poses.R[k + 1], poses.t[k + 1], keys[k])
        else:
            pts, valid, ring = ray(poses.R[k], poses.t[k],
                                   poses.R[k + 1], poses.t[k + 1])
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0),
            run_loop=sched.due(0.1 * k),
            imu_integral=integ, bootstrap=(k == 1))
        if (k + 1) % 100 == 0:
            np.asarray(out.fused_pose.t)   # host sync, keeps queue bounded
            print(f"  scan {k + 1}/{n}  ({(k + 1) / (time.perf_counter() - t0):.1f} scans/s incl. raycast)",
                  flush=True)
            state, did = pipeline.maybe_decimate(state, cfg, margin=48)
            if did:
                print(f"  [decimate] keyframe store -> "
                      f"{int(state.mapping.kf.count)} kf", flush=True)
        fused.append(out.fused_pose.t)
        odoms.append(out.odom_pose.t)
        if args.save:
            fused_R.append(out.fused_pose.R)
            odom_R.append(out.odom_pose.R)
            # mapped_pose aliases the DONATED mapping state (see
            # mapping_step) — fetch to host before the next step invalidates
            # the buffer.
            mapped_t.append(np.asarray(out.mapped_pose.t))
    fused = np.asarray(jnp.stack(fused))
    odoms = np.asarray(jnp.stack(odoms))
    # The estimate frame is the scan-0 SENSOR frame: rebase ground truth by
    # the start pose (worlds whose trajectory starts away from the origin /
    # heading != 0, e.g. --world circuit, would otherwise carry a constant
    # offset into end-drift numbers; Umeyama ATE hid it).
    R0 = np.asarray(poses.R[0])
    t0 = np.asarray(poses.t[0])
    gt = (np.asarray(poses.t)[:n] - t0) @ R0      # = R0^T (gt_k - t0)
    if args.save:
        np.savez(args.save,
                 fused_t=fused, odom_t=odoms, gt_t=gt,
                 fused_R=np.asarray(jnp.stack(fused_R)),
                 odom_R=np.asarray(jnp.stack(odom_R)),
                 mapped_t=np.asarray(jnp.stack(mapped_t)),
                 gt_R=np.asarray(poses.R)[:n],
                 kf_t=np.asarray(state.mapping.kf.t),
                 kf_count=int(state.mapping.kf.count))
        print(f"saved trajectories -> {args.save}")

    ate_f = float(metrics.ate_rmse(jnp.asarray(fused), jnp.asarray(gt)))
    ate_o = float(metrics.ate_rmse(jnp.asarray(odoms), jnp.asarray(gt)))
    kf = int(state.mapping.kf.count)
    drift_f = float(np.linalg.norm(fused[-1] - gt[-1]))
    drift_o = float(np.linalg.norm(odoms[-1] - gt[-1]))
    path_len = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    n_loops = int(state.loops.count)
    print(f"scans {n}, keyframes {kf}, path {path_len:.0f} m, "
          f"loop closures {n_loops}")
    print(f"ATE RMSE  odometry-only: {ate_o:.4f} m   fused: {ate_f:.4f} m")
    print(f"end drift odometry-only: {drift_o:.4f} m ({100 * drift_o / path_len:.3f}%)"
          f"   fused: {drift_f:.4f} m ({100 * drift_f / path_len:.3f}%)")


if __name__ == "__main__":
    main()
