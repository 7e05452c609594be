#!/usr/bin/env python
"""Chip-scale loop-closure recovery experiment (reference closure regime).

The reference's closure-enabled mode uses the RECENCY-DEQUE submap
(mapOptmization.cpp:961-1000) — no implicit re-localization — so explicit
ICP closure (802-945) is the only drift-recovery mechanism.  On static
synthetic worlds the organic drift is either lap-periodic (closure measures
~zero residual) or confined to the unanchored DOF (see PERF.md round-5
analysis), so this experiment injects a known rigid drift into the live
state at the end of lap 1 of the 766 m circuit — the step-function version
of accumulated error — and measures recovery through the revisit:

  * OFF arm: recent-mode scan-to-map follows the drifted recent map; the
    error persists.
  * ON arm: detection finds the lap-1 keyframes within the 7 m radius, ICP
    measures the offset, the pose graph bends the chain back.

Usage: python tools/eval_loop_recovery.py [--pre 1100] [--post 600]
       [--drift-xy 3.0 1.8] [--drift-yaw 4.0] [--noise 0.03]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", type=int, default=1100,
                    help="scans before injection (957/lap at half=100)")
    ap.add_argument("--post", type=int, default=600)
    ap.add_argument("--half", type=float, default=100.0)
    ap.add_argument("--drift-xy", type=float, nargs=2, default=[3.0, 1.8])
    ap.add_argument("--drift-yaw", type=float, default=4.0, help="degrees")
    ap.add_argument("--noise", type=float, default=0.03)
    ap.add_argument("--recent", type=int, default=60,
                    help="newest keyframes drifted (must cover the active "
                         "recency window, search_num=50)")
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops import se3
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    def cfg_for(loop_on):
        return DEFAULT.replace(
            mapping=dataclasses.replace(DEFAULT.mapping,
                                        submap_mode="recent"),
            loop=dataclasses.replace(DEFAULT.loop, enabled=loop_on))

    n = args.pre + args.post
    scene = synthetic.circuit_scene(args.half)
    poses = synthetic.circuit_trajectory(n + 1, half=args.half)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    ray = jax.jit(lambda a, b, c, d, key: synthetic.raycast_scan(
        scene, Pose(a, b), DEFAULT.sensor, next_pose=Pose(c, d), motion=True,
        noise_key=key, noise_sigma=args.noise))

    R0 = np.asarray(poses.R[0])
    t0 = np.asarray(poses.t[0])
    gt = (np.asarray(poses.t)[:n] - t0) @ R0

    def scan(k):
        return ray(poses.R[k], poses.t[k], poses.R[k + 1], poses.t[k + 1],
                   keys[k])

    def run(cfg, state, sched, k_range):
        errs = []
        for k in k_range:
            state, out = pipeline.slam_scan_step(
                state, *scan(k), cfg, 0.1 * k,
                run_mapping=(k % cfg.mapping_every == 0),
                run_loop=sched.due(0.1 * k))
            errs.append(np.linalg.norm(np.asarray(out.fused_pose.t) - gt[k]))
        return state, np.asarray(errs)

    cfg_off = cfg_for(False)
    state0, pre_errs = run(cfg_off, pipeline.init_slam_state(cfg_off),
                           pipeline.LoopScheduler(cfg_off), range(args.pre))
    print(f"[pre] {args.pre} scans, err at injection {pre_errs[-1]:.3f} m, "
          f"kf {int(state0.mapping.kf.count)}")

    # Inject the drift (same state surgery as
    # tests/test_loop_loadbearing.py:_inject_drift).  The yaw component is
    # centered at the CURRENT vehicle position (D = T_c Rz T_c^-1 + t): a
    # world-origin-centered rotation would add a |yaw| x |p| lever-arm
    # offset (~10 m at 150 m from origin) that overwhelms the intended
    # drift magnitude and the 7 m detection radius.
    ang = np.radians(args.drift_yaw)
    Rz = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    c = np.asarray(state0.mapping.t_aft.t)
    D = Pose(jnp.asarray(Rz),
             jnp.asarray(np.asarray([*args.drift_xy, 0.0], np.float32)
                         + c - Rz @ c))
    kf = state0.mapping.kf
    m = kf.t.shape[0]
    count = int(kf.count)
    k0 = count - args.recent
    hit = (np.arange(m) >= k0) & (np.arange(m) < count)
    R_new = jnp.where(hit[:, None, None], D.R @ kf.R, kf.R)
    t_new = jnp.where(hit[:, None],
                      (D.R @ kf.t[..., None])[..., 0] + D.t, kf.t)
    rel = se3.relative(Pose(R_new[k0 - 1], t_new[k0 - 1]),
                       Pose(R_new[k0], t_new[k0]))
    kf = kf._replace(R=R_new, t=t_new,
                     chain_R=kf.chain_R.at[k0].set(rel.R),
                     chain_t=kf.chain_t.at[k0].set(rel.t))
    mp = state0.mapping
    drifted = state0._replace(mapping=mp._replace(
        kf=kf, t_aft=se3.compose(D, mp.t_aft),
        cache=mp.cache._replace(stale=jnp.array(True))))
    drift_mag = float(np.linalg.norm(args.drift_xy))
    print(f"[inject] |D| = {drift_mag:.2f} m + {args.drift_yaw:g} deg yaw "
          f"(vehicle-centered) into newest {args.recent} of {count} "
          f"keyframes")

    post = range(args.pre, n)
    # mapping_step DONATES its state buffers — each arm gets its own copy.
    arm_off = jax.tree.map(jnp.copy, drifted)
    arm_on = jax.tree.map(jnp.copy, drifted)
    s_off, e_off = run(cfg_off, arm_off, pipeline.LoopScheduler(cfg_off),
                       post)
    cfg_on = cfg_for(True)
    s_on, e_on = run(cfg_on, arm_on, pipeline.LoopScheduler(cfg_on), post)

    w = args.post // 6
    print(f"\n{'post-injection scans':>22} | {'closure OFF':>11} | "
          f"{'closure ON':>10}")
    for i in range(6):
        seg = slice(i * w, (i + 1) * w)
        print(f"{args.pre + i * w:>10}-{args.pre + (i + 1) * w:<11} | "
              f"{e_off[seg].mean():>9.2f} m | {e_on[seg].mean():>8.2f} m")
    print(f"\nfinal-{w}-scan error:  OFF {e_off[-w:].mean():.2f} m   "
          f"ON {e_on[-w:].mean():.2f} m   (injected {drift_mag:.2f} m, "
          f"pre-injection level {pre_errs[-50:].mean():.2f} m)")
    print(f"closures accepted: {int(s_on.loops.count)}")


if __name__ == "__main__":
    main()
