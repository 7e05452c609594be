#!/usr/bin/env python
"""Replay ONE mapping step eagerly, printing per-iteration LM internals.

Runs the real pipeline to scan K on a synthetic world, then unrolls the
scan-to-map Gauss-Newton by hand: per iteration the correspondence counts,
the 6x6 normal-equation eigenvalues, the degeneracy mask, the step, and the
pose error vs ground truth.

Usage: python tools/diag_lm_step.py --world loop --at 24
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
    ap.add_argument("--at", type=int, default=24,
                    help="scan index whose mapping step to replay")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--world", default="loop", choices=["courtyard", "loop"])
    ap.add_argument("--radius", type=float, default=None)
    ap.add_argument("--angular-rate", type=float, default=0.009)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--gt-odom", action="store_true",
                    help="build the keyframe history with ground-truth "
                         "odometry poses (A/B for map-noise effects)")
    args = ap.parse_args()
    if args.radius is None:
        args.radius = 30.0 if args.world == "loop" else 26.0
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import mapping as mapping_mod
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops import lm, se3
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.ops.voxel import voxel_downsample
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    mcfg = cfg.mapping
    scene = (synthetic.loop_scene() if args.world == "loop"
             else synthetic.default_scene())
    n = args.at + 1
    poses = synthetic.circle_trajectory(n + 2, radius=args.radius,
                                        angular_rate=args.angular_rate)
    ray = jax.jit(lambda a, b, c, d: synthetic.raycast_scan(
        scene, Pose(a, b), cfg.sensor, next_pose=Pose(c, d), motion=True))

    state = pipeline.init_slam_state(cfg)
    for k in range(n):
        pts, valid, ring = ray(poses.R[k], poses.t[k],
                               poses.R[k + 1], poses.t[k + 1])
        odom_state, out = pipeline.odometry_scan_step(
            state.odom, pts, valid, ring, cfg)
        if args.gt_odom:
            out = out._replace(
                pose=Pose(poses.R[k], poses.t[k] - poses.t[0]))
        map_state = state.mapping
        if k % cfg.mapping_every == 0 and k < args.at:
            map_state, _, _ = mapping_mod.mapping_step(
                map_state, odom_state.last_corner, odom_state.last_surf,
                odom_state.last_outlier, out.pose, jnp.asarray(0.1 * k),
                mcfg)
        state = pipeline.SlamState(odom=odom_state, mapping=map_state,
                                   loops=state.loops)
        if (k + 1) % 10 == 0:
            print(f"  ..ran scan {k + 1}/{n}", flush=True)

    # ---- replay the mapping step at k = args.at eagerly ----
    k = args.at
    odom_state = state.odom
    ms = state.mapping
    guess = se3.project_through_correction(out.pose, ms.t_bef, ms.t_aft)
    gt_t = np.asarray(poses.t[k])

    zero3 = jnp.zeros((3,))
    c_pts, c_ok = voxel_downsample(
        odom_state.last_corner.xyz, odom_state.last_corner.valid,
        mcfg.corner_leaf, mcfg.scan_corner_cap, origin=zero3)
    s_all = jnp.concatenate([odom_state.last_surf.xyz,
                             odom_state.last_outlier.xyz], axis=0)
    s_all_ok = jnp.concatenate([odom_state.last_surf.valid,
                                odom_state.last_outlier.valid], axis=0)
    s_pts, s_ok = voxel_downsample(s_all, s_all_ok, mcfg.surf_leaf,
                                   mcfg.scan_surf_cap, origin=zero3)
    cache = mapping_mod.update_submap_cache(ms.cache, ms.kf, guess.t, mcfg)
    sub_c, sub_cv = cache.c_pts, cache.c_valid
    sub_s, sub_sv = cache.s_pts, cache.s_valid
    gvec = np.asarray(guess.t) - gt_t
    print(f"step k={k}: guess err=({gvec[0]:+.3f},{gvec[1]:+.3f},{gvec[2]:+.3f})"
          f"={np.linalg.norm(gvec):.3f}"
          f"  submap C={int(jnp.sum(sub_cv))} S={int(jnp.sum(sub_sv))}"
          f"  scan C={int(jnp.sum(c_ok))} S={int(jnp.sum(s_ok))}")
    # Keyframe pose errors vs ground truth (keyframe j was scan j*mapping_every).
    nkf = int(ms.kf.count)
    for j in range(nkf):
        kj = j * cfg.mapping_every
        ev = np.asarray(ms.kf.t[j]) - np.asarray(poses.t[kj])
        print(f"    kf{j:02d} (scan {kj:3d}) err=({ev[0]:+.3f},{ev[1]:+.3f},"
              f"{ev[2]:+.3f})={np.linalg.norm(ev):.3f}")

    T = guess
    for i in range(args.iters):
        pc_w = se3.transform_points(T, c_pts)
        ps_w = se3.transform_points(T, s_pts)
        t1, t2, c_gate = mapping_mod._fit_corner(pc_w, c_ok, sub_c, sub_cv,
                                                 mcfg)
        pn, off, s_gate = mapping_mod._fit_surf(ps_w, s_ok, sub_s, sub_sv,
                                                mcfg)
        cdir, cres, c_okr = mapping_mod._corner_residuals_from(
            pc_w, t1, t2, c_gate, mcfg)
        sdir, sres, s_okr = mapping_mod._surf_residuals_from(
            ps_w, pn, off, s_gate, mcfg)
        p_all = jnp.concatenate([pc_w, ps_w], axis=0)
        dir_all = jnp.concatenate([cdir, sdir], axis=0)
        res_all = jnp.concatenate([cres, sres], axis=0)
        ok_all = jnp.concatenate([c_okr, s_okr], axis=0)
        lin_c = T.t
        J = jnp.concatenate(
            [jnp.cross(p_all - lin_c[None, :], dir_all), dir_all], axis=1)
        AtA, AtB = lm.assemble_normal_equations(J, res_all, ok_all, 1.0)
        evals = np.linalg.eigvalsh(np.asarray(AtA))
        # Translation-gradient breakdown: who pulls in x/y?
        Jn, rn, okn = map(np.asarray, (J, res_all, ok_all))
        nzq = np.abs(np.asarray(pn)[:, 2])
        is_g = np.concatenate([np.zeros(pc_w.shape[0], bool), nzq > 0.8])
        is_c = np.concatenate([np.ones(pc_w.shape[0], bool),
                               np.zeros(ps_w.shape[0], bool)])
        def grad(m):
            mm = okn & m
            return -(Jn[mm, 3:] * rn[mm, None]).sum(0)
        gg, gw, gc = grad(is_g), grad(~is_g & ~is_c), grad(is_c)
        deg = lm.analyze_degeneracy(AtA, mcfg.degeneracy_eig_thresh)
        delta, _ = lm.solve_assembled(AtA, AtB, deg, False,
                                      mcfg.degeneracy_eig_thresh)
        T_new = se3.retract_about(T, delta, lin_c)
        terr = np.linalg.norm(np.asarray(T_new.t) - gt_t)
        res_sq = float(jnp.sum(jnp.where(ok_all, res_all ** 2, 0.0)))
        nC, nS = int(jnp.sum(c_okr)), int(jnp.sum(s_okr))
        d = np.asarray(delta)
        evecs = np.linalg.eigh(np.asarray(AtA))[1]
        v0 = evecs[:, 0]
        # Surf-normal anisotropy of the surviving residuals.
        nz = np.abs(np.asarray(pn)[:, 2])[np.asarray(s_okr)]
        n_ground = int((nz > 0.8).sum())
        errv = np.asarray(T_new.t) - gt_t
        print(f" it{i}: nC={nC:4d} nS={nS:5d} (ground {n_ground:4d}) "
              f"|res|²={res_sq:8.2f} "
              f"evals=[{evals[0]:7.1f} {evals[1]:7.1f} {evals[2]:8.1f} | "
              f"{evals[3]:8.0f} {evals[4]:9.0f} {evals[5]:9.0f}] "
              f"degen={bool(deg.is_degenerate)}\n"
              f"      dt=({d[3]:+.3f},{d[4]:+.3f},{d[5]:+.3f}) "
              f"dw_deg=({np.degrees(d[0]):+.3f},{np.degrees(d[1]):+.3f},"
              f"{np.degrees(d[2]):+.3f}) "
              f"v0=({v0[0]:+.2f},{v0[1]:+.2f},{v0[2]:+.2f}|"
              f"{v0[3]:+.2f},{v0[4]:+.2f},{v0[5]:+.2f}) "
              f"err=({errv[0]:+.3f},{errv[1]:+.3f},{errv[2]:+.3f})"
              f"={terr:.4f}\n"
              f"      grad_t: ground=({gg[0]:+7.1f},{gg[1]:+7.1f},{gg[2]:+7.1f})"
              f" wall=({gw[0]:+7.1f},{gw[1]:+7.1f},{gw[2]:+7.1f})"
              f" corner=({gc[0]:+7.1f},{gc[1]:+7.1f},{gc[2]:+7.1f})",
              flush=True)
        T = T_new


if __name__ == "__main__":
    main()
