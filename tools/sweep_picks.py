#!/usr/bin/env python
"""Sweep feature pick counts: full-SLAM throughput vs trajectory accuracy.

For each (edge_per_section, surf_per_section) setting, runs the full SLAM
pipeline over a synthetic motion-distorted trajectory and reports scans/sec
(steady-state, host-fetch synced) and ATE RMSE — the data behind the
FeatureConfig default (reference counts are 2/4, featureAssociation.cpp:709,747).

Usage: python tools/sweep_picks.py [--scans 200] [--backend cpu]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SETTINGS = [(2, 4, 128, 512), (4, 8, 512, 1024), (6, 12, 768, 1536)]


def run_one(cfg, scene, poses, n, noise=0.0):
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import metrics, synthetic

    if noise > 0:
        rayn = jax.jit(lambda pk_R, pk_t, nx_R, nx_t, key:
                       synthetic.raycast_scan(
                           scene, Pose(pk_R, pk_t), cfg.sensor,
                           next_pose=Pose(nx_R, nx_t), motion=True,
                           noise_key=key, noise_sigma=float(noise)))
        keys = jax.random.split(jax.random.PRNGKey(3), poses.t.shape[0])

        def ray(pk_R, pk_t, nx_R, nx_t, _i=[0]):
            k = _i[0] % keys.shape[0]
            _i[0] += 1
            return rayn(pk_R, pk_t, nx_R, nx_t, keys[k])
    else:
        ray = jax.jit(lambda pk_R, pk_t, nx_R, nx_t: synthetic.raycast_scan(
            scene, Pose(pk_R, pk_t), cfg.sensor,
            next_pose=Pose(nx_R, nx_t), motion=True))
    # Pre-raycast a small cycle of scans so the timed loop is SLAM-only.
    n_pre = 24
    pre = [jax.tree.map(np.asarray, ray(poses.R[k], poses.t[k],
                                        poses.R[k + 1], poses.t[k + 1]))
           for k in range(n_pre)]

    state = pipeline.init_slam_state(cfg)
    fused = []
    t0 = t_steady = time.perf_counter()
    warm = min(24, n // 4)
    for k in range(n):
        pts, valid, ring = pre[k % n_pre]
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0))
        fused.append(out.fused_pose.t)
        if k == warm - 1:
            np.asarray(out.fused_pose.t)  # sync; discard compile time
            t_steady = time.perf_counter()
    np.asarray(fused[-1])
    dt = time.perf_counter() - t_steady
    sps = (n - warm) / dt

    # Accuracy is measured on the REAL (non-cycled) trajectory separately so
    # timing and accuracy don't fight over the scan source.
    state = pipeline.init_slam_state(cfg)
    fused = []
    m = min(n, 120)
    for k in range(m):
        pts, valid, ring = ray(poses.R[k], poses.t[k],
                               poses.R[k + 1], poses.t[k + 1])
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, cfg, 0.1 * k,
            run_mapping=(k % cfg.mapping_every == 0))
        fused.append(out.fused_pose.t)
    est = jnp.stack(fused)
    ate = float(metrics.ate_rmse(est, jnp.asarray(np.asarray(poses.t)[:m])))
    return sps, ate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=200)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="range noise sigma (m): re-validate the pick-count "
                         "choice under realistic sensor noise")
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.utils import synthetic

    scene = synthetic.default_scene()
    poses = synthetic.circle_trajectory(args.scans + 1, radius=26.0,
                                        angular_rate=0.009)
    for e, s, cap_s, cap_f in SETTINGS:
        cfg = dataclasses.replace(DEFAULT, feat=dataclasses.replace(
            DEFAULT.feat, edge_per_section=e, surf_per_section=s,
            max_sharp=cap_s, max_flat=cap_f))
        sps, ate = run_one(cfg, scene, poses, args.scans, noise=args.noise)
        print(f"picks {e:2d}/{s:2d}: {sps:7.1f} scans/s   "
              f"ATE(fused,120) {ate:.4f} m", flush=True)


if __name__ == "__main__":
    main()
