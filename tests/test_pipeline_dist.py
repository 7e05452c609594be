"""Multi-chip SLAM loop (parallel/pipeline_dist) on the virtual 8-device CPU
mesh: the sharded mapping step must reproduce the single-device pipeline's
trajectory, the sharded cloud store must round-trip, and the distributed loop
closure must match the single-device correction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT, SENSORS
from legoloam_tpu.models import loopclosure, mapping, pipeline, posegraph
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.parallel import mesh as mesh_mod, pipeline_dist
from legoloam_tpu.utils import metrics, synthetic

SMALL_MAP = dataclasses.replace(
    DEFAULT.mapping, max_keyframes=128, submap_corner_cap=8192,
    submap_surf_cap=16384, scan_corner_cap=1024, scan_surf_cap=4096,
    # The distributed mapping step rebuilds its sharded submap every step;
    # mesh==single parity therefore compares against per-step single-device
    # merges (batch=1), not the batched-fold default whose cache may lag.
    submap_merge_batch=1)
CFG = DEFAULT.replace(mapping=SMALL_MAP)


def _make_scans(cfg, n, radius=20.0):
    scene = synthetic.default_scene()
    poses = synthetic.circle_trajectory(n + 1, radius=radius,
                                        angular_rate=0.0075)
    scans = []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[k + 1], poses.t[k + 1])
        scans.append(synthetic.raycast_scan(scene, pk, cfg.sensor,
                                            next_pose=nxt, motion=True))
    return scans, poses


def test_dist_slam_matches_single_device():
    """9 scans through the full distributed SLAM loop vs the single-device
    pipeline.  The only permitted divergence is cross-shard voxel centroid
    splitting in the submap (each shard voxelizes its own keyframes), so the
    trajectories must agree to centimeters."""
    mesh = mesh_mod.make_mesh(8)
    scans, _ = _make_scans(CFG, 9)

    st1 = pipeline.init_slam_state(CFG)
    single = []
    for k, s in enumerate(scans):
        st1, out = pipeline.slam_scan_step(
            st1, *s, CFG, k * 0.1, run_mapping=(k % CFG.mapping_every == 0))
        single.append(np.asarray(out.fused_pose.t))

    st2 = pipeline_dist.init_dist_state(CFG, mesh)
    dist = []
    for k, s in enumerate(scans):
        st2, out = pipeline_dist.slam_scan_step_dist(
            st2, *s, CFG, mesh, k * 0.1,
            run_mapping=(k % CFG.mapping_every == 0))
        dist.append(np.asarray(out.fused_pose.t))

    single = np.stack(single)
    dist = np.stack(dist)
    assert np.all(np.isfinite(dist))
    assert int(st2.mapping.kf.count) == int(st1.mapping.kf.count)
    np.testing.assert_allclose(dist, single, atol=0.05)
    # Keyframe poses must agree too.
    n_kf = int(st1.mapping.kf.count)
    np.testing.assert_allclose(np.asarray(st2.mapping.kf.t[:n_kf]),
                               np.asarray(st1.mapping.kf.t[:n_kf]), atol=0.05)


def test_store_roundtrip_and_window_gather():
    """from_keyframe_store/to_keyframe_store invert each other, and the
    masked-psum window gather returns exactly the stored clouds."""
    mesh = mesh_mod.make_mesh(8)
    scans, _ = _make_scans(CFG, 4)
    st = pipeline.init_slam_state(CFG)
    for k, s in enumerate(scans):
        st, _ = pipeline.slam_scan_step(st, *s, CFG, k * 0.1,
                                        run_mapping=True)
    kf = st.mapping.kf
    dkf = pipeline_dist.from_keyframe_store(kf, mesh)
    back = pipeline_dist.to_keyframe_store(dkf)
    for name in kf._fields:
        np.testing.assert_array_equal(np.asarray(getattr(back, name)),
                                      np.asarray(getattr(kf, name)),
                                      err_msg=name)

    idxs = jnp.array([0, 2, 3, 1], jnp.int32)
    c, cv, s, sv = pipeline_dist.gather_keyframe_clouds(dkf, idxs, mesh)
    np.testing.assert_allclose(np.asarray(c), np.asarray(kf.corner[idxs]),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(cv),
                                  np.asarray(kf.corner_valid[idxs]))
    np.testing.assert_allclose(np.asarray(s), np.asarray(kf.surf[idxs]),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(sv),
                                  np.asarray(kf.surf_valid[idxs]))


def test_dist_submap_covers_single_device():
    """The sharded submap's voxel set must cover the single-device rebuild:
    every occupied single-device voxel cell is occupied in the sharded
    assembly (cross-shard duplicates may ADD cells, never drop them)."""
    mesh = mesh_mod.make_mesh(8)
    scans, _ = _make_scans(CFG, 9)
    st = pipeline.init_slam_state(CFG)
    for k, s in enumerate(scans):
        st, _ = pipeline.slam_scan_step(st, *s, CFG, k * 0.1,
                                        run_mapping=True)
    kf = st.mapping.kf
    center = kf.t[int(kf.count) - 1]
    (c1, cv1), (s1, sv1) = mapping.extract_submap(kf, center, CFG.mapping)
    dkf = pipeline_dist.from_keyframe_store(kf, mesh)
    (c2, cv2), (s2, sv2) = pipeline_dist.extract_submap_dist(
        dkf, center, CFG.mapping, mesh)

    def cells(pts, ok, leaf):
        q = np.floor(np.asarray(pts)[np.asarray(ok)] / leaf).astype(np.int64)
        return set(map(tuple, q))

    missing_c = cells(c1, cv1, CFG.mapping.corner_leaf) \
        - cells(c2, cv2, CFG.mapping.corner_leaf)
    missing_s = cells(s1, sv1, CFG.mapping.surf_leaf) \
        - cells(s2, sv2, CFG.mapping.surf_leaf)
    # Centroids sit inside their cell, so cell keys are comparable exactly;
    # allow a sliver of boundary-cell disagreement from f32 centroid averaging.
    assert len(missing_c) <= max(2, 0.005 * int(jnp.sum(cv1))), missing_c
    assert len(missing_s) <= max(2, 0.005 * int(jnp.sum(sv1))), missing_s


def test_dist_loop_closure_matches_single_device():
    """close_and_correct_dist on the sharded store vs close_and_correct on
    the same (single-device) store: same acceptance, same corrected poses."""
    from tests.test_loopclosure import (LOOP_CFG, MAP_CFG, SOFT_PG,
                                        build_drifted_store)

    mesh = mesh_mod.make_mesh(8)
    kf = build_drifted_store()
    loops = posegraph.init_loop_factors(8)

    kf1, loops1, corrected1, diag1 = loopclosure.close_and_correct(
        kf, loops, LOOP_CFG, SOFT_PG)
    assert bool(diag1.closed)

    dkf = pipeline_dist.from_keyframe_store(kf, mesh)
    kf2, loops2, corrected2, diag2 = pipeline_dist.close_and_correct_dist(
        dkf, loops, LOOP_CFG, SOFT_PG, mesh)
    assert bool(diag2.closed)
    assert int(diag2.candidate) == int(diag1.candidate)
    np.testing.assert_allclose(float(diag2.fitness), float(diag1.fitness),
                               atol=1e-4)
    n = int(kf.count)
    np.testing.assert_allclose(np.asarray(kf2.t[:n]), np.asarray(kf1.t[:n]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(kf2.R[:n]), np.asarray(kf1.R[:n]),
                               atol=1e-3)


@pytest.mark.slow
def test_dist_slam_hdl32e():
    """BASELINE config 5 names HDL-32e for the sharded-map configuration:
    run the distributed SLAM loop end-to-end on the 32-ring geometry."""
    cfg = CFG.replace(sensor=SENSORS["hdl32e"])
    mesh = mesh_mod.make_mesh(8)
    scans, poses = _make_scans(cfg, 6)
    st = pipeline_dist.init_dist_state(cfg, mesh)
    fused = []
    for k, s in enumerate(scans):
        st, out = pipeline_dist.slam_scan_step_dist(
            st, *s, cfg, mesh, k * 0.1,
            run_mapping=(k % cfg.mapping_every == 0))
        fused.append(np.asarray(out.fused_pose.t))
    fused = np.stack(fused)
    assert np.all(np.isfinite(fused))
    assert int(st.mapping.kf.count) >= 1
    gt = np.asarray(poses.t)[:len(fused)]
    ate = float(metrics.ate_rmse(jnp.asarray(fused), jnp.asarray(gt)))
    assert ate < 0.5, ate


@pytest.mark.xdist_group("blockcompile")
def test_dist_slam_imu_bootstrap_matches_single_device():
    """Mesh ≡ single WITH the full IMU path (de-skew, gyro seed,
    PluginIMURotation analogue, attitude blend) AND the scan-1 bootstrap
    double-resolve — the round-3 driver parity gaps closed."""
    from legoloam_tpu.ops import deskew
    from legoloam_tpu.utils import io as lio

    mesh = mesh_mod.make_mesh(8)
    n = 7
    scene = synthetic.default_scene()
    poses = synthetic.circle_trajectory(n + 1, radius=20.0,
                                        angular_rate=0.0075)
    ts, rpy, acc, gyro = synthetic.make_imu(poses, scan_period=0.1)
    seq = lio.ImuSequence(np.asarray(ts), np.asarray(rpy), np.asarray(acc),
                          np.asarray(gyro), window=64)
    scans, integs = [], []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[k + 1], poses.t[k + 1])
        scans.append(synthetic.raycast_scan(scene, pk, CFG.sensor,
                                            next_pose=nxt, motion=True))
        integs.append(deskew.integrate_imu(seq.window_for(k * 0.1, 0.1)))

    st1 = pipeline.init_slam_state(CFG)
    single = []
    for k, s in enumerate(scans):
        st1, out = pipeline.slam_scan_step(
            st1, *s, CFG, k * 0.1, run_mapping=(k % CFG.mapping_every == 0),
            imu_integral=integs[k], bootstrap=(k == 1))
        single.append(np.asarray(out.fused_pose.t))

    st2 = pipeline_dist.init_dist_state(CFG, mesh)
    dist = []
    for k, s in enumerate(scans):
        st2, out = pipeline_dist.slam_scan_step_dist(
            st2, *s, CFG, mesh, k * 0.1,
            run_mapping=(k % CFG.mapping_every == 0),
            imu_integral=integs[k], bootstrap=(k == 1))
        dist.append(np.asarray(out.fused_pose.t))

    single, dist = np.stack(single), np.stack(dist)
    assert np.all(np.isfinite(dist))
    assert int(st2.mapping.kf.count) == int(st1.mapping.kf.count)
    np.testing.assert_allclose(dist, single, atol=0.05)


@pytest.mark.slow
def test_dist_block_matches_dist_streaming():
    """slam_scan_block_dist ≡ B streaming slam_scan_step_dist calls
    (bootstrap on the first block, mapping on each block's first scan) —
    the distributed block mode is the single-chip block mode's equal."""
    import jax

    mesh = mesh_mod.make_mesh(8)
    B = CFG.mapping_every
    n = 2 * B
    scans, _ = _make_scans(CFG, n)

    st1 = pipeline_dist.init_dist_state(CFG, mesh)
    stream = []
    for k, s in enumerate(scans):
        st1, out = pipeline_dist.slam_scan_step_dist(
            st1, *s, CFG, mesh, k * 0.1, run_mapping=(k % B == 0),
            bootstrap=(k == 1))
        stream.append(np.asarray(out.fused_pose.t))
    stream = np.stack(stream)

    st2 = pipeline_dist.init_dist_state(CFG, mesh)
    block = []
    for b in range(n // B):
        blk = tuple(jnp.stack([scans[b * B + i][j] for i in range(B)])
                    for j in range(3))
        times = jnp.arange(b * B, (b + 1) * B, dtype=jnp.float32) * 0.1
        st2, outs = pipeline_dist.slam_scan_block_dist(
            st2, *blk, CFG, mesh, times, bootstrap=(b == 0))
        block.append(np.asarray(outs.fused_pose.t))
    block = np.concatenate(block)

    assert int(st2.mapping.kf.count) == int(st1.mapping.kf.count)
    # First block: bit-scale equivalence (measured 4e-9 incl. the bootstrap
    # scan).  Across the block-2 boundary the different program packing can
    # reassociate frontend f32 ops; an epsilon curvature difference may flip
    # one discrete feature pick and shift a later scan by ~mm (the same
    # chaotic amplification the single-chip suite tolerates on fast
    # geometry), so the full trajectory gets a mm-scale tolerance.
    np.testing.assert_allclose(block[:B], stream[:B], atol=1e-5)
    np.testing.assert_allclose(block, stream, atol=2e-3)
