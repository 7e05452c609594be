"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 "multi-host
without a cluster"): the distributed pose-graph solve must match the
single-device solve; the DP frontend must match per-scan results."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT, PoseGraphConfig
from legoloam_tpu.models import posegraph, pipeline
from legoloam_tpu.ops import se3
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.parallel import frontend_dp, mesh as mesh_mod, posegraph_dist
from legoloam_tpu.utils import synthetic

CFG = PoseGraphConfig()
M = 64


def build_graph(n, key=0):
    k = jax.random.PRNGKey(key)
    meas_R = [np.eye(3, dtype=np.float32)]
    meas_t = [np.zeros(3, np.float32)]
    for i in range(1, n):
        w = 0.05 * jax.random.normal(jax.random.fold_in(k, i), (3,))
        meas_R.append(np.asarray(se3.so3_exp(w)))
        meas_t.append(np.array([1.0, 0.05, 0.0], np.float32))
    R0 = [np.eye(3, dtype=np.float32)]
    t0 = [np.zeros(3, np.float32)]
    for i in range(1, n):
        R0.append(R0[-1] @ meas_R[i])
        t0.append(R0[-2] @ meas_t[i] + t0[-1])
    cR = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy().at[:n].set(
        jnp.asarray(np.stack(meas_R)))
    ct = jnp.zeros((M, 3)).at[:n].set(jnp.asarray(np.stack(meas_t)))
    key2 = jax.random.fold_in(k, 999)
    R = jnp.broadcast_to(jnp.eye(3), (M, 3, 3)).copy().at[:n].set(
        jnp.asarray(np.stack(R0)))
    t_pert = np.stack(t0) + 0.2 * np.asarray(jax.random.normal(key2, (n, 3)))
    t = jnp.zeros((M, 3)).at[:n].set(jnp.asarray(t_pert))
    return R, t, cR, ct, np.stack(t0)


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_distributed_posegraph_matches_single_device():
    n = 40
    R, t, cR, ct, t_true = build_graph(n)
    loops = posegraph.init_loop_factors(16)
    loops = posegraph.add_loop_factor(
        loops, 0, n - 1,
        Pose(jnp.asarray(np.eye(3, dtype=np.float32)),
             jnp.asarray(t_true[n - 1].astype(np.float32))),
        jnp.float32(1e-6))
    prior = Pose(jnp.eye(3), jnp.zeros(3))

    R1, t1 = posegraph.optimize(R, t, jnp.int32(n), cR, ct, loops, prior, CFG)

    m = mesh_mod.make_mesh(8)
    R8, t8 = posegraph_dist.optimize_sharded(
        R, t, jnp.int32(n), cR, ct, loops, prior, CFG, m)

    np.testing.assert_allclose(np.asarray(t8[:n]), np.asarray(t1[:n]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(R8[:n]), np.asarray(R1[:n]),
                               atol=1e-3)


def test_dp_frontend_matches_single_scan():
    scene = synthetic.default_scene()
    m = mesh_mod.make_mesh(8)
    fn = frontend_dp.make_batched_frontend(DEFAULT, m)
    ptss, valids, rings = [], [], []
    poses = synthetic.circle_trajectory(8, radius=15.0, angular_rate=0.02)
    for k in range(8):
        p, v, r = synthetic.raycast_scan(
            scene, Pose(poses.R[k], poses.t[k]), DEFAULT.sensor)
        ptss.append(p)
        valids.append(v)
        rings.append(r)
    batch = (jnp.stack(ptss), jnp.stack(valids), jnp.stack(rings))
    feats = fn(*batch)
    # Compare one scan against the single-scan path.
    single = pipeline.process_scan(ptss[3], valids[3], rings[3], DEFAULT)
    np.testing.assert_allclose(np.asarray(feats.sharp.xyz[3]),
                               np.asarray(single.sharp.xyz), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(feats.less_flat.valid[3]),
                                  np.asarray(single.less_flat.valid))


def test_sharded_submap_matches_single_device():
    """Per-shard submap assembly + all_gather must cover the same region as
    the single-device path (same keyframes selected, same voxel centroids up
    to per-shard voxel splits)."""
    import dataclasses

    from legoloam_tpu.models import mapping
    from legoloam_tpu.parallel import mapping_dist

    # Small clouds so the voxel census fits well under the submap caps —
    # with overflowing caps both paths drop different (hash-ordered) voxels
    # and coverage comparison is meaningless.
    cfg = dataclasses.replace(
        DEFAULT.mapping, max_keyframes=32, scan_corner_cap=64,
        scan_surf_cap=256, submap_corner_cap=4096, submap_surf_cap=16384)
    st = mapping.init_state(cfg)
    kf = st.kf
    key = jax.random.PRNGKey(0)
    n_kf = 10
    for k in range(n_kf):
        pts = jax.random.uniform(jax.random.fold_in(key, k),
                                 (cfg.scan_surf_cap, 3)) * 10
        kf = kf._replace(
            t=kf.t.at[k].set(jnp.array([2.0 * k, 0.0, 0.0])),
            surf=kf.surf.at[k].set(pts),
            surf_valid=kf.surf_valid.at[k].set(True),
            corner=kf.corner.at[k].set(pts[: cfg.scan_corner_cap]),
            corner_valid=kf.corner_valid.at[k].set(True),
            count=jnp.int32(k + 1),
        )
    center = jnp.array([6.0, 0.0, 0.0])

    (sc1, scv1), (ss1, ssv1) = mapping.extract_submap(kf, center, cfg)
    m = mesh_mod.make_mesh(8)
    kf_sharded = mapping_dist.shard_keyframes(kf, m)  # cyclic layout required
    (sc8, scv8), (ss8, ssv8) = mapping_dist.extract_submap_sharded(
        kf_sharded, center, cfg, m)

    # Same spatial coverage: voxel-key sets agree.
    def keys(pts, val, leaf=0.2):
        p = np.asarray(pts)[np.asarray(val)]
        return set(map(tuple, np.floor(p / leaf).astype(int).tolist()))

    k1 = keys(ss1, ssv1)
    k8 = keys(ss8, ssv8)
    inter = len(k1 & k8) / max(len(k1 | k8), 1)
    assert inter > 0.95, f"submap voxel overlap only {inter:.2f}"
