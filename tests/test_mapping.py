"""Scan-to-map optimization tests: keyframe creation, submap assembly, and the
drift-correction property (mapped trajectory must beat raw odometry)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import mapping, odometry as odom, pipeline
from legoloam_tpu.ops import se3
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import metrics, synthetic

# CPU-sized capacities.
SMALL_MAP = dataclasses.replace(
    DEFAULT.mapping, max_keyframes=128, submap_corner_cap=8192,
    submap_surf_cap=16384, scan_corner_cap=1024, scan_surf_cap=4096,
    # Per-step merges: the incremental==rebuild exactness tests below compare
    # the cache directly against a fresh extract_submap, which requires the
    # cache to be fully caught up after one update call.  The default
    # batched-fold path (submap_merge_batch=4) is covered by
    # test_batched_fold_matches_rebuild.
    submap_merge_batch=1)
CFG = DEFAULT.replace(mapping=SMALL_MAP)


def make_scans(scene, poses: Pose, n: int):
    out = []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[min(k + 1, n - 1)], poses.t[min(k + 1, n - 1)])
        pts, valid, ring = synthetic.raycast_scan(
            scene, pk, CFG.sensor, next_pose=nxt, motion=k + 1 < n)
        out.append((pts, valid, ring))
    return out


@pytest.fixture(scope="module")
def slam_run():
    scene = synthetic.default_scene()
    n = 30
    poses = synthetic.circle_trajectory(n, radius=20.0, angular_rate=0.0075)
    scans = make_scans(scene, poses, n)
    state = pipeline.init_slam_state(CFG)
    fused, mapped, odoms = [], [], []
    for k, (pts, valid, ring) in enumerate(scans):
        state, out = pipeline.slam_scan_step(
            state, pts, valid, ring, CFG, k * 0.1,
            run_mapping=(k % CFG.mapping_every == 0))
        fused.append(np.asarray(out.fused_pose.t))
        mapped.append(np.asarray(out.mapped_pose.t))
        odoms.append(np.asarray(out.odom_pose.t))
    return state, np.array(fused), np.array(mapped), np.array(odoms), poses


def test_keyframes_created(slam_run):
    state, fused, mapped, odoms, poses = slam_run
    count = int(state.mapping.kf.count)
    # ~0.16 m/scan, keyframe every 0.3 m, mapping every 3rd scan.
    assert 3 <= count <= 12
    kf_t = np.asarray(state.mapping.kf.t)[:count]
    # Consecutive keyframes are >= 0.3 m apart (mapOptmization.cpp:1360-1364).
    gaps = np.linalg.norm(np.diff(kf_t, axis=0), axis=1)
    assert np.all(gaps >= 0.29)


def test_submap_extraction(slam_run):
    state, *_ = slam_run
    kf = state.mapping.kf
    center = kf.t[0]
    (sc, scv), (ss, ssv) = mapping.extract_submap(kf, center, CFG.mapping)
    assert int(scv.sum()) > 100
    assert int(ssv.sum()) > 1000
    # Submap points are world-frame: spread must cover tens of meters.
    pts = np.asarray(ss)[np.asarray(ssv)]
    assert np.ptp(pts[:, 0]) > 20


def test_fused_trajectory_accuracy(slam_run):
    state, fused, mapped, odoms, poses = slam_run
    gt = np.asarray(poses.t)[1:]
    ate_fused = float(metrics.ate_rmse(jnp.asarray(fused[:-1]),
                                       jnp.asarray(gt)))
    ate_odom = float(metrics.ate_rmse(jnp.asarray(odoms[:-1]),
                                      jnp.asarray(gt)))
    assert np.isfinite(ate_fused)
    assert ate_fused < 0.15, f"fused ATE {ate_fused:.3f}"
    # Mapping must not make things worse than raw odometry.
    assert ate_fused <= ate_odom * 1.5 + 0.02


def test_mapping_ignores_far_keyframes():
    """A keyframe 1 km away must not enter the submap."""
    cfg = SMALL_MAP
    st = mapping.init_state(cfg)
    kf = st.kf
    far = jnp.array([1000.0, 0.0, 0.0])
    kf = kf._replace(
        t=kf.t.at[0].set(far),
        corner_valid=kf.corner_valid.at[0].set(True),
        surf_valid=kf.surf_valid.at[0].set(True),
        count=jnp.int32(1),
    )
    (sc, scv), (ss, ssv) = mapping.extract_submap(
        kf, jnp.zeros(3), cfg)
    assert int(scv.sum()) == 0
    assert int(ssv.sum()) == 0


def test_incremental_cache_matches_rebuild(slam_run):
    """The incrementally merged submap cache must contain the same voxel
    centroids a from-scratch rebuild produces (weighted-centroid merging is
    associative), up to the prune-region difference."""
    state, *_ = slam_run
    kf = state.mapping.kf
    mc = CFG.mapping
    # The newest keyframe is appended AFTER the merge each step, so the cache
    # trails by one; fold it in (the incremental path, center == origin).
    cache = mapping.update_submap_cache(state.mapping.cache, kf,
                                        state.mapping.cache.origin, mc)
    assert int(cache.merged) == int(kf.count)

    (rc, rcv, rcc), (rs, rsv, rsc) = mapping.extract_submap(
        kf, cache.origin, mc, return_counts=True)

    def voxel_dict(pts, val, cnt, leaf):
        pts, val, cnt = np.asarray(pts), np.asarray(val), np.asarray(cnt)
        out = {}
        for p, c in zip(pts[val], cnt[val]):
            out[tuple(np.floor(p / leaf).astype(int))] = (p, c)
        return out

    inc = voxel_dict(cache.s_pts, cache.s_valid, cache.s_cnt, mc.surf_leaf)
    full = voxel_dict(rs, rsv, rsc, mc.surf_leaf)
    # Every rebuilt voxel within the cache's prune region must exist in the
    # incremental cache with the same centroid and count.
    origin = np.asarray(cache.origin)
    checked = 0
    for key, (p, c) in full.items():
        if np.linalg.norm(p - origin) > mc.search_radius:
            continue
        assert key in inc, key
        pi, ci = inc[key]
        np.testing.assert_allclose(pi, p, atol=2e-4)
        assert ci == c, (ci, c)
        checked += 1
    assert checked > 1000


def test_cache_rebuilds_when_stale(slam_run):
    state, *_ = slam_run
    mc = CFG.mapping
    st = state.mapping
    stale = st.cache._replace(stale=jnp.array(True))
    new_cache = mapping.update_submap_cache(stale, st.kf, st.t_aft.t, mc)
    assert not bool(new_cache.stale)
    assert int(new_cache.merged) == int(st.kf.count)
    # Rebuild recenters the Morton origin at the given pose.
    np.testing.assert_allclose(np.asarray(new_cache.origin),
                               np.asarray(st.t_aft.t), atol=1e-6)


def _toy_store(cfg, n_kf, spacing=20.0):
    """n_kf keyframes strung out along x at ``spacing`` (far beyond any
    radius), each carrying a small distinctive corner/surf cloud."""
    state = mapping.init_state(cfg)
    kf = state.kf
    rng = np.random.RandomState(0)
    R = np.broadcast_to(np.eye(3, dtype=np.float32),
                        (n_kf, 3, 3)).copy()
    t = np.zeros((n_kf, 3), np.float32)
    t[:, 0] = np.arange(n_kf) * spacing
    corner = np.zeros((n_kf, cfg.scan_corner_cap, 3), np.float32)
    surf = np.zeros((n_kf, cfg.scan_surf_cap, 3), np.float32)
    cv = np.zeros((n_kf, cfg.scan_corner_cap), bool)
    sv = np.zeros((n_kf, cfg.scan_surf_cap), bool)
    corner[:, :6] = rng.uniform(-3, 3, (n_kf, 6, 3)).astype(np.float32)
    surf[:, :10] = rng.uniform(-3, 3, (n_kf, 10, 3)).astype(np.float32)
    cv[:, :6] = True
    sv[:, :10] = True
    kf = kf._replace(
        R=kf.R.at[:n_kf].set(R), t=kf.t.at[:n_kf].set(t),
        corner=kf.corner.at[:n_kf].set(corner),
        corner_valid=kf.corner_valid.at[:n_kf].set(cv),
        surf=kf.surf.at[:n_kf].set(surf),
        surf_valid=kf.surf_valid.at[:n_kf].set(sv),
        count=jnp.int32(n_kf))
    return kf


def test_recent_submap_mode_matches_reference_deque():
    """submap_mode='recent' reproduces the reference's loop-closure-mode
    recency deque (mapOptmization.cpp:961-1000): the submap is exactly the
    union of the LAST search_num keyframes' clouds — including keyframes far
    outside the radius that radius mode drops — voxel-downsampled."""
    from legoloam_tpu.ops.voxel import voxel_downsample

    n_kf, S = 8, 3
    base = dataclasses.replace(SMALL_MAP, search_num=S, search_radius=5.0)
    rec = dataclasses.replace(base, submap_mode="recent")
    kf = _toy_store(rec, n_kf)
    center = kf.t[n_kf - 1]

    (c, cval), (s, sval) = mapping.extract_submap(kf, center, rec)

    # Expected: concatenate the last S keyframes' clouds (ascending index,
    # the deque order) in world frame and voxel-downsample identically.
    sel = jnp.arange(n_kf - S, n_kf)
    world_c = se3.transform_points(Pose(kf.R[sel], kf.t[sel]), kf.corner[sel])
    world_s = se3.transform_points(Pose(kf.R[sel], kf.t[sel]), kf.surf[sel])
    ec, ecv = voxel_downsample(world_c.reshape(-1, 3),
                               kf.corner_valid[sel].reshape(-1),
                               rec.corner_leaf, rec.submap_corner_cap,
                               origin=center)
    es, esv = voxel_downsample(world_s.reshape(-1, 3),
                               kf.surf_valid[sel].reshape(-1),
                               rec.surf_leaf, rec.submap_surf_cap,
                               origin=center)
    np.testing.assert_array_equal(np.asarray(cval), np.asarray(ecv))
    np.testing.assert_allclose(np.asarray(c)[np.asarray(cval)],
                               np.asarray(ec)[np.asarray(ecv)], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sval), np.asarray(esv))
    np.testing.assert_allclose(np.asarray(s)[np.asarray(sval)],
                               np.asarray(es)[np.asarray(esv)], atol=1e-6)
    # The recent submap holds clouds from keyframes 40-140 m away...
    assert int(jnp.sum(cval)) == S * 6
    # ...which radius mode (5 m) would exclude: only the center keyframe's.
    (rc, rcval), _ = mapping.extract_submap(kf, center, base)
    assert int(jnp.sum(rcval)) == 6


def test_recent_submap_cache_always_rebuilds():
    """In recent mode the cache rebuilds every step: after two consecutive
    updates with a GROWING store the cache equals a fresh extract_submap (an
    incremental merge could never evict the departed keyframe)."""
    n_kf, S = 6, 3
    rec = dataclasses.replace(SMALL_MAP, search_num=S, search_radius=5.0,
                              submap_mode="recent")
    kf_small = _toy_store(rec, n_kf - 1)
    kf_full = _toy_store(rec, n_kf)
    center = kf_full.t[n_kf - 1]
    cache = mapping.init_state(rec).cache
    cache = mapping.update_submap_cache(cache, kf_small, center, rec)
    cache = mapping.update_submap_cache(cache, kf_full, center, rec)
    (ec, ecv), _ = mapping.extract_submap(kf_full, center, rec)
    np.testing.assert_array_equal(np.asarray(cache.c_valid), np.asarray(ecv))
    np.testing.assert_allclose(np.asarray(cache.c_pts)[np.asarray(ecv)],
                               np.asarray(ec)[np.asarray(ecv)], atol=1e-6)


def test_batched_fold_matches_rebuild():
    """submap_merge_batch=4: pending keyframes accumulate without touching
    the cache (zero sort work on those steps), then ONE fold catches up and
    the result equals a from-scratch rebuild voxel-for-voxel."""
    cfg = dataclasses.replace(SMALL_MAP, submap_merge_batch=4)
    kf_full = _toy_store(cfg, 13, spacing=2.0)
    center = kf_full.t[0]

    def at_count(c):
        return kf_full._replace(count=jnp.int32(c))

    cache = mapping.init_state(cfg).cache
    cache = mapping.update_submap_cache(cache, at_count(9), center, cfg)
    assert int(cache.merged) == 9          # stale init -> full rebuild
    for c in (10, 11, 12):
        before = np.asarray(cache.c_pts)
        cache = mapping.update_submap_cache(cache, at_count(c), center, cfg)
        assert int(cache.merged) == 9      # pending < batch: untouched
        np.testing.assert_array_equal(np.asarray(cache.c_pts), before)
    cache = mapping.update_submap_cache(cache, at_count(13), center, cfg)
    assert int(cache.merged) == 13         # pending == batch: one fold

    (ec, ecv, ecc), (es, esv, esc) = mapping.extract_submap(
        at_count(13), center, cfg, return_counts=True)
    np.testing.assert_array_equal(np.asarray(cache.c_valid), np.asarray(ecv))
    np.testing.assert_allclose(np.asarray(cache.c_pts)[np.asarray(ecv)],
                               np.asarray(ec)[np.asarray(ecv)], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache.s_valid), np.asarray(esv))
    np.testing.assert_allclose(np.asarray(cache.s_pts)[np.asarray(esv)],
                               np.asarray(es)[np.asarray(esv)], atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache.c_cnt), np.asarray(ecc),
                               atol=1e-5)
