"""Loop-closure tests: detection gating, ICP correction of a drifted revisit,
and pose-graph write-back (reference mapOptmization.cpp:802-945,1456-1478)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT, LoopClosureConfig, PoseGraphConfig
from legoloam_tpu.models import loopclosure, mapping, posegraph
from legoloam_tpu.ops import se3, voxel
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic

MAP_CFG = dataclasses.replace(
    DEFAULT.mapping, max_keyframes=32, scan_corner_cap=256, scan_surf_cap=2048,
    submap_corner_cap=4096, submap_surf_cap=8192)
LOOP_CFG = dataclasses.replace(DEFAULT.loop, enabled=True, cur_cap=2048,
                               hist_cap=16384)
# The reference's chain variances (1e-8 trans) make a SINGLE loop factor on a
# 12-node chain nearly inert — correction there emerges from hundreds of nodes
# (rotational lever arms) and repeated factors per revisit.  To test the
# correction path at this scale, soften the chain so the loop factor dominates.
SOFT_PG = dataclasses.replace(DEFAULT.posegraph, odom_rot_var=1e-3,
                              odom_trans_var=1e-2)


def build_drifted_store():
    """Keyframes around a loop: kf0 at origin, the path wanders off and
    returns; the LAST keyframe is physically at the origin again but its
    STORED pose carries accumulated drift."""
    scene = synthetic.default_scene()
    n = 12
    # True positions: out along +x and back.
    xs = [0, 2, 4, 6, 8, 8, 8, 6, 4, 2, 0.5, 0.0]
    ys = [0, 0, 0, 0, 0, 2, 4, 4, 4, 4, 2.0, 0.2]
    drift = np.zeros((n, 3), np.float32)
    drift[-1] = [0.6, 0.4, 0.0]  # drifted estimate of the revisit keyframe
    drift[-2] = [0.45, 0.3, 0.0]

    st = mapping.init_state(MAP_CFG)
    kf = st.kf
    for k in range(n):
        true_pose = Pose(jnp.eye(3), jnp.array([xs[k], ys[k], 0.8]))
        pts, valid, ring = synthetic.raycast_scan(scene, true_pose,
                                                  DEFAULT.sensor)
        c_pts, c_ok = voxel.voxel_downsample(pts, valid, 0.2,
                                             MAP_CFG.scan_corner_cap)
        s_pts, s_ok = voxel.voxel_downsample(pts, valid, 0.4,
                                             MAP_CFG.scan_surf_cap)
        stored_t = jnp.asarray([xs[k], ys[k], 0.8], jnp.float32) \
            + jnp.asarray(drift[k])
        prev_t = kf.t[k - 1] if k else jnp.zeros(3)
        kf = kf._replace(
            R=kf.R.at[k].set(jnp.eye(3)),
            t=kf.t.at[k].set(stored_t),
            time=kf.time.at[k].set(k * 4.0),    # 44 s span -> gap > 30 s
            chain_R=kf.chain_R.at[k].set(jnp.eye(3)),
            chain_t=kf.chain_t.at[k].set(stored_t - prev_t),
            corner=kf.corner.at[k].set(c_pts),
            corner_valid=kf.corner_valid.at[k].set(c_ok),
            surf=kf.surf.at[k].set(s_pts),
            surf_valid=kf.surf_valid.at[k].set(s_ok),
            count=jnp.int32(k + 1),
        )
    return kf


def test_detect_requires_time_gap_and_radius():
    kf = build_drifted_store()
    cand = int(loopclosure.detect(kf, LOOP_CFG))
    # Latest kf (t=44s) near origin: candidates are kf0 (t=0, d~0.7m) and
    # kf1.. within 7m but only those older than 30s qualify -> kf0..kf2.
    assert cand in (0, 1, 2)
    # With an impossible radius nothing is found.
    tight = dataclasses.replace(LOOP_CFG, search_radius=0.01)
    assert int(loopclosure.detect(kf, tight)) == -1
    # With an impossible time gap nothing is found.
    gap = dataclasses.replace(LOOP_CFG, min_time_gap=1e6)
    assert int(loopclosure.detect(kf, gap)) == -1


def test_close_and_correct_fixes_drift():
    kf = build_drifted_store()
    loops = posegraph.init_loop_factors(8)
    kf2, loops2, corrected, diag = loopclosure.close_and_correct(
        kf, loops, LOOP_CFG, SOFT_PG)
    assert bool(diag.closed), f"loop not closed (fitness {float(diag.fitness)})"
    assert int(loops2.count) == 1
    # The revisit keyframe's drift (0.72 m) must shrink substantially.
    err_before = np.linalg.norm(np.asarray(kf.t[11]) - np.array([0, 0.2, 0.8]))
    err_after = np.linalg.norm(np.asarray(kf2.t[11]) - np.array([0, 0.2, 0.8]))
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # Anchor keyframe stays put.
    np.testing.assert_allclose(np.asarray(kf2.t[0]), [0.0, 0.0, 0.8], atol=0.05)


def test_cap_terminated_icp_accepted():
    """PCL hasConverged() semantics (mapOptmization.cpp:904): an alignment
    that exhausts the iteration cap WITHOUT firing the eps criterion, but
    ends under the fitness threshold, must still be accepted — the reference's
    acceptance is effectively fitness-only.  Force cap termination by
    allowing so few iterations that |err(i) - err(i-1)| never drops
    below eps."""
    kf = build_drifted_store()
    loops = posegraph.init_loop_factors(8)
    capped = dataclasses.replace(LOOP_CFG, icp_max_iters=3, icp_eps=0.0)
    # icp_eps=0 can never fire (|Δerr| < 0 is impossible) -> every ICP run is
    # cap-terminated; the strict `converged` flag is False by construction.
    from legoloam_tpu.models.loopclosure import (_history_cloud, _world_cloud,
                                                 detect)
    from legoloam_tpu.ops import icp as icp_ops
    cand = detect(kf, capped)
    cur = int(kf.count) - 1
    cur_pts, cur_val = _world_cloud(kf, cur)
    hist_pts, hist_val = _history_cloud(kf, jnp.maximum(cand, 0), capped)
    res = icp_ops.icp(cur_pts, cur_val, hist_pts, hist_val, Pose.identity(),
                      max_corr_dist=capped.icp_max_corr_dist,
                      max_iters=capped.icp_max_iters, eps=capped.icp_eps)
    assert not bool(res.converged), "eps fired with eps=0 — impossible"
    assert bool(res.has_converged)
    assert float(res.fitness) < capped.fitness_thresh, float(res.fitness)
    # The full closure path must accept this cap-terminated alignment.
    kf2, loops2, corrected, diag = loopclosure.close_and_correct(
        kf, loops, capped, SOFT_PG)
    assert bool(diag.closed), f"cap-terminated alignment rejected " \
                              f"(fitness {float(diag.fitness)})"
    assert int(loops2.count) == 1


def test_no_false_closure_when_far():
    """If the latest keyframe is far from everything old, nothing happens."""
    kf = build_drifted_store()
    kf = kf._replace(t=kf.t.at[11].set(jnp.array([500.0, 500.0, 0.8])))
    loops = posegraph.init_loop_factors(8)
    kf2, loops2, corrected, diag = loopclosure.close_and_correct(
        kf, loops, LOOP_CFG, DEFAULT.posegraph)
    assert not bool(diag.closed)
    assert int(loops2.count) == 0
    np.testing.assert_allclose(np.asarray(kf2.t), np.asarray(kf.t), atol=1e-6)
