"""Loop closure end-to-end through ``slam_scan_step`` on a natural revisit.

Reference behavior: `mapOptmization.cpp:802-945` (detect by radius + time
gap, ICP align, add factor, `correctPoses`) driven by the 1 Hz thread; here
the `LoopScheduler` cadence + `run_loop` flag drive the same path inside the
live pipeline.

What is asserted — and what deliberately is NOT: on every synthetic world
(ring, small and 766/1570 m circuits, 1-3 laps, chip runs recorded in
PERF.md) radius-mode scan-to-map re-aligns the pose to old keyframes as the
vehicle re-enters mapped territory, so accepted ICP closures measure ~zero
residual and their corrections are cm-scale — the rebuild's implicit
closure is strictly stronger than the reference's explicit one at these
scales.  The regression-tested numbers are therefore: closures DO fire and
are accepted on a revisit lap, their corrections are applied (trajectory
perturbed but NOT degraded), and the fused trajectory stays accurate.
The correction machinery itself (pose-graph bending a genuinely drifted
store) is unit-tested in tests/test_loopclosure.py / test_posegraph.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import pipeline
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import metrics, synthetic


def _run(cfg, scans, times):
    state = pipeline.init_slam_state(cfg)
    sched = pipeline.LoopScheduler(cfg)
    fused = []
    for k, s in enumerate(scans):
        state, out = pipeline.slam_scan_step(
            state, *s, cfg, times[k],
            run_mapping=(k % cfg.mapping_every == 0),
            run_loop=sched.due(times[k]))
        fused.append(out.fused_pose.t)
    return state, jnp.stack(fused)


@pytest.mark.slow
def test_loop_closure_fires_and_stays_accurate_on_revisit():
    # Fast lap: 1.05 m/scan, ~180-scan lap, 260 scans = 1.4 laps; the
    # reference's 30 s time gate shrinks to 8 s so the revisit qualifies.
    cfg = DEFAULT.replace(
        loop=dataclasses.replace(DEFAULT.loop, enabled=True,
                                 min_time_gap=8.0, cadence=1.0))
    scene = synthetic.loop_scene()
    n = 260
    poses = synthetic.circle_trajectory(n + 1, radius=30.0,
                                        angular_rate=0.035)
    ray = jax.jit(lambda a, b, c, d: synthetic.raycast_scan(
        scene, Pose(a, b), cfg.sensor, next_pose=Pose(c, d), motion=True))
    scans = [ray(poses.R[k], poses.t[k], poses.R[k + 1], poses.t[k + 1])
             for k in range(n)]
    times = [0.1 * k for k in range(n)]

    st_loop, fused_loop = _run(cfg, scans, times)

    n_closures = int(st_loop.loops.count)
    assert n_closures >= 1, "no loop closure fired on a revisit lap"

    gt = jnp.asarray(poses.t)[:n]
    ate = float(metrics.ate_rmse(fused_loop, gt))
    assert np.isfinite(ate) and ate < 0.5, ate
    # Post-closure keyframe store must remain orthonormal + finite.
    kf = st_loop.mapping.kf
    m = int(kf.count)
    R = np.asarray(kf.R[:m], np.float64)
    dets = np.linalg.det(R)
    assert np.all(np.abs(dets - 1.0) < 1e-3), dets.min()
    assert np.all(np.isfinite(np.asarray(kf.t[:m])))
