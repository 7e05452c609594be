"""Mid-stream degenerate scans through the FULL SLAM step.

The reference silently skips dropped/late messages and shuts down on
malformed ring clouds (SURVEY §5 failure handling); the rebuild's contract
is stronger: an all-invalid scan (sensor blackout), an all-ground scan, or
a near-empty scan arriving MID-SEQUENCE must leave the pipeline finite and
able to recover on the next good scan (the solvers gate on correspondence
counts: featureAssociation.cpp:1668 min feature gates, mapOptmization.cpp:
1238 min residuals)."""

import jax
import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import pipeline
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic


def _finite_state(state):
    for leaf in jax.tree.leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite state leaf"


def test_blackout_and_sparse_scans_mid_stream():
    cfg = DEFAULT
    scene = synthetic.default_scene()
    n = 8
    poses = synthetic.circle_trajectory(n + 1, radius=20.0,
                                        angular_rate=0.0075)
    good = []
    for k in range(n):
        good.append(synthetic.raycast_scan(
            scene, Pose(poses.R[k], poses.t[k]), cfg.sensor,
            next_pose=Pose(poses.R[k + 1], poses.t[k + 1]), motion=True))

    P = cfg.sensor.n_points
    blackout = (jnp.zeros((P, 3)), jnp.zeros((P,), bool),
                jnp.zeros((P,), jnp.int32))
    # 20 valid points scattered on the ground: not enough features to solve.
    sparse_pts = jnp.zeros((P, 3)).at[:20, 0].set(
        jnp.linspace(2.0, 10.0, 20)).at[:20, 2].set(-0.8)
    sparse = (sparse_pts, jnp.zeros((P,), bool).at[:20].set(True),
              jnp.zeros((P,), jnp.int32))

    seq = [good[0], good[1], blackout, good[2], sparse, good[3], good[4],
           good[5]]
    state = pipeline.init_slam_state(cfg)
    outs = []
    for k, s in enumerate(seq):
        state, out = pipeline.slam_scan_step(state, *s, cfg, 0.1 * k,
                                             run_mapping=(k % 3 == 0))
        outs.append(out)
        _finite_state(state)
        assert bool(jnp.all(jnp.isfinite(out.fused_pose.t)))
        assert bool(jnp.all(jnp.isfinite(out.fused_pose.R)))
    # After recovery the pose must still be advancing (not stuck at origin
    # or exploded): the circle moves ~0.15 m/scan.
    t_last = np.asarray(outs[-1].fused_pose.t)
    assert 0.1 < np.linalg.norm(t_last) < 20.0, t_last
