"""Sensor-geometry matrix: every SENSORS config end-to-end through the full
SLAM step (utility.h:70-102 keeps these as commented-out compile-time blocks;
here they are first-class configs and must all actually run).

The OS1 geometries exercise the 1024-column Pallas padding paths; HDL-32e
doubles the ring count; VLS-128 is the 128-ring stress case (marked slow)."""

import dataclasses

import numpy as np
import pytest

from legoloam_tpu.config import DEFAULT, SENSORS
from legoloam_tpu.models import pipeline
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic

SMALL_MAP = dataclasses.replace(
    DEFAULT.mapping, max_keyframes=32, submap_corner_cap=4096,
    submap_surf_cap=8192, scan_corner_cap=1024, scan_surf_cap=4096)


def _run_sensor(name, n=4):
    cfg = DEFAULT.replace(sensor=SENSORS[name], mapping=SMALL_MAP)
    scene = synthetic.default_scene()
    poses = synthetic.circle_trajectory(n + 1, radius=18.0,
                                        angular_rate=0.009)
    state = pipeline.init_slam_state(cfg)
    errs = []
    for k in range(n):
        pk = Pose(poses.R[k], poses.t[k])
        nxt = Pose(poses.R[k + 1], poses.t[k + 1])
        scan = synthetic.raycast_scan(scene, pk, cfg.sensor, next_pose=nxt,
                                      motion=True)
        state, out = pipeline.slam_scan_step(
            state, *scan, cfg, k * cfg.sensor.scan_period,
            run_mapping=(k % cfg.mapping_every == 0))
        est = np.asarray(out.fused_pose.t)
        assert np.all(np.isfinite(est)), f"{name}: non-finite pose at k={k}"
        gt = np.asarray(poses.t[k]) - np.asarray(poses.t[0])
        errs.append(np.linalg.norm(est - gt))
    assert int(state.mapping.kf.count) >= 1, name
    # Loose sanity bound: a 4-scan run must stay within a meter of truth.
    assert max(errs) < 1.0, (name, errs)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["hdl32e", "os1_16", "os1_64"])
def test_sensor_end_to_end(name):
    _run_sensor(name)


@pytest.mark.slow
def test_sensor_end_to_end_vls128():
    _run_sensor("vls128", n=3)


def test_sensor_vlp16_fast():
    """The default geometry stays in the fast (non-slow) suite."""
    _run_sensor("vlp16", n=4)
