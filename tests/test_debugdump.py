"""Debug-dump stream (utils/debugdump.py) + offline viewer — the reference's
subscriber-gated RViz debug publishers (imageProjection.cpp:463-507,
mapOptmization.cpp:692-800) as an offline npz stream."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from legoloam_tpu.config import DEFAULT
from legoloam_tpu.models import pipeline
from legoloam_tpu.ops.se3 import Pose
from legoloam_tpu.utils import synthetic
from legoloam_tpu.utils.debugdump import DebugDumper, capture_frontend


def _scan():
    scene = synthetic.default_scene()
    return synthetic.raycast_scan(
        scene, Pose(jnp.eye(3), jnp.array([2.0, 1.0, 0.8])), DEFAULT.sensor)


def test_capture_frontend_planes():
    pts, valid, ring = _scan()
    rec = capture_frontend(pts, valid, ring, DEFAULT)
    n, h = DEFAULT.sensor.n_scan, DEFAULT.sensor.horizon_scan
    assert rec["range"].shape == (n, h)
    assert rec["ground"].shape == (n, h)
    assert int(jnp.sum(rec["ground"])) > 100          # courtyard has ground
    assert int(jnp.sum(rec["segmented"])) > 500
    assert int(jnp.sum(rec["sharp_valid"])) > 0
    assert not np.asarray(rec["feat_overflow"]).any()


def test_dumper_gating_and_roundtrip(tmp_path):
    pts, valid, ring = _scan()
    state = pipeline.init_slam_state(DEFAULT)
    state, out = pipeline.slam_scan_step(
        state, pts, valid, ring, DEFAULT, 0.0, run_mapping=True)

    # Disabled dumper: pure no-op (the unsubscribed-topic case).
    off = DebugDumper(None, every=1)
    assert not off.maybe_dump(0, (pts, valid, ring), DEFAULT)

    d = str(tmp_path / "dbg")
    dumper = DebugDumper(d, every=10)
    assert dumper.maybe_dump(0, (pts, valid, ring), DEFAULT, state=state,
                             diag=out.diag)
    assert not dumper.due(5)                       # cadence gate
    assert dumper.due(10)
    path = os.path.join(d, "scan_000000.npz")
    rec = np.load(path)
    assert rec["kf_count"] == 1
    assert rec["kf_overflow"] == 0
    assert "submap_corner_occ" in rec
    assert rec["diag_n_surf_corr"] >= 0

    # Offline viewer renders PPM planes + a summary row.
    out_dir = str(tmp_path / "ppm")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "view_debug.py"),
         path, "--out", out_dir],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ppms = [f for f in os.listdir(out_dir) if f.endswith(".ppm")]
    assert len(ppms) == 5, ppms
    with open(os.path.join(out_dir, ppms[0]), "rb") as f:
        assert f.read(2) == b"P6"
