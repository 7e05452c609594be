#!/usr/bin/env python
"""Real-device Pallas-kernel parity checks.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py), where Pallas
kernels execute in INTERPRET mode — numerically faithful to the kernel's
math, but not to the TPU's compiled lowering.  This script runs each Pallas
kernel COMPILED on the attached device against its XLA twin on realistic
inputs and reports mismatches.  Run it after touching any kernel.

(It exists because of a real incident: the kNN kernel's dot_general defaulted
to bf16 MXU inputs, which poisons the ||q||²-2q·r+||r||² decomposition for
coordinates ~60 m from the origin.  Interpret-mode tests passed; the compiled
kernel silently diverged the whole mapping pipeline.)

Usage: python tools/check_tpu_kernels.py
Exit code 0 = all kernels match.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILS = []


def check(name, ok, detail=""):
    print(f"  {'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILS.append(name)


def check_knn():
    """knn_pallas (compiled) vs voxel.knn (XLA) — world-frame coordinates far
    from the origin, Morton-sorted like real submaps."""
    from legoloam_tpu.ops.knn_pallas import knn_pallas
    from legoloam_tpu.ops.voxel import knn, voxel_downsample

    rng = np.random.RandomState(0)
    for offset in (0.0, 60.0, 90.0):
        center = jnp.asarray([offset, offset * 0.5, 0.0], jnp.float32)
        raw = rng.randn(20000, 3).astype(np.float32) * np.array(
            [12.0, 12.0, 1.0], np.float32) + np.asarray(center)
        ref, rv = voxel_downsample(jnp.asarray(raw), jnp.ones(20000, bool),
                                   0.4, 8192, origin=center)
        q = jnp.asarray(
            rng.randn(2048, 3).astype(np.float32) * np.array(
                [10.0, 10.0, 1.0], np.float32) + np.asarray(center))
        qv = jnp.ones(2048, bool)
        gate = 1.0
        d_p, i_p = knn_pallas(q, qv, ref, rv, k=5, gate=gate)
        d_x, i_x = knn(q, qv, ref, rv, k=5)
        d_p, i_p, d_x, i_x = map(np.asarray, (d_p, i_p, d_x, i_x))
        # Compare only within the gate (the culling contract).
        in_gate = d_x[:, 4] < gate ** 2
        # Index sets should agree; where they differ the swapped candidates
        # must be NEAR-EQUIDISTANT (each backend's internal selection pass
        # carries matmul-form cancellation noise that grows with the world
        # offset — the exact-distance refinement makes the RETURNED
        # distances and gate decisions exact, but rank-5/6 swaps inside the
        # noise band remain legitimate).
        same = np.array([set(a) == set(b) for a, b in
                         zip(i_p[in_gate], i_x[in_gate])])
        # Returned (refined) distances agree tightly regardless of offset.
        derr = np.abs(np.sort(d_p[in_gate], 1) - np.sort(d_x[in_gate], 1))
        dtol = np.maximum(1e-4 * np.sort(d_x[in_gate], 1), 1e-4)
        # Near-tie bound for index swaps: the 5th-NN distances of the two
        # backends must agree, i.e. any swapped candidate is equidistant at
        # the selection-noise scale.
        tie_ok = derr[:, 4] <= np.maximum(0.02 * d_x[in_gate][:, 4], 0.02) \
            if derr.size else np.array([True])
        check(f"knn offset={offset:.0f}m",
              bool((derr <= dtol).all() and tie_ok.all()),
              f"({in_gate.sum()} gated queries, "
              f"{(~same).sum()} near-tie index swaps, "
              f"max dist err {derr.max() if derr.size else 0:.2e})")


def check_ccl():
    """CCL label propagation: pallas vs xla backends on a real scan."""
    import dataclasses

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.ops import projection, segmentation
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    scene = synthetic.loop_scene()
    pose = Pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, cfg.sensor)
    img = projection.project_scan(pts, valid, cfg.sensor, ring=ring)
    segs = {}
    for backend in ("pallas", "xla"):
        scfg = dataclasses.replace(cfg.seg, ccl_backend=backend)
        segs[backend] = segmentation.segment(img, cfg.sensor, scfg)
    a, b = segs["pallas"], segs["xla"]
    check("ccl segmented", bool(jnp.all(a.segmented == b.segmented)))
    check("ccl outlier", bool(jnp.all(a.outlier == b.outlier)))
    check("ccl ground", bool(jnp.all(a.ground == b.ground)))
    check("ccl n_clusters",
          int(a.n_clusters) == int(b.n_clusters),
          f"({int(a.n_clusters)} vs {int(b.n_clusters)})")


def check_picks():
    """Feature pick labels: pallas vs xla backends on a real scan."""
    import dataclasses

    from legoloam_tpu.config import DEFAULT
    from legoloam_tpu.models import pipeline
    from legoloam_tpu.ops.se3 import Pose
    from legoloam_tpu.utils import synthetic

    cfg = DEFAULT
    scene = synthetic.loop_scene()
    pose = Pose(jnp.eye(3), jnp.asarray([5.0, 2.0, 0.8]))
    pts, valid, ring = synthetic.raycast_scan(scene, pose, cfg.sensor)
    feats = {}
    for backend in ("pallas", "xla"):
        c = cfg.replace(feat=dataclasses.replace(cfg.feat,
                                                 picks_backend=backend))
        feats[backend] = pipeline.process_scan(pts, valid, ring, c)
    a, b = feats["pallas"], feats["xla"]
    for field in ("sharp", "less_sharp", "flat"):
        fa, fb = getattr(a, field), getattr(b, field)
        na, nb = int(jnp.sum(fa.valid)), int(jnp.sum(fb.valid))
        # Compare as point SETS (compaction order may differ).
        pa = np.asarray(fa.xyz)[np.asarray(fa.valid)]
        pb = np.asarray(fb.xyz)[np.asarray(fb.valid)]
        sa = set(map(tuple, np.round(pa, 4).tolist()))
        sb = set(map(tuple, np.round(pb, 4).tolist()))
        check(f"picks {field}", na == nb and sa == sb,
              f"(pallas {na} vs xla {nb}, set diff "
              f"{len(sa ^ sb)})")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    if dev.platform == "cpu":
        print("WARNING: running on CPU — Pallas kernels will use interpret "
              "mode; this does NOT validate the compiled TPU lowering.")
    check_knn()
    check_ccl()
    check_picks()
    if FAILS:
        print(f"\n{len(FAILS)} kernel check(s) FAILED: {FAILS}")
        sys.exit(1)
    print("\nall kernel checks passed")


if __name__ == "__main__":
    main()
