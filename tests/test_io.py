"""Native loader tests: format roundtrips + prefetching sequence order."""

import numpy as np
import pytest

from legoloam_tpu.utils import io as lio


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 500
    xyz = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    # Constrain z so ring inference lands in [0, 16).
    r = np.linalg.norm(xyz[:, :2], axis=1)
    xyz[:, 2] = r * np.tan(np.radians(rng.uniform(-15, 15, n))).astype(
        np.float32)
    valid = np.ones(n, bool)
    ring = np.clip(
        ((np.degrees(np.arctan2(xyz[:, 2], r)) + 15.1) // 2.0), 0, 15
    ).astype(np.int32)
    return xyz, valid, ring, tmp_path_factory.mktemp("scans")


def test_native_builds():
    assert lio.native_available(), "g++ build of native/legoio.cpp failed"


def test_lpk_roundtrip(sample):
    xyz, valid, ring, d = sample
    p = d / "scan0.lpk"
    lio.write_lpk(p, xyz, ring, valid)
    x2, v2, r2 = lio.read_scan(p, point_cap=600)
    assert int(v2.sum()) == xyz.shape[0]
    np.testing.assert_allclose(x2[: xyz.shape[0]], xyz, atol=1e-6)
    np.testing.assert_array_equal(r2[: xyz.shape[0]], ring)


def test_kitti_bin_ring_inference(sample):
    xyz, valid, ring, d = sample
    p = d / "scan0.bin"
    lio.write_kitti_bin(p, xyz, valid)
    x2, v2, r2 = lio.read_scan(p, point_cap=600)
    assert v2.sum() > 0.95 * xyz.shape[0]  # some beams fall outside the fan
    got = r2[: xyz.shape[0]][v2[: xyz.shape[0]]]
    want = ring[v2[: xyz.shape[0]]]
    assert (got == want).mean() > 0.95  # boundary beams may round differently


def test_loader_sequence_order_and_prefetch(sample):
    xyz, valid, ring, d = sample
    paths = []
    for k in range(12):
        p = d / f"seq{k:03d}.lpk"
        shifted = xyz + np.float32(k)  # distinguishable content
        lio.write_lpk(p, shifted, ring, valid)
        paths.append(p)
    loader = lio.ScanLoader(paths, point_cap=600, n_threads=3, prefetch=4)
    seen = 0
    for k, (x, v, r) in enumerate(loader):
        # In-order delivery: scan k's points are xyz + k.
        np.testing.assert_allclose(x[:5], xyz[:5] + np.float32(k), atol=1e-5)
        seen += 1
    assert seen == 12
    loader.close()


def test_loader_skips_unreadable(sample):
    xyz, valid, ring, d = sample
    good = d / "ok.lpk"
    lio.write_lpk(good, xyz, ring, valid)
    bad = d / "bad.lpk"
    bad.write_bytes(b"NOTAMAGIC")
    loader = lio.ScanLoader([bad, good], point_cap=600)
    outs = list(loader)
    assert len(outs) == 1


def test_imu_sidecar_roundtrip(tmp_path_factory):
    """write_imu/read_imu invert; ImuSequence windows are fixed-shape, masked,
    and hold the right samples for a scan interval."""
    d = tmp_path_factory.mktemp("imu")
    rng = np.random.default_rng(1)
    L = 400                          # 2 s at 200 Hz
    t = np.arange(L) / 200.0
    rpy = rng.normal(0, 0.1, (L, 3)).astype(np.float32)
    acc = rng.normal(0, 1.0, (L, 3)).astype(np.float32)
    gyro = rng.normal(0, 0.2, (L, 3)).astype(np.float32)
    path = d / "seq.imu"
    lio.write_imu(path, t, rpy, acc, gyro)
    t2, rpy2, acc2, gyro2 = lio.read_imu(path)
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_array_equal(rpy2, rpy)
    np.testing.assert_array_equal(acc2, acc)
    np.testing.assert_array_equal(gyro2, gyro)

    seq = lio.ImuSequence.from_file(path, window=64, margin=0.05)
    w = seq.window_for(1.0, scan_period=0.1)
    assert w.time.shape == (64,) and w.rpy.shape == (64, 3)
    n_valid = int(w.valid.sum())
    # [0.95, 1.15] at 200 Hz = 41 samples (inclusive ends).
    assert 39 <= n_valid <= 42, n_valid
    assert w.time[0] >= 0.95 - 1e-6 and w.time[n_valid - 1] <= 1.15 + 1e-6
    # Padded tail is masked out.
    assert not w.valid[n_valid:].any()
    # Window END is kept when oversubscribed.
    seq_small = lio.ImuSequence.from_file(path, window=16, margin=0.05)
    w2 = seq_small.window_for(1.0, scan_period=0.1)
    assert int(w2.valid.sum()) == 16
    assert abs(w2.time[15] - 1.15) < 0.01
