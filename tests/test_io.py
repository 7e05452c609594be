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
