"""rosbag -> .lpk/.imu conversion round trip (tools/rosbag2lpk.py).

No ROS or bag fixtures exist in this environment, so the test SYNTHESIZES a
well-formed ROS1 V2.0 bag (chunked, connection + message-data records,
serialized sensor_msgs/PointCloud2 and sensor_msgs/Imu payloads per the wire
format) and checks the converter recovers the clouds and IMU stream exactly,
and that the produced .lpk files load through ``utils.io.read_scan``.
"""

import os
import struct

import numpy as np

from legoloam_tpu.utils import io as lio


def _hdr(fields):
    out = b""
    for k, v in fields.items():
        kv = k.encode() + b"=" + v
        out += struct.pack("<I", len(kv)) + kv
    return out


def _record(fields, data):
    h = _hdr(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _string(s):
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _pointcloud2(stamp, xyz, intensity, ring):
    n = xyz.shape[0]
    point_step = 3 * 4 + 4 + 2
    rows = np.zeros((n, point_step), np.uint8)
    rows[:, 0:12] = xyz.astype("<f4").view(np.uint8).reshape(n, 12)
    rows[:, 12:16] = intensity.astype("<f4").view(np.uint8).reshape(n, 4)
    rows[:, 16:18] = ring.astype("<u2").view(np.uint8).reshape(n, 2)
    data = rows.tobytes()
    sec, nsec = int(stamp), int((stamp % 1) * 1e9)
    buf = struct.pack("<I", 0)                      # header.seq
    buf += struct.pack("<II", sec, nsec)
    buf += _string("velodyne")
    buf += struct.pack("<II", 1, n)                 # height, width
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7),
              ("intensity", 12, 7), ("ring", 16, 4)]
    buf += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        buf += _string(name) + struct.pack("<IBI", off, dt, 1)
    buf += bytes([0])                               # little endian
    buf += struct.pack("<II", point_step, n * point_step)
    buf += struct.pack("<I", len(data)) + data
    buf += bytes([1])                               # is_dense
    return buf


def _imu_msg(stamp, quat, gyro, acc):
    sec, nsec = int(stamp), int((stamp % 1) * 1e9)
    buf = struct.pack("<I", 0) + struct.pack("<II", sec, nsec) + _string("imu")
    buf += struct.pack("<4d", *quat) + struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *gyro) + struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *acc) + struct.pack("<9d", *([0.0] * 9))
    return buf


def _write_bag(path, clouds, imus):
    """clouds: [(stamp, xyz, intensity, ring)], imus: [(stamp, q, w, a)]."""
    chunk = b""
    chunk += _record({"op": b"\x07", "conn": struct.pack("<I", 0),
                      "topic": b"/velodyne_points"},
                     _hdr({"type": b"sensor_msgs/PointCloud2",
                           "topic": b"/velodyne_points"}))
    chunk += _record({"op": b"\x07", "conn": struct.pack("<I", 1),
                      "topic": b"/imu/data"},
                     _hdr({"type": b"sensor_msgs/Imu", "topic": b"/imu/data"}))
    events = [(s, 0, a) for (s, *a) in
              [(s, xyz, i, r) for s, xyz, i, r in clouds]] + \
             [(s, 1, a) for (s, *a) in [(s, q, w, ac) for s, q, w, ac in imus]]
    for stamp, conn, payload in sorted(events, key=lambda e: e[0]):
        msg = _pointcloud2(stamp, *payload) if conn == 0 \
            else _imu_msg(stamp, *payload)
        chunk += _record(
            {"op": b"\x02", "conn": struct.pack("<I", conn),
             "time": struct.pack("<II", int(stamp), int((stamp % 1) * 1e9))},
            msg)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 2),
                         "chunk_count": struct.pack("<I", 1)}, b" " * 4096))
        f.write(_record({"op": b"\x05", "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))


def test_rosbag_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    clouds = []
    for k in range(3):
        n = 200 + 10 * k
        xyz = rng.randn(n, 3).astype(np.float32) * 5 + np.float32(8.0)
        intensity = rng.rand(n).astype(np.float32)
        ring = rng.randint(0, 16, n).astype(np.uint16)
        clouds.append((100.0 + 0.1 * k, xyz, intensity, ring))
    imus = [(100.0 + 0.005 * j,
             (0.0, 0.0, np.sin(0.01 * j), np.cos(0.01 * j)),
             (0.0, 0.0, 0.1), (0.0, 0.0, 9.81)) for j in range(40)]
    bag = str(tmp_path / "seq.bag")
    _write_bag(bag, clouds, imus)

    out = str(tmp_path / "out")
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "rosbag2lpk.py"), bag,
         "--out", out], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    lpks = sorted(p for p in os.listdir(out) if p.endswith(".lpk"))
    assert len(lpks) == 3, (lpks, r.stdout)
    # Scan 1 round-trips exactly (xyz + ring channel preserved).
    xyz, valid, ring = lio.read_scan(os.path.join(out, lpks[1]),
                                     point_cap=4096, n_scan=16)
    n1 = clouds[1][1].shape[0]
    assert int(valid.sum()) == n1
    np.testing.assert_allclose(np.asarray(xyz)[:n1], clouds[1][1], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ring)[:n1], clouds[1][3])

    # IMU sidecar: count, relative clock, gyro content.
    t, rpy, acc, gyro = lio.read_imu(os.path.join(out, "seq.imu"))
    assert t.shape[0] == 40
    assert abs(t[0] - 0.0) < 1e-6          # rebased to the first scan stamp
    np.testing.assert_allclose(gyro[:, 2], 0.1, atol=1e-6)
    np.testing.assert_allclose(acc[:, 2], 9.81, atol=1e-5)
