"""Scan IO: ctypes bindings to the native C++ loader (native/legoio.cpp) plus
pure-Python writers/fallbacks.

The native runtime replaces the reference's rosbag + TCPROS data path
(reference: README.md:90-102): multi-threaded file reading with in-order
prefetch, NaN filtering, fixed-size padding, and ring inference — everything
the jitted pipeline needs, done off the critical path.

The shared library builds lazily with g++ on first use (no pip deps); if no
toolchain is available, a NumPy fallback covers the same formats.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import struct
import subprocess
import tempfile
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "legoio.cpp"
_LIB_CACHE = pathlib.Path(tempfile.gettempdir()) / "legoloam_native"

_lib = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    _LIB_CACHE.mkdir(parents=True, exist_ok=True)
    so = _LIB_CACHE / "legoio.so"
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-o", str(so), str(_SRC)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError):
        _lib_failed = True
        return None
    lib.legoio_loader_create.restype = ctypes.c_void_p
    lib.legoio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int]
    lib.legoio_loader_next.restype = ctypes.c_int
    lib.legoio_loader_next.argtypes = [ctypes.c_void_p] * 1 + [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.legoio_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.legoio_read_scan.restype = ctypes.c_int
    lib.legoio_read_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _build_lib() is not None


# ---------------------------------------------------------------------------
# Writers (for dataset generation / interchange)
# ---------------------------------------------------------------------------

def write_lpk(path, xyz: np.ndarray, ring: np.ndarray, valid: np.ndarray):
    """LPK1: magic + uint32 count + packed {f32 x,y,z; u16 ring} records of
    the VALID points only."""
    xyz = np.asarray(xyz, np.float32)[np.asarray(valid, bool)]
    ring = np.asarray(ring, np.uint16)[np.asarray(valid, bool)]
    with open(path, "wb") as f:
        f.write(b"LPK1")
        f.write(struct.pack("<I", xyz.shape[0]))
        rec = np.zeros(xyz.shape[0], dtype=[("x", "<f4"), ("y", "<f4"),
                                            ("z", "<f4"), ("r", "<u2")])
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        rec["r"] = ring
        f.write(rec.tobytes())


def write_kitti_bin(path, xyz: np.ndarray, valid: np.ndarray):
    xyz = np.asarray(xyz, np.float32)[np.asarray(valid, bool)]
    rec = np.concatenate([xyz, np.zeros((xyz.shape[0], 1), np.float32)], 1)
    rec.tofile(path)


# ---------------------------------------------------------------------------
# IMU sidecar (the reference's /imu_raw topic, featureAssociation.cpp:431-459,
# as a file: one stream per sequence, windowed per scan at load time)
# ---------------------------------------------------------------------------

_IMU_DTYPE = np.dtype([("t", "<f8"), ("rpy", "<f4", (3,)),
                       ("acc", "<f4", (3,)), ("gyro", "<f4", (3,))])


def write_imu(path, time, rpy, acc, gyro):
    """IMU1 sidecar: magic + uint32 count + packed {f64 t; f32 rpy[3] (world
    attitude); f32 acc[3] (sensor-frame specific force); f32 gyro[3]} records,
    time-sorted.  One file covers the whole sequence (a 200 Hz hour is 26 MB).

    Times must be SEQUENCE-RELATIVE seconds (same clock as the scan times the
    driver generates, f32-safe): rebase epoch stamps (``t -= t[0]``) before
    writing — the jitted pipeline runs float32, where epoch-sized values have
    ~256 s resolution."""
    time = np.asarray(time, np.float64)
    order = np.argsort(time, kind="stable")    # keep the docstring's promise:
    rec = np.zeros(time.shape[0], dtype=_IMU_DTYPE)
    rec["t"] = time[order]
    rec["rpy"] = np.asarray(rpy, np.float32)[order]
    rec["acc"] = np.asarray(acc, np.float32)[order]
    rec["gyro"] = np.asarray(gyro, np.float32)[order]
    with open(path, "wb") as f:
        f.write(b"IMU1")
        f.write(struct.pack("<I", rec.shape[0]))
        f.write(rec.tobytes())


def read_imu(path):
    """Read an IMU1 sidecar -> (time (L,) f64, rpy (L,3), acc (L,3),
    gyro (L,3)) NumPy arrays."""
    with open(path, "rb") as f:
        if f.read(4) != b"IMU1":
            raise IOError(f"not an IMU1 sidecar: {path}")
        (n,) = struct.unpack("<I", f.read(4))
        rec = np.frombuffer(f.read(), dtype=_IMU_DTYPE, count=n)
    return (rec["t"].astype(np.float64), rec["rpy"].astype(np.float32),
            rec["acc"].astype(np.float32), rec["gyro"].astype(np.float32))


class ImuSequence:
    """Per-scan fixed-size windowing over a sequence IMU stream.

    ``window_for(t0)`` returns the samples covering
    ``[t0 - margin, t0 + scan_period + margin]`` as fixed-shape (L,) arrays
    (zero-padded, masked by ``valid``) — the jit-friendly form
    ``ops.deskew.ImuWindow`` expects.  L is static so ``integrate_imu``
    compiles once.  The reference's equivalent is its 200-slot ring buffer
    (imuQueLength, utility.h:109) filled by the /imu_raw callback."""

    def __init__(self, time, rpy, acc, gyro, window: int = 64,
                 margin: float = 0.05):
        order = np.argsort(np.asarray(time))
        self.time = np.asarray(time, np.float64)[order]
        self.rpy = np.asarray(rpy, np.float32)[order]
        self.acc = np.asarray(acc, np.float32)[order]
        self.gyro = np.asarray(gyro, np.float32)[order]
        self.window = int(window)
        self.margin = float(margin)

    @classmethod
    def from_file(cls, path, window: int = 64, margin: float = 0.05):
        return cls(*read_imu(path), window=window, margin=margin)

    def window_for(self, t0: float, scan_period: float = 0.1):
        """Fixed-shape window covering one scan; returns an
        ``ops.deskew.ImuWindow`` (NumPy leaves — jit converts on call)."""
        from ..ops.deskew import ImuWindow

        lo = np.searchsorted(self.time, t0 - self.margin, side="left")
        hi = np.searchsorted(self.time, t0 + scan_period + self.margin,
                             side="right")
        # Keep the window's END when oversubscribed: the interp clamps to the
        # nearest sample, and scan-end samples matter for ang_delta.
        if hi - lo > self.window:
            lo = hi - self.window
        L = self.window
        n = hi - lo
        time = np.zeros(L, np.float32)
        rpy = np.zeros((L, 3), np.float32)
        acc = np.zeros((L, 3), np.float32)
        gyro = np.zeros((L, 3), np.float32)
        valid = np.zeros(L, bool)
        time[:n] = self.time[lo:hi]
        rpy[:n] = self.rpy[lo:hi]
        acc[:n] = self.acc[lo:hi]
        gyro[:n] = self.gyro[lo:hi]
        valid[:n] = True
        return ImuWindow(time=time, rpy=rpy, acc=acc, gyro=gyro, valid=valid)


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

def read_scan(
    path, point_cap: int, n_scan: int = 16, ang_bottom_deg: float = 15.1,
    ang_res_y_deg: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One scan as (xyz (cap,3) f32, valid (cap,) bool, ring (cap,) i32)."""
    lib = _build_lib()
    if lib is not None:
        xyz = np.zeros((point_cap, 3), np.float32)
        valid = np.zeros(point_cap, np.uint8)
        ring = np.zeros(point_cap, np.int32)
        rc = lib.legoio_read_scan(
            str(path).encode(), point_cap, n_scan,
            ctypes.c_float(ang_bottom_deg), ctypes.c_float(ang_res_y_deg),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 1:
            raise IOError(f"failed to read scan {path}")
        return xyz, valid.astype(bool), ring
    return _read_scan_py(path, point_cap, n_scan, ang_bottom_deg,
                         ang_res_y_deg)


def _read_scan_py(path, cap, n_scan, ang_bottom_deg, ang_res_y_deg):
    path = str(path)
    if path.endswith(".bin"):
        rec = np.fromfile(path, np.float32).reshape(-1, 4)
        xyz_all = rec[:, :3]
        ring_all = None
    elif path.endswith(".lpk"):
        with open(path, "rb") as f:
            assert f.read(4) == b"LPK1"
            (n,) = struct.unpack("<I", f.read(4))
            rec = np.frombuffer(f.read(), dtype=[("x", "<f4"), ("y", "<f4"),
                                                 ("z", "<f4"), ("r", "<u2")],
                                count=n)
        xyz_all = np.stack([rec["x"], rec["y"], rec["z"]], 1)
        ring_all = rec["r"].astype(np.int32)
    else:
        raise IOError(f"unsupported format for python fallback: {path}")
    m = min(cap, xyz_all.shape[0])
    xyz = np.zeros((cap, 3), np.float32)
    valid = np.zeros(cap, bool)
    ring = np.zeros(cap, np.int32)
    xyz[:m] = xyz_all[:m]
    finite = np.isfinite(xyz_all[:m]).all(1) & (np.abs(xyz_all[:m]).sum(1) > 0)
    if ring_all is None:
        vert = np.degrees(np.arctan2(
            xyz_all[:m, 2], np.hypot(xyz_all[:m, 0], xyz_all[:m, 1])))
        r = np.floor((vert + ang_bottom_deg) / ang_res_y_deg).astype(np.int32)
        ok = (r >= 0) & (r < n_scan)
        ring[:m] = np.where(ok, r, 0)
        valid[:m] = finite & ok
    else:
        ring[:m] = ring_all[:m]
        valid[:m] = finite
    return xyz, valid, ring


class ScanLoader:
    """Prefetching sequence loader over the native runtime.

    Iterates (xyz, valid, ring) NumPy triples in file order; IO and parsing
    run on C++ worker threads ahead of the consumer.
    """

    def __init__(self, paths: Sequence, point_cap: int, n_scan: int = 16,
                 ang_bottom_deg: float = 15.1, ang_res_y_deg: float = 2.0,
                 n_threads: int = 4, prefetch: int = 8):
        self.paths = [str(p) for p in paths]
        self.point_cap = point_cap
        self._params = (n_scan, ang_bottom_deg, ang_res_y_deg)
        lib = _build_lib()
        self._lib = lib
        self._handle = None
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = lib.legoio_loader_create(
                arr, len(self.paths), point_cap, n_scan,
                ctypes.c_float(ang_bottom_deg), ctypes.c_float(ang_res_y_deg),
                n_threads, prefetch)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        if self._handle is None:
            for p in self.paths:
                yield read_scan(p, self.point_cap, *self._params)
            return
        lib = self._lib
        while True:
            xyz = np.zeros((self.point_cap, 3), np.float32)
            valid = np.zeros(self.point_cap, np.uint8)
            ring = np.zeros(self.point_cap, np.int32)
            rc = lib.legoio_loader_next(
                self._handle,
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc == 0:
                return
            if rc < 0:
                continue  # unreadable file: skip, like a dropped ROS message
            yield xyz, valid.astype(bool), ring

    def close(self):
        if self._handle is not None:
            self._lib.legoio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
