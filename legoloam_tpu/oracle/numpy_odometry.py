"""NumPy oracle of the reference's two-step LM scan-to-scan odometry.

A faithful behavioral port of ``src/featureAssociation.cpp``'s solver stack —
``TransformToStart`` (854-877), ``findCorrespondingSurfFeatures`` (1155-1268),
``findCorrespondingCornerFeatures`` (1044-1153), ``calculateTransformationSurf``
(1270-1377), ``calculateTransformationCorner`` (1379-1478) and the
``updateTransformation`` driver (1666-1695) — kept EXACTLY in the reference's
shape: camera-frame Euler 6-vector ``transformCur``, per-point index-window
correspondence scans over ring-ordered compacted clouds, the 0.05-damped QR
normal-equation steps, iteration-0 degeneracy projection (eigen threshold 10),
and the 0.1 deg / 0.1 cm convergence break.

Like ``numpy_frontend.py`` this file exists purely as the executable spec the
production JAX solver (models/odometry.py) is parity-tested against
(tests/test_odometry_oracle.py): the JAX solver re-parametrizes the motion as
an se(3) twist and replaces the index-window searches with full-cloud
ring-class argmin passes, so agreement is asserted at the SOLVED-MOTION level
(SE(3) distance), not per-correspondence.

Ported quirks (kept because the oracle is the spec):
  * the corner finder's forward scan is bounded by the CURRENT scan's sharp
    count, not the last cloud's size (``j < cornerPointsSharpNum`` while
    indexing ``laserCloudCornerLast``, featureAssociation.cpp:1062) — for
    most queries only the backward (lower-ring) scan can supply the second
    line anchor;
  * the surf finder's same-ring class uses ``<=`` forward but ``>=`` backward
    (1185/1207) so the closest-point ring itself is searched on both sides;
  * correspondences are re-searched only every 5th iteration; the robust
    weight activates from iteration 5 (1139/1251).

Frames: inputs are LIDAR-frame (x forward, y left, z up); the oracle swaps to
the LOAM camera convention internally (x<-y, y<-z, z<-x,
featureAssociation.cpp:500-502) and returns the solved scan motion as an
SE(3) (R, t) back in the lidar frame, directly comparable to
``exp(xi)`` of the JAX solver.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

# lidar -> camera permutation: cam = P @ lidar  (x<-y, y<-z, z<-x).
_P = np.array([[0.0, 1.0, 0.0],
               [0.0, 0.0, 1.0],
               [1.0, 0.0, 0.0]])


def _to_camera(xyz_lidar: np.ndarray) -> np.ndarray:
    return xyz_lidar[:, [1, 2, 0]]


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def transform_to_start(pts: np.ndarray, s: np.ndarray,
                       tc: np.ndarray) -> np.ndarray:
    """``TransformToStart`` (featureAssociation.cpp:854-877), batched.

    p_start = Ry(-s*ry) Rx(-s*rx) Rz(-s*rz) (p - s*t), camera frame.
    ``s`` is the per-point interpolation fraction (the reference's
    ``10 * frac(intensity)`` = rel_time in [0, 1])."""
    rx, ry, rz = s * tc[0], s * tc[1], s * tc[2]
    t = s[:, None] * tc[3:6][None, :]
    p = pts - t
    cz, sz = np.cos(rz), np.sin(rz)
    x1 = cz * p[:, 0] + sz * p[:, 1]
    y1 = -sz * p[:, 0] + cz * p[:, 1]
    z1 = p[:, 2]
    cx, sx = np.cos(rx), np.sin(rx)
    x2 = x1
    y2 = cx * y1 + sx * z1
    z2 = -sx * y1 + cx * z1
    cy, sy = np.cos(ry), np.sin(ry)
    return np.stack([cy * x2 - sy * z2, y2, sy * x2 + cy * z2], axis=-1)


class _Coeffs(NamedTuple):
    pts: np.ndarray     # (M, 3) selected ORIGINAL points (pointOri)
    coeff: np.ndarray   # (M, 3) s-weighted residual gradient (coeff.xyz)
    d2: np.ndarray      # (M,) s-weighted signed distance (coeff.intensity)


def _find_surf(queries, q_s, last, last_ring, tc, search, gate):
    """``findCorrespondingSurfFeatures`` (featureAssociation.cpp:1155-1268).

    ``search``: list that persists the (j, l, m) indices across iterations
    (the reference re-searches only when ``iterCount % 5 == 0``); pass the
    same list every iteration, with ``search[0] is None`` forcing a search.
    Returns the robust-selected coefficient rows for this iteration."""
    n = queries.shape[0]
    p_sel = transform_to_start(queries, q_s, tc)
    if search[0] is None:
        inds = np.full((n, 3), -1, np.int64)
        for i in range(n):
            d2_all = np.sum((last - p_sel[i]) ** 2, axis=1)
            j = int(np.argmin(d2_all))
            if d2_all[j] >= gate:
                inds[i] = (-1, -1, -1)
                continue
            ring_j = last_ring[j]
            min2 = min3 = gate
            ind2 = ind3 = -1
            for k in range(j + 1, last.shape[0]):      # forward scan
                if last_ring[k] > ring_j + 2.5:
                    break
                d = float(np.sum((last[k] - p_sel[i]) ** 2))
                if last_ring[k] <= ring_j:
                    if d < min2:
                        min2, ind2 = d, k
                else:
                    if d < min3:
                        min3, ind3 = d, k
            for k in range(j - 1, -1, -1):             # backward scan
                if last_ring[k] < ring_j - 2.5:
                    break
                d = float(np.sum((last[k] - p_sel[i]) ** 2))
                if last_ring[k] >= ring_j:
                    if d < min2:
                        min2, ind2 = d, k
                else:
                    if d < min3:
                        min3, ind3 = d, k
            inds[i] = (j, ind2, ind3)
        search[0] = inds
    inds = search[0]
    return p_sel, inds


def _surf_coeffs(queries, p_sel, inds, last, iter_count) -> _Coeffs:
    """Plane residual + robust weight (featureAssociation.cpp:1234-1265)."""
    pts, coeff, d2s = [], [], []
    for i in range(queries.shape[0]):
        j, l, m = inds[i]
        if l < 0 or m < 0:
            continue
        t1, t2, t3 = last[j], last[l], last[m]
        nrm = np.cross(t2 - t1, t3 - t1)
        ps = np.linalg.norm(nrm)
        if ps == 0:
            continue
        nrm = nrm / ps
        pd = -np.dot(nrm, t1)
        pd2 = float(np.dot(nrm, p_sel[i]) + pd)
        s = 1.0
        if iter_count >= 5:
            s = 1.0 - 1.8 * abs(pd2) / np.sqrt(np.sqrt(
                np.linalg.norm(p_sel[i])))
        if s > 0.1 and pd2 != 0:
            pts.append(queries[i])
            coeff.append(s * nrm)
            d2s.append(s * pd2)
    if not pts:
        return _Coeffs(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    return _Coeffs(np.asarray(pts), np.asarray(coeff), np.asarray(d2s))


def _find_corner(queries, q_s, last, last_ring, tc, search, gate,
                 sharp_num):
    """``findCorrespondingCornerFeatures`` (featureAssociation.cpp:1044-1153).

    ``sharp_num`` bounds the FORWARD scan (the reference's ``j <
    cornerPointsSharpNum`` quirk at line 1062 — the loop indexes the last
    cloud but is bounded by the current scan's sharp count)."""
    n = queries.shape[0]
    p_sel = transform_to_start(queries, q_s, tc)
    if search[0] is None:
        inds = np.full((n, 2), -1, np.int64)
        for i in range(n):
            d2_all = np.sum((last - p_sel[i]) ** 2, axis=1)
            j = int(np.argmin(d2_all))
            if d2_all[j] >= gate:
                inds[i] = (-1, -1)
                continue
            ring_j = last_ring[j]
            min2 = gate
            ind2 = -1
            for k in range(j + 1, min(last.shape[0], sharp_num)):
                if last_ring[k] > ring_j + 2.5:
                    break
                d = float(np.sum((last[k] - p_sel[i]) ** 2))
                if last_ring[k] > ring_j and d < min2:
                    min2, ind2 = d, k
            for k in range(j - 1, -1, -1):
                if last_ring[k] < ring_j - 2.5:
                    break
                d = float(np.sum((last[k] - p_sel[i]) ** 2))
                if last_ring[k] < ring_j and d < min2:
                    min2, ind2 = d, k
            inds[i] = (j, ind2)
        search[0] = inds
    return p_sel, search[0]


def _corner_coeffs(queries, p_sel, inds, last, iter_count) -> _Coeffs:
    """Line residual + robust weight (featureAssociation.cpp:1108-1148)."""
    pts, coeff, d2s = [], [], []
    for i in range(queries.shape[0]):
        j, m = inds[i]
        if m < 0:
            continue
        x0, y0, z0 = p_sel[i]
        x1, y1, z1 = last[j]
        x2, y2, z2 = last[m]
        m11 = (x0 - x1) * (y0 - y2) - (x0 - x2) * (y0 - y1)
        m22 = (x0 - x1) * (z0 - z2) - (x0 - x2) * (z0 - z1)
        m33 = (y0 - y1) * (z0 - z2) - (y0 - y2) * (z0 - z1)
        a012 = np.sqrt(m11 * m11 + m22 * m22 + m33 * m33)
        l12 = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
        if a012 == 0 or l12 == 0:
            continue
        la = ((y1 - y2) * m11 + (z1 - z2) * m22) / a012 / l12
        lb = -((x1 - x2) * m11 - (z1 - z2) * m33) / a012 / l12
        lc = -((x1 - x2) * m22 + (y1 - y2) * m33) / a012 / l12
        ld2 = a012 / l12
        s = 1.0
        if iter_count >= 5:
            s = 1.0 - 1.8 * abs(ld2)
        if s > 0.1 and ld2 != 0:
            pts.append(queries[i])
            coeff.append(s * np.array([la, lb, lc]))
            d2s.append(s * ld2)
    if not pts:
        return _Coeffs(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    return _Coeffs(np.asarray(pts), np.asarray(coeff), np.asarray(d2s))


def _solve_3dof(A, b, deg_state, iter_count, eig_thresh=10.0):
    """QR normal-equation solve + iteration-0 degeneracy projection
    (calculateTransformationSurf/Corner, featureAssociation.cpp:1324-1361).

    ``deg_state``: persistent [matP or None] across iterations."""
    AtA = A.T @ A
    AtB = A.T @ b
    x = np.linalg.lstsq(AtA, AtB, rcond=None)[0]
    if iter_count == 0:
        w, v = np.linalg.eigh(AtA)          # ascending
        order = np.argsort(w)[::-1]         # cv::eigen: descending
        w = w[order]
        v = v[:, order].T                   # rows = eigenvectors
        v2 = v.copy()
        degenerate = False
        for i in range(2, -1, -1):
            if w[i] < eig_thresh:
                v2[i, :] = 0.0
                degenerate = True
            else:
                break
        deg_state[0] = (np.linalg.inv(v) @ v2) if degenerate else None
    if deg_state[0] is not None:
        x = deg_state[0] @ x
    return x


def _seed_to_transform(R_l: np.ndarray, t_l: np.ndarray) -> np.ndarray:
    """Lidar-frame seed motion (p_start = R p_end + t) -> the reference's
    ``transformCur`` parametrization (updateInitialGuess seeds it from the
    IMU / previous motion, featureAssociation.cpp:1639-1664).

    transformCur satisfies p_start = Ry(-ry) Rx(-rx) Rz(-rz) (p_end - t)
    in camera coords, i.e. R_c = Ry(α) Rx(β) Rz(γ) with α=-ry, β=-rx,
    γ=-rz and t = -R_cᵀ t_c."""
    R_c = _P @ R_l @ _P.T
    t_c = _P @ t_l
    beta = np.arcsin(np.clip(-R_c[1, 2], -1.0, 1.0))
    gamma = np.arctan2(R_c[1, 0], R_c[1, 1])
    alpha = np.arctan2(R_c[0, 2], R_c[2, 2])
    tc = np.zeros(6)
    tc[0], tc[1], tc[2] = -beta, -alpha, -gamma
    tc[3:6] = -R_c.T @ t_c
    return tc


def two_step_lm(
    flat_xyz_l: np.ndarray, flat_s: np.ndarray,
    surf_last_xyz_l: np.ndarray, surf_last_ring: np.ndarray,
    sharp_xyz_l: np.ndarray, sharp_s: np.ndarray,
    corner_last_xyz_l: np.ndarray, corner_last_ring: np.ndarray,
    nearest_sq_dist: float = 25.0,
    max_iterations: int = 25,
    seed: Tuple[np.ndarray, np.ndarray] | None = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """The complete ``updateTransformation`` (featureAssociation.cpp:
    1666-1695): step A (surf -> [rx, rz, ty]) then step B (corner ->
    [ry, tx, tz]).

    Inputs are LIDAR-frame: current-scan picks (``flat``/``sharp`` with
    per-point fractions ``*_s`` = rel_time) and the previous scan's broad
    clouds (``*_last`` with float ring ids), all compact valid-only arrays.
    Last clouds are sorted internally by (ring, azimuth) — the reference's
    ring-by-ring compaction order that the index-window scans assume.

    ``seed``: optional lidar-frame (R, t) initial motion guess — the
    reference's updateInitialGuess / constant-velocity prior (the pipeline's
    steady-state operating regime).  Without it the solve starts cold from
    identity, where the two solvers' transient responses differ (the
    reference's Jacobian drops the per-point interpolation factor s,
    featureAssociation.cpp:1301-1322 — its effective step is ``damping``
    where the exact chain-rule Jacobian's is ``damping / mean(s)``).

    Returns ``(R, t, info)``: the solved scan motion as lidar-frame SE(3)
    with p_start = R @ p_end + t — directly comparable to
    ``se3.se3_exp(xi)`` of models/odometry.py."""
    # Camera swap + ring-major ordering of the reference clouds.
    def order(xyz_l, ring):
        az = np.arctan2(xyz_l[:, 1], xyz_l[:, 0])
        idx = np.lexsort((az, np.round(ring).astype(np.int64)))
        return _to_camera(xyz_l[idx]), ring[idx]

    surf_last, surf_ring = order(surf_last_xyz_l, surf_last_ring)
    corner_last, corner_ring = order(corner_last_xyz_l, corner_last_ring)
    flat_c = _to_camera(flat_xyz_l)
    sharp_c = _to_camera(sharp_xyz_l)

    tc = (np.zeros(6) if seed is None
          else _seed_to_transform(np.asarray(seed[0], np.float64),
                                  np.asarray(seed[1], np.float64)))
    info = {"surf_iters": 0, "corner_iters": 0,
            "n_surf": 0, "n_corner": 0}
    def to_se3(tc):
        # transformCur -> SE(3) scan motion, camera frame:
        #   p_start = Ry(-ry) Rx(-rx) Rz(-rz) (p_end - t)  (TransformToStart)
        R_c = _rot_y(-tc[1]) @ _rot_x(-tc[0]) @ _rot_z(-tc[2])
        t_c = -R_c @ tc[3:6]
        # ... and back to the lidar frame: R_l = Pᵀ R_c P, t_l = Pᵀ t_c.
        return _P.T @ R_c @ _P, _P.T @ t_c

    if corner_last.shape[0] < 10 or surf_last.shape[0] < 100:
        R_l, t_l = to_se3(tc)
        return R_l, t_l, info

    # --- Step A: surf -> transformCur[0] (rx), [2] (rz), [4] (ty). ---
    search = [None]
    deg = [None]
    for it in range(max_iterations):
        if it % 5 == 0:
            search[0] = None
        p_sel, inds = _find_surf(flat_c, flat_s, surf_last, surf_ring, tc,
                                 search, nearest_sq_dist)
        sel = _surf_coeffs(flat_c, p_sel, inds, surf_last, it)
        info["surf_iters"] = it + 1
        if sel.pts.shape[0] < 10:
            continue
        info["n_surf"] = sel.pts.shape[0]
        srx, crx = np.sin(tc[0]), np.cos(tc[0])
        sry, cry = np.sin(tc[1]), np.cos(tc[1])
        srz, crz = np.sin(tc[2]), np.cos(tc[2])
        tx, ty, tz = tc[3], tc[4], tc[5]
        a1 = crx * sry * srz; a2 = crx * crz * sry; a3 = srx * sry
        a4 = tx * a1 - ty * a2 - tz * a3
        a5 = srx * srz; a6 = crz * srx
        a7 = ty * a6 - tz * crx - tx * a5
        a8 = crx * cry * srz; a9 = crx * cry * crz; a10 = cry * srx
        a11 = tz * a10 + ty * a9 - tx * a8
        b1 = -crz * sry - cry * srx * srz; b2 = cry * crz * srx - sry * srz
        b5 = cry * crz - srx * sry * srz; b6 = cry * srz + crz * srx * sry
        c1 = -b6; c2 = b5; c3 = tx * b6 - ty * b5
        c4 = -crx * crz; c5 = crx * srz; c6 = ty * c5 + tx * -c4
        c7 = b2; c8 = -b1; c9 = tx * -b2 - ty * -b1
        px, py, pz = sel.pts[:, 0], sel.pts[:, 1], sel.pts[:, 2]
        cx_, cy_, cz_ = sel.coeff[:, 0], sel.coeff[:, 1], sel.coeff[:, 2]
        arx = ((-a1 * px + a2 * py + a3 * pz + a4) * cx_
               + (a5 * px - a6 * py + crx * pz + a7) * cy_
               + (a8 * px - a9 * py - a10 * pz + a11) * cz_)
        arz = ((c1 * px + c2 * py + c3) * cx_
               + (c4 * px - c5 * py + c6) * cy_
               + (c7 * px + c8 * py + c9) * cz_)
        aty = -b6 * cx_ + c4 * cy_ + b2 * cz_
        A = np.stack([arx, arz, aty], axis=1)
        b = -0.05 * sel.d2
        x = _solve_3dof(A, b, deg, it)
        tc[0] += x[0]
        tc[2] += x[1]
        tc[4] += x[2]
        tc[np.isnan(tc)] = 0.0
        dR = np.sqrt(np.degrees(x[0]) ** 2 + np.degrees(x[1]) ** 2)
        dT = abs(x[2]) * 100.0
        if dR < 0.1 and dT < 0.1:
            break

    # --- Step B: corner -> transformCur[1] (ry), [3] (tx), [5] (tz). ---
    search = [None]
    deg = [None]
    sharp_num = sharp_c.shape[0]
    for it in range(max_iterations):
        if it % 5 == 0:
            search[0] = None
        p_sel, inds = _find_corner(sharp_c, sharp_s, corner_last,
                                   corner_ring, tc, search, nearest_sq_dist,
                                   sharp_num)
        sel = _corner_coeffs(sharp_c, p_sel, inds, corner_last, it)
        info["corner_iters"] = it + 1
        if sel.pts.shape[0] < 10:
            continue
        info["n_corner"] = sel.pts.shape[0]
        srx, crx = np.sin(tc[0]), np.cos(tc[0])
        sry, cry = np.sin(tc[1]), np.cos(tc[1])
        srz, crz = np.sin(tc[2]), np.cos(tc[2])
        tx, ty, tz = tc[3], tc[4], tc[5]
        b1 = -crz * sry - cry * srx * srz; b2 = cry * crz * srx - sry * srz
        b3 = crx * cry; b4 = tx * -b1 + ty * -b2 + tz * b3
        b5 = cry * crz - srx * sry * srz; b6 = cry * srz + crz * srx * sry
        b7 = crx * sry; b8 = tz * b7 - ty * b6 - tx * b5
        c5 = crx * srz
        px, py, pz = sel.pts[:, 0], sel.pts[:, 1], sel.pts[:, 2]
        cx_, cy_, cz_ = sel.coeff[:, 0], sel.coeff[:, 1], sel.coeff[:, 2]
        ary = ((b1 * px + b2 * py - b3 * pz + b4) * cx_
               + (b5 * px + b6 * py - b7 * pz + b8) * cz_)
        atx = -b5 * cx_ + c5 * cy_ + b1 * cz_
        atz = b7 * cx_ - srx * cy_ - b3 * cz_
        A = np.stack([ary, atx, atz], axis=1)
        b = -0.05 * sel.d2
        x = _solve_3dof(A, b, deg, it)
        tc[1] += x[0]
        tc[3] += x[1]
        tc[5] += x[2]
        tc[np.isnan(tc)] = 0.0
        dR = abs(np.degrees(x[0]))
        dT = np.sqrt((x[1] * 100.0) ** 2 + (x[2] * 100.0) ** 2)
        if dR < 0.1 and dT < 0.1:
            break

    R_l, t_l = to_se3(tc)
    return R_l, t_l, info
