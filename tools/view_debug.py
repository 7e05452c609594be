#!/usr/bin/env python
"""Offline viewer for DebugDumper npz records (utils/debugdump.py) — the
RViz stand-in.  Renders the dense (N_SCAN, H) planes to PPM images (no
dependencies beyond numpy) and prints the scalar diagnostics.

Usage:
  python tools/view_debug.py out/debug/scan_000150.npz [--out DIR]
  python tools/view_debug.py out/debug/*.npz --summary   # table only
"""

import argparse
import glob
import os
import sys

import numpy as np


def _colorize_range(rng):
    """Range plane -> turbo-ish heat ramp; black where no return."""
    r = np.where(np.isfinite(rng) & (rng > 0), rng, 0.0)
    x = np.clip(r / max(r.max(), 1e-6), 0.0, 1.0)
    img = np.zeros(r.shape + (3,), np.uint8)
    img[..., 0] = (255 * np.clip(1.5 * x, 0, 1)).astype(np.uint8)
    img[..., 1] = (255 * np.clip(1.5 * (x - 0.33), 0, 1)).astype(np.uint8)
    img[..., 2] = (255 * np.clip(1.5 * (x - 0.66), 0, 1)).astype(np.uint8)
    img[r == 0] = 0
    return img


def _colorize_labels(lab, segmented):
    """Cluster labels -> hashed categorical colors; ground/invalid dark."""
    h = (lab.astype(np.int64) * 2654435761) & 0xFFFFFF
    img = np.stack([(h >> 16) & 0xFF, (h >> 8) & 0xFF, h & 0xFF],
                   axis=-1).astype(np.uint8)
    img[lab < 0] = (40, 40, 40)
    img[~segmented & (lab >= 0)] = img[~segmented & (lab >= 0)] // 3
    return img


def _colorize_picks(pick):
    """Pick labels: sharp red, less-sharp orange, flat green, rest gray."""
    img = np.full(pick.shape + (3,), 60, np.uint8)
    img[pick == 2] = (255, 40, 40)
    img[pick == 1] = (255, 160, 40)
    img[pick == -1] = (40, 220, 40)
    return img


def _colorize_bool(mask, on=(70, 160, 255)):
    img = np.full(mask.shape + (3,), 25, np.uint8)
    img[mask.astype(bool)] = on
    return img


def write_ppm(path, img, scale=4):
    """Binary PPM, rows scaled up vertically (16 rows are hard to see)."""
    img = np.repeat(img, scale, axis=0)
    with open(path, "wb") as f:
        f.write(f"P6 {img.shape[1]} {img.shape[0]} 255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def render(npz_path, out_dir):
    d = np.load(npz_path)
    base = os.path.splitext(os.path.basename(npz_path))[0]
    os.makedirs(out_dir, exist_ok=True)
    planes = {
        "range": _colorize_range(d["range"]),
        "ground": _colorize_bool(d["ground"], on=(90, 200, 90)),
        "labels": _colorize_labels(d["labels"], d["segmented"]),
        "outlier": _colorize_bool(d["outlier"], on=(230, 90, 230)),
        "picks": _colorize_picks(d["pick_label"]),
    }
    for name, img in planes.items():
        write_ppm(os.path.join(out_dir, f"{base}_{name}.ppm"), img)
    return planes


def summarize(npz_path):
    d = np.load(npz_path)
    row = {
        "scan": os.path.basename(npz_path),
        "returns": int(d["img_valid"].sum()),
        "ground": int(d["ground"].sum()),
        "segmented": int(d["segmented"].sum()),
        "outlier": int(d["outlier"].sum()),
        "sharp": int(d["sharp_valid"].sum()),
        "flat": int(d["flat_valid"].sum()),
    }
    for k in ("kf_count", "loop_count", "submap_corner_occ",
              "submap_surf_occ", "kf_overflow", "loop_dropped"):
        if k in d:
            row[k] = int(d[k])
    if "feat_overflow" in d and d["feat_overflow"].any():
        row["FEAT_OVERFLOW"] = d["feat_overflow"].tolist()
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--out", default=None,
                    help="PPM output dir (default: alongside the npz)")
    ap.add_argument("--summary", action="store_true",
                    help="print the per-scan table only, no images")
    args = ap.parse_args(argv)

    paths = []
    for p in args.paths:
        paths.extend(sorted(glob.glob(p)) if any(c in p for c in "*?")
                     else [p])
    header = None
    for p in paths:
        row = summarize(p)
        if header is None:
            header = list(row.keys())
            print("  ".join(f"{h:>12}" for h in header))
        print("  ".join(f"{str(row.get(h, '')):>12}" for h in header))
        if not args.summary:
            out = args.out or os.path.dirname(p) or "."
            planes = render(p, out)
            print(f"  -> {len(planes)} PPM planes in {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
