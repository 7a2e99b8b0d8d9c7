#!/usr/bin/env python
"""Dataset visualization: multi-view sanity-check montages per frame.

Counterpart of reference `team_code/visualize_dataset.py` (231 LoC): for
each saved frame of a collected route, render a montage of

  * the RGB camera with the ground-truth route/waypoints projected through
    the calibrated pinhole model (train/visualise.camera_overlay) and the
    target point,
  * a BEV panel: ego box, actor boxes colored by class (vehicle / walker /
    static / traffic light by state), the dense route, target points,
  * a header with speed / target speed / command / hazard flags,

for dataset QA, coordinate-transform verification, and debugging the
loading pipeline -- on any route directory in the dataset layout
(microsim-collected or CARLA-collected).

    python scripts/visualize_dataset.py --route-dir <route> \
        --out-dir viz/ [--every-n 5] [--max-frames 20]
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CLASS_COLORS = {
    "vehicle": (255, 165, 0), "walker": (0, 255, 0),
    "static": (250, 160, 160), "traffic_light_red": (255, 0, 0),
    "traffic_light_yellow": (255, 255, 0),
    "traffic_light_green": (0, 200, 0), "stop_sign": (200, 0, 0),
    "emergency": (16, 133, 133),
}


def _box_color(box):
    cls = str(box.get("class", ""))
    tid = str(box.get("type_id", ""))
    base = str(box.get("base_type", ""))
    if cls == "traffic_light":
        return CLASS_COLORS.get(f"traffic_light_{box.get('state', 'green')}",
                                (180, 180, 180))   # off/unknown states
    if cls == "stop_sign" or "stop" in tid:
        return CLASS_COLORS["stop_sign"]
    if base == "walker" or "walker" in tid:
        return CLASS_COLORS["walker"]
    if any(k in tid for k in ("ambulance", "firetruck", "police")):
        return CLASS_COLORS["emergency"]
    if base == "static" or "static" in tid:
        return CLASS_COLORS["static"]
    return CLASS_COLORS["vehicle"]


def bev_panel(m, boxes, size=512, meters=64.0):
    """Ego-centered BEV: x up, y right (ego frame), pixels_per_meter
    derived from size/meters (reference visualize_model lidar panel)."""
    import cv2
    ppm = size / meters
    img = np.full((size, size, 3), 30, np.uint8)

    def to_px(xy):
        x, y = float(xy[0]), float(xy[1])
        return (int(size / 2 + y * ppm), int(size / 2 - x * ppm))

    route = np.asarray(m.get("route", []), float)
    if len(route):
        pts = np.asarray([to_px(p) for p in route[:200]], np.int32)
        cv2.polylines(img, [pts], False, (90, 90, 90), 2)
    for box in boxes:
        if "position" not in box or box.get("class") == "ego_info":
            continue
        pos = np.asarray(box["position"], float)[:2]
        if np.abs(pos).max() > meters / 2:
            continue
        yaw = float(box.get("yaw", 0.0))
        ex, ey = (np.asarray(box.get("extent", [1.0, 0.5]), float)[:2]
                  .tolist())
        c, s = np.cos(yaw), np.sin(yaw)
        corners = [pos + np.array([c * dx - s * dy, s * dx + c * dy])
                   for dx, dy in ((ex, ey), (-ex, ey), (-ex, -ey),
                                  (ex, -ey))]
        px = np.asarray([to_px(p) for p in corners], np.int32)
        cv2.polylines(img, [px], True, _box_color(box), 2)
    # ego box + target points
    ego_px = np.asarray([to_px(p) for p in
                         ((2.45, 1.0), (-2.45, 1.0), (-2.45, -1.0),
                          (2.45, -1.0))], np.int32)
    cv2.polylines(img, [ego_px], True, (255, 255, 255), 2)
    for key, col in (("target_point", (0, 160, 255)),
                     ("target_point_next", (0, 90, 160))):
        tp = m.get(key)
        if tp is not None:
            cv2.circle(img, to_px(tp), 5, col, -1)
    return img


def frame_montage(route_dir, frame_idx):
    import cv2
    from simlingo_tpu.train.visualise import camera_overlay

    mp = os.path.join(route_dir, "measurements",
                      f"{frame_idx:04}.json.gz")
    with gzip.open(mp, "rt") as f:
        m = json.load(f)
    boxes = []
    bp = os.path.join(route_dir, "boxes", f"{frame_idx:04}.json.gz")
    if os.path.exists(bp):
        with gzip.open(bp, "rt") as f:
            boxes = json.load(f)
    rgb = cv2.cvtColor(cv2.imread(
        os.path.join(route_dir, "rgb", f"{frame_idx:04}.jpg"),
        cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)

    route = np.asarray(m.get("route", []), float)[:100]
    wps = route[::10][:10] if len(route) else np.zeros((0, 2))
    tp = np.asarray(m.get("target_point", [0.0, 0.0]), float)[None]
    cam = camera_overlay(rgb, np.concatenate([wps, tp], 0)
                         if len(wps) else tp, route)
    bev = bev_panel(m, boxes, size=rgb.shape[0])
    montage = np.concatenate([cam, bev], axis=1)

    header = (f"frame {frame_idx:04d}  speed {m.get('speed', 0):.1f} "
              f"target {m.get('target_speed', 0):.1f} m/s  "
              f"command {m.get('command', 4)}  "
              f"brake {int(bool(m.get('brake', False)))}  "
              f"light_hazard {int(bool(m.get('light_hazard', False)))}  "
              f"stop_hazard {int(bool(m.get('stop_sign_hazard', False)))}")
    bar = np.zeros((28, montage.shape[1], 3), np.uint8)
    cv2.putText(bar, header, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.55,
                (255, 255, 255), 1)
    return np.concatenate([bar, montage], axis=0)


def main():
    import cv2
    ap = argparse.ArgumentParser()
    ap.add_argument("--route-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--every-n", type=int, default=5)
    ap.add_argument("--max-frames", type=int, default=40)
    args = ap.parse_args()

    frames = sorted(glob.glob(os.path.join(args.route_dir, "measurements",
                                           "*.json.gz")))
    os.makedirs(args.out_dir, exist_ok=True)
    count = 0
    for fp in frames[::args.every_n]:
        if count >= args.max_frames:
            break
        idx = int(os.path.basename(fp).split(".")[0])
        montage = frame_montage(args.route_dir, idx)
        out = os.path.join(args.out_dir, f"{idx:04}.png")
        cv2.imwrite(out, montage[:, :, ::-1])
        count += 1
    print(f"wrote {count} montages to {args.out_dir}")


if __name__ == "__main__":
    main()
