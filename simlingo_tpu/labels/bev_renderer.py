"""BEV semantic-map rendering for data-collection labels.

Behavioral counterpart of reference `team_code/birds_eye_view/chauffeurnet.py`
(ObsManager): a multi-channel top-down rasterization around the ego --
road/route masks, ego box, other vehicles, pedestrians, traffic-light stop
lines -- written alongside the other sensors during collection.

Channels: 0 route, 1 ego, 2 vehicles, 3 walkers, 4 red-light lines,
5 static obstacles, 6 road (drivable area), 7 lane boundaries.

Road/lane rasters (channels 6-7) mirror the reference's HD-map layers
(chauffeurnet renders the CARLA road layout): the plugin passes the map's
drivable-area polygons / lane markings when CARLA is live; offline they are
approximated as a lane band around the dense route.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CHANNELS = ("route", "ego", "vehicle", "walker", "red_light", "static",
            "road", "lane_boundary")


class BEVRenderer:
    def __init__(self, size_px: int = 192, meters_range: float = 38.4,
                 ego_forward_offset: float = 0.25):
        """size_px x size_px raster covering meters_range; the ego sits
        ego_forward_offset of the way up from the bottom edge."""
        self.size = size_px
        self.range = meters_range
        self.px_per_m = size_px / meters_range
        self.ego_row = int(size_px * (1 - ego_forward_offset))

    def world_to_px(self, points_ego: np.ndarray) -> np.ndarray:
        """Ego-frame (x fwd, y right) [N, 2] -> raster (row, col) int."""
        pts = np.asarray(points_ego, float).reshape(-1, 2)
        rows = self.ego_row - pts[:, 0] * self.px_per_m
        cols = self.size / 2 + pts[:, 1] * self.px_per_m
        return np.stack([rows, cols], 1).round().astype(int)

    def _draw_box(self, bev: np.ndarray, channel: int, center: np.ndarray,
                  yaw: float, extent: Tuple[float, float]) -> None:
        import cv2
        l, w = extent
        corners = np.array([[l, w], [l, -w], [-l, -w], [-l, w]]) / 2
        rot = np.array([[np.cos(yaw), -np.sin(yaw)],
                        [np.sin(yaw), np.cos(yaw)]])
        pts = (corners @ rot.T) + np.asarray(center[:2])
        px = self.world_to_px(pts)[:, ::-1]  # cv2 wants (x=col, y=row)
        canvas = np.ascontiguousarray(bev[:, :, channel])
        cv2.fillPoly(canvas, [px.astype(np.int32)], 1.0)
        bev[:, :, channel] = canvas

    def _draw_polyline(self, bev: np.ndarray, channel: int,
                       points: np.ndarray, width_m: float = 1.0) -> None:
        import cv2
        px = self.world_to_px(points)[:, ::-1].astype(np.int32)
        canvas = np.ascontiguousarray(bev[:, :, channel])
        cv2.polylines(canvas, [px], False, 1.0,
                      max(int(width_m * self.px_per_m), 1))
        bev[:, :, channel] = canvas

    def render(self, route: Optional[np.ndarray] = None,
               vehicles: Sequence[Dict] = (), walkers: Sequence[Dict] = (),
               red_light_lines: Sequence[np.ndarray] = (),
               statics: Sequence[Dict] = (),
               ego_extent: Tuple[float, float] = (4.9, 2.1),
               road_polygons: Sequence[np.ndarray] = (),
               lane_boundaries: Sequence[np.ndarray] = (),
               lane_width: float = 3.5) -> np.ndarray:
        """-> [size, size, 8] float32 in [0, 1].

        road_polygons / lane_boundaries: ego-frame HD-map geometry (from the
        CARLA map when live). Without them the road channel falls back to a
        lane band around the route and the boundaries to its edges.
        """
        import cv2
        bev = np.zeros((self.size, self.size, len(CHANNELS)), np.float32)
        # HD-map channels first (background layers)
        if road_polygons:
            canvas = np.ascontiguousarray(bev[:, :, 6])
            for poly in road_polygons:
                px = self.world_to_px(np.asarray(poly))[:, ::-1]
                cv2.fillPoly(canvas, [px.astype(np.int32)], 1.0)
            bev[:, :, 6] = canvas
        elif route is not None and len(route) >= 2:
            self._draw_polyline(bev, 6, route, width_m=lane_width)
        if lane_boundaries:
            for line in lane_boundaries:
                self._draw_polyline(bev, 7, np.asarray(line), width_m=0.3)
        elif route is not None and len(route) >= 2:
            # approximate boundaries as the route band edges
            r = np.asarray(route, float)
            tang = np.gradient(r, axis=0)
            tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True),
                               1e-9)
            normal = np.stack([-tang[:, 1], tang[:, 0]], axis=1)
            half = lane_width / 2.0
            self._draw_polyline(bev, 7, r + half * normal, width_m=0.3)
            self._draw_polyline(bev, 7, r - half * normal, width_m=0.3)
        if route is not None and len(route) >= 2:
            self._draw_polyline(bev, 0, route, width_m=2.0)
        self._draw_box(bev, 1, np.zeros(2), 0.0, ego_extent)
        for v in vehicles:
            self._draw_box(bev, 2, np.asarray(v["position"][:2]),
                           float(v.get("yaw", 0.0)),
                           tuple(v.get("extent", (4.5, 2.0))))
        for w in walkers:
            self._draw_box(bev, 3, np.asarray(w["position"][:2]),
                           float(w.get("yaw", 0.0)),
                           tuple(w.get("extent", (0.6, 0.6))))
        for line in red_light_lines:
            self._draw_polyline(bev, 4, np.asarray(line), width_m=0.5)
        for s in statics:
            self._draw_box(bev, 5, np.asarray(s["position"][:2]),
                           float(s.get("yaw", 0.0)),
                           tuple(s.get("extent", (1.0, 1.0))))
        return bev

    def to_rgb(self, bev: np.ndarray) -> np.ndarray:
        """Debug visualization: channels -> colors."""
        colors = np.array([
            [80, 80, 80],     # route
            [255, 255, 255],  # ego
            [0, 120, 255],    # vehicles
            [255, 80, 80],    # walkers
            [255, 0, 0],      # red light
            [160, 160, 0],    # static
            [40, 40, 40],     # road
            [200, 200, 200],  # lane boundary
        ], np.float32)
        img = np.zeros((bev.shape[0], bev.shape[1], 3), np.float32)
        for c in range(bev.shape[2]):
            img = np.maximum(img, bev[:, :, c:c + 1] * colors[c])
        return img.astype(np.uint8)


def render_bev(record: Dict, boxes: Sequence[Dict],
               renderer: Optional[BEVRenderer] = None) -> np.ndarray:
    """Convenience: one measurement record + GT boxes -> BEV raster
    (the data collector's per-frame label, reference chauffeurnet path)."""
    r = renderer or BEVRenderer()
    def _is(b, *kinds):
        c = str(b.get("class", b.get("type_id", "")))
        return any(k in c for k in kinds)
    vehicles = [b for b in boxes if _is(b, "vehicle", "car")
                and not _is(b, "static")]
    walkers = [b for b in boxes if _is(b, "walker", "pedestrian")]
    statics = [b for b in boxes if _is(b, "static", "construction",
                                       "warning")]
    route = np.asarray(record.get("route", []), float)
    return r.render(route=route if len(route) >= 2 else None,
                    vehicles=vehicles, walkers=walkers, statics=statics)
