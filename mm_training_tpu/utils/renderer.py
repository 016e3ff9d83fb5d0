"""Offline visualization renderer.

Re-design of dataset/src/renderer.py (standalone viz tool, 607 LoC): draws
the point cloud and 3D boxes into a BEV raster and projects 3D box
wireframes into camera images. Unlike the reference — which re-implements
its own Mei/pinhole projection math (renderer.py:452-560) — projection goes
through the shared sensor-model classes, so viz and training geometry can
never diverge.

Outputs are uint8 BGR images (cv2 convention) ready for imwrite.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..configs import CLASSES

__all__ = ['Renderer', 'render_bev', 'draw_boxes_camera', 'box_corners_3d',
           'draw_points_camera', 'render_heatmap_panel', 'render_depth_panel']

# BGR per class id (car, truck/bus, motorcycle, pedestrian, other)
_CLASS_COLORS = [(80, 220, 60), (0, 165, 255), (255, 80, 80),
                 (60, 60, 230), (200, 200, 200)]
_GT_COLOR = (255, 255, 255)

_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),        # bottom
          (4, 5), (5, 6), (6, 7), (7, 4),        # top
          (0, 4), (1, 5), (2, 6), (3, 7),        # verticals
          (0, 5), (1, 4)]                        # front-face cross


def box_corners_3d(box: np.ndarray) -> np.ndarray:
    """[x,y,z,dx,dy,dz,yaw,...] (gravity center) -> [8, 3] corners; the
    first 4 are the bottom face, corners 0/1 on the +x (front) face."""
    x, y, z, dx, dy, dz, yaw = box[:7]
    sx, sy = dx / 2.0, dy / 2.0
    local = np.array([[+sx, +sy, -dz / 2], [+sx, -sy, -dz / 2],
                      [-sx, -sy, -dz / 2], [-sx, +sy, -dz / 2],
                      [+sx, +sy, +dz / 2], [+sx, -sy, +dz / 2],
                      [-sx, -sy, +dz / 2], [-sx, +sy, +dz / 2]], np.float64)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return local @ rot.T + np.array([x, y, z])


def render_bev(points: Optional[np.ndarray],
               gt_boxes: Optional[np.ndarray] = None,
               pred_boxes: Optional[np.ndarray] = None,
               pred_labels: Optional[np.ndarray] = None,
               gt_labels: Optional[np.ndarray] = None,
               pc_range: Sequence[float] = (-204.8, -25.6, -5, 204.8, 25.6, 3),
               px_per_m: float = 5.0,
               radar_flag_dim: Optional[int] = 3) -> np.ndarray:
    """Rasterize the scene top-down (x right, y up). LiDAR points grey,
    radar points orange; GT boxes white, predictions class-colored."""
    x0, y0, _, x1, y1, _ = pc_range
    w = int(round((x1 - x0) * px_per_m))
    h = int(round((y1 - y0) * px_per_m))
    img = np.zeros((h, w, 3), np.uint8)

    def to_px(xs, ys):
        u = ((xs - x0) * px_per_m).astype(np.int32)
        v = (h - 1 - (ys - y0) * px_per_m).astype(np.int32)
        return u, v

    if points is not None and len(points):
        pts = np.asarray(points)
        u, v = to_px(pts[:, 0], pts[:, 1])
        ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        is_radar = (pts[:, radar_flag_dim] > 0.5
                    if radar_flag_dim is not None and pts.shape[1] > radar_flag_dim
                    else np.zeros(len(pts), bool))
        img[v[ok & ~is_radar], u[ok & ~is_radar]] = (120, 120, 120)
        img[v[ok & is_radar], u[ok & is_radar]] = (0, 140, 255)

    def draw_box(box, color, thickness=1):
        if cv2 is None:  # pragma: no cover
            return
        corners = box_corners_3d(box)[:4, :2]
        u, v = to_px(corners[:, 0], corners[:, 1])
        poly = np.stack([u, v], -1).reshape(-1, 1, 2)
        cv2.polylines(img, [poly], True, color, thickness)
        # heading tick from center to front-face midpoint
        cx, cy = to_px(np.asarray([box[0]]), np.asarray([box[1]]))
        fx, fy = (u[0] + u[1]) // 2, (v[0] + v[1]) // 2
        cv2.line(img, (int(cx[0]), int(cy[0])), (int(fx), int(fy)), color, thickness)

    if gt_boxes is not None:
        for i, b in enumerate(np.asarray(gt_boxes)):
            draw_box(b, _GT_COLOR, 1)
    if pred_boxes is not None:
        labels = (np.asarray(pred_labels) if pred_labels is not None
                  else np.zeros(len(pred_boxes), np.int32))
        for b, l in zip(np.asarray(pred_boxes), labels):
            draw_box(b, _CLASS_COLORS[int(l) % len(_CLASS_COLORS)], 1)
    return img


def draw_boxes_camera(image: np.ndarray, boxes: np.ndarray,
                      extrinsic: np.ndarray, intrinsic: np.ndarray,
                      labels: Optional[np.ndarray] = None,
                      color: Optional[Tuple[int, int, int]] = None,
                      thickness: int = 1) -> np.ndarray:
    """Project 3D wireframes into a camera image.

    extrinsic: [4,4] body->camera; intrinsic: [3,3]/[3,4]/[4,4] pinhole.
    """
    if cv2 is None:  # pragma: no cover
        return image
    img = image.copy()
    k = np.asarray(intrinsic, np.float64)[:3, :3]
    h, w = img.shape[:2]
    labels = (np.asarray(labels) if labels is not None
              else np.zeros(len(boxes), np.int32))
    for box, lab in zip(np.asarray(boxes), labels):
        corners = box_corners_3d(box)
        cam = (np.asarray(extrinsic, np.float64)[:3, :3] @ corners.T
               + np.asarray(extrinsic, np.float64)[:3, 3:4])      # [3, 8]
        z = cam[2]
        if np.all(z < 0.5):
            continue
        uvw = k @ cam
        u = uvw[0] / np.maximum(uvw[2], 1e-6)
        v = uvw[1] / np.maximum(uvw[2], 1e-6)
        col = color or _CLASS_COLORS[int(lab) % len(_CLASS_COLORS)]
        for a, b in _EDGES:
            if z[a] < 0.5 or z[b] < 0.5:
                continue
            pa = (int(np.clip(u[a], -4 * w, 4 * w)), int(np.clip(v[a], -4 * h, 4 * h)))
            pb = (int(np.clip(u[b], -4 * w, 4 * w)), int(np.clip(v[b], -4 * h, 4 * h)))
            cv2.line(img, pa, pb, col, thickness)
    return img


def draw_points_camera(image: np.ndarray, points: np.ndarray,
                       extrinsic: np.ndarray, intrinsic: np.ndarray,
                       max_depth: float = 80.0, radius: int = 1,
                       radar_flag_dim: Optional[int] = 3) -> np.ndarray:
    """Project sensor points into a camera image, colored by depth (near red
    -> far blue); radar returns drawn larger. Parity with the reference
    renderer's lidar/radar camera overlays (renderer.py:452-560)."""
    img = image.copy()
    if points is None or not len(points):
        return img
    pts = np.asarray(points, np.float64)
    cam = (np.asarray(extrinsic, np.float64)[:3, :3] @ pts[:, :3].T
           + np.asarray(extrinsic, np.float64)[:3, 3:4])            # [3, P]
    z = cam[2]
    k = np.asarray(intrinsic, np.float64)[:3, :3]
    uvw = k @ cam
    with np.errstate(invalid='ignore'):
        u = np.nan_to_num(uvw[0] / np.maximum(uvw[2], 1e-6),
                          posinf=-1, neginf=-1).astype(np.int32)
        v = np.nan_to_num(uvw[1] / np.maximum(uvw[2], 1e-6),
                          posinf=-1, neginf=-1).astype(np.int32)
    h, w = img.shape[:2]
    ok = (z > 0.5) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    t = np.clip(z / max_depth, 0.0, 1.0)  # 0 near .. 1 far
    colors = np.stack([255 * t, 64 + 0 * t, 255 * (1 - t)], -1).astype(np.uint8)
    is_radar = (pts[:, radar_flag_dim] > 0.5
                if radar_flag_dim is not None and pts.shape[1] > radar_flag_dim
                else np.zeros(len(pts), bool))
    img[v[ok & ~is_radar], u[ok & ~is_radar]] = colors[ok & ~is_radar]
    if cv2 is not None:
        for ui, vi, ci in zip(u[ok & is_radar], v[ok & is_radar],
                              colors[ok & is_radar]):
            cv2.circle(img, (int(ui), int(vi)), radius + 2,
                       tuple(int(c) for c in ci), -1)
    return img


def _colormap(x: np.ndarray) -> np.ndarray:
    """[H, W] in [0, 1] -> BGR uint8 (JET when cv2 exists, grey fallback)."""
    g = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    if cv2 is not None:
        return cv2.applyColorMap(g, cv2.COLORMAP_JET)
    return np.stack([g, g, g], -1)


def render_heatmap_panel(heatmaps: Sequence[np.ndarray]) -> np.ndarray:
    """Per-task class heatmaps [H, W] (already sigmoided) -> one horizontal
    panel (the reference logs these to wandb every 200 steps,
    mm_training_aim.py:491-499)."""
    tiles = [_colormap(np.asarray(hm, np.float32)) for hm in heatmaps]
    hmax = max(t.shape[0] for t in tiles)
    tiles = [np.pad(t, ((0, hmax - t.shape[0]), (0, 2), (0, 0)))
             for t in tiles]
    return np.concatenate(tiles, axis=1)


def render_depth_panel(depth_probs: np.ndarray, d_bound) -> np.ndarray:
    """Depth softmax [fh, fw, D] -> expected-depth image, colormapped."""
    d0, d1, step = d_bound
    d = np.asarray(depth_probs, np.float32)
    bins = d0 + step * np.arange(d.shape[-1], dtype=np.float32)
    exp_depth = (d * bins).sum(-1) / np.maximum(d.sum(-1), 1e-6)
    return _colormap((exp_depth - d0) / max(d1 - d0, 1e-6))


class Renderer:
    """Scene renderer over assembled frames (reference Renderer parity).

    Usage:
        r = Renderer(pc_range)
        bev = r.render_frame_bev(frame, pred_boxes, pred_labels)
        cams = r.render_frame_cameras(frame, pred_boxes, pred_labels)
    where ``frame`` is a data.frame_loader.FrameData.
    """

    def __init__(self, pc_range=(-204.8, -25.6, -5, 204.8, 25.6, 3),
                 px_per_m: float = 5.0):
        self.pc_range = pc_range
        self.px_per_m = px_per_m

    def render_frame_bev(self, frame, pred_boxes=None, pred_labels=None):
        gt = frame.objects[:, :9] if len(frame.objects) else None
        return render_bev(frame.points, gt, pred_boxes, pred_labels,
                          pc_range=self.pc_range, px_per_m=self.px_per_m)

    def render_frame_cameras(self, frame, pred_boxes=None, pred_labels=None,
                             draw_points: bool = True):
        out = []
        for cam in frame.cameras:
            if cam.image is None:
                continue
            img = cam.image
            if draw_points and frame.points is not None and len(frame.points):
                img = draw_points_camera(img, frame.points,
                                         cam.camera_params.extrinsic,
                                         cam.camera_params.intrinsic)
            if len(frame.objects):
                img = draw_boxes_camera(img, frame.objects[:, :9],
                                        cam.camera_params.extrinsic,
                                        cam.camera_params.intrinsic,
                                        color=_GT_COLOR)
            if pred_boxes is not None and len(pred_boxes):
                img = draw_boxes_camera(img, pred_boxes,
                                        cam.camera_params.extrinsic,
                                        cam.camera_params.intrinsic,
                                        labels=pred_labels)
            out.append((cam.name, img))
        return out
