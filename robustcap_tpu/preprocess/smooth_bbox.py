r"""Smoothed bounding-box tracks from 2-D keypoints.

Rebuild of ``scripts/smooth_bbox.py`` (get_smooth_bbox_params:9,
kp_to_bbox_param:33): per-frame keypoint bboxes (center + scale) median- and
Gaussian-filtered over time, with invalid frames linearly interpolated —
used to crop detector inputs for TotalCapture/3DPW (run_3dpw_detector.py).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter1d, median_filter

__all__ = ["kp_to_bbox_param", "get_smooth_bbox_params", "get_bbox"]


def kp_to_bbox_param(kp: np.ndarray, vis_thresh: float = 0.3):
    r"""One frame's keypoints [J, 3] -> (cx, cy, scale) or None when too few
    joints are visible (smooth_bbox.py:33-55)."""
    vis = kp[:, 2] > vis_thresh
    if vis.sum() < 2:
        return None
    pts = kp[vis, :2]
    mins, maxs = pts.min(0), pts.max(0)
    center = (mins + maxs) / 2
    size = np.max(maxs - mins)
    if size < 1e-3:
        return None
    return np.array([center[0], center[1], size], np.float32)


def _interp_invalid(params: np.ndarray, valid: np.ndarray) -> np.ndarray:
    out = params.copy()
    idx = np.arange(len(params))
    for c in range(params.shape[1]):
        if valid.any():
            out[~valid, c] = np.interp(idx[~valid], idx[valid],
                                       params[valid, c])
    return out


def get_smooth_bbox_params(kps: np.ndarray, vis_thresh: float = 0.3,
                           kernel_size: int = 11, sigma: float = 3.0
                           ) -> np.ndarray:
    r"""Keypoint sequence [T, J, 3] -> smoothed (cx, cy, scale) track [T, 3]
    (smooth_bbox.py:9-31)."""
    T = len(kps)
    params = np.zeros((T, 3), np.float32)
    valid = np.zeros(T, bool)
    for t in range(T):
        p = kp_to_bbox_param(kps[t], vis_thresh)
        if p is not None:
            params[t] = p
            valid[t] = True
    if not valid.any():
        return params
    params = _interp_invalid(params, valid)
    params = median_filter(params, size=(kernel_size, 1), mode="nearest")
    return gaussian_filter1d(params, sigma, axis=0, mode="nearest")


def get_bbox(uv: np.ndarray, height: int, width: int, border: int = 130,
             w_h: float = 0.75):
    r"""4:3 crop window around keypoints, clamped to the image
    (utils.py:99-126): returns (u_start, v_start, u_end, v_end)."""
    u_max, v_max = int(uv[:, 0].max()), int(uv[:, 1].max())
    u_min, v_min = int(uv[:, 0].min()), int(uv[:, 1].min())
    u_c, v_c = (u_max + u_min) // 2, (v_max + v_min) // 2
    if (u_max - u_min) * w_h > (v_max - v_min):
        h_fix = min((u_max - u_min) + border, height)
        w_fix = int(h_fix * w_h)
    else:
        w_fix = min((v_max - v_min) + border, width)
        h_fix = int(w_fix / w_h)
    if v_c - w_fix // 2 < 0:
        v_s, v_e = 0, w_fix
    elif v_c + w_fix // 2 >= width:
        v_s, v_e = width - w_fix, width
    else:
        v_s, v_e = v_c - w_fix // 2, v_c + w_fix // 2
    if u_c - h_fix // 2 < 0:
        u_s, u_e = 0, h_fix
    elif u_c + h_fix // 2 >= height:
        u_s, u_e = height - h_fix, height
    else:
        u_s, u_e = u_c - h_fix // 2, u_c + h_fix // 2
    return int(u_s), int(v_s), int(u_e), int(v_e)
