r"""Offline 2-D keypoint detector runners.

Rebuild of the reference's ``scripts/run_{aist,tc,3dpw,3dpwocc}_detector.py``:
run MediaPipe Pose over dataset videos (optionally bbox-cropped with the
smoothed keypoint track, optionally with synthetic occluders pasted at fixed
per-video positions) and cache [T, 33, 3] (x_frac, y_frac, visibility)
arrays. MediaPipe/cv2 are external host dependencies — the framework
consumes the cached outputs (SURVEY.md §2); frame sources are injectable so
the cropping/occlusion logic is testable without them.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

from .occlusion import occlude_with_objects
from .smooth_bbox import get_bbox, get_smooth_bbox_params

__all__ = ["MediaPipeDetector", "detect_sequence", "detect_sequence_cropped",
           "detect_sequence_occluded"]


class MediaPipeDetector:
    r"""Thin MediaPipe Pose wrapper producing the 33-landmark array
    (run_aist_detector.py detection_mediapipe)."""

    def __init__(self, min_detection_confidence: float = 0.5,
                 model_complexity: int = 1, static_image_mode: bool = False):
        try:
            import mediapipe as mp
        except ImportError as e:
            raise ImportError(
                "MediaPipe is an external detector dependency; precomputed "
                "keypoint caches are consumed without it") from e
        self._pose = mp.solutions.pose.Pose(
            static_image_mode=static_image_mode,
            min_detection_confidence=min_detection_confidence,
            model_complexity=model_complexity)

    def __call__(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        res = self._pose.process(frame_rgb)
        if res.pose_landmarks is None:
            return None
        return np.asarray([[p.x, p.y, p.visibility]
                           for p in res.pose_landmarks.landmark], np.float32)


def _placeholder() -> np.ndarray:
    r"""Detector-failure placeholder: zeros with confidence 0
    (preprocess.py:89-91)."""
    return np.zeros((33, 3), np.float32)


def detect_sequence(frames: Iterable[np.ndarray],
                    detector: Callable) -> np.ndarray:
    r"""Run the detector over frames -> [T, 33, 3] with placeholders on
    failures."""
    out = []
    for frame in frames:
        kp = detector(frame)
        out.append(kp if kp is not None else _placeholder())
    return np.stack(out) if out else np.zeros((0, 33, 3), np.float32)


def detect_sequence_cropped(frames: List[np.ndarray], gt_kp: np.ndarray,
                            detector: Callable) -> np.ndarray:
    r"""Detect on a smoothed-bbox crop and map landmarks back to full-frame
    fractions (run_3dpw_detector.py:33-53): per-frame 4:3 windows from the
    GT-keypoint track keep the subject centered for the detector."""
    H, W = frames[0].shape[:2]
    track = get_smooth_bbox_params(gt_kp)
    out = []
    for t, frame in enumerate(frames):
        cx, cy, s = track[t]
        half = s / 2 + 50
        uv = np.array([[cy - half, cx - half], [cy + half, cx + half]],
                      np.float32)
        u0, v0, u1, v1 = get_bbox(uv, H, W)
        crop = frame[u0:u1, v0:v1]
        kp = detector(crop)
        if kp is None:
            out.append(_placeholder())
            continue
        kp = kp.copy()
        kp[:, 0] = (kp[:, 0] * (v1 - v0) + v0) / W
        kp[:, 1] = (kp[:, 1] * (u1 - u0) + u0) / H
        out.append(kp)
    return np.stack(out)


def detect_sequence_occluded(frames: Iterable[np.ndarray], occluders,
                             detector: Callable, seed: int = 0,
                             n_range: Tuple[int, int] = (1, 8),
                             frame_size: Tuple[int, int] = (1920, 1080)
                             ) -> np.ndarray:
    r"""Paste occluders at *fixed random centers per video* then detect
    (run_aist_detector.py:81-141) — temporally coherent synthetic occlusion
    for training the confidence gate."""
    rng = np.random.RandomState(seed)
    w, h = frame_size
    n = rng.randint(n_range[0], n_range[1] + 1)
    centers = [(rng.uniform(0, w), rng.uniform(0, h)) for _ in range(n)]
    out = []
    for frame in frames:
        occluded = occlude_with_objects(frame, occluders, rng,
                                        centers=centers)
        kp = detector(occluded)
        out.append(kp if kp is not None else _placeholder())
    return np.stack(out)
