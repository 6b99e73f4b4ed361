r"""Video capture utility (reference: articulate/utils/executables/
record_video.py): grab frames from a camera to disk for calibration or
offline detection. cv2-gated (capture hardware side)."""

from __future__ import annotations

import os
import time
from typing import Optional

__all__ = ["record_video"]


def record_video(out_path: str, camera_id: int = 0, fps: int = 30,
                 duration_s: Optional[float] = None, width: int = 640,
                 height: int = 480, show: bool = False):
    r"""Record webcam frames to ``out_path`` (mp4). Returns frames written."""
    try:
        import cv2
    except ImportError as e:
        raise ImportError("record_video requires cv2 (capture-side)") from e
    cap = cv2.VideoCapture(camera_id)
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (width, height))
    n = 0
    t0 = time.time()
    try:
        while duration_s is None or time.time() - t0 < duration_s:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(frame)
            n += 1
            if show:
                cv2.imshow("record", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        cap.release()
        writer.release()
    return n
