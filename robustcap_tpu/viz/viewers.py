r"""Interactive debug viewers (optional host GUI backends).

Rebuild of the reference's debug-viewer sideband:

* ``RotationViewer`` / ``BulletMotionViewer`` — pybullet 3-D debug scenes
  (articulate/utils/bullet/view_rotation.py:18, view_motion.py:23),
* ``StreamingDataViewer`` — real-time scrolling signal plot
  (articulate/utils/pygame/view_streaming_data.py:15).

GUI backends (pybullet/pygame) are optional; every viewer exposes a
headless ``history`` so pipelines can log through them unconditionally and
tests can assert on the captured data.
"""

from __future__ import annotations

from collections import deque
from typing import List, Sequence

import numpy as np

__all__ = ["RotationViewer", "BulletMotionViewer", "StreamingDataViewer"]


class _HeadlessMixin:
    def __init__(self):
        self.history: deque = deque(maxlen=10_000)

    def _record(self, item):
        self.history.append(item)


class RotationViewer(_HeadlessMixin):
    r"""Visualize n live rotations as oriented frames."""

    def __init__(self, n: int = 1, order: str = "wxyz"):
        super().__init__()
        self.n = n
        self.order = order
        self._client = None

    def connect(self):
        try:
            import pybullet as p
        except ImportError:
            return self  # headless
        self._client = p.connect(p.GUI)
        return self

    def update_all(self, rotations: Sequence[np.ndarray]):
        self._record([np.asarray(r) for r in rotations])
        if self._client is not None:
            import pybullet as p
            for i, r in enumerate(rotations):
                q = self._to_xyzw(r)
                p.addUserDebugText(f"R{i}", [i * 0.5, 0, 0],
                                   replaceItemUniqueId=i)

    def _to_xyzw(self, r):
        import jax.numpy as jnp
        from .. import math as M
        r = np.asarray(r)
        if r.shape == (3, 3):
            q = np.asarray(M.rotation_matrix_to_quaternion(jnp.asarray(
                r[None], jnp.float32)))[0]
        else:
            q = r
        return [q[1], q[2], q[3], q[0]]

    def disconnect(self):
        if self._client is not None:
            import pybullet as p
            p.disconnect(self._client)

    def __enter__(self):
        return self.connect()

    def __exit__(self, *a):
        self.disconnect()


class BulletMotionViewer(_HeadlessMixin):
    r"""Multi-subject skeletal motion viewer (bullet MotionViewer)."""

    def __init__(self, n: int = 1):
        super().__init__()
        self.n = n
        self._client = None

    def connect(self):
        try:
            import pybullet as p
        except ImportError:
            return self
        self._client = p.connect(p.GUI)
        return self

    def update_all(self, poses: List[np.ndarray], trans: List[np.ndarray]):
        self._record((poses, trans))
        # GUI body-pose rendering requires the urdf assets; headless mode
        # records only.

    def disconnect(self):
        if self._client is not None:
            import pybullet as p
            p.disconnect(self._client)


class StreamingDataViewer(_HeadlessMixin):
    r"""Real-time scrolling plot of n scalar channels
    (view_streaming_data.py:15). With pygame available, draws a scrolling
    window; headless, keeps the rolling buffer (``.history``) and exposes
    ``snapshot()`` for offline plotting."""

    def __init__(self, n: int = 1, y_range=(-1.0, 1.0), window: int = 300,
                 size=(640, 360)):
        super().__init__()
        self.n = n
        self.y_range = y_range
        self.window = window
        self.size = size
        self.buf = deque(maxlen=window)
        self._screen = None

    def connect(self):
        try:
            import pygame
            pygame.init()
            self._screen = pygame.display.set_mode(self.size)
        except Exception:
            self._screen = None
        return self

    def plot(self, values: Sequence[float]):
        values = np.asarray(values, np.float32).reshape(self.n)
        self.buf.append(values)
        self._record(values)
        if self._screen is not None:
            self._draw()

    def snapshot(self) -> np.ndarray:
        return (np.stack(self.buf) if self.buf
                else np.zeros((0, self.n), np.float32))

    def _draw(self):
        import pygame
        self._screen.fill((10, 10, 10))
        data = self.snapshot()
        w, h = self.size
        lo, hi = self.y_range
        for c in range(self.n):
            pts = [(int(i * w / self.window),
                    int(h - (v[c] - lo) / (hi - lo) * h))
                   for i, v in enumerate(data)]
            if len(pts) > 1:
                pygame.draw.lines(self._screen, (50 + 60 * c, 200, 90), False,
                                  pts, 1)
        pygame.display.flip()
