r"""Wire protocols of the live pipeline (reference SURVEY.md §3.3).

Three links, byte-compatible with the reference so its processes interop:

* IMU bridge -> sync:   UDP :8777, binary float32 ``t | q(4n) | a(3n)``
  (xsens_dot_server_no_gui.py, live_demo_sync.py:262-268) — see ``native.py``.
* detector -> server:   UDP :9999, ASCII ``uv#ori#acc#RCM`` with ','-joined
  floats (live_detector.py:58-61).
* server -> Unity:      TCP :8888, ASCII ``pose#tran$`` per frame
  (live_server.py:57-59); Unity viewer handshake ``n#colors#names$``
  (articulate/utils/unity/view_motion.py:43-69).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["encode_detector_packet", "parse_detector_packet",
           "encode_unity_frame", "parse_unity_frame"]


def _csv(a) -> str:
    return ",".join("%g" % v for v in np.asarray(a, np.float32).reshape(-1))


def encode_detector_packet(uv: np.ndarray, ori: np.ndarray, acc: np.ndarray,
                           rcm: np.ndarray) -> bytes:
    r"""uv [33, 3] (normalized x, y, visibility), ori [6, 3, 3], acc [6, 3],
    RCM [3, 3] -> ``uv#ori#acc#RCM`` (live_detector.py:58-61)."""
    return "#".join([_csv(uv), _csv(ori), _csv(acc), _csv(rcm)]).encode()


def parse_detector_packet(buf: bytes
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                     np.ndarray]:
    parts = buf.decode().split("#")
    if len(parts) != 4:
        raise ValueError("malformed detector packet")
    uv = _parse(parts[0], (33, 3))
    ori = _parse(parts[1], (6, 3, 3))
    acc = _parse(parts[2], (6, 3))
    rcm = _parse(parts[3], (3, 3))
    return uv, ori, acc, rcm


def _parse(s: str, shape) -> np.ndarray:
    vals = np.asarray([float(v) for v in s.split(",") if v], np.float32)
    return vals.reshape(shape)


def encode_unity_frame(pose_axis_angle: np.ndarray,
                       tran: np.ndarray) -> bytes:
    r"""pose [24, 3] axis-angle, tran [3] -> ``pose#tran$``
    (live_server.py:57-59)."""
    return ("#".join([_csv(pose_axis_angle), _csv(tran)]) + "$").encode()


def parse_unity_frame(buf: bytes) -> Tuple[np.ndarray, np.ndarray]:
    s = buf.decode().rstrip("$")
    pose_s, tran_s = s.split("#")
    return _parse(pose_s, (24, 3)), _parse(tran_s, (3,))
