r"""MVNX (Xsens motion export XML) reader.

Rebuild of the reference's ``articulate/utils/xsens/mvnx_reader.py``: parses
segment orientations/positions and sensor data from an .mvnx file using the
standard library XML parser (no lxml dependency).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict

import numpy as np

__all__ = ["read_mvnx"]


def _local(tag: str) -> str:
    return tag.split("}")[-1]


def read_mvnx(path: str) -> Dict:
    r"""Parse an MVNX file -> dict with frame arrays.

    Returns keys (when present): ``segment_names``, ``sensor_names``,
    ``frame_rate``, ``orientation`` [T, S, 4] (wxyz), ``position`` [T, S, 3],
    ``sensor_orientation`` [T, N, 4], ``sensor_acceleration`` [T, N, 3].
    """
    root = ET.parse(path).getroot()
    out: Dict = {"segment_names": [], "sensor_names": [], "frame_rate": 60.0}
    frames = []
    for el in root.iter():
        tag = _local(el.tag)
        if tag == "segment" and el.get("label"):
            out["segment_names"].append(el.get("label"))
        elif tag == "sensor" and el.get("label"):
            out["sensor_names"].append(el.get("label"))
        elif tag == "subject" and el.get("frameRate"):
            out["frame_rate"] = float(el.get("frameRate"))
        elif tag == "frame" and el.get("type") == "normal":
            frame = {}
            for child in el:
                ctag = _local(child.tag)
                if child.text:
                    frame[ctag] = np.fromstring(child.text, sep=" ")
            frames.append(frame)

    def stack(key, width):
        rows = [f[key] for f in frames if key in f]
        if not rows:
            return None
        arr = np.stack(rows).astype(np.float32)
        return arr.reshape(arr.shape[0], -1, width)

    for key, name, width in [("orientation", "orientation", 4),
                             ("position", "position", 3),
                             ("sensorOrientation", "sensor_orientation", 4),
                             ("sensorFreeAcceleration",
                              "sensor_acceleration", 3)]:
        arr = stack(key, width)
        if arr is not None:
            out[name] = arr
    return out
