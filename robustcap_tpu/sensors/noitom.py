r"""Noitom Perception Neuron mocap API bindings (alternative IMU vendor).

Rebuild of the reference's ``articulate/utils/noitom/mocap_api.py`` role: a
ctypes FFI to the vendor's MocapApi shared library, unused by the main
pipeline (SURVEY.md §2, mocap_api.py:22). The vendor DLL is proprietary and
platform-specific; this module provides the loading/typing scaffold and a
clear failure mode, plus a pure-Python sensor-frame abstraction so callers
can be written against a stable interface.
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["MocapApi", "NoitomFrame"]


@dataclass
class NoitomFrame:
    timestamp: float
    quat_wxyz: np.ndarray   # [n_sensors, 4]
    acc: np.ndarray         # [n_sensors, 3]


class MocapApi:
    r"""Loader for the vendor MocapApi library (mocap_api.py:22).

    ``lib_path`` points at MocapApi.dll / libMocapApi.so. Without the vendor
    library this class raises on ``connect`` but still serves as the typed
    integration point.
    """

    def __init__(self, lib_path: Optional[str] = None):
        self.lib_path = lib_path
        self._lib = None

    def connect(self, host: str = "127.0.0.1", port: int = 7003):
        if self.lib_path is None or not os.path.exists(self.lib_path):
            raise FileNotFoundError(
                "Noitom MocapApi vendor library not found; this optional "
                "IMU backend requires the proprietary SDK (reference "
                "articulate/utils/noitom). Use the Xsens stack or the "
                "synthetic IMU emulator instead.")
        self._lib = ctypes.cdll.LoadLibrary(self.lib_path)
        # Vendor C API surface is loaded dynamically; the protocol setup
        # (app create -> settings -> avatar polling) follows the SDK docs.
        return self

    def poll(self) -> Optional[NoitomFrame]:
        if self._lib is None:
            raise RuntimeError("not connected")
        raise NotImplementedError(
            "vendor avatar polling requires the proprietary SDK headers")
