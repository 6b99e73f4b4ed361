r"""IMU -> UDP bridge process (+ synthetic sensor emulator).

Rebuild of the reference's ``articulate/utils/executables/
xsens_dot_server_no_gui.py``: process 1 of the live pipeline. Reads the six
sensors at the target rate and forwards binary ``t | q(4n) | a(3n)`` packets
to UDP :8777. Adds a **synthetic emulator mode** the reference lacks: a
posed SMPL motion generates realistic virtual IMU packets so the entire live
pipeline (bridge -> sync -> detector -> server) can be exercised end-to-end
with zero hardware.
"""

from __future__ import annotations

import socket
import time
from typing import Optional, Sequence

import numpy as np

from ..config import LiveConfig
from ..streaming.native import encode_imu_packet
from .xsens import XsensDotSet

__all__ = ["run_imu_bridge", "SyntheticImuSource"]


class SyntheticImuSource:
    r"""Virtual 6-IMU stream from a preprocessed motion (ori [T, 6, 3, 3],
    acc [T, 6, 3] at 60 fps), looping; quaternions in wxyz."""

    def __init__(self, ori: np.ndarray, acc: np.ndarray, fps: float = 60.0):
        import jax.numpy as jnp
        from .. import math as M
        T = len(ori)
        self.quats = np.asarray(M.rotation_matrix_to_quaternion(
            jnp.asarray(np.asarray(ori, np.float32).reshape(-1, 3, 3)))
        ).reshape(T, -1, 4)
        self.acc = np.asarray(acc, np.float32)
        self.fps = fps
        self.t0 = time.time()

    def read(self):
        r"""-> (t, quats [6, 4], accs [6, 3]) for 'now'."""
        t = time.time() - self.t0
        idx = int(t * self.fps) % len(self.quats)
        return t, self.quats[idx], self.acc[idx]


def run_imu_bridge(source=None, addresses: Optional[Sequence[str]] = None,
                   live: LiveConfig = LiveConfig(), dest=None,
                   max_packets=None, transport_factory=None,
                   reset_heading: bool = False):
    r"""Forward sensor samples to UDP (xsens_dot_server_no_gui.py).

    ``source``: an object with ``read() -> (t, quats [n,4], accs [n,3])``
    (e.g. ``SyntheticImuSource``); when None, connects Xsens DOTs via
    ``XsensDotSet`` — over bleak radio by default, or any injected
    ``transport_factory`` (e.g. ``FakeDotTransport`` for hardware-free
    runs) — and starts streaming (optionally resetting headings first,
    mirroring the reference server's hotkey flow).
    """
    dots = None
    if source is None:
        dots = XsensDotSet(addresses or list(live.imu_addrs),
                           transport_factory=transport_factory)
        dots.connect()
        dots.start_streaming()
        if reset_heading:
            dots.reset_heading()

        class _HwSource:
            def read(self):
                samples = [dots.get(i) for i in range(dots.n)]
                t = samples[-1][0]
                quats = np.stack([s[1] for s in samples])
                accs = np.stack([s[2] for s in samples])
                return t, quats, accs

        source = _HwSource()

    dest = dest or ("127.0.0.1", live.imu_udp_port)
    udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dt = 1.0 / live.fps
    n = 0
    next_t = time.time()
    try:
        while max_packets is None or n < max_packets:
            t, quats, accs = source.read()
            udp.sendto(encode_imu_packet(t, quats, accs), dest)
            n += 1
            next_t += dt
            sleep = next_t - time.time()
            if sleep > 0:
                time.sleep(sleep)
    finally:
        if dots is not None:
            dots.shutdown()
    return n
