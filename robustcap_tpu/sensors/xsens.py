r"""Xsens DOT BLE sensor stack.

Rebuild of the reference's ``articulate/utils/xsens/`` (xsens_dot_set.py:19,
xdc.py payload codecs): BLE payload parsing is pure and fully tested here;
radio I/O (bleak, asyncio) is isolated in ``XsensDotSet`` and gated on the
``bleak`` package + hardware presence.

Payload: "complete quaternion" mode = 32 bytes of
``uint32 timestamp_us | float32 quat wxyz x4 | float32 free_acc x3``.
"""

from __future__ import annotations

import struct
import threading
import time
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..streaming.native import RingBuffer

__all__ = ["CompleteQuaternionPayload", "parse_complete_quaternion",
           "encode_complete_quaternion", "XsensDotSet",
           "PAYLOAD_COMPLETE_QUATERNION"]

# Xsens DOT BLE UUIDs (public protocol)
BATTERY_UUID = "15173001-4947-11e9-8646-d663bd873d93"
MEASUREMENT_CONTROL_UUID = "15172001-4947-11e9-8646-d663bd873d93"
MEDIUM_PAYLOAD_UUID = "15172003-4947-11e9-8646-d663bd873d93"
PAYLOAD_COMPLETE_QUATERNION = 3

_FMT = "<I4f3f"


@dataclass
class CompleteQuaternionPayload:
    timestamp: float          # seconds
    quat_wxyz: np.ndarray     # [4]
    free_acc: np.ndarray      # [3]


def parse_complete_quaternion(data: bytes) -> CompleteQuaternionPayload:
    r"""Decode one 32-byte complete-quaternion notification
    (xdc.py MediumPayloadCompleteQuaternion)."""
    if len(data) < struct.calcsize(_FMT):
        raise ValueError(f"short payload: {len(data)} bytes")
    vals = struct.unpack_from(_FMT, data)
    return CompleteQuaternionPayload(
        timestamp=vals[0] * 1e-6,
        quat_wxyz=np.asarray(vals[1:5], np.float32),
        free_acc=np.asarray(vals[5:8], np.float32))


def encode_complete_quaternion(t: float, quat_wxyz, free_acc) -> bytes:
    r"""Inverse of ``parse_complete_quaternion`` (used by the synthetic
    sensor emulator and tests)."""
    q = np.asarray(quat_wxyz, np.float32)
    a = np.asarray(free_acc, np.float32)
    return struct.pack(_FMT, int(t * 1e6) & 0xFFFFFFFF, *q.tolist(),
                       *a.tolist())


class XsensDotSet:
    r"""A set of Xsens DOT sensors with per-sensor ring buffers
    (xsens_dot_set.py:19-371): BLE notifications land in drop-oldest rings
    (capacity 180, matching the reference's Queue(180)); ``get(i)`` pops the
    oldest sample. Connection management requires ``bleak``; the class is
    constructed without it so codecs/buffers are testable anywhere.
    """

    def __init__(self, addresses: Sequence[str], buffer_len: int = 180):
        self.addresses = list(addresses)
        self.n = len(self.addresses)
        # ring record: [t, qw, qx, qy, qz, ax, ay, az]
        self._buffers = [RingBuffer(buffer_len, 8) for _ in range(self.n)]
        self._connected = False
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- data path (no hardware needed) -------------------------------------

    def feed(self, i: int, payload: bytes):
        r"""Inject one BLE notification for sensor i (called from the radio
        callback or an emulator)."""
        p = parse_complete_quaternion(payload)
        rec = np.concatenate([[p.timestamp], p.quat_wxyz, p.free_acc]
                             ).astype(np.float32)
        self._buffers[i].push(rec)

    def get(self, i: int, timeout: float = 3.0):
        r"""Pop the oldest sample of sensor i -> (t, quat [4], acc [3]);
        blocks up to ``timeout`` (xsens_dot_set.py:191)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            rec = self._buffers[i].pop()
            if rec is not None:
                return float(rec[0]), rec[1:5].copy(), rec[5:8].copy()
            time.sleep(0.001)
        raise TimeoutError(f"sensor {i}: no data within {timeout}s")

    def is_available(self, i: int) -> bool:
        return len(self._buffers[i]) > 0

    def clear(self, i: Optional[int] = None):
        for b in (self._buffers if i is None else [self._buffers[i]]):
            b.clear()

    # -- radio management (bleak-gated) -------------------------------------

    def connect(self):
        try:
            import bleak  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "XsensDotSet.connect requires the 'bleak' BLE package and "
                "physical Xsens DOT sensors; use feed()/the synthetic "
                "emulator for development") from e
        import asyncio
        from bleak import BleakClient

        async def run():
            clients = []
            for i, addr in enumerate(self.addresses):
                client = BleakClient(addr)
                await client.connect()

                def cb(_, data, i=i):
                    self.feed(i, bytes(data))

                await client.start_notify(MEDIUM_PAYLOAD_UUID, cb)
                # select payload mode 3 (complete quaternion) + start
                await client.write_gatt_char(
                    MEASUREMENT_CONTROL_UUID,
                    bytes([1, 1, PAYLOAD_COMPLETE_QUATERNION]))
                clients.append(client)
            while not self._stop.is_set():
                await asyncio.sleep(0.1)
            for c in clients:
                await c.disconnect()

        self._thread = threading.Thread(
            target=lambda: __import__("asyncio").run(run()), daemon=True)
        self._thread.start()
        self._connected = True

    def shutdown(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._connected = False
