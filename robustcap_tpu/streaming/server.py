r"""Live inference server: UDP sensor frames -> fused pose -> Unity TCP.

Rebuild of the reference's ``live_server.py`` (run_live_demo:24-68): process
3 of the live pipeline. Receives ``uv#ori#acc#RCM`` packets from the
detector process, runs the streaming fusion step (live flag set: tighter
confidence gates, throttled vision updater), rotates root pose/translation
back to the world frame with R_CM^T, and streams axis-angle frames to a
Unity client over TCP.
"""

from __future__ import annotations

import socket
import time
from typing import Optional

import numpy as np

from ..config import LiveConfig, SigMPConfig
from ..models import sig_mp
from ..smpl.model import ParametricModel, default_body_model
from .protocol import encode_unity_frame, parse_detector_packet

__all__ = ["LiveServer", "run_live_demo"]


class LiveServer:
    r"""Stateful live-inference engine (transport-free core, testable).

    ``net`` may be passed directly instead of ``params`` — anything with the
    ``forward_online``/``reset_states`` API works, notably a loaded AOT
    ``ServingBundle`` (robustcap_tpu/serving.py), so the live process can
    run a precompiled artifact without the model code path."""

    def __init__(self, params=None, model: Optional[ParametricModel] = None,
                 cfg: Optional[SigMPConfig] = None, net=None):
        if net is None:
            if params is None:
                raise ValueError("pass params or a net")
            model = model or default_body_model()
            cfg = cfg or SigMPConfig.live_mode()
            net = sig_mp.StreamingNet(params, model, cfg)
        self.net = net
        self.first = True
        self.tran_offset = None

    def reset(self):
        self.net.reset_states()
        self.first = True
        self.tran_offset = None

    def process(self, uv: np.ndarray, ori: np.ndarray, acc: np.ndarray,
                rcm: np.ndarray):
        r"""One sensor frame -> (pose_aa [24, 3] world, tran [3] world)
        (live_server.py:42-59): gravity from R_CM, first frame seeds the
        translation, outputs de-rotated by R_CM^T and zeroed at the start
        position."""
        gravity_c = rcm @ np.asarray([0.0, -1.0, 0.0], np.float32)
        pose, tran = self.net.forward_online(
            uv, acc, ori, first_frame=self.first, gravityc=gravity_c)
        self.first = False
        pose = np.array(pose)
        tran = np.array(tran)
        pose[0] = rcm.T @ pose[0]
        tran_w = rcm.T @ tran
        if self.tran_offset is None:
            self.tran_offset = tran_w.copy()
        tran_w = tran_w - self.tran_offset
        import jax.numpy as jnp
        from .. import math as M
        pose_aa = np.asarray(M.rotation_matrix_to_axis_angle(
            jnp.asarray(pose))).reshape(24, 3)
        return pose_aa, tran_w


def run_live_demo(params=None, model=None, cfg: Optional[SigMPConfig] = None,
                  live: LiveConfig = LiveConfig(), max_frames=None,
                  net=None):
    r"""Socket loop (live_server.py:24-68): accept a Unity client on TCP
    :8888, then consume detector UDP packets on :9999 and stream frames.

    The listening socket comes up BEFORE the engine builds, so clients can
    connect immediately (engine construction compiles the step and can take
    seconds on a loaded host)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("0.0.0.0", live.unity_tcp_port))
    srv.listen(1)

    # bind the detector's UDP socket before accepting the viewer so
    # packets sent immediately after the client connects are not dropped
    udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    udp.bind(("0.0.0.0", live.detector_udp_port))

    engine = LiveServer(params, model, cfg, net=net)

    print(f"waiting for Unity on :{live.unity_tcp_port}")
    conn, addr = srv.accept()
    print("unity connected:", addr)

    n = 0
    t0 = time.time()
    try:
        while max_frames is None or n < max_frames:
            buf, _ = udp.recvfrom(65536)
            uv, ori, acc, rcm = parse_detector_packet(buf)
            pose_aa, tran = engine.process(uv, ori, acc, rcm)
            conn.sendall(encode_unity_frame(pose_aa, tran))
            n += 1
            if n % 600 == 0:
                fps = n / (time.time() - t0)
                print(f"{n} frames, {fps:.1f} fps")
    finally:
        conn.close()
        srv.close()
        udp.close()
