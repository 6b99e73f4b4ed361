r"""End-to-end live-pipeline test over real loopback sockets.

Exercises all three processes of the reference's live architecture
(SURVEY.md §3.3) in-process with threads, zero hardware:

  synthetic IMU bridge (UDP :{imu})  ->  sync/resample  ->  detector packets
  (UDP :{det})  ->  live server engine  ->  Unity frames (TCP :{unity})
"""

import socket
import threading
import time

import numpy as np
import pytest

from robustcap_tpu.config import LiveConfig, SigMPConfig
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
from robustcap_tpu.streaming import (encode_detector_packet,
                                     parse_imu_packet, parse_unity_frame,
                                     run_live_demo)
from robustcap_tpu.sensors import SyntheticImuSource, run_imu_bridge

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}

LIVE = LiveConfig(imu_udp_port=18777, detector_udp_port=19999,
                  unity_tcp_port=18888)


@pytest.fixture(scope="module")
def world():
    import jax
    from robustcap_tpu.models import sig_mp
    model = ParametricModel(data=synthetic_smpl_data(num_verts=512))
    params = sig_mp.init_params(jax.random.PRNGKey(0), SPECS)
    ds = build_fixture_dataset(model, n_seq=1, T=64, n_cam=1, seed=3)
    return model, params, ds


def test_imu_bridge_to_udp(world):
    """Process 1: synthetic sensor -> binary UDP packets."""
    _, _, ds = world
    src = SyntheticImuSource(ds["imu_ori"][0], ds["imu_acc"][0])
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", LIVE.imu_udp_port))
    rx.settimeout(5.0)
    th = threading.Thread(target=run_imu_bridge,
                          kwargs=dict(source=src, live=LIVE, max_packets=5),
                          daemon=True)
    th.start()
    pkts = [rx.recvfrom(4096)[0] for _ in range(5)]
    th.join(timeout=5)
    rx.close()
    t, q, a = parse_imu_packet(pkts[-1])
    assert q.shape == (6, 4) and a.shape == (6, 3)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1, atol=1e-4)


def test_full_pipeline_detector_to_unity(world):
    """Processes 2+3: detector packets -> fused pose -> Unity TCP frames."""
    model, params, ds = world
    cfg = SigMPConfig(live=True, conf_range=(0.85, 0.9),
                      tran_filter_num=0.01, update_vision_freq=5)
    N = 6

    server = threading.Thread(
        target=run_live_demo,
        kwargs=dict(params=params, model=model, cfg=cfg, live=LIVE,
                    max_frames=N),
        daemon=True)
    server.start()

    # Unity client: retry until the server's listen socket is up (fixed
    # sleeps flake on slow/single-core hosts)
    unity = None
    deadline = time.time() + 30
    while unity is None:
        try:
            unity = socket.create_connection(
                ("127.0.0.1", LIVE.unity_tcp_port), timeout=10)
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    # the first frame jit-compiles the fused step; allow minutes on a
    # slow or single-core host
    unity.settimeout(180.0)

    # detector feed: fixture keypoints (normalized) + IMUs in camera frame
    from robustcap_tpu.eval import build_aist_sequences
    seq = build_aist_sequences(ds, num_cameras=1)[0]
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rcm = np.eye(3, dtype=np.float32)
    frames = []
    buf = b""
    for t in range(N):
        tx.sendto(encode_detector_packet(seq.j2dc[t], seq.oric[t],
                                         seq.accc[t], rcm),
                  ("127.0.0.1", LIVE.detector_udp_port))
        while b"$" not in buf:
            buf += unity.recv(65536)
        frame, _, buf = buf.partition(b"$")
        frames.append(parse_unity_frame(frame + b"$"))
    unity.close()
    tx.close()
    server.join(timeout=60)

    assert len(frames) == N
    pose0, tran0 = frames[0]
    assert pose0.shape == (24, 3)
    np.testing.assert_allclose(tran0, 0, atol=1e-4)  # zeroed start
    all_trans = np.stack([f[1] for f in frames])
    assert np.isfinite(all_trans).all()
