r"""Streaming runtime: native datapath, protocols, sync math, live engine."""

import threading

import numpy as np
import pytest

from robustcap_tpu.streaming import (
    CalibrationResult, ImuCamStream, ImuResampler, RingBuffer,
    detect_jump_sync, detect_spikes, encode_detector_packet,
    encode_imu_packet, encode_unity_frame, native_available,
    parse_detector_packet, parse_imu_packet, parse_unity_frame,
    tpose_calibration)


class TestNativeDatapath:
    def test_native_builds(self):
        assert native_available(), "C++ datapath failed to build"

    def test_ring_drop_oldest(self):
        rb = RingBuffer(3, 2)
        for i in range(5):
            rb.push(np.full(2, i, np.float32))
        assert len(rb) == 3
        assert rb.dropped == 2
        np.testing.assert_allclose(rb.pop(), [2, 2])
        np.testing.assert_allclose(rb.pop(), [3, 3])

    def test_ring_threaded(self):
        rb = RingBuffer(1000, 1)
        def producer():
            for i in range(500):
                rb.push(np.asarray([float(i)], np.float32))
        ts = [threading.Thread(target=producer) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert len(rb) == 1000

    def test_resampler_interpolates(self):
        rs = ImuResampler(1, 60.0)
        # two samples 1/30 s apart; the 60 Hz tick lands between them
        q0 = np.asarray([1, 0, 0, 0], np.float32)
        q1 = np.asarray([np.cos(0.25), np.sin(0.25), 0, 0], np.float32)
        rs.push(0, 0.0, q0, np.zeros(3, np.float32))
        rs.push(0, 1 / 30, q1, np.asarray([3.0, 0, 0], np.float32))
        t, q, a = rs.tick()
        # clock starts at newest sample -> exactly q1
        np.testing.assert_allclose(q[0], q1, atol=1e-5)
        np.testing.assert_allclose(a[0], [3, 0, 0], atol=1e-5)

    def test_imu_packet_roundtrip(self):
        q = np.random.RandomState(0).randn(6, 4).astype(np.float32)
        a = np.random.RandomState(1).randn(6, 3).astype(np.float32)
        t, q2, a2 = parse_imu_packet(encode_imu_packet(1.25, q, a))
        assert abs(t - 1.25) < 1e-6
        np.testing.assert_allclose(q2, q)
        np.testing.assert_allclose(a2, a)


class TestProtocols:
    def test_detector_roundtrip(self):
        rng = np.random.RandomState(0)
        uv = rng.randn(33, 3).astype(np.float32)
        ori = rng.randn(6, 3, 3).astype(np.float32)
        acc = rng.randn(6, 3).astype(np.float32)
        rcm = rng.randn(3, 3).astype(np.float32)
        u2, o2, a2, r2 = parse_detector_packet(
            encode_detector_packet(uv, ori, acc, rcm))
        np.testing.assert_allclose(u2, uv, rtol=1e-4)
        np.testing.assert_allclose(o2, ori, rtol=1e-4)
        np.testing.assert_allclose(a2, acc, rtol=1e-4)
        np.testing.assert_allclose(r2, rcm, rtol=1e-4)

    def test_unity_roundtrip(self):
        rng = np.random.RandomState(1)
        pose = rng.randn(24, 3).astype(np.float32)
        tran = rng.randn(3).astype(np.float32)
        p2, t2 = parse_unity_frame(encode_unity_frame(pose, tran))
        np.testing.assert_allclose(p2, pose, rtol=1e-4)
        np.testing.assert_allclose(t2, tran, rtol=1e-4)


class TestSync:
    def test_spike_detection(self):
        sig = np.zeros(100)
        sig[20] = 12.0
        sig[60] = 15.0
        assert detect_spikes(sig, 9.0) == [20, 60]

    def test_jump_sync_offset(self):
        # IMU spikes at t=1.0 and 2.0 s; camera blur dips 0.15 s earlier in
        # its own clock -> offset = +0.15
        imu_t = np.arange(0, 3, 1 / 60)
        acc = np.full_like(imu_t, 1.0)
        acc[np.searchsorted(imu_t, 1.0)] = 20
        acc[np.searchsorted(imu_t, 2.0)] = 20
        cam_t = np.arange(0, 3, 1 / 30)
        sharp = np.full_like(cam_t, 100.0)
        sharp[np.searchsorted(cam_t, 0.85)] = 10
        sharp[np.searchsorted(cam_t, 1.85)] = 10
        off = detect_jump_sync(acc, imu_t, sharp, cam_t)
        assert off is not None
        assert abs(off - 0.15) < 0.05

    def test_tpose_calibration_portrait_camera(self):
        r"""Gravity along the camera x axis (portrait mount) must not
        degenerate R_CM to NaN (the default x-axis guess is parallel to
        up; the fallback guess axis kicks in)."""
        flat = np.tile([1, 0, 0, 0.0], (20, 1))
        tpose = np.tile([1, 0, 0, 0.0], (6, 20, 1))
        calib = tpose_calibration(flat, tpose,
                                  camera_up_in_cam=[-1.0, 0.0, 0.0])
        assert np.isfinite(calib.R_CM).all() and np.isfinite(calib.R_CI).all()
        np.testing.assert_allclose(calib.R_CM @ calib.R_CM.T, np.eye(3),
                                   atol=1e-5)
        # up really maps to the requested camera direction
        np.testing.assert_allclose(calib.R_CM[:, 2], [-1.0, 0.0, 0.0],
                                   atol=1e-5)

    def test_tpose_calibration_identity(self):
        # sensor lying flat with identity orientation; bones aligned in
        # T-pose -> all alignment rotations orthonormal, chain consistent
        flat = np.tile([1, 0, 0, 0.0], (20, 1))
        tpose = np.tile([1, 0, 0, 0.0], (6, 20, 1))
        calib = tpose_calibration(flat, tpose)
        np.testing.assert_allclose(calib.R_MI, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(calib.R_SB,
                                   np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(calib.R_CM @ calib.R_CM.T, np.eye(3),
                                   atol=1e-5)
        # stream produces camera-frame ticks
        stream = ImuCamStream(calib)
        for i in range(6):
            stream.push(i, 0.0, np.asarray([1, 0, 0, 0.0]), np.zeros(3))
        t, R_CB, acc_C = stream.tick()
        assert R_CB.shape == (6, 3, 3) and acc_C.shape == (6, 3)
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", R_CB, R_CB),
            np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)


class TestLiveEngine:
    def test_live_server_process(self):
        import jax
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        from robustcap_tpu.streaming import LiveServer

        specs = {
            "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
            "rnn4": (171, 69, 24, 0.4, False),
            "rnn6": (240, 3, 20, 0.4, False),
            "rnn7": (141, 144, 16, 0.1, False),
            "rnn8": (141, 2, 16, 0.4, False),
        }
        model = ParametricModel(data=synthetic_smpl_data(num_verts=512))
        params = sig_mp.init_params(jax.random.PRNGKey(0), specs)
        cfg = SigMPConfig(live=True, conf_range=(0.85, 0.9),
                          tran_filter_num=0.01, update_vision_freq=5)
        srv = LiveServer(params, model, cfg)
        rng = np.random.RandomState(0)
        rcm = np.eye(3, dtype=np.float32)
        outs = []
        for t in range(8):
            uv = np.concatenate(
                [rng.randn(33, 2) * 0.1 + 0.3,
                 np.full((33, 1), 0.95)], 1).astype(np.float32)
            ori = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))
            acc = rng.randn(6, 3).astype(np.float32)
            pose_aa, tran = srv.process(uv, ori, acc, rcm)
            outs.append((pose_aa, tran))
        assert outs[0][0].shape == (24, 3)
        # first frame zeroed at origin
        np.testing.assert_allclose(outs[0][1], 0, atol=1e-5)
        assert np.isfinite(np.stack([o[1] for o in outs])).all()
        srv.reset()
        pose2, tran2 = srv.process(uv, ori, acc, rcm)
        assert np.isfinite(pose2).all()
