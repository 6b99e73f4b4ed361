r"""End-to-end slice: fixture dataset -> batched eval -> metrics.

Mirrors BASELINE.json configs[0]: one synthetic sequence with cached
keypoints + synthetic IMU through the fusion net, MPJPE computed. Also
exercises the data-parallel mesh path on the virtual CPU devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.eval import (build_aist_sequences, bucket_sequences,
                                cal_mpjpe, evaluate_sequences, run_sequences)
from robustcap_tpu.models import sig_mp
from robustcap_tpu.preprocess import build_fixture_dataset, syn_acc
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SMALL_SPECS = {
    "rnn2": (72, 69, 16, 0.4, True),
    "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False),
    "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False),
    "rnn8": (141, 2, 16, 0.4, False),
}


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(7), SMALL_SPECS)
    dataset = build_fixture_dataset(model, n_seq=2, T=40, n_cam=2, seed=0)
    return model, params, dataset


class TestSynthesis:
    def test_syn_acc_constant_velocity_is_zero(self):
        t = np.arange(20, dtype=np.float32)[:, None, None]
        v = t * np.array([[[1.0, 2.0, 3.0]]])
        acc = np.asarray(syn_acc(jnp.asarray(v)))
        np.testing.assert_allclose(acc, 0, atol=1e-3)

    def test_syn_acc_quadratic(self):
        # x = 0.5 * a * t^2 at 60 fps -> second difference recovers a
        a = np.array([2.0, -1.0, 0.5], np.float32)
        t = (np.arange(30, dtype=np.float32) / 60)[:, None, None]
        v = 0.5 * a * t ** 2
        acc = np.asarray(syn_acc(jnp.asarray(v)))
        np.testing.assert_allclose(acc[3:-3, 0],
                                   np.broadcast_to(a, (24, 3)),
                                   rtol=1e-2, atol=1e-2)

    def test_fixture_schema(self, world):
        _, _, ds = world
        assert len(ds["pose"]) == 2
        assert ds["joint2d_mp"][0][0].shape == (40, 33, 3)
        assert ds["imu_ori"][0].shape == (40, 6, 3, 3)
        assert ds["imu_acc"][0].shape == (40, 6, 3)
        # keypoints should mostly land on screen
        kp = ds["joint2d_mp"][0][0]
        assert ((kp[..., 0] > -0.5) & (kp[..., 0] < 1.5)).mean() > 0.9


class TestSequenceAssembly:
    def test_build_aist_sequences(self, world):
        model, _, ds = world
        seqs = build_aist_sequences(ds, not_aligned=[], num_cameras=2)
        assert len(seqs) == 4
        s = seqs[0]
        assert s.j2dc.shape == (40, 33, 3)
        assert s.pose_gt.shape == (40, 24, 3, 3)
        # root pose rotated into camera frame: orthonormal
        rtr = np.einsum("tij,tik->tjk", s.pose_gt[:, 0], s.pose_gt[:, 0])
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                                   atol=1e-4)
        # gravity is unit-norm in camera frame
        np.testing.assert_allclose(np.linalg.norm(s.gravityc, axis=1), 1,
                                   atol=1e-4)

    def test_projection_consistency(self, world):
        # normalized keypoints of a confident frame should reproject close to
        # the camera-frame landmarks / z
        model, _, ds = world
        seqs = build_aist_sequences(ds, num_cameras=2)
        s = seqs[0]
        # GT landmark check: project pose_gt through FK
        from robustcap_tpu.preprocess import sync_3d_mp
        import robustcap_tpu.config as C
        glb, joints, verts = model.forward_kinematics(
            jnp.asarray(s.pose_gt), tran=jnp.asarray(s.tran_gt),
            calc_mesh=True, vertex_ids=np.asarray(C.MP_VERTEX_MASK))
        mp3d = np.asarray(sync_3d_mp(verts, joints))
        expected = mp3d[..., :2] / mp3d[..., 2:]
        np.testing.assert_allclose(s.j2dc[..., :2], expected, atol=1e-3)

    def test_not_aligned_filter(self, world):
        _, _, ds = world
        bad = [str(ds["name"][0]).replace("cAll", "c01")]
        seqs = build_aist_sequences(ds, not_aligned=bad, num_cameras=2)
        assert not seqs[0].valid and seqs[1].valid

    def test_bucketing(self, world):
        _, _, ds = world
        seqs = build_aist_sequences(ds, num_cameras=2)
        buckets = bucket_sequences(seqs, max_bucket=3, pad_to_multiple=64)
        covered = sorted(i for b, _ in buckets for i in b)
        assert covered == list(range(4))
        assert all(L == 64 for _, L in buckets)


class TestEndToEnd:
    def test_run_and_score(self, world):
        model, params, ds = world
        seqs = build_aist_sequences(ds, num_cameras=2)
        out = evaluate_sequences(seqs, params=params, model=model,
                                 cfg=SigMPConfig(), first_tran_mode="gt",
                                 pad_to_multiple=64)
        assert np.isfinite(out["mpjpe"]) and out["mpjpe"] > 0
        assert np.isfinite(out["pampjpe"])
        assert out["errors"].shape == (4, 3)
        # PA-MPJPE <= MPJPE by construction
        assert out["pampjpe"] <= out["mpjpe"] + 1e-6

    def test_runner_matches_forward_offline(self, world):
        model, params, ds = world
        seqs = build_aist_sequences(ds, num_cameras=2)
        cfg = SigMPConfig()
        results = run_sequences(params, model, cfg, seqs[:2],
                                pad_to_multiple=64)
        for s, (pose_b, tran_b) in zip(seqs[:2], results):
            pose_1, tran_1 = sig_mp.forward_offline(
                params, model, cfg, s.j2dc, s.accc, s.oric,
                first_tran=s.first_tran, gravityc=s.gravityc)
            np.testing.assert_allclose(pose_b, pose_1, atol=2e-5)
            np.testing.assert_allclose(tran_b, tran_1, atol=2e-5)

    def test_data_parallel_mesh(self, world):
        model, params, ds = world
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ("data",))
        seqs = build_aist_sequences(ds, num_cameras=2)
        cfg = SigMPConfig()
        ref = run_sequences(params, model, cfg, seqs, pad_to_multiple=64)
        got = run_sequences(params, model, cfg, seqs, mesh=mesh,
                            pad_to_multiple=64)
        for (p1, t1), (p2, t2) in zip(ref, got):
            np.testing.assert_allclose(p2, p1, atol=1e-4)
            np.testing.assert_allclose(t2, t1, atol=1e-4)

    def test_int8_compute_on_mesh(self, world):
        r"""The int8-MXU serving mode composes with the DP eval mesh (the
        activation quantization is row-local, so sharded results equal the
        single-device int8 path exactly)."""
        model, params, ds = world
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        import dataclasses
        from jax.sharding import Mesh
        from robustcap_tpu.nn.rnn import quantize_params

        mesh = Mesh(np.array(jax.devices()), ("data",))
        seqs = build_aist_sequences(ds, num_cameras=2)
        cfg = dataclasses.replace(SigMPConfig(), int8_compute=True)
        qparams = quantize_params(params)
        ref = run_sequences(qparams, model, cfg, seqs, pad_to_multiple=64)
        got = run_sequences(qparams, model, cfg, seqs, mesh=mesh,
                            pad_to_multiple=64)
        for (p1, t1), (p2, t2) in zip(ref, got):
            np.testing.assert_allclose(p2, p1, atol=1e-4)
            np.testing.assert_allclose(t2, t1, atol=1e-4)
        # sanity vs the exact f32 path: no divergence/blow-up (loose bound —
        # these are random tiny-spec weights, far more quantization-sensitive
        # than trained ones; precision claims live in test_quantization.py)
        exact = run_sequences(params, model, SigMPConfig(), seqs,
                              pad_to_multiple=64)
        for (pq, tq), (pf, tf) in zip(got, exact):
            assert np.abs(np.asarray(pq) - np.asarray(pf)).max() < 0.6
            assert np.abs(np.asarray(pq) - np.asarray(pf)).mean() < 0.02
            assert np.abs(np.asarray(tq) - np.asarray(tf)).max() < 0.1

    def test_cal_mpjpe_identity(self, world):
        model, _, ds = world
        seqs = build_aist_sequences(ds, num_cameras=1)
        e = np.asarray(cal_mpjpe(seqs[0].pose_gt, seqs[0].pose_gt,
                                 cal_pampjpe=True, model=model))
        np.testing.assert_allclose(e, 0, atol=1e-4)
