r"""Weight-stationary Pallas LSTM scan kernel vs the XLA reference scan.

Runs in Pallas interpret mode on CPU; the compiled TPU path is exercised by
bench/tooling (see docs/PERFORMANCE.md for measurements and caveats).
"""

import numpy as np
import jax
import jax.numpy as jnp

from robustcap_tpu.nn.rnn import init_rnn_params, init_state, rnn_scan
from robustcap_tpu.ops.pallas_lstm import (lstm_stack_vmem_bytes,
                                           rnn_scan_pallas)


class TestPallasLSTM:
    def test_matches_xla_scan(self):
        params = init_rnn_params(jax.random.PRNGKey(0), 72, 69, 64, 2)
        xs = jnp.asarray(np.random.RandomState(0).randn(12, 72), jnp.float32)
        ys_ref, (h_ref, c_ref) = rnn_scan(params, xs)
        ys, (h, c) = rnn_scan_pallas(params, xs, interpret=True)
        np.testing.assert_allclose(ys, ys_ref, atol=2e-5)
        np.testing.assert_allclose(h[:2], h_ref, atol=2e-5)
        np.testing.assert_allclose(c[:2], c_ref, atol=2e-5)

    def test_chunk_chaining(self):
        params = init_rnn_params(jax.random.PRNGKey(1), 24, 8, 32, 2)
        xs = jnp.asarray(np.random.RandomState(1).randn(10, 24), jnp.float32)
        ys_full, _ = rnn_scan_pallas(params, xs, interpret=True)
        y1, st = rnn_scan_pallas(params, xs[:4], interpret=True)
        y2, _ = rnn_scan_pallas(params, xs[4:], state=(st[0][:2], st[1][:2]),
                                interpret=True)
        np.testing.assert_allclose(jnp.concatenate([y1, y2]), ys_full,
                                   atol=2e-5)

    def test_vmem_budget(self):
        # 512-wide stacks stay in the ~tens-of-MB VMEM class (kernel-eligible
        # on v5e); the 1280-wide stack is ~6x larger and stays on XLA
        small = init_rnn_params(jax.random.PRNGKey(2), 141, 3, 512, 2)
        big = init_rnn_params(jax.random.PRNGKey(3), 171, 69, 1280, 2)
        assert lstm_stack_vmem_bytes(small) < 20 * 2 ** 20
        assert lstm_stack_vmem_bytes(big) > 80 * 2 ** 20


class TestChunkedWrapper:
    def test_matches_xla_scan_across_chunks(self):
        from robustcap_tpu.ops.pallas_lstm import rnn_scan_pallas_chunked
        params = init_rnn_params(jax.random.PRNGKey(4), 210, 3, 48, 2)
        xs = jnp.asarray(np.random.RandomState(2).randn(13, 210), jnp.float32)
        ys_ref, (h_ref, c_ref) = rnn_scan(params, xs)
        ys, (h, c) = rnn_scan_pallas_chunked(params, xs, max_chunk=5,
                                             interpret=True)
        np.testing.assert_allclose(ys, ys_ref, atol=2e-5)
        np.testing.assert_allclose(h, h_ref, atol=2e-5)
        np.testing.assert_allclose(c, c_ref, atol=2e-5)

    def test_accepts_quantized_and_bf16_params(self):
        from robustcap_tpu.nn.rnn import cast_params, quantize_params
        from robustcap_tpu.ops.pallas_lstm import rnn_scan_pallas_chunked
        params = init_rnn_params(jax.random.PRNGKey(5), 24, 8, 32, 2)
        xs = jnp.asarray(np.random.RandomState(3).randn(6, 24), jnp.float32)
        ys_f, _ = rnn_scan_pallas_chunked(params, xs, interpret=True)
        ys_q, _ = rnn_scan_pallas_chunked(quantize_params(params), xs,
                                          interpret=True)
        ys_b, _ = rnn_scan_pallas_chunked(cast_params(params, jnp.bfloat16),
                                          xs, interpret=True)
        # quantized/bf16 weights deviate by their storage rounding only
        assert float(jnp.abs(ys_q - ys_f).max()) < 0.05
        assert float(jnp.abs(ys_b - ys_f).max()) < 0.05


class TestPallasInertialChunk:
    r"""forward_chunk with cfg.pallas_inertial: the Pallas pre-scan of
    rnn2/rnn3 + precomputed-inertial fused scan must reproduce the standard
    chunk path frame for frame (interpret mode on CPU; the TPU-compiled
    path is measured by bench.py's pallas section)."""

    def _world(self, **cfg_kw):
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        from test_sig_mp_step import SMALL_SPECS

        model = ParametricModel(data=synthetic_smpl_data(num_verts=500))
        params = sig_mp.init_params(jax.random.PRNGKey(0), SMALL_SPECS)
        return model, params, SigMPConfig(**cfg_kw)

    def _frames(self, T, seed=0, conf=0.9):
        import robustcap_tpu.math as M
        rng = np.random.RandomState(seed)
        j2dc = (rng.randn(T, 33, 3) * 0.1 + 0.5).astype(np.float32)
        j2dc[..., 2] = conf
        accc = rng.randn(T, 6, 3).astype(np.float32)
        aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
        oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                          ).reshape(T, 6, 3, 3).astype(np.float32)
        return j2dc, accc, oric

    def test_chunk_matches_standard_path(self):
        from robustcap_tpu.models import sig_mp
        model, params, _ = self._world()
        from robustcap_tpu.config import SigMPConfig
        T = 8
        j2dc, accc, oric = self._frames(T)
        f0 = self._frames(1, seed=9)

        def run(cfg):
            net = sig_mp.StreamingNet(params, model, cfg)
            net.forward_online(f0[0][0], f0[1][0], f0[2][0],
                               first_tran=np.zeros(3, np.float32),
                               first_frame=True)
            outs = [np.asarray(x) for x in
                    net.forward_chunk(j2dc[:T // 2], accc[:T // 2],
                                      oric[:T // 2])]
            outs2 = [np.asarray(x) for x in
                     net.forward_chunk(j2dc[T // 2:], accc[T // 2:],
                                       oric[T // 2:])]
            return [np.concatenate([a, b]) for a, b in zip(outs, outs2)]

        pose_s, tran_s = run(SigMPConfig())
        pose_p, tran_p = run(SigMPConfig(pallas_inertial=True))
        np.testing.assert_allclose(pose_p, pose_s, atol=5e-5)
        np.testing.assert_allclose(tran_p, tran_s, atol=5e-5)

    def test_occluded_frames_match_too(self):
        r"""Occluded frames drive j3dr from rnn2's output directly — the
        precomputed path must feed the identical sequence."""
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        model, params, _ = self._world()
        T = 6
        j2dc, accc, oric = self._frames(T, conf=0.2)  # occluded
        f0 = self._frames(1, seed=9)

        def run(cfg):
            net = sig_mp.StreamingNet(params, model, cfg)
            net.forward_online(f0[0][0], f0[1][0], f0[2][0],
                               first_tran=np.zeros(3, np.float32),
                               first_frame=True)
            return [np.asarray(x) for x in
                    net.forward_chunk(j2dc, accc, oric)]

        pose_s, tran_s = run(SigMPConfig())
        pose_p, tran_p = run(SigMPConfig(pallas_inertial=True))
        np.testing.assert_allclose(pose_p, pose_s, atol=5e-5)
        np.testing.assert_allclose(tran_p, tran_s, atol=5e-5)

    def test_imu_updater_pending_falls_back(self):
        r"""While first_reach is pending the one-shot rnn2 state rewrite can
        fire mid-chunk, so the chunk must take the standard path — and the
        pallas program only engages after it clears."""
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        model, params, _ = self._world()
        cfg = SigMPConfig(pallas_inertial=True)  # use_imu_updater default on
        net = sig_mp.StreamingNet(params, model, cfg)
        T = 4
        j2dc, accc, oric = self._frames(T, conf=0.2)  # low conf: stays pending
        f0 = self._frames(1, seed=9, conf=0.2)
        net.forward_online(f0[0][0], f0[1][0], f0[2][0],
                           first_tran=np.zeros(3, np.float32),
                           first_frame=True)
        net.forward_chunk(j2dc, accc, oric)
        assert (T, False) in net._chunk_fns  # standard path used
        assert (T, True) not in net._chunk_fns
        # a confident chunk clears first_reach; the NEXT chunk goes pallas
        j2dc_hi, accc2, oric2 = self._frames(T, seed=3, conf=0.95)
        net.forward_chunk(j2dc_hi, accc2, oric2)
        net.forward_chunk(j2dc, accc, oric)
        assert (T, True) in net._chunk_fns
