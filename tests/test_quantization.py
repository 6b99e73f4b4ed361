r"""int8 weight-only quantization of the LSTM bank (serving path).

Covers ``nn.rnn.quantize_params``: per-channel round-trip error bounds,
numerical closeness of the quantized cell/scan, and the full fusion step
(``models/sig_mp.py``) running end-to-end on a quantized six-module bank
with bounded trajectory deviation. Reference counterpart: none — the
reference (net/sig_mp.py) serves f32 only; this is a beyond-parity serving
feature (docs/PERFORMANCE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustcap_tpu.nn import rnn as R


def _params(key=0, in_size=72, out_size=69, hidden=128, with_init=False):
    return R.init_rnn_params(jax.random.PRNGKey(key), in_size, out_size,
                             hidden, with_init_net=with_init)


class TestQuantizeTensor:
    def test_round_trip_error_bound(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 48)) * 0.3
        q = R.quantize_tensor(w)
        assert q["q"].dtype == jnp.int8
        assert q["scale"].shape == (64, 1)
        back = R.dequantize_tensor(q)
        # symmetric per-row 8-bit: error <= scale/2 = rowmax/254 per element
        row_max = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
        assert np.all(np.abs(np.asarray(back - w)) <= row_max / 254 + 1e-7)

    def test_extreme_rows_get_own_scale(self):
        w = jnp.concatenate([jnp.ones((1, 8)) * 100.0,
                             jnp.ones((1, 8)) * 1e-3], axis=0)
        back = np.asarray(R.dequantize_tensor(R.quantize_tensor(w)))
        assert np.allclose(back[0], 100.0, rtol=1e-2)
        assert np.allclose(back[1], 1e-3, rtol=1e-2)

    def test_zero_row_is_stable(self):
        w = jnp.zeros((3, 5))
        q = R.quantize_tensor(w)
        assert np.all(np.asarray(q["q"]) == 0)
        assert np.all(np.isfinite(np.asarray(R.dequantize_tensor(q))))


class TestQuantizeParams:
    def test_structure_and_footprint(self):
        p = _params(with_init=True)
        qp = R.quantize_params(p)
        assert R.is_quantized(qp)
        assert not R.is_quantized(p)
        # biases stay float
        assert qp["layers"][0]["b_ih"].dtype == jnp.float32
        # ~4x smaller weight payload
        def nbytes(t):
            return sum(x.nbytes for x in jax.tree.leaves(t))
        assert nbytes(qp) < 0.3 * nbytes(p)

    def test_idempotent(self):
        qp = R.quantize_params(_params())
        qp2 = R.quantize_params(qp)
        assert jax.tree.structure(qp) == jax.tree.structure(qp2)
        assert np.array_equal(np.asarray(qp["linear1"]["w"]["q"]),
                              np.asarray(qp2["linear1"]["w"]["q"]))

    def test_cast_params_is_noop_on_quantized(self):
        qp = R.quantize_params(_params())
        out = R.cast_params(qp, jnp.bfloat16)
        assert out is qp

    def test_works_on_module_bank(self):
        bank = {"rnn2": _params(0, with_init=True), "rnn7": _params(1)}
        qb = R.quantize_params(bank)
        assert R.is_quantized(qb)
        assert qb["rnn2"]["init_net"][0]["w"]["q"].dtype == jnp.int8

    def test_orbax_checkpoint_round_trip(self, tmp_path):
        # the int8 serving artifact must survive checkpointing bit-exactly
        from robustcap_tpu.train import (load_checkpoint_orbax,
                                         save_checkpoint_orbax)
        qp = R.quantize_params(_params(with_init=True))
        path = str(tmp_path / "ckpt")
        save_checkpoint_orbax(qp, path)
        back = load_checkpoint_orbax(path, like=qp)
        assert R.is_quantized(back)
        assert back["linear1"]["w"]["q"].dtype == jnp.int8
        for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(back)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_dequantize_params_dense_and_noop(self):
        p = _params()
        qp = R.quantize_params(p)
        dq = R.dequantize_params(qp)
        assert not R.is_quantized(dq)
        assert dq["linear1"]["w"].dtype == jnp.bfloat16
        assert R.dequantize_params(p) is p  # unquantized trees pass through
        np.testing.assert_allclose(
            np.asarray(dq["linear1"]["w"], np.float32),
            np.asarray(R.dequantize_tensor(qp["linear1"]["w"],
                                           jnp.bfloat16), np.float32))


class TestQuantizedForward:
    def test_step_close_to_f32(self):
        p = _params()
        qp = R.quantize_params(p)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 72))
        st = R.init_state(p, (4,))
        y_ref, _ = R.rnn_step(p, x, st)
        y_q, (h_q, c_q) = jax.jit(R.rnn_step)(qp, x, st)
        assert y_q.dtype == x.dtype
        err = np.abs(np.asarray(y_q - y_ref))
        denom = np.abs(np.asarray(y_ref)).mean() + 1e-6
        assert err.mean() / denom < 0.05
        # cosine similarity of the flattened outputs
        a, b = np.asarray(y_q).ravel(), np.asarray(y_ref).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.995

    def test_scan_stays_close_over_time(self):
        # recurrence must not amplify the quantization noise unboundedly
        p = _params(hidden=96)
        qp = R.quantize_params(p)
        xs = jax.random.normal(jax.random.PRNGKey(3), (50, 2, 72)) * 0.5
        ys_ref, _ = R.rnn_scan(p, xs)
        ys_q, _ = jax.jit(R.rnn_scan)(qp, xs)
        a = np.asarray(ys_q, np.float32)
        b = np.asarray(ys_ref, np.float32)
        scale = np.abs(b).mean() + 1e-6
        assert np.abs(a - b).mean() / scale < 0.08
        # late-sequence frames individually bounded too (no divergence)
        assert np.abs(a[-5:] - b[-5:]).mean() / scale < 0.12

    def test_init_net_apply_quantized(self):
        p = _params(with_init=True)
        qp = R.quantize_params(p)
        lbl = jax.random.normal(jax.random.PRNGKey(4), (3, 69))
        h, c = R.init_net_apply(p, lbl)
        hq, cq = R.init_net_apply(qp, lbl)
        assert hq.shape == h.shape and cq.shape == c.shape
        scale = np.abs(np.asarray(h)).mean() + 1e-6
        assert np.abs(np.asarray(hq - h)).mean() / scale < 0.08

    def test_padded_forward_masking_still_exact(self):
        # masked steps must freeze the carry regardless of weight dtype
        p = _params(hidden=64)
        qp = R.quantize_params(p)
        xs = jax.random.normal(jax.random.PRNGKey(5), (12, 3, 72))
        lengths = jnp.asarray([12, 7, 3])
        ys, _ = R.rnn_forward_padded(qp, xs, lengths)
        ys_np = np.asarray(ys, np.float32)
        for b, L in enumerate([12, 7, 3]):
            assert np.all(ys_np[L:, b] == 0)
            solo, _ = R.rnn_scan(qp, xs[:L, b:b + 1])
            np.testing.assert_allclose(ys_np[:L, b],
                                       np.asarray(solo[:, 0], np.float32),
                                       atol=2e-2)


class TestQuantizedFusionNet:
    @pytest.fixture(scope="class")
    def setup(self):
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        import robustcap_tpu.math as M

        model = ParametricModel(data=synthetic_smpl_data())
        specs = {k: (i, o, 48, d, w)
                 for k, (i, o, _, d, w) in sig_mp.RNN_SPECS.items()}
        params = sig_mp.init_params(jax.random.PRNGKey(0), specs)
        T = 40
        rng = np.random.RandomState(0)
        j2dc = (rng.randn(T, 33, 3) * 0.1).astype(np.float32)
        j2dc[..., 2] = np.clip(rng.uniform(0.3, 1.0, (T, 1)), 0, 1)
        accc = rng.randn(T, 6, 3).astype(np.float32)
        aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
        oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                          ).reshape(T, 6, 3, 3).astype(np.float32)
        seq = {"j2dc": j2dc, "accc": accc, "oric": oric}
        return model, params, seq, SigMPConfig()

    def test_trajectory_deviation_bounded(self, setup):
        from robustcap_tpu.models import sig_mp
        model, params, seq, cfg = setup
        qparams = R.quantize_params(params)

        def run(p):
            T = seq["j2dc"].shape[0]
            frames = {
                "j2dc": seq["j2dc"][None], "accc": seq["accc"][None],
                "oric": seq["oric"][None],
                "first_tran": np.zeros((1, T, 3), np.float32),
                "first_tran_valid": (np.arange(T) == 0)[None],
                "first_frame": np.zeros((1, T), bool),
                "gravityc": np.broadcast_to(
                    np.asarray([0, -1.0, 0], np.float32), (1, T, 3)).copy(),
            }
            frames = {k: jnp.asarray(v) for k, v in frames.items()}
            out = jax.jit(lambda p_, f: sig_mp.forward_offline_batched(
                p_, model, cfg, f))(p, frames)
            pose, tran = out
            return (np.asarray(pose[0], np.float32),
                    np.asarray(tran[0], np.float32))

        pose_f, tran_f = run(params)
        pose_q, tran_q = run(qparams)
        # rotations stay within a few degrees: |R_q - R_f| small
        assert np.abs(pose_q - pose_f).max() < 0.3
        assert np.abs(pose_q - pose_f).mean() < 0.02
        # translation within centimeters over 40 frames
        assert np.abs(tran_q - tran_f).max() < 0.05

    def test_streaming_net_accepts_quantized(self, setup):
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.config import SigMPConfig
        model, params, seq, _ = setup
        net = sig_mp.StreamingNet(R.quantize_params(params), model,
                                  SigMPConfig())
        pose, tran = net.forward_online(
            seq["j2dc"][0], seq["accc"][0], seq["oric"][0],
            first_tran=np.zeros(3, np.float32))
        assert np.asarray(pose).shape == (24, 3, 3)
        assert np.all(np.isfinite(np.asarray(pose)))
        assert np.all(np.isfinite(np.asarray(tran)))


class TestInt8Compute:
    r"""Dynamic-activation int8 compute mode (``int8_compute=True``): gate
    matmuls run int8 x int8 -> int32 with per-row activation scales instead
    of dequantizing weights to bf16 (nn/rnn.py::lstm_cell)."""

    def test_quantize_activation_round_trip(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (5, 97)) * \
            jnp.asarray([0.01, 1.0, 100.0, 1e-6, 3.0])[:, None]
        q, s = R.quantize_activation(x)
        assert q.dtype == jnp.int8
        back = q.astype(jnp.float32) * s
        row_max = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
        assert np.all(np.abs(np.asarray(back) - np.asarray(x))
                      <= row_max / 254 + 1e-9)

    def test_scan_close_to_f32(self):
        p = _params(hidden=96)
        qp = R.quantize_params(p)
        xs = jax.random.normal(jax.random.PRNGKey(5), (48, 4, 72))
        y_f, _ = R.rnn_scan(p, xs)
        y_q, _ = R.rnn_scan(qp, xs, int8_compute=True)
        err = np.abs(np.asarray(y_f - y_q, np.float32))
        scale = np.abs(np.asarray(y_f, np.float32)).max()
        assert err.max() / scale < 0.05   # no recurrent blow-up over 48 steps
        assert err.mean() / scale < 0.01

    def test_requires_quantized_weights_noop_otherwise(self):
        # unquantized weights: the flag falls back to the dense path
        p = _params(hidden=32)
        xs = jax.random.normal(jax.random.PRNGKey(6), (4, 2, 72))
        y_a, _ = R.rnn_scan(p, xs)
        y_b, _ = R.rnn_scan(p, xs, int8_compute=True)
        np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b))

    def test_fusion_net_trajectory_close(self):
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        import robustcap_tpu.math as M

        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        specs = {k: (i, o, 48, d, w)
                 for k, (i, o, _, d, w) in sig_mp.RNN_SPECS.items()}
        params = sig_mp.init_params(jax.random.PRNGKey(0), specs)
        qparams = R.quantize_params(params)
        T = 40
        rng = np.random.RandomState(0)
        j2dc = (rng.randn(T, 33, 3) * 0.1).astype(np.float32)
        j2dc[..., 2] = np.clip(rng.uniform(0.3, 1.0, (T, 1)), 0, 1)
        accc = rng.randn(T, 6, 3).astype(np.float32)
        aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
        oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                          ).reshape(T, 6, 3, 3).astype(np.float32)

        pose_f, tran_f = sig_mp.forward_offline(
            params, model, SigMPConfig(), j2dc, accc, oric, first_frame=True)
        pose_q, tran_q = sig_mp.forward_offline(
            qparams, model, SigMPConfig(int8_compute=True),
            j2dc, accc, oric, first_frame=True)
        pose_f, pose_q = np.asarray(pose_f), np.asarray(pose_q)
        tran_f, tran_q = np.asarray(tran_f), np.asarray(tran_q)
        assert np.abs(pose_q - pose_f).max() < 0.3
        assert np.abs(pose_q - pose_f).mean() < 0.02
        assert np.abs(tran_q - tran_f).max() < 0.05
        # outputs stay finite and orthonormal-ish
        rtr = np.einsum("tjab,tjac->tjbc", pose_q, pose_q)
        eye = np.broadcast_to(np.eye(3), rtr.shape)
        assert np.abs(rtr - eye).max() < 0.02

    def test_dropout_training_rejected(self):
        p = R.quantize_params(_params(hidden=32))
        xs = jax.random.normal(jax.random.PRNGKey(7), (4, 2, 72))
        with pytest.raises(ValueError, match="inference-only"):
            R.rnn_scan(p, xs, dropout=0.4, rng=jax.random.PRNGKey(0),
                       int8_compute=True)

    def test_dequantize_non_gate_params_scope(self):
        r"""Gate matrices stay int8 (the MXU consumes them directly); the
        small linears dequantize so scans never re-dequantize in-loop."""
        qp = R.quantize_params(_params(hidden=32, with_init=True))
        out = R.dequantize_non_gate_params(qp)
        assert R._is_qtensor(out["layers"][0]["w_ih"])
        assert R._is_qtensor(out["layers"][1]["w_hh"])
        assert not R._is_qtensor(out["linear1"]["w"])
        assert not R._is_qtensor(out["linear2"]["w"])
        # dense leaves match a full dequant
        dense = R.dequantize_params(qp)
        np.testing.assert_allclose(
            np.asarray(out["linear1"]["w"], np.float32),
            np.asarray(dense["linear1"]["w"], np.float32))


class TestEndMetricAcceptance:
    r"""Quality contract for the quantized serving modes (VERDICT r2 item
    5): through the ACTUAL eval pipeline on a fixture corpus, int8
    weight-only and int8-MXU compute each cost < 2 mm MPJPE/PVE vs f32.
    (tools/quant_report.py measures the same bound at full width:
    sub-0.5 mm deltas on 32-frame fixtures.)"""

    def test_quantized_eval_metric_deltas_bounded(self):
        from robustcap_tpu.config import SigMPConfig
        from robustcap_tpu.eval.datasets import build_aist_sequences
        from robustcap_tpu.eval.evaluate import evaluate_sequences
        from robustcap_tpu.models import sig_mp
        from robustcap_tpu.nn.rnn import quantize_params
        from robustcap_tpu.preprocess import build_fixture_dataset
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

        model = ParametricModel(data=synthetic_smpl_data())
        specs = {k: (i, o, 48, d, w)
                 for k, (i, o, _, d, w) in sig_mp.RNN_SPECS.items()}
        params = sig_mp.init_params(jax.random.PRNGKey(0), specs)
        ds = build_fixture_dataset(model, n_seq=1, T=32, n_cam=3, seed=5)
        seqs = build_aist_sequences(ds, num_cameras=3)

        def metrics(p, cfg):
            out = evaluate_sequences(seqs, params=p, model=model, cfg=cfg,
                                     run_smplify=False, pad_to_multiple=32)
            return {k: float(out[k]) for k in ("mpjpe", "pve", "pampjpe")}

        m_f = metrics(params, SigMPConfig())
        qp = quantize_params(params)
        m_w8 = metrics(qp, SigMPConfig())
        m_i8c = metrics(qp, SigMPConfig(int8_compute=True))

        for name, m in (("int8 weight-only", m_w8), ("int8 compute", m_i8c)):
            for k in m_f:
                delta_mm = abs(m[k] - m_f[k]) * 1e3
                assert delta_mm < 2.0, \
                    f"{name}: {k} delta {delta_mm:.3f} mm >= 2 mm"
