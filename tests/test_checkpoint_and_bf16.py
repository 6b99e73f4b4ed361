r"""Reference-checkpoint conversion (full sig_mp layout) and bf16 inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M
from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.nn.rnn import cast_params
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

torch = pytest.importorskip("torch")

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


def make_reference_style_state_dict(specs, seed=0):
    r"""Build a torch state_dict with the reference's merged checkpoint key
    layout (sig_mp.py:850-857): rnn{k}.linear1/rnn/linear2(.init_net)."""
    torch.manual_seed(seed)
    sd = {}
    for name, (i, o, h, _, with_init) in specs.items():
        mod = torch.nn.ModuleDict({
            "linear1": torch.nn.Linear(i, h),
            "rnn": torch.nn.LSTM(h, h, 2),
            "linear2": torch.nn.Linear(h, o),
        })
        if with_init:
            mod["init_net"] = torch.nn.Sequential(
                torch.nn.Linear(o, h), torch.nn.ReLU(),
                torch.nn.Linear(h, h * 2), torch.nn.ReLU(),
                torch.nn.Linear(h * 2, 2 * 2 * h))
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return sd


class TestCheckpointConversion:
    def test_full_state_dict_converts_and_runs(self, tmp_path):
        sd = make_reference_style_state_dict(SPECS)
        path = tmp_path / "best_weights.pt"
        torch.save(sd, path)
        params = sig_mp.load_torch_checkpoint(str(path))
        assert set(params) == set(SPECS)
        assert "init_net" in params["rnn2"]
        assert params["rnn4"]["layers"][0]["w_ih"].shape == (4 * 24, 24)
        # converted params run through the full step
        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        net = sig_mp.StreamingNet(params, model, SigMPConfig())
        rng = np.random.RandomState(0)
        j2dc = np.concatenate([rng.randn(33, 2) * 0.1,
                               np.full((33, 1), 0.9)], 1).astype(np.float32)
        pose, tran = net.forward_online(
            j2dc, rng.randn(6, 3).astype(np.float32),
            np.tile(np.eye(3, dtype=np.float32), (6, 1, 1)),
            first_tran=np.array([0, 0, 3.0], np.float32))
        assert np.isfinite(np.asarray(pose)).all()

    def test_lstm_semantics_vs_torch_through_converted_weights(self):
        # one module end-to-end: torch forward vs our scan on converted params
        sd = make_reference_style_state_dict({"rnn3": SPECS["rnn3"]}, seed=3)
        from robustcap_tpu.nn.rnn import rnn_params_from_torch, rnn_scan
        params = rnn_params_from_torch(
            {k: v.numpy() for k, v in sd.items()}, prefix="rnn3.")
        x = np.random.RandomState(1).randn(6, 2, 141).astype(np.float32)
        ys, _ = rnn_scan(params, jnp.asarray(x))

        lin1_w = torch.from_numpy(np.asarray(params["linear1"]["w"]))
        with torch.no_grad():
            mod = torch.nn.ModuleDict({
                "linear1": torch.nn.Linear(141, 16),
                "rnn": torch.nn.LSTM(16, 16, 2),
                "linear2": torch.nn.Linear(16, 3)})
            mod.load_state_dict(
                {k[len("rnn3."):]: v for k, v in sd.items()})
            y = torch.relu(mod["linear1"](torch.from_numpy(x)))
            y, _ = mod["rnn"](y)
            y_ref = mod["linear2"](y).numpy()
        np.testing.assert_allclose(ys, y_ref, atol=2e-5)


class TestBf16Inference:
    def test_bf16_close_to_f32(self):
        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        params = sig_mp.init_params(jax.random.PRNGKey(0), SPECS)
        params_bf16 = cast_params(params, jnp.bfloat16)
        cfg = SigMPConfig()
        rng = np.random.RandomState(0)
        T = 10
        j2dc = np.concatenate([rng.randn(T, 33, 2) * 0.1,
                               np.full((T, 33, 1), 0.9)], 2).astype(np.float32)
        accc = rng.randn(T, 6, 3).astype(np.float32)
        aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
        oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                          ).reshape(T, 6, 3, 3)
        p32, t32 = sig_mp.forward_offline(params, model, cfg, j2dc, accc,
                                          oric, first_tran=np.zeros(3))
        p16, t16 = sig_mp.forward_offline(params_bf16, model, cfg, j2dc,
                                          accc, oric, first_tran=np.zeros(3))
        # pose rotations stay within a degree-scale neighborhood
        ang = np.asarray(M.radian_to_degree(M.angle_between(
            jnp.asarray(p32).reshape(-1, 3, 3),
            jnp.asarray(p16).reshape(-1, 3, 3))))
        assert np.median(ang) < 5.0
        assert np.isfinite(np.asarray(t16)).all()
