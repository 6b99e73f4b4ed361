r"""Integration: occlusion-heavy evaluation with SMPLify refinement
(BASELINE.json configs[3]) and trainer smoke runs on fixture corpora."""

import numpy as np
import jax
import pytest

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.eval import build_aist_sequences, evaluate_sequences
from robustcap_tpu.models import sig_mp
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


def occluded_conf(rng, T):
    r"""Confidence with a long occlusion span: exercises the confidence gate
    and the hidden-state updaters."""
    conf = np.full(T, 0.95, np.float32)
    conf[T // 3:2 * T // 3] = 0.2
    return conf


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=600))
    params = sig_mp.init_params(jax.random.PRNGKey(2), SPECS)
    ds = build_fixture_dataset(model, n_seq=1, T=30, n_cam=1, seed=11,
                               conf_fn=occluded_conf)
    return model, params, ds


class TestOcclusionEval:
    def test_eval_with_smplify_on_occluded_fixture(self, world):
        model, params, ds = world
        seqs = build_aist_sequences(ds)
        from robustcap_tpu.smplify.prior import MaxMixturePrior
        out = evaluate_sequences(
            seqs, params=params, model=model,
            cfg=SigMPConfig(use_flat_floor=False),
            first_tran_mode="gt", run_smplify=True, pad_to_multiple=32)
        assert np.isfinite(out["mpjpe"]) and np.isfinite(out["pampjpe"])
        assert out["pose_p"][0].shape == (30, 24, 3, 3)

    def test_occluded_vs_clear_states_differ(self, world):
        # the vision updater must engage during the occlusion span: rnn4's
        # hidden state advances with synthetic keypoints; disabling the
        # updater changes the post-occlusion output
        model, params, ds = world
        seqs = build_aist_sequences(ds)
        s = seqs[0]
        on = sig_mp.forward_offline(
            params, model, SigMPConfig(), s.j2dc, s.accc, s.oric,
            first_tran=s.first_tran, gravityc=s.gravityc)
        off = sig_mp.forward_offline(
            params, model, SigMPConfig(use_vision_updater=False),
            s.j2dc, s.accc, s.oric, first_tran=s.first_tran,
            gravityc=s.gravityc)
        post = slice(2 * 30 // 3, None)
        d = np.abs(np.asarray(on[0])[post] - np.asarray(off[0])[post]).max()
        assert d > 1e-5


class TestTrainerSmoke:
    def test_train_rnn8_end_to_end(self, world, tmp_path):
        model, _, ds = world
        from robustcap_tpu.train import trainers
        params = trainers.train_rnn8(ds, ds, save_dir=str(tmp_path),
                                     num_epoch=1, batch_size=2)
        assert params is not None
        import os
        assert os.path.exists(tmp_path / "weights.pkl")

    def test_train_rnn7_end_to_end(self, world, tmp_path):
        model, _, ds = world
        from robustcap_tpu.train import trainers
        params = trainers.train_rnn7(ds, ds, save_dir=str(tmp_path),
                                     num_epoch=1, batch_size=2,
                                     body_model=model)
        assert params is not None

    def test_train_rnn4_with_amass_synthesis(self, world, tmp_path):
        model, _, ds = world
        from robustcap_tpu.train import trainers
        params = trainers.train_rnn4(ds, ds, amass_train=ds, amass_val=ds,
                                     save_dir=str(tmp_path), num_epoch=1,
                                     batch_size=2)
        assert params is not None
