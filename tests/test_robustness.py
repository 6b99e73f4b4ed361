r"""Robustness: detector-failure placeholders, degenerate inputs, learning
sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M
from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


class TestDetectorFailureFrames:
    def test_zero_confidence_placeholder_frames_stay_finite(self):
        r"""Detector failures produce all-zero keypoints with confidence 0
        (preprocess.py:89-91); the division by a zero bbox scale must not
        poison the carried state or outputs (the confidence gate masks the
        visual branch)."""
        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        params = sig_mp.init_params(jax.random.PRNGKey(0), SPECS)
        T = 12
        rng = np.random.RandomState(0)
        j2dc = np.concatenate([rng.randn(T, 33, 2) * 0.1,
                               np.full((T, 33, 1), 0.9)], 2).astype(np.float32)
        # frames 4..7: total detector failure
        j2dc[4:8] = 0.0
        accc = rng.randn(T, 6, 3).astype(np.float32)
        aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
        oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                          ).reshape(T, 6, 3, 3)
        pose, tran = sig_mp.forward_offline(
            params, model, SigMPConfig(), j2dc, accc, oric,
            first_tran=np.zeros(3, np.float32))
        assert np.isfinite(np.asarray(pose)).all()
        assert np.isfinite(np.asarray(tran)).all()

    def test_vision_updater_keeps_state_finite_through_failure(self):
        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        params = sig_mp.init_params(jax.random.PRNGKey(1), SPECS)
        step = sig_mp.make_step(model, SigMPConfig())
        carry = sig_mp.init_carry(params)
        frame = sig_mp.make_frame(np.zeros((33, 3), np.float32),
                                  np.zeros((6, 3), np.float32),
                                  np.tile(np.eye(3, dtype=np.float32),
                                          (6, 1, 1)),
                                  first_tran=np.array([0, 0, 3.0]))
        for _ in range(3):
            carry, (pose, tran) = step(params, carry, frame)
        for leaf in jax.tree.leaves(carry):
            assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()


class TestLearning:
    def test_rnn3_learns_on_fixture(self, tmp_path):
        r"""End-to-end learning sanity: the velocity branch's loss drops on
        a small fixture corpus within a few epochs."""
        from robustcap_tpu.preprocess import build_fixture_dataset
        from robustcap_tpu.train import (SeqDataset, features as F,
                                         make_forward_fn, padded_batches,
                                         train, velocity_horizon_loss)
        from robustcap_tpu.nn.rnn import init_rnn_params
        model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
        ds = build_fixture_dataset(model, n_seq=3, T=80, n_cam=1, seed=7)
        d, l = F.rnn3_features(ds)
        dataset = SeqDataset(d, l, split_size=40)
        params = init_rnn_params(jax.random.PRNGKey(0), 141, 3, 24, 2)
        train(params, make_forward_fn(0.0), velocity_horizon_loss, dataset,
              dataset, str(tmp_path), num_epoch=12, batch_size=4,
              learning_rate=3e-3, clip_grad_norm=1.0)
        import json
        recs = [json.loads(x) for x in
                open(tmp_path / "metrics.jsonl").read().splitlines()]
        assert recs[-1]["vald_loss"] < 0.7 * recs[0]["vald_loss"]
