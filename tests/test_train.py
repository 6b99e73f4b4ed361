r"""Training subsystem: features, losses, loop, checkpoint/resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robustcap_tpu.nn.rnn import init_rnn_params
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
from robustcap_tpu.train import (SeqDataset, features as F, load_pytree,
                                 make_forward_fn, masked_mse,
                                 masked_bce_pos_weight, masked_distance,
                                 padded_batches, train,
                                 velocity_horizon_loss, make_fk_pose_loss)


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data())
    ds = build_fixture_dataset(model, n_seq=2, T=36, n_cam=2, seed=1)
    return model, ds


class TestFeatures:
    def test_rnn2(self, world):
        _, ds = world
        d, l = F.rnn2_features(ds)
        assert d[0].shape == (34, 72) and l[0].shape == (34, 69)

    def test_rnn3(self, world):
        _, ds = world
        d, l = F.rnn3_features(ds)
        assert d[0].shape == (34, 141) and l[0].shape == (34, 3)

    def test_rnn4_aist(self, world):
        _, ds = world
        d, l = F.rnn4_features_aist(ds, num_cameras=2, include_occ=False)
        assert len(d) == 4
        assert d[0].shape == (34, 171) and l[0].shape == (34, 69)

    def test_rnn6_aist(self, world):
        _, ds = world
        d, l = F.rnn6_features_aist(ds, num_cameras=2)
        assert d[0].shape == (34, 240) and l[0].shape == (34, 3)

    def test_rnn7(self, world):
        model, ds = world
        d, l = F.rnn7_features(ds, model)
        assert d[0].shape == (34, 141) and l[0].shape == (34, 144)
        # pelvis IMU column is NOT root-rotated (sig_mp.py:714-715):
        # orir[:, 5] should equal the raw world pelvis orientation
        raw = np.asarray(ds["imu_ori"][0])[1:-1, 5]
        np.testing.assert_allclose(d[0][:, 18 + 5 * 9:18 + 6 * 9],
                                   raw.reshape(-1, 9), atol=1e-5)

    def test_rnn8(self, world):
        _, ds = world
        d, l = F.rnn8_features(ds)
        assert l[0].shape == (34, 2)
        assert set(np.unique(l[0])) <= {0.0, 1.0}

    def test_amass_camera_augment(self, world):
        _, ds = world
        base = F.amass_mp_base(ds)
        conf = jnp.asarray(np.linspace(0.5, 1, 64, dtype=np.float32))
        d4, l4 = F.amass_camera_augment(jax.random.PRNGKey(0),
                                        jnp.asarray(base[0][0]),
                                        jnp.asarray(base[1][0]), conf,
                                        target="rnn4")
        assert d4.shape == (34, 171) and l4.shape == (34, 69)
        d6, l6 = F.amass_camera_augment(jax.random.PRNGKey(1),
                                        jnp.asarray(base[0][0]),
                                        jnp.asarray(base[1][0]), conf,
                                        target="rnn6", yaw=(-90.0, 90.0))
        assert d6.shape == (34, 240) and l6.shape == (34, 3)
        # subjects placed in front of the camera: positive depth
        assert float(l6[:, 2].min()) > 0


class TestLosses:
    def test_masked_mse_equals_concat(self):
        rng = np.random.RandomState(0)
        ys = jnp.asarray(rng.randn(6, 3, 4), jnp.float32)
        labels = jnp.asarray(rng.randn(6, 3, 4), jnp.float32)
        lengths = jnp.asarray([6, 4, 2])
        got = float(masked_mse(ys, labels, lengths))
        cat_p = np.concatenate([np.asarray(ys[:L, b])
                                for b, L in enumerate([6, 4, 2])])
        cat_t = np.concatenate([np.asarray(labels[:L, b])
                                for b, L in enumerate([6, 4, 2])])
        np.testing.assert_allclose(got, ((cat_p - cat_t) ** 2).mean(),
                                   rtol=1e-5)

    def test_velocity_horizon_windows(self):
        rng = np.random.RandomState(1)
        T = 25
        ys = jnp.asarray(rng.randn(T, 2, 3), jnp.float32)
        labels = jnp.asarray(rng.randn(T, 2, 3), jnp.float32)
        lengths = jnp.asarray([25, 13])
        got = float(velocity_horizon_loss(ys, labels, lengths))

        def ref_loss():
            tot = 0.0
            # f1: mse over concat
            cp = np.concatenate([np.asarray(ys[:L, b])
                                 for b, L in enumerate([25, 13])])
            ct = np.concatenate([np.asarray(labels[:L, b])
                                 for b, L in enumerate([25, 13])])
            tot += ((cp - ct) ** 2).mean()
            for w in (6, 20, 60):
                sp, st = [], []
                for b, L in enumerate([25, 13]):
                    x = np.asarray(ys[:L, b])[L % w:]
                    y = np.asarray(labels[:L, b])[L % w:]
                    if len(x) < w:
                        continue
                    sp.append(x.reshape(-1, w, 3).sum(1))
                    st.append(y.reshape(-1, w, 3).sum(1))
                if sp:
                    sp, st = np.concatenate(sp), np.concatenate(st)
                    tot += ((sp - st) ** 2).mean()
            return tot

        np.testing.assert_allclose(got, ref_loss(), rtol=1e-4)

    def test_bce_pos_weight(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(2)
        ys = rng.randn(5, 2, 2).astype(np.float32)
        labels = (rng.rand(5, 2, 2) > 0.5).astype(np.float32)
        pw = np.array([2.0, 0.5], np.float32)
        got = float(masked_bce_pos_weight(pw)(
            jnp.asarray(ys), jnp.asarray(labels), jnp.asarray([5, 5])))
        ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.from_numpy(pw))(
            torch.from_numpy(ys), torch.from_numpy(labels))
        np.testing.assert_allclose(got, float(ref), rtol=1e-4)

    def test_fk_pose_loss_runs(self, world):
        model, _ = world
        loss = make_fk_pose_loss(model)
        rng = np.random.RandomState(3)
        ys = jnp.asarray(rng.randn(4, 2, 144), jnp.float32)
        labels = jnp.asarray(rng.randn(4, 2, 144), jnp.float32)
        v = float(loss(ys, labels, jnp.asarray([4, 3])))
        assert np.isfinite(v) and v > 0
        assert float(loss(ys, ys, jnp.asarray([4, 3]))) < 1e-8


class TestLoop:
    def test_train_reduces_loss_and_resumes(self, tmp_path):
        rng = np.random.RandomState(0)
        # learnable toy mapping: label = cumulative mean of inputs
        data = [rng.randn(20, 8).astype(np.float32) for _ in range(8)]
        label = [np.cumsum(d, 0).astype(np.float32)[:, :2] / 20 for d in data]
        ds = SeqDataset(data, label, split_size=10)
        params = init_rnn_params(jax.random.PRNGKey(0), 8, 2, 16, 2)
        fwd = make_forward_fn(0.0)

        first_losses = []

        params_out = train(params, fwd, masked_mse, ds, ds, str(tmp_path),
                           num_epoch=8, batch_size=4, learning_rate=1e-2,
                           clip_grad_norm=1.0, log_metrics=True)
        import json
        recs = [json.loads(l) for l in
                open(tmp_path / "metrics.jsonl").read().splitlines()]
        assert min(r["vald_loss"] for r in recs[1:]) < recs[0]["vald_loss"]
        assert os.path.exists(tmp_path / "best_weights.pkl")
        # resume: starts from saved epoch, runs without error
        params2 = train(params_out, fwd, masked_mse, ds, ds, str(tmp_path),
                        num_epoch=9, batch_size=4, learning_rate=1e-2)
        assert params2 is not None

    def test_padded_batches_with_init(self):
        rng = np.random.RandomState(1)
        data = [rng.randn(7, 4).astype(np.float32),
                rng.randn(5, 4).astype(np.float32)]
        label = [rng.randn(7, 3).astype(np.float32),
                 rng.randn(5, 3).astype(np.float32)]
        ds = SeqDataset(data, label, with_init=True)
        xs, ys, lengths, init = next(padded_batches(ds, 2, shuffle=False))
        assert xs.shape == (7, 2, 4)
        assert init.shape == (2, 3)
        np.testing.assert_allclose(init[1], label[1][0])
        assert list(lengths) == [7, 5]


class TestLoopFixes:
    def test_plateau_not_triggered_while_improving(self, tmp_path):
        r"""ReduceLROnPlateau steps per validation like the reference's
        scheduler.step(vald_loss): steadily-improving validation must NOT
        decay the learning rate (the old epoch-sum comparison decayed
        unconditionally)."""
        rng = np.random.RandomState(0)
        data = [rng.randn(20, 8).astype(np.float32) for _ in range(8)]
        label = [np.cumsum(d, 0).astype(np.float32)[:, :2] / 20 for d in data]
        ds = SeqDataset(data, label, split_size=10)
        params = init_rnn_params(jax.random.PRNGKey(0), 8, 2, 16, 2)
        train(params, make_forward_fn(0.0), masked_mse, ds, ds,
              str(tmp_path), num_epoch=6, batch_size=4, learning_rate=1e-2,
              clip_grad_norm=1.0, lr_scheduler_patience=1,
              num_iter_between_vald=2)
        import json
        info = json.load(open(tmp_path / "train_info.json"))
        # on this easily-learnable toy the loss improves most validations;
        # patience=1 under the old epoch-sum bug decayed every 2 epochs
        # (6 epochs -> lr_scale 1e-3); per-validation stepping keeps the
        # scale far higher
        assert info["lr_scale"] > 1e-2

    def test_epoch_hook_called_and_data_refresh_applies(self, tmp_path):
        rng = np.random.RandomState(0)
        data = [rng.randn(10, 8).astype(np.float32) for _ in range(4)]
        label = [d[:, :2].copy() for d in data]
        ds = SeqDataset(data, label)
        params = init_rnn_params(jax.random.PRNGKey(0), 8, 2, 8, 2)
        calls = []

        def hook(epoch):
            calls.append(epoch)
            # mutating the dataset before batches materialize must stick
            ds.data[0] = ds.data[0] + 0.0

        train(params, make_forward_fn(0.0), masked_mse, ds, ds,
              str(tmp_path), num_epoch=3, batch_size=2, learning_rate=1e-2,
              epoch_hook=hook)
        assert calls == [0, 1, 2]
