r"""Batched (vmapped) SMPLify refinement vs the sequential runner."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M
from robustcap_tpu.eval import build_aist_sequences
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
from robustcap_tpu.smplify import refine_sequences_batched, smplify_runner
from robustcap_tpu.smplify.prior import MaxMixturePrior


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data())
    ds = build_fixture_dataset(model, n_seq=2, T=20, n_cam=2, seed=13)
    seqs = build_aist_sequences(ds)
    rng = np.random.RandomState(0)
    results = []
    for s in seqs:
        noise = rng.normal(0, 0.06, (s.length * 24, 3)).astype(np.float32)
        nR = np.asarray(M.axis_angle_to_rotation_matrix(
            jnp.asarray(noise))).reshape(s.length, 24, 3, 3)
        pose0 = np.einsum("tjab,tjbc->tjac", s.pose_gt, nR)
        tran0 = s.tran_gt + rng.normal(0, 0.02, (s.length, 3)
                                       ).astype(np.float32)
        results.append((pose0.astype(np.float32), tran0))
    return model, seqs, results


class TestBatchedSmplify:
    def test_refines_all_sequences(self, world):
        model, seqs, results = world
        prior = MaxMixturePrior("/nonexistent")
        refined = refine_sequences_batched(
            results, seqs, lr=0.001, model=model, prior=prior,
            pad_to_multiple=20, group_size=4)
        assert len(refined) == len(seqs)
        for (p, t), s in zip(refined, seqs):
            assert p.shape == (s.length, 24, 3, 3)
            assert np.isfinite(p).all() and np.isfinite(t).all()
            # rotations stay on the manifold
            rtr = np.einsum("tjab,tjac->tjbc", p, p)
            np.testing.assert_allclose(
                rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-4)

    def test_close_to_sequential_runner(self, world):
        model, seqs, results = world
        prior = MaxMixturePrior("/nonexistent")
        refined = refine_sequences_batched(
            results, seqs[:1], lr=0.001, model=model, prior=prior,
            pad_to_multiple=20, group_size=1)
        pose_seq, tran_seq, _ = smplify_runner(
            results[0][0], results[0][1], seqs[0].j2dc_px, seqs[0].oric,
            batch_size=seqs[0].length, cam_k=seqs[0].cam_K, lr=0.001,
            model=model, prior=prior, pad_to_multiple=20)
        # same optimization on the same data: trajectories agree closely
        ang = np.asarray(M.radian_to_degree(M.angle_between(
            jnp.asarray(refined[0][0].reshape(-1, 3, 3)),
            jnp.asarray(np.asarray(pose_seq).reshape(-1, 3, 3)))))
        assert np.median(ang) < 2.0
        np.testing.assert_allclose(refined[0][1], tran_seq, atol=5e-2)

    def test_gate(self, world):
        model, seqs, results = world
        prior = MaxMixturePrior("/nonexistent")
        refined = refine_sequences_batched(
            results, seqs, lr=0.001, model=model, prior=prior,
            pad_to_multiple=20, loss_threshold=1e-9)
        for (p, t), (p0, t0) in zip(refined, results):
            np.testing.assert_allclose(p, p0, atol=1e-6)
            np.testing.assert_allclose(t, t0, atol=1e-6)
