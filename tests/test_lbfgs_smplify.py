import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robustcap_tpu.ops.lbfgs import lbfgs_minimize


class TestLBFGS:
    def test_quadratic(self):
        A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
        b = jnp.asarray([1.0, -2.0, 3.0])

        def f(x):
            return 0.5 * x @ A @ x - b @ x

        x, fval, g = lbfgs_minimize(f, jnp.zeros(3), max_iter=50, lr=1.0)
        expected = np.linalg.solve(np.asarray(A), np.asarray(b))
        np.testing.assert_allclose(x, expected, atol=1e-3)

    def test_rosenbrock(self):
        def f(x):
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        x0 = jnp.asarray([-1.2, 1.0, -0.5, 0.8])
        x, fval, _ = lbfgs_minimize(f, x0, max_iter=200, lr=1.0,
                                    history_size=20)
        assert float(fval) < 1e-3
        np.testing.assert_allclose(x, 1.0, atol=0.05)

    def test_matches_torch_lbfgs_quality(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        A_np = rng.randn(8, 8).astype(np.float32)
        A_np = A_np @ A_np.T + 0.5 * np.eye(8, dtype=np.float32)
        b_np = rng.randn(8).astype(np.float32)

        def f(x):
            return 0.5 * x @ jnp.asarray(A_np) @ x - jnp.asarray(b_np) @ x \
                + 0.1 * jnp.sum(jnp.tanh(x) ** 2)

        x_ours, f_ours, _ = lbfgs_minimize(f, jnp.zeros(8), max_iter=20,
                                           lr=0.001)

        xt = torch.zeros(8, requires_grad=True)
        opt = torch.optim.LBFGS([xt], max_iter=20, lr=0.001,
                                line_search_fn="strong_wolfe")

        def closure():
            opt.zero_grad()
            loss = (0.5 * xt @ torch.from_numpy(A_np) @ xt
                    - torch.from_numpy(b_np) @ xt
                    + 0.1 * torch.sum(torch.tanh(xt) ** 2))
            loss.backward()
            return loss

        opt.step(closure)
        f_torch = float(closure())
        # both should make comparable progress under the same budget
        assert float(f_ours) <= f_torch + 0.05 * abs(f_torch) + 1e-3

    def test_jittable(self):
        def f(x):
            return jnp.sum((x - 2.0) ** 2)

        run = jax.jit(lambda x0: lbfgs_minimize(f, x0, max_iter=10)[0])
        np.testing.assert_allclose(run(jnp.zeros(4)), 2.0, atol=1e-4)


class TestSMPLify:
    @pytest.fixture(scope="class")
    def world(self):
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        from robustcap_tpu.preprocess import build_fixture_dataset
        from robustcap_tpu.eval import build_aist_sequences
        model = ParametricModel(data=synthetic_smpl_data())
        ds = build_fixture_dataset(model, n_seq=1, T=24, n_cam=1, seed=5)
        seqs = build_aist_sequences(ds, num_cameras=1)
        return model, seqs[0]

    def test_refinement_reduces_reprojection(self, world):
        from robustcap_tpu.smplify import smplify_runner
        model, s = world
        # perturb the ground truth pose; smplify should pull it back
        rng = np.random.RandomState(0)
        import robustcap_tpu.math as M
        noise = rng.normal(0, 0.08, (s.length * 24, 3)).astype(np.float32)
        noise_R = np.asarray(M.axis_angle_to_rotation_matrix(
            jnp.asarray(noise))).reshape(s.length, 24, 3, 3)
        pose0 = np.einsum("tjab,tjbc->tjac", s.pose_gt, noise_R)
        tran0 = s.tran_gt + rng.normal(0, 0.03, (s.length, 3)).astype(np.float32)

        pose_r, tran_r, update = smplify_runner(
            pose0, tran0, s.j2dc_px, s.oric, batch_size=s.length,
            cam_k=s.cam_K, lr=0.001, use_lbfgs=True, opt_steps=1,
            model=model, pad_to_multiple=8)
        assert pose_r.shape == (s.length, 24, 3, 3)
        assert update is not None
        # reprojection improved on most frames
        assert update.mean() > 0.5

    def test_adam_branch_runs_adam(self, world):
        r"""use_lbfgs=False runs the reference's alternate plain-Adam loop
        (temporal_smplify.py:170-186) — previously this silently ran LBFGS
        with the Adam learning rate."""
        from robustcap_tpu.smplify import smplify_runner
        model, s = world
        rng = np.random.RandomState(1)
        import robustcap_tpu.math as M
        noise = rng.normal(0, 0.08, (s.length * 24, 3)).astype(np.float32)
        noise_R = np.asarray(M.axis_angle_to_rotation_matrix(
            jnp.asarray(noise))).reshape(s.length, 24, 3, 3)
        pose0 = np.einsum("tjab,tjbc->tjac", s.pose_gt, noise_R)
        tran0 = s.tran_gt + rng.normal(0, 0.03,
                                       (s.length, 3)).astype(np.float32)
        pose_a, tran_a, update = smplify_runner(
            pose0, tran0, s.j2dc_px, s.oric, batch_size=s.length,
            cam_k=s.cam_K, lr=0.01, use_lbfgs=False, opt_steps=10,
            model=model, pad_to_multiple=8)
        assert pose_a.shape == (s.length, 24, 3, 3)
        assert np.isfinite(pose_a).all() and np.isfinite(tran_a).all()
        # a genuinely different optimizer ran: both branches move the
        # estimate, to materially different points
        pose_l, _, _ = smplify_runner(
            pose0, tran0, s.j2dc_px, s.oric, batch_size=s.length,
            cam_k=s.cam_K, lr=0.001, use_lbfgs=True, opt_steps=1,
            model=model, pad_to_multiple=8)
        moved_a = np.abs(pose_a - pose0).max()
        moved_l = np.abs(pose_l - pose0).max()
        assert moved_a > 0 and moved_l > 0
        assert np.abs(pose_a - pose_l).max() > 0.01

    def test_gate_skips_when_threshold_exceeded(self, world):
        # note: with the reference weights the GMoF reprojection term
        # saturates at sigma^2 per coordinate, so the default 20000 gate
        # effectively never triggers (run.py:28); exercise the gate with a
        # tiny threshold instead.
        from robustcap_tpu.smplify import smplify_runner
        model, s = world
        tran0 = s.tran_gt + 0.5
        pose_r, tran_r, update = smplify_runner(
            s.pose_gt, tran0, s.j2dc_px, s.oric, batch_size=s.length,
            cam_k=s.cam_K, lr=0.001, model=model, pad_to_multiple=8,
            loss_threshold=1e-6)
        assert update is None
        np.testing.assert_allclose(tran_r, tran0, atol=1e-6)

    def test_prior_shapes(self):
        from robustcap_tpu.smplify import MaxMixturePrior, angle_prior
        prior = MaxMixturePrior(prior_folder="/nonexistent")
        pose = jnp.asarray(np.random.RandomState(1).randn(5, 69), jnp.float32)
        nll = prior(pose)
        assert nll.shape == (5,)
        # rest pose should be more likely than an extreme pose
        assert float(prior(jnp.zeros((1, 69)))[0]) < float(
            prior(10 * jnp.ones((1, 69)))[0])
        assert angle_prior(pose).shape == (5, 4)
