r"""Temporal filters and the reference-style compat namespace."""

import numpy as np
import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.utils import (KalmanFilter, LowPassFilter,
                                 LowPassFilterRotation)


class TestKalman:
    def test_tracks_constant_velocity(self):
        dt = 0.1
        F = np.array([[1, dt], [0, 1]])
        H = np.array([[1.0, 0]])
        B = np.zeros((2, 1))
        kf = KalmanFilter(F, H, B, Q=1e-4 * np.eye(2), R=0.04 * np.eye(1),
                          x0=np.array([0.0, 0.0]))
        rng = np.random.RandomState(0)
        true_v = 2.0
        for t in range(1, 80):
            kf.predict(np.zeros(1))
            kf.correct(np.array([true_v * t * dt + rng.normal(0, 0.2)]))
        x = kf.x.ravel()
        assert abs(x[1] - true_v) < 0.3
        assert abs(x[0] - true_v * 79 * dt) < 0.3


class TestLowPass:
    def test_scalar_smoothing(self):
        lp = LowPassFilter(a=0.5)
        assert lp(np.asarray([2.0]))[0] == 2.0
        assert lp(np.asarray([4.0]))[0] == 3.0

    def test_rotation_smoothing_stays_on_manifold(self):
        lp = LowPassFilterRotation(a=0.3)
        rng = np.random.RandomState(1)
        for _ in range(5):
            aa = rng.normal(0, 0.3, (2, 3)).astype(np.float32)
            R = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                           ).reshape(2, 3, 3)
            out = lp(R)
        rtr = np.einsum("nij,nik->njk", out, out)
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (2, 3, 3)),
                                   atol=1e-4)

    def test_rotation_converges_to_constant_input(self):
        lp = LowPassFilterRotation(a=0.5)
        R = np.asarray(M.axis_angle_to_rotation_matrix(
            jnp.asarray([[0.7, 0.1, -0.2]])))
        out = R * 0
        lp(np.broadcast_to(np.eye(3, dtype=np.float32), (1, 3, 3)))
        for _ in range(30):
            out = lp(R)
        ang = float(M.angle_between(jnp.asarray(out), jnp.asarray(R))[0])
        assert ang < 1e-2


class TestCompatNamespace:
    def test_reference_style_usage(self):
        from robustcap_tpu import compat as art
        R = art.math.axis_angle_to_rotation_matrix(jnp.asarray([[0.1, 0, 0]]))
        assert R.shape == (1, 3, 3)
        ev = art.PositionErrorEvaluator()
        assert float(ev(np.zeros((2, 3)), np.zeros((2, 3)))) == 0.0
        assert art.SMPLJoint.LELBOW.value == 18
        from robustcap_tpu.smpl import synthetic_smpl_data
        body = art.ParametricModel(data=synthetic_smpl_data(num_verts=100))
        assert body.num_joints == 24
