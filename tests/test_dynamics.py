r"""Autodiff-Lagrangian rigid-body dynamics sanity/physics tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from robustcap_tpu.dynamics import RigidBodyDynamics
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


@pytest.fixture(scope="module")
def dyn():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=200))
    return RigidBodyDynamics(model, total_mass=70.0)


class TestDynamics:
    def test_mass_matrix_spd(self, dyn):
        q = jnp.zeros(dyn.num_q)
        Mm = np.asarray(dyn.mass_matrix(q))
        np.testing.assert_allclose(Mm, Mm.T, atol=1e-4)
        # root translation block = total mass * I
        np.testing.assert_allclose(Mm[:3, :3], 70.0 * np.eye(3), atol=1e-3)
        eig = np.linalg.eigvalsh(Mm + 1e-6 * np.eye(dyn.num_q))
        assert eig.min() > 0

    def test_free_fall(self, dyn):
        # zero torques -> root vertical acceleration ~ -g
        q = jnp.zeros(dyn.num_q)
        qdot = jnp.zeros(dyn.num_q)
        qddot = dyn.forward_dynamics(q, qdot, jnp.zeros(dyn.num_q))
        assert abs(float(qddot[1]) + 9.81) < 0.5

    def test_inverse_forward_consistency(self, dyn):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.normal(0, 0.1, dyn.num_q), jnp.float32)
        qdot = jnp.asarray(rng.normal(0, 0.1, dyn.num_q), jnp.float32)
        qddot = jnp.asarray(rng.normal(0, 0.1, dyn.num_q), jnp.float32)
        tau = dyn.inverse_dynamics(q, qdot, qddot)
        qddot2 = dyn.forward_dynamics(q, qdot, tau)
        np.testing.assert_allclose(qddot2, qddot, atol=5e-2)

    def test_com_and_jacobian(self, dyn):
        q = jnp.zeros(dyn.num_q)
        c = np.asarray(dyn.com(q))
        assert np.isfinite(c).all()
        J = np.asarray(dyn.point_jacobian(q, 0))
        assert J.shape == (3, dyn.num_q)
        # root joint moves 1:1 with root translation
        np.testing.assert_allclose(J[:, :3], np.eye(3), atol=1e-5)

    def test_zmp_static(self, dyn):
        # static standing: ZMP is under the CoM
        q = jnp.zeros(dyn.num_q)
        zmp = np.asarray(dyn.zmp(q, jnp.zeros(dyn.num_q),
                                 jnp.zeros(dyn.num_q)))
        com = np.asarray(dyn.com(q))
        np.testing.assert_allclose(zmp[[0, 2]], com[[0, 2]], atol=1e-4)
