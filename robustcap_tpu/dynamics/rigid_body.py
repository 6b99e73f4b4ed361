r"""Articulated rigid-body dynamics via automatic differentiation.

Rebuild of the reference's RBDL wrapper surface
(``articulate/utils/rbdl/model.py:14-265``: forward/inverse dynamics, mass
matrix, point Jacobians, CoM, ZMP) — but TPU-native: instead of binding a
C++ dynamics library, the equations of motion are derived from the kinetic
energy by ``jax.grad``/``jax.jvp`` (Lagrangian mechanics), so everything is
jittable, batched, and differentiable end-to-end.

Generalized coordinates: ``q = [root_tran (3) | pose axis-angle (24*3)]``.
Bodies are per-bone rigid segments with mass proportional to bone length and
rod inertia about the bone center.

  M(q)          = d^2 T / d qdot^2            (CRBA equivalent)
  tau_id        = M qddot + c(q, qdot) - g(q) (RNEA equivalent)
  qddot_fd      = M^{-1} (tau + g - c)        (forward dynamics)

with the bias c from the classic identity
  c = d/dt (dT/dqdot) - dT/dq, evaluated with jvp's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as M
from ..smpl.model import ParametricModel

__all__ = ["RigidBodyDynamics"]

GRAVITY = jnp.asarray([0.0, -9.81, 0.0])


class RigidBodyDynamics:
    r"""Dynamics quantities for a parametric body model."""

    def __init__(self, model: ParametricModel, total_mass: float = 70.0):
        self.model = model
        j0, _ = model.get_zero_pose_joint_and_vertex()
        j0 = np.asarray(j0)
        parent = model.tree.parent
        bone_len = np.array(
            [0.1] + [np.linalg.norm(j0[i] - j0[parent[i]]) + 1e-3
                     for i in range(1, len(parent))])
        mass = bone_len / bone_len.sum() * total_mass
        self.mass = jnp.asarray(mass, jnp.float32)         # [J]
        self.bone_len = jnp.asarray(bone_len, jnp.float32)  # [J]
        self.num_q = 3 + model.num_joints * 3

    # -- kinematics helpers --------------------------------------------------

    def _fk_points(self, q):
        r"""Body COM positions (bone midpoints) and orientations from q."""
        tran = q[:3]
        pose = M.axis_angle_to_rotation_matrix(q[3:].reshape(-1, 3))
        R_glb, p_glb = self.model.forward_kinematics(pose[None])
        p_glb = p_glb[0] + tran
        parent = jnp.asarray(self.model.tree.parent_clamped)
        com = 0.5 * (p_glb + p_glb[parent])
        return com, R_glb[0], p_glb

    def _kinetic_energy(self, q, qdot):
        r"""T = 1/2 sum_b m_b |v_com,b|^2 + rotational part (rod inertia)."""
        def com_fn(qq):
            return self._fk_points(qq)[0]

        _, v_com = jax.jvp(com_fn, (q,), (qdot,))
        trans_T = 0.5 * jnp.sum(self.mass[:, None] * v_com ** 2)

        def rot_fn(qq):
            return self._fk_points(qq)[1]

        R, dR = jax.jvp(rot_fn, (q,), (qdot,))
        # body angular velocity: [w]_x = R^T dR; rod inertia ~ m l^2 / 12
        omega_x = jnp.swapaxes(R, -1, -2) @ dR
        w2 = (omega_x[..., 0, 1] ** 2 + omega_x[..., 0, 2] ** 2
              + omega_x[..., 1, 2] ** 2)
        inertia = self.mass * self.bone_len ** 2 / 12.0
        return trans_T + 0.5 * jnp.sum(inertia * w2)

    def _potential_energy(self, q):
        com, _, _ = self._fk_points(q)
        return -jnp.sum(self.mass[:, None] * com * GRAVITY[None])

    # -- public API (RBDLModel surface) --------------------------------------

    @partial(jax.jit, static_argnums=0)
    def mass_matrix(self, q):
        r"""Joint-space inertia matrix M(q) [nq, nq] (model.py mass matrix)."""
        zero = jnp.zeros(self.num_q)
        return jax.hessian(lambda qd: self._kinetic_energy(q, qd))(zero)

    @partial(jax.jit, static_argnums=0)
    def bias_force(self, q, qdot):
        r"""Coriolis/centrifugal + gravity generalized forces h(q, qdot)."""
        def dT_dqdot(qq, qd):
            return jax.grad(self._kinetic_energy, argnums=1)(qq, qd)

        # d/dt (dT/dqdot) along the trajectory (qdot, qddot=0) minus dT/dq
        _, dt_term = jax.jvp(lambda qq: dT_dqdot(qq, qdot), (q,), (qdot,))
        dq_term = jax.grad(self._kinetic_energy, argnums=0)(q, qdot)
        g_term = jax.grad(self._potential_energy)(q)
        return dt_term - dq_term + g_term

    @partial(jax.jit, static_argnums=0)
    def inverse_dynamics(self, q, qdot, qddot):
        r"""tau = M qddot + h (RBDLModel inverse_dynamics)."""
        return self.mass_matrix(q) @ qddot + self.bias_force(q, qdot)

    @partial(jax.jit, static_argnums=0)
    def forward_dynamics(self, q, qdot, tau):
        r"""qddot = M^{-1} (tau - h) (RBDLModel forward_dynamics)."""
        Mm = self.mass_matrix(q) + 1e-6 * jnp.eye(self.num_q)
        return jnp.linalg.solve(Mm, tau - self.bias_force(q, qdot))

    @partial(jax.jit, static_argnums=0)
    def point_jacobian(self, q, joint_id: int):
        r"""d p_joint / d q [3, nq] (RBDLModel jacobian)."""
        return jax.jacobian(lambda qq: self._fk_points(qq)[2][joint_id])(q)

    @partial(jax.jit, static_argnums=0)
    def com(self, q):
        r"""Whole-body center of mass [3] (RBDLModel CoM)."""
        c, _, _ = self._fk_points(q)
        return jnp.sum(self.mass[:, None] * c, 0) / jnp.sum(self.mass)

    @partial(jax.jit, static_argnums=0)
    def zmp(self, q, qdot, qddot, ground_height: float = 0.0):
        r"""Zero-moment point on the ground plane from CoM dynamics
        (RBDLModel ZMP)."""
        def com_fn(qq):
            return self.com(qq)

        c, v = jax.jvp(com_fn, (q,), (qdot,))
        _, a1 = jax.jvp(lambda qq: jax.jvp(com_fn, (qq,), (qdot,))[1],
                        (q,), (qdot,))
        _, a2 = jax.jvp(com_fn, (q,), (qddot,))
        a = a1 + a2
        g = -GRAVITY[1]
        denom = a[1] + g
        x = c[0] - (c[1] - ground_height) * a[0] / denom
        z = c[2] - (c[1] - ground_height) * a[2] / denom
        return jnp.asarray([x, ground_height, z])
