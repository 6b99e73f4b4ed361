import numpy as np
import jax.numpy as jnp

import robustcap_tpu.math as M

# SMPL kinematic tree (24 joints) — the main tree the framework runs on
SMPL_PARENT = [None, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
               16, 17, 18, 19, 20, 21]


def random_rotations(seed, shape):
    rng = np.random.RandomState(seed)
    q = rng.randn(*shape, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(
        M.quaternion_to_rotation_matrix(jnp.asarray(q))).reshape(*shape, 3, 3)


def fk_r_bruteforce(R_local, parent):
    out = np.zeros_like(R_local)
    out[:, 0] = R_local[:, 0]
    for i in range(1, len(parent)):
        out[:, i] = out[:, parent[i]] @ R_local[:, i]
    return out


def bone_to_joint_bruteforce(bone, parent):
    out = np.zeros_like(bone)
    out[:, 0] = bone[:, 0]
    for i in range(1, len(parent)):
        out[:, i] = out[:, parent[i]] + bone[:, i]
    return out


class TestTreeOps:
    def test_forward_kinematics_R(self):
        R = random_rotations(0, (4, 24))
        ours = np.asarray(M.forward_kinematics_R(jnp.asarray(R), SMPL_PARENT))
        ref = fk_r_bruteforce(R, SMPL_PARENT)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_fk_ik_round_trip(self):
        R = random_rotations(1, (4, 24))
        glb = M.forward_kinematics_R(jnp.asarray(R), SMPL_PARENT)
        loc = M.inverse_kinematics_R(glb, SMPL_PARENT)
        np.testing.assert_allclose(loc, R, atol=1e-5)

    def test_bone_joint_round_trip(self):
        rng = np.random.RandomState(2)
        bone = rng.randn(4, 24, 3).astype(np.float32)
        joint = M.bone_vector_to_joint_position(jnp.asarray(bone), SMPL_PARENT)
        ref = bone_to_joint_bruteforce(bone, [0] + SMPL_PARENT[1:])
        np.testing.assert_allclose(joint, ref, atol=1e-5)
        bone2 = M.joint_position_to_bone_vector(joint, SMPL_PARENT)
        np.testing.assert_allclose(bone2, bone, atol=1e-5)

    def test_forward_kinematics_T(self):
        R = random_rotations(3, (2, 24))
        rng = np.random.RandomState(4)
        p = rng.randn(2, 24, 3).astype(np.float32)
        T = M.transformation_matrix(jnp.asarray(R), jnp.asarray(p))
        Tg = M.forward_kinematics_T(T, SMPL_PARENT)
        Tl = M.inverse_kinematics_T(Tg, SMPL_PARENT)
        np.testing.assert_allclose(Tl, T, atol=1e-4)
        # (R, p) FK path must agree with the T FK path
        Rg, pg = M.forward_kinematics(jnp.asarray(R), jnp.asarray(p), SMPL_PARENT)
        Rg2, pg2 = M.decode_transformation_matrix(Tg)
        np.testing.assert_allclose(Rg, Rg2, atol=1e-4)
        np.testing.assert_allclose(pg, pg2, atol=1e-4)


class TestSE3:
    def test_inverse_transformation(self):
        R = random_rotations(5, (8,))
        rng = np.random.RandomState(6)
        p = rng.randn(8, 3).astype(np.float32)
        T = M.transformation_matrix(jnp.asarray(R), jnp.asarray(p))
        Tinv = M.inverse_transformation_matrix(T)
        prod = np.asarray(T @ Tinv)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)),
                                   atol=1e-5)

    def test_transformation_matrix_layout(self):
        R = jnp.eye(3)[None]
        p = jnp.asarray([[1.0, 2.0, 3.0]])
        T = np.asarray(M.transformation_matrix(R, p))[0]
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(T[3], [0, 0, 0, 1])
