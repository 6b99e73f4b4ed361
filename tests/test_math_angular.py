import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M


def random_rotations(seed, n):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return np.asarray(M.quaternion_to_rotation_matrix(jnp.asarray(q)))


class TestAxisAngle:
    def test_round_trip(self):
        rng = np.random.RandomState(0)
        a = rng.randn(64, 3) * 1.5
        r = M.axis_angle_to_rotation_matrix(jnp.asarray(a, jnp.float32))
        a2 = M.rotation_matrix_to_axis_angle(r)
        r2 = M.axis_angle_to_rotation_matrix(a2)
        np.testing.assert_allclose(r, r2, atol=1e-4)

    def test_zero_angle_is_identity(self):
        r = M.axis_angle_to_rotation_matrix(jnp.zeros((3, 3)))
        np.testing.assert_allclose(r, np.broadcast_to(np.eye(3), (3, 3, 3)),
                                   atol=1e-6)

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(1)
        a = rng.randn(32, 3)
        ours = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(a)))
        ref = Rotation.from_rotvec(a).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_axis_angle_from_matrix_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        r = random_rotations(2, 32)
        ours = np.asarray(M.rotation_matrix_to_axis_angle(jnp.asarray(r)))
        ref = Rotation.from_matrix(r).as_rotvec()
        # both should have angle in [0, pi]; compare matrices to dodge the
        # axis sign ambiguity at angle ~ pi
        np.testing.assert_allclose(
            Rotation.from_rotvec(ours).as_matrix(), r, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(ours, axis=1),
                                   np.linalg.norm(ref, axis=1), atol=1e-4)

    def test_half_pi_rotation(self):
        a = np.array([[np.pi / 2, 0, 0]])
        r = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(a)))
        expected = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.]])
        np.testing.assert_allclose(r[0], expected, atol=1e-6)


class TestQuaternion:
    def test_product_vs_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(3)
        q1 = rng.randn(16, 4); q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
        q2 = rng.randn(16, 4); q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
        ours = np.asarray(M.quaternion_product(jnp.asarray(q1), jnp.asarray(q2)))
        r = (Rotation.from_quat(q1, scalar_first=True)
             * Rotation.from_quat(q2, scalar_first=True))
        ref = r.as_quat(scalar_first=True)
        sign = np.sign(np.sum(ours * ref, axis=1, keepdims=True))
        np.testing.assert_allclose(ours * sign, ref, atol=1e-5)

    def test_inverse(self):
        rng = np.random.RandomState(4)
        q = rng.randn(8, 4); q /= np.linalg.norm(q, axis=1, keepdims=True)
        prod = M.quaternion_product(jnp.asarray(q),
                                    M.quaternion_inverse(jnp.asarray(q)))
        expected = np.zeros((8, 4)); expected[:, 0] = 1
        np.testing.assert_allclose(prod, expected, atol=1e-5)

    def test_matrix_quaternion_round_trip(self):
        r = random_rotations(5, 64)
        q = M.rotation_matrix_to_quaternion(jnp.asarray(r))
        r2 = M.quaternion_to_rotation_matrix(q)
        np.testing.assert_allclose(r, r2, atol=1e-5)

    def test_quaternion_near_pi(self):
        # near-pi rotations stress the naive trace formula
        a = np.array([[np.pi - 1e-4, 0, 0], [0, np.pi - 1e-4, 0]])
        r = M.axis_angle_to_rotation_matrix(jnp.asarray(a, jnp.float32))
        q = M.rotation_matrix_to_quaternion(r)
        r2 = M.quaternion_to_rotation_matrix(q)
        np.testing.assert_allclose(r, r2, atol=1e-4)

    def test_quaternion_mean(self):
        q = np.array([[1, 0, 0, 0], [-1, 0, 0, 0], [0.999, 0.01, 0, 0]])
        m = np.asarray(M.quaternion_mean(jnp.asarray(q, jnp.float32)))
        assert abs(abs(m[0]) - 1) < 0.01


class TestR6D:
    def test_round_trip(self):
        r = random_rotations(6, 32)
        r6d = M.rotation_matrix_to_r6d(jnp.asarray(r))
        r2 = M.r6d_to_rotation_matrix(r6d)
        np.testing.assert_allclose(r, r2, atol=1e-5)

    def test_layout_is_column_major(self):
        # reference takes the first two columns transposed (angular.py:267)
        r = random_rotations(7, 1)
        r6d = np.asarray(M.rotation_matrix_to_r6d(jnp.asarray(r)))[0]
        np.testing.assert_allclose(r6d[:3], r[0][:, 0], atol=1e-6)
        np.testing.assert_allclose(r6d[3:], r[0][:, 1], atol=1e-6)

    def test_gram_schmidt_on_noisy_input(self):
        rng = np.random.RandomState(8)
        r6d = rng.randn(16, 6)
        r = np.asarray(M.r6d_to_rotation_matrix(jnp.asarray(r6d)))
        rtr = np.einsum("bij,bik->bjk", r, r)
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (16, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), np.ones(16), atol=1e-5)


class TestEuler:
    @pytest.mark.parametrize("seq", ["XYZ", "YXZ", "ZYX", "xyz", "zxy"])
    def test_matches_scipy(self, seq):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(9)
        e = rng.uniform(-np.pi / 2, np.pi / 2, (16, 3))
        ours = np.asarray(M.euler_angle_to_rotation_matrix(jnp.asarray(e), seq))
        ref = Rotation.from_euler(seq, e).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAngleBetween:
    def test_known_angle(self):
        a = np.array([[0.3, 0, 0]])
        b = np.array([[0.8, 0, 0]])
        r1 = M.axis_angle_to_rotation_matrix(jnp.asarray(a))
        r2 = M.axis_angle_to_rotation_matrix(jnp.asarray(b))
        ang = np.asarray(M.angle_between(r1, r2))
        np.testing.assert_allclose(ang, [0.5], atol=1e-5)


class TestSvdRotate:
    def test_recovers_rotation(self):
        rng = np.random.RandomState(10)
        src = rng.randn(4, 20, 3)
        R = random_rotations(11, 4)
        tgt = np.einsum("bij,bnj->bni", R, src)
        rot, t, s, transformed = M.svd_rotate(jnp.asarray(src), jnp.asarray(tgt))
        np.testing.assert_allclose(rot, R, atol=1e-4)
        np.testing.assert_allclose(transformed, tgt, atol=1e-4)

    def test_full_similarity(self):
        rng = np.random.RandomState(12)
        src = rng.randn(4, 20, 3)
        R = random_rotations(13, 4)
        scale = rng.uniform(0.5, 2.0, 4)
        trans = rng.randn(4, 3)
        tgt = scale[:, None, None] * np.einsum("bij,bnj->bni", R, src) + trans[:, None]
        _, _, s, transformed = M.svd_rotate(
            jnp.asarray(src), jnp.asarray(tgt), calc_R=True, calc_t=True, calc_s=True)
        np.testing.assert_allclose(s, scale, rtol=1e-4)
        np.testing.assert_allclose(transformed, tgt, atol=1e-3)


class TestRandomRotations:
    def test_constrained_generator_ranges(self):
        key = jax.random.PRNGKey(0)
        r = M.generate_random_rotation_matrix_constrained(
            key, n=64, y=(-180, 180), p=(-30, 30), r=(-5, 5))
        rtr = np.einsum("bij,bik->bjk", np.asarray(r), np.asarray(r))
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (64, 3, 3)),
                                   atol=1e-5)

    def test_normalize_angle(self):
        q = np.array([2 * np.pi + 0.5, -2 * np.pi - 0.5, 0.5, 4.0])
        out = np.asarray(M.normalize_angle(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(out, [0.5, -0.5, 0.5, 4.0 - 2 * np.pi],
                                   atol=1e-5)
