r"""Metric suite: FullMotionEvaluator battery + classification metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M
from robustcap_tpu.eval import (BinaryClassificationErrorEvaluator,
                                FullMotionEvaluator,
                                MeanPerJointErrorEvaluator,
                                MeshErrorEvaluator, PositionErrorEvaluator,
                                RotationErrorEvaluator)
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


@pytest.fixture(scope="module")
def model():
    return ParametricModel(data=synthetic_smpl_data(num_verts=300))


def random_pose(seed, b):
    rng = np.random.RandomState(seed)
    aa = rng.normal(0, 0.2, (b * 24, 3)).astype(np.float32)
    return np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(b, 24, 3, 3)


class TestFullMotion:
    def test_identity_is_zero(self, model):
        ev = FullMotionEvaluator(model=model, fps=4)
        pose = random_pose(0, 8)
        tran = np.random.RandomState(1).randn(8, 3).astype(np.float32)
        out = np.asarray(ev(pose, pose, tran_p=tran, tran_t=tran))
        assert out.shape == (11, 2)
        # error rows vanish on identical motions
        for row in (0, 1, 2, 3, 6, 10):
            assert abs(out[row, 0]) < 1e-3
        # jerk rows equal each other (same motion)
        np.testing.assert_allclose(out[4], out[5], rtol=1e-4)

    def test_joint_mask_rows(self, model):
        ev = FullMotionEvaluator(model=model, fps=4, joint_mask=[4, 5])
        p = random_pose(2, 8)
        t = random_pose(3, 8)
        out = np.asarray(ev(p, t))
        assert (out[7:10, 0] > 0).all()

    def test_rotation_error_known(self, model):
        ev = RotationErrorEvaluator()
        a = M.axis_angle_to_rotation_matrix(jnp.asarray([[0.5, 0, 0]]))
        b = M.axis_angle_to_rotation_matrix(jnp.asarray([[0.9, 0, 0]]))
        np.testing.assert_allclose(float(ev(a, b)), np.degrees(0.4),
                                   atol=1e-3)

    def test_mean_per_joint_and_mesh(self, model):
        p = random_pose(4, 4)
        t = random_pose(5, 4)
        mpje = np.asarray(MeanPerJointErrorEvaluator(model=model)(p, t))
        assert mpje.shape == (3,) and (mpje > 0).all()
        me = float(MeshErrorEvaluator(model=model)(p, t))
        assert me > 0
        # Procrustes alignment (-2: R/t) can only shrink position error
        mpje_aligned = np.asarray(
            MeanPerJointErrorEvaluator(model=model, align_joint=-2)(p, t))
        assert mpje_aligned[0] <= mpje[0] + 1e-5


class TestClassification:
    def test_precision_recall_f1(self):
        p = np.array([0.9, 0.8, 0.2, 0.6, 0.1, 0.3])
        t = np.array([1, 0, 0, 1, 1, 0.0])
        out = np.asarray(BinaryClassificationErrorEvaluator(
            is_after_sigmoid=True)(p, t))
        # predictions: 1,1,0,1,0,0 -> tp=2 fp=1 fn=1 tn=2
        np.testing.assert_allclose(out[0, 0], 2 / 3, atol=1e-6)  # precision+
        np.testing.assert_allclose(out[1, 0], 2 / 3, atol=1e-6)  # recall+
        np.testing.assert_allclose(out[2, 0], 2 / 3, atol=1e-6)  # f1+

    def test_position_error(self):
        ev = PositionErrorEvaluator()
        a = np.zeros((4, 3))
        b = np.full((4, 3), 1.0)
        np.testing.assert_allclose(float(ev(a, b)), np.sqrt(3), atol=1e-6)
