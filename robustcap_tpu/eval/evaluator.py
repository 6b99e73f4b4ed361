r"""Motion metric suite (pure JAX, batched on device).

TPU-native rebuild of the reference's ``articulate/evaluator.py``: the same
evaluator family and return conventions, with all per-frame loops replaced by
batched XLA computations (pose FK for the whole sequence in one call, batched
``angle_between``, batched SVD alignment).

Reference parity map:
  BinaryConfusionMatrixEvaluator      -> evaluator.py:33
  BinaryClassificationErrorEvaluator  -> evaluator.py:64
  PositionErrorEvaluator              -> evaluator.py:100
  RotationErrorEvaluator              -> evaluator.py:132
  PerJointErrorEvaluator              -> evaluator.py:155
  MeanPerJointErrorEvaluator          -> evaluator.py:218
  MeshErrorEvaluator                  -> evaluator.py:256
  FullMotionEvaluator                 -> evaluator.py:317 ([11, 2] mean/std)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import math as M
from ..math.angular import RotationRepresentation, to_rotation_matrix
from ..smpl.model import ParametricModel

__all__ = [
    "BinaryConfusionMatrixEvaluator", "BinaryClassificationErrorEvaluator",
    "PositionErrorEvaluator", "RotationErrorEvaluator",
    "PerJointErrorEvaluator", "MeanPerJointErrorEvaluator",
    "MeshErrorEvaluator", "FullMotionEvaluator",
]


class BinaryConfusionMatrixEvaluator:
    r"""2x2 confusion matrix, entry (i, j) = count of class-i classified as j."""

    def __init__(self, is_after_sigmoid: bool = False):
        self.is_after_sigmoid = is_after_sigmoid

    def __call__(self, p, t):
        p = jnp.asarray(p)
        t = jnp.asarray(t)
        pred = (p > 0.5) if self.is_after_sigmoid else (p > 0)
        pos = t == 0  # positive class encoded as 0, matching the reference
        tp = jnp.sum((pred == 0) & pos)
        fn = jnp.sum((pred != 0) & pos)
        fp = jnp.sum((pred == 0) & ~pos)
        tn = jnp.sum((pred != 0) & ~pos)
        return jnp.asarray([[tp, fn], [fp, tn]])


class BinaryClassificationErrorEvaluator:
    r"""Precision/recall/F1 for positive(1-labelled) and negative samples,
    [3, 2] (evaluator.py:76-97)."""

    def __init__(self, is_after_sigmoid: bool = False):
        self.is_after_sigmoid = is_after_sigmoid

    def __call__(self, p, t):
        p = jnp.asarray(p)
        t = jnp.asarray(t)
        pred = (p > 0.5) if self.is_after_sigmoid else (p > 0)
        pred = pred.astype(jnp.float32)
        tp = jnp.sum((pred == 1) & (t == 1)).astype(jnp.float32)
        fn = jnp.sum((pred == 0) & (t == 1)).astype(jnp.float32)
        fp = jnp.sum((pred == 1) & (t == 0)).astype(jnp.float32)
        tn = jnp.sum((pred == 0) & (t == 0)).astype(jnp.float32)
        prec_p = tp / (tp + fp)
        rec_p = tp / (tp + fn)
        f1_p = 2 / (1 / prec_p + 1 / rec_p)
        prec_n = tn / (tn + fn)
        rec_n = tn / (tn + fp)
        f1_n = 2 / (1 / prec_n + 1 / rec_n)
        return jnp.asarray([[prec_p, prec_n], [rec_p, rec_n], [f1_p, f1_n]])


class PositionErrorEvaluator:
    r"""Mean p-norm distance between point sets (evaluator.py:100-129)."""

    def __init__(self, dimension: int = 3, p: int = 2):
        self.dimension = dimension
        self.p = p

    def __call__(self, pred, true):
        d = (jnp.asarray(pred).reshape(-1, self.dimension)
             - jnp.asarray(true).reshape(-1, self.dimension))
        return jnp.mean(jnp.linalg.norm(d, ord=self.p, axis=1))


class RotationErrorEvaluator:
    r"""Mean angle (degrees) between rotation sets (evaluator.py:132-152)."""

    def __init__(self, rep=RotationRepresentation.ROTATION_MATRIX):
        self.rep = rep

    def __call__(self, p, t):
        return M.radian_to_degree(M.angle_between(p, t, self.rep).mean())


class _BasePoseEvaluator:
    def __init__(self, official_model_file=None,
                 rep=RotationRepresentation.ROTATION_MATRIX,
                 use_pose_blendshape=False, model: ParametricModel = None):
        self.model = model or ParametricModel(
            official_model_file, use_pose_blendshape=use_pose_blendshape)
        self.rep = rep

    def _pose(self, pose):
        return to_rotation_matrix(jnp.asarray(pose), self.rep).reshape(
            jnp.asarray(pose).shape[0], -1, 3, 3)


def _aligned(points_p, points_t, joint_p, joint_t, align_joint: int):
    r"""Alignment modes shared by PJE/Mesh evaluators (evaluator.py:195-209):
    align_joint >= 0 aligns that joint's position; -1..-5 select R/t/s
    subsets of a Procrustes alignment."""
    if align_joint >= 0:
        offset = (joint_t[:, align_joint] - joint_p[:, align_joint])[:, None]
        return points_p + offset
    flags = {-1: (True, True, True), -2: (True, True, False),
             -3: (False, True, True), -4: (False, True, False),
             -5: (False, False, True)}[align_joint]
    calc_R, calc_t, calc_s = flags
    return M.svd_rotate(points_p, points_t, calc_R=calc_R, calc_t=calc_t,
                        calc_s=calc_s)[3]


class PerJointErrorEvaluator(_BasePoseEvaluator):
    r"""Per-joint position + local/global rotation errors, [3, J]
    (evaluator.py:155-215)."""

    def __init__(self, official_model_file=None, align_joint=0,
                 rep=RotationRepresentation.ROTATION_MATRIX, model=None):
        super().__init__(official_model_file, rep, model=model)
        self.align_joint = (align_joint if isinstance(align_joint, int)
                            else align_joint.value)

    def __call__(self, pose_p, pose_t):
        pose_p = self._pose(pose_p)
        pose_t = self._pose(pose_t)
        glb_p, joint_p = self.model.forward_kinematics(pose_p)
        glb_t, joint_t = self.model.forward_kinematics(pose_t)
        joint_aligned = _aligned(joint_p, joint_t, joint_p, joint_t,
                                 self.align_joint)
        B = pose_p.shape[0]
        pos_err = jnp.linalg.norm(joint_aligned - joint_t, axis=2).mean(axis=0)
        lae = M.angle_between(pose_p, pose_t).reshape(B, -1).mean(axis=0)
        gae = M.angle_between(glb_p, glb_t).reshape(B, -1).mean(axis=0)
        return jnp.stack((pos_err, M.radian_to_degree(lae),
                          M.radian_to_degree(gae)))


class MeanPerJointErrorEvaluator(PerJointErrorEvaluator):
    r"""Mean over joints of PerJointErrorEvaluator, [3]
    (evaluator.py:218-253)."""

    def __call__(self, pose_p, pose_t):
        return super().__call__(pose_p, pose_t).mean(axis=1)


class MeshErrorEvaluator(_BasePoseEvaluator):
    r"""Mean mesh vertex position error (evaluator.py:256-314)."""

    def __init__(self, official_model_file=None, align_joint=0,
                 rep=RotationRepresentation.ROTATION_MATRIX,
                 use_pose_blendshape=False, model=None):
        super().__init__(official_model_file, rep, use_pose_blendshape, model)
        self.align_joint = (align_joint if isinstance(align_joint, int)
                            else align_joint.value)

    def __call__(self, pose_p, pose_t, shape_p=None, shape_t=None):
        pose_p = self._pose(pose_p)
        pose_t = self._pose(pose_t)
        _, joint_p, mesh_p = self.model.forward_kinematics(
            pose_p, shape_p, calc_mesh=True)
        _, joint_t, mesh_t = self.model.forward_kinematics(
            pose_t, shape_t, calc_mesh=True)
        mesh_aligned = _aligned(mesh_p, mesh_t, joint_p, joint_t,
                                self.align_joint)
        return jnp.linalg.norm(mesh_aligned - mesh_t, axis=2).mean()


class FullMotionEvaluator(_BasePoseEvaluator):
    r"""Full-motion metric battery, [11, 2] mean/std (evaluator.py:317-394):

      0 joint position error    1 vertex error       2 local angle error
      3 global angle error      4 predicted jerk     5 true jerk
      6 1-s translation drift   7-9 masked variants  10 tracking error
    """

    def __init__(self, official_model_file=None, align_joint=0,
                 rep=RotationRepresentation.ROTATION_MATRIX,
                 use_pose_blendshape=False, fps: int = 60,
                 joint_mask: Optional[list] = None, model=None):
        super().__init__(official_model_file, rep, use_pose_blendshape, model)
        self.align_joint = (align_joint if isinstance(align_joint, int)
                            else align_joint.value)
        self.fps = fps
        self.joint_mask = joint_mask

    def __call__(self, pose_p, pose_t, shape_p=None, shape_t=None,
                 tran_p=None, tran_t=None):
        f = self.fps
        pose_p = self._pose(pose_p)
        pose_t = self._pose(pose_t)
        glb_p, joint_p, vert_p = self.model.forward_kinematics(
            pose_p, shape_p, tran_p, calc_mesh=True)
        glb_t, joint_t, vert_t = self.model.forward_kinematics(
            pose_t, shape_t, tran_t, calc_mesh=True)

        offset = (joint_t[:, self.align_joint]
                  - joint_p[:, self.align_joint])[:, None]
        B = pose_p.shape[0]
        tre = jnp.linalg.norm(joint_p - joint_t, axis=2)
        ve = jnp.linalg.norm(vert_p + offset - vert_t, axis=2)
        je = jnp.linalg.norm(joint_p + offset - joint_t, axis=2)
        lae = M.radian_to_degree(
            M.angle_between(pose_p, pose_t).reshape(B, -1))
        gae = M.radian_to_degree(
            M.angle_between(glb_p, glb_t).reshape(B, -1))
        jkp = jnp.linalg.norm(
            (joint_p[3:] - 3 * joint_p[2:-1] + 3 * joint_p[1:-2]
             - joint_p[:-3]) * f ** 3, axis=2)
        jkt = jnp.linalg.norm(
            (joint_t[3:] - 3 * joint_t[2:-1] + 3 * joint_t[1:-2]
             - joint_t[:-3]) * f ** 3, axis=2)
        te = jnp.linalg.norm(
            (joint_p[f:, :1] - joint_p[:-f, :1])
            - (joint_t[f:, :1] - joint_t[:-f, :1]), axis=2)
        if self.joint_mask is not None:
            mask = jnp.asarray(self.joint_mask)
            mje, mlae, mgae = je[:, mask], lae[:, mask], gae[:, mask]
        else:
            mje = mlae = mgae = jnp.zeros((1, 1))

        def ms(x):
            if x.size == 0 or x.shape[0] < 2:
                # sequences shorter than the metric window (e.g. < fps
                # frames for the 1-s drift): report zeros instead of NaN
                return jnp.zeros(2)
            return jnp.asarray([x.mean(), x.std(axis=0, ddof=1).mean()])

        return jnp.stack([ms(je), ms(ve), ms(lae), ms(gae), ms(jkp), ms(jkt),
                          ms(te), ms(mje), ms(mlae), ms(mgae), ms(tre)])
