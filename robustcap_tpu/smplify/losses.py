r"""SMPLify fitting objective (pure JAX, whole-sequence batched).

Rebuild of ``net/smplify/losses.py``: Geman-McClure-robust reprojection +
GMM pose prior + knee/elbow angle prior + root-relative 3-D consistency with
the network prediction + IMU-orientation consistency + 2-D/3-D smoothness
(losses.py:23-91). Weights and structure are identical; one semantic note —
the reference converts rotations to axis-angle through cv2 and thereby
*detaches* the IMU term from the autodiff graph (articulate angular.py:244),
so its gradient contribution is zero. We reproduce that exactly with
``lax.stop_gradient``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import math as M
from .prior import angle_prior

__all__ = ["gmof", "temporal_body_fitting_loss",
           "temporal_ori_tran_fitting_loss"]


def gmof(x, sigma):
    r"""Geman-McClure robustifier (losses.py:6-12)."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


def temporal_body_fitting_loss(body_pose, model_joints, joints_2d,
                               joints_conf, pose_prior, cam_k, body_3d_joint,
                               imu_ori, ori, sigma=100.0,
                               pose_prior_weight=0.1,
                               angle_prior_weight=15.2,
                               smooth_2d_weight=0.01, smooth_3d_weight=1.0,
                               body_3d_weight=1.0, imu_ori_weight=0.5,
                               output="sum", frame_mask=None):
    r"""Sequence fitting loss (losses.py:23-91).

    body_pose [B, 72] axis-angle, model_joints [B, 33, 3] synthesized
    landmarks (camera frame, with translation), joints_2d [B, 33, 2] pixels,
    joints_conf [B, 33], body_3d_joint [B, 33, 3] the network's initial
    landmarks (consistency target), imu_ori [B, 6, 3, 3] measured,
    ori [B, ..., 6, 3, 3] FK orientations at the IMU joints.

    ``frame_mask`` [B] zeroes padded frames out of the scalar objective
    entirely (priors/3-D/IMU terms included — confidence weighting alone
    only covers the reprojection and smoothness terms), so a padded
    sequence optimizes exactly like its unpadded self.
    """
    B = body_pose.shape[0]
    # root-relative 3-D consistency with the initial prediction
    tgt = body_3d_joint[:, 1:] - body_3d_joint[:, :1]
    pred = model_joints[:, 1:] - model_joints[:, :1]
    body_3d_loss = (body_3d_weight ** 2) * jnp.sum((pred - tgt) ** 2, -1)

    projected = model_joints / model_joints[..., 2:]
    projected = (projected @ cam_k.T)[..., :2]

    # IMU orientation consistency — value-only (see module docstring)
    aa_meas = jax.lax.stop_gradient(
        M.rotation_matrix_to_axis_angle(imu_ori)).reshape(B, -1)
    aa_pred = jax.lax.stop_gradient(
        M.rotation_matrix_to_axis_angle(ori)).reshape(B, -1)
    imu_loss = (imu_ori_weight ** 2) * jnp.sum((aa_meas - aa_pred) ** 2, -1)

    reproj = (joints_conf ** 2) * jnp.sum(gmof(projected - joints_2d, sigma),
                                          -1)

    pose_axis = body_pose.reshape(B, -1)[:, 3:]
    prior_loss = (pose_prior_weight ** 2) * pose_prior(pose_axis, None)
    ang_loss = (angle_prior_weight ** 2) * jnp.sum(angle_prior(pose_axis), -1)

    total = (reproj.sum(-1) + prior_loss + ang_loss + body_3d_loss.sum(-1)
             + imu_loss)

    # temporal smoothness, confidence-weighted (losses.py:60-78)
    conf_d = joints_conf[1:]
    d2d = projected[1:] - projected[:-1]
    s2d = (conf_d ** 2) * jnp.sum(jnp.abs(d2d), -1)
    s2d = jnp.concatenate([jnp.zeros((1,) + s2d.shape[1:]), s2d]).sum(-1)
    d3d = model_joints[1:] - model_joints[:-1]
    s3d = (conf_d ** 2) * jnp.sum(jnp.abs(d3d), -1)
    s3d = jnp.concatenate([jnp.zeros((1,) + s3d.shape[1:]), s3d]).sum(-1)
    total = total + (smooth_2d_weight ** 2) * s2d + (smooth_3d_weight ** 2) * s3d

    if output == "sum":
        if frame_mask is not None:
            total = total * frame_mask
        return total.sum()
    if output == "reprojection":
        return reproj
    raise ValueError(output)


def temporal_ori_tran_fitting_loss(model_joints, joints_2d, joints_conf,
                                   body_3d_joint, body_3d_loss_weight=1000.0):
    r"""Shoulders/hips-only orientation+translation objective
    (losses.py:94-113; unused by the main path, kept for parity)."""
    projected = model_joints / model_joints[..., 2:]
    projected = projected[..., :2]
    smpl_ind = jnp.asarray([16, 17, 1, 2])
    mp_ind = jnp.asarray([11, 12, 23, 24])
    err = (joints_2d[:, mp_ind] - projected[:, smpl_ind]) ** 2
    valid = (jnp.min(joints_conf[:, mp_ind], -1)[:, None, None] > 0
             ).astype(err.dtype)
    reproj = jnp.sum(valid * err, axis=(1, 2))
    b3d = (body_3d_joint[:, smpl_ind] - model_joints[:, smpl_ind]) ** 2
    return (reproj + body_3d_loss_weight * jnp.sum(b3d, axis=(1, 2))).sum()
