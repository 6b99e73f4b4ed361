r"""Sensor/label synthesis transforms (jittable, batched).

TPU-native rebuild of the synthesis math inside the reference's
``preprocess.py`` and the train-time augmentations in ``net/sig_mp.py``:

* ``syn_acc``      — synthetic IMU acceleration from vertex trajectories via
                     the smoothed second finite difference (preprocess.py:22-33),
* ``synthesize_imu`` — (orientation, acceleration) virtual IMUs from a posed
                     SMPL sequence (preprocess.py:220-222),
* ``sync_3d_mp``   — mesh-vertex pseudo-MediaPipe landmarks
                     (preprocess.py:299-301, utils.py:129-135),
* ``project_points``/``normalize_keypoints`` — pinhole camera plumbing,
* ``random_camera``/``synthesize_confidence`` — the AMASS random-camera +
                     confidence-noise augmentation (sig_mp.py:520-552).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as M
from ..config import IMU_JOINT_MASK, IMU_VERTEX_MASK, MP_VERTEX_MASK

__all__ = ["syn_acc", "synthesize_imu", "sync_3d_mp", "project_points",
           "normalize_keypoints", "random_camera", "synthesize_confidence"]

_VI = np.asarray(IMU_VERTEX_MASK)
_JI = np.asarray(IMU_JOINT_MASK)
_MP = np.asarray(MP_VERTEX_MASK)


def syn_acc(v: jnp.ndarray, smooth_n: int = 2, fps: float = 60.0) -> jnp.ndarray:
    r"""Synthetic acceleration from positions [T, ..., 3] at ``fps``.

    Central second difference scaled by fps^2, with the interior smoothed by
    a wider stencil of half-width ``smooth_n`` (preprocess.py:22-33): frames
    [smooth_n, T-smooth_n) use (v[i] + v[i+2n] - 2 v[i+n]) * fps^2 / n^2; the
    first/last frames are zero.
    """
    T = v.shape[0]
    scale = fps * fps
    acc = jnp.zeros_like(v)
    acc = acc.at[1:-1].set((v[:-2] + v[2:] - 2 * v[1:-1]) * scale)
    mid = smooth_n // 2
    if mid != 0:
        n = smooth_n
        smoothed = (v[:T - 2 * n] + v[2 * n:] - 2 * v[n:T - n]) * (scale / n ** 2)
        acc = acc.at[n:-n].set(smoothed)
    return acc


def synthesize_imu(glb_rot: jnp.ndarray, verts: jnp.ndarray,
                   smooth_n: int = 2, fps: float = 60.0):
    r"""Virtual 6-IMU signals from a posed sequence.

    glb_rot [T, 24, 3, 3] global joint rotations, verts [T, V, 3] world-frame
    mesh. Returns (ori [T, 6, 3, 3], acc [T, 6, 3]): orientation = global
    rotation at the IMU joints, acceleration = smoothed second difference of
    the IMU vertices (preprocess.py:220-222).
    """
    ori = glb_rot[:, _JI]
    acc = syn_acc(verts[:, _VI], smooth_n, fps)
    return ori, acc


def sync_3d_mp(verts_mp: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    r"""Pseudo-MediaPipe 3-D landmarks from a posed body: the (ALREADY
    GATHERED) 33 mask vertices with shoulders/elbows/wrists/hips/knees/
    ankles replaced by true joints (utils.py:129-135).

    verts_mp [T, 33, 3] — mesh vertices at ``MP_VERTEX_MASK`` (callers
    gather; subset-LBS pipelines index into their own vertex subset) —
    joints [T, 24, 3] -> [T, 33, 3]. Cross-checked against the reference's
    ``sync_mp3d_from_smpl`` in tests/test_reference_parity_extra.py."""
    syn = verts_mp
    syn = syn.at[:, 11:17].set(joints[:, 16:22])
    syn = syn.at[:, 23:25].set(joints[:, 1:3])
    syn = syn.at[:, 25:27].set(joints[:, 4:6])
    syn = syn.at[:, 27:29].set(joints[:, 7:9])
    return syn


def project_points(points_c: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    r"""Pinhole projection of camera-frame points [..., 3] -> pixels [..., 2]."""
    uvw = points_c @ K.T
    return uvw[..., :2] / uvw[..., 2:]


def normalize_keypoints(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    r"""Pixel keypoints [..., 2] -> z=1-plane coordinates via K^-1 (the
    representation forward_online consumes, evaluate.py:70-72)."""
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    return (jnp.concatenate([uv, ones], -1) @ jnp.linalg.inv(K).T)[..., :2]


def random_camera(key, yaw=(-180.0, 180.0), pitch=(-30.0, 30.0),
                  roll=(-5.0, 5.0)):
    r"""Random constrained world->camera rotation used to synthesize camera
    views over AMASS (sig_mp.py:527-529): Rcw = (Rwc0 @ Rc0c)^T with the
    canonical flip Rwc0 = diag(-1, -1, 1)."""
    Rwc0 = jnp.asarray([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
    Rc0c = M.generate_random_rotation_matrix_constrained(
        key, n=1, y=yaw, p=pitch, r=roll)[0]
    return (Rwc0 @ Rc0c).T


def synthesize_confidence(key, j2dc: jnp.ndarray, conf_pool: jnp.ndarray,
                          noise_scale: float = 0.003):
    r"""Sample per-frame keypoint confidence from an empirical pool and add
    confidence-dependent jitter to the projected keypoints
    (sig_mp.py:541-545). j2dc [T, 33, 3] (x, y, *) -> (x+eps, y+eps, conf)."""
    T = j2dc.shape[0]
    kp_key, n_key = jax.random.split(key)
    idx = jax.random.choice(kp_key, conf_pool.shape[0], (T,), replace=False
                            if conf_pool.shape[0] >= T else True)
    p = conf_pool[idx].reshape(T, 1)
    noise = jax.random.normal(n_key, j2dc[..., :2].shape) \
        * (noise_scale * (1 - p))[..., None]
    xy = j2dc[..., :2] + noise
    conf = jnp.broadcast_to(p[..., None], j2dc[..., :1].shape)
    return jnp.concatenate([xy, conf], axis=-1)
