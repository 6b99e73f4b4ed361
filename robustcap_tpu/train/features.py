r"""Per-RNN feature/label engineering from preprocessed dataset dicts.

Rebuild of the dataset closures inside the reference's trainers
(net/sig_mp.py:301-839). Each function maps a preprocessed corpus dict to
``(data_list, label_list)`` of [T, D] sequences, trimmed by one frame at
both ends like the reference ([1:-1], e.g. sig_mp.py:315).

Frames conventions:
* root frame = pelvis orientation transposed (Rrw = R_root^T),
* the rnn7 orientation quirk is preserved: only the first five IMUs are
  rotated into the root frame; the pelvis IMU is left as-is
  (sig_mp.py:714-715, 740-741),
* AMASS rnn4/rnn6 data stays in world frame here; the random-camera +
  confidence synthesis happens per draw in ``amass_camera_augment``
  (sig_mp.py:520-552, 649-679), implemented as a jittable function.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as M
from ..config import VEL_SCALE
from ..models.sig_mp import get_bbox_scale

__all__ = [
    "aist_root_frame", "amass_root_frame", "rnn2_features", "rnn3_features",
    "rnn4_features_aist", "rnn6_features_aist", "rnn7_features",
    "rnn8_features", "amass_mp_base", "amass_camera_augment",
    "cliff_normalize_seq",
]


def _aa_to_R(aa):
    # np.array (not asarray): jax buffers are read-only and callers mutate
    return np.array(M.axis_angle_to_rotation_matrix(
        jnp.asarray(np.asarray(aa, np.float32).reshape(-1, 3)))
    ).reshape(len(aa), -1, 3, 3)


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def aist_root_frame(seq_pose, seq_ori, seq_acc, seq_joint3d,
                    rotate_all_imus: bool = True):
    r"""World -> root-frame inputs for one sequence (sig_mp.py:310-314)."""
    pose_R = _aa_to_R(_np(seq_pose).reshape(len(seq_pose), -1))
    Rrw = np.swapaxes(pose_R[:, 0], 1, 2)
    ori = _np(seq_ori)
    if rotate_all_imus:
        orir = np.einsum("tij,tnjk->tnik", Rrw, ori)
    else:
        orir = ori.copy()
        orir[:, :5] = np.einsum("tij,tnjk->tnik", Rrw, ori[:, :5])
    accr = np.einsum("tij,tnj->tni", Rrw, _np(seq_acc))
    j3d = _np(seq_joint3d)
    j3dr = np.einsum("tij,tnj->tni", Rrw, j3d)
    j3dr = j3dr[:, 1:] - j3dr[:, :1]
    return Rrw, orir, accr, j3dr, pose_R


def amass_root_frame(seq_pose, seq_ori, seq_acc, seq_joint3d,
                     rotate_all_imus: bool = True):
    r"""Same transform from the AMASS schema (sig_mp.py:327-334); the root
    rotation comes from the pose itself."""
    return aist_root_frame(seq_pose, seq_ori, seq_acc, seq_joint3d,
                           rotate_all_imus)


def _root_velocity(joint3d: np.ndarray) -> np.ndarray:
    r"""Scaled central-difference root velocity (sig_mp.py:378-380)."""
    v = (joint3d[2:] - joint3d[:-2]) * 30.0
    v = np.concatenate([np.zeros((1, 3), np.float32), v[:, 0],
                        np.zeros((1, 3), np.float32)]) / VEL_SCALE
    return v


def rnn2_features(dataset: Dict) -> Tuple[List, List]:
    r"""IMU -> root-relative joints (sig_mp.py:301-336)."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        _, orir, accr, j3dr, _ = aist_root_frame(
            dataset["pose"][i], dataset["imu_ori"][i], dataset["imu_acc"][i],
            dataset["joint3d"][i])
        x = np.concatenate([accr.reshape(len(accr), -1),
                            orir.reshape(len(orir), -1)], 1)
        data.append(x[1:-1])
        label.append(j3dr.reshape(len(j3dr), -1)[1:-1])
    return data, label


def rnn3_features(dataset: Dict) -> Tuple[List, List]:
    r"""IMU + joints -> root velocity (sig_mp.py:359-405)."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        Rrw, orir, accr, j3dr, _ = aist_root_frame(
            dataset["pose"][i], dataset["imu_ori"][i], dataset["imu_acc"][i],
            dataset["joint3d"][i])
        v3dw = _root_velocity(_np(dataset["joint3d"][i]))
        v3dr = np.einsum("tij,tj->ti", Rrw, v3dw)
        x = np.concatenate([accr.reshape(len(accr), -1),
                            orir.reshape(len(orir), -1),
                            j3dr.reshape(len(j3dr), -1)], 1)
        data.append(x[1:-1])
        label.append(v3dr[1:-1])
    return data, label


def cliff_normalize_seq(j2dc: np.ndarray, bbox_scale: bool = True
                        ) -> np.ndarray:
    r"""Whole-sequence bbox + root-centering normalization
    (sig_mp.py:465-468): divide x/y by the per-frame bbox scale, then center
    all rows except row 23 on (pre-centering) row 23.

    ``bbox_scale=False`` reproduces the reference's occluded-sample path
    (sig_mp.py:475-486): there the bbox division is applied to the *already
    consumed* clean ``j2dc`` tensor instead of ``j2dc_occ`` (a reference
    bug), so the occluded keypoints that actually enter training are only
    K^-1-normalized and root-centered, never bbox-scaled."""
    out = j2dc.copy()
    if bbox_scale:
        scale = np.asarray(get_bbox_scale(jnp.asarray(out))).reshape(-1, 1, 1)
        out[..., :2] = out[..., :2] / scale
    center = out[:, 23:24, :2].copy()
    out[:, 24:, :2] -= center
    out[:, :23, :2] -= center
    return out


def _camera_frame_seq(dataset, i, j):
    Tcw = _np(dataset["cam_T"][i][j])
    Kinv = np.linalg.inv(_np(dataset["cam_K"][i][j]))
    oric = np.einsum("ij,tnjk->tnik", Tcw[:3, :3], _np(dataset["imu_ori"][i]))
    accc = np.einsum("ij,tnj->tni", Tcw[:3, :3], _np(dataset["imu_acc"][i]))
    j3d = _np(dataset["joint3d"][i])
    j3dc = np.einsum("ij,tnj->tni", Tcw[:3, :3], j3d) + Tcw[:3, 3]
    j3dc = j3dc[:, 1:] - j3dc[:, :1]
    tranc = _np(dataset["tran"][i]) @ Tcw[:3, :3].T + Tcw[:3, 3]
    return Kinv, oric, accc, j3dc, tranc


def _detector_kp(dataset, key, i, j, Kinv):
    kp = dataset.get(key, None)
    if kp is None or kp[i][j] is None:
        return None
    kp = _np(kp[i][j])
    uv = kp[..., :2] * np.array([1920.0, 1080.0], np.float32)
    ones = np.ones_like(uv[..., :1])
    xy = (np.concatenate([uv, ones], -1) @ Kinv.T)
    out = xy.astype(np.float32)
    # confidence is the LAST column: raw MediaPipe caches carry 4 columns
    # (x, y, z, visibility) — column 2 there is the landmark z, not a
    # confidence (same convention as eval/datasets.py::_scaled_px)
    out[..., 2] = kp[..., -1]
    return out


def rnn4_features_aist(dataset: Dict, num_cameras=None,
                       include_occ: bool = True) -> Tuple[List, List]:
    r"""Camera-frame IMU + normalized keypoints -> camera-frame joints
    (sig_mp.py:444-486), plus the occluded-detection variants."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        n_cam = (num_cameras if num_cameras is not None
                 else len(dataset["cam_T"][i]))
        for j in range(n_cam):
            if dataset["joint2d_mp"][i][j] is None:
                continue
            Kinv, oric, accc, j3dc, _ = _camera_frame_seq(dataset, i, j)
            y = j3dc.reshape(len(j3dc), -1)
            kp = _detector_kp(dataset, "joint2d_mp", i, j, Kinv)
            kpn = cliff_normalize_seq(kp)
            x = np.concatenate([accc.reshape(len(accc), -1),
                                oric.reshape(len(oric), -1),
                                kpn.reshape(len(kpn), -1)], 1)
            data.append(x[1:-1])
            label.append(y[1:-1])
            if include_occ and "joint2d_occ" in dataset:
                kpo = _detector_kp(dataset, "joint2d_occ", i, j, Kinv)
                if kpo is None or len(kpo) != len(oric):
                    continue
                kpo = cliff_normalize_seq(kpo, bbox_scale=False)
                x = np.concatenate([accc.reshape(len(accc), -1),
                                    oric.reshape(len(oric), -1),
                                    kpo.reshape(len(kpo), -1)], 1)
                data.append(x[1:-1])
                label.append(y[1:-1])
    return data, label


def rnn6_features_aist(dataset: Dict, num_cameras=None) -> Tuple[List, List]:
    r"""Camera-frame IMU + raw keypoints + joints -> absolute translation
    (sig_mp.py:583-616; keypoints K^-1-normalized but NOT bbox-normalized)."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        n_cam = (num_cameras if num_cameras is not None
                 else len(dataset["cam_T"][i]))
        for j in range(n_cam):
            if dataset["joint2d_mp"][i][j] is None:
                continue
            Kinv, oric, accc, j3dc, tranc = _camera_frame_seq(dataset, i, j)
            kp = _detector_kp(dataset, "joint2d_mp", i, j, Kinv)
            x = np.concatenate([accc.reshape(len(accc), -1),
                                oric.reshape(len(oric), -1),
                                kp.reshape(len(kp), -1),
                                j3dc.reshape(len(j3dc), -1)], 1)
            data.append(x[1:-1])
            label.append(tranc[1:-1])
    return data, label


def rnn7_features(dataset: Dict, body_model) -> Tuple[List, List]:
    r"""IMU (pelvis unrotated) + joints -> global 6-D pose with identity root
    (sig_mp.py:700-747)."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        _, orir, accr, j3dr, pose_R = aist_root_frame(
            dataset["pose"][i], dataset["imu_ori"][i], dataset["imu_acc"][i],
            dataset["joint3d"][i], rotate_all_imus=False)
        p = pose_R.copy()
        p[:, 0] = np.eye(3, dtype=np.float32)
        glb = np.asarray(body_model.forward_kinematics_R(jnp.asarray(p)))
        r6d = np.asarray(M.rotation_matrix_to_r6d(
            jnp.asarray(glb))).reshape(len(p), -1)
        x = np.concatenate([accr.reshape(len(accr), -1),
                            orir.reshape(len(orir), -1),
                            j3dr.reshape(len(j3dr), -1)], 1)
        data.append(x[1:-1])
        label.append(r6d[1:-1])
    return data, label


def rnn8_features(dataset: Dict, contact_vel_threshold: float = 0.25
                  ) -> Tuple[List, List]:
    r"""IMU + joints -> foot-contact labels from foot speed
    (sig_mp.py:790-821)."""
    data, label = [], []
    for i in range(len(dataset["pose"])):
        _, orir, accr, j3dr, _ = aist_root_frame(
            dataset["pose"][i], dataset["imu_ori"][i], dataset["imu_acc"][i],
            dataset["joint3d"][i])
        j3d = _np(dataset["joint3d"][i])
        v3dw = (j3d[2:] - j3d[:-2]) * 30.0
        contacts = (np.linalg.norm(v3dw[:, 10:12], axis=2)
                    < contact_vel_threshold).astype(np.float32)
        contacts = np.concatenate([contacts[:1], contacts, contacts[-1:]])
        x = np.concatenate([accr.reshape(len(accr), -1),
                            orir.reshape(len(orir), -1),
                            j3dr.reshape(len(j3dr), -1)], 1)
        data.append(x[1:-1])
        label.append(contacts[1:-1])
    return data, label


# ---------------------------------------------------------------------------
# AMASS random-camera synthesis for rnn4/rnn6 (per-draw augmentation)
# ---------------------------------------------------------------------------


def amass_mp_base(dataset: Dict) -> Tuple[List, List]:
    r"""World-frame base sequences for the rnn4/rnn6 AMASS path: data =
    [accw | oriw | j3dw_mp(33x3)], label = j3dw(24x3), both with the first
    frame's root subtracted and the MediaPipe limb rows replaced by true
    joints (sig_mp.py:498-518)."""
    data, label = [], []
    for i in range(len(dataset["imu_acc"])):
        accw = _np(dataset["imu_acc"][i])
        oriw = _np(dataset["imu_ori"][i])
        j3d = _np(dataset["joint3d"][i])
        root = j3d[0, 0].copy()
        j3dw = j3d - root
        mp = _np(dataset["sync_3d_mp"][i]) - root
        mp[:, 11:17] = j3dw[:, 16:22]
        mp[:, 23:25] = j3dw[:, 1:3]
        mp[:, 25:27] = j3dw[:, 4:6]
        mp[:, 27:29] = j3dw[:, 7:9]
        x = np.concatenate([accw.reshape(len(accw), -1),
                            oriw.reshape(len(oriw), -1),
                            mp.reshape(len(mp), -1)], 1)
        data.append(x[1:-1])
        label.append(j3dw.reshape(len(j3dw), -1)[1:-1])
    return data, label


def amass_camera_augment(key, data: jnp.ndarray, label: jnp.ndarray,
                         conf_pool: jnp.ndarray, target: str = "rnn4",
                         yaw=(-180.0, 180.0), draws: dict = None):
    r"""Per-draw random camera + translation + keypoint-confidence synthesis
    (sig_mp.py:520-552 for rnn4; :649-679 for rnn6, which uses yaw +-90).

    data [T, 18+54+99] world-frame base, label [T, 72] world joints.
    Returns (data', label') in a synthetic camera frame: for rnn4 the label
    is root-relative joints [T, 69]; for rnn6 the absolute root [T, 3] and
    the data gains the relative joints (99 -> 99+69 block layout of rnn6).

    ``draws`` optionally pins the random draws for cross-implementation
    parity tests: ``{"Rc0c": [3, 3], "uniform3": [3]}`` replace the sampled
    camera rotation and the translation-lerp uniforms.
    """
    T = data.shape[0]
    draws = draws or {}
    k1, k2, k3, kn = jax.random.split(key, 4)
    accw = data[:, :18].reshape(T, 6, 3)
    oriw = data[:, 18:72].reshape(T, 6, 3, 3)
    mpw = data[:, 72:].reshape(T, 33, 3)
    j3dw = label.reshape(T, 24, 3)

    Rwc0 = jnp.asarray([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
    if "Rc0c" in draws:
        Rc0c = jnp.asarray(draws["Rc0c"])
    else:
        Rc0c = M.generate_random_rotation_matrix_constrained(
            k1, n=1, y=yaw, p=(-30.0, 30.0), r=(-5.0, 5.0))[0]
    Rcw = (Rwc0 @ Rc0c).T

    accc = jnp.einsum("ij,tnj->tni", Rcw, accw)
    oric = jnp.einsum("ij,tnjk->tnik", Rcw, oriw)
    j3dc = jnp.einsum("ij,tnj->tni", Rcw, j3dw)
    mpc = jnp.einsum("ij,tnj->tni", Rcw, mpw)

    u3 = (jnp.asarray(draws["uniform3"]) if "uniform3" in draws
          else jax.random.uniform(k2, (3,)))
    tr = M.lerp(jnp.asarray([-1.0, -1.0, 3.0]), jnp.asarray([1.0, 1.0, 8.0]),
                u3)
    tr = tr.at[2].add(-jnp.min(j3dc[..., 2]))
    j3dc = j3dc + tr
    mpc = mpc + tr

    j2dc = mpc / mpc[..., 2:]
    idx = jax.random.choice(k3, conf_pool.shape[0], (T,),
                            replace=conf_pool.shape[0] < T)
    # the reference's syn_c.pt pool is per-frame-per-landmark [N, 33, 1]
    # (sig_mp.py:541-545 broadcasts it against [T, 33, 2]); a per-frame
    # scalar pool [N] is accepted too and broadcast over landmarks
    p = jnp.broadcast_to(conf_pool[idx].reshape(T, -1)[..., None],
                         (T, 33, 1))
    noise = jax.random.normal(kn, j2dc[..., :2].shape) * (0.003 * (1 - p))
    xy = j2dc[..., :2] + noise
    j2dc = jnp.concatenate([xy, p], -1)

    j3dc_rel = (j3dc[:, 1:] - j3dc[:, :1]).reshape(T, -1)
    if target == "rnn4":
        scale = get_bbox_scale(j2dc).reshape(T, 1, 1)
        kp = j2dc.at[..., :2].set(j2dc[..., :2] / scale)
        center = kp[:, 23:24, :2]
        kp = kp.at[:, :, :2].add(-center).at[:, 23, :2].set(kp[:, 23, :2])
        out = jnp.concatenate([accc.reshape(T, -1), oric.reshape(T, -1),
                               kp.reshape(T, -1)], 1)
        return out, j3dc_rel
    # rnn6: raw keypoints + relative joints, label = absolute root
    out = jnp.concatenate([accc.reshape(T, -1), oric.reshape(T, -1),
                           j2dc.reshape(T, -1), j3dc_rel], 1)
    return out, j3dc[:, 0]
