r"""Raw-corpus preprocessing: AMASS / AIST++ / TotalCapture / 3DPW -> the
unified work-dict schema consumed by training and evaluation.

Rebuild of the reference's ``preprocess.py`` converters
(preprocess_aist:36, preprocess_amass:252, preprocess_my_totalcapture:396,
preprocess_3dpw:452). Raw-data parsing (pickles/npz/json layouts) is thin
host-side I/O; every numeric transform is a separately testable function:

* ``resample_sequence``       — frame-rate conversion by index sampling
                                (AMASS -> 60 fps, preprocess.py:281-285),
* ``interpolate_keypoints``   — 30 -> 60 Hz keypoint upsampling for 3DPW
                                (preprocess.py:477-483),
* ``amass_sequence_to_work``  — FK + virtual IMU + pseudo-landmarks,
* ``totalcapture_align_imus`` — the sensor reorder + global-frame flip the
                                reference applies to real TotalCapture IMUs
                                (preprocess.py:351-364),
* sanity checks mirroring the reference's runtime asserts
  (preprocess.py:224-227, 445-446).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import math as M
from ..config import IMU_JOINT_MASK, IMU_VERTEX_MASK, MP_VERTEX_MASK
from ..smpl.model import ParametricModel
from . import synthesis

__all__ = ["resample_sequence", "interpolate_keypoints",
           "amass_sequence_to_work", "totalcapture_align_imus",
           "check_real_vs_synthetic_imu", "preprocess_amass",
           "preprocess_3dpw_sequence"]

TC_SENSOR_ORDER = [2, 3, 0, 1, 4, 5]  # preprocess.py:351-352


def resample_sequence(x: np.ndarray, src_fps: float, dst_fps: float = 60.0
                      ) -> np.ndarray:
    r"""Nearest-index frame-rate conversion along axis 0
    (the reference subsamples AMASS by integer step, preprocess.py:281-285;
    this generalizes to non-integer ratios)."""
    T = len(x)
    n_out = int(round(T * dst_fps / src_fps))
    idx = np.clip(np.round(np.arange(n_out) * src_fps / dst_fps), 0,
                  T - 1).astype(int)
    return x[idx]


def interpolate_keypoints(kp: np.ndarray, factor: int = 2) -> np.ndarray:
    r"""Linear temporal upsampling of detector keypoints (30 -> 60 Hz for
    3DPW, preprocess.py:477-483). kp [T, J, C] -> [factor*T - (factor-1), J, C]."""
    T = len(kp)
    out_len = factor * (T - 1) + 1
    t_src = np.arange(T, dtype=np.float64)
    t_dst = np.arange(out_len, dtype=np.float64) / factor
    flat = kp.reshape(T, -1)
    cols = [np.interp(t_dst, t_src, flat[:, c]) for c in range(flat.shape[1])]
    return np.stack(cols, 1).reshape(out_len, *kp.shape[1:]).astype(np.float32)


def amass_sequence_to_work(model: ParametricModel, pose_aa: np.ndarray,
                           tran: np.ndarray, src_fps: float = 60.0,
                           align_length_multiple: Optional[int] = None
                           ) -> Dict[str, np.ndarray]:
    r"""One AMASS motion -> work-dict entry (preprocess.py:252-306):
    resample to 60 fps, FK the mesh, synthesize the 6 virtual IMUs, and the
    33 mesh-vertex pseudo-landmarks."""
    import jax.numpy as jnp

    pose_aa = np.asarray(pose_aa, np.float32).reshape(len(pose_aa), -1)[:, :72]
    tran = np.asarray(tran, np.float32)
    if src_fps != 60.0:
        pose_aa = resample_sequence(pose_aa, src_fps)
        tran = resample_sequence(tran, src_fps)
    if align_length_multiple:
        T = (len(pose_aa) // align_length_multiple) * align_length_multiple
        pose_aa, tran = pose_aa[:T], tran[:T]
    T = len(pose_aa)
    if T < 10:
        raise ValueError("sequence too short after resampling")

    pose = np.array(M.axis_angle_to_rotation_matrix(
        jnp.asarray(pose_aa.reshape(-1, 3)))).reshape(T, 24, 3, 3)
    need = np.union1d(np.union1d(MP_VERTEX_MASK, IMU_VERTEX_MASK), [])
    vi = np.searchsorted(need, np.asarray(IMU_VERTEX_MASK))
    mp = np.searchsorted(need, np.asarray(MP_VERTEX_MASK))
    glb, joints, verts = model.forward_kinematics(
        jnp.asarray(pose), tran=jnp.asarray(tran), calc_mesh=True,
        vertex_ids=need)
    ori = np.asarray(glb[:, np.asarray(IMU_JOINT_MASK)])
    acc = np.asarray(synthesis.syn_acc(verts[:, vi]))
    sync_mp = np.asarray(synthesis.sync_3d_mp(verts[:, mp], joints))
    joints = np.asarray(joints)

    # reference sanity asserts (preprocess.py:224-227)
    assert not np.isnan(ori).any() and not np.isnan(acc).any()
    assert ori.shape == (T, 6, 3, 3) and acc.shape == (T, 6, 3)
    return {"pose": pose_aa, "tran": tran, "joint3d": joints,
            "imu_ori": ori, "imu_acc": acc, "sync_3d_mp": sync_mp}


def preprocess_amass(model: ParametricModel, raw_dir: str, out_dir: str,
                     splits: Dict[str, Sequence[str]], kinds=("train", "val"),
                     save=True) -> Dict[str, Dict[str, List]]:
    r"""Walk AMASS npz archives per split (preprocess.py:252-306). Requires
    the raw corpus on disk."""
    out = {}
    for kind in kinds:
        agg = {k: [] for k in ["pose", "tran", "joint3d", "imu_ori",
                               "imu_acc", "sync_3d_mp"]}
        for corpus in splits[kind]:
            for npz in sorted(glob.glob(
                    os.path.join(raw_dir, corpus, "*/*_poses.npz"))):
                data = np.load(npz)
                try:
                    entry = amass_sequence_to_work(
                        model, data["poses"][:, :72], data["trans"],
                        float(data.get("mocap_framerate", 60.0)))
                except (ValueError, KeyError):
                    continue
                for k in agg:
                    agg[k].append(entry[k])
        out[kind] = agg
        if save:
            import torch
            os.makedirs(out_dir, exist_ok=True)
            torch.save(agg, os.path.join(out_dir, f"{kind}.pt"))
    return out


def totalcapture_align_imus(raw_ori: np.ndarray, raw_acc: np.ndarray
                            ) -> tuple:
    r"""Real TotalCapture IMU fixups (preprocess.py:351-364): reorder the
    sensors into (L/R forearm, L/R lower leg, head, pelvis) and flip the
    global frame (the corpus' inertial frame is rotated by 180 deg about
    the vertical relative to the SMPL world)."""
    ori = np.asarray(raw_ori, np.float32)[:, TC_SENSOR_ORDER]
    acc = np.asarray(raw_acc, np.float32)[:, TC_SENSOR_ORDER]
    flip = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
    ori = np.einsum("ij,tnjk->tnik", flip, ori)
    acc = np.einsum("ij,tnj->tni", flip, acc)
    return ori, acc


def check_real_vs_synthetic_imu(model: ParametricModel, pose_aa, tran,
                                real_ori, real_acc,
                                max_angle_deg: float = 17.0) -> Dict:
    r"""Data-integrity check mirroring preprocess.py:445-446: real sensor
    orientations must agree with FK-synthesized ones within ~17 degrees on
    average. Returns the measured discrepancies instead of asserting so
    callers decide."""
    import jax.numpy as jnp
    work = amass_sequence_to_work(model, pose_aa, tran)
    ang = np.asarray(M.radian_to_degree(M.angle_between(
        jnp.asarray(np.asarray(real_ori, np.float32)),
        jnp.asarray(work["imu_ori"]))))
    return {"mean_angle_deg": float(ang.mean()),
            "ok": bool(ang.mean() < max_angle_deg),
            "synthetic": work}


def preprocess_3dpw_sequence(model: ParametricModel, pose_cam_aa: np.ndarray,
                             tran_cam: np.ndarray, kp2d_30hz: np.ndarray,
                             cam_K: np.ndarray, cam_T_30hz: np.ndarray
                             ) -> Dict[str, np.ndarray]:
    r"""One 3DPW sequence -> camera-frame work entry (preprocess.py:452-497):
    upsample 30 -> 60 Hz (keypoints and camera poses interpolated, pose/tran
    repeated via nearest), synthesize camera-frame IMUs from the posed body."""
    import jax.numpy as jnp
    pose60 = resample_sequence(np.asarray(pose_cam_aa, np.float32), 30.0)
    tran60 = resample_sequence(np.asarray(tran_cam, np.float32), 30.0)
    kp60 = interpolate_keypoints(np.asarray(kp2d_30hz, np.float32))
    L = min(len(pose60), len(kp60))
    pose60, tran60, kp60 = pose60[:L], tran60[:L], kp60[:L]
    camT60 = resample_sequence(np.asarray(cam_T_30hz, np.float32), 30.0)[:L]

    work = amass_sequence_to_work(model, pose60, tran60)
    return {"posec": np.array(M.axis_angle_to_rotation_matrix(
                jnp.asarray(pose60.reshape(-1, 3)))).reshape(L, 24, 3, 3),
            "tranc": tran60, "joint2d_mp": kp60, "cam_K": np.asarray(cam_K),
            "cam_T": camT60, "imu_oric": work["imu_ori"],
            "imu_accc": work["imu_acc"]}
