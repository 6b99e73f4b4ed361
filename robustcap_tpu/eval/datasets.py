r"""Evaluation dataset assembly: preprocessed dicts -> camera-frame sequences.

Rebuilds the per-dataset ``Dataset`` closures inside the reference's
``evaluate.py`` (AIST: evaluate.py:24-52, TotalCapture: :136-159,
3DPW: :229-248) as explicit, vectorized transforms producing
``EvalSequence`` records ready for the batched scan runner.

Host-side I/O (torch ``.pt`` loading) is separated from the math; all
per-frame camera transforms are whole-sequence einsums.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["EvalSequence", "load_torch_file", "build_aist_sequences",
           "build_tc_sequences", "build_pw3d_sequences", "bucket_sequences"]

IMG_W, IMG_H = 1920, 1080
_DOWN = np.array([0.0, -1.0, 0.0], np.float32)


@dataclass
class EvalSequence:
    r"""One camera view of one motion, fully transformed to camera frame."""
    name: str
    j2dc: np.ndarray          # [T, 33, 3] K^-1-normalized x, y + confidence
    j2dc_px: np.ndarray       # [T, 33, 3] pixel x, y + confidence (smplify)
    accc: np.ndarray          # [T, 6, 3]
    oric: np.ndarray          # [T, 6, 3, 3]
    pose_gt: np.ndarray       # [T, 24, 3, 3] camera-frame (root rotated)
    tran_gt: np.ndarray       # [T, 3] camera-frame
    gravityc: np.ndarray      # [T, 3] per-frame gravity direction in camera
    cam_K: np.ndarray         # [3, 3]
    first_tran: Optional[np.ndarray]  # GT seed translation or None
    first_frame: bool         # TotalCapture-style seeding
    valid: bool = True        # not filtered out (AIST not_aligned list)

    @property
    def length(self) -> int:
        return int(self.j2dc.shape[0])


def load_torch_file(path: str):
    r"""Host-side loader for the reference's ``.pt`` artifacts."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _aa_to_R(aa: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    from .. import math as M
    # np.array (not asarray): jax buffers are read-only and callers mutate
    return np.array(M.axis_angle_to_rotation_matrix(
        jnp.asarray(aa.reshape(-1, 3)))).reshape(-1, 24, 3, 3)


def _normalize_kp(kp_px: np.ndarray, K: np.ndarray) -> np.ndarray:
    r"""Pixel keypoints+conf -> K^-1 plane coords+conf (evaluate.py:70-72)."""
    Kinv = np.linalg.inv(K)
    ones = np.ones_like(kp_px[..., :1])
    uv1 = np.concatenate([kp_px[..., :2], ones], -1) @ Kinv.T
    return np.concatenate([uv1[..., :2], kp_px[..., 2:]], -1).astype(np.float32)


def _camera_frame_inputs(Tcw: np.ndarray, imu_ori: np.ndarray,
                         imu_acc: np.ndarray, pose_aa: np.ndarray,
                         tran: np.ndarray):
    r"""World -> camera transforms shared by AIST/TC (evaluate.py:40-49)."""
    R = Tcw[:3, :3]
    oric = np.einsum("ij,tnjk->tnik", R, imu_ori)
    accc = np.einsum("ij,tnj->tni", R, imu_acc)        # free vector: no t
    pose = _aa_to_R(pose_aa)
    pose[:, 0] = np.einsum("ij,tjk->tik", R, pose[:, 0])
    tranc = tran @ R.T + Tcw[:3, 3]
    gravityc = (R @ _DOWN).astype(np.float32)
    return oric.astype(np.float32), accc.astype(np.float32), pose, \
        tranc.astype(np.float32), gravityc


def _scaled_px(kp: np.ndarray) -> np.ndarray:
    r"""Stored fraction-of-frame keypoints -> pixels (evaluate.py:44-46).

    Raw MediaPipe caches carry 4 columns (x, y, z, visibility); the eval
    consumes x, y and the LAST column as confidence (evaluate.py:43-46), so
    both 3- and 4-column dicts are accepted."""
    kp = np.asarray(kp, np.float32)
    out = np.stack([kp[..., 0] * IMG_W, kp[..., 1] * IMG_H, kp[..., -1]],
                   axis=-1)
    return out


def build_aist_sequences(dataset: Dict, not_aligned: Sequence[str] = (),
                         num_cameras: Optional[int] = None
                         ) -> List[EvalSequence]:
    r"""AIST++ test assembly (evaluate.py:24-52): 9 camera views per motion
    (inferred from the data), GT first-frame translation seed, sequences in
    the ``not_aligned`` list marked invalid (metrics skip them,
    evaluate.py:111)."""
    not_aligned = set(not_aligned)
    seqs = []
    for i in range(len(dataset["pose"])):
        n_cam = (num_cameras if num_cameras is not None
                 else len(dataset["cam_T"][i]))
        for j in range(n_cam):
            cam_name = "c0" + str(j + 1)
            name = str(dataset["name"][i]).replace("cAll", cam_name)
            Tcw = _to_np(dataset["cam_T"][i][j])
            K = _to_np(dataset["cam_K"][i][j])
            oric, accc, pose, tranc, grav = _camera_frame_inputs(
                Tcw, _to_np(dataset["imu_ori"][i]),
                _to_np(dataset["imu_acc"][i]),
                _to_np(dataset["pose"][i]), _to_np(dataset["tran"][i]))
            kp_px = _scaled_px(_to_np(dataset["joint2d_mp"][i][j]))
            T = len(oric)
            seqs.append(EvalSequence(
                name=name, j2dc=_normalize_kp(kp_px, K), j2dc_px=kp_px,
                accc=accc, oric=oric, pose_gt=pose, tran_gt=tranc,
                gravityc=np.broadcast_to(grav, (T, 3)).copy(), cam_K=K,
                first_tran=tranc[0], first_frame=False,
                valid=name not in not_aligned))
    return seqs


def build_tc_sequences(dataset: Dict, num_cameras: Optional[int] = None
                       ) -> List[EvalSequence]:
    r"""TotalCapture assembly (evaluate.py:136-159): real IMU recordings, 8
    cameras (inferred from the data), first_frame seeding instead of a GT
    translation (evaluate.py:185)."""
    seqs = []
    for i in range(len(dataset["pose"])):
        n_cam = (num_cameras if num_cameras is not None
                 else len(dataset["cam_T"][i]))
        for j in range(n_cam):
            Tcw = _to_np(dataset["cam_T"][i][j])
            K = _to_np(dataset["cam_K"][i][j])
            oric, accc, pose, tranc, grav = _camera_frame_inputs(
                Tcw, _to_np(dataset["imu_ori"][i]),
                _to_np(dataset["imu_acc"][i]),
                _to_np(dataset["pose"][i]), _to_np(dataset["tran"][i]))
            kp_px = _scaled_px(_to_np(dataset["joint2d_mp"][i][j]))
            T = len(oric)
            seqs.append(EvalSequence(
                name=f"tc_{i}_c{j}", j2dc=_normalize_kp(kp_px, K),
                j2dc_px=kp_px, accc=accc, oric=oric, pose_gt=pose,
                tran_gt=tranc,
                gravityc=np.broadcast_to(grav, (T, 3)).copy(), cam_K=K,
                first_tran=None, first_frame=True))
    return seqs


def build_pw3d_sequences(dataset: Dict) -> List[EvalSequence]:
    r"""3DPW(-OCC) assembly (evaluate.py:229-248): one moving camera, data
    already in camera frame, per-frame gravity from cam_T
    (evaluate.py:284-285), keypoints already normalized by the detector at
    preprocessing time (pixel coordinates not rescaled)."""
    seqs = []
    for i in range(len(dataset["posec"])):
        if dataset["joint2d_mp"][i] is None:
            continue
        K = _to_np(dataset["cam_K"][i])
        kp = _to_np(dataset["joint2d_mp"][i])
        kp_px = kp.copy()
        oric = _to_np(dataset["imu_oric"][i])
        accc = _to_np(dataset["imu_accc"][i])
        pose = _to_np(dataset["posec"][i]).reshape(-1, 24, 3, 3)
        tranc = _to_np(dataset["tranc"][i]).reshape(-1, 3)
        T = len(oric)
        cam_T = np.stack([_to_np(dataset["cam_T"][i][t]) for t in range(T)])
        grav = np.einsum("tij,j->ti", cam_T[:, :3, :3], _DOWN)
        seqs.append(EvalSequence(
            name=f"pw3d_{i}", j2dc=_normalize_kp(kp_px, K), j2dc_px=kp_px,
            accc=accc, oric=oric, pose_gt=pose, tran_gt=tranc,
            gravityc=grav.astype(np.float32), cam_K=K, first_tran=tranc[0],
            first_frame=False))
    return seqs


def bucket_sequences(seqs: List[EvalSequence], max_bucket: int = 32,
                     pad_to_multiple: int = 128
                     ) -> List[Tuple[List[int], int]]:
    r"""Group sequences into equal-padded-length batches.

    Padding every sequence to a shared multiple keeps the number of distinct
    compiled scan shapes tiny (one per bucket length) while wasting little
    compute — the replacement for the reference's per-sequence Python loop.
    Returns [(indices, padded_length)].
    """
    order = sorted(range(len(seqs)), key=lambda i: seqs[i].length)
    buckets = []
    cur: List[int] = []
    cur_len = 0
    for idx in order:
        L = -(-seqs[idx].length // pad_to_multiple) * pad_to_multiple
        if cur and (L != cur_len or len(cur) >= max_bucket):
            buckets.append((cur, cur_len))
            cur = []
        cur.append(idx)
        cur_len = L
    if cur:
        buckets.append((cur, cur_len))
    return buckets
