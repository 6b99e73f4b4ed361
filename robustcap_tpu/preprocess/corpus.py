r"""Corpus-level preprocessing drivers: raw dataset trees -> work ``.pt`` dicts.

Rebuild of the reference's whole-corpus converters in ``preprocess.py``:

* ``preprocess_aist``            (preprocess.py:36-249) — split lists, the
  official ignore list + minimalbody ignore list, ``smpl_loss > 4`` and
  NaN-keypoint filters, per-camera cached MediaPipe / minimalbody / occluded
  keypoints with frame-count splice repair, optional ROMP/PARE baseline
  packing, FK + virtual-IMU synthesis,
* ``write_not_aligned``          (preprocess.py:500-561) — flags camera
  views whose cached detections disagree with the GT reprojection by more
  than 25 px on average and writes ``not_aligned.txt``,
* ``preprocess_totalcapture_pre`` (preprocess.py:309-394) — raw sensor
  pickles with the ``[2, 3, 0, 1, 4, 5]`` sensor reorder and the global
  diag(-1, 1, -1) frame flip, Vicon ground-truth positions (inches ->
  meters) with the translation fixups, ``calibration.cal`` parsing,
* ``preprocess_totalcapture``     (preprocess.py:396-450) — assembles the
  eval dict, skips the not-aligned motions, asserts real-vs-synthetic IMU
  agreement (< 17 deg) and joint agreement,
* ``preprocess_3dpw``             (preprocess.py:452-497, 563-609) — per
  person camera-frame pose/tran, 30->60 Hz keypoint midpoint interpolation,
  shape-aware FK, occluded variant.

I/O keeps the reference's artifact formats (pickle / torch ``.pt``) so the
outputs are drop-in inputs for ``eval/datasets.py`` builders and,
conversely, artifacts produced by the reference load here unchanged. All
compute (FK, LBS, IMU synthesis) runs through the JAX body model.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import math as M
from ..config import IMU_JOINT_MASK, IMU_VERTEX_MASK, MP_VERTEX_MASK
from ..smpl.model import ParametricModel, default_body_model
from . import synthesis

__all__ = [
    "splice_repair", "fill_missing_frames", "preprocess_aist",
    "write_not_aligned", "parse_vicon_positions", "parse_calibration",
    "preprocess_totalcapture_pre", "preprocess_totalcapture",
    "preprocess_3dpw",
]

_JI = np.asarray(IMU_JOINT_MASK)
_VI = np.asarray(IMU_VERTEX_MASK)
_MP = np.asarray(MP_VERTEX_MASK)
INCHES_TO_METERS = 0.0254
# global-frame flip applied to TotalCapture sensor data (preprocess.py:359-364)
_TC_FLIP = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)


def _torch():
    import torch
    return torch


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Frame-count repair + missing-frame placeholders (preprocess.py:66-130)
# ---------------------------------------------------------------------------


def splice_repair(track: Optional[np.ndarray], target_len: int
                  ) -> Optional[np.ndarray]:
    r"""The reference's exact frame-count repair: detector caches can run
    1-3 frames short of the motion; repeat frames at the midpoints (n=2
    duplicates the middle frame, n=3 duplicates at thirds) plus the final
    frame, and give up (None) at gaps >= 4 (preprocess.py:67-79)."""
    if track is None:
        return None
    track = np.asarray(track)
    n = target_len - len(track)
    if n < 0:
        return track[:target_len]
    if n == 0:
        return track
    if n == 1:
        return np.concatenate([track, track[-1:]])
    if n == 2:
        mid = target_len // 2
        return np.concatenate([track[:mid], track[mid - 1:], track[-1:]])
    if n == 3:
        mid1 = target_len // 3
        mid2 = mid1 * 2
        return np.concatenate([track[:mid1], track[mid1 - 1:mid2],
                               track[mid2 - 1:], track[-1:]])
    return None


def fill_missing_frames(frames: Sequence, n_cols: int = 4,
                        rng: Optional[np.random.RandomState] = None
                        ) -> Optional[np.ndarray]:
    r"""Detector caches store None for failed frames; replace them with a
    confidence-0 placeholder (random positions — the model masks them out by
    the zero confidence; preprocess.py:89-91) and stack."""
    if frames is None or len(frames) == 0:
        return None
    rng = rng or np.random.RandomState(0)
    out = []
    for f in frames:
        if f is None or (hasattr(f, "__len__") and len(f) == 0):
            ph = rng.rand(33, n_cols).astype(np.float32)
            ph[:, -1] = 0.0
            out.append(ph)
        else:
            out.append(np.asarray(_np(f), np.float32))
    return np.stack(out)


def _load_kp_cache(path: str, n_cols: int, target_len: int,
                   rng: np.random.RandomState) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    data = _torch().load(path, map_location="cpu", weights_only=False)
    stacked = fill_missing_frames(data, n_cols=n_cols, rng=rng)
    if stacked is None:
        return None
    repaired = splice_repair(stacked, target_len)
    if repaired is not None:
        assert not np.isnan(repaired).any()
    return repaired


# ---------------------------------------------------------------------------
# AIST++ (preprocess.py:36-249)
# ---------------------------------------------------------------------------


def _read_lines(path: str) -> List[str]:
    if not os.path.exists(path):
        return []
    return [l.strip("\n") for l in open(path) if l.strip("\n")]


def _aist_cameras(cam_data: Sequence[Dict], scale: float):
    r"""Camera JSONs -> (K [C,3,3], Tcw [C,4,4]); translations share the
    motion's smpl scaling (preprocess.py:213-216)."""
    import jax.numpy as jnp
    Ks, Ts = [], []
    for d in cam_data:
        K = np.asarray(d["matrix"], np.float32).reshape(3, 3)
        R = np.array(M.axis_angle_to_rotation_matrix(
            jnp.asarray(np.asarray(d["rotation"], np.float32)[None])))[0]
        t = np.asarray(d["translation"], np.float32).reshape(3) / scale
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        Ks.append(K)
        Ts.append(T)
    return np.stack(Ks), np.stack(Ts)


def _fk_virtual_imus(model: ParametricModel, pose_aa: np.ndarray,
                     tran: np.ndarray, shape: Optional[np.ndarray] = None):
    r"""FK + virtual IMU synthesis on the needed vertex subset
    (preprocess.py:217-222): returns (imu_ori [T,6,3,3], imu_acc [T,6,3],
    joint3d [T,24,3], glb [T,24,3,3], verts_needed, need_ids)."""
    import jax.numpy as jnp
    T = len(pose_aa)
    pose_R = np.array(M.axis_angle_to_rotation_matrix(
        jnp.asarray(pose_aa.reshape(-1, 3)))).reshape(T, 24, 3, 3)
    need = np.union1d(_MP, _VI)
    glb, joints, verts = model.forward_kinematics(
        jnp.asarray(pose_R),
        shape=None if shape is None else jnp.asarray(shape),
        tran=jnp.asarray(tran), calc_mesh=True, vertex_ids=need)
    vi_idx = np.searchsorted(need, _VI)
    imu_ori = np.array(glb[:, jnp.asarray(_JI)])
    imu_acc = np.array(synthesis.syn_acc(verts[:, vi_idx]))
    return (imu_ori, imu_acc, np.array(joints), np.array(glb),
            np.array(verts), need)


def _load_romp(path: str, target_len: int):
    r"""ROMP baseline packing (preprocess.py:133-161): per-frame dicts with
    global_orient/body_pose (axis-angle) and cam_trans."""
    import jax.numpy as jnp
    if not os.path.exists(path):
        return None, None
    data = _torch().load(path, map_location="cpu", weights_only=False)
    aa = np.stack([np.concatenate([
        _np(d["global_orient"]).reshape(3),
        _np(d["body_pose"]).reshape(-1)[:69]]) for d in data])
    tran = np.stack([_np(d["cam_trans"]).reshape(3) for d in data])
    pose = np.array(M.axis_angle_to_rotation_matrix(
        jnp.asarray(aa.reshape(-1, 3).astype(np.float32)))
    ).reshape(-1, 24, 3, 3)
    n = target_len - len(pose)
    if n < 0:
        return pose[:target_len], tran[:target_len]
    if n >= 4:
        return None, None
    if n >= 1:   # reference pads front/back/mid (preprocess.py:147-158)
        pose = splice_repair(pose, target_len)
        tran = splice_repair(tran, target_len)
    return pose, tran


def _load_pare(path: str, target_len: int):
    r"""PARE baseline packing (preprocess.py:163-206): tracklet dict with
    frame_ids/pose/pred_cam; missing frames get an identity pose with the
    image-flip root and the last weak-perspective translation; pred_cam
    (s, tx, ty) -> (tx, ty, 2*5000/(224*s))."""
    if not os.path.exists(path):
        return None, None
    data = _torch().load(path, map_location="cpu", weights_only=False)
    trk = data[1]
    frame_ids = list(_np(trk["frame_ids"]).astype(int))
    poses, trans = [], []
    tran_temp = np.zeros(3, np.float32)
    flip = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    j = 0
    for t in range(frame_ids[-1] + 1):
        while frame_ids[j] < t:
            j += 1
        if frame_ids[j] != t:
            p = np.broadcast_to(np.eye(3, dtype=np.float32),
                                (24, 3, 3)).copy()
            p[0] = flip @ p[0]
            poses.append(p)
            trans.append(tran_temp)
        else:
            poses.append(_np(trk["pose"][j]).reshape(24, 3, 3))
            cam = _np(trk["pred_cam"][j]).reshape(3)
            tran_temp = np.asarray(
                [cam[1], cam[2], 2 * 5000.0 / (224 * cam[0] + 1e-9)],
                np.float32)
            trans.append(tran_temp)
            j += 1
    pose, tran = np.stack(poses), np.stack(trans)
    n = target_len - len(pose)
    if n < 0:
        return pose[:target_len], tran[:target_len]
    if n >= 4:
        return None, None
    if n >= 1:
        pose = splice_repair(pose, target_len)
        tran = splice_repair(tran, target_len)
    return pose, tran


AIST_KEYS = ["name", "pose", "tran", "joint2d", "joint2d_minimalbody",
             "joint2d_mp", "joint2d_occ", "joint3d", "cam_K", "cam_T",
             "imu_ori", "imu_acc", "romp_pose", "romp_tran", "pare_pose",
             "pare_tran"]


def preprocess_aist(raw_dir: str, out_dir: str, kinds: Sequence[str] = ("test",),
                    model: Optional[ParametricModel] = None,
                    n_cameras: int = 9) -> Dict[str, int]:
    r"""Convert a raw AIST++ tree into ``{kind}.pt`` work dicts
    (preprocess.py:36-249). Expected raw layout (reference's):

    - ``splits/pose_{kind}.txt``, ``ignore_list.txt``,
      ``ignore_minimalbody.txt``, ``cameras/mapping.txt``,
      ``cameras/{setting}.json``
    - ``motions/{name}.pkl`` (smpl_poses/smpl_trans/smpl_scaling/smpl_loss)
    - ``keypoints2d/{name}.pkl`` ({'keypoints2d': [C, T, 17, 3]})
    - per camera caches ``keypoints2d_mp|keypoints2d_minimalbody|
      keypoints2d_mp_occ/{name cAll->c0X}.pt``
    - optional baselines ``romp_pts|pare_pts/{name cAll->c0X}.pt``

    Returns {kind: n_succeed}.
    """
    model = model or default_body_model()
    tran_offset = np.asarray(TRAN_OFFSET_AIST, np.float32)
    counts = {}
    for kind in kinds:
        split_file = os.path.join(raw_dir, "splits", f"pose_{kind}.txt")
        if not os.path.exists(split_file):
            raise FileNotFoundError(
                f"AIST split list not found: {split_file} — is --raw "
                f"pointing at the corpus root?")
        names = _read_lines(split_file)
        ignore = set(_read_lines(os.path.join(raw_dir, "ignore_list.txt")))
        ignore_mb = set(_read_lines(
            os.path.join(raw_dir, "ignore_minimalbody.txt")))
        mapping = {l.split(" ")[0]: l.split(" ")[1]
                   for l in _read_lines(
                       os.path.join(raw_dir, "cameras", "mapping.txt"))}
        out = {k: [] for k in AIST_KEYS}
        n_succeed = 0
        rng = np.random.RandomState(0)
        for name in names:
            if name in ignore:           # official ignore (preprocess.py:55)
                continue
            smpl_data = pickle.load(
                open(os.path.join(raw_dir, "motions", name + ".pkl"), "rb"),
                encoding="latin1")
            kp_data = pickle.load(
                open(os.path.join(raw_dir, "keypoints2d", name + ".pkl"),
                     "rb"), encoding="latin1")
            cam_data = json.load(open(os.path.join(
                raw_dir, "cameras", mapping[name] + ".json")))
            if float(np.asarray(smpl_data.get("smpl_loss", 0.0)).reshape(-1)[0]
                     ) > 4 and kind != "test":
                continue                 # bad fit (preprocess.py:56)
            joint2d = np.asarray(kp_data["keypoints2d"], np.float32)
            if np.isnan(joint2d).any() and kind != "test":
                continue                 # nan keypoints (preprocess.py:57)
            T = joint2d.shape[1]

            kp_mp, kp_mb, kp_occ = [], [], []
            romp_p, romp_t, pare_p, pare_t = [], [], [], []
            for cid in range(n_cameras):
                cname = name.replace("cAll", "c0%d" % (cid + 1))
                mb_path = os.path.join(raw_dir, "keypoints2d_minimalbody",
                                       cname + ".pt")
                mp_path = os.path.join(raw_dir, "keypoints2d_mp",
                                       cname + ".pt")
                occ_path = os.path.join(raw_dir, "keypoints2d_mp_occ",
                                        cname + ".pt")
                if kind == "test":
                    assert os.path.exists(mp_path), f"Missing {mp_path}"
                use_mb = cname not in ignore_mb or kind == "test"
                mb = _load_kp_cache(mb_path, 3, T, rng) if use_mb else None
                if mb is not None:
                    mb = mb[:, :, [1, 0, 2]]   # row/col swap (preprocess.py:65)
                kp_mb.append(mb)
                # reference quirk preserved: the MediaPipe cache is ALSO
                # gated on the minimalbody ignore list (preprocess.py:82
                # reuses ignore_names2), dropping a view's valid mp
                # keypoints when only its minimalbody detector failed
                kp_mp.append(_load_kp_cache(mp_path, 4, T, rng)
                             if use_mb else None)
                kp_occ.append(_load_kp_cache(occ_path, 4, T, rng)
                              if (cname not in ignore_mb and kind != "test")
                              else None)
                rp, rt = ((None, None) if kind != "test" else _load_romp(
                    os.path.join(raw_dir, "romp_pts", cname + ".pt"), T))
                pp, pt = ((None, None) if kind != "test" else _load_pare(
                    os.path.join(raw_dir, "pare_pts", cname + ".pt"), T))
                romp_p.append(rp)
                romp_t.append(rt)
                pare_p.append(pp)
                pare_t.append(pt)

            scale = float(np.asarray(smpl_data["smpl_scaling"]).reshape(-1)[0])
            pose = np.asarray(smpl_data["smpl_poses"], np.float32
                              ).reshape(-1, 72)
            tran = (np.asarray(smpl_data["smpl_trans"], np.float32
                               ).reshape(-1, 3) / scale + tran_offset)
            cam_K, cam_T = _aist_cameras(cam_data, scale)
            imu_ori, imu_acc, joint3d, _, _, _ = _fk_virtual_imus(
                model, pose, tran)

            # data-integrity asserts (preprocess.py:224-227)
            assert joint2d.shape[1] == pose.shape[0] == tran.shape[0]
            assert joint2d.shape[0] == n_cameras and joint2d.shape[2] == 17
            assert not np.isnan(pose).any() and not np.isnan(tran).any()
            for i, d in enumerate(cam_data):
                assert d.get("name", "c0%d" % (i + 1)) == "c0%d" % (i + 1)

            out["name"].append(name)
            out["pose"].append(pose)
            out["tran"].append(tran)
            out["joint2d"].append(joint2d)
            out["joint3d"].append(joint3d)
            out["cam_K"].append(cam_K)
            out["cam_T"].append(cam_T)
            out["imu_ori"].append(imu_ori)
            out["imu_acc"].append(imu_acc)
            out["joint2d_mp"].append(kp_mp)
            out["joint2d_minimalbody"].append(kp_mb)
            out["joint2d_occ"].append(kp_occ)
            out["romp_pose"].append(romp_p)
            out["romp_tran"].append(romp_t)
            out["pare_pose"].append(pare_p)
            out["pare_tran"].append(pare_t)
            n_succeed += 1

        os.makedirs(out_dir, exist_ok=True)
        _torch().save(out, os.path.join(out_dir, kind + ".pt"))
        counts[kind] = n_succeed
    return counts


# SMPL root offset of the mean shape (preprocess.py:42); differs from the
# live-demo TRAN_OFFSET constant in config.py:98
TRAN_OFFSET_AIST = (-0.00217368, -0.240789175, 0.028583793)


def write_not_aligned(raw_dir: str, out_path: Optional[str] = None,
                      model: Optional[ParametricModel] = None,
                      kind: str = "test", n_cameras: int = 9,
                      threshold_px: float = 25.0,
                      img_wh=(1920, 1080)) -> List[str]:
    r"""The reference's ``preprocess_aist_pre`` (preprocess.py:500-561):
    project the GT body's 33 pseudo-MediaPipe landmarks into each camera and
    flag views whose cached detections are off by > ``threshold_px`` mean
    pixel distance. Writes ``not_aligned.txt`` and returns the names."""
    import jax.numpy as jnp
    model = model or default_body_model()
    tran_offset = np.asarray(TRAN_OFFSET_AIST, np.float32)
    names = _read_lines(os.path.join(raw_dir, "splits", f"pose_{kind}.txt"))
    ignore = set(_read_lines(os.path.join(raw_dir, "ignore_list.txt")))
    mapping = {l.split(" ")[0]: l.split(" ")[1] for l in _read_lines(
        os.path.join(raw_dir, "cameras", "mapping.txt"))}
    flagged = []
    rng = np.random.RandomState(0)
    for name in names:
        if name in ignore:
            continue
        smpl_data = pickle.load(
            open(os.path.join(raw_dir, "motions", name + ".pkl"), "rb"),
            encoding="latin1")
        kp_data = pickle.load(
            open(os.path.join(raw_dir, "keypoints2d", name + ".pkl"), "rb"),
            encoding="latin1")
        cam_data = json.load(open(os.path.join(
            raw_dir, "cameras", mapping[name] + ".json")))
        T = np.asarray(kp_data["keypoints2d"]).shape[1]
        scale = float(np.asarray(smpl_data["smpl_scaling"]).reshape(-1)[0])
        pose = np.asarray(smpl_data["smpl_poses"], np.float32).reshape(-1, 72)
        tran = (np.asarray(smpl_data["smpl_trans"], np.float32
                           ).reshape(-1, 3) / scale + tran_offset)
        cam_K, cam_T = _aist_cameras(cam_data, scale)
        _, _, joints, glb, verts, need = _fk_virtual_imus(model, pose, tran)
        mp_idx = np.searchsorted(need, _MP)
        syn3d_w = np.array(synthesis.sync_3d_mp(
            jnp.asarray(verts[:, mp_idx]), jnp.asarray(joints)))
        for cid in range(n_cameras):
            cname = name.replace("cAll", "c0%d" % (cid + 1))
            kp = _load_kp_cache(os.path.join(
                raw_dir, "keypoints2d_mp", cname + ".pt"), 4, T, rng)
            if kp is None:
                continue
            # reference quirk preserved: the mean runs over ALL frames,
            # including confidence-0 random placeholders for failed
            # detections (preprocess.py:524-526,547) — a view with enough
            # detector misses can be flagged even when geometrically
            # aligned; masking would change which views the filter drops
            det = kp[..., :2] * np.asarray(img_wh, np.float32)
            R, t = cam_T[cid][:3, :3], cam_T[cid][:3, 3]
            pc = syn3d_w @ R.T + t
            uvw = pc @ cam_K[cid].T
            syn2d = uvw[..., :2] / uvw[..., 2:]
            d = float(np.linalg.norm(det - syn2d, axis=-1).mean())
            if d > threshold_px:
                flagged.append(cname)
    if out_path is None:
        out_path = os.path.join(raw_dir, "not_aligned.txt")
    with open(out_path, "w") as f:
        f.write("".join(n + "\n" for n in flagged))
    return flagged


# ---------------------------------------------------------------------------
# TotalCapture (preprocess.py:309-450)
# ---------------------------------------------------------------------------


def parse_vicon_positions(path: str,
                          joints=("LeftFoot", "RightFoot", "Spine", "Hips")):
    r"""Parse ``gt_skel_gbl_pos.txt`` (tab-separated joint names header, then
    per-frame space-separated xyz per joint, inches) and return the selected
    joints' positions in meters [T, len(joints), 3]
    (preprocess.py:310-320)."""
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        index = [header.index(j) for j in joints]
        pos = []
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) <= max(index):
                break
            frame = [[float(v) for v in cols[i].split(" ")] for i in index]
            pos.append(frame)
    return np.asarray(pos, np.float32) * INCHES_TO_METERS


def parse_calibration(path: str):
    r"""Parse the TotalCapture ``calibration.cal`` camera file
    (preprocess.py:321-341): per camera one header line, one
    ``fx fy cx cy`` line, one skipped (distortion) line, three rotation
    rows, one translation row. Returns [(R [3,3], t [3], K [3,3])]."""
    cams = []
    with open(path) as f:
        f.readline()
        while True:
            header = f.readline()
            if not header or not header.strip():
                break
            fx, fy, cx, cy = [float(v) for v in
                              f.readline().split("\t")[0].split()[:4]]
            K = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
            f.readline()   # distortion line
            R = np.asarray([[float(v) for v in
                             f.readline().split("\t")[0].split()[:3]]
                            for _ in range(3)], np.float32)
            t = np.asarray([float(v) for v in
                            f.readline().split("\t")[0].split()[:3]],
                           np.float32)
            cams.append((R, t, K))
    return cams


# raw sensor order (L_arm, R_arm, L_leg, R_leg, head, pelvis) -> model order
_TC_SENSOR_REORDER = np.asarray([2, 3, 0, 1, 4, 5])


def preprocess_totalcapture_pre(raw_dir: str,
                                model: Optional[ParametricModel] = None,
                                n_cameras: int = 8) -> str:
    r"""Stage 1 (preprocess.py:309-394): load raw sensor pickles
    (``TotalCapture_60FPS_Original/*.pkl`` with ori/acc/gt), reorder sensors
    ``[2,3,0,1,4,5]``, apply the global diag(-1,1,-1) flip to root pose /
    orientations / accelerations, parse Vicon hip positions with the
    reference's translation fixups (x -= 0.03, y += 1/(10+z)), attach the
    per-camera cached keypoints, FK the GT joints, and save
    ``total_capture_data.pt``. Returns the output path."""
    import jax.numpy as jnp
    model = model or default_body_model()
    torch = _torch()
    poses, trans, oris, accs, kp_2ds, kp_mps, kp_3ds = [], [], [], [], [], [], []
    cams = parse_calibration(os.path.join(raw_dir, "calibration.cal"))
    files = sorted(os.listdir(os.path.join(raw_dir,
                                           "TotalCapture_60FPS_Original")))
    rng = np.random.RandomState(0)
    for file in files:
        data = pickle.load(
            open(os.path.join(raw_dir, "TotalCapture_60FPS_Original", file),
                 "rb"), encoding="latin1")
        ori = np.asarray(data["ori"], np.float32)[:, _TC_SENSOR_REORDER]
        acc = np.asarray(data["acc"], np.float32)[:, _TC_SENSOR_REORDER]
        gt = np.asarray(data["gt"], np.float32)
        pose = np.array(M.axis_angle_to_rotation_matrix(
            jnp.asarray(gt.reshape(-1, 3)))).reshape(-1, 24, 3, 3)
        Tn = min(len(acc), len(pose))
        pose, ori, acc = pose[:Tn], ori[:Tn], acc[:Tn]
        # global-frame flip (preprocess.py:359-364)
        pose[:, 0] = np.einsum("ij,tjk->tik", _TC_FLIP, pose[:, 0])
        ori = np.einsum("ij,tnjk->tnik", _TC_FLIP, ori)
        acc = np.einsum("ij,tnj->tni", _TC_FLIP, acc)

        subject = file.split("_")[0].upper()
        motion = file.split(".")[0].split("_")[1]
        kp_2d, kp_mp = [], []
        for i in range(n_cameras):
            stem = subject.lower() + "_" + motion + "_cam" + str(i + 1) + ".pt"
            kp2d_cam = torch.load(os.path.join(raw_dir, "kp2d", stem),
                                  map_location="cpu", weights_only=False)
            kp_2d.append(np.asarray(_np(kp2d_cam), np.float32))
            mp_data = torch.load(os.path.join(raw_dir, "kp2d_mp", stem),
                                 map_location="cpu", weights_only=False)
            kp_mp.append(fill_missing_frames(mp_data, 4, rng))

        tran = parse_vicon_positions(os.path.join(
            raw_dir, "Vicon_GroundTruth", subject, motion,
            "gt_skel_gbl_pos.txt"))[:, 3]
        tran = tran[:Tn]
        assert len(tran) == len(acc) == len(ori) == len(pose)
        # translation fixups (preprocess.py:382-383)
        tran[:, 0] -= 0.03
        tran[:, 1] += 1.0 / (10.0 + tran[:, 2])

        _, kp3d, _ = model.forward_kinematics(
            jnp.asarray(pose), tran=jnp.asarray(tran), calc_mesh=True,
            vertex_ids=np.asarray([0]))
        poses.append(pose)
        trans.append(tran)
        oris.append(ori)
        accs.append(acc)
        kp_2ds.append(kp_2d)
        kp_mps.append(kp_mp)
        kp_3ds.append(np.array(kp3d))
    out_path = os.path.join(raw_dir, "total_capture_data.pt")
    torch.save({"pose": poses, "tran": trans, "ori": oris, "acc": accs,
                "cam": cams, "kp_2d": kp_2ds, "kp_3d": kp_3ds,
                "kp_mp": kp_mps, "files": files}, out_path)
    return out_path


def preprocess_totalcapture(raw_dir: str, out_dir: str,
                            model: Optional[ParametricModel] = None,
                            skip: Sequence[int] = (2, 12, 42),
                            max_imu_angle_deg: float = 17.0) -> int:
    r"""Stage 2 (preprocess.py:396-450): assemble the eval ``test.pt`` from
    ``total_capture_data.pt``. Skips the reference's not-aligned motion
    indices, converts poses back to axis-angle, swaps the minimalbody
    keypoint row/col order, and asserts real-vs-synthetic IMU orientation
    agreement (< 17 deg mean) plus joint-position agreement."""
    import jax.numpy as jnp
    model = model or default_body_model()
    torch = _torch()
    data = torch.load(os.path.join(raw_dir, "total_capture_data.pt"),
                      map_location="cpu", weights_only=False)
    cams = data["cam"]
    cam_K = np.stack([K for _, _, K in cams])
    Rs = np.stack([R for R, _, _ in cams])
    ts = np.stack([t for _, t, _ in cams])
    cam_T = np.tile(np.eye(4, dtype=np.float32), (len(cams), 1, 1))
    cam_T[:, :3, :3] = Rs
    cam_T[:, :3, 3] = ts

    # sequence names come from the per-motion video listings, stripping the
    # "_cam#.mp4" suffix (preprocess.py:399-404); fall back to pickle stems
    names = []
    for f in data.get("files", []):
        subject = f.split("_")[0].upper()
        motion = f.split(".")[0].split("_")[1]
        vdir = os.path.join(raw_dir, "video", subject, motion)
        if os.path.isdir(vdir):
            vids = sorted(set(v[:-9] for v in os.listdir(vdir)))
            names.append(vids[0] if vids else f.split(".")[0])
        else:
            names.append(f.split(".")[0])
    if not names:
        names = [f"tc_{i}" for i in range(len(data["pose"]))]
    new = {k: [] for k in ["name", "pose", "tran", "joint2d_minimalbody",
                           "joint2d_mp", "joint3d", "cam_K", "cam_T",
                           "imu_ori", "imu_acc"]}
    n = 0
    for i in range(len(data["pose"])):
        if i in set(skip):   # video-motion not aligned (preprocess.py:420)
            continue
        pose = np.asarray(data["pose"][i], np.float32)
        tran = np.asarray(data["tran"][i], np.float32)
        T = len(pose)
        real_ori = np.asarray(data["ori"][i], np.float32)
        real_acc = np.asarray(data["acc"][i], np.float32)
        real_kp2d = np.stack([np.asarray(k, np.float32)[:T]
                              for k in data["kp_2d"][i]])
        real_kpmp = np.stack([np.asarray(k, np.float32)[:T]
                              for k in data["kp_mp"][i]])

        glb, joint, _ = model.forward_kinematics(
            jnp.asarray(pose), tran=jnp.asarray(tran), calc_mesh=True,
            vertex_ids=np.asarray([0]))
        syn_ori = np.array(glb[:, jnp.asarray(_JI)])
        syn_joint = np.array(joint)

        ang = float(np.asarray(M.radian_to_degree(M.angle_between(
            jnp.asarray(real_ori), jnp.asarray(syn_ori)).mean())))
        assert ang < max_imu_angle_deg, (
            f"real-vs-synthetic IMU disagreement {ang:.1f} deg on seq {i}")
        kp3d = np.asarray(data["kp_3d"][i], np.float32)
        assert float(np.abs(kp3d[:, :22] - syn_joint[:, :22]).sum()) < 0.01

        pose_aa = np.array(M.rotation_matrix_to_axis_angle(
            jnp.asarray(pose.reshape(-1, 3, 3)))).reshape(-1, 24, 3)
        new["name"].append(names[i])
        new["pose"].append(pose_aa)
        new["tran"].append(tran)
        new["joint2d_minimalbody"].append(real_kp2d[..., [1, 0, 2]])
        new["joint2d_mp"].append(real_kpmp)
        new["cam_K"].append(cam_K)
        new["cam_T"].append(cam_T)
        new["imu_ori"].append(real_ori)
        new["imu_acc"].append(real_acc)
        new["joint3d"].append(kp3d)
        n += 1
    os.makedirs(out_dir, exist_ok=True)
    torch.save(new, os.path.join(out_dir, "test.pt"))
    return n


# ---------------------------------------------------------------------------
# 3DPW / 3DPW-OCC (preprocess.py:452-497, 563-609)
# ---------------------------------------------------------------------------


def _interp_30_to_60(frames: Sequence, n_cols: int,
                     rng: np.random.RandomState) -> np.ndarray:
    r"""30->60 Hz keypoint upsampling by midpoint interpolation; the last
    frame is duplicated (preprocess.py:474-483)."""
    filled = fill_missing_frames(frames, n_cols=n_cols, rng=rng)
    out = []
    for i in range(len(filled)):
        out.append(filled[i])
        if i == len(filled) - 1:
            out.append(filled[i])
        else:
            out.append((filled[i] + filled[i + 1]) / 2.0)
    return np.stack(out)


def preprocess_3dpw(raw_dir: str, out_dir: str, occ: bool = False,
                    model: Optional[ParametricModel] = None,
                    split: str = "test") -> int:
    r"""3DPW corpus driver (preprocess.py:452-497; occluded variant
    :563-609): per-person camera-frame pose/translation, shape-aware FK,
    virtual IMU synthesis, 30->60 Hz keypoint interpolation. Writes
    ``test.pt`` or ``test_occ.pt``; returns the number of person-sequences.
    """
    import jax.numpy as jnp
    model = model or default_body_model()
    torch = _torch()
    kp_dir = "kp2d_occ_mp" if occ else "kp2d_mp"
    seq_dir = os.path.join(raw_dir, "sequenceFiles",
                           "all" if occ else split)
    if occ:
        sequences = sorted(set(
            "_".join(x.split("_")[:3])
            for x in os.listdir(os.path.join(raw_dir, kp_dir))))
    else:
        sequences = sorted(x.split(".")[0] for x in os.listdir(seq_dir))
    new = {k: [] for k in ["name", "posec", "tranc", "joint2d_mp", "joint3d",
                           "cam_K", "cam_T", "imu_oric", "imu_accc", "shape"]}
    rng = np.random.RandomState(0)
    n = 0
    for name in sequences:
        data = pickle.load(
            open(os.path.join(seq_dir, name + ".pkl"), "rb"),
            encoding="latin1")
        for p_id in range(len(data["poses"])):
            pose = np.asarray(data["poses_60Hz"][p_id], np.float32)
            shape = np.asarray(data["betas"][p_id][:10], np.float32)
            cam_pose = np.repeat(np.asarray(data["cam_poses"], np.float32),
                                 2, axis=0)
            trans = np.asarray(data["trans_60Hz"][p_id],
                               np.float32)[:len(cam_pose)]
            K = np.asarray(data["cam_intrinsics"], np.float32)
            posec = np.array(M.axis_angle_to_rotation_matrix(
                jnp.asarray(pose.reshape(-1, 3)))
            ).reshape(-1, 24, 3, 3)[:len(cam_pose)]
            cam_pose = cam_pose[:len(posec)]
            posec[:, 0] = np.einsum("tij,tjk->tik", cam_pose[:, :3, :3],
                                    posec[:, 0])
            tranc = (np.einsum("tij,tj->ti", cam_pose[:, :3, :3], trans)
                     + cam_pose[:, :3, 3])
            need = np.union1d(_MP, _VI)
            glb, joint, verts = model.forward_kinematics(
                jnp.asarray(posec), shape=jnp.asarray(shape),
                tran=jnp.asarray(tranc), calc_mesh=True, vertex_ids=need)
            vi_idx = np.searchsorted(need, _VI)
            oric = np.array(glb[:, jnp.asarray(_JI)])
            accc = np.array(synthesis.syn_acc(verts[:, vi_idx]))
            mp_data = torch.load(
                os.path.join(raw_dir, kp_dir, f"{name}_{p_id}.pt"),
                map_location="cpu", weights_only=False)
            joint_2d = _interp_30_to_60(mp_data, 3, rng)[:len(posec)]
            assert (posec.shape[0] == tranc.shape[0] == oric.shape[0]
                    == accc.shape[0] == len(joint_2d))
            new["name"].append(name)
            new["posec"].append(posec)
            new["tranc"].append(tranc.astype(np.float32))
            new["joint2d_mp"].append(joint_2d.astype(np.float32))
            new["joint3d"].append(np.array(joint))
            new["cam_K"].append(K)
            new["cam_T"].append(cam_pose)
            new["imu_oric"].append(oric)
            new["imu_accc"].append(accc)
            new["shape"].append(shape)
            n += 1
    os.makedirs(out_dir, exist_ok=True)
    torch.save(new, os.path.join(
        out_dir, "test_occ.pt" if occ else "test.pt"))
    return n
