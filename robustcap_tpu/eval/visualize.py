r"""Evaluation visualization entry points.

Rebuild of the reference's ``view_aist`` / ``view_aist_unity``
(evaluate.py:316-415): run the network (+ optional SMPLify) on one
sequence/camera and either render mesh-overlay frames or export
Unity-format motion text files. Rendering uses the software rasterizer when
pyrender is unavailable; video writing uses imageio/cv2 when present and
otherwise saves PNG-free raw frames via numpy.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import SigMPConfig, paths
from ..models import sig_mp
from ..smpl.model import default_body_model
from .datasets import build_aist_sequences, load_torch_file

__all__ = ["run_single_view", "view_aist", "view_aist_unity"]


def run_single_view(params, model, seq, cfg: Optional[SigMPConfig] = None,
                    run_smplify: bool = True):
    r"""Network (+ SMPLify) on one EvalSequence -> (pose [T,24,3,3],
    tran [T,3]) (evaluate.py:341-352)."""
    cfg = cfg or SigMPConfig()
    pose, tran = sig_mp.forward_offline(
        params, model, cfg, seq.j2dc, seq.accc, seq.oric,
        first_tran=seq.first_tran, first_frame=seq.first_frame,
        gravityc=seq.gravityc)
    pose, tran = np.asarray(pose), np.asarray(tran)
    if run_smplify:
        from ..smplify.runner import smplify_runner
        pose, tran, _ = smplify_runner(
            pose, tran, seq.j2dc_px, seq.oric, batch_size=len(pose),
            cam_k=seq.cam_K, lr=0.001, use_lbfgs=True, opt_steps=1,
            use_head=True, model=model)
    return pose, tran


def view_aist(seq_idx: int = 0, cam_idx: int = 0, run_smplify: bool = True,
              params=None, model=None, dataset=None, save_dir=None,
              max_frames: Optional[int] = None):
    r"""Overlay the predicted mesh on the camera view (evaluate.py:316-370).

    Returns the rendered frames; writes ``result.mp4`` when imageio/cv2 is
    available and ``save_dir`` given.
    """
    model = model or default_body_model()
    if dataset is None:
        dataset = load_torch_file(os.path.join(paths.aist_dir, "test.pt"))
    n_cam = len(dataset["cam_K"][0])
    seqs = build_aist_sequences(dataset, num_cameras=n_cam)
    seq = seqs[seq_idx * n_cam + cam_idx]
    pose, tran = run_single_view(params, model, seq, run_smplify=run_smplify)
    if max_frames:
        pose, tran = pose[:max_frames], tran[:max_frames]

    from ..viz.render import Renderer
    import jax.numpy as jnp
    render = Renderer(resolution=(1920, 1080), model=model)
    frames = []
    for t in range(len(pose)):
        verts = model.forward_kinematics(
            jnp.asarray(pose[t:t + 1]), tran=jnp.asarray(tran[t:t + 1]),
            calc_mesh=True)[2][0]
        frames.append(render.render(None, np.asarray(verts), seq.cam_K))
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        _write_video(frames, os.path.join(save_dir, "result.mp4"))
    return frames


def _write_video(frames, path, fps=30):
    r"""Write frames as a video: imageio (ffmpeg) -> cv2 -> raw .npy."""
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        import cv2
        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            writer.write(np.asarray(f)[..., ::-1])  # RGB -> BGR
        writer.release()
        return path
    except Exception:
        np.save(path + ".npy", np.stack(frames[:32]))
        return path + ".npy"


def view_aist_unity(seq_idx: int = 0, cam_idx: int = 0, params=None,
                    model=None, dataset=None, out_dir=None):
    r"""Export the prediction as Unity LoadMotion() text files
    (evaluate.py:373-415): live-mode flags, pose/translation de-rotated to
    world by Tcw^T and zeroed at the first frame."""
    model = model or default_body_model()
    if dataset is None:
        dataset = load_torch_file(os.path.join(paths.aist_dir, "test.pt"))
    n_cam = len(dataset["cam_K"][0])
    seqs = build_aist_sequences(dataset, num_cameras=n_cam)
    seq = seqs[seq_idx * n_cam + cam_idx]
    pose, tran = run_single_view(params, model, seq,
                                 cfg=SigMPConfig.live_mode(),
                                 run_smplify=False)
    pose = np.array(pose)  # writable copy (jax buffers are read-only)
    tran = np.array(tran)
    Tcw = np.asarray(dataset["cam_T"][seq_idx][cam_idx], np.float32)
    R = Tcw[:3, :3]
    pose[:, 0] = np.einsum("ji,tjk->tik", R, pose[:, 0])
    tran = tran @ R + Tcw[:3, 3]
    tran = tran - tran[:1]
    out_dir = out_dir or os.path.join(
        paths.temp_dir, f"aist_{seq_idx}_{cam_idx}_unity", "0")
    model.save_unity_motion(pose, tran, out_dir)
    return out_dir
