r"""Offline dataset evaluation — the reference ``evaluate.py`` API, batched.

Public entry points preserved from the reference:

* ``evaluate_aist_ours(run_smplify=True)``   (evaluate.py:20-117)
* ``evaluate_tc_ours(run_smplify=True)``     (evaluate.py:135-225)
* ``evaluate_pw3d_ours(run_smplify=True, occ=False)`` (evaluate.py:228-313)
* ``cal_mpjpe(pose, gt_pose, cal_pampjpe=False)``     (evaluate.py:120-133)

Differences are architectural, not semantic: inference runs as bucketed
``vmap``'d scans on the accelerator (see ``runner.py``); the MPJPE/PVE/
PA-MPJPE pipeline (H36M-regressed 14 joints, pelvis alignment, batched
Procrustes) is one jitted function per sequence instead of per-frame host
math; results and errors are cached to ``result.pt`` / ``errors.pt``
exactly like the reference (evaluate.py:55,98,106-110).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SigMPConfig, paths
from ..ops.procrustes import reconstruction_error_np
from ..smpl.model import ParametricModel, default_body_model
from .datasets import (build_aist_sequences, build_pw3d_sequences,
                       build_tc_sequences, load_torch_file)
from .evaluator import PositionErrorEvaluator
from .runner import run_sequences

__all__ = ["cal_mpjpe", "evaluate_aist_ours", "evaluate_tc_ours",
           "evaluate_pw3d_ours", "evaluate_sequences"]


_WARNED_REGRESSOR = False


def _load_j_regressor(model: ParametricModel) -> np.ndarray:
    r"""H36M 14-joint regressor (evaluate.py:17). Falls back to the body
    model's own regressor rows when the asset is absent (procedural mode) —
    with a loud warning, because the fallback CHANGES the metric definition:
    MPJPE over the SMPL model's first 14 joints is not comparable to
    published H36M-regressed numbers."""
    global _WARNED_REGRESSOR
    if os.path.exists(paths.j_regressor_file):
        return np.load(paths.j_regressor_file).astype(np.float32)
    if not _WARNED_REGRESSOR:
        import warnings
        warnings.warn(
            f"H36M joint regressor not found at {paths.j_regressor_file}; "
            "falling back to the body model's own first 14 regressor rows. "
            "MPJPE/PA-MPJPE computed this way are NOT comparable to "
            "published H36M-regressed numbers — install "
            "J_regressor_h36m.npy for metric parity.", stacklevel=2)
        _WARNED_REGRESSOR = True
    return np.asarray(model._J_regressor)[:14]


def _make_mpjpe_fn(model: ParametricModel, j_regressor: np.ndarray):
    jreg = jnp.asarray(j_regressor[:14])

    @jax.jit
    def device_part(pose_p, pose_t):
        _, _, vert_t = model.forward_kinematics(pose_t, calc_mesh=True)
        _, _, vert_p = model.forward_kinematics(pose_p, calc_mesh=True)
        kp_t = jnp.einsum("jv,tvc->tjc", jreg, vert_t)
        kp_p = jnp.einsum("jv,tvc->tjc", jreg, vert_p)
        kp_t = kp_t - kp_t[:, :1]
        kp_p = kp_p - kp_p[:, :1]
        mpjpe = jnp.linalg.norm(kp_p - kp_t, axis=2).mean()
        pve = jnp.linalg.norm(vert_p - vert_t, axis=2).mean()
        return mpjpe, pve, kp_p, kp_t

    def fn(pose_p, pose_t):
        mpjpe, pve, kp_p, kp_t = device_part(pose_p, pose_t)
        # PA-MPJPE in float64 on host: f32 SVD noise (~1 mm) is material
        pampjpe = reconstruction_error_np(kp_p, kp_t)
        return jnp.stack([mpjpe, pve, jnp.asarray(pampjpe, jnp.float32)])

    return fn


_MPJPE_CACHE = {}


def cal_mpjpe(pose, gt_pose, cal_pampjpe: bool = False,
              model: Optional[ParametricModel] = None):
    r"""[mpjpe, pve(, pa-mpjpe)] for one sequence (evaluate.py:120-133)."""
    model = model or default_body_model()
    key = id(model)
    if key not in _MPJPE_CACHE:
        _MPJPE_CACHE[key] = _make_mpjpe_fn(model, _load_j_regressor(model))
    pose = jnp.asarray(np.asarray(pose), jnp.float32).reshape(-1, 24, 3, 3)
    gt_pose = jnp.asarray(np.asarray(gt_pose), jnp.float32).reshape(-1, 24, 3, 3)
    out = _MPJPE_CACHE[key](pose, gt_pose)
    return out if cal_pampjpe else out[:2]


def _maybe_smplify(results, seqs, run_smplify: bool, model=None, mesh=None):
    r"""Batched LBFGS refinement over whole groups of sequences: same
    hyperparameters as the reference's per-sequence call (lr=0.001, lbfgs,
    1 step, gate at 20000 — evaluate.py:89-90), but same-length sequences
    refine together in one vmapped compiled program (lane axis sharded
    over ``mesh`` when given — lanes are independent, so sharding is pure
    data parallelism)."""
    if not run_smplify:
        return results
    from ..smplify.runner import refine_sequences_batched
    refined = refine_sequences_batched(results, seqs, lr=0.001, opt_steps=1,
                                       model=model, mesh=mesh)
    return [(np.asarray(p), np.asarray(t)) for p, t in refined]


def evaluate_sequences(seqs, params=None, model=None, cfg=SigMPConfig(),
                       first_tran_mode="gt", run_smplify=False, mesh=None,
                       cache_path=None, pad_to_multiple=128, max_bucket=32,
                       extended_metrics=False, cache_format="result4"):
    r"""Shared eval pipeline: run (or load cached), refine, score.

    Returns dict with per-sequence arrays and aggregate metrics.
    ``extended_metrics=True`` additionally aggregates the FullMotionEvaluator
    battery (joint/vertex/angle errors, jerk, 1-s drift, tracking error —
    defined but never wired in the reference, SURVEY.md §6) under
    ``"full_motion"`` [11, 2].

    ``cache_format`` matches the reference's two on-disk layouts:
    ``"result4"`` = [pose_p, pose_t, tran_p, tran_t] (AIST/TC result.pt,
    evaluate.py:98) and ``"result2"`` = [pose_p, tran_p] (3DPW result2.pt,
    evaluate.py:282). Loading auto-detects either layout."""
    model = model or default_body_model()
    if cache_path is not None and os.path.exists(cache_path):
        import torch
        loaded = torch.load(cache_path, map_location="cpu",
                            weights_only=False)
        if len(loaded) == 2:
            pose_p, tran_p = loaded
        else:
            pose_p, _, tran_p, _ = loaded
        pose_p = [np.asarray(p) for p in pose_p]
        tran_p = [np.asarray(t) for t in tran_p]
    else:
        assert params is not None, "params required when no cached result"
        results = run_sequences(params, model, cfg, seqs, first_tran_mode,
                                mesh=mesh, pad_to_multiple=pad_to_multiple,
                                max_bucket=max_bucket)
        results = _maybe_smplify(results, seqs, run_smplify, model=model,
                                 mesh=mesh)
        pose_p = [r[0] for r in results]
        tran_p = [r[1] for r in results]
        if cache_path is not None:
            import torch
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)

            def tt(arrs):
                # store torch tensors: the reference's cache branch applies
                # tensor methods to the loaded entries (evaluate.py:104,122),
                # so numpy payloads would break cross-implementation reuse
                return [torch.from_numpy(
                    np.ascontiguousarray(a, np.float32)) for a in arrs]

            if cache_format == "result2":
                torch.save([tt(pose_p), tt(tran_p)], cache_path)
            else:
                torch.save([tt(pose_p), tt([s.pose_gt for s in seqs]),
                            tt(tran_p), tt([s.tran_gt for s in seqs])],
                           cache_path)
    pose_t = [s.pose_gt for s in seqs]
    tran_t = [s.tran_gt for s in seqs]
    errors = np.stack([
        np.asarray(cal_mpjpe(pose_p[i], pose_t[i], cal_pampjpe=True,
                             model=model))
        for i in range(len(seqs))])
    valid = np.asarray([s.valid for s in seqs])
    tran_eval = PositionErrorEvaluator()
    tran_err = np.asarray([float(tran_eval(tran_p[i], tran_t[i]))
                           for i in range(len(seqs))])
    out = {
        "pose_p": pose_p, "tran_p": tran_p,
        "pose_t": pose_t, "tran_t": tran_t,
        "errors": errors, "tran_errors": tran_err, "valid": valid,
        "mpjpe": float(errors[valid, 0].mean()),
        "pve": float(errors[valid, 1].mean()),
        "pampjpe": float(errors[valid, 2].mean()),
        "tran_error": float(tran_err[valid].mean()),
    }
    if extended_metrics:
        from .evaluator import FullMotionEvaluator
        fme = FullMotionEvaluator(model=model)
        per_seq = [np.asarray(fme(pose_p[i], pose_t[i],
                                  tran_p=tran_p[i], tran_t=tran_t[i]))
                   for i in range(len(seqs)) if valid[i]]
        out["full_motion"] = np.stack(per_seq).mean(axis=0)
    return out


def evaluate_aist_ours(run_smplify: bool = True, params=None, model=None,
                       dataset=None, mesh=None, use_cache: bool = True):
    r"""AIST++ evaluation (evaluate.py:20-117): 9 cameras, GT first
    translation, not_aligned filtering, MPJPE/PVE/PA-MPJPE + absolute root
    position error."""
    model = model or default_body_model()
    if dataset is None:
        dataset = load_torch_file(os.path.join(paths.aist_dir, "test.pt"))
    na_file = os.path.join(paths.aist_dir, "not_aligned.txt")
    not_aligned = ([l.strip() for l in open(na_file)]
                   if os.path.exists(na_file) else [])
    seqs = build_aist_sequences(dataset, not_aligned)
    cache = (os.path.join(paths.aist_dir, "result.pt") if use_cache else None)
    out = evaluate_sequences(seqs, params, model, SigMPConfig(),
                             first_tran_mode="gt", run_smplify=run_smplify,
                             mesh=mesh, cache_path=cache)
    print("mpjpe, pve, pampjpe:", out["mpjpe"], out["pve"], out["pampjpe"])
    print("absolute root position error:", out["tran_error"])
    return out


def evaluate_tc_ours(run_smplify: bool = True, params=None, model=None,
                     dataset=None, mesh=None, use_cache: bool = True):
    r"""TotalCapture evaluation (evaluate.py:135-225): real IMUs, 8 cameras,
    first_frame seeding, end-frame translation alignment before the root
    position error (evaluate.py:220-222)."""
    model = model or default_body_model()
    if dataset is None:
        dataset = load_torch_file(
            os.path.join(paths.totalcapture_dir, "test.pt"))
    seqs = build_tc_sequences(dataset)
    cache = (os.path.join(paths.totalcapture_dir, "result.pt")
             if use_cache else None)
    out = evaluate_sequences(seqs, params, model, SigMPConfig(),
                             first_tran_mode="first_frame",
                             run_smplify=run_smplify, mesh=mesh,
                             cache_path=cache)
    # end-frame-aligned translation error
    tran_eval = PositionErrorEvaluator()
    errs = []
    for i in range(len(seqs)):
        offset = out["tran_t"][i][-1] - out["tran_p"][i][-1]
        errs.append(float(tran_eval(out["tran_p"][i] + offset,
                                    out["tran_t"][i])))
    out["tran_error"] = float(np.mean(errs))
    print("mpjpe, pve, pampjpe:", out["mpjpe"], out["pve"], out["pampjpe"])
    print("absolute root position error:", out["tran_error"])
    return out


def evaluate_pw3d_ours(run_smplify: bool = True, occ: bool = False,
                       params=None, model=None, dataset=None, mesh=None,
                       use_cache: bool = True):
    r"""3DPW / 3DPW-OCC evaluation (evaluate.py:228-313): camera-frame data,
    flat floor disabled (evaluate.py:254), per-frame gravity."""
    model = model or default_body_model()
    if dataset is None:
        name = "test_occ.pt" if occ else "test.pt"
        dataset = load_torch_file(os.path.join(paths.pw3d_dir, name))
    seqs = build_pw3d_sequences(dataset)
    cache_name = "result_occ2.pt" if occ else "result2.pt"
    cache = (os.path.join(paths.pw3d_dir, cache_name) if use_cache else None)
    out = evaluate_sequences(seqs, params, model,
                             SigMPConfig(use_flat_floor=False),
                             first_tran_mode="gt", run_smplify=run_smplify,
                             mesh=mesh, cache_path=cache,
                             cache_format="result2")
    print("mpjpe, pve, pampjpe:", out["mpjpe"], out["pve"], out["pampjpe"])
    return out
