r"""Temporal SMPLify refinement: whole-sequence LBFGS fitting on device.

Rebuild of the reference's ``net/smplify/temporal_smplify.py`` +
``net/smplify/run.py``: refine a sequence's (axis-angle pose, translation)
against 2-D keypoints, the network's own 3-D prediction, a GMM pose prior,
and IMU orientations, with LBFGS + strong Wolfe (temporal_smplify.py:151).

The reference's hot loop #2 (SURVEY.md §3.1) re-runs a Python closure with
full-mesh FK per LBFGS evaluation; here the closure skins only the 33
landmark vertices and the entire optimization (LBFGS iterations + line
search) compiles into a single XLA while-loop. Sequences are padded to a
small set of bucket lengths with loss masking so recompilation is rare.

Parity notes:
* the entry gate skips optimization when frame 0's reprojection loss exceeds
  ``loss_threshold`` (run.py:27-29),
* the ignored-joint confidence zeroing ([1..9, 31, 32] without head, [31, 32]
  with, temporal_smplify.py:92-94,148),
* the returned ``update`` mask marks frames whose reprojection loss improved
  (run.py:32-35); like the reference's caller, we return the refined values
  regardless.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as M
from ..config import IMU_JOINT_MASK, MP_VERTEX_MASK
from ..ops.lbfgs import lbfgs_minimize
from ..smpl.model import ParametricModel, default_body_model
from .losses import temporal_body_fitting_loss
from .prior import MaxMixturePrior

__all__ = ["TemporalSMPLify", "smplify_runner", "make_smplify_fit",
           "refine_sequences_batched"]

_MP_MASK = np.asarray(MP_VERTEX_MASK, np.int32)
_JI_MASK = np.asarray(IMU_JOINT_MASK, np.int32)

IGN_MP_JOINTS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 31, 32]
IGN_MP_JOINTS_HEAD = [31, 32]


def _sync_mp3d_batch(verts_mp, joints):
    r"""Batched landmark synthesis (utils.py:129-135); ``verts_mp`` already
    gathered at the landmark vertex ids."""
    syn = verts_mp
    syn = syn.at[:, 11:17].set(joints[:, 16:22])
    syn = syn.at[:, 23:25].set(joints[:, 1:3])
    syn = syn.at[:, 25:27].set(joints[:, 4:6])
    syn = syn.at[:, 27:29].set(joints[:, 7:9])
    return syn


class TemporalSMPLify:
    r"""Sequence SMPLify optimizer (temporal_smplify.py:61-220)."""

    def __init__(self, cam_k, imu_ori, step_size: float = 1.0,
                 num_iters: int = 1, use_lbfgs: bool = True,
                 batch_size: int = 1, max_iter: int = 20, shape=None,
                 use_head: bool = False,
                 model: Optional[ParametricModel] = None,
                 prior: Optional[MaxMixturePrior] = None,
                 prior_folder: str = "data/dataset_work"):
        self.model = model or default_body_model()
        self.prior = prior or MaxMixturePrior(prior_folder, num_gaussians=8)
        self.cam_k = jnp.asarray(np.asarray(cam_k), jnp.float32)
        self.imu_ori = jnp.asarray(np.asarray(imu_ori), jnp.float32)
        self.step_size = step_size
        self.num_iters = num_iters
        self.use_lbfgs = use_lbfgs
        self.max_iter = max_iter
        self.shape = None if shape is None else jnp.asarray(shape)
        self.ign = IGN_MP_JOINTS_HEAD if use_head else IGN_MP_JOINTS

    # -- shared forward -----------------------------------------------------

    def _landmarks(self, pose_R, tran):
        gp, joints, verts = self.model.forward_kinematics(
            pose_R, shape=self.shape, tran=tran, calc_mesh=True,
            vertex_ids=_MP_MASK)
        return gp, _sync_mp3d_batch(verts, joints)

    def _loss(self, body_pose_aa, tran, joints_2d, joints_conf, imu_ori,
              mask, output="sum"):
        B = body_pose_aa.shape[0]
        pose_R = M.axis_angle_to_rotation_matrix(
            body_pose_aa.reshape(-1, 3)).reshape(B, 24, 3, 3)
        gp, model_joints = self._landmarks(pose_R, tran)
        return temporal_body_fitting_loss(
            body_pose_aa, model_joints, joints_2d,
            joints_conf * mask[:, None], self.prior, self.cam_k,
            self._target_3d, imu_ori, gp[:, _JI_MASK], output=output,
            frame_mask=mask)

    # -- public API ---------------------------------------------------------

    def get_fitting_loss(self, pose, tran, keypoints_2d, mask=None):
        r"""Per-frame reprojection loss of the given motion
        (temporal_smplify.py:198-220)."""
        B = pose.shape[0]
        if mask is None:
            mask = jnp.ones(B)
        conf = keypoints_2d[..., 2].at[:, jnp.asarray(self.ign)].set(0.0)
        pose_R = jnp.asarray(pose).reshape(B, 24, 3, 3)
        gp, model_joints = self._landmarks(pose_R, jnp.asarray(tran))
        self._target_3d = jax.lax.stop_gradient(model_joints)
        body_pose = M.rotation_matrix_to_axis_angle(pose_R).reshape(B, -1)
        return temporal_body_fitting_loss(
            body_pose, model_joints, keypoints_2d[..., :2],
            conf * mask[:, None], self.prior, self.cam_k, self._target_3d,
            self.imu_ori, gp[:, _JI_MASK], output="reprojection")

    def __call__(self, init_pose, init_tran, keypoints_2d, mask=None):
        r"""Optimize (pose, tran); returns (pose_R [B,24,3,3], tran [B,3],
        reprojection loss [B, 33]) (temporal_smplify.py:97-196)."""
        B = init_pose.shape[0]
        if mask is None:
            mask = jnp.ones(B)
        pose_R0 = jnp.asarray(init_pose).reshape(B, 24, 3, 3)
        tran0 = jnp.asarray(init_tran).reshape(B, 3)
        conf = keypoints_2d[..., 2].at[:, jnp.asarray(self.ign)].set(0.0)
        joints_2d = keypoints_2d[..., :2]

        # consistency target: the network's own landmarks (frozen)
        gp0, lm0 = self._landmarks(pose_R0, tran0)
        self._target_3d = jax.lax.stop_gradient(lm0)
        body_pose0 = M.rotation_matrix_to_axis_angle(pose_R0).reshape(B, -1)

        x0 = jnp.concatenate([body_pose0.reshape(-1), tran0.reshape(-1)])

        def loss_flat(x):
            bp = x[:B * 72].reshape(B, 72)
            tr = x[B * 72:].reshape(B, 3)
            return self._loss(bp, tr, joints_2d, conf, self.imu_ori, mask)

        x = x0
        if self.use_lbfgs:
            for _ in range(self.num_iters):
                x, _, _ = lbfgs_minimize(loss_flat, x,
                                         max_iter=self.max_iter,
                                         lr=self.step_size)
        else:
            # the reference's alternate branch: plain Adam steps
            # (temporal_smplify.py:170-186, lr=step_size, betas=(0.9, 0.999))
            import optax
            tx = optax.adam(self.step_size, b1=0.9, b2=0.999)
            opt_state = tx.init(x)
            grad_fn = jax.grad(loss_flat)
            for _ in range(self.num_iters):
                updates, opt_state = tx.update(grad_fn(x), opt_state, x)
                x = optax.apply_updates(x, updates)
        body_pose = x[:B * 72].reshape(B, 72)
        tran = x[B * 72:].reshape(B, 3)
        reproj = self._loss(body_pose, tran, joints_2d, conf, self.imu_ori,
                            mask, output="reprojection")
        pose_R = M.axis_angle_to_rotation_matrix(
            body_pose.reshape(-1, 3)).reshape(B, 24, 3, 3)
        return pose_R, tran, reproj


def _pad_to(x, L):
    pad = L - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)


def make_smplify_fit(model: ParametricModel, prior: MaxMixturePrior,
                     use_head: bool = False, max_iter: int = 20,
                     lr: float = 1.0, num_iters: int = 1, shape=None):
    r"""Pure, vmappable single-sequence refinement.

    ``fit(pose0_R [T,24,3,3], tran0 [T,3], kp_px [T,33,3], imu_ori
    [T,6,3,3], cam_k [3,3], mask [T]) -> (pose_R, tran, loss_before [T],
    loss_after [T])``. Unlike ``TemporalSMPLify`` (which mirrors the
    reference's stateful object), everything — camera, IMUs, targets — is an
    argument, so whole groups of sequences refine in one vmapped LBFGS
    program (the while_loop freezes converged lanes).
    """
    ign = jnp.asarray(IGN_MP_JOINTS_HEAD if use_head else IGN_MP_JOINTS)
    shape = None if shape is None else jnp.asarray(shape)

    def landmarks(pose_R, tran):
        gp, joints, verts = model.forward_kinematics(
            pose_R, shape=shape, tran=tran, calc_mesh=True,
            vertex_ids=_MP_MASK)
        return gp, _sync_mp3d_batch(verts, joints)

    def reproj_loss(body_pose, model_joints, gp, kp_px, conf, target_3d,
                    imu_ori, cam_k):
        return temporal_body_fitting_loss(
            body_pose, model_joints, kp_px[..., :2], conf, prior, cam_k,
            target_3d, imu_ori, gp[:, _JI_MASK], output="reprojection")

    def fit(pose0_R, tran0, kp_px, imu_ori, cam_k, mask):
        B = pose0_R.shape[0]
        conf = kp_px[..., 2].at[:, ign].set(0.0) * mask[:, None]
        gp0, lm0 = landmarks(pose0_R, tran0)
        target_3d = jax.lax.stop_gradient(lm0)
        body_pose0 = M.rotation_matrix_to_axis_angle(pose0_R).reshape(B, -1)
        loss_before = reproj_loss(body_pose0, lm0, gp0, kp_px, conf,
                                  target_3d, imu_ori, cam_k).mean(-1)

        def loss_flat(x):
            bp = x[:B * 72].reshape(B, 72)
            tr = x[B * 72:].reshape(B, 3)
            pose_R = M.axis_angle_to_rotation_matrix(
                bp.reshape(-1, 3)).reshape(B, 24, 3, 3)
            gp, mj = landmarks(pose_R, tr)
            return temporal_body_fitting_loss(
                bp, mj, kp_px[..., :2], conf, prior, cam_k, target_3d,
                imu_ori, gp[:, _JI_MASK], output="sum", frame_mask=mask)

        x = jnp.concatenate([body_pose0.reshape(-1), tran0.reshape(-1)])
        for _ in range(num_iters):
            x, _, _ = lbfgs_minimize(loss_flat, x, max_iter=max_iter, lr=lr)
        bp = x[:B * 72].reshape(B, 72)
        tr = x[B * 72:].reshape(B, 3)
        pose_R = M.axis_angle_to_rotation_matrix(
            bp.reshape(-1, 3)).reshape(B, 24, 3, 3)
        gp, mj = landmarks(pose_R, tr)
        loss_after = reproj_loss(bp, mj, gp, kp_px, conf, target_3d,
                                 imu_ori, cam_k).mean(-1)
        return pose_R, tr, loss_before, loss_after

    return fit


_DEFAULT_PRIOR = {}


def _default_prior(folder: str = "data/dataset_work") -> MaxMixturePrior:
    r"""Process-wide default GMM prior. Must be a singleton: the jitted-fit
    cache below keys on ``id(prior)``, so a fresh prior per call would
    recompile the whole LBFGS program on every eval invocation."""
    if folder not in _DEFAULT_PRIOR:
        _DEFAULT_PRIOR[folder] = MaxMixturePrior(folder, num_gaussians=8)
    return _DEFAULT_PRIOR[folder]


# jitted fit programs, keyed by (model, prior, hyperparams, batched?). The
# whole refinement — LBFGS iterations, strong-Wolfe line search, landmark
# FK — is ONE compiled XLA program; sequence lengths are padded to buckets
# upstream so the cache stays small.
_FIT_CACHE = {}


def _jitted_fit(model, prior, use_head, max_iter, lr, num_iters,
                batched: bool):
    key = (id(model), id(prior), use_head, max_iter, float(lr), num_iters,
           batched)
    if key not in _FIT_CACHE:
        fit = make_smplify_fit(model, prior, use_head=use_head,
                               max_iter=max_iter, lr=lr, num_iters=num_iters)
        _FIT_CACHE[key] = jax.jit(jax.vmap(fit) if batched else fit)
    return _FIT_CACHE[key]


def refine_sequences_batched(results, seqs, lr: float = 0.001,
                             opt_steps: int = 1, use_head: bool = False,
                             model=None, prior=None,
                             pad_to_multiple: int = 128,
                             loss_threshold: float = 20000.0,
                             group_size: int = 16, mesh=None):
    r"""Refine many sequences with grouped, vmapped LBFGS.

    Groups same-padded-length sequences (up to ``group_size``) and runs one
    vmapped fit per group — each lane optimizes independently and converged
    lanes freeze, so per-sequence results match standalone runs up to float
    reduction order. The reference's per-frame gate semantics are applied
    per sequence (frame-0 reprojection loss > threshold -> keep the network
    output, run.py:27-29). Returns [(pose, tran)] in input order.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over a ``data`` axis) the
    lane axis shards over the mesh — each device fits ``group_size/n``
    sequences of the vmapped program, with no cross-lane communication
    (lanes are independent), so sharded results equal single-device ones
    up to float reassociation. ``group_size`` must divide evenly over the
    mesh (the remainder-group lane padding already guarantees full groups).
    """
    model = model or default_body_model()
    prior = prior or _default_prior()
    vfit = _jitted_fit(model, prior, use_head, 20, lr, opt_steps,
                       batched=True)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        _lane_sharding = NamedSharding(mesh, PartitionSpec("data"))

        def _put(x):
            return jax.device_put(jnp.asarray(x), _lane_sharding)
    else:
        _put = jnp.asarray

    # group indices by padded length
    lengths = {}
    for i, s in enumerate(seqs):
        L = -(-s.length // pad_to_multiple) * pad_to_multiple
        lengths.setdefault(L, []).append(i)

    out = [None] * len(seqs)
    for L, idxs in lengths.items():
        for g in range(0, len(idxs), group_size):
            group = idxs[g:g + group_size]
            # pad the final group's lanes up to group_size (duplicate last
            # entry, all-zero loss mask -> the lane converges immediately):
            # one compiled lane count per bucket length, never a retrace on
            # a remainder-sized group
            n_real = len(group)
            lanes = group + [group[-1]] * (group_size - n_real)
            pose0 = np.stack([_pad_to(np.asarray(results[i][0], np.float32),
                                      L) for i in lanes])
            tran0 = np.stack([_pad_to(np.asarray(results[i][1], np.float32),
                                      L) for i in lanes])
            kp = np.stack([_pad_to(np.asarray(seqs[i].j2dc_px, np.float32),
                                   L) for i in lanes])
            ori = np.stack([_pad_to(np.asarray(seqs[i].oric, np.float32), L)
                            for i in lanes])
            cam = np.stack([np.asarray(seqs[i].cam_K, np.float32)
                            for i in lanes])
            mask = np.stack([(np.arange(L) < seqs[i].length)
                             .astype(np.float32) for i in lanes])
            mask[n_real:] = 0.0
            pose_R, tr, before, after = vfit(
                _put(pose0), _put(tran0), _put(kp),
                _put(ori), _put(cam), _put(mask))
            pose_R, tr = np.asarray(pose_R), np.asarray(tr)
            before = np.asarray(before)
            for k, i in enumerate(group):
                T = seqs[i].length
                if before[k, 0] > loss_threshold:   # gate (run.py:28)
                    out[i] = results[i]
                else:
                    out[i] = (pose_R[k, :T], tr[k, :T])
    return out


def smplify_runner(pred_pose, pred_tran, j2dc, imu_ori, batch_size, cam_k,
                   lr: float = 1.0, opt_steps: int = 1,
                   use_lbfgs: bool = True, loss_threshold: float = 20000.0,
                   shape=None, use_head: bool = False, model=None,
                   prior=None, pad_to_multiple: int = 64):
    r"""Gate + optimize + update mask (run.py:6-35).

    Sequences are padded (repeating the final frame, with loss mask 0) to a
    multiple of ``pad_to_multiple`` so XLA compiles one program per bucket
    length rather than per sequence. The whole refinement — initial-loss
    evaluation, LBFGS while-loop, final loss — is ONE jitted program (cached
    across calls); the loss_threshold gate (run.py:28) is applied to its
    outputs, so a gated-out sequence costs one device launch, never a
    recompile.
    """
    model = model or default_body_model()
    prior = prior or _default_prior()
    T = int(np.asarray(pred_pose).shape[0])
    L = -(-T // pad_to_multiple) * pad_to_multiple
    pose = _pad_to(np.asarray(pred_pose, np.float32).reshape(T, 24, 3, 3), L)
    tran = _pad_to(np.asarray(pred_tran, np.float32).reshape(T, 3), L)
    kp = _pad_to(np.asarray(j2dc, np.float32).reshape(T, 33, 3), L)
    ori = _pad_to(np.asarray(imu_ori, np.float32).reshape(T, 6, 3, 3), L)
    mask = jnp.asarray(np.arange(L) < T, jnp.float32)

    if shape is not None or not use_lbfgs:
        # uncommon paths (fixed betas / the Adam alternate branch) keep the
        # stateful object; the reference only ever calls the lbfgs default
        # (evaluate.py:89-90)
        smplify = TemporalSMPLify(cam_k=cam_k, imu_ori=ori, step_size=lr,
                                  batch_size=L, num_iters=opt_steps,
                                  use_lbfgs=use_lbfgs, shape=shape,
                                  use_head=use_head, model=model, prior=prior)
        kp_j = jnp.asarray(kp)
        opt_joint_loss = smplify.get_fitting_loss(
            jnp.asarray(pose), jnp.asarray(tran), kp_j, mask).mean(axis=-1)
        if float(opt_joint_loss[0]) > loss_threshold:
            return (np.asarray(pred_pose).reshape(-1, 24, 3, 3),
                    np.asarray(pred_tran).reshape(-1, 3), None)
        pose_R, tran_new, new_loss = smplify(jnp.asarray(pose),
                                             jnp.asarray(tran), kp_j, mask)
        update = np.asarray(new_loss.mean(axis=-1) < opt_joint_loss)[:T]
        return (np.asarray(pose_R)[:T], np.asarray(tran_new)[:T], update)

    fit = _jitted_fit(model, prior, use_head, 20, lr, opt_steps,
                      batched=False)
    pose_R, tran_new, before, after = fit(
        jnp.asarray(pose), jnp.asarray(tran), jnp.asarray(kp),
        jnp.asarray(ori), jnp.asarray(np.asarray(cam_k, np.float32)), mask)
    if float(before[0]) > loss_threshold:   # gate (run.py:28)
        return (np.asarray(pred_pose).reshape(-1, 24, 3, 3),
                np.asarray(pred_tran).reshape(-1, 3), None)
    update = np.asarray(after < before)[:T]
    return (np.asarray(pose_R)[:T], np.asarray(tran_new)[:T], update)
