r"""SigMP: the six-LSTM camera+IMU fusion network as a branchless scan step.

TPU-native rebuild of the reference's ``net/sig_mp.py``. The reference runs
one Python call per frame with data-dependent branching and mutable hidden
state (``Net.forward_online``, sig_mp.py:114-274). Here the whole per-frame
computation is a **pure function** ``step(params, carry, frame) -> (carry,
(pose, tran))`` in which every reference branch is expressed with masked
updates (``jnp.where``) so that

* offline evaluation is ``lax.scan`` over time and ``vmap``/``shard_map``
  over sequences — thousands of frames per device step instead of one,
* live streaming jits the single step once and reuses it with a donated
  carry,
* the *hidden-state-advance semantics* are bit-identical to the reference:
  which RNNs step on which frames (visual branch only when confident or on
  the first frame, sig_mp.py:149; the double rnn6 step on first frames,
  sig_mp.py:156,161; the occluded-frame synthetic refeed of rnn4/rnn6,
  sig_mp.py:263-271; the one-shot re-init of rnn2's state from vision,
  sig_mp.py:178-183).

Network bank (sig_mp.py:52-81) — all 2-layer LSTMs, torch-layout params:

  name | input                          | out   | hidden
  rnn2 | 72 imu (root frame)            | 23x3  | 512   (+ init-state MLP)
  rnn3 | 72 + 69 joints                 | 3 vel | 512
  rnn4 | 72 (cam) + 33x3 kp             | 23x3  | 1280
  rnn6 | 72 + 99 + 69                   | 3 pos | 1024
  rnn7 | 72 + 69                        | 24x6  | 512
  rnn8 | 72 + 69                        | 2     | 512
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as M
from ..math.spatial import mat3_mul
from ..config import (IMU_JOINT_MASK, MP_VERTEX_MASK, SigMPConfig, VEL_SCALE)
from ..nn.rnn import (init_net_apply, init_rnn_params, init_state,
                      prepare_scan_params, rnn_params_from_torch)
from ..nn.rnn import _same_core_geometry, rnn_group_step, rnn_pair_step
from ..nn.rnn import rnn_step as _rnn_step
from ..smpl.model import ParametricModel

__all__ = [
    "RNN_SPECS", "init_params", "init_carry", "make_step", "forward_offline",
    "forward_offline_batched", "StreamingNet", "params_from_torch_state_dict",
    "load_torch_checkpoint", "get_bbox_scale", "sync_mp3d",
]

# (input_size, output_size, hidden_size, dropout, with_init_net)
RNN_SPECS = {
    "rnn2": (72, 69, 512, 0.4, True),
    "rnn3": (141, 3, 512, 0.4, False),
    "rnn4": (171, 69, 1280, 0.4, False),
    "rnn6": (240, 3, 1024, 0.4, False),
    "rnn7": (141, 144, 512, 0.1, False),
    "rnn8": (141, 2, 512, 0.4, False),
}

_MP_MASK = np.asarray(MP_VERTEX_MASK, np.int32)
_JI_MASK = np.asarray(IMU_JOINT_MASK, np.int32)
DEFAULT_GRAVITY = np.array([-0.0029, 0.9980, -0.0273], np.float32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key, specs=None, dtype=jnp.float32) -> Dict:
    r"""Random parameters. ``specs`` overrides hidden sizes (tests use small
    widths; the default is the reference's layout)."""
    specs = RNN_SPECS if specs is None else specs
    keys = jax.random.split(key, len(specs))
    params = {}
    for k, (name, (i, o, h, _, with_init)) in zip(keys, specs.items()):
        params[name] = init_rnn_params(k, i, o, h, 2, with_init, dtype)
    return params


def params_from_torch_state_dict(state_dict, dtype=jnp.float32) -> Dict:
    r"""Convert the reference's merged ``best_weights.pt`` state_dict
    (numpy values) into our parameter pytree (sig_mp.py:850-857 layout)."""
    return {name: rnn_params_from_torch(state_dict, prefix=f"{name}.",
                                        dtype=dtype)
            for name in RNN_SPECS}


def load_torch_checkpoint(path, dtype=jnp.float32) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return params_from_torch_state_dict(sd, dtype)


# ---------------------------------------------------------------------------
# Small helpers (reference parity)
# ---------------------------------------------------------------------------


def get_bbox_scale(uv: jnp.ndarray) -> jnp.ndarray:
    r"""max(bbox width, bbox height) over keypoint x/y (sig_mp.py:277-284)."""
    du = uv[..., 0].max(-1) - uv[..., 0].min(-1)
    dv = uv[..., 1].max(-1) - uv[..., 1].min(-1)
    return jnp.maximum(du, dv)


def _bbox_center_normalize(j2dc: jnp.ndarray) -> jnp.ndarray:
    r"""CLIFF-style keypoint normalization (sig_mp.py:150-152): divide x/y by
    the bbox scale, then root-center every row *except* row 23 around the
    (pre-centering) row 23.

    The scale is eps-guarded: unlike the reference, the branchless step also
    evaluates this on masked-out frames (e.g. all-zero detector-failure
    placeholders, bbox scale 0), and a NaN here would leak into carried
    state. Real detections have body-sized scales, so the guard is inert
    when the value is actually used."""
    scale = jnp.maximum(get_bbox_scale(j2dc), 1e-6)
    xy = j2dc[:, :2] / scale
    center = xy[23:24]
    xy_centered = xy - center
    xy_out = xy_centered.at[23].set(xy[23])
    return jnp.concatenate([xy_out, j2dc[:, 2:]], axis=1)


def sync_mp3d(vert_mp: jnp.ndarray, joint: jnp.ndarray) -> jnp.ndarray:
    r"""Synthesize the 33 MediaPipe 3-D landmarks from (already-gathered)
    mask vertices + joints (sig_mp.py:287-299): limbs/hips/knees/ankles are
    overwritten with true joint positions."""
    syn = vert_mp
    syn = syn.at[11:17].set(joint[16:22])
    syn = syn.at[23:25].set(joint[1:3])
    syn = syn.at[25:27].set(joint[4:6])
    syn = syn.at[27:29].set(joint[7:9])
    return syn


def _cat(*xs):
    return jnp.concatenate([x.reshape(-1) for x in xs])


def _reproj_refine(cfg, j2dc, c, tran, j_lm):
    r"""Closed-form reprojection refinement (sig_mp.py:244-261, off by
    default): weighted least-squares delta for x/y then z, applied to
    (tran, j_lm). Shared by the XLA tail and the Pallas-tail wrapper (the
    kernel returns pre-refinement values; this only post-edits them)."""
    conf_lo = cfg.conf_range[0]
    p_conf = j2dc[:, 2]
    jx, jy, jz = j_lm[:, 0], j_lm[:, 1], j_lm[:, 2]
    axy = jnp.sum(p_conf / jz ** 2) + cfg.smooth
    bx = jnp.sum(p_conf * (-jx / jz ** 2 + j2dc[:, 0] / jz))
    by = jnp.sum(p_conf * (-jy / jz ** 2 + j2dc[:, 1] / jz))
    d_xy = jnp.stack([bx / axy, by / axy, jnp.zeros(())])
    do_opt = c > conf_lo
    tran = jnp.where(do_opt, tran + d_xy, tran)
    j_lm = jnp.where(do_opt, j_lm + d_xy, j_lm)
    jx, jy, jz = j_lm[:, 0], j_lm[:, 1], j_lm[:, 2]
    az = jnp.sum(p_conf * (jx ** 2 + jy ** 2) / jz ** 4) + cfg.smooth
    bz = jnp.sum(p_conf * ((jx / jz - j2dc[:, 0]) * jx / jz ** 2
                           + (jy / jz - j2dc[:, 1]) * jy / jz ** 2))
    d_z = jnp.stack([jnp.zeros(()), jnp.zeros(()), bz / az])
    tran = jnp.where(do_opt, tran + d_z, tran)
    j_lm = jnp.where(do_opt, j_lm + d_z, j_lm)
    return tran, j_lm


# ---------------------------------------------------------------------------
# Carry
# ---------------------------------------------------------------------------


def init_carry(params, dtype=jnp.float32) -> Dict:
    r"""Fresh streaming state — the functional analog of ``reset_states``
    (sig_mp.py:95-104) plus the live vision-updater counter
    (sig_mp.py:43-45)."""
    return {
        "states": {name: init_state(params[name], (), dtype)
                   for name in RNN_SPECS},
        "last_pfoot": jnp.zeros((2, 3), dtype),
        "has_pfoot": jnp.asarray(False),
        "last_tran": jnp.zeros((3,), dtype),
        "has_tran": jnp.asarray(False),
        "floor_buf": jnp.zeros((11, 3), dtype),
        "floor_cnt": jnp.asarray(0, jnp.int32),
        "first_reach": jnp.asarray(True),
        "vision_count": jnp.asarray(0, jnp.int32),
        "j_temp": jnp.zeros((33, 3), dtype),
        # first-frame rnn6 output (sig_mp.py:156), populated by the pre-scan
        # hoist when the step runs with include_first_frame_step=False
        "pc_first": jnp.zeros((3,), dtype),
        # first-frame rnn4 output, stashed by the pre-scan so the steady
        # step's single rnn4 evaluation (see make_step) can substitute it
        # on the first frame (whose real-input state advance the pre-scan
        # has already committed)
        "out4_first": jnp.zeros((69,), dtype),
    }


def make_frame(j2dc, accc, oric, first_tran=None, first_frame=False,
               gravityc=None, dtype=jnp.float32):
    r"""Build one frame-input pytree (``forward_online``'s arguments)."""
    return {
        "j2dc": jnp.asarray(j2dc, dtype).reshape(33, 3),
        "accc": jnp.asarray(accc, dtype).reshape(6, 3),
        "oric": jnp.asarray(oric, dtype).reshape(6, 3, 3),
        "first_tran": (jnp.zeros(3, dtype) if first_tran is None
                       else jnp.asarray(first_tran, dtype).reshape(3)),
        "first_tran_valid": jnp.asarray(first_tran is not None),
        "first_frame": jnp.asarray(bool(first_frame)),
        "gravityc": (jnp.asarray(DEFAULT_GRAVITY, dtype) if gravityc is None
                     else jnp.asarray(gravityc, dtype).reshape(3)),
    }


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------


def _masked_state(cond, new, old):
    return jax.tree.map(lambda n, o: jnp.where(cond, n, o), new, old)


def make_step(body_model: ParametricModel, cfg: SigMPConfig,
              include_first_frame_step: bool = True,
              output_contacts: bool = False,
              precomputed_inertial: bool = False,
              fuse_spec_heads: bool = True,
              cond_updater: bool = False,
              output_r6d: bool = False):
    r"""Build the pure per-frame step closure over body-model constants.

    Returns ``step(params, carry, frame) -> (carry, (pose [24,3,3], tran [3]))``
    with semantics identical to ``Net.forward_online`` (sig_mp.py:114-274).

    ``include_first_frame_step=False`` builds the steady-state variant used
    inside offline scans (callers MUST seed the carry with
    ``prescan_first_frame``). Besides hoisting the first-frame-only rnn6
    step (sig_mp.py:156) out of the scan, the steady variant evaluates the
    two widest cells (rnn4 1280, rnn6 1024) exactly ONCE per frame: the
    occluded-branch tail (rnn7/rnn8 + pose/translation geometry on the
    inertial joints) is computed speculatively FIRST, which makes the
    synthetic-landmark refeed inputs (sig_mp.py:263-271) available before
    rnn4/rnn6 run, so their real-vs-synthetic input is a select instead of
    a second evaluation. The speculative rnn7/rnn8/tail work is ~4x cheaper
    than the spared rnn4/rnn6 evaluations (docs/PERFORMANCE.md). Results
    are identical: in occluded frames the final tail recomputes exactly the
    speculative values (same inputs, same ops), in confident frames the
    speculation is discarded — verified by the explicit-branching oracle,
    the golden fixture, batched-vs-streaming agreement, and frame-by-frame
    parity with the running torch reference.

    ``fuse_spec_heads`` (steady variant only) additionally evaluates rnn3
    and the speculative rnn7/rnn8 heads as ONE stacked group per frame —
    they consume the identical input vector — shortening the step's serial
    matmul chain by 3 levels (bit-identical math, ``rnn_group_step``). It
    wins ~9% at B=1 serving but loses a few % under MXU-wide vmapped
    batches to per-step state stacking, so the big-batch builders
    (``forward_offline_batched``, the eval runner) disable it.

    ``cond_updater`` (steady variant + vision updater only) replaces the
    branchless speculative-plus-final double tail with a scalar
    ``lax.cond`` on the frame's confidence, evaluating the heads+tail
    exactly ONCE per frame (see the inline comment). Single-stream paths
    enable it; under vmap a cond lowers to a both-branches select, so the
    big-batch builders leave it off.
    """
    parent_clamped = jnp.asarray(body_model.tree.parent_clamped)
    ancestor = jnp.asarray(body_model.tree.ancestor_matrix)
    # zero-pose bone vectors, [24, 3] (the reference's self.b, sig_mp.py:83-84)
    bone = jnp.asarray(body_model._bone_vector)
    # landmark-LBS constants: skinning weights / rest positions of the 33
    # MediaPipe vertices and the zero-pose joints
    w_sub = body_model._skinning_weights[jnp.asarray(_MP_MASK)]
    v0_sub = body_model._zero_pose_vertex[jnp.asarray(_MP_MASK)]
    posedirs_sub = body_model._posedirs[jnp.asarray(_MP_MASK)]  # [33, 3, 207]
    j0 = body_model._zero_pose_joint
    conf_lo, conf_hi = cfg.conf_range
    inv_range = 1.0 / (conf_hi - conf_lo)
    # cfg.int8_compute routes every cell through the int8-MXU gate matmuls
    # (dynamic activation quantization; requires quantize_params weights)
    rnn_step = partial(_rnn_step, int8_compute=cfg.int8_compute)
    if cfg.pallas_tail:
        from ..ops.pallas_tail import geometry_tail, tail_constants
        tail_consts = tail_constants(body_model)
    else:
        geometry_tail, tail_consts = None, None

    def light_fk(glb_pose):
        r"""Joint positions from *global* rotations via bone vectors
        (sig_mp.py:131-135): pb[i] = R_glb[parent[i]] @ b[i], prefix-summed
        down the tree with the ancestor matrix."""
        pb = (glb_pose[parent_clamped] * bone[:, None, :]).sum(-1)
        pb = pb.at[0].set(0.0)
        return (ancestor[:, :, None] * pb[None, :, :]).sum(1)

    def heads_and_tail(params, carry, frame, st, c, Rcr, accr, orir, vr,
                       j3dr, pc, k_lerp, heads_pre=None):
        r"""rnn7/rnn8 heads + the pose/translation/floor/landmark tail
        (sig_mp.py:169-261). Pure: reads ``carry``, never writes it; all
        updated values ride in the returned dict. ``heads_pre`` supplies an
        already-evaluated ``(out7, out8, st7_new, st8_new)`` on the same
        input (the steady variant's speculative call fuses the heads with
        rnn3 — see step below)."""
        j2dc = frame["j2dc"]
        first_frame = frame["first_frame"]
        first_tran_valid = frame["first_tran_valid"]
        gravityc = frame["gravityc"]

        # -- heads (sig_mp.py:169-170): rnn7/rnn8 share the input and the
        # [141 -> 512 x 2] geometry, so their linear1/gate matmuls run as
        # single batched MXU calls (bit-identical math, rnn_pair_step)
        if heads_pre is None:
            out7, out8, st7_new, st8_new = rnn_pair_step(
                params["rnn7"], params["rnn8"], _cat(accr, orir, j3dr),
                st["rnn7"], st["rnn8"], int8_compute=cfg.int8_compute)
        else:
            out7, out8, st7_new, st8_new = heads_pre

        if tail_consts is not None:
            # -- fused-tail serving path: the whole post-heads tail in one
            # Pallas kernel (ops/pallas_tail.py) — identical math, one
            # launch instead of dozens of tiny ops. reproj refinement (off
            # in every eval profile) only post-edits (tran, j_lm), so it
            # stays in XLA on the kernel's outputs.
            T = geometry_tail(tail_consts, cfg, out7, out8, carry, frame,
                              c, Rcr, vr, pc, k_lerp)
            if cfg.use_reproj_opt:
                T["tran"], T["j_lm"] = _reproj_refine(cfg, j2dc, c,
                                                      T["tran"], T["j_lm"])
            return dict(T, st7_new=st7_new, st8_new=st8_new, out7=out7)

        contact = jax.nn.sigmoid(out8)

        # -- pose: r6d -> global R -> local pose, root := Rcr (sig_mp.py:173-175)
        poseg = M.r6d_to_rotation_matrix(out7).reshape(24, 3, 3)
        pose = M.inverse_kinematics_R(poseg[None], body_model.tree)[0]
        pose = pose.at[0].set(Rcr)

        # -- translation from contacts / network velocity (sig_mp.py:186-194)
        p_all = light_fk(poseg)
        pfoot = (p_all[10:12, None, :] * Rcr[None]).sum(-1)
        cmax = contact.max()
        v_net = (Rcr * vr.reshape(1, 3)).sum(1) * (VEL_SCALE / 60.0)
        d_foot = carry["last_pfoot"] - pfoot
        v_contact = jnp.where(jnp.argmax(contact) == 0, d_foot[0], d_foot[1])
        use_net = (cmax < cfg.contact_threshold) | ~carry["has_pfoot"]
        v = jnp.where(use_net, v_net, v_contact)
        tran = jnp.where(carry["has_tran"], carry["last_tran"] + v, v)

        # -- visual absolute-position fusion (sig_mp.py:196-203)
        snap_far = (jnp.linalg.norm(pc - tran) > cfg.distance_threshold) \
            | (cfg.tran_filter_num > 1)
        tran_vis = jnp.where(snap_far, pc,
                             M.lerp(tran, pc, cfg.tran_filter_num * k_lerp))
        tran = jnp.where(c >= conf_hi, tran_vis, tran)

        # -- flat-floor constraint with a ring of contact heights
        # (sig_mp.py:205-221); the "last 6 of 11" window is static because
        # appends stop at 11 entries.
        p0 = jnp.dot(pfoot[0] + tran, gravityc) * gravityc
        p1 = jnp.dot(pfoot[1] + tran, gravityc) * gravityc
        lower = jnp.where(jnp.linalg.norm(p0) < jnp.linalg.norm(p1), p1, p0)
        floor_buf, floor_cnt = carry["floor_buf"], carry["floor_cnt"]
        if cfg.use_flat_floor:
            append = ((floor_cnt < 11) & ~first_frame & ~first_tran_valid
                      & (cmax > cfg.contact_threshold) & (c >= conf_hi))
            # one-hot masked write instead of dynamic_update_slice: under
            # vmap a dynamic-index update lowers to a scatter, which costs
            # ~1 ms/step at B=512; this is pure elementwise select.
            slot = (jnp.arange(11) == floor_cnt)[:, None] & append
            floor_buf = jnp.where(slot, lower[None], floor_buf)
            floor_cnt = floor_cnt + append.astype(jnp.int32)

            snap = (floor_cnt > 10) & (cmax > cfg.contact_threshold)
            m = jnp.mean(floor_buf[5:11], axis=0)
            use_p1 = ((jnp.linalg.norm(p0) < jnp.linalg.norm(p1))
                      & (jnp.linalg.norm(m - p1) < cfg.height_threshold))
            delta = jnp.where(
                use_p1, m - p1,
                jnp.where(jnp.linalg.norm(m - p0) < cfg.height_threshold,
                          m - p0, 0.0))
            tran = jnp.where(snap, tran + delta, tran)

        # -- first-frame overrides (sig_mp.py:222-225)
        tran = jnp.where(first_tran_valid, frame["first_tran"],
                         jnp.where(first_frame, pc, tran))

        # -- synthetic landmark resynthesis for occluded frames
        # (sig_mp.py:228-242): FK + 33-vertex LBS. In live mode the mesh is
        # recomputed only when the throttle counter hits zero and reused from
        # j_temp otherwise (sig_mp.py:233-242).
        vision_count = carry["vision_count"]
        j_temp = carry["j_temp"]
        joint = jnp.zeros((24, 3))
        j_lm = jnp.zeros((33, 3))
        if cfg.use_reproj_opt or cfg.use_vision_updater:
            # FK(IK(poseg) with root := Rcr) has global rotations
            # (Rcr poseg_0^T) poseg — a single batched 3x3 product — and
            # its joint positions are the already-computed light-FK
            # positions rotated the same way: no second tree walk. Pose
            # blendshapes only displace the REST vertices (model.py:237), so
            # the same closed form holds with v0 shifted by posedirs·r —
            # where r comes from the local pose (identical to the root-fixed
            # pose off-root, since only pose[0] was overwritten).
            Rfix = mat3_mul(Rcr, poseg[0].T)
            glb = mat3_mul(Rfix[None], poseg)
            joint = (p_all[:, None, :] * Rfix[None]).sum(-1) + tran
            t_j = joint - (glb * j0[:, None, :]).sum(-1)
            R_v = jnp.einsum("vj,jrc->vrc", w_sub, glb)
            v0_eff = v0_sub
            if body_model.use_pose_blendshape:
                eye = jnp.eye(3, dtype=pose.dtype)
                r = (pose[1:] - eye).reshape(-1)        # [207]
                v0_eff = v0_sub + jnp.einsum("vcp,p->vc", posedirs_sub, r)
            verts = (R_v * v0_eff[:, None, :]).sum(-1) + w_sub @ t_j
            j_computed = sync_mp3d(verts, joint)
            if cfg.live:
                fk_now = vision_count == 0
                j_lm = jnp.where(fk_now, j_computed, j_temp)
                j_temp = j_lm
                vision_count = jnp.where(fk_now, cfg.update_vision_freq,
                                         vision_count - 1)
            else:
                j_lm = j_computed

        # -- closed-form reprojection refinement (sig_mp.py:244-261, off by
        # default): weighted least-squares delta for x/y then z.
        if cfg.use_reproj_opt:
            tran, j_lm = _reproj_refine(cfg, j2dc, c, tran, j_lm)

        return {"st7_new": st7_new, "st8_new": st8_new, "contact": contact,
                "out7": out7, "pose": pose, "tran": tran, "pfoot": pfoot,
                "floor_buf": floor_buf, "floor_cnt": floor_cnt,
                "vision_count": vision_count, "j_temp": j_temp,
                "joint": joint, "j_lm": j_lm}

    def gate(c, j3dr_i, j3dr_v, k_lerp):
        # confidence-gated lerp (sig_mp.py:159-167)
        return jnp.where(
            c >= conf_hi, j3dr_v.reshape(-1),
            jnp.where(c > conf_lo,
                      M.lerp(j3dr_i.reshape(-1), j3dr_v.reshape(-1), k_lerp),
                      j3dr_i.reshape(-1)))

    def step(params, carry, frame):
        st = carry["states"]
        j2dc, accc, oric = frame["j2dc"], frame["accc"], frame["oric"]
        first_frame = frame["first_frame"]

        # -- visual confidence & root-in-camera rotation (sig_mp.py:138-139)
        c = jnp.mean(j2dc[:, 2])
        Rcr = oric[-1]
        conf_vis = c > conf_lo
        k_lerp = jnp.clip((c - conf_lo) * inv_range, 0.0, 1.0)

        # -- inertial branch (sig_mp.py:142-145): rotate into root frame
        accr = (accc[:, :, None] * Rcr[None]).sum(1)
        orir = mat3_mul(Rcr.T[None], oric)
        spec_heads = None
        if precomputed_inertial:
            # rnn2/rnn3 outputs pre-scanned outside (their inputs are pure
            # functions of the frame stream — the weight-stationary Pallas
            # path, ops/pallas_lstm.py); states ride in the outer program,
            # and the one-shot IMU-updater rewrite must already have fired
            # or be disabled (the caller guarantees it).
            out2, st2_new = frame["out2"], st["rnn2"]
            out3, st3_new = frame["out3"], st["rnn3"]
        else:
            out2, st2_new = rnn_step(params["rnn2"], _cat(accr, orir),
                                     st["rnn2"])
            in3 = _cat(accr, orir, out2)
            # -- fused triple (steady serving variant only): rnn3 and the
            # SPECULATIVE rnn7/rnn8 head evaluation all consume this exact
            # input vector (sig_mp.py:145 vs :169-170 with the occluded
            # branch's j3dr = out2) and share the [141 -> 512 x 2]
            # geometry, so the three stacks run as ONE batched group —
            # 3 serial matmul levels instead of 6 on the step's critical
            # path (rnn_group_step; bit-identical per-element math).
            # On-chip A/B (B=1, T=1024): 0.377 vs 0.413 ms/step full — ~9%;
            # at B=512 the per-step state stack/unstack traffic outweighs
            # the shorter chain (0.77 vs 0.74 ms/step), so the big-batch
            # builders pass fuse_spec_heads=False.
            if (fuse_spec_heads and not include_first_frame_step
                    and cfg.use_vision_updater
                    and _same_core_geometry(params["rnn3"], params["rnn7"])
                    and _same_core_geometry(params["rnn3"], params["rnn8"])):
                (out3, out7_s, out8_s), (st3_new, st7_s, st8_s) = \
                    rnn_group_step(
                        (params["rnn3"], params["rnn7"], params["rnn8"]),
                        in3, (st["rnn3"], st["rnn7"], st["rnn8"]),
                        int8_compute=cfg.int8_compute)
                spec_heads = (out7_s, out8_s, st7_s, st8_s)
            else:
                out3, st3_new = rnn_step(params["rnn3"], in3, st["rnn3"])
        j3dr_i = out2
        vr = out3

        j2dc_norm = _bbox_center_normalize(j2dc)

        if include_first_frame_step:
            # ---- streaming variant: the reference's literal structure ----
            # (two rnn4/rnn6 evaluations when the vision updater fires)
            vis_ran = conf_vis | first_frame
            out4, st4_new = rnn_step(params["rnn4"],
                                     _cat(accc, oric, j2dc_norm), st["rnn4"])
            st4_mid = _masked_state(vis_ran, st4_new, st["rnn4"])
            j3dc = out4
            j3dr_v = (j3dc.reshape(23, 3)[:, :, None] * Rcr[None]).sum(1)

            # rnn6 can step twice on a first frame (sig_mp.py:156 then :161)
            in6 = _cat(accc, oric, j2dc, j3dc)
            out6_a, st6_a = rnn_step(params["rnn6"], in6, st["rnn6"])
            st6_mid = _masked_state(first_frame, st6_a, st["rnn6"])
            pc_first = out6_a.reshape(3)
            out6_b, st6_b = rnn_step(params["rnn6"], in6, st6_mid)
            st6_after = _masked_state(conf_vis, st6_b, st6_mid)
            pc = jnp.where(conf_vis, out6_b.reshape(3), pc_first)

            j3dr = gate(c, j3dr_i, j3dr_v, k_lerp)
            T = heads_and_tail(params, carry, frame, st, c, Rcr, accr, orir,
                               vr, j3dr, pc, k_lerp)

            # -- occluded-frame hidden-state refeed of rnn6/rnn4 with
            # synthetic keypoints (sig_mp.py:263-271)
            if cfg.use_vision_updater:
                vu_cond = c <= conf_lo
                if cfg.live:
                    vu_cond = vu_cond & (
                        T["vision_count"] == cfg.update_vision_freq)
                j2dc_syn = T["j_lm"] / T["j_lm"][:, 2:]
                j3dc_syn = T["joint"][1:] - T["joint"][:1]
                _, st6_syn = rnn_step(params["rnn6"],
                                      _cat(accc, oric, j2dc_syn, j3dc_syn),
                                      st6_after)
                st6_final = _masked_state(vu_cond, st6_syn, st6_after)
                j2dc_syn = _bbox_center_normalize(j2dc_syn)
                _, st4_syn = rnn_step(params["rnn4"],
                                      _cat(accc, oric, j2dc_syn), st4_mid)
                st4_final = _masked_state(vu_cond, st4_syn, st4_mid)
            else:
                st6_final = st6_after
                st4_final = st4_mid
            out4_first = carry["out4_first"]
        else:
            # ---- steady variant (post-prescan): single rnn4/rnn6 evals ----
            pc_first = carry["pc_first"]
            if cfg.use_vision_updater and cond_updater:
                # -- branching serving form: ONE tail per frame ------------
                # The branchless form below pays the speculative tail AND
                # the final tail every frame. But the two coincide exactly
                # when the frame is occluded (gate -> j3dr_i, pc ->
                # pc_first), and the speculative tail is only *needed* then
                # (its synthetic landmarks feed the rnn4/rnn6 refeed, which
                # fires only when occluded). So at B=1, where the tail's
                # many small ops dominate step cost (docs/PERFORMANCE.md),
                # branch on the scalar confidence with ``lax.cond`` — TPU
                # executes a single branch — and evaluate heads+tail ONCE:
                #   occluded: tail on the inertial joints (the speculative
                #             values, bit-equal to what the branchless form
                #             outputs), then the synthetic refeed of
                #             rnn4/rnn6;
                #   visible:  real rnn4/rnn6, then tail on the gated joints.
                # Under vmap a cond lowers to a select that runs BOTH
                # branches, so the big-batch builders keep the branchless
                # form (cond_updater=False).
                def _occluded(_):
                    T = heads_and_tail(params, carry, frame, st, c, Rcr,
                                       accr, orir, vr, j3dr_i.reshape(-1),
                                       pc_first, k_lerp,
                                       heads_pre=spec_heads)

                    def _refeed(_):
                        j2dc_syn = T["j_lm"] / T["j_lm"][:, 2:]
                        j3dc_syn = T["joint"][1:] - T["joint"][:1]
                        _, st4_syn = rnn_step(
                            params["rnn4"],
                            _cat(accc, oric,
                                 _bbox_center_normalize(j2dc_syn)),
                            st["rnn4"])
                        _, st6_syn = rnn_step(
                            params["rnn6"],
                            _cat(accc, oric, j2dc_syn, j3dc_syn),
                            st["rnn6"])
                        return st4_syn, st6_syn

                    if cfg.live:
                        # live throttle: on frames where the mesh was not
                        # just recomputed, the refeed states would be
                        # discarded — skip the two widest stacks entirely
                        st4_f, st6_f = jax.lax.cond(
                            T["vision_count"] == cfg.update_vision_freq,
                            _refeed, lambda _: (st["rnn4"], st["rnn6"]),
                            None)
                    else:
                        st4_f, st6_f = _refeed(None)
                    return T, st4_f, st6_f, j3dr_i.reshape(-1)

                def _visible(_):
                    out4_eval, st4_eval = rnn_step(
                        params["rnn4"], _cat(accc, oric, j2dc_norm),
                        st["rnn4"])
                    out4_eff = jnp.where(first_frame, carry["out4_first"],
                                         out4_eval)
                    j3dr_v = (out4_eff.reshape(23, 3)[:, :, None]
                              * Rcr[None]).sum(1)
                    out6_eval, st6_eval = rnn_step(
                        params["rnn6"], _cat(accc, oric, j2dc, out4_eff),
                        st["rnn6"])
                    j3dr = gate(c, j3dr_i, j3dr_v, k_lerp)
                    T = heads_and_tail(params, carry, frame, st, c, Rcr,
                                       accr, orir, vr, j3dr,
                                       out6_eval.reshape(3), k_lerp)
                    return (T, _masked_state(~first_frame, st4_eval,
                                             st["rnn4"]),
                            st6_eval, j3dr)

                T, st4_final, st6_final, j3dr = jax.lax.cond(
                    conf_vis, _visible, _occluded, None)
                out4_first = carry["out4_first"]
            else:
                # ---- branchless form (vmap-friendly) ---------------------
                if cfg.use_vision_updater:
                    # speculative occluded tail: when occluded, the fused
                    # joints are the inertial ones and pc rides pc_first, so
                    # the whole downstream (rnn7/rnn8, pose, translation,
                    # landmarks) is computable BEFORE rnn4/rnn6 —
                    # bit-identical to what the final tail recomputes in
                    # that case.
                    T_spec = heads_and_tail(params, carry, frame, st, c,
                                            Rcr, accr, orir, vr,
                                            j3dr_i.reshape(-1), pc_first,
                                            k_lerp, heads_pre=spec_heads)
                    vu_cond = c <= conf_lo
                    if cfg.live:
                        vu_cond = vu_cond & (
                            T_spec["vision_count"] == cfg.update_vision_freq)
                    j2dc_syn = T_spec["j_lm"] / T_spec["j_lm"][:, 2:]
                    j3dc_syn = T_spec["joint"][1:] - T_spec["joint"][:1]
                    syn6_in = _cat(accc, oric, j2dc_syn, j3dc_syn)
                    syn4_in = _cat(accc, oric,
                                   _bbox_center_normalize(j2dc_syn))
                else:
                    vu_cond = jnp.asarray(False)
                    syn6_in = syn4_in = None

                # single rnn4 evaluation; real input unless refeeding. The
                # first-frame real advance/output live in the prescan carry.
                real4_in = _cat(accc, oric, j2dc_norm)
                in4 = (real4_in if syn4_in is None
                       else jnp.where(vu_cond, syn4_in, real4_in))
                out4_eval, st4_eval = rnn_step(params["rnn4"], in4,
                                               st["rnn4"])
                out4_eff = jnp.where(first_frame, carry["out4_first"],
                                     out4_eval)
                st4_final = _masked_state((conf_vis & ~first_frame)
                                          | vu_cond, st4_eval, st["rnn4"])
                j3dr_v = (out4_eff.reshape(23, 3)[:, :, None]
                          * Rcr[None]).sum(1)

                # single rnn6 evaluation (first-frame extra step pre-scanned)
                in6_real = _cat(accc, oric, j2dc, out4_eff)
                in6 = (in6_real if syn6_in is None
                       else jnp.where(vu_cond, syn6_in, in6_real))
                out6_eval, st6_eval = rnn_step(params["rnn6"], in6,
                                               st["rnn6"])
                st6_final = _masked_state(conf_vis | vu_cond, st6_eval,
                                          st["rnn6"])
                pc = jnp.where(conf_vis, out6_eval.reshape(3), pc_first)

                j3dr = gate(c, j3dr_i, j3dr_v, k_lerp)
                T = heads_and_tail(params, carry, frame, st, c, Rcr, accr,
                                   orir, vr, j3dr, pc, k_lerp)
                out4_first = carry["out4_first"]

        # -- one-shot inertial hidden-state re-init from vision
        # (sig_mp.py:178-183)
        if cfg.use_imu_updater and not precomputed_inertial:
            iu_cond = (c >= conf_hi) & carry["first_reach"]
            h_i, c_i = init_net_apply(params["rnn2"], j3dr[None, :])
            st2_final = _masked_state(iu_cond, (h_i[:, 0], c_i[:, 0]), st2_new)
            first_reach = carry["first_reach"] & ~(c >= conf_hi)
        elif cfg.use_imu_updater:
            # precomputed-inertial chunks only run once first_reach is
            # already cleared (or never set) — the rewrite can't fire, but
            # the flag still decays identically
            st2_final = st2_new
            first_reach = carry["first_reach"] & ~(c >= conf_hi)
        else:
            st2_final = st2_new
            first_reach = carry["first_reach"]

        pose, tran, contact = T["pose"], T["tran"], T["contact"]
        new_carry = {
            "states": {"rnn2": st2_final, "rnn3": st3_new, "rnn4": st4_final,
                       "rnn6": st6_final, "rnn7": T["st7_new"],
                       "rnn8": T["st8_new"]},
            "last_pfoot": T["pfoot"],
            "has_pfoot": jnp.asarray(True),
            "last_tran": tran,
            "has_tran": jnp.asarray(True),
            "floor_buf": T["floor_buf"],
            "floor_cnt": T["floor_cnt"],
            "first_reach": first_reach,
            "vision_count": T["vision_count"],
            "j_temp": T["j_temp"],
            "pc_first": pc_first,
            "out4_first": out4_first,
        }
        out = (pose, tran)
        if output_contacts:
            out = out + (contact,)
        if output_r6d:
            # diagnostic tap (default off, dead-code-eliminated otherwise):
            # the raw rnn7 r6d head output, pre-Gram-Schmidt — lets callers
            # measure the orthonormalization conditioning of outlier frames
            # (docs/PERFORMANCE.md "On-chip parity bounds")
            out = out + (T["out7"],)
        return new_carry, out

    return step


def prescan_first_frame(params, body_model: ParametricModel, carry, frame0,
                        int8_compute: bool = False):
    r"""Hoisted first-frame rnn4/rnn6 work (sig_mp.py:148-156): on the first
    frame the reference's visual branch always runs (``c > occ or
    first_frame``), so rnn4's real-input state advance is committed here and
    its output stashed; rnn6's first-frame-only extra step (sig_mp.py:156)
    advances its state and stashes ``pc_first``. The in-scan steady step
    (``include_first_frame_step=False``) then evaluates each of rnn4/rnn6
    exactly once per frame."""
    rnn_step = partial(_rnn_step, int8_compute=int8_compute)
    j2dc, accc, oric = frame0["j2dc"], frame0["accc"], frame0["oric"]
    j2dc_norm = _bbox_center_normalize(j2dc)
    out4, st4 = rnn_step(params["rnn4"], _cat(accc, oric, j2dc_norm),
                         carry["states"]["rnn4"])
    out6, st6 = rnn_step(params["rnn6"], _cat(accc, oric, j2dc, out4),
                         carry["states"]["rnn6"])
    first = frame0["first_frame"]
    st4_new = _masked_state(first, st4, carry["states"]["rnn4"])
    st6_new = _masked_state(first, st6, carry["states"]["rnn6"])
    carry = dict(carry)
    carry["states"] = dict(carry["states"])
    carry["states"]["rnn4"] = st4_new
    carry["states"]["rnn6"] = st6_new
    carry["pc_first"] = jnp.where(first, out6.reshape(3), carry["pc_first"])
    carry["out4_first"] = jnp.where(first, out4.reshape(-1),
                                    carry["out4_first"])
    return carry


# ---------------------------------------------------------------------------
# Offline (scan) and streaming drivers
# ---------------------------------------------------------------------------


def _sequence_frames(j2dc, accc, oric, first_tran, first_frame, gravityc,
                     dtype=jnp.float32):
    r"""Stack per-frame inputs for scan. ``first_tran``/``first_frame`` apply
    to frame 0 only, matching evaluate.py:75-81."""
    T = j2dc.shape[0]
    idx0 = jnp.arange(T) == 0
    if gravityc is None:
        gravityc = jnp.broadcast_to(jnp.asarray(DEFAULT_GRAVITY, dtype), (T, 3))
    else:
        gravityc = jnp.broadcast_to(
            jnp.asarray(gravityc, dtype).reshape(-1, 3), (T, 3))
    return {
        "j2dc": jnp.asarray(j2dc, dtype).reshape(T, 33, 3),
        "accc": jnp.asarray(accc, dtype).reshape(T, 6, 3),
        "oric": jnp.asarray(oric, dtype).reshape(T, 6, 3, 3),
        "first_tran": jnp.broadcast_to(
            jnp.zeros(3, dtype) if first_tran is None
            else jnp.asarray(first_tran, dtype).reshape(3), (T, 3)),
        "first_tran_valid": idx0 & (first_tran is not None),
        "first_frame": idx0 & bool(first_frame),
        "gravityc": gravityc,
    }


def forward_offline(params, body_model, cfg, j2dc, accc, oric,
                    first_tran=None, first_frame=False, gravityc=None,
                    return_contacts: bool = False,
                    return_r6d: bool = False):
    r"""Whole-sequence inference: ``lax.scan`` of the fused steady step with
    the first-frame rnn6 evaluation hoisted out of the scan.

    Mirrors the reference's per-frame loop over ``forward_online``
    (evaluate.py:75-81) in one device launch. With ``return_contacts`` the
    foot-contact probabilities [T, 2] are returned too (the head the
    reference computes but never exposes, sig_mp.py:170). With
    ``return_r6d`` the raw rnn7 r6d head outputs [T, 144] are appended —
    a diagnostic tap for localizing Gram-Schmidt conditioning of parity
    outlier frames (XLA scan path only; the fused serve kernel does not
    materialize the head output).
    """
    if return_r6d and cfg.pallas_serve:
        raise ValueError("return_r6d requires the XLA scan path "
                         "(cfg.pallas_serve=False)")
    params = prepare_scan_params(params, cfg.int8_compute)  # hoist dequant
    frames = _sequence_frames(j2dc, accc, oric, first_tran, first_frame,
                              gravityc)
    frame0 = jax.tree.map(lambda x: x[0], frames)
    carry = prescan_first_frame(params, body_model, init_carry(params),
                                frame0, int8_compute=cfg.int8_compute)
    if cfg.pallas_serve:
        # whole-chunk weight-resident kernel (ops/pallas_serve.py); weight
        # repacking happens in-trace here — amortized over the sequence
        # (StreamingNet prepares once instead for repeated chunks)
        from ..ops.pallas_serve import prepare_serve_params, serve_scan
        if cfg.int8_compute:  # int8-resident gate bank, nothing streamed
            prepped = prepare_serve_params(params, int8_gates=True)
        else:
            wdtype = params["rnn2"]["layers"][0]["w_ih"].dtype
            prepped = prepare_serve_params(params, dtype=wdtype)
        poses, trans, contacts, _ = serve_scan(prepped, body_model, cfg,
                                               frames, carry)
        return (poses, trans, contacts) if return_contacts else (poses,
                                                                 trans)
    step = make_step(body_model, cfg, include_first_frame_step=False,
                     output_contacts=return_contacts, cond_updater=True,
                     output_r6d=return_r6d)
    _, out = jax.lax.scan(partial(step, params), carry, frames)
    return out


def forward_offline_batched(params, body_model, cfg, frames_batched,
                            lengths=None):
    r"""Batched sequences: vmap over the sequence axis of stacked frame
    pytrees [B, T, ...]. Padded frames still execute (static shapes) but
    callers mask outputs past ``lengths``; hidden-state pollution after a
    sequence's end never flows back into valid frames."""
    params = prepare_scan_params(params, cfg.int8_compute)  # hoist dequant
    # big-batch path: the serial-chain-shortening head fusion loses to its
    # per-step state-stacking traffic once the vmapped matmuls are MXU-wide;
    # the fused tail kernel is likewise single-stream-only (vmapped Pallas
    # serializes), so strip it here
    if cfg.pallas_tail or cfg.pallas_serve:
        import dataclasses
        cfg = dataclasses.replace(cfg, pallas_tail=False, pallas_serve=False)
    step = make_step(body_model, cfg, include_first_frame_step=False,
                     fuse_spec_heads=False)

    def run_one(frames):
        frame0 = jax.tree.map(lambda x: x[0], frames)
        carry = prescan_first_frame(params, body_model, init_carry(params),
                                    frame0, int8_compute=cfg.int8_compute)
        _, out = jax.lax.scan(partial(step, params), carry, frames)
        return out

    return jax.vmap(run_one)(frames_batched)


class StreamingNet:
    r"""Stateful convenience wrapper mirroring the reference's online API
    (``net.forward_online(...)`` / ``net.reset_states()``, sig_mp.py:95-274)
    around the jitted pure step with a donated carry."""

    def __init__(self, params, body_model: ParametricModel,
                 cfg: SigMPConfig = SigMPConfig()):
        self.params = params
        self.cfg = cfg
        self.body_model = body_model
        # the steady single-eval step (each wide cell once per frame);
        # first-frame work is host-dispatched to the jitted prescan exactly
        # like forward_offline, so per-frame dispatches stay cheap
        step = make_step(body_model, cfg, include_first_frame_step=False,
                         cond_updater=True)

        @partial(jax.jit, donate_argnums=(1,))
        def _step(params, carry, frame):
            return step(params, carry, frame)

        @partial(jax.jit, donate_argnums=(1,))
        def _prescan(params, carry, frame):
            return prescan_first_frame(params, body_model, carry, frame,
                                       int8_compute=cfg.int8_compute)

        self._step = _step
        self._prescan = _prescan
        self.carry = init_carry(params)

    def reset_states(self):
        self.carry = init_carry(self.params)

    def forward_online(self, j2dc, accc, oric, first_tran=None,
                       first_frame=False, gravityc=None):
        frame = make_frame(j2dc, accc, oric, first_tran, first_frame, gravityc)
        if first_frame:
            self.carry = self._prescan(self.params, self.carry, frame)
        self.carry, (pose, tran) = self._step(self.params, self.carry, frame)
        return pose, tran

    def forward_chunk(self, j2dc, accc, oric, gravityc=None):
        r"""Advance K frames in ONE device dispatch (time-major scan over the
        chunk), amortizing host->device round trips for near-real-time batch
        processing. State carries across chunks like per-frame calls;
        returns (pose [K, 24, 3, 3], tran [K, 3]).

        With ``cfg.pallas_inertial`` the inertial pair (rnn2/rnn3) is
        pre-scanned for the whole chunk by the weight-stationary Pallas
        kernel (their inputs are pure functions of the frame stream), and
        the fused scan consumes the precomputed outputs. Exact — but the
        one-shot IMU-updater hidden-state rewrite (sig_mp.py:178-183) can
        fire mid-chunk only in the standard path, so chunks dispatched
        while ``first_reach`` is still pending fall back to it.
        """
        K = int(np.asarray(j2dc).shape[0])
        if not hasattr(self, "_chunk_fns"):
            self._chunk_fns = {}

        if self.cfg.pallas_serve:
            # whole-chunk weight-resident kernel: prepare the repacked
            # operand bank once per net, then every chunk is one launch
            from ..ops.pallas_serve import prepare_serve_params, serve_scan
            if not hasattr(self, "_serve_prepped"):
                from ..nn.rnn import is_quantized
                if self.cfg.int8_compute:
                    self._serve_prepped = prepare_serve_params(
                        self.params, int8_gates=True)
                else:
                    wdtype = (jnp.bfloat16 if is_quantized(self.params) else
                              self.params["rnn2"]["layers"][0]["w_ih"].dtype)
                    self._serve_prepped = prepare_serve_params(self.params,
                                                               dtype=wdtype)
            key = (K, "serve")
            if key not in self._chunk_fns:
                cfg, model = self.cfg, self.body_model
                # only the array pytree traces; H/dtype/stream are static
                meta = {k: self._serve_prepped[k]
                        for k in ("H", "dtype", "stream")}

                @partial(jax.jit, donate_argnums=(1,))
                def run(arrs, carry, frames):
                    poses, trans, _, new_carry = serve_scan(
                        dict(arrs, **meta), model, cfg, frames, carry)
                    return new_carry, (poses, trans)

                self._chunk_fns[key] = run
            frames = _sequence_frames(j2dc, accc, oric, None, False,
                                      gravityc)
            frames["first_tran_valid"] = jnp.zeros(K, bool)
            frames["first_frame"] = jnp.zeros(K, bool)
            arrs = {k: self._serve_prepped[k] for k in ("ops", "init")}
            self.carry, out = self._chunk_fns[key](arrs, self.carry, frames)
            return out

        use_pallas = self.cfg.pallas_inertial
        if use_pallas and self.cfg.use_imu_updater:
            # one scalar fetch; monotonic, so cache once cleared
            if not getattr(self, "_first_reach_cleared", False):
                self._first_reach_cleared = not bool(
                    np.asarray(self.carry["first_reach"]))
            use_pallas = self._first_reach_cleared

        key = (K, use_pallas)
        if key not in self._chunk_fns:
            # chunk frames never carry first-frame flags (set False below),
            # so the steady single-eval variant applies directly
            step = make_step(self.body_model, self.cfg,
                             include_first_frame_step=False,
                             precomputed_inertial=use_pallas,
                             cond_updater=True)

            if use_pallas:
                from ..ops.pallas_lstm import rnn_scan_pallas_chunked

                @partial(jax.jit, donate_argnums=(1,))
                def run(params, carry, frames):
                    scan_params = prepare_scan_params(params,
                                                      self.cfg.int8_compute)
                    # inertial features for the whole chunk (vectorized
                    # forms of the per-frame accr/orir of the step)
                    oric_c = frames["oric"]
                    Rcr = oric_c[:, -1]                       # [K, 3, 3]
                    accr = jnp.einsum("tnc,tcr->tnr", frames["accc"], Rcr)
                    orir = jnp.einsum("tcr,tncs->tnrs", Rcr, oric_c)
                    xs2 = jnp.concatenate([accr.reshape(K, -1),
                                           orir.reshape(K, -1)], axis=-1)
                    st = carry["states"]
                    out2, st2 = rnn_scan_pallas_chunked(params["rnn2"], xs2,
                                                        st["rnn2"])
                    xs3 = jnp.concatenate([xs2, out2], axis=-1)
                    out3, st3 = rnn_scan_pallas_chunked(params["rnn3"], xs3,
                                                        st["rnn3"])
                    frames = dict(frames, out2=out2.astype(jnp.float32),
                                  out3=out3.astype(jnp.float32))
                    new_carry, out = jax.lax.scan(partial(step, scan_params),
                                                  carry, frames)
                    new_carry["states"] = dict(new_carry["states"],
                                               rnn2=st2, rnn3=st3)
                    return new_carry, out
            else:
                @partial(jax.jit, donate_argnums=(1,))
                def run(params, carry, frames):
                    # chunk = a scan: hoist int8 dequant like offline paths
                    scan_params = prepare_scan_params(params,
                                                      self.cfg.int8_compute)
                    return jax.lax.scan(partial(step, scan_params), carry,
                                        frames)

            self._chunk_fns[key] = run
        frames = _sequence_frames(j2dc, accc, oric, None, False, gravityc)
        frames["first_tran_valid"] = jnp.zeros(K, bool)
        frames["first_frame"] = jnp.zeros(K, bool)
        self.carry, out = self._chunk_fns[key](self.params, self.carry,
                                               frames)
        return out
