r"""Fused geometry-tail Pallas TPU kernel for single-stream serving.

The per-frame tail of the fusion step — r6d->R (Gram-Schmidt), tree IK,
light FK, contact/velocity translation, visual fusion, the flat-floor
constraint, and the 33-landmark LBS resynthesis
(``models/sig_mp.py::heads_and_tail``, mirroring the reference's
``net/sig_mp.py:169-261``) — is dozens of tiny XLA ops on [24, 3, 3] /
[33, 3] tensors. Batched they vectorize fine; at batch 1 (live serving)
each op is a separate sub-microsecond kernel whose fixed launch/fusion
overhead dominates: the tail costs ~0.1 ms of the ~0.18 ms bf16 step while
moving only a few KB of data. This kernel evaluates the ENTIRE tail in one
Pallas call.

Mosaic-safety rules used throughout (see the Pallas TPU guide):

* every rotation is a flat ``[N, 9]`` row-major array; all 3x3 algebra is
  explicit lane-slice arithmetic (``_col``), never batched [*, 3, 3] dots;
* every row gather/select — parent lookup, feet rows, ``sync_mp3d``
  overwrites, the floor-ring mean, pose-blendshape contraction — is a
  constant 0/1 (or 1/6) matrix multiply: no sublane-unaligned slicing, no
  scatters, no cross-tile reshapes;
* the flat-floor ring write is a broadcasted-iota one-hot select — the
  same trick the XLA step uses (models/sig_mp.py flat-floor comment);
* scalars ride in a single ``[1, 8]`` f32 vector and are consumed as
  ``[1, 1]`` lane slices (broadcast against the row arrays).

The kernel computes in f32 (the tail is bandwidth-trivial; precision is
free) and is agreement-tested against the XLA tail in every confidence /
floor / live-throttle regime (tests/test_pallas_tail.py) plus end-to-end
through ``forward_offline``. The reproj refinement (sig_mp.py:244-261,
off in every eval profile) stays outside: it only post-edits (tran, j_lm),
so the caller applies the shared XLA helper afterwards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MP_VERTEX_MASK, VEL_SCALE

__all__ = ["tail_constants", "geometry_tail", "tail_math"]

_EPS = 1e-8  # math/angular.py::_EPS — the guarded Gram-Schmidt epsilon


def _fiota(shape, dim):
    r"""Float iota via int32: Mosaic's ``tpu.iota`` rejects float result
    types on the real chip (interpret mode accepts them), so build the
    index grid in int32 and cast."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Flat-[N, 9] 3x3 algebra (row-major: lane 3*r + c holds element [r, c])
# ---------------------------------------------------------------------------


def _col(a, k):
    return a[:, k:k + 1]


def _m3mul(a, b):
    r"""Row-wise ``a @ b`` on flat [N, 9] (broadcasts [1, 9] against [N, 9])."""
    cols = []
    for i in range(3):
        for j in range(3):
            cols.append(sum(_col(a, 3 * i + k) * _col(b, 3 * k + j)
                            for k in range(3)))
    return jnp.concatenate(cols, axis=1)


def _m3Tmul(a, b):
    r"""Row-wise ``a^T @ b`` on flat [N, 9]."""
    cols = []
    for i in range(3):
        for j in range(3):
            cols.append(sum(_col(a, 3 * k + i) * _col(b, 3 * k + j)
                            for k in range(3)))
    return jnp.concatenate(cols, axis=1)


def _m3mulT(a, b):
    r"""Row-wise ``a @ b^T`` on flat [N, 9]."""
    cols = []
    for i in range(3):
        for j in range(3):
            cols.append(sum(_col(a, 3 * i + k) * _col(b, 3 * j + k)
                            for k in range(3)))
    return jnp.concatenate(cols, axis=1)


def _m3vec(a, v):
    r"""Row-wise ``a @ v``: flat rotations [N, 9] x vectors [N, 3] -> [N, 3]."""
    cols = [sum(_col(a, 3 * i + k) * _col(v, k) for k in range(3))
            for i in range(3)]
    return jnp.concatenate(cols, axis=1)


def _cross(a, b):
    ax, ay, az = _col(a, 0), _col(a, 1), _col(a, 2)
    bx, by, bz = _col(b, 0), _col(b, 1), _col(b, 2)
    return jnp.concatenate(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=1)


def _vnorm(v):
    r"""[N, 3] -> [N, 1] Euclidean norm."""
    return jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))


def _unit(v):
    r"""normalize_tensor(v, eps=_EPS) — guarded like math/angular.py."""
    return v / jnp.maximum(_vnorm(v), _EPS)


# ---------------------------------------------------------------------------
# The tail math (pure, shared with ops/pallas_serve.py) and the kernel
# ---------------------------------------------------------------------------


def tail_math(inp, consts, *, conf_hi, contact_threshold, distance_threshold,
              tran_filter_num, height_threshold, use_flat_floor, live,
              update_vision_freq, landmarks, blendshape):
    r"""The whole post-heads tail on plain arrays (Mosaic-safe ops only).

    ``inp``: svec [1, 8] (c, k_lerp, has_pfoot, has_tran, floor_cnt,
    first_frame, first_tran_valid, vision_count), out7 [24, 6], out8 [1, 2],
    rcr [1, 9], vr/pc/last_tran/first_tran/grav [1, 3], last_pfoot [2, 3],
    floor_buf [11, 3], j_temp [33, 3]. ``consts`` as from
    :func:`tail_constants` (``pd`` reshaped [27, 33, 24] when blendshape).
    Returns the tail's outputs as a dict of arrays; callable both from this
    module's standalone kernel and inside the fused serving-scan kernel
    (ops/pallas_serve.py), so the two paths share one implementation."""
    svec = inp["svec"]
    c_s = svec[:, 0:1]
    k_lerp = svec[:, 1:2]
    has_pfoot = svec[:, 2:3]
    has_tran = svec[:, 3:4]
    floor_cnt = svec[:, 4:5]
    first_frame = svec[:, 5:6]
    first_tran_valid = svec[:, 6:7]
    vision_count = svec[:, 7:8]

    rcr = inp["rcr"]                                            # [1, 9]
    mask_nroot = consts["mask_nroot"]                           # [24, 1]

    # -- contact head (sig_mp.py:170)
    contact = jax.nn.sigmoid(inp["out8"])                       # [1, 2]
    cmax = jnp.max(contact, axis=1, keepdims=True)              # [1, 1]

    # -- r6d -> global rotations (Gram-Schmidt, angular.py:249); flat [24, 9]
    r6d = inp["out7"]                                           # [24, 6]
    col0 = _unit(r6d[:, 0:3])
    b3 = r6d[:, 3:6]
    proj = jnp.sum(col0 * b3, axis=1, keepdims=True)
    col1 = _unit(b3 - proj * col0)
    col2 = _cross(col0, col1)
    # flat lane 3*r + c holds column c's row r
    poseg = jnp.concatenate(
        [_col(col0, 0), _col(col1, 0), _col(col2, 0),
         _col(col0, 1), _col(col1, 1), _col(col2, 1),
         _col(col0, 2), _col(col1, 2), _col(col2, 2)], axis=1)  # [24, 9]

    # -- IK: local[i] = glb[parent[i]]^T glb[i]; root := Rcr (sig_mp.py:173-175)
    parentR = jnp.dot(consts["gpar"], poseg,
                      preferred_element_type=jnp.float32)       # [24, 9]
    local = _m3Tmul(parentR, poseg)
    pose = jnp.where(mask_nroot > 0.5, local, rcr)              # root row <- Rcr

    # -- light FK: pb[i] = glb[parent[i]] @ bone[i], prefix-sum via ancestors
    pb = _m3vec(parentR, consts["bone"]) * mask_nroot              # [24, 3]
    p_all = jnp.dot(consts["anc"], pb, preferred_element_type=jnp.float32)

    # -- feet in camera frame: pfoot = Rcr @ p_all[10:12] (sig_mp.py:186)
    feet = jnp.dot(consts["feet"], p_all,
                   preferred_element_type=jnp.float32)          # [2, 3]
    pfoot = _m3vec(rcr, feet)                                   # [2, 3]

    # -- translation from contacts / network velocity (sig_mp.py:186-194)
    v_net = _m3vec(rcr, inp["vr"]) * (VEL_SCALE / 60.0)         # [1, 3]
    d_foot = inp["last_pfoot"] - pfoot                          # [2, 3]
    io2 = _fiota((2, 1), 0)
    d0 = jnp.sum(d_foot * (io2 == 0.0).astype(jnp.float32), axis=0,
                 keepdims=True)
    d1 = jnp.sum(d_foot * (io2 == 1.0).astype(jnp.float32), axis=0,
                 keepdims=True)
    # argmax(contact) == 0  <=>  contact[0] >= contact[1] (first max wins)
    v_contact = jnp.where(_col(contact, 0) >= _col(contact, 1), d0, d1)
    use_net = (cmax < contact_threshold) | (has_pfoot < 0.5)
    v = jnp.where(use_net, v_net, v_contact)
    tran = jnp.where(has_tran > 0.5, inp["last_tran"] + v, v)   # [1, 3]

    # -- visual absolute-position fusion (sig_mp.py:196-203)
    pc = inp["pc"]
    snap_far = _vnorm(pc - tran) > distance_threshold
    if tran_filter_num > 1:
        tran_vis = pc
    else:
        t = tran_filter_num * k_lerp
        tran_vis = jnp.where(snap_far, pc, tran * (1 - t) + pc * t)
    tran = jnp.where(c_s >= conf_hi, tran_vis, tran)

    # -- flat-floor ring constraint (sig_mp.py:205-221)
    fbuf = inp["floor_buf"]                                     # [11, 3]
    if use_flat_floor:
        grav = inp["grav"]                                      # [1, 3]
        pf0 = jnp.sum(pfoot * (io2 == 0.0).astype(jnp.float32), axis=0,
                      keepdims=True)
        pf1 = jnp.sum(pfoot * (io2 == 1.0).astype(jnp.float32), axis=0,
                      keepdims=True)
        p0 = jnp.sum((pf0 + tran) * grav, axis=1, keepdims=True) * grav
        p1 = jnp.sum((pf1 + tran) * grav, axis=1, keepdims=True) * grav
        n0, n1 = _vnorm(p0), _vnorm(p1)
        lower = jnp.where(n0 < n1, p1, p0)                      # [1, 3]
        append = ((floor_cnt < 11.0) & (first_frame < 0.5)
                  & (first_tran_valid < 0.5) & (cmax > contact_threshold)
                  & (c_s >= conf_hi))
        io11 = _fiota((11, 1), 0)
        slot = (io11 == floor_cnt) & append
        fbuf = jnp.where(slot, lower, fbuf)
        floor_cnt = floor_cnt + append.astype(jnp.float32)

        snap = (floor_cnt > 10.0) & (cmax > contact_threshold)
        m = jnp.dot(consts["fmean"], fbuf,
                    preferred_element_type=jnp.float32)         # [1, 3]
        use_p1 = (n0 < n1) & (_vnorm(m - p1) < height_threshold)
        delta = jnp.where(
            use_p1, m - p1,
            jnp.where(_vnorm(m - p0) < height_threshold, m - p0,
                      jnp.zeros_like(m)))
        tran = jnp.where(snap, tran + delta, tran)

    # -- first-frame overrides (sig_mp.py:222-225)
    tran = jnp.where(first_tran_valid > 0.5, inp["first_tran"],
                     jnp.where(first_frame > 0.5, pc, tran))

    # -- landmark resynthesis: closed-form FK + 33-vertex LBS
    # (sig_mp.py:228-242; see heads_and_tail for the Rfix derivation)
    j_temp = inp["j_temp"]
    if landmarks:
        poseg0 = jnp.dot(consts["row0"], poseg,
                         preferred_element_type=jnp.float32)    # [1, 9]
        rfix = _m3mulT(rcr, poseg0)                             # Rcr @ poseg0^T
        glb = _m3mul(rfix, poseg)                               # [24, 9]
        joint = _m3vec(rfix, p_all) + tran                      # [24, 3]
        t_j = joint - _m3vec(glb, consts["j0"])                    # [24, 3]
        r_v = jnp.dot(consts["wsub"], glb,
                      preferred_element_type=jnp.float32)       # [33, 9]
        v0_eff = consts["v0sub"]                                   # [33, 3]
        if blendshape:
            # v0 + posedirs . (pose[1:] - I): 27 constant [33, 24] matmuls
            # against the local-pose columns (root masked out) — the flat
            # [24, 9] -> [207] reshape Mosaic can't do becomes a static
            # unroll over (c, k).
            eye9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
            deltas = []
            for cdim in range(3):
                acc = None
                for k in range(9):
                    rcol = (_col(pose, k) - eye9[k]) * mask_nroot
                    term = jnp.dot(consts["pd"][cdim * 9 + k], rcol,
                                   preferred_element_type=jnp.float32)
                    acc = term if acc is None else acc + term
                deltas.append(acc)
            v0_eff = v0_eff + jnp.concatenate(deltas, axis=1)
        verts = _m3vec(r_v, v0_eff) + jnp.dot(
            consts["wsub"], t_j, preferred_element_type=jnp.float32)
        # sync_mp3d: constant-gather overwrite of limb/hip/knee/ankle rows
        msync = consts["msync"]                                    # [33, 1]
        j_from_joint = jnp.dot(consts["ssync"], joint,
                               preferred_element_type=jnp.float32)
        j_computed = jnp.where(msync > 0.5, j_from_joint, verts)
        if live:
            # scalar cond: on-chip Mosaic can't broadcast a sliced [1,1]
            # vector in both sublanes and lanes at once (splat-from-scalar
            # is always implemented)
            fk_now = vision_count[0, 0] == 0.0
            j_lm = jnp.where(fk_now, j_computed, j_temp)
            j_temp = j_lm
            vision_count = jnp.where(fk_now, float(update_vision_freq),
                                     vision_count - 1.0)
        else:
            j_lm = j_computed
    else:
        joint = jnp.zeros((24, 3), jnp.float32)
        j_lm = jnp.zeros((33, 3), jnp.float32)

    return {"pose": pose, "tran": tran, "contact": contact, "pfoot": pfoot,
            "floor_buf": fbuf, "joint": joint, "j_lm": j_lm, "j_temp": j_temp,
            "floor_cnt": floor_cnt, "vision_count": vision_count}


def _kernel(svec_ref, out7_ref, out8_ref, rcr_ref, vr_ref, pc_ref,
            last_tran_ref, first_tran_ref, grav_ref, last_pfoot_ref,
            floor_buf_ref, j_temp_ref, gpar_ref, anc_ref, bone_ref,
            mask_nroot_ref, row0_ref, feet_ref, wsub_ref, v0sub_ref,
            j0_ref, ssync_ref, msync_ref, fmean_ref, *rest, blendshape,
            **flags):
    r"""Standalone-kernel wrapper: refs in -> :func:`tail_math` -> refs out."""
    if blendshape:
        pd_ref = rest[0]
        outs = rest[1:]
    else:
        pd_ref = None
        outs = rest
    (pose_o, tran_o, contact_o, pfoot_o, fbuf_o, joint_o, jlm_o, jtemp_o,
     sout_o) = outs
    inp = {"svec": svec_ref[:], "out7": out7_ref[:], "out8": out8_ref[:],
           "rcr": rcr_ref[:], "vr": vr_ref[:], "pc": pc_ref[:],
           "last_tran": last_tran_ref[:], "first_tran": first_tran_ref[:],
           "grav": grav_ref[:], "last_pfoot": last_pfoot_ref[:],
           "floor_buf": floor_buf_ref[:], "j_temp": j_temp_ref[:]}
    consts = {"gpar": gpar_ref[:], "anc": anc_ref[:], "bone": bone_ref[:],
              "mask_nroot": mask_nroot_ref[:], "row0": row0_ref[:],
              "feet": feet_ref[:], "wsub": wsub_ref[:],
              "v0sub": v0sub_ref[:], "j0": j0_ref[:], "ssync": ssync_ref[:],
              "msync": msync_ref[:], "fmean": fmean_ref[:],
              # pd stays a REF: tail_math loads [33, 24] slices
              # at static leading indices (a 3-D value slice
              # would be a cross-tile reshape)
              "pd": pd_ref}
    T = tail_math(inp, consts, blendshape=blendshape, **flags)
    pose_o[:] = T["pose"]
    tran_o[:] = T["tran"]
    contact_o[:] = T["contact"]
    pfoot_o[:] = T["pfoot"]
    fbuf_o[:] = T["floor_buf"]
    joint_o[:] = T["joint"]
    jlm_o[:] = T["j_lm"]
    jtemp_o[:] = T["j_temp"]
    sout_o[:] = jnp.concatenate(
        [T["floor_cnt"], T["vision_count"], jnp.zeros((1, 2), jnp.float32)],
        axis=1)


# ---------------------------------------------------------------------------
# Host-side constants and the caller-facing wrapper
# ---------------------------------------------------------------------------


def tail_constants(body_model):
    r"""Precompute the kernel's constant matrices from a ParametricModel:
    parent/ancestor gathers, bone vectors, the 33-landmark skinning subset,
    the ``sync_mp3d`` row-overwrite gather, and (when the model uses pose
    blendshapes) the [27, 33, 24] re-layout of ``posedirs`` that turns the
    [33, 3, 207] contraction into 27 static matmuls."""
    tree = body_model.tree
    J = len(tree.parent)
    pc = np.asarray(tree.parent_clamped)
    gpar = np.zeros((J, J), np.float32)
    gpar[np.arange(J), pc] = 1.0
    anc = np.asarray(tree.ancestor_matrix, np.float32)
    bone = np.asarray(body_model._bone_vector, np.float32)
    mask_nroot = np.ones((J, 1), np.float32)
    mask_nroot[0, 0] = 0.0
    row0 = np.zeros((1, J), np.float32)
    row0[0, 0] = 1.0
    feet = np.zeros((2, J), np.float32)
    feet[0, 10] = 1.0
    feet[1, 11] = 1.0
    # clamp like the XLA path's jnp gather does (synthetic test models can
    # have fewer vertices than the real SMPL ids in MP_VERTEX_MASK)
    wall = np.asarray(body_model._skinning_weights, np.float32)
    mp = np.clip(np.asarray(MP_VERTEX_MASK, np.int64), 0, wall.shape[0] - 1)
    wsub = wall[mp]
    v0sub = np.asarray(body_model._zero_pose_vertex, np.float32)[mp]
    j0 = np.asarray(body_model._zero_pose_joint, np.float32)
    # sync_mp3d (sig_mp.py:287-299): landmark row <- joint row
    pairs = ([(11 + i, 16 + i) for i in range(6)]
             + [(23 + i, 1 + i) for i in range(2)]
             + [(25 + i, 4 + i) for i in range(2)]
             + [(27 + i, 7 + i) for i in range(2)])
    ssync = np.zeros((33, J), np.float32)
    msync = np.zeros((33, 1), np.float32)
    for v, j in pairs:
        ssync[v, j] = 1.0
        msync[v, 0] = 1.0
    fmean = np.zeros((1, 11), np.float32)
    fmean[0, 5:11] = 1.0 / 6.0
    consts = dict(gpar=gpar, anc=anc, bone=bone, mask_nroot=mask_nroot,
                  row0=row0, feet=feet, wsub=wsub, v0sub=v0sub, j0=j0,
                  ssync=ssync, msync=msync, fmean=fmean, pd=None,
                  blendshape=bool(body_model.use_pose_blendshape))
    if consts["blendshape"]:
        pdirs = np.asarray(body_model._posedirs, np.float32)[mp]  # [33,3,207]
        pd = np.zeros((27, 33, J), np.float32)
        for cdim in range(3):
            for k in range(9):
                for j in range(1, J):
                    pd[cdim * 9 + k, :, j] = pdirs[:, cdim, (j - 1) * 9 + k]
        consts["pd"] = pd
    return consts


def geometry_tail(consts, cfg, out7, out8, carry, frame, c, Rcr, vr, pc,
                  k_lerp, interpret=None):
    r"""Evaluate the whole post-heads tail in one fused TPU kernel.

    Drop-in for the XLA tail of ``heads_and_tail`` (same inputs, same
    returned dict minus the head states, bit-equal math modulo matmul
    accumulation order). ``interpret=None`` auto-selects interpret mode
    off-TPU so CPU tests exercise the identical kernel code.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    landmarks = bool(cfg.use_reproj_opt or cfg.use_vision_updater)
    blendshape = consts["blendshape"] and landmarks

    svec = jnp.stack([
        jnp.asarray(c, f32), jnp.asarray(k_lerp, f32),
        carry["has_pfoot"].astype(f32), carry["has_tran"].astype(f32),
        carry["floor_cnt"].astype(f32),
        frame["first_frame"].astype(f32),
        frame["first_tran_valid"].astype(f32),
        carry["vision_count"].astype(f32)]).reshape(1, 8)

    operands = [
        svec,
        jnp.asarray(out7, f32).reshape(24, 6),
        jnp.asarray(out8, f32).reshape(1, 2),
        jnp.asarray(Rcr, f32).reshape(1, 9),
        jnp.asarray(vr, f32).reshape(1, 3),
        jnp.asarray(pc, f32).reshape(1, 3),
        carry["last_tran"].astype(f32).reshape(1, 3),
        frame["first_tran"].astype(f32).reshape(1, 3),
        frame["gravityc"].astype(f32).reshape(1, 3),
        carry["last_pfoot"].astype(f32),
        carry["floor_buf"].astype(f32),
        carry["j_temp"].astype(f32),
        jnp.asarray(consts["gpar"]), jnp.asarray(consts["anc"]),
        jnp.asarray(consts["bone"]), jnp.asarray(consts["mask_nroot"]),
        jnp.asarray(consts["row0"]), jnp.asarray(consts["feet"]),
        jnp.asarray(consts["wsub"]), jnp.asarray(consts["v0sub"]),
        jnp.asarray(consts["j0"]), jnp.asarray(consts["ssync"]),
        jnp.asarray(consts["msync"]), jnp.asarray(consts["fmean"]),
    ]
    if blendshape:
        operands.append(jnp.asarray(consts["pd"]))

    out_shape = (
        jax.ShapeDtypeStruct((24, 9), f32),   # pose (flat local, root=Rcr)
        jax.ShapeDtypeStruct((1, 3), f32),    # tran
        jax.ShapeDtypeStruct((1, 2), f32),    # contact
        jax.ShapeDtypeStruct((2, 3), f32),    # pfoot
        jax.ShapeDtypeStruct((11, 3), f32),   # floor_buf
        jax.ShapeDtypeStruct((24, 3), f32),   # joint
        jax.ShapeDtypeStruct((33, 3), f32),   # j_lm
        jax.ShapeDtypeStruct((33, 3), f32),   # j_temp
        jax.ShapeDtypeStruct((1, 4), f32),    # floor_cnt, vision_count
    )
    kern = partial(
        _kernel, conf_hi=float(cfg.conf_range[1]),
        contact_threshold=float(cfg.contact_threshold),
        distance_threshold=float(cfg.distance_threshold),
        tran_filter_num=float(cfg.tran_filter_num),
        height_threshold=float(cfg.height_threshold),
        use_flat_floor=bool(cfg.use_flat_floor), live=bool(cfg.live),
        update_vision_freq=int(cfg.update_vision_freq),
        landmarks=landmarks, blendshape=blendshape)
    (pose9, tran, contact, pfoot, fbuf, joint, jlm, jtemp, sout) = \
        pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in out_shape),
            interpret=interpret,
        )(*operands)

    dt = carry["last_tran"].dtype
    return {
        "contact": contact.reshape(2).astype(dt),
        "pose": pose9.reshape(24, 3, 3).astype(dt),
        "tran": tran.reshape(3).astype(dt),
        "pfoot": pfoot.astype(dt),
        "floor_buf": fbuf.astype(carry["floor_buf"].dtype),
        "floor_cnt": sout[0, 0].astype(carry["floor_cnt"].dtype),
        "vision_count": sout[0, 1].astype(carry["vision_count"].dtype),
        "j_temp": jtemp.astype(carry["j_temp"].dtype),
        "joint": joint.astype(dt),
        "j_lm": jlm.astype(dt),
    }
