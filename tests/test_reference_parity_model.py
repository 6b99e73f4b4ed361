r"""Cross-implementation parity for the body model and math layer.

Runs the ACTUAL torch reference (`articulate/model.py`, `articulate/math/*`)
via tests/_reference_harness.py against this repo's JAX rebuild on identical
inputs — both sides loaded from the same synthetic SMPL pickle, so the
comparison checks the *computation*, not the asset.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import load_reference

import jax
import jax.numpy as jnp

from robustcap_tpu import math as M
from robustcap_tpu.smpl.model import ParametricModel


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ref_model(ref):
    return ref.art.ParametricModel(ref.smpl_file)


@pytest.fixture(scope="module")
def our_model(ref):
    return ParametricModel(data=ref.smpl_data)


def _rand_pose(n, seed=0):
    g = torch.Generator().manual_seed(seed)
    aa = torch.randn(n * 24, 3, generator=g) * 0.4
    import articulate as art
    return art.math.axis_angle_to_rotation_matrix(aa).view(n, 24, 3, 3)


# ---------------------------------------------------------------------------
# ParametricModel (articulate/model.py)
# ---------------------------------------------------------------------------


def test_zero_pose_joint_and_vertex_with_shape(ref_model, our_model):
    torch.manual_seed(1)
    shape = torch.randn(4, 10)
    jt, vt = ref_model.get_zero_pose_joint_and_vertex(shape)
    jo, vo = our_model.get_zero_pose_joint_and_vertex(jnp.asarray(shape.numpy()))
    np.testing.assert_allclose(np.asarray(jo), jt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vo), vt.numpy(), atol=1e-5)


@pytest.mark.parametrize("use_shape,use_tran", [(False, False), (True, True)])
def test_forward_kinematics_parity(ref_model, our_model, use_shape, use_tran):
    r"""forward_kinematics (model.py:209-241) with/without shape and tran,
    calc_mesh=True: global rotations, joints, and LBS mesh vertices."""
    pose = _rand_pose(3, seed=2)
    shape = torch.randn(3, 10) * 0.5 if use_shape else None
    tran = torch.randn(3, 3) if use_tran else None
    grot_t, joint_t, vert_t = ref_model.forward_kinematics(
        pose, shape=shape, tran=tran, calc_mesh=True)
    grot_o, joint_o, vert_o = our_model.forward_kinematics(
        jnp.asarray(pose.numpy()),
        shape=None if shape is None else jnp.asarray(shape.numpy()),
        tran=None if tran is None else jnp.asarray(tran.numpy()),
        calc_mesh=True)
    np.testing.assert_allclose(np.asarray(grot_o), grot_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(joint_o), joint_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vert_o), vert_t.numpy(), atol=1e-5)


def test_forward_kinematics_pose_blendshape_parity(ref):
    r"""use_pose_blendshape=True path (model.py:237)."""
    ref_m = ref.art.ParametricModel(ref.smpl_file, use_pose_blendshape=True)
    our_m = ParametricModel(data=ref.smpl_data, use_pose_blendshape=True)
    pose = _rand_pose(2, seed=3)
    grot_t, joint_t, vert_t = ref_m.forward_kinematics(pose, calc_mesh=True)
    grot_o, joint_o, vert_o = our_m.forward_kinematics(
        jnp.asarray(pose.numpy()), calc_mesh=True)
    np.testing.assert_allclose(np.asarray(vert_o), vert_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(joint_o), joint_t.numpy(), atol=1e-5)


def test_inverse_kinematics_R_parity(ref_model, our_model):
    pose = _rand_pose(2, seed=4)
    glb = ref_model.forward_kinematics_R(pose)
    loc_t = ref_model.inverse_kinematics_R(glb)
    loc_o = our_model.inverse_kinematics_R(jnp.asarray(glb.numpy()))
    np.testing.assert_allclose(np.asarray(loc_o), loc_t.numpy(), atol=1e-5)


def test_bone_joint_conversion_parity(ref_model, our_model):
    torch.manual_seed(5)
    bones = torch.randn(3, 24, 3)
    jp_t = ref_model.bone_vector_to_joint_position(bones)
    jp_o = our_model.bone_vector_to_joint_position(jnp.asarray(bones.numpy()))
    np.testing.assert_allclose(np.asarray(jp_o), jp_t.numpy(), atol=1e-5)
    bv_t = ref_model.joint_position_to_bone_vector(jp_t)
    bv_o = our_model.joint_position_to_bone_vector(jp_o)
    np.testing.assert_allclose(np.asarray(bv_o), bv_t.numpy(), atol=1e-5)


def test_forward_kinematics_T_parity(ref, ref_model, our_model):
    import articulate as art
    pose = _rand_pose(2, seed=6)
    torch.manual_seed(6)
    p = torch.randn(2, 24, 3)
    T_local = art.math.transformation_matrix(pose, p)
    T_glb_t = ref_model.forward_kinematics_T(T_local)
    T_glb_o = our_model.forward_kinematics_T(jnp.asarray(T_local.numpy()))
    np.testing.assert_allclose(np.asarray(T_glb_o), T_glb_t.numpy(), atol=1e-5)
    T_loc_o = our_model.inverse_kinematics_T(T_glb_o)
    np.testing.assert_allclose(np.asarray(T_loc_o), T_local.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Math layer (articulate/math/angular.py, general.py)
# ---------------------------------------------------------------------------


def _am(ref):
    return ref.art.math


def test_axis_angle_to_rotation_matrix_parity(ref):
    torch.manual_seed(7)
    aa = torch.randn(64, 3) * 2.0
    expect = _am(ref).axis_angle_to_rotation_matrix(aa).numpy()
    got = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa.numpy())))
    np.testing.assert_allclose(got.reshape(expect.shape), expect, atol=1e-5)


def test_rotation_matrix_to_axis_angle_parity(ref):
    r"""Ours is closed-form branchless; the reference loops cv2.Rodrigues
    (angular.py:236-246). Compare the rotations they encode (axis-angle has a
    sign/2pi gauge; round-tripping both through R is the faithful check)."""
    torch.manual_seed(8)
    aa = torch.randn(32, 3) * 1.5
    R = _am(ref).axis_angle_to_rotation_matrix(aa)
    aa_ref = _am(ref).rotation_matrix_to_axis_angle(R)
    aa_ours = M.rotation_matrix_to_axis_angle(jnp.asarray(R.numpy()))
    R_ref = _am(ref).axis_angle_to_rotation_matrix(aa_ref).numpy()
    R_ours = np.asarray(M.axis_angle_to_rotation_matrix(aa_ours))
    np.testing.assert_allclose(R_ours.reshape(R_ref.shape), R_ref, atol=1e-4)
    # and numerically identical vectors away from the pi boundary
    np.testing.assert_allclose(np.asarray(aa_ours).reshape(32, 3),
                               aa_ref.numpy(), atol=1e-4)


def test_r6d_conversion_parity(ref):
    torch.manual_seed(9)
    r6d = torch.randn(40, 6)
    expect = _am(ref).r6d_to_rotation_matrix(r6d).numpy()
    got = np.asarray(M.r6d_to_rotation_matrix(jnp.asarray(r6d.numpy())))
    np.testing.assert_allclose(got.reshape(expect.shape), expect, atol=1e-5)
    back_t = _am(ref).rotation_matrix_to_r6d(torch.from_numpy(expect)).numpy()
    back_o = np.asarray(M.rotation_matrix_to_r6d(jnp.asarray(expect)))
    np.testing.assert_allclose(back_o.reshape(back_t.shape), back_t, atol=1e-6)


def test_quaternion_ops_parity(ref):
    torch.manual_seed(10)
    q1 = torch.nn.functional.normalize(torch.randn(16, 4), dim=-1)
    q2 = torch.nn.functional.normalize(torch.randn(16, 4), dim=-1)
    np.testing.assert_allclose(
        np.asarray(M.quaternion_product(jnp.asarray(q1.numpy()),
                                        jnp.asarray(q2.numpy()))),
        _am(ref).quaternion_product(q1, q2).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(M.quaternion_inverse(jnp.asarray(q1.numpy()))),
        _am(ref).quaternion_inverse(q1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(M.quaternion_to_rotation_matrix(jnp.asarray(q1.numpy()))
                   ).reshape(16, 3, 3),
        _am(ref).quaternion_to_rotation_matrix(q1).numpy(), atol=1e-6)
    aa_t = _am(ref).quaternion_to_axis_angle(q1).numpy()
    aa_o = np.asarray(M.quaternion_to_axis_angle(jnp.asarray(q1.numpy())))
    # same rotation (gauge-free compare through R)
    R_t = _am(ref).axis_angle_to_rotation_matrix(torch.from_numpy(aa_t))
    R_o = M.axis_angle_to_rotation_matrix(jnp.asarray(aa_o))
    np.testing.assert_allclose(np.asarray(R_o).reshape(16, 3, 3),
                               R_t.numpy(), atol=1e-5)
    q_t = _am(ref).axis_angle_to_quaternion(torch.from_numpy(aa_t)).numpy()
    q_o = np.asarray(M.axis_angle_to_quaternion(jnp.asarray(aa_t)))
    np.testing.assert_allclose(q_o.reshape(q_t.shape), q_t, atol=1e-6)


def test_euler_angle_parity(ref):
    torch.manual_seed(11)
    e = torch.rand(20, 3) * 2 - 1
    for seq in ("XYZ", "ZYX", "YZX"):
        expect = _am(ref).euler_angle_to_rotation_matrix(e, seq).numpy()
        got = np.asarray(M.euler_angle_to_rotation_matrix(
            jnp.asarray(e.numpy()), seq))
        np.testing.assert_allclose(got.reshape(expect.shape), expect,
                                   atol=1e-5, err_msg=f"seq={seq}")
        back_t = _am(ref).rotation_matrix_to_euler_angle(
            torch.from_numpy(expect), seq).numpy()
        back_o = np.asarray(M.rotation_matrix_to_euler_angle(expect, seq))
        np.testing.assert_allclose(back_o.reshape(back_t.shape), back_t,
                                   atol=1e-4, err_msg=f"seq={seq}")


def test_svd_rotate_parity(ref):
    torch.manual_seed(12)
    src = torch.randn(6, 10, 3)
    R_true = _am(ref).generate_random_rotation_matrix(6)
    tgt = src.bmm(R_true.transpose(1, 2)) + torch.randn(6, 1, 3) * 0.5 \
        + torch.randn(6, 10, 3) * 0.01
    for calc_t, calc_s in ((False, False), (True, False), (True, True)):
        out_t = _am(ref).svd_rotate(src, tgt, calc_R=True, calc_t=calc_t,
                                    calc_s=calc_s)
        out_o = M.svd_rotate(jnp.asarray(src.numpy()),
                             jnp.asarray(tgt.numpy()),
                             calc_R=True, calc_t=calc_t, calc_s=calc_s)
        for a, b, name in zip(out_o, out_t, ("R", "t", "s", "pts")):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), atol=2e-4,
                err_msg=f"svd_rotate {name} (t={calc_t}, s={calc_s})")


def test_general_ops_parity(ref):
    torch.manual_seed(13)
    x = torch.randn(8, 5)
    np.testing.assert_allclose(
        np.asarray(M.lerp(jnp.asarray(x.numpy()), jnp.asarray(-x.numpy()),
                          0.3)),
        _am(ref).lerp(x, -x, torch.tensor(0.3)).numpy(), atol=1e-6)
    nt, norm_t = _am(ref).normalize_tensor(x, return_norm=True)
    no, norm_o = M.normalize_tensor(jnp.asarray(x.numpy()), return_norm=True)
    np.testing.assert_allclose(np.asarray(no), nt.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm_o), norm_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(M.append_value(jnp.asarray(x.numpy()), 2.5)),
        _am(ref).append_value(x, 2.5).numpy(), atol=0)
    v = torch.randn(7, 3)
    np.testing.assert_allclose(
        np.asarray(M.vector_cross_matrix(jnp.asarray(v.numpy()))),
        _am(ref).vector_cross_matrix(v).numpy(), atol=0)


def test_angle_between_parity(ref):
    R1 = _am(ref).generate_random_rotation_matrix(10)
    R2 = _am(ref).generate_random_rotation_matrix(10)
    expect = _am(ref).angle_between(R1, R2).numpy()
    got = np.asarray(M.angle_between(jnp.asarray(R1.numpy()),
                                     jnp.asarray(R2.numpy())))
    np.testing.assert_allclose(got.reshape(expect.shape), expect, atol=1e-3)
