import numpy as np
import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


def make_model(**kw):
    return ParametricModel(data=synthetic_smpl_data(num_verts=500), **kw)


def random_pose(seed, b, j=24):
    rng = np.random.RandomState(seed)
    aa = rng.normal(0, 0.3, (b * j, 3)).astype(np.float32)
    return np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(b, j, 3, 3)


def lbs_bruteforce(model, pose, tran=None):
    """Independent numpy implementation of FK + LBS from the SMPL equations."""
    data = model.data
    parent = [p if p is not None else -1 for p in data.parent]
    B, J = pose.shape[:2]
    j0 = data.joints - data.joints[:1]
    v0 = data.v_template - data.joints[:1]
    R_glb = np.zeros_like(pose)
    p_glb = np.zeros((B, J, 3), dtype=np.float32)
    for b in range(B):
        R_glb[b, 0] = pose[b, 0]
        p_glb[b, 0] = 0
        for i in range(1, J):
            p = parent[i]
            R_glb[b, i] = R_glb[b, p] @ pose[b, i]
            p_glb[b, i] = p_glb[b, p] + R_glb[b, p] @ (j0[i] - j0[p])
    # per-vertex blended transform
    verts = np.zeros((B, len(v0), 3), dtype=np.float32)
    for b in range(B):
        t_j = p_glb[b] - np.einsum("jrc,jc->jr", R_glb[b], j0)
        R_v = np.einsum("vj,jrc->vrc", data.skinning_weights, R_glb[b])
        t_v = data.skinning_weights @ t_j
        verts[b] = np.einsum("vrc,vc->vr", R_v, v0) + t_v
    if tran is not None:
        p_glb = p_glb + tran[:, None]
        verts = verts + tran[:, None]
    return R_glb, p_glb, verts


class TestForwardKinematics:
    def test_zero_pose(self):
        model = make_model()
        pose = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 24, 3, 3))
        R, j, v = model.forward_kinematics(jnp.asarray(pose), calc_mesh=True)
        j0, v0 = model.get_zero_pose_joint_and_vertex()
        np.testing.assert_allclose(j[0], j0, atol=1e-5)
        np.testing.assert_allclose(v[0], v0, atol=1e-5)

    def test_vs_bruteforce_lbs(self):
        model = make_model()
        pose = random_pose(0, 3)
        tran = np.random.RandomState(1).randn(3, 3).astype(np.float32)
        R, j, v = model.forward_kinematics(jnp.asarray(pose),
                                           tran=jnp.asarray(tran),
                                           calc_mesh=True)
        R_ref, j_ref, v_ref = lbs_bruteforce(model, pose, tran)
        np.testing.assert_allclose(R, R_ref, atol=1e-4)
        np.testing.assert_allclose(j, j_ref, atol=1e-4)
        np.testing.assert_allclose(v, v_ref, atol=1e-4)

    def test_fk_ik_round_trip(self):
        model = make_model()
        pose = random_pose(2, 2)
        glb = model.forward_kinematics_R(jnp.asarray(pose))
        loc = model.inverse_kinematics_R(glb)
        np.testing.assert_allclose(loc, pose, atol=1e-4)

    def test_shaped_body(self):
        model = make_model()
        shape = jnp.asarray(np.random.RandomState(3).randn(2, 10), jnp.float32)
        j, v = model.get_zero_pose_joint_and_vertex(shape)
        assert j.shape == (2, 24, 3) and v.shape == (2, 500, 3)
        np.testing.assert_allclose(j[:, 0], np.zeros((2, 3)), atol=1e-5)
        # shaped FK runs and differs from mean-shape FK
        pose = random_pose(4, 2)
        _, j1, v1 = model.forward_kinematics(jnp.asarray(pose), shape=shape,
                                             calc_mesh=True)
        _, j2, v2 = model.forward_kinematics(jnp.asarray(pose), calc_mesh=True)
        assert np.abs(np.asarray(j1) - np.asarray(j2)).max() > 1e-4

    def test_pose_blendshape_path(self):
        model_pb = ParametricModel(data=synthetic_smpl_data(num_verts=500),
                                   use_pose_blendshape=True)
        pose = random_pose(5, 1)
        _, _, v_pb = model_pb.forward_kinematics(jnp.asarray(pose),
                                                 calc_mesh=True)
        model = make_model()
        _, _, v = model.forward_kinematics(jnp.asarray(pose), calc_mesh=True)
        delta = np.abs(np.asarray(v_pb) - np.asarray(v)).max()
        assert 0 < delta < 0.1  # small blendshape correction applied

    def test_bone_vector_round_trip(self):
        model = make_model()
        j0, _ = model.get_zero_pose_joint_and_vertex()
        bone = model.joint_position_to_bone_vector(j0[None])
        j2 = model.bone_vector_to_joint_position(bone)
        np.testing.assert_allclose(j2[0], j0, atol=1e-6)


class TestExport:
    def test_save_unity_motion(self, tmp_path):
        model = make_model()
        pose = random_pose(6, 2)
        tran = np.zeros((2, 3), np.float32)
        model.save_unity_motion(pose, tran, str(tmp_path))
        lines = open(tmp_path / "pose.txt").read().strip().split("\n")
        assert len(lines) == 2 and len(lines[0].split(",")) == 72
        lines = open(tmp_path / "tran.txt").read().strip().split("\n")
        assert len(lines) == 2 and len(lines[0].split(",")) == 3

    def test_save_obj(self, tmp_path):
        model = make_model()
        v0 = model.get_zero_pose_joint_and_vertex()[1]
        p = tmp_path / "m.obj"
        model.save_obj_mesh(v0, str(p))
        assert p.read_text().startswith("v ")


class TestViewMotion:
    r"""Offscreen rebuild of the reference's open3d viewers
    (articulate/model.py:278-390): view_motion/view_mesh render via the
    software rasterizer and must produce non-empty frames headlessly."""

    def test_view_motion_sequence(self, tmp_path):
        model = make_model()
        pose = random_pose(1, 3)
        tran = np.zeros((3, 3), np.float32)
        out = tmp_path / "motion.mp4"
        frames = model.view_motion([pose], [tran], fps=30,
                                   output_path=str(out),
                                   resolution=(96, 96))
        assert frames.shape == (3, 96, 96, 3) and frames.dtype == np.uint8
        assert frames.any(), "mesh must rasterize to non-black pixels"
        assert out.exists() or out.with_suffix(".mp4.npy").exists()

    def test_view_motion_two_subjects_offset(self):
        model = make_model()
        pose_a, pose_b = random_pose(2, 2), random_pose(5, 2)
        f1 = model.view_motion([pose_a, pose_b], resolution=(96, 96))
        f2 = model.view_motion([pose_a], resolution=(96, 96))
        assert f1.shape == f2.shape == (2, 96, 96, 3)
        assert (f1 != f2).any()  # second subject visible

    def test_single_frame_turntable(self):
        model = make_model()
        pose = random_pose(3, 1)
        frames = model.view_motion([pose], resolution=(64, 64))
        assert frames.shape == (60, 64, 64, 3)
        # the orbit must actually move the camera
        assert (frames[0] != frames[30]).any()

    def test_view_mesh_overlay(self):
        model = make_model()
        pose = random_pose(4, 2)
        verts = model.forward_kinematics(jnp.asarray(pose),
                                         calc_mesh=True)[2]
        verts = np.array(np.asarray(verts))
        verts[..., 2] += 3.0  # push in front of the camera
        images = np.full((64, 64, 3), 17, np.uint8)
        K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
        frames = model.view_mesh_overlay(verts, images, K)
        assert frames.shape == (2, 64, 64, 3)
        assert (frames != 17).any()  # mesh composited over the background
        # background pixels preserved
        assert (frames == 17).any()
