r"""BulletMotionViewer draws a procedural capsule/sphere skeleton
(reference articulate/utils/bullet/view_motion.py:23) — exercised against a
fake pybullet module that records every GUI call, since pybullet isn't
installed in this environment."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
from robustcap_tpu.viz.viewers import BulletMotionViewer


class FakePyBullet(types.ModuleType):
    GEOM_SPHERE = 2
    GEOM_CAPSULE = 7
    GUI = 1
    COV_ENABLE_Y_AXIS_UP = 11

    def __init__(self):
        super().__init__("pybullet")
        self.shapes = []          # (geom, kwargs)
        self.bodies = []          # visual shape index per body
        self.positions = {}       # body id -> (pos, quat)
        self.connected = False

    def connect(self, mode):
        self.connected = True
        return 7

    def disconnect(self, client=None):
        self.connected = False

    def configureDebugVisualizer(self, flag, enable):
        pass

    def createVisualShape(self, geom, **kw):
        self.shapes.append((geom, kw))
        return len(self.shapes) - 1

    def createMultiBody(self, baseMass=0, baseVisualShapeIndex=-1):
        self.bodies.append(baseVisualShapeIndex)
        return len(self.bodies) - 1

    def resetBasePositionAndOrientation(self, body, pos, quat):
        self.positions[body] = (np.asarray(pos, np.float64),
                                np.asarray(quat, np.float64))


@pytest.fixture()
def fake_bullet(monkeypatch):
    fake = FakePyBullet()
    monkeypatch.setitem(sys.modules, "pybullet", fake)
    return fake


@pytest.fixture(scope="module")
def model():
    return ParametricModel(data=synthetic_smpl_data(num_verts=400))


def _pose_tran(seed=0):
    rng = np.random.RandomState(seed)
    aa = (rng.randn(24, 3) * 0.2).astype(np.float32)
    pose = np.asarray(M.axis_angle_to_rotation_matrix(
        jnp.asarray(aa))).reshape(24, 3, 3)
    return pose, np.asarray([0.1, 0.9, 0.2], np.float32)


class TestBulletMotionViewer:
    def test_connect_builds_skeleton_primitives(self, fake_bullet, model):
        v = BulletMotionViewer(n=2, body_model=model).connect()
        # per subject: 24 joint spheres + 23 bone capsules
        assert len(fake_bullet.bodies) == 2 * (24 + 23)
        geoms = [g for g, _ in fake_bullet.shapes]
        assert geoms.count(FakePyBullet.GEOM_SPHERE) == 48
        assert geoms.count(FakePyBullet.GEOM_CAPSULE) == 46
        v.disconnect()
        assert not fake_bullet.connected

    def test_update_moves_every_primitive(self, fake_bullet, model):
        v = BulletMotionViewer(n=1, body_model=model).connect()
        pose, tran = _pose_tran()
        v.update_all([pose], [tran])
        assert len(fake_bullet.positions) == 24 + 23
        # joint spheres land exactly on FK joint positions + tran
        _, joints = model.forward_kinematics(jnp.asarray(pose[None]))
        expect = np.asarray(joints)[0] + tran
        for j in range(24):
            np.testing.assert_allclose(fake_bullet.positions[j][0],
                                       expect[j], atol=1e-5)
        # capsules sit at bone midpoints with unit quaternions
        for bid in range(24, 47):
            pos, quat = fake_bullet.positions[bid]
            np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-6)

    def test_capsule_orientation_aligns_with_bone(self, fake_bullet, model):
        v = BulletMotionViewer(n=1, body_model=model).connect()
        pose, tran = _pose_tran(3)
        v.update_all([pose], [tran])
        _, joints = model.forward_kinematics(jnp.asarray(pose[None]))
        jpos = np.asarray(joints)[0] + tran
        parent = model.parent
        # check one capsule: rotating +z by the stored quaternion gives the
        # bone direction
        j = 4  # left knee
        pos, q = fake_bullet.positions[24 + (j - 1)]
        x, y, z, w = q
        R = np.asarray(M.quaternion_to_rotation_matrix(
            jnp.asarray([[w, x, y, z]], jnp.float32))).reshape(3, 3)
        d = jpos[j] - jpos[parent[j]]
        d = d / np.linalg.norm(d)
        np.testing.assert_allclose(R @ [0, 0, 1], d, atol=1e-5)
        np.testing.assert_allclose(pos, (jpos[j] + jpos[parent[j]]) / 2,
                                   atol=1e-5)

    def test_multi_subject_offsets(self, fake_bullet, model):
        v = BulletMotionViewer(n=2, body_model=model, overlap=False).connect()
        pose, tran = _pose_tran()
        v.update_all([pose, pose], [tran, tran])
        # same pose/tran, subjects separated by the 1.2 m offset in x
        p0 = fake_bullet.positions[0][0]
        p1 = fake_bullet.positions[47][0]
        np.testing.assert_allclose(p0 - p1, [1.2, 0, 0], atol=1e-5)

    def test_wrong_subject_count_raises(self, fake_bullet, model):
        v = BulletMotionViewer(n=2, body_model=model).connect()
        pose, tran = _pose_tran()
        with pytest.raises(AssertionError, match="subject count"):
            v.update_all([pose], [tran])

    def test_headless_records_history(self, model, monkeypatch):
        monkeypatch.setitem(sys.modules, "pybullet", None)
        v = BulletMotionViewer(n=1, body_model=model).connect()
        pose, tran = _pose_tran()
        v.update_all([pose], [tran])
        assert len(v.history) == 1