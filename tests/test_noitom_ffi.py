r"""Noitom MocapApi ctypes surface driven end-to-end against a mock vendor
library compiled from native/mock_mocap_api.cpp (reference
articulate/utils/noitom/mocap_api.py)."""

import os
import subprocess

import numpy as np
import pytest

from robustcap_tpu.sensors import noitom as N

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "mock_mocap_api.cpp")


@pytest.fixture(scope="module")
def mock_lib(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("noitom") / "libMocapApi.so")
    subprocess.run(["g++", "-O1", "-shared", "-fPIC", "-o", out, SRC],
                   check=True)
    return out


class TestLibraryLoading:
    def test_missing_library_message(self):
        with pytest.raises(FileNotFoundError, match="vendor library"):
            N.MocapLib("/nonexistent/libMocapApi.so")

    def test_unknown_interface_rejected(self, mock_lib):
        lib = N.MocapLib(mock_lib)

        class Bogus(N._ApplicationTable):
            VERSION = b"PROC_TABLE:IMCPBogus_001"

        with pytest.raises(N.MocapApiError, match="NotSupported"):
            lib.table(Bogus)


class TestApplicationLifecycle:
    def test_open_requires_settings(self, mock_lib):
        r"""The vendor refuses OpenApplication before UDP+calc-data settings
        (ServerNotReady); the error path must surface the enum name."""
        lib = N.MocapLib(mock_lib)
        app = N.MCPApplication(lib)
        with pytest.raises(N.MocapApiError, match="ServerNotReady"):
            app.open()

    def test_full_lifecycle(self, mock_lib):
        lib = N.MocapLib(mock_lib)
        app = N.MCPApplication(lib)
        settings = N.MCPSettings(lib)
        settings.set_udp(7777)
        settings.set_calc_data()
        settings.set_bvh_rotation(N.MCPBvhRotation.YXZ)
        app.set_settings(settings)
        app.open()
        assert app.is_opened()
        sensors = app.get_sensor_modules()
        assert len(sensors) == 6
        assert [s.get_id() for s in sensors] == [1, 2, 3, 4, 5, 6]
        app.close()
        app.destroy()


class TestSensorPolling:
    def test_sensor_set_discovery_and_frames(self, mock_lib):
        r"""The 6-IMU polling loop (reference __main__:1020-1041): discovery
        via SensorModulesUpdated events, then posture/acceleration frames."""
        s = N.NoitomSensorSet(mock_lib, udp_port=7777).connect()
        try:
            f0 = s.poll()
            f1 = s.poll()
            assert isinstance(f0, N.NoitomFrame)
            assert f0.quat_wxyz.shape == (6, 4)
            assert f0.acc.shape == (6, 3)
            norms = np.linalg.norm(f1.quat_wxyz, axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)
            # frames advance (mock signal is a function of the frame count)
            assert not np.allclose(f0.quat_wxyz, f1.quat_wxyz)
            assert f1.timestamp > f0.timestamp
            np.testing.assert_allclose(f1.acc[:, 2], 9.8, atol=1e-5)
        finally:
            s.close()

    def test_sensor_details(self, mock_lib):
        lib = N.MocapLib(mock_lib)
        app = N.MCPApplication(lib)
        settings = N.MCPSettings(lib)
        settings.set_udp(7777)
        settings.set_calc_data()
        app.set_settings(settings)
        app.open()
        sm = app.get_sensor_modules()[0]
        assert sm.get_temperature() == pytest.approx(36.5)
        assert sm.get_compass_value() == (1.0, 0.0, 0.0)
        assert sm.get_angular_velocity()[2] >= 0.0
        app.close()

    def test_backcompat_facade(self, mock_lib):
        api = N.MocapApi(mock_lib).connect(port=7777)
        try:
            frame = api.poll()
            assert frame.quat_wxyz.shape == (6, 4)
        finally:
            api.close()
        with pytest.raises(RuntimeError, match="not connected"):
            N.MocapApi(mock_lib).poll()


class TestAvatarSkeleton:
    def test_avatar_and_joint_traversal(self, mock_lib):
        lib = N.MocapLib(mock_lib)
        app = N.MCPApplication(lib)
        settings = N.MCPSettings(lib)
        settings.set_udp(7777)
        settings.set_calc_data()
        app.set_settings(settings)
        app.open()
        avatars = app.get_avatars()
        assert len(avatars) == 1
        av = avatars[0]
        assert av.get_name() == "MockAvatar"
        root = av.get_root_joint()
        assert root.get_name() == "Hips"
        assert root.get_tag() == N.MCPJointTag.Hips
        kids = root.get_children()
        assert sorted(j.get_name() for j in kids) == ["RightUpLeg", "Spine"]
        w, x, y, z = root.get_local_rotation()
        np.testing.assert_allclose(w * w + x * x + y * y + z * z, 1.0,
                                   atol=1e-5)
        joints = av.get_joints()
        assert len(joints) == 3
        # joint-attached sensor module resolves
        sm = root.get_sensor_module()
        assert 1 <= sm.get_id() <= 6
        app.close()


class TestEnums:
    def test_joint_tags_match_reference_values(self):
        r"""EMCPJointTag values -1..60 (mocap_api.py:50-113)."""
        assert N.MCPJointTag.Invalid == -1
        assert N.MCPJointTag.Hips == 0
        assert N.MCPJointTag.Spine == 7
        assert N.MCPJointTag.Head == 12
        assert N.MCPJointTag.LeftShoulder == 36
        assert N.MCPJointTag.Spine3 == 59
        assert N.MCPJointTag.JointsCount == 60

    def test_event_types_and_errors(self):
        assert N.MCPEventType.AvatarUpdated == 256
        assert N.MCPEventType.SensorModulesUpdated == 1024
        assert N.MCPError.ServerNotReady == 16
        assert N.MCPError.QueuedCommandFaild == 21
