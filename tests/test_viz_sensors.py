r"""Visualization (software rasterizer, keypoint drawing) and sensor codecs."""

import numpy as np
import pytest

from robustcap_tpu.sensors import (SyntheticImuSource,
                                   encode_complete_quaternion,
                                   parse_complete_quaternion)
from robustcap_tpu.viz import (Renderer, SoftwareRenderer, draw_keypoints,
                               view_2d_keypoint_on_z_1)


class TestSoftwareRenderer:
    def test_triangle_visible_and_depth(self):
        r = SoftwareRenderer((64, 64))
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
        verts = np.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0],
                          [0.0, 0.3, 2.0],
                          [-0.2, -0.2, 1.0], [0.2, -0.2, 1.0],
                          [0.0, 0.3, 1.0]], np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        img = r.render(None, verts, faces, K, mesh_color=(1, 0, 0, 1.0))
        assert (img[:, :, 0] > 0).any()
        # nearer triangle (z=1) wins the z-test: with distinct colors
        img2 = r.render(None, verts[3:], faces[:1], K,
                        mesh_color=(0, 1, 0, 1.0))
        center2 = img2[32, 32].astype(int)
        assert center2[1] > center2[0]

    def test_overlay_keeps_background(self):
        r = SoftwareRenderer((32, 32))
        K = np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]])
        bg = np.full((32, 32, 3), 7, np.uint8)
        verts = np.array([[0, 0, 1.0], [0.1, 0, 1.0], [0, 0.1, 1.0]])
        out = r.render(bg, verts, np.array([[0, 1, 2]]), K)
        assert (out[0, 0] == 7).all()

    def test_renderer_wrapper(self):
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        model = ParametricModel(data=synthetic_smpl_data(num_verts=200))
        r = Renderer(resolution=(64, 64), model=model)
        verts = np.asarray(model.get_zero_pose_joint_and_vertex()[1])
        verts = verts + np.array([0, 0, 3.0], np.float32)
        K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
        img = r.render(None, verts, K)
        assert img.shape == (64, 64, 3)
        assert img.sum() > 0


class TestKeypointViz:
    def test_draw_confidence_alpha(self):
        img = np.zeros((50, 50, 3), np.uint8)
        kp = np.array([[25, 25, 1.0], [10, 10, 0.0]])
        out = draw_keypoints(img, kp)
        assert out[25, 25, 2] > 200          # confident point drawn
        assert out[10, 10].sum() == 0        # zero-confidence invisible

    def test_z1_plane_view(self):
        kp = np.zeros((2, 5, 3), np.float32)
        kp[..., 2] = 1.0
        frames = view_2d_keypoint_on_z_1(kp)
        assert len(frames) == 2 and frames[0].shape == (480, 360, 3)


class TestSensorCodecs:
    def test_complete_quaternion_roundtrip(self):
        q = np.array([0.7, 0.1, -0.2, 0.3], np.float32)
        a = np.array([0.5, -9.8, 0.1], np.float32)
        p = parse_complete_quaternion(encode_complete_quaternion(1.25, q, a))
        assert abs(p.timestamp - 1.25) < 1e-5
        np.testing.assert_allclose(p.quat_wxyz, q, atol=1e-6)
        np.testing.assert_allclose(p.free_acc, a, atol=1e-6)

    def test_short_payload_rejected(self):
        with pytest.raises(ValueError):
            parse_complete_quaternion(b"\x00" * 10)

    def test_dot_set_feed_get(self):
        from robustcap_tpu.sensors import XsensDotSet
        dots = XsensDotSet(["AA:BB"] * 2)
        dots.feed(0, encode_complete_quaternion(
            0.5, [1, 0, 0, 0], [0, 0, 9.8]))
        t, q, a = dots.get(0, timeout=0.5)
        assert abs(t - 0.5) < 1e-5
        assert not dots.is_available(0)
        with pytest.raises(TimeoutError):
            dots.get(1, timeout=0.05)

    def test_synthetic_source(self):
        rng = np.random.RandomState(0)
        ori = np.tile(np.eye(3, dtype=np.float32), (10, 6, 1, 1))
        acc = rng.randn(10, 6, 3).astype(np.float32)
        src = SyntheticImuSource(ori, acc)
        t, q, a = src.read()
        assert q.shape == (6, 4) and a.shape == (6, 3)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1, atol=1e-5)


class TestMvnx:
    def test_read_minimal_file(self, tmp_path):
        xml = """<?xml version="1.0"?>
<mvnx xmlns="http://www.xsens.com/mvn/mvnx">
  <subject frameRate="60">
    <segments>
      <segment id="1" label="Pelvis"/><segment id="2" label="Head"/>
    </segments>
    <sensors><sensor label="imu1"/></sensors>
    <frames>
      <frame time="0" type="normal">
        <orientation>1 0 0 0 1 0 0 0</orientation>
        <position>0 0 1 0 0 2</position>
      </frame>
      <frame time="16" type="normal">
        <orientation>1 0 0 0 1 0 0 0</orientation>
        <position>0 0 1.1 0 0 2.1</position>
      </frame>
    </frames>
  </subject>
</mvnx>"""
        p = tmp_path / "a.mvnx"
        p.write_text(xml)
        from robustcap_tpu.sensors import read_mvnx
        out = read_mvnx(str(p))
        assert out["segment_names"] == ["Pelvis", "Head"]
        assert out["frame_rate"] == 60.0
        assert out["orientation"].shape == (2, 2, 4)
        assert out["position"].shape == (2, 2, 3)


class TestDotExportReader:
    def test_reads_session_dir(self, tmp_path):
        r"""Xsens DOT Data Exporter CSV session -> {sensor: q/a arrays}
        (reference xsens_offline_data_reader.py)."""
        import numpy as np
        from robustcap_tpu.sensors import read_dot_export_csvs
        for sid in ("AAA111", "BBB222"):
            lines = ["sep=,", "PacketCounter,Quat_W,Quat_X,Quat_Y,Quat_Z,"
                     "Acc_X,Acc_Y,Acc_Z"]
            for t in range(5):
                lines.append(f"{t},1,0,0,0,{0.1*t:.2f},0,9.8")
            (tmp_path / f"20230124_{sid}_v1.csv").write_text(
                "\n".join(lines) + "\n")
        data = read_dot_export_csvs(str(tmp_path))
        assert set(data) == {"AAA111", "BBB222"}
        assert data["AAA111"]["q"].shape == (5, 4)
        np.testing.assert_allclose(data["AAA111"]["a"][:, 2], 9.8)
        np.testing.assert_allclose(data["BBB222"]["a"][3, 0], 0.3,
                                   atol=1e-6)


class TestDebugParams:
    def test_button_click_semantics(self):
        r"""is_click() fires once per press (reference bullet.py:104-113)."""
        from robustcap_tpu.viz import Button
        b = Button("start")
        assert not b.is_click()
        b.click()
        assert b.is_click()
        assert not b.is_click()    # consumed
        b.click(); b.click()
        assert b.num_clicks() == 3

    def test_slider_value(self):
        from robustcap_tpu.viz import Slider
        s = Slider("gain", range=(0, 10), current=2.5)
        assert s.get_float() == 2.5
        s.set(7.6)
        assert s.get_int() == 8
