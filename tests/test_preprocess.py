r"""Preprocessing transforms: resampling, occlusion, bbox smoothing,
sanity checks."""

import numpy as np
import pytest

from robustcap_tpu.preprocess import (
    amass_sequence_to_work, check_real_vs_synthetic_imu, get_bbox,
    get_smooth_bbox_params, interpolate_keypoints, kp_to_bbox_param,
    occlude_with_objects, paste_over, random_occluders, resample_sequence,
    resize_by_factor, smooth_random_motion, totalcapture_align_imus)
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


@pytest.fixture(scope="module")
def model():
    return ParametricModel(data=synthetic_smpl_data(num_verts=7000))


class TestResampling:
    def test_resample_identity(self):
        x = np.arange(30, dtype=np.float32)[:, None]
        np.testing.assert_allclose(resample_sequence(x, 60, 60), x)

    def test_resample_downsample(self):
        x = np.arange(120, dtype=np.float32)[:, None]
        y = resample_sequence(x, 120, 60)
        assert len(y) == 60
        np.testing.assert_allclose(y[:, 0], np.round(np.arange(60) * 2))

    def test_interpolate_keypoints(self):
        kp = np.zeros((4, 2, 3), np.float32)
        kp[:, 0, 0] = [0, 1, 2, 3]
        out = interpolate_keypoints(kp, 2)
        assert len(out) == 7
        np.testing.assert_allclose(out[:, 0, 0],
                                   [0, 0.5, 1, 1.5, 2, 2.5, 3], atol=1e-6)


class TestAmassWork:
    def test_sequence_to_work(self, model):
        rng = np.random.RandomState(0)
        aa, tran = smooth_random_motion(rng, 40)
        entry = amass_sequence_to_work(model, aa.reshape(40, 72), tran)
        assert entry["imu_ori"].shape == (40, 6, 3, 3)
        assert entry["imu_acc"].shape == (40, 6, 3)
        assert entry["sync_3d_mp"].shape == (40, 33, 3)
        assert entry["joint3d"].shape == (40, 24, 3)

    def test_real_vs_synthetic_check(self, model):
        rng = np.random.RandomState(1)
        aa, tran = smooth_random_motion(rng, 30)
        entry = amass_sequence_to_work(model, aa.reshape(30, 72), tran)
        res = check_real_vs_synthetic_imu(model, aa.reshape(30, 72), tran,
                                          entry["imu_ori"], entry["imu_acc"])
        assert res["ok"] and res["mean_angle_deg"] < 1e-3

    def test_tc_sensor_alignment(self):
        rng = np.random.RandomState(2)
        ori = rng.randn(5, 6, 3, 3).astype(np.float32)
        acc = rng.randn(5, 6, 3).astype(np.float32)
        ori2, acc2 = totalcapture_align_imus(ori, acc)
        flip = np.diag([-1.0, 1, -1])
        np.testing.assert_allclose(ori2[:, 0], flip @ ori[:, 2], atol=1e-6)
        np.testing.assert_allclose(acc2[:, 5], acc[:, 5] @ flip.T, atol=1e-6)


class TestOcclusion:
    def test_paste_over_blends(self):
        dst = np.zeros((20, 20, 3), np.uint8)
        src = np.full((6, 6, 4), 255, np.uint8)
        out = paste_over(src, dst, (10, 10))
        assert out[10, 10].tolist() == [255, 255, 255]
        assert out[0, 0].tolist() == [0, 0, 0]
        # clipped paste at the border doesn't crash
        out = paste_over(src, dst, (0, 0))
        assert out[0, 0].tolist() == [255, 255, 255]
        out = paste_over(src, dst, (-10, -10))  # fully outside
        np.testing.assert_array_equal(out, dst)

    def test_occlude_with_objects_fixed_centers(self):
        rng = np.random.RandomState(0)
        occs = random_occluders(rng, n=3)
        im = np.zeros((64, 64, 3), np.uint8)
        out1 = occlude_with_objects(im, occs, np.random.RandomState(5),
                                    centers=[(32, 32)])
        assert (out1 != im).any()

    def test_resize_by_factor(self):
        im = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        out = resize_by_factor(im, 2.0)
        assert out.shape == (8, 8, 1)


class TestBbox:
    def test_kp_to_bbox(self):
        kp = np.zeros((5, 3), np.float32)
        kp[:, 0] = [0, 10, 20, 5, 2]
        kp[:, 1] = [0, 5, 10, 1, 3]
        kp[:, 2] = 1.0
        cx, cy, s = kp_to_bbox_param(kp, vis_thresh=0.3)
        # scale = 150 / diagonal of the keypoint box (smooth_bbox.py:49-53)
        assert cx == 10 and cy == 5
        assert abs(s - 150.0 / np.hypot(20, 10)) < 1e-6

    def test_smooth_track(self):
        rng = np.random.RandomState(0)
        kp = np.zeros((30, 5, 3), np.float32)
        kp[..., :2] = 50 + rng.randn(30, 5, 2) * 20
        kp[..., 2] = 1.0
        kp[10, :, 2] = 0.0  # one invalid frame gets interpolated
        track, start, end = get_smooth_bbox_params(kp, vis_thresh=0.3)
        assert track.shape == (30, 3)
        assert (start, end) == (0, 30)
        assert np.isfinite(track).all()
        assert abs(track[:, 0].mean() - 50) < 15

    def test_get_bbox_43(self):
        uv = np.asarray([[100, 100], [300, 260]], np.float32)
        u0, v0, u1, v1 = get_bbox(uv, 1080, 1920)
        assert 0 <= u0 < u1 <= 1080 and 0 <= v0 < v1 <= 1920
