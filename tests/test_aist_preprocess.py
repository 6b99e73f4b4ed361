r"""AIST++ raw-conversion transforms on synthetic raw records."""

import numpy as np
import pytest

from robustcap_tpu.preprocess.aist import (aist_camera_params,
                                           aist_sequence_to_work,
                                           compute_not_aligned,
                                           repair_frame_count)
from robustcap_tpu.preprocess import smooth_random_motion
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


@pytest.fixture(scope="module")
def model():
    return ParametricModel(data=synthetic_smpl_data(num_verts=7000))


def make_raw(model, T=24, seed=0):
    rng = np.random.RandomState(seed)
    aa, tran = smooth_random_motion(rng, T)
    motion = {"smpl_poses": aa.reshape(T, 72),
              "smpl_trans": tran * 100.0,     # raw AIST scale
              "smpl_scaling": np.asarray([100.0])}
    cameras = [{
        "matrix": np.diag([1200.0, 1200.0, 1.0]).tolist(),
        "rotation": [0.0, 0.0, 0.0],
        "translation": [0.0, 0.0, 400.0],     # cm
    } for _ in range(2)]
    return motion, cameras, tran


class TestAistConversion:
    def test_camera_params(self, model):
        _, cameras, _ = make_raw(model)
        params = aist_camera_params(cameras)
        K, Tcw = params[0]
        assert K[0, 0] == 1200.0
        np.testing.assert_allclose(Tcw[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(Tcw[:3, 3], [0, 0, 4.0], atol=1e-6)

    def test_repair_frame_count(self):
        kp = np.random.RandomState(0).rand(10, 33, 3).astype(np.float32)
        assert repair_frame_count(kp, 10) is kp or len(
            repair_frame_count(kp, 10)) == 10
        padded = repair_frame_count(kp, 12)
        assert len(padded) == 12
        np.testing.assert_allclose(padded[-1], kp[-1])
        assert len(repair_frame_count(kp, 8)) == 8
        assert repair_frame_count(kp, 20) is None
        assert repair_frame_count(None, 10) is None

    def test_sequence_to_work_and_alignment(self, model):
        motion, cameras, tran = make_raw(model)
        T = 24
        # build consistent detector keypoints by projecting the GT hips
        entry0 = aist_sequence_to_work(model, motion, cameras,
                                       [None, None], name="s_cAll")
        joints = entry0["joint3d"]
        kps = []
        for K, Tcw in aist_camera_params(cameras):
            jc = joints @ Tcw[:3, :3].T + Tcw[:3, 3]
            uv = jc @ K.T
            uv = uv[..., :2] / uv[..., 2:]
            kp = np.zeros((T, 33, 3), np.float32)
            kp[:, 23:25, 0] = uv[:, 1:3, 0] / 1920
            kp[:, 23:25, 1] = uv[:, 1:3, 1] / 1080
            kp[:, 23:25, 2] = 1.0
            kps.append(kp)
        entry = aist_sequence_to_work(model, motion, cameras, kps,
                                      name="s_cAll")
        # translations were de-scaled back to meters
        np.testing.assert_allclose(entry["tran"], tran, atol=1e-4)
        assert entry["imu_ori"].shape == (T, 6, 3, 3)
        # aligned cameras produce no not_aligned entries
        assert compute_not_aligned(entry) == []
        # corrupt one camera's keypoints -> flagged
        entry["joint2d_mp"][1] = entry["joint2d_mp"][1] + 0.5
        bad = compute_not_aligned(entry)
        assert bad == ["s_c02"]
